#!/usr/bin/env python3
"""Compare two Bench artifacts (e.g. the sf0.1 BENCH_full.json vs a
MakeScaled 10x BENCH_sf1.json): per-query wall and stage-time ratios,
sorted by wall ratio, plus the slowest queries at the larger SF.
Usage:
    python3 scripts/bench_ratio.py <base.json> <scaled.json> [topN]
"""
import json
import sys


def num_map(artifact, key, label=None):
    """The artifact's name->seconds map, keeping only plain numbers —
    forked-heavy or older artifact shapes may carry nested objects or
    nulls for some entries, which must be skipped, not crashed on.
    Anything dropped is REPORTED (ADVICE r12: a silent drop makes the
    shared-set totals compare different subsets with no indication)."""
    m = artifact.get(key, {})
    if not isinstance(m, dict):
        if label:
            print(f"note: {label}.{key} is not a map - treated as empty")
        return {}
    kept = {k: float(v) for k, v in m.items()
            if isinstance(v, (int, float)) and not isinstance(v, bool)}
    dropped = sorted(set(m) - set(kept))
    if dropped and label:
        print(f"note: {label}.{key} dropped {len(dropped)} non-numeric "
              f"entries: {', '.join(dropped)}")
    return kept


def main():
    if len(sys.argv) < 3:
        print(__doc__.strip())
        sys.exit(2)
    base_f, scaled_f = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    with open(base_f) as f:
        base = json.load(f)
    with open(scaled_f) as f:
        scaled = json.load(f)
    bq = num_map(base, "queries", label="base")
    sq = num_map(scaled, "queries", label="scaled")
    bs, ss = num_map(base, "stage_ms"), num_map(scaled, "stage_ms")
    # ADVICE r13: the heavy dial publishes min(warmup, t1) for entries
    # whose first pass crosses the cut and median-of-N otherwise, so a
    # query near the boundary can flip statistic regimes between
    # artifacts on host noise alone (min-of-2 is biased low vs
    # median-of-3). passes_q records the regime; flag every shared
    # entry whose regime differs so its ratio is read with that bias
    # in mind. Older artifacts lack passes_q -> empty map, no flags.
    # r14 forensics: stage_ms (summed executorRunTime) grows with task
    # count, so stage ratios between artifacts at different local[N]
    # are config deltas, not regressions (the r12->r13 "3.1x stage"
    # reproduced exactly by re-running the same binary at 4 vs 32
    # cpus). Artifacts record cpus since r14; warn when they differ.
    bc, sc = base.get("cpus"), scaled.get("cpus")
    if bc is not None and sc is not None and bc != sc:
        print(f"note: cpus differ (base {bc}, scaled {sc}) - stage_ms "
              f"ratios reflect parallelism config, compare walls only")
    bp = base.get("passes_q", {}) or {}
    sp = scaled.get("passes_q", {}) or {}
    shared = sorted(set(bq) & set(sq))
    regime_diff = sorted(
        q for q in shared
        if q in bp and q in sp and bp[q] != sp[q])
    if regime_diff:
        print(f"note: {len(regime_diff)} shared entries change pass "
              f"regime (passes_q base->scaled; min-of-2 vs median "
              f"stats differ): "
              + ", ".join(f"{q} {bp[q]}->{sp[q]}" for q in regime_diff))
    elif bp and sp:
        print("note: pass regimes (passes_q) agree for all shared entries")
    only_base = sorted(set(bq) - set(sq))
    only_scaled = sorted(set(sq) - set(bq))
    if only_base:
        print(f"note: {len(only_base)} queries only in base (excluded "
              f"from shared totals): {', '.join(only_base)}")
    if only_scaled:
        print(f"note: {len(only_scaled)} queries only in scaled (excluded "
              f"from shared totals): {', '.join(only_scaled)}")
    if not shared:
        print("no shared plain-number query entries between the artifacts")
        sys.exit(1)
    rows = []
    for q in shared:
        w0, w1 = bq[q], sq[q]
        s0, s1 = bs.get(q, 0.0), ss.get(q, 0.0)
        flag = "*" if q in regime_diff else ""
        rows.append((q + flag, w0, w1, w1 / w0 if w0 else float("inf"),
                     s1 / s0 if s0 else float("nan")))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':28s} {'base_s':>8s} {'scaled_s':>9s} "
          f"{'wallx':>6s} {'stagex':>7s}"
          + ("   (* = pass regime differs)" if regime_diff else ""))
    for q, w0, w1, rw, rs in rows[:top_n]:
        print(f"{q:28s} {w0:8.2f} {w1:9.2f} {rw:6.2f} {rs:7.2f}")
    t0 = sum(bq[q] for q in shared)
    t1 = sum(sq[q] for q in shared)
    print(f"\nshared {len(shared)} queries: total {t0:.1f}s -> {t1:.1f}s "
          f"(ratio {t1 / t0:.2f})")
    # stage_ms is per-timed-pass (median across passes, or the single
    # pass when the dial collapses) in every artifact since r12, so the
    # shared-set stage total is directly comparable across pass dials —
    # this is the contention-immune statistic (VERDICT r13 #3)
    st_shared = [q for q in shared if bs.get(q, 0.0) > 0 and q in ss]
    if st_shared:
        st0 = sum(bs[q] for q in st_shared) / 1000.0
        st1 = sum(ss[q] for q in st_shared) / 1000.0
        print(f"shared {len(st_shared)} stage totals (per-pass): "
              f"{st0:.1f}s -> {st1:.1f}s (ratio {st1 / st0:.2f})")
    skipped = scaled.get("skipped", [])
    if skipped:
        print(f"skipped at scaled SF: {', '.join(sorted(skipped))}")
    errs = scaled.get("errors", {})
    if errs:
        print(f"errors at scaled SF: {errs}")
    print("\nslowest at scaled SF:")
    for q, w1 in sorted(sq.items(), key=lambda x: -x[1])[:10]:
        print(f"  {q:28s} {w1:8.2f}s (stage {ss.get(q, 0) / 1000:.1f}s)")


if __name__ == "__main__":
    main()
