#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata tables and compare (column-sorted, row-sorted)
against the Verify parquet dumps. Usage:
    python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bytes,)):
            pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING-SPARK-OUTPUT"
            continue
        try:
            spark_df = normalize(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = normalize(con.sql(sql).df())
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(spark_df.columns)} duck={list(duck_df.columns)}"
            continue
        if len(spark_df) != len(duck_df):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(spark_df)} duck={len(duck_df)}"
            continue
        try:
            pd.testing.assert_frame_equal(spark_df, duck_df, check_dtype=False,
                                          check_exact=True)
            results[name] = "OK"
        except AssertionError as e:
            results[name] = "VALUE-MISMATCH: " + str(e).split("\n")[1][:200]
    # queries without oracle: rows-only
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracles:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            results[name] = f"ROWS-ONLY n={n}"

    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        print(f"{'PASS' if v == 'OK' else 'INFO' if v.startswith('ROWS') else 'FAIL'} {k}: {v}")
    print(f"\n{ok}/{len(oracles)} oracle-matched")


if __name__ == "__main__":
    main()
