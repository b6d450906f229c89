package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoinOps
import graft.sources.Sources

/** Randomized semantic equivalence checks (seeded, deterministic):
  * each optimized operator is compared against a naive formulation of
  * the same semantics on generated data — the failure modes these
  * catch (tie-breaks, null carries, boundary inclusion) are exactly
  * the ones hand-picked fixtures miss.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def randEvents(seed: Long, n: Int) = {
    val r = new scala.util.Random(seed)
    (1 to n).map { i =>
      (i.toLong,
        new java.sql.Timestamp(1700000000000L + r.nextInt(50) * 60000L),
        (r.nextInt(5) + 1).toLong,
        if (r.nextInt(4) == 0) "purchase" else "click",
        math.round(r.nextDouble() * 1e4) / 100.0,
        "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("asofJoin equals the naive range-join + argmax formulation (randomized)") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val ev = randEvents(seed, 300)
      val fast = AsofJoinOps.lastPurchase(ev)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"),
          round(col("value"), 4).as("purchase_value"))
      // naive: range join + per-event argmax over (ts, purchase_id) —
      // the two-shuffle row-exploding plan the as-of join avoids
      val naive = ev.select("event_id", "user_id", "ts")
        .join(p, col("user_id") === col("p_user") && col("p_ts") <= col("ts"),
          "left")
        .groupBy("event_id", "user_id", "ts")
        .agg(max(struct(col("p_ts"), col("purchase_id"),
          col("purchase_value"))).as("m"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("m.purchase_id").as("last_purchase_id"),
          col("m.purchase_value").as("last_purchase_value"))
      assert(fast.exceptAll(naive).count() === 0, s"seed=$seed fast\\naive")
      assert(naive.exceptAll(fast).count() === 0, s"seed=$seed naive\\fast")
    }
  }

  test("native as-of operator equals the declarative twin (randomized)") {
    // duplicate timestamps are frequent at this density (50 distinct
    // minutes, 300 rows) — ties exercise the right-side tiebreak and
    // the equal-ts left-row independence in both implementations
    for (seed <- Seq(11L, 12L, 13L)) {
      val ev = randEvents(seed, 300)
      val native = AsofJoinOps.lastPurchaseNative(ev)
      val decl = AsofJoinOps.lastPurchase(ev)
      assert(native.exceptAll(decl).count() === 0, s"seed=$seed native\\decl")
      assert(decl.exceptAll(native).count() === 0, s"seed=$seed decl\\native")
    }
  }

  test("top_k aggregate equals sort-and-take on random data") {
    for (seed <- Seq(7L, 8L)) {
      val r = new scala.util.Random(seed)
      val rows = (1 to 500).map(i =>
        (r.nextInt(10).toString, r.nextInt(1000), i.toLong))
      val df = rows.toDF("grp", "v", "id")
      val agg = df.groupBy("grp")
        .agg(graft.functions.VectorFns.top_k(struct(col("v"), col("id")), 5)
          .as("tk"))
        .select(col("grp"), explode(col("tk")).as("e"))
        .select(col("grp"), col("e.v").as("v"), col("e.id").as("id"))
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.map(t => (t._2, t._3)).sorted.take(5).map(t => (g, t._1, t._2))
      }.toSet
      val got = agg.collect()
        .map(x => (x.getString(0), x.getInt(1), x.getLong(2))).toSet
      assert(got === expected, s"seed=$seed")
    }
  }

  test("mergeUpsert is idempotent under re-application (randomized)") {
    for (seed <- Seq(11L, 12L)) {
      val r = new scala.util.Random(seed)
      val base = (1 to 50).map(k => (k.toLong, s"base$k", 0L))
        .toDF("k", "v", "ver")
      // unique versions per key keep the winner well-defined
      val upd = r.shuffle((20 to 70).toList).zipWithIndex.map { case (k, i) =>
        (k.toLong, s"upd$k", (i + 1).toLong)
      }.toDF("k", "v", "ver")
      val once = Sources.mergeUpsert(base, upd, Seq("k"), "ver")
      val twice = Sources.mergeUpsert(once, upd, Seq("k"), "ver")
      assert(once.exceptAll(twice).count() === 0, s"seed=$seed")
      assert(twice.exceptAll(once).count() === 0, s"seed=$seed")
      assert(once.count() === 70)
    }
  }
}
