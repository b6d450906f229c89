package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{AnalyticsOps, AsofJoinOps}
import graft.sources.Tables

class AsofJoinSpec extends SparkSpec {

  test("asofJoin picks the latest at-or-before right row per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, 10L, Timestamp.valueOf("2024-01-01 12:00:00")),
      (3L, 20L, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, Timestamp.valueOf("2024-01-01 09:00:00"), 100L, 1.0),
      (10L, Timestamp.valueOf("2024-01-01 11:00:00"), 101L, 2.0),
      (10L, Timestamp.valueOf("2024-01-01 13:00:00"), 102L, 3.0))
      .toDF("user_id", "ts", "purchase_id", "purchase_value")
    val out = AsofJoinOps.asofJoin(left, right, "user_id", "ts",
      Seq("purchase_id", "purchase_value"), "last_", "purchase_id")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(r.fieldIndex("last_purchase_id")))).toMap
    assert(out(1L) === Some(100L)) // 09:00 is the latest <= 10:00
    assert(out(2L) === Some(101L)) // 11:00 is the latest <= 12:00
    assert(out(3L) === None)       // user 20 has no purchases
  }

  test("asofJoin matches a right row at the exact same timestamp") {
    import spark.implicits._
    val t = Timestamp.valueOf("2024-01-01 10:00:00")
    val left = Seq((1L, 10L, t)).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, t, 7L, 9.9)).toDF("user_id", "ts", "purchase_id", "purchase_value")
    val out = AsofJoinOps.asofJoin(left, right, "user_id", "ts",
      Seq("purchase_id", "purchase_value"), "last_", "purchase_id").head()
    assert(out.getAs[Long]("last_purchase_id") === 7L)
  }

  test("lastPurchase preserves left cardinality") {
    val events = Tables.events(spark, sf)
    val out = AsofJoinOps.lastPurchase(events)
    assert(out.count() === events.count())
    // purchase rows always match at least themselves
    val selfMiss = out.join(
      events.filter(col("event_type") === "purchase").select("event_id"),
      "event_id")
      .filter(col("last_purchase_id").isNull)
    assert(selfMiss.count() === 0)
  }

  test("native as-of join plans AsOfJoinExec and matches the declarative twin") {
    val events = Tables.events(spark, sf)
    val native = AsofJoinOps.lastPurchaseNative(events)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
    // plan-shape pin: exactly one key-clustered exchange per side —
    // a third exchange would mean EnsureRequirements stopped accepting
    // the operator's distribution contract
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 2, s"expected 2 exchanges, got $exchanges in:\n$plan")
    val declarative = AsofJoinOps.lastPurchase(events)
    assert(native.count() === events.count())
    assert(native.exceptAll(declarative).count() === 0)
    assert(declarative.exceptAll(native).count() === 0)
  }

  test("native as-of join: same-timestamp match, tiebreak, and miss rows") {
    import spark.implicits._
    val t = Timestamp.valueOf("2024-01-01 10:00:00")
    val left = Seq(
      (1L, 10L, t),
      (2L, 20L, t),
      (3L, 10L, Timestamp.valueOf("2024-01-01 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    // two purchases at the identical instant: highest tiebreak wins
    val right = Seq(
      (10L, t, 7L, 9.9), (10L, t, 8L, 1.1))
      .toDF("user_id", "ts", "purchase_id", "purchase_value")
    val out = AsofJoinOps.asofJoinNative(left, right, "user_id", "ts",
      Seq("purchase_id", "purchase_value"), "last_", "purchase_id")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(r.fieldIndex("last_purchase_id")))).toMap
    assert(out(1L) === Some(8L)) // equal ts matches; tiebreak picks 8
    assert(out(2L) === None)     // no rows for key 20
    assert(out(3L) === None)     // purchase is after the event
  }

  test("native as-of join: null keys match null keys, like the declarative twin") {
    import spark.implicits._
    // documented divergence from SQL join semantics (where null never
    // equals null): both graft formulations treat null as an ordinary
    // key value — this pins native ≡ declarative on exactly that rule
    val left = Seq(
      (1L, Option(10L), Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, Option.empty[Long], Timestamp.valueOf("2024-01-01 12:00:00")),
      (3L, Option.empty[Long], Timestamp.valueOf("2024-01-01 08:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Option(10L), Timestamp.valueOf("2024-01-01 09:00:00"), 100L, 1.0),
      (Option.empty[Long], Timestamp.valueOf("2024-01-01 11:00:00"), 200L, 2.0))
      .toDF("user_id", "ts", "purchase_id", "purchase_value")
    val native = AsofJoinOps.asofJoinNative(left, right, "user_id", "ts",
      Seq("purchase_id", "purchase_value"), "last_", "purchase_id")
    val twin = AsofJoinOps.asofJoin(left, right, "user_id", "ts",
      Seq("purchase_id", "purchase_value"), "last_", "purchase_id")
    val nm = native.collect().map(r => r.getLong(0) ->
      Option(r.get(r.fieldIndex("last_purchase_id")))).toMap
    assert(nm(1L) === Some(100L))
    assert(nm(2L) === Some(200L)) // null key carries the null-key right row
    assert(nm(3L) === None)       // ...but only at-or-before its ts
    assert(native.exceptAll(twin).count() === 0)
    assert(twin.exceptAll(native).count() === 0)
  }

  test("native as-of join elides both exchanges over bucketed children") {
    // the scale claim in AsOfJoin.scala's doc: children already
    // hash-partitioned on the key (bucketed tables) satisfy
    // ClusteredDistribution, so EnsureRequirements inserts ZERO
    // shuffles — only partition-local sorts
    val events = Tables.events(spark, sf)
    val leftSel = events.select(col("event_id"), col("user_id"), col("ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"),
        round(col("value"), 4).as("purchase_value"))
    graft.operators.ScaleOps.writeBucketed(leftSel, "asof_left_b", "user_id")
    graft.operators.ScaleOps.writeBucketed(purchases, "asof_right_b", "user_id")
    val out = AsofJoinOps.asofJoinNative(
      spark.table("asof_left_b"), spark.table("asof_right_b"),
      "user_id", "ts", Seq("purchase_id", "purchase_value"),
      "last_", "purchase_id")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
    assert(!plan.contains("Exchange"), s"expected zero exchanges in:\n$plan")
    // and the shuffle-free plan still computes the same answer
    val ref = AsofJoinOps.lastPurchaseNative(events)
    assert(out.count() === events.count())
    assert(out.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(out).count() === 0)
  }

  test("native as-of join with an empty right side yields all-null carries") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, 20L, Timestamp.valueOf("2024-01-01 11:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq.empty[(Long, Timestamp, Long, Double)]
      .toDF("user_id", "ts", "purchase_id", "purchase_value")
    val out = AsofJoinOps.asofJoinNative(left, right, "user_id", "ts",
      Seq("purchase_id", "purchase_value"), "last_", "purchase_id")
    assert(out.count() === 2)
    assert(out.filter(col("last_purchase_id").isNotNull).count() === 0)
  }

  test("histogram buckets partition all rows") {
    val events = Tables.events(spark, sf)
    val h = AnalyticsOps.histogram(events)
    assert(h.agg(sum("n")).head.getLong(0) === events.count())
  }

  test("percentiles are ordered p25 <= p50 <= p75") {
    val p = AnalyticsOps.percentiles(Tables.events(spark, sf))
    assert(p.filter(col("p25") > col("p50") || col("p50") > col("p75")).count() === 0)
  }

  test("dispersion stats: var = stddev^2 (within rounding)") {
    val s = AnalyticsOps.dispersionStats(Tables.events(spark, sf))
    val bad = s.filter(abs(col("value_stddev") * col("value_stddev")
      - col("value_var")) > 0.1)
    assert(bad.count() === 0)
  }
}
