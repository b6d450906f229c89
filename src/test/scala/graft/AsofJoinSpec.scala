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
