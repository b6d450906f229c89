package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnalyticsOps, TimeSeriesOps}
import graft.sources.Tables

class TimeSeriesOpsSpec extends SparkSpec {
  lazy val events = Tables.events(spark, sf).cache()

  test("trailingWindow frame always contains the current row") {
    val t = TimeSeriesOps.trailingWindow(events)
    assert(t.filter(col("trailing_n") < 1).count() === 0)
    assert(t.count() === events.count())
  }

  test("trailingWindow with a huge window equals the per-user total") {
    // a frame wider than the whole series must see every earlier row
    val t = TimeSeriesOps.trailingWindow(events, windowMs = 10L * 365 * 24 * 3600 * 1000)
    val last = t.groupBy("user_id").agg(max("trailing_n").as("n_seen"))
    val expected = events.groupBy("user_id").agg(count(lit(1)).as("n"))
    val joined = last.join(expected, "user_id")
      .filter(col("n_seen") =!= col("n"))
    assert(joined.count() === 0)
  }

  test("ewma of a constant series is that constant") {
    val const = events.withColumn("value", lit(7.5))
    val e = TimeSeriesOps.ewma(const)
    assert(e.filter(abs(col("ewma") - 7.5) > 1e-12).count() === 0)
  }

  test("ewma stays within the min/max of the lag horizon") {
    val e = TimeSeriesOps.ewma(events)
    val perUser = events.groupBy("user_id")
      .agg(min("value").as("vmin"), max("value").as("vmax"))
    val out = e.join(perUser, "user_id")
      .filter(col("ewma") < col("vmin") - 1e-9
        || col("ewma") > col("vmax") + 1e-9)
    assert(out.count() === 0)
  }

  test("scd2History versions tile each user's timeline exactly") {
    val h = TimeSeriesOps.scd2History(events).cache()
    // one current row per user
    val currents = h.filter(col("is_current")).groupBy("user_id").count()
    assert(currents.filter(col("count") =!= 1).count() === 0)
    // event counts add back up to the source
    val total = h.agg(sum("n_events")).head.getLong(0)
    assert(total === events.count())
    // intervals are ordered: valid_to (when present) is the next
    // version's valid_from, so valid_from < valid_to within a version
    assert(h.filter(col("valid_to").isNotNull
      && col("valid_from") >= col("valid_to")).count() === 0)
    // no two consecutive versions carry the same value (islands merge)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("version")
    val repeats = h.withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNotNull && col("prev") === col("event_type"))
    assert(repeats.count() === 0)
    h.unpersist()
  }

  test("argmaxPerGroup matches the window formulation") {
    val part = Tables.part(spark, sf)
    val viaAgg = AnalyticsOps.argmaxPerGroup(part)
      .select("p_brand", "p_partkey", "max_price")
    val viaWin = AnalyticsOps.topNPerGroup(part, 1)
      .select(col("p_brand"), col("p_partkey"),
        col("p_retailprice").as("max_price"))
    assert(viaAgg.exceptAll(viaWin).count() === 0)
    assert(viaWin.exceptAll(viaAgg).count() === 0)
  }

  test("modePerKey returns one row per user and a real count") {
    val m = AnalyticsOps.modePerKey(events).cache()
    assert(m.count() === events.select("user_id").distinct().count())
    // the mode count is achieved by the claimed value
    val counts = events.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
    val bad = m.join(counts,
      m("user_id") === counts("user_id")
        && m("mode_event_type") === counts("event_type"))
      .filter(col("n_mode") =!= col("cnt"))
    assert(bad.count() === 0)
    m.unpersist()
  }

  test("regressionPerKey recovers an exact linear relationship") {
    // y = 3x + 2 exactly -> slope 3, intercept 2 (integer-exact sums)
    val lin = events.withColumn("value",
      col("user_id").cast("double") * 3.0 + 2.0)
    val r = AnalyticsOps.regressionPerKey(lin)
    assert(r.filter(abs(col("slope") - 3.0) > 1e-9).count() === 0)
    assert(r.filter(abs(col("intercept") - 2.0) > 1e-6).count() === 0)
  }
}
