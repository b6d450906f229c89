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

  // toy series: key "a" observed at hours 0, 1 and 4 (gap at 2, 3)
  private def toySeries = {
    import spark.implicits._
    Seq(
      (1L, "2024-01-01 00:30:00", "a", 10.0),
      (2L, "2024-01-01 01:15:00", "a", 20.0),
      (3L, "2024-01-01 04:45:00", "a", 50.0))
      .toDF("event_id", "tstr", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("tstr")).as("ts"),
        col("event_type"), col("value"))
  }

  test("gapFill emits the full hourly spine, forward-filling gaps") {
    val g = TimeSeriesOps.gapFill(toySeries).orderBy("hour").collect()
    assert(g.length === 5) // hours 0..4 inclusive
    val gaps = g.filter(_.getAs[Boolean]("is_gap"))
    assert(gaps.length === 2)
    // both gap hours carry hour-1's value (20.0), not hour-4's
    assert(gaps.forall(_.getAs[Double]("avg_value") === 20.0))
    assert(g.last.getAs[Double]("avg_value") === 50.0)
  }

  test("gapFill on the real events leaves no unfilled interior rows") {
    val g = TimeSeriesOps.gapFill(events).cache()
    // every row after a key's first observation must have a value
    assert(g.filter(col("avg_value").isNull && !col("is_gap")).count() === 0)
    val unfilled = g.filter(col("avg_value").isNull)
    // nulls can only be a leading run (no prior observation)
    val minObs = g.filter(!col("is_gap")).groupBy("event_type")
      .agg(min("hour").as("first_obs"))
    assert(unfilled.join(minObs, "event_type")
      .filter(col("hour") >= col("first_obs")).count() === 0)
    g.unpersist()
  }

  test("interpolate blends gap hours linearly between neighbors") {
    val i = TimeSeriesOps.interpolate(toySeries).orderBy("hour").collect()
    assert(i.length === 5)
    // gap at hour 2: prev=20 @1, next=50 @4 → 20 + 30 * (1/3) = 30
    assert(math.abs(i(2).getAs[Double]("value_interp") - 30.0) < 1e-12)
    // gap at hour 3: 20 + 30 * (2/3) = 40
    assert(math.abs(i(3).getAs[Double]("value_interp") - 40.0) < 1e-12)
  }

  test("interpolate equals the observed value on non-gap rows") {
    val i = TimeSeriesOps.interpolate(events)
    val a = TimeSeriesOps.gapFill(events)
      .filter(!col("is_gap")).select("event_type", "hour", "avg_value")
    val joined = i.filter(!col("is_gap")).join(a, Seq("event_type", "hour"))
    assert(joined.filter(col("value_interp") =!= col("avg_value")).count() === 0)
  }
}
