package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series operators over the events stream: trailing time-range
  * windows, bounded-lag exponential smoothing, and slowly-changing-
  * dimension (SCD2) history building. These are the query shapes the
  * reference's mart serves over the hourly series (dashboards/app.py
  * reads windows of the region time series; the load stage's
  * ON CONFLICT upsert is the degenerate "keep latest" form of the
  * SCD2 history A17 keeps in full).
  *
  * All aggregation runs in exact decimal (see [[Exact]]) so results
  * are reproducible across partitionings/engines, and every window
  * partitions on user_id — the highest-cardinality key available —
  * so no single partition dominates at scale.
  */
object TimeSeriesOps {

  private val D = DecimalType(20, 6)

  /** B24: trailing time-RANGE window — the "last hour of activity per
    * user, at every event" rollup. A RANGE frame (not ROWS): the frame
    * is defined by the ORDER-BY value, so rows with identical
    * timestamps share one frame and the result is tie-independent by
    * construction. Ordered on epoch millis (the events carry
    * sub-second precision; truncating to seconds would move frame
    * boundaries).
    *
    * Scale shape: one shuffle on user_id; the running frame is
    * maintained incrementally (O(1) amortized per row as the frame
    * slides), never materializing per-row frame copies.
    */
  def trailingWindow(events: DataFrame, windowMs: Long = 3600000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(unix_millis(col("ts")))
      .rangeBetween(-windowMs, 0)
    events.select(
      col("event_id"), col("user_id"), col("ts"),
      round(sum(col("value").cast(D)).over(w), 4).cast("double")
        .as("trailing_sum"),
      count(lit(1)).over(w).as("trailing_n"))
  }

  /** B26: exponentially-weighted moving average with DYADIC weights
    * over a bounded lag horizon — the smoother the reference's
    * dashboard applies to noisy sensor series, in a form that is
    * bit-reproducible across engines: weights 2^-k are exact in both
    * decimal and binary, products of a DECIMAL(20,6) quantized value
    * with 2^-k are exact decimals, and the final quotient is ONE
    * double division of identical operands. An unbounded recursive
    * EWMA needs a sequential scan (not expressible as a parallel
    * window without float pow drift); bounding the horizon at 8 lags
    * keeps >99.6% of the mass of alpha=0.5 smoothing and makes it a
    * fixed-size window — embarrassingly parallel per key.
    */
  def ewma(events: DataFrame, lags: Int = 8): DataFrame = {
    require(lags >= 1 && lags <= 20)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val x = col("value").cast(D)
    // w_k = 2^-k at decimal scale `lags-1` digits (0.0078125 for k=7)
    def weight(k: Int): Column =
      lit(BigDecimal(1) / BigDecimal(2).pow(k)).cast(DecimalType(10, 8))
    val terms = (0 until lags).map { k =>
      val xk = if (k == 0) x else lag(x, k).over(w)
      (coalesce(xk, lit(0).cast(D)) * weight(k),
        when(xk.isNotNull, weight(k)).otherwise(lit(0).cast(DecimalType(10, 8))))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    events.select(col("event_id"), col("user_id"), col("ts"),
      round(col("value"), 4).as("value"),
      (num.cast("double") / den.cast("double")).as("ewma"))
  }

  /** Hourly mean per series key — shared head of the resample family
    * (A18/A19): the reference's `ds.resample(time="1H").mean()` shape
    * (dask_jobs/aggregate_hourly.py) as one partial-aggregated groupBy.
    */
  private def hourlyAvg(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(Exact.avgD(col("value")).as("v"))

  /** Dense hourly spine per key: every hour between that key's first
    * and last observation, generated AT the data (sequence + explode,
    * a generator map over one tiny min/max aggregate — no driver
    * collect, no cross join against a global calendar).
    */
  private def hourlySpine(agg: DataFrame): DataFrame =
    agg.groupBy("event_type")
      .agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("hour"))

  /** A18: resample + forward-fill — xarray's `resample().mean()` then
    * `ffill()` (the reference grids are dense; real sensor feeds are
    * not, and the mart must still emit every hour). Missing hours are
    * materialized from the per-key spine and filled with the most
    * recent observed value (`last value IGNORE NULLS` running window);
    * `is_gap` marks synthesized rows.
    *
    * Scale shape: one groupBy shuffle on (key, hour), a spine join and
    * a window both keyed on event_type — bounded key space, and the
    * spine is |keys| × |hours| regardless of input row count.
    */
  def gapFill(events: DataFrame): DataFrame = {
    val agg = hourlyAvg(events)
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourlySpine(agg)
      .join(agg, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        last(col("v"), ignoreNulls = true).over(w).as("avg_value"),
        col("v").isNull.as("is_gap"))
  }

  /** A19: resample + LINEAR interpolation — xarray `interpolate_na`:
    * each missing hour gets the time-weighted blend of its nearest
    * observed neighbors; edges fall back to the one known side.
    *
    * Cross-engine exactness: the weight is a ratio of whole-hour
    * counts (exact integers), and the blend
    * `prev + (next - prev) * w` is a fixed sequence of correctly-
    * rounded double ops on identical operands — bit-identical in any
    * engine, so the oracle compares raw doubles, no tolerance.
    */
  def interpolate(events: DataFrame): DataFrame = {
    val agg = hourlyAvg(events)
    val wp = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsHour = when(col("v").isNotNull, col("hour"))
    val f = hourlySpine(agg)
      .join(agg, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"), col("v"),
        last(col("v"), ignoreNulls = true).over(wp).as("prev_v"),
        last(obsHour, ignoreNulls = true).over(wp).as("prev_t"),
        first(col("v"), ignoreNulls = true).over(wn).as("next_v"),
        first(obsHour, ignoreNulls = true).over(wn).as("next_t"))
    // whole-hour distances: exact longs in both engines
    def hours(a: Column, b: Column): Column =
      ((unix_millis(b) - unix_millis(a)) / lit(3600000L)).cast("double")
    f.select(col("event_type"), col("hour"),
      when(col("v").isNotNull, col("v"))
        .when(col("prev_v").isNull, col("next_v"))
        .when(col("next_v").isNull, col("prev_v"))
        .otherwise(col("prev_v") + (col("next_v") - col("prev_v")) *
          (hours(col("prev_t"), col("hour")) / hours(col("prev_t"), col("next_t"))))
        .as("value_interp"),
      col("v").isNull.as("is_gap"))
  }

  /** A17: SCD2 (type-2 slowly-changing-dimension) history — the full
    * form of the reference's keyed upsert: instead of keeping only the
    * latest attribute value per key (ON CONFLICT DO UPDATE,
    * load_hourly_parquet_to_postgres.py:20-35), keep every distinct
    * run of the tracked attribute with its validity interval.
    * Consecutive identical values collapse into one version (island
    * detection: change-flag via lag, version = running sum of flags);
    * valid_to = next version's valid_from, null for the current row.
    *
    * Scale shape: two windows and one groupBy, all partitioned on the
    * dimension key (user_id) — one shuffle total (sort order is
    * shared), no self-joins.
    */
  def scd2History(events: DataFrame): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val byVersion = Window.partitionBy("user_id").orderBy(col("version"))
    events
      .withColumn("changed",
        when(lag(col("event_type"), 1).over(byTime).isNull
          || lag(col("event_type"), 1).over(byTime) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("changed")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("version"))
      .agg(
        // every row in an island carries the same value; min (not
        // first) keeps the aggregate deterministic under any merge
        // order — and mirrors the oracle exactly
        min(col("event_type")).as("event_type"),
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"),
        col("valid_to").isNull.as("is_current"))
  }
}
