package graft

import org.apache.spark.sql.functions._
import graft.operators.AgriOps
import graft.sources.Tables

class AgriOpsSpec extends SparkSpec {
  lazy val events = Tables.events(spark, sf).cache()

  test("hourlyMart partitions all events into (key, hour) groups") {
    val mart = AgriOps.hourlyMart(events)
    val total = mart.agg(sum("n_obs")).head.getLong(0)
    assert(total === events.count())
    assert(mart.select("event_type", "hour_ts").distinct().count() === mart.count())
  }

  test("climatology anomalies cancel within every (key, hour-of-day) group") {
    val out = AgriOps.climatology(events).cache()
    assert(out.count() === events.count())
    // sum(anomaly) over a group = sum(value) - n*clim_mean ~ 0
    val bad = out.groupBy("event_type", "hod")
      .agg(sum("anomaly").as("s"), count(lit(1)).as("n"))
      .filter(abs(col("s")) > col("n") * 1e-9)
    assert(bad.count() === 0)
    // clim_mean is constant within a group
    assert(out.select("event_type", "hod", "clim_mean").distinct().count()
      === out.select("event_type", "hod").distinct().count())
    // the |keys × 24| clim side broadcasts — the fact never shuffles
    val plan = AgriOps.climatology(events)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join-back in:\n$plan")
    out.unpersist()
  }

  test("degreeDays clamps at zero and accumulates monotonically") {
    val out = AgriOps.degreeDays(events).cache()
    assert(out.filter(col("gdd") < 0).count() === 0)
    assert(out.filter(col("gdd") > 0).count() > 0) // base binds both ways
    assert(out.filter(col("gdd") === 0).count() > 0)
    // cum is per-key nondecreasing and ends at the key's gdd total
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val steps = out.withColumn("prev", lag("gdd_cum", 1).over(w))
      .filter(col("prev").isNotNull && col("gdd_cum") < col("prev"))
    assert(steps.count() === 0)
    val ends = out.groupBy("event_type")
      .agg(max("gdd_cum").as("cum_end"), sum("gdd").as("total"))
      .filter(abs(col("cum_end") - col("total")) > 1e-6)
    assert(ends.count() === 0)
    out.unpersist()
  }

  test("thresholdDays partitions every day into hot/cold/mid") {
    val out = AgriOps.thresholdDays(events, hot = 49.0, cold = 45.0).cache()
    // every (key, day) from the daily mart lands in exactly one month row
    val nDaily = AgriOps.dailyMart(events).count()
    assert(out.agg(sum("n_days")).head.getLong(0) === nDaily)
    assert(out.filter(col("hot_days") + col("cold_days") > col("n_days"))
      .count() === 0)
    // thresholds straddling the mean must bind on both sides somewhere
    assert(out.agg(sum("hot_days")).head.getLong(0) > 0)
    assert(out.agg(sum("cold_days")).head.getLong(0) > 0)
    out.unpersist()
  }

  test("heatSpell finds the longest consecutive run, ties to latest start") {
    import spark.implicits._
    // key a: hot 03-01..03 (len 3) then 03-05..06 (len 2) → max 3;
    // key b: two singleton spells → tie broken to the LATER start
    val ev = Seq(
      ("a", "2024-03-01"), ("a", "2024-03-02"), ("a", "2024-03-03"),
      ("a", "2024-03-05"), ("a", "2024-03-06"),
      ("b", "2024-03-10"), ("b", "2024-03-12"))
      .toDF("event_type", "d")
      .select(col("event_type"),
        to_timestamp(concat(col("d"), lit(" 12:00:00"))).as("ts"),
        lit(100.0).as("value"))
    val out = AgriOps.heatSpell(ev, hot = 50.0).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getTimestamp(2).toString.take(10), r.getLong(3))))
      .toMap
    assert(out("a") === ((3L, "2024-03-01", 2L)))
    assert(out("b") === ((1L, "2024-03-12", 2L)))
    // an all-cold key yields no row
    val cold = ev.withColumn("value", lit(1.0))
    assert(AgriOps.heatSpell(cold, hot = 50.0).count() === 0)
  }

  test("drySpell: longest run below the key's own median; constant key yields no row") {
    import spark.implicits._
    // daily totals {10,10,2,2,2,10,10,10,2}: median 10 → threshold
    // 7.5 → dry days 03..05 (run 3) and 09 (run 1)
    val totals = Seq(10.0, 10.0, 2.0, 2.0, 2.0, 10.0, 10.0, 10.0, 2.0)
    val ev = totals.zipWithIndex.map { case (v, i) =>
      ("a", f"2024-03-0${i + 1}%s", v) }
      .toDF("event_type", "d", "value")
      .select(col("event_type"),
        to_timestamp(concat(col("d"), lit(" 12:00:00"))).as("ts"),
        col("value"))
    val out = AgriOps.drySpell(ev).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 3L)
    assert(out.head.getTimestamp(2).toString.take(10) === "2024-03-03")
    assert(out.head.getLong(3) === 2L)
    // a constant key has no day below 0.75×median → no row
    assert(AgriOps.drySpell(ev.withColumn("value", lit(100.0))).count() === 0)
    // corpus: the self-calibrating threshold fires at any SF (the
    // fixed absolute threshold went vacuous when totals scaled with
    // volume — this is the regression pin)
    val events = Tables.events(spark, sf)
    val full = AgriOps.drySpell(events)
    assert(full.count() > 0, "self-calibrating dry threshold never fired")
    assert(full.filter(col("max_dry_days") < 1).count() === 0)
  }

  test("sdii: mean total over wet (>= own-median) days, closed form") {
    import spark.implicits._
    // totals {10,10,2,2,2,10,10,10,2}: median 10 → wet = the five 10s
    // → n_wet 5, sdii exactly 10.0
    val totals = Seq(10.0, 10.0, 2.0, 2.0, 2.0, 10.0, 10.0, 10.0, 2.0)
    val ev = totals.zipWithIndex.map { case (v, i) =>
      ("a", f"2024-03-0${i + 1}%s", v) }
      .toDF("event_type", "d", "value")
      .select(col("event_type"),
        to_timestamp(concat(col("d"), lit(" 12:00:00"))).as("ts"),
        col("value"))
    val r = AgriOps.sdii(ev).head()
    assert(r.getAs[Long]("n_wet_days") === 5L)
    assert(r.getAs[Double]("sdii") === 10.0)
    // corpus: every key reports, wet days never exceed total days,
    // and sdii is at least the key's median by construction
    val events = Tables.events(spark, sf)
    val full = AgriOps.sdii(events)
    assert(full.count() ===
      events.select("event_type").distinct().count())
    assert(full.filter(col("n_wet_days") < 1).count() === 0)
  }

  test("rx5day: max 5-calendar-day total; RANGE frame spans gaps correctly") {
    import spark.implicits._
    // days 1..9 with a gap at day 5; totals chosen so the best
    // 5-day CALENDAR window is days 5..9 = 0+4+4+4+20 = 32 (a ROWS
    // frame would instead sum 5 observed rows across 6 calendar days)
    val rows = Seq(("2024-03-01", 1.0), ("2024-03-02", 1.0),
      ("2024-03-03", 1.0), ("2024-03-04", 1.0), // day 5 missing
      ("2024-03-06", 4.0), ("2024-03-07", 4.0), ("2024-03-08", 4.0),
      ("2024-03-09", 20.0))
    val ev = rows.toDF("d", "value")
      .select(lit("a").as("event_type"),
        to_timestamp(concat(col("d"), lit(" 12:00:00"))).as("ts"),
        col("value"))
    val r = AgriOps.rx5day(ev).head()
    assert(r.getAs[Double]("rx5day") === 32.0)
    assert(r.getAs[java.sql.Timestamp]("window_end")
      .toString.take(10) === "2024-03-09")
    // corpus: one row per key, never below the best single day
    val events = Tables.events(spark, sf)
    val full = AgriOps.rx5day(events)
    assert(full.count() ===
      events.select("event_type").distinct().count())
  }

  test("wsdi: cumulative warm-spell days above the key's own percentile") {
    import spark.implicits._
    // means {1,9,9,9,1,8,8,1,8}: sorted {1,1,1,8,8,8,9,9,9} → median
    // 8 → strictly-above days are 2,3,4 (one run of 3, the 8s don't
    // qualify); minRun 3 keeps it → wsdi_days 3, n_spells 1,
    // longest 3 starting 03-02
    val vals = Seq(1.0, 9.0, 9.0, 9.0, 1.0, 8.0, 8.0, 1.0, 8.0)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      ("a", f"2024-03-0${i + 1}%s", v) }
      .toDF("event_type", "d", "value")
      .select(col("event_type"),
        to_timestamp(concat(col("d"), lit(" 12:00:00"))).as("ts"),
        col("value"))
    val r = AgriOps.wsdi(ev).head()
    assert(r.getAs[Long]("wsdi_days") === 3L)
    assert(r.getAs[Long]("n_spells") === 1L)
    assert(r.getAs[Long]("longest_spell") === 3L)
    assert(r.getAs[java.sql.Timestamp]("longest_start")
      .toString.take(10) === "2024-03-02")
    // a constant key has no day strictly above its percentile → no row
    assert(AgriOps.wsdi(ev.withColumn("value", lit(7.0))).count() === 0)
    // corpus: the gate dials (median, run >= 3) must be NON-VACUOUS at
    // any SF — the A39 lesson; classical (p90, 6) measured 0 rows at
    // the 30-day gate span and stays a production dial
    val events = Tables.events(spark, sf)
    val full = AgriOps.wsdi(events)
    assert(full.count() > 0, "gate dials produced no warm spells")
    assert(full.filter(col("wsdi_days") < col("longest_spell")).count() === 0)
  }

  test("r95ptot: extreme-tail share of the water budget, closed form") {
    import spark.implicits._
    // totals 1..10: interpolated p95 = 9.55 → very wet = {10} →
    // share = 10/55, n_very_wet = 1
    val ev = (1 to 10).map { i => ("a", f"2024-03-$i%02d", i.toDouble) }
      .toDF("event_type", "d", "value")
      .select(col("event_type"),
        to_timestamp(concat(col("d"), lit(" 12:00:00"))).as("ts"),
        col("value"))
    val r = AgriOps.r95ptot(ev).head()
    assert(r.getAs[Long]("n_very_wet") === 1L)
    assert(math.abs(r.getAs[Double]("r95ptot") - 10.0 / 55.0) < 1e-12)
    // a constant key has no day strictly above its p95 → share 0
    val flat = AgriOps.r95ptot(ev.withColumn("value", lit(3.0))).head()
    assert(flat.getAs[Long]("n_very_wet") === 0L)
    assert(flat.getAs[Double]("r95ptot") === 0.0)
    // corpus: one row per key, the self-calibrating tail is non-empty
    val events = Tables.events(spark, sf)
    val full = AgriOps.r95ptot(events)
    assert(full.count() ===
      events.select("event_type").distinct().count())
    assert(full.filter(col("n_very_wet") < 1).count() === 0,
      "interpolated p95 must leave a non-empty tail")
  }

  test("chillHours counts hourly means below threshold per month") {
    import spark.implicits._
    // 3 hours on one day: means 40, 50, 44 → 2 chill hours (< 45)
    val ev = Seq(
      ("a", "2024-03-01 02:00:00", 40.0),
      ("a", "2024-03-01 02:30:00", 40.0), // same hour, same mean
      ("a", "2024-03-01 03:00:00", 50.0),
      ("a", "2024-03-01 04:00:00", 44.0))
      .toDF("event_type", "t", "value")
      .select(col("event_type"), to_timestamp(col("t")).as("ts"),
        col("value"))
    val out = AgriOps.chillHours(ev, chillBelow = 45.0).head()
    assert(out.getAs[Long]("n_hours") === 3L)
    assert(out.getAs[Long]("chill_hours") === 2L)
    // corpus: chill_hours ≤ n_hours everywhere
    val events = Tables.events(spark, sf)
    assert(AgriOps.chillHours(events)
      .filter(col("chill_hours") > col("n_hours")).count() === 0)
  }

  test("growingSeason brackets warm days per key-year") {
    import spark.implicits._
    // key a, 2024: warm Mar-02 and Mar-10 (span 9 days, 2 warm);
    // cold day in between must not split the season; key b all cold
    val ev = Seq(
      ("a", "2024-03-02", 90.0), ("a", "2024-03-05", 10.0),
      ("a", "2024-03-10", 80.0), ("b", "2024-03-02", 5.0))
      .toDF("event_type", "d", "value")
      .select(col("event_type"),
        to_timestamp(concat(col("d"), lit(" 06:00:00"))).as("ts"),
        col("value"))
    val rows = AgriOps.growingSeason(ev, thr = 50.0).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(0) === "a" && r.getLong(1) === 2024L)
    assert(r.getTimestamp(2).toString.startsWith("2024-03-02"))
    assert(r.getTimestamp(3).toString.startsWith("2024-03-10"))
    assert(r.getLong(4) === 2L)
    assert(r.getAs[Long]("season_len") === 9L)
  }

  test("unitConvert applies the ERA5 conversions elementwise") {
    val row = AgriOps.unitConvert(events)
      .join(events.select(col("event_id"), col("value"), col("user_id")), "event_id")
      .head()
    val (vc, vm, sp) = (row.getAs[Double]("value_c"),
      row.getAs[Double]("value_mm"), row.getAs[Double]("speed"))
    val (v, u) = (row.getAs[Double]("value"), row.getAs[Long]("user_id"))
    assert(math.abs(vc - (v - 273.15)) < 1e-3)
    assert(math.abs(vm - v * 1000.0) < 1e-3)
    assert(math.abs(sp - math.sqrt(v * v + u.toDouble * u)) < 1e-3)
  }

  test("dailyMart agg specs are consistent (min <= mean <= max)") {
    val bad = AgriOps.dailyMart(events)
      .filter(col("value_min") > col("value_mean")
        || col("value_mean") > col("value_max"))
    assert(bad.count() === 0)
  }

  test("upsertDedup leaves exactly one row per key, the newest") {
    val d = AgriOps.upsertDedup(events)
    assert(d.select("user_id", "event_type").distinct().count() === d.count())
    assert(d.count() === events.select("user_id", "event_type").distinct().count())
    // surviving ts is the max ts of its group
    val maxTs = events.groupBy("user_id", "event_type").agg(max("ts").as("mts"))
    val mismatched = d.join(maxTs, Seq("user_id", "event_type"))
      .filter(col("last_ts") =!= col("mts"))
    assert(mismatched.count() === 0)
  }

  test("distinctKeys returns sorted unique keys") {
    val keys = AgriOps.distinctKeys(events).collect().map(_.getString(0))
    assert(keys.sorted.sameElements(keys))
    assert(keys.distinct.length === keys.length)
  }

  test("rangeFilter honors both predicates") {
    val f = AgriOps.rangeFilter(events, Seq("click"),
      "2024-01-05 00:00:00", "2024-01-12 00:00:00")
    assert(f.filter(col("event_type") =!= "click").count() === 0)
    assert(f.filter(col("ts") < to_timestamp(lit("2024-01-05 00:00:00"))).count() === 0)
  }

  test("pivotWide is the wide twin of dailyMart means") {
    val wide = AgriOps.pivotWide(events, Seq("click", "error", "purchase", "signup", "view"))
    val long = AgriOps.dailyMart(events)
      .filter(col("event_type") === "click")
      .select(col("day"), col("value_mean"))
    val joined = wide.select(col("day"), col("click"))
      .join(long, "day")
      .filter(abs(col("click") - col("value_mean")) > 1e-9)
    assert(joined.count() === 0)
  }

  test("gridUnpivot inverts pivotWide back to long rows") {
    val keys = Seq("click", "error", "purchase", "signup", "view")
    val wide = AgriOps.pivotWide(events, keys)
    val long = AgriOps.gridUnpivot(wide, Seq("day"), keys, "metric", "avg_value")
    // every non-null wide cell becomes exactly one long row
    val nonNullCells = keys.map(k =>
      wide.filter(col(k).isNotNull).count()).sum
    assert(long.count() === nonNullCells)
    assert(long.filter(col("avg_value").isNull).count() === 0)
    // and the values match the daily mart means for a sample metric
    val clicks = long.filter(col("metric") === "click")
      .join(AgriOps.dailyMart(events)
        .filter(col("event_type") === "click"), "day")
      .filter(abs(col("avg_value") - col("value_mean")) > 1e-9)
    assert(clicks.count() === 0)
  }

  test("kpi matches direct computation") {
    val k = AgriOps.kpi(events).head()
    assert(k.getAs[Long]("n_rows") === events.count())
    assert(k.getAs[Long]("n_types") ===
      events.select("event_type").distinct().count())
  }

  test("jsonExtract parses the props payload") {
    val j = AgriOps.jsonExtract(events)
    assert(j.filter(col("k").isNull).count() === 0)
  }

  test("incremental mart merge is bit-identical to full recompute") {
    val cut = to_timestamp(lit("2024-01-15 00:00:00"))
    val merged = AgriOps.incrementalHourlyMart(
      events.filter(col("ts") < cut), events.filter(col("ts") >= cut))
    val full = AgriOps.hourlyMart(events)
    // exceptAll compares doubles bitwise — exactly the claim being made
    assert(merged.count() === full.count())
    assert(merged.exceptAll(full).count() === 0)
    assert(full.exceptAll(merged).count() === 0)
  }

  test("partitioned mart writes hive layout and prunes on read") {
    val out = java.nio.file.Files.createTempDirectory("mart").toString
    AgriOps.writePartitionedMart(AgriOps.hourlyMart(events), out)
    val back = AgriOps.readPartitionedMart(spark, out)
    assert(back.count() === AgriOps.hourlyMart(events).count())
    // partition dirs exist
    val dirs = new java.io.File(out).listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("event_type=")))
  }

  test("vpdFromHourly: closed-form Tetens values, saturation at dewpoint") {
    import spark.implicits._
    val hourly = Seq(
      ("r0", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 20.0, 10.0),
      ("r0", java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 15.0, 15.0))
      .toDF("region", "ts", "t2m", "d2m")
    val v = AgriOps.vpdFromHourly(hourly).collect()
      .map(r => r.getTimestamp(1).toString -> r).toMap
    def es(t: Double) = math.rint(
      0.6108 * math.exp(17.27 * t / (t + 237.3)) * 1e4) / 1e4
    val r0 = v("2024-01-01 00:00:00.0")
    assert(r0.getAs[Double]("es_kpa") === es(20.0))
    assert(r0.getAs[Double]("ea_kpa") === es(10.0))
    assert(r0.getAs[Double]("vpd_kpa") > 0.0)
    // saturated air (t2m == d2m) has zero deficit
    assert(v("2024-01-01 01:00:00.0").getAs[Double]("vpd_kpa") === 0.0)
    // over the live grid mart: VPD is never negative (dewpoint <= air
    // temp in the connector's formula grid would be required — assert
    // only the algebraic identity es >= ea ⟺ vpd >= 0 holds rowwise)
    val g = AgriOps.gridVpd(spark)
    assert(g.filter((col("es_kpa") >= col("ea_kpa")) =!=
      (col("vpd_kpa") >= 0.0)).count() === 0)
  }

  test("et0Hargreaves: zero-range days give zero ET0, Ra stays in band") {
    val out = AgriOps.et0Hargreaves(events).cache()
    // Ra sinusoid: 25 ± 12
    assert(out.filter(col("ra") < 13.0 || col("ra") > 37.0).count() === 0)
    // ET0 is zero iff the diurnal range is zero (sqrt factor)
    assert(out.filter(col("t_max") === col("t_min"))
      .filter(col("et0") =!= 0.0).count() === 0)
    // daily keys match the daily mart's
    assert(out.count() ===
      events.select(col("event_type"),
        date_trunc("day", col("ts"))).distinct().count())
    out.unpersist()
  }

  test("seasonalDecompose: additive identity, constant series decomposes to zero") {
    val out = AgriOps.seasonalDecompose(events).cache()
    // every hourly mart row appears, decomposition is additive
    assert(out.count() === AgriOps.hourlyMart(events).count())
    assert(out.filter(
      abs(col("avg_value") - (col("trend") + col("seasonal") + col("resid")))
        > 1e-9).count() === 0)
    out.unpersist()
    // a constant series has flat trend, no diurnal profile, no residual
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val const = (0 until 48).map(h => (h.toLong,
      new java.sql.Timestamp(ts0 + h * 3600000L), 1L, "a", 10.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dec = AgriOps.seasonalDecompose(const)
    assert(dec.filter(col("trend") =!= 10.0).count() === 0)
    assert(dec.filter(col("seasonal") =!= 0.0).count() === 0)
    assert(dec.filter(abs(col("resid")) > 1e-9).count() === 0)
  }

  test("seasonalStrength: diurnal series reads ~1, flat series reads null") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // 6 days of a pure hour-of-day profile: after detrending, the
    // hour profile explains (almost) all variance — F_s near 1 (the
    // moving-mean trend leaks a little at the series edges)
    val diurnal = (0 until 144).map(h => (h.toLong,
      new java.sql.Timestamp(ts0 + h * 3600000L), 1L, "a",
      10.0 + (h % 24).toDouble, "{}"))
    // flat series: zero detrended variance → null, not a blow-up
    val flat = (0 until 144).map(h => (1000L + h,
      new java.sql.Timestamp(ts0 + h * 3600000L), 1L, "b", 5.0, "{}"))
    val ev = (diurnal ++ flat)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = AgriOps.seasonalStrength(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("seasonal_strength") > 0.8)
    assert(out("a").getAs[Long]("n_hours") === 144L)
    assert(out("b").isNullAt(2))
    // corpus: one row per key, F_s within [0, 1] wherever defined
    val full = AgriOps.seasonalStrength(events)
    assert(full.count() === events.select("event_type").distinct().count())
    assert(full.filter(col("seasonal_strength") < 0.0
      || col("seasonal_strength") > 1.0).count() === 0)
  }

  test("spi standardizes daily totals to mean ~0, sd ~1 per key") {
    val out = AgriOps.spi(events).cache()
    val stats = out.groupBy("event_type")
      .agg(avg("spi").as("m"), stddev("spi").as("sd"),
        count(lit(1)).as("n")).collect()
    stats.foreach { r =>
      assert(math.abs(r.getAs[Double]("m")) < 1e-9)
      assert(math.abs(r.getAs[Double]("sd") - 1.0) < 1e-9)
    }
    // one row per (key, day)
    assert(out.count() ===
      events.select(col("event_type"),
        date_trunc("day", col("ts"))).distinct().count())
    out.unpersist()
  }
}
