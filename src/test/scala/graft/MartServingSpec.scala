package graft

import org.apache.spark.sql.functions._
import graft.serving.MartServing
import graft.operators.AgriOps

class MartServingSpec extends SparkSpec {

  private lazy val mart = AgriOps.gridHourly(spark)

  test("registered mart serves dashboard queries from the in-memory cache") {
    MartServing.register(spark, mart, "era5_hourly_srv")
    val daily = MartServing.rangeLoad(spark, "era5_hourly_srv", "region",
      Seq("r0", "r2"), "ts", "2024-01-01 00:00:00", "2024-01-02 23:00:00")
    // served from the columnar cache, not by recomputing the mart's
    // connector scan + aggregation lineage
    // the query's own scan (everything above the InMemoryRelation,
    // which prints the mart's cached lineage beneath it) must be the
    // columnar cache with the dashboard predicates pushed into it
    val plan = daily.queryExecution.executedPlan.toString
    val served = plan.split("InMemoryRelation").head
    assert(served.contains("InMemoryTableScan"),
      s"expected a cache scan above the relation in:\n$plan")
    assert(served.contains("IN (r0,r2)"),
      s"expected key predicate pushed into the cache scan in:\n$plan")
    assert(daily.count() === 2L * 48)
    // and the values are the mart's values
    val direct = mart.filter(col("region").isin("r0", "r2")
      && col("ts") <= to_timestamp(lit("2024-01-02 23:00:00")))
    assert(daily.exceptAll(direct).count() === 0)
  }

  test("keys / wideSeries / kpiRow answer the dashboard's other shapes") {
    MartServing.register(spark, mart, "era5_hourly_srv")
    assert(MartServing.keys(spark, "era5_hourly_srv", "region")
      .collect().map(_.getString(0)).toSeq === Seq("r0", "r1", "r2"))
    val wide = MartServing.wideSeries(spark, "era5_hourly_srv", "region",
      Seq("r0", "r1", "r2"), "ts", "t2m")
    assert(wide.columns.toSeq === Seq("ts", "r0", "r1", "r2"))
    assert(wide.count() === 72) // 3 days x 24 hours
    val kpi = MartServing.kpiRow(spark, "era5_hourly_srv", "region", "ts").head()
    assert(kpi.getLong(0) === 216L && kpi.getLong(1) === 3L)
    assert(kpi.getTimestamp(2).toString.startsWith("2024-01-01 00:00"))
    assert(kpi.getTimestamp(3).toString.startsWith("2024-01-03 23:00"))
  }

  test("serving_* entries serve from the cache and re-register after eviction") {
    // the A45 bench/gate entries: every serving query's physical plan
    // must be a cache scan (InMemoryTableScan above the relation),
    // never a recomputation of the mart lineage
    def servedPlanOk(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.split("InMemoryRelation").head.contains("InMemoryTableScan"),
        s"$name: expected a cache scan above the relation in:\n$plan")
      assert(df.count() > 0, s"$name returned no rows")
    }
    Seq("serving_keys", "serving_range", "serving_wide", "serving_kpi")
      .foreach(servedPlanOk)
    // the range entry's key predicate reaches the cache scan
    val range = SparkEntry.queries("serving_range")(spark, sf)
    val rplan = range.queryExecution.executedPlan.toString
      .split("InMemoryRelation").head
    assert(rplan.contains("IN (click,purchase)"),
      s"expected the IN-list pushed into the cache scan in:\n$rplan")
    // a harness cache sweep between queries (Bench.clearAll) must not
    // leave later serving entries silently recomputing: the helper
    // re-registers when the cache is gone
    spark.catalog.clearCache()
    servedPlanOk("serving_kpi")
  }

  test("refresh swaps the served version; unregister drops view and cache") {
    MartServing.register(spark, mart, "srv_v")
    val v2 = MartServing.refresh(spark, mart.filter(col("region") === "r0"), "srv_v")
    assert(spark.table("srv_v").count() === v2.count())
    assert(MartServing.keys(spark, "srv_v", "region")
      .collect().map(_.getString(0)).toSeq === Seq("r0"))
    MartServing.unregister(spark, "srv_v")
    assert(!spark.catalog.tableExists("srv_v"))
  }
}
