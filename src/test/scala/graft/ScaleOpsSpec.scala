package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleOps
import graft.sources.Tables

class ScaleOpsSpec extends SparkSpec {

  test("saltedSum equals direct aggregation") {
    val events = Tables.events(spark, sf)
    val salted = ScaleOps.saltedSum(events, "event_type", "value")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // direct side in the same exact-decimal domain: a plain double sum
    // can differ in the last ulp and flip round(.,4)
    val direct = events.groupBy("event_type")
      .agg(round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(20, 6))), 4)
        .cast("double").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted === direct)
  }

  test("bucketed join plans without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    // session warehouse is fixed at startup; use unique table names
    val events = Tables.events(spark, sf).select("event_id", "user_id", "value")
    val users = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    ScaleOps.writeBucketed(events, "graft_ev_b", "user_id")
    ScaleOps.writeBucketed(users, "graft_us_b", "user_id")
    val joined = ScaleOps.bucketedJoin(spark, "graft_ev_b", "graft_us_b", "user_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    assert(joined.count() === events.count())
    spark.sql("DROP TABLE IF EXISTS graft_ev_b")
    spark.sql("DROP TABLE IF EXISTS graft_us_b")
  }
}
