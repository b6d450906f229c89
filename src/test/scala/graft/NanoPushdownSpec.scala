package graft

import org.apache.spark.sql.functions._
import graft.operators.AgriOps
import graft.sources.Tables

class NanoPushdownSpec extends SparkSpec {

  test("range filter on converted nano timestamp reaches the parquet scan") {
    spark.catalog.clearCache() // a cached events relation would absorb the scan
    val f = AgriOps.rangeFilter(Tables.events(spark, sf), Seq("click"),
      "2024-01-05 00:00:00", "2024-01-12 00:00:00")
    val physical = f.queryExecution.executedPlan.toString
    // the rewritten long-range predicate must appear in PushedFilters
    val pushed = physical.linesIterator
      .filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts"),
      s"expected raw-nanos range pushed to scan, got: $pushed")
    assert(pushed.contains("LessThan(ts"),
      s"expected raw-nanos range pushed to scan, got: $pushed")
  }

  test("rewrite preserves semantics vs unrewritten computation") {
    // same predicate evaluated post-hoc on the converted column
    val events = Tables.events(spark, sf).cache()
    val viaRule = AgriOps.rangeFilter(events, Seq("click", "view"),
      "2024-01-10 00:00:00", "2024-01-15 00:00:00").count()
    val reference = events
      .filter(col("event_type").isin("click", "view"))
      .collect()
      .count { r =>
        val ts = r.getAs[java.sql.Timestamp]("ts")
        !ts.before(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")) &&
          !ts.after(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      }
    assert(viaRule === reference)
  }

  test("equality on converted timestamp rewrites to a nanos interval") {
    spark.catalog.clearCache() // a cached events relation would absorb the scan
    val events = Tables.events(spark, sf)
    val someTs = events.select(col("ts")).head().getTimestamp(0)
    val eq = events.filter(col("ts") === lit(someTs))
    val pushed = eq.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts"), s"got: $pushed")
    assert(eq.count() >= 1)
  }
}
