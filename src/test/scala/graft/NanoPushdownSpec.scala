package graft

import org.apache.spark.sql.functions._
import graft.operators.AgriOps
import graft.sources.Tables

class NanoPushdownSpec extends SparkSpec {

  /** The NanoFilterPushdown rewrite only fires on the INT64-nanos
    * parquet encoding (ts read as long, converted via
    * timestamp_micros). The driver's testdata switched to µs/NTZ —
    * where Spark pushes ts filters natively and the rule correctly
    * stays out of the way — so the rewrite tests pin the rule on the
    * checked-in nanos fixture (src/test/resources/tsenc/ns), the
    * encoding it exists for.
    */
  private def nanosDir: String =
    new java.io.File(
      getClass.getResource("/tsenc/ns/events.parquet").toURI).getParent

  test("range filter on converted nano timestamp reaches the parquet scan") {
    spark.catalog.clearCache() // a cached events relation would absorb the scan
    val f = AgriOps.rangeFilter(Tables.events(spark, nanosDir), Seq("a"),
      "2024-01-01 00:00:00", "2024-02-01 00:00:00")
    val physical = f.queryExecution.executedPlan.toString
    // the rewritten long-range predicate must appear in PushedFilters
    val pushed = physical.linesIterator
      .filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts"),
      s"expected raw-nanos range pushed to scan, got: $pushed")
    assert(pushed.contains("LessThan(ts"),
      s"expected raw-nanos range pushed to scan, got: $pushed")
    assert(f.count() === 1) // only 2024-01-01 00:00:00 is type 'a' in range
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

  test("literal-on-left comparisons also reach the scan (ADVICE r1)") {
    spark.catalog.clearCache()
    val events = Tables.events(spark, nanosDir)
    // lit >= ts  ⟺  ts <= lit — the mirrored match the rule must cover
    val f = events.filter(
      lit(java.sql.Timestamp.valueOf("2024-01-01 01:30:00")) >= col("ts"))
    val pushed = f.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString
    // floor semantics: ts ≤ lit on the truncated column rewrites to
    // raw_nanos < lit + 1µs — a strict LessThan on the raw longs
    assert(pushed.contains("LessThan(ts"), s"got: $pushed")
    // and semantics unchanged: the first two fixture events qualify
    assert(f.count() === 2)
  }

  test("mart read with a partition predicate prunes to matching partitions") {
    val dir = java.nio.file.Files.createTempDirectory("prunemart").toString
    AgriOps.writePartitionedMart(
      AgriOps.martPipeline(Tables.events(spark, sf)), dir)
    val read = spark.read.parquet(dir)
      .filter(col("event_type") === "click")
    val plan = read.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("event_type"),
      s"expected partition pruning on event_type, got: $pf")
    assert(read.count() > 0)
    // pruning is real: only the matching hive directory is listed
    val scanned = plan.linesIterator
      .filter(_.contains("event_type=")).mkString
    assert(!scanned.contains("event_type=error"), s"got: $scanned")
  }

  test("equality on converted timestamp rewrites to a nanos interval") {
    spark.catalog.clearCache() // a cached events relation would absorb the scan
    val events = Tables.events(spark, nanosDir)
    val someTs = events.select(col("ts")).head().getTimestamp(0)
    val eq = events.filter(col("ts") === lit(someTs))
    val pushed = eq.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts"), s"got: $pushed")
    assert(eq.count() >= 1)
  }
}
