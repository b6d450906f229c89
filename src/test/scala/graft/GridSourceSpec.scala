package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.sources.grid.{GridScan, GridSource}

class GridSourceSpec extends SparkSpec {

  private def grid = spark.read.format("graft-grid").load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): GridScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[GridScan]
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("full read materializes regions x days x 24 x lat x lon rows") {
    assert(grid.count() === 3L * 3 * 24 * 8 * 8)
    assert(scanOf(grid).planInputPartitions().length === 9)
  }

  test("region and ts filters prune (region, day) partitions at plan time") {
    val sliced = grid.filter(col("region") === "r0"
      && col("ts") >= to_timestamp(lit("2024-01-02 00:00:00"))
      && col("ts") < to_timestamp(lit("2024-01-03 00:00:00")))
    assert(scanOf(sliced).planInputPartitions().length === 1)
    assert(sliced.count() === 24L * 8 * 8)
  }

  test("sub-day residual filters still apply after pruning keeps the day") {
    val half = grid.filter(col("region") === "r1"
      && col("ts") >= to_timestamp(lit("2024-01-01 12:00:00"))
      && col("ts") < to_timestamp(lit("2024-01-02 00:00:00")))
    // pruning keeps the whole day-0 split; the row filter trims hours
    assert(scanOf(half).planInputPartitions().length === 1)
    assert(half.count() === 12L * 8 * 8)
  }

  test("column pruning reaches the reader schema") {
    val thin = grid.select("region", "t2m")
    assert(scanOf(thin).readSchema().fieldNames.toSeq === Seq("region", "t2m"))
    assert(thin.count() === 3L * 3 * 24 * 8 * 8)
  }

  test("cell values follow the deterministic formula") {
    val row = grid.filter(col("region") === "r2" && col("lat") === 3
        && col("lon") === 5 && col("ts") === to_timestamp(lit("2024-01-03 07:00:00")))
      .select("t2m").collect()
    assert(row.length === 1)
    assert(row.head.getDouble(0) === GridSource.cellValue(2, 2, 7, 3, 5))
  }

  test("an over-narrowed region filter yields zero partitions, not wrong rows") {
    val none = grid.filter(col("region") === "nope")
    assert(scanOf(none).planInputPartitions().isEmpty)
    assert(none.count() === 0)
  }

  test("streaming read drains day offsets once; checkpointed rerun is a no-op") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("grid_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("grid_out").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-grid").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    drain()
    assert(spark.read.parquet(out).count() === 3L * 3 * 24 * 8 * 8)
    // admission control (daysPerBatch=1) must commit ONE batch per
    // day — a mid-run failure resumes from the last drained day
    val batches = new java.io.File(s"$ckpt/offsets")
      .list().count(!_.startsWith("."))
    assert(batches === 3, s"expected 3 day-granular batches, got $batches")
    // same checkpoint → all day offsets already committed → no new rows
    drain()
    assert(spark.read.parquet(out).count() === 3L * 3 * 24 * 8 * 8)
  }
}
