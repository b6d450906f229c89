package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Per-round benchmark: every SparkEntry query, warmup + MEDIAN OF 3
  * timed cold-cache passes (a single pass on a noisy shared host
  * charged round 1 twenty seconds for a query that runs in 0.77 s),
  * plus per-query stage-time attribution (executor run time, ms) so
  * wall-clock noise from the host is distinguishable from real work.
  */
object Bench {
  private val TimedPasses = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graftx.GraftSparkExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // cumulative executor run time (ms) across all completed stages
    val execMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        execMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
    })
    def drainedExecMs(): Long = {
      org.apache.spark.sql.graftx.bridge
        .waitListenerBusEmpty(spark.sparkContext)
      execMs.get()
    }
    def clearAll(): Unit = {
      spark.catalog.clearCache()
      CacheRegistry.unpersistAll()
    }

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // noop sink, NOT count(): count() lets the optimizer prune every
    // column — a map-only query collapses to a parquet metadata scan
    // and times as ~0 regardless of its real cost. The noop writer
    // consumes every row fully materialized, so the timing includes
    // the actual projection work while still writing nothing.
    // A failure is RECORDED, never swallowed: a query that fails to
    // plan would otherwise time as ~0 and pollute the medians.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[String] =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
      catch { case t: Throwable =>
        Some(t.getClass.getSimpleName + ": " +
          Option(t.getMessage).getOrElse("").replaceAll("[\"\\\\\n\r\t]", " ").take(200))
      }

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.foreach { case (name, fn) =>
      // warmup pass: compiles generated code and JITs kernels (one-time
      // per-JVM costs, not engine throughput); caches dropped after so
      // every timed pass re-does all data work. A warmup failure
      // excludes the query from timing entirely.
      val warm = run(fn)
      clearAll()
      warm match {
        case Some(err) => errors(name) = err
        case None =>
          val passes = (1 to TimedPasses).map { _ =>
            val s0 = drainedExecMs()
            val t0 = System.nanoTime()
            run(fn).foreach(err => errors(name) = err)
            val wall = (System.nanoTime() - t0) / 1e9
            val stage = (drainedExecMs() - s0).toDouble
            clearAll()
            (wall, stage)
          }
          if (!errors.contains(name))
            timings(name) = (median(passes.map(_._1)), median(passes.map(_._2)))
      }
    }

    val qs = timings.map { case (k, v) => "\"" + k + "\":" + v._1 }
      .mkString("{", ",", "}")
    val st = timings.map { case (k, v) => "\"" + k + "\":" + v._2 }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = if (timings.nonEmpty) timings.values.map(_._1).sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"stage_ms":$st,"errors":$es,"passes":$TimedPasses,"sf":"$sfDir"}"""
    println(line)
    // the driver's stored tail truncated round 2's wall-time map; keep
    // the full line on disk so no consumer has to reconstruct it
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
