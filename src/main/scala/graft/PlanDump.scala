package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` output for named SparkEntry
  * queries to files (plans/<tag>/<name>_<suffix>.txt). Usage:
  *   runMain graft.PlanDump <sfDir> <outDir> <suffix> [query ...]
  * With no query names, dumps every entry.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val spark = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graftx.GraftSparkExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val sel = if (names.nonEmpty)
      SparkEntry.queries.view.filterKeys(names.contains).toMap
    else SparkEntry.queries
    sel.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"[plandump] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      CacheRegistry.unpersistAll()
    }
    spark.stop()
  }
}

/** Dev tool: run ONE query with the noop sink and print a per-Spark-job
  * wall breakdown (job id, duration, description) so multi-job operators
  * (the closure loop, streaming gates, iterative trainers) are
  * attributable job-by-job. Usage:
  *   runMain graft.JobProf <sfDir> <query> [passes]
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val passes = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graftx.GraftSparkExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Double, String, Int)]())
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse(""),
          j.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = jobs.get(j.jobId)
        if (st != null)
          done.add((j.jobId, (System.nanoTime() - st._1) / 1e9, st._2, st._3))
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to passes).foreach { p =>
      done.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftx.bridge.waitListenerBusEmpty(spark.sparkContext)
      spark.catalog.clearCache()
      CacheRegistry.unpersistAll()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
      println(f"[jobprof] $name pass=$p wall=$wall%.2fs jobs=${done.size}")
      import scala.jdk.CollectionConverters._
      done.asScala.toSeq.sortBy(_._1).foreach { case (id, dur, desc, tasks) =>
        println(f"[jobprof]   job=$id%-4d ${dur}%8.3fs tasks=$tasks%-5d $desc")
      }
    }
    spark.stop()
  }
}
