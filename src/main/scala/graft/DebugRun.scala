package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run named SparkEntry queries (or all) against a sf dir and
  * print row counts / optional plans. Usage:
  *   runMain graft.DebugRun <sfDir> [explain] [query ...]
  */
object DebugRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val explain = args.contains("explain")
    val names = args.drop(1).filterNot(_ == "explain")
    val spark = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graftx.GraftSparkExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    val sel = if (names.nonEmpty) SparkEntry.queries.view.filterKeys(names.contains).toMap
      else SparkEntry.queries
    (1 to repeat).foreach { r =>
      sel.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          val n = df.count()
          println(f"[debug] $name%-20s pass=$r rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.2fs")
          if (explain) df.explain("formatted")
          if (sys.env.get("SPARK_GRAFT_SHOW").contains("1"))
            df.show(60, truncate = false)
        } catch {
          case e: Throwable =>
            println(s"[debug] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        spark.catalog.clearCache()
        CacheRegistry.unpersistAll()
      }
    }
    spark.stop()
  }
}
