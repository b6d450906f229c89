package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.sources.Tables

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("WSCG", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val exploded = docs.select(col("doc_id"),
      explode(DedupOps.shingleHashes(col("text"))).as("h"))
    time("exploded.count")(exploded.count())
    time("exploded.count again")(exploded.count())

    val agg4 = exploded.groupBy("doc_id")
      .agg(min(xxhash64(col("h"), lit(0))).as("m0"),
        (1 until 4).map(k => min(xxhash64(col("h"), lit(k))).as(s"m$k")): _*)
    time("agg 4 mins")(agg4.count())

    val agg16 = exploded.groupBy("doc_id")
      .agg(min(xxhash64(col("h"), lit(0))).as("m0"),
        (1 until 16).map(k => min(xxhash64(col("h"), lit(k))).as(s"m$k")): _*)
    time("agg 16 mins")(agg16.count())

    val agg64 = exploded.groupBy("doc_id")
      .agg(min(xxhash64(col("h"), lit(0))).as("m0"),
        (1 until 64).map(k => min(xxhash64(col("h"), lit(k))).as(s"m$k")): _*)
    time("agg 64 mins")(agg64.count())
    time("agg 64 mins again")(agg64.count())
    spark.stop()
  }
}
