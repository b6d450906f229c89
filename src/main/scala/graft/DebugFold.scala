package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Dev tool: attribute the merge-heavy incremental-fold cost
  * (ScaleSmoke's `dedup_inc_mergeheavy` case) phase by phase at a
  * chosen corpus size. Usage:
  *   runMain graft.DebugFold <nDocs> [cpus]
  * Construction identical to ScaleSmoke: chain corpus (30-token
  * windows, stride 2), docs with id%10 ∈ {8,9} removed form the
  * prior-clustered corpus; the removed docs are the batch and every
  * one of them bridges two prior components.
  */
object DebugFold {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000L
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    def chainDocs(m: Long): DataFrame =
      spark.range(m).select(
        col("id").as("doc_id"),
        lit("s").as("source"),
        concat_ws(" ", transform(
          sequence(col("id") * 2, col("id") * 2 + 29),
          j => concat(lit("w"), j.cast("string")))).as("text"))
    val all = chainDocs(n)
    val corpus = all.filter(pmod(col("doc_id"), lit(10)) < 8)
    val batch = all.filter(pmod(col("doc_id"), lit(10)) >= 8)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val labels = DedupOps.dedupGroups(corpus, 0.7).localCheckpoint(true)
    CacheRegistry.unpersistAll()
    // phase 1: pair-gen alone
    val cols = Seq("doc_id", "source", "text").map(col)
    val union = corpus.select(cols: _*).unionByName(batch.select(cols: _*))
    val tPairs = time { force(DedupOps.ngramJaccardPrefixAgainst(
      union, batch.select("doc_id"), 0.7)) }
    CacheRegistry.unpersistAll()
    println(f"[fold] n=$n pairs_only=$tPairs%.2fs")
    // phase 2: full fold (round trace via GRAFT_DEBUG_LABELS=1)
    val tFold = time { force(DedupOps.dedupIncremental(
      corpus, labels, batch, 0.7)) }
    CacheRegistry.unpersistAll()
    println(f"[fold] n=$n full_fold=$tFold%.2fs")
    spark.stop()
  }
}
