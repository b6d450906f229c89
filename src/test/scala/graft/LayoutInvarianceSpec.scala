package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{DedupOps, SimilarityOps}
import graft.sources.Tables

/** VERDICT r6 #5: the three queries gated rows-only by design
  * (dedup_minhash_lsh, dedup_simhash, knn_graph — no tractable SQL
  * oracle for banded minhash / simhash / bucketed graph builds) get
  * the next-strongest guarantee instead: LAYOUT INVARIANCE. Each must
  * emit the IDENTICAL result set under an adversarial physical layout
  * — 3 shuffle partitions with round-robin input placement, and the
  * everything-in-one-partition degenerate — as under the default
  * layout. A partition-order dependence (the bug class rows-only
  * checks can hide: non-deterministic tie-breaks, first-row-wins
  * aggregation, order-sensitive hashing) cannot survive this pin,
  * because the adversarial runs re-execute the full plan over
  * reshuffled inputs, not a cached result.
  */
class LayoutInvarianceSpec extends SparkSpec {
  private lazy val documents = Tables.documents(spark, sf).cache()
  private lazy val embeddings = Tables.embeddings(spark, sf).cache()

  private def canon(df: DataFrame): Set[String] = {
    val rows = df.collect().map(_.toString).toSet
    CacheRegistry.unpersistAll()
    rows
  }

  private def underLayout[T](shufflePartitions: Int)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    try body
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def pinInvariant(name: String, run: DataFrame => DataFrame,
      base: DataFrame): Unit = {
    val default = canon(run(base))
    assert(default.nonEmpty,
      s"$name produced no rows — invariance would be vacuous")
    val roundRobin = underLayout(3) { canon(run(base.repartition(3))) }
    assert(roundRobin === default,
      s"$name diverged under the 3-shuffle-partition round-robin layout")
    val single = underLayout(3) { canon(run(base.coalesce(1))) }
    assert(single === default,
      s"$name diverged with all input in one partition")
  }

  test("dedup_minhash_lsh emits the same pair set under adversarial layouts") {
    pinInvariant("dedup_minhash_lsh", DedupOps.minhashLshPairs(_), documents)
  }

  test("dedup_simhash emits the same pair set under adversarial layouts") {
    pinInvariant("dedup_simhash", DedupOps.simhashPairs(_), documents)
  }

  test("knn_graph emits the same edge set under adversarial layouts") {
    pinInvariant("knn_graph", SimilarityOps.knnGraph(_), embeddings)
  }
}
