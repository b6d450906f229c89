package graft

import org.apache.spark.sql.functions._

/** Pins the checkpoint-release machinery behind VERDICT r4 #2: a
  * `localCheckpoint`ed frame's blocks are NOT released by
  * `Dataset.unpersist`, so CacheRegistry must track and release them
  * deterministically — otherwise loop-heavy operators leak storage in
  * long-lived sessions and contaminate back-to-back query timings.
  */
class CacheRegistrySpec extends SparkSpec {

  private def persistentRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("registerCheckpoint + unpersistAll releases checkpoint blocks") {
    import spark.implicits._
    CacheRegistry.unpersistAll() // clean slate
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val before = persistentRddIds
    val cp = CacheRegistry.registerCheckpoint(
      Seq(1L, 2L, 3L).toDF("v").localCheckpoint(true))
    assert(cp.count() === 3)
    // the checkpoint pinned at least one new RDD
    val pinned = persistentRddIds -- before
    assert(pinned.nonEmpty, "expected localCheckpoint to persist an RDD")
    CacheRegistry.unpersistAll(blocking = true)
    assert((persistentRddIds -- before).isEmpty,
      "unpersistAll must release registered checkpoint blocks")
  }

  test("dedupGroups leaves no persistent RDDs after harness release") {
    import spark.implicits._
    CacheRegistry.unpersistAll()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val before = persistentRddIds
    def toks(from: Int, to: Int) = (from to to).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, toks(1, 10), "s"), (2L, toks(2, 11), "s"), (3L, toks(3, 12), "s"),
      (9L, "u1 u2 u3 u4 u5", "s")
    ).toDF("doc_id", "text", "source")
    graft.operators.DedupOps.dedupGroups(docs, 0.7)
      .write.format("noop").mode("overwrite").save()
    // the harness contract: one release call after the consuming action
    CacheRegistry.unpersistAll(blocking = true)
    assert((persistentRddIds -- before).isEmpty,
      "dedupGroups must not leak blocks past CacheRegistry.unpersistAll")
  }
}
