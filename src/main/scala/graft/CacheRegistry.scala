package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracks DataFrames persisted inside operators so harnesses (Verify,
  * Bench, tests) can release them after the consuming action finishes.
  * Without this, cached blocks accumulate across the 40+ queries a
  * single Verify JVM runs — evicting useful cache and leaking executor
  * disk in long-lived sessions.
  */
object CacheRegistry {
  private val live = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val liveRdds =
    scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]

  /** Persist at MEMORY_AND_DISK and remember the handle. */
  def persist(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    live += p
    p
  }

  /** The guard-persist trade, size-thresholded (VERDICT r9 #4): the
    * statistical guards share one intermediate between an eager count
    * and the main plan. Persisting pays at production scale (one
    * cached scan beats three cold ones) but at gate scale the persist
    * MATERIALIZATION itself dominated (q_ks_binned 0.64 → 1.60 s).
    * Decide by the plan's LEAF input estimate — parquet relations
    * carry accurate file-size stats, and "is this a gate run or a
    * production run" is exactly "how big is the scan". Derived-plan
    * stats without CBO can be wild overestimates, so leaves only.
    * Below the threshold the frame is returned unpersisted and the
    * guard's count simply recomputes the (cheap) aggregate.
    */
  def persistIfLarge(df: DataFrame,
      minInputBytes: Long = 256L << 20): DataFrame = {
    val leafBytes = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    if (leafBytes >= minInputBytes) persist(df) else df
  }

  /** Register a `localCheckpoint`ed frame's pinned RDD for release by
    * [[unpersistAll]]. `Dataset.unpersist` does not touch checkpoint
    * blocks and the async ContextCleaner only reclaims them after GC
    * notices the RDD is unreachable — in a long-lived session running
    * the dedup pipeline repeatedly that lag stacks storage pressure
    * into exactly the queries that need execution memory (VERDICT r4
    * #2). Registering gives the harness a deterministic release point.
    */
  def registerCheckpoint(df: DataFrame): DataFrame = {
    val rdd = org.apache.spark.sql.graftx.bridge.checkpointRdd(df)
    synchronized { rdd.foreach(liveRdds += _) }
    df
  }

  /** Unpersist everything registered since the last call. */
  def unpersistAll(blocking: Boolean = false): Unit = synchronized {
    live.foreach { df =>
      try df.unpersist(blocking)
      catch { case _: Throwable => () }
    }
    live.clear()
    liveRdds.foreach { r =>
      try r.unpersist(blocking)
      catch { case _: Throwable => () }
    }
    liveRdds.clear()
  }

  /** Position marker for [[releaseSince]]. */
  def mark(): Int = synchronized { live.size }

  /** Unpersist only frames registered after `m` — for an operator that
    * fully materializes a sub-pipeline's result (e.g. a checkpoint)
    * and wants its intermediates gone WITHOUT touching caches other
    * operators registered earlier in the same session.
    */
  def releaseSince(m: Int, blocking: Boolean = false): Unit = synchronized {
    live.drop(m).foreach { df =>
      try df.unpersist(blocking)
      catch { case _: Throwable => () }
    }
    live.remove(m, math.max(0, live.size - m))
  }
}
