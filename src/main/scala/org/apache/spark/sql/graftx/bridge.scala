package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column↔Expression conversions, so
  * graft's native Catalyst expressions can be exposed as `Column`s.
  * Lives under org.apache.spark.sql.* solely for access; contains no
  * Spark code.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — the constructor
    * custom logical operators need; `Dataset.ofRows` is private[sql].
    */
  def dataframe(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame (private[sql] accessor path). */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  /** The pinned RDD behind a `localCheckpoint`ed DataFrame (a
    * LogicalRDD leaf), so callers can `unpersist` its blocks
    * deterministically — `Dataset.unpersist` does NOT release
    * checkpoint blocks, and waiting on the async ContextCleaner lets
    * them pile up across a long session (the r4 bench contamination).
    * LogicalRDD is private[sql], hence bridged here.
    */
  def checkpointRdd(df: org.apache.spark.sql.DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    analyzed(df) match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Eager local checkpoint WITHOUT origin-metadata capture.
    *
    * `Dataset.localCheckpoint` wraps the pinned RDD via
    * `LogicalRDD.fromDataset`, which captures the origin plan's
    * stats/partitioning/ordering/constraints. Inside an iterative
    * loop whose round-r plan references the round-(r−1) checkpoint
    * MORE THAN ONCE (e.g. a self-join), that driver-side capture
    * re-derives metadata through the chain of prior LogicalRDDs and
    * forks at every multi-reference — cost DOUBLES per round
    * (measured: 0.6 s → 28.6 s per checkpoint by round 14 of the
    * label loop, with plan execution flat at ~0.1 s; the 2^rounds
    * curve reproduced exactly). This variant builds the plain
    * LogicalRDD leaf instead: no origin stats (AQE re-derives
    * runtime stats at the next exchange anyway), constant O(1) wrap
    * per round. Blocks release exactly like Dataset.localCheckpoint's
    * (same LogicalRDD shape for [[checkpointRdd]]).
    */
  def plainLocalCheckpoint(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[
      org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val internalRdd = ds.queryExecution.toRdd.map(_.copy())
    internalRdd.localCheckpoint()
    internalRdd.count()
    val lr = org.apache.spark.sql.execution.LogicalRDD(
      ds.queryExecution.analyzed.output, internalRdd)(ds.sparkSession)
    org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession, lr)
  }

  /** Drain the listener bus so stage metrics observed by bench
    * listeners are complete before reading them (listener events are
    * posted asynchronously). private[spark], hence bridged here.
    */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext,
      timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
