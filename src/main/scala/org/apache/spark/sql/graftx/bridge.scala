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

  /** Drain the listener bus so stage metrics observed by bench
    * listeners are complete before reading them (listener events are
    * posted asynchronously). private[spark], hence bridged here.
    */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext,
      timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
