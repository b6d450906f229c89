package org.apache.spark.sql.graftx

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as a first-class Catalyst citizen: a
  * logical node, a planner strategy, and a sort-merge physical
  * operator — the extension tier for semantics no composition of
  * built-in operators expresses AS AN OPERATOR (graft's declarative
  * twin, `AsofJoinOps.asofJoin`, expresses them as a union + window
  * carry; this node expresses them directly, so the engine plans the
  * canonical merge join for them).
  *
  * Semantics (same as the declarative twin and DuckDB ASOF JOIN): for
  * every left row, attach the LAST right row of the same key with
  * right.ts <= left.ts (ties on right.ts broken by `rightTieBreak`
  * ascending — last in sort order wins); no match → nulls. Like the
  * window formulation (which partitions null keys into their own
  * group), null keys match null keys — a deliberate divergence from
  * SQL equi-join semantics, pinned native-vs-twin by AsofJoinSpec's
  * null-key case. The registered DuckDB oracle (plain equality, where
  * null never matches) is only run on data with non-null keys; an
  * oracle over nullable keys would need IS NOT DISTINCT FROM.
  *
  * Scale shape — this is the point: EnsureRequirements co-partitions
  * both sides on the key (ONE hash shuffle each, or zero if a child
  * is already partitioned correctly — e.g. bucketed tables, or an
  * upstream aggregation on the same key) and sorts within partitions;
  * the merge itself is a single forward pass holding ONE buffered
  * right row — O(1) memory beyond the sort, no per-key row
  * materialization, no union doubling the shuffled volume. The
  * declarative twin shuffles left+right TOGETHER through one window
  * partition; this operator keeps the streams separate, which also
  * lets AQE size each exchange independently.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tb) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression])
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides hash-clustered on the key: EnsureRequirements inserts
    * compatible exchanges (and elides them when a child already
    * satisfies the distribution).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Within partitions: (key, ts) on the left; (key, ts, tiebreak) on
    * the right so the winning tie row is the last one the merge sees.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTs +: rightTieBreak)).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext) Iterator.empty
      else {
        val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
        val lTsProj = UnsafeProjection.create(Seq(lTsExpr), leftOut)
        val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rightOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rightOut.size)
        // bind right refs AS NULLABLE: a miss emits nullRight, and a
        // non-nullable bound reference would read those null slots as
        // zeros instead of propagating null
        val project = UnsafeProjection.create(outAttrs,
          leftOut ++ rightOut.map(_.withNullability(true)))

        new Iterator[InternalRow] {
          // lookahead right row; key/ts are COPIES (projection buffers
          // and shuffle-iterator rows are reused by the framework)
          private var rHead: InternalRow = _
          private var rHeadKey: UnsafeRow = _
          private var rHeadTs: UnsafeRow = _
          private var rDone = !rIter.hasNext
          // last right row with candidateKey + ts <= current left ts
          private var candidate: InternalRow = _
          private var candidateKey: UnsafeRow = _

          advanceRight()

          private def advanceRight(): Unit =
            if (rIter.hasNext) {
              rHead = rIter.next()
              rHeadKey = rKeyProj(rHead).copy()
              rHeadTs = rTsProj(rHead).copy()
            } else { rDone = true; rHead = null }

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyProj(l) // transient: valid until next lKeyProj call
            // left keys are non-decreasing; a candidate from an earlier
            // key can never match again
            if (candidate != null && keyOrd.compare(candidateKey, lk) != 0) {
              candidate = null
              candidateKey = null
            }
            val lt = lTsProj(l) // transient, distinct buffer from lk's
            var scan = !rDone
            while (scan) {
              val c = keyOrd.compare(rHeadKey, lk)
              if (c < 0) {
                // right row behind every remaining left row: drop
                advanceRight(); scan = !rDone
              } else if (c == 0 && tsOrd.compare(rHeadTs, lt) <= 0) {
                // newest match so far for this key; copy out of the
                // reused shuffle-row buffer before advancing past it
                candidate = rHead.copy()
                candidateKey = rHeadKey
                advanceRight(); scan = !rDone
              } else scan = false
            }
            project(joined(l, if (candidate != null) candidate else nullRight))
          }
        }
      }
    }
  }
}
