package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the most
  * recent right row with right.ts <= left.ts within the same key.
  *
  * Spark has no ASOF JOIN operator. Per the build guidance the
  * preferred path is composing existing operators when semantics
  * allow, and they do here: the classic union-sort-carry plan —
  * tag both streams, union, and carry the last seen right row forward
  * with last_value(ignoreNulls) over (key ORDER BY ts, side). This is
  * ONE shuffle on (key) with a sort — same cost class as a
  * merge-join — versus the naive approach (range join → per-left-row
  * max aggregation) which shuffles twice and explodes intermediate
  * rows. Right rows sort before left rows at equal ts, so a left row
  * matches a simultaneous right row (the `>=` convention, matching
  * DuckDB/QuestDB ASOF semantics).
  */
object AsofJoinOps {

  /** Generic form: returns `left` columns plus `rightCols` (renamed
    * with `asofPrefix`) carried from the latest right row at-or-before
    * each left row's `tsCol` for the same `key`. `tieBreak` orders
    * right rows that share a timestamp (highest wins), keeping results
    * deterministic.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, rightCols: Seq[String], asofPrefix: String = "asof_",
      tieBreak: String = null): DataFrame = {
    val leftCols = left.columns
    val tb = Option(tieBreak)

    // the tiebreak keeps its NATIVE type (any orderable column works —
    // numeric, string, timestamp); left rows carry null, which is fine:
    // __side already orders them after every right row at equal ts, and
    // relative order among left rows never affects the carried value
    val tbType = tb.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType: org.apache.spark.sql.types.DataType)
    val lTagged = left
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col): _*).schema.fields)))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast(tbType))
    val rTagged = right
      .select(col(key), col(tsCol),
        struct(rightCols.map(col): _*).as("__r"),
        lit(0).as("__side"),
        tb.map(c => col(c)).getOrElse(lit(0L).cast(tbType)).as("__tb"))

    val unified = lTagged.select(
      (Seq(col(key), col(tsCol), col("__r"), col("__side"), col("__tb")) ++
        leftCols.filterNot(c => c == key || c == tsCol).map(col)): _*)
      .unionByName(rTagged, allowMissingColumns = true)

    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unified
      .withColumn("__last_r", last("__r", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val rightOut = rightCols.map(c =>
      col("__last_r").getField(c).as(s"$asofPrefix$c"))
    carried.select(leftCols.map(col) ++ rightOut: _*)
  }

  /** Native-operator form of [[asofJoin]]: plans graft's custom
    * Catalyst node ([[org.apache.spark.sql.graftx.AsOfJoinPlan]] →
    * `AsOfJoinExec` via the injected planner strategy) instead of the
    * union-window composition. Identical semantics and output schema
    * (oracle-shared with B12); different physical shape — each side
    * gets its own key-clustered exchange (elidable when a child is
    * already partitioned right, e.g. bucketed tables) and the merge
    * buffers ONE right row instead of windowing the unioned streams.
    * Requires the session to carry `GraftSparkExtensions`.
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, rightCols: Seq[String], asofPrefix: String = "asof_",
      tieBreak: String = null): DataFrame = {
    import org.apache.spark.sql.graftx.{bridge, AsOfJoinPlan}
    val spark = left.sparkSession
    // fresh exprIds on the right (self-join safe), minimal projection
    val rightSel = right.select(
      col(key).as("__rk") +: col(tsCol).as("__rts") +:
        (rightCols.map(c => col(c).as(s"__r_$c")) ++
          Option(tieBreak).map(c => col(c).as("__rtb")).toSeq): _*)
    val lPlan = bridge.analyzed(left)
    val rPlan = bridge.analyzed(rightSel)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = AsOfJoinPlan(lPlan, rPlan,
      leftKeys = Seq(attr(lPlan, key)), rightKeys = Seq(attr(rPlan, "__rk")),
      leftTs = attr(lPlan, tsCol), rightTs = attr(rPlan, "__rts"),
      rightTieBreak = Option(tieBreak).toSeq.map(_ => attr(rPlan, "__rtb")))
    bridge.dataframe(spark, node)
      .select(left.columns.map(col) ++
        rightCols.map(c => col(s"__r_$c").as(s"$asofPrefix$c")): _*)
  }

  /** Query form (B12): every event annotated with the user's most
    * recent purchase at-or-before it.
    */
  def lastPurchase(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"),
        round(col("value"), 4).as("purchase_value"))
    asofJoin(
      events.select(col("event_id"), col("user_id"), col("ts")),
      purchases, key = "user_id", tsCol = "ts",
      rightCols = Seq("purchase_id", "purchase_value"),
      asofPrefix = "last_", tieBreak = "purchase_id")
  }

  /** B30: B12 through the native operator — same inputs, same output
    * schema, same DuckDB ASOF oracle; the physical plan is the custom
    * merge join instead of the union-window composition.
    */
  def lastPurchaseNative(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"),
        round(col("value"), 4).as("purchase_value"))
    asofJoinNative(
      events.select(col("event_id"), col("user_id"), col("ts")),
      purchases, key = "user_id", tsCol = "ts",
      rightCols = Seq("purchase_id", "purchase_value"),
      asofPrefix = "last_", tieBreak = "purchase_id")
  }
}
