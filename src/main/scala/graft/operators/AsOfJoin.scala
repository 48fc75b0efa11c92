package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join — for each left row, the most recent right row
  * with `rightTime <= leftTime` within the same key (SURVEY.md §2.3;
  * the `join_asof` query is this operator specialized to events).
  *
  * Two implementations with IDENTICAL semantics and output schema:
  *
  *  - [[asofJoin]] — composed from built-ins (tag, union, one window
  *    pass carrying the latest right payload forward, filter left
  *    back out). Works on any session; cost is one shuffle on the key
  *    plus one sort of the UNION.
  *  - [[asofJoinNative]] — the engine's custom Catalyst operator
  *    ([[graft.plans.AsOfJoinNode]] / [[graft.plans.AsOfJoinExec]]):
  *    a per-partition forward merge with O(1) state that shuffles and
  *    sorts each side separately — and not at all when the inputs are
  *    already bucketed and sorted by (key, time), which the union
  *    form can never exploit.
  *
  * Ties (`rightTime == leftTime`): the right row is visible (<= match).
  * Multiple right rows at the same instant resolve to the last in
  * (time) order — supply distinct right times for full determinism.
  *
  * Output: every left column, plus `asof_<rightTime>` and
  * `asof_<payload>` columns (null when no right row precedes).
  */
object AsOfJoin {

  /** The same as-of semantics through the engine's native Catalyst
    * operator ([[graft.plans.AsOfJoinNode]] → planner strategy →
    * merge-join exec): no union, no window state, and zero added
    * shuffle/sort when inputs are already bucketed and sorted by
    * (key, time). Output schema and every row match [[asofJoin]]
    * exactly (AsOfJoinExecSpec cross-checks, including on random
    * data). Requires the session to carry
    * [[graft.plans.GraftSparkExtensions]].
    */
  def asofJoinNative(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String): DataFrame = {
    val spark = left.sparkSession
    val rightPayload = right.columns.filterNot(c => c == key || c == rightTime).toSeq
    // fresh ExprIds on the right via aliases: as-of joins are commonly
    // self-joins (two filters of one table), where reusing the same
    // attribute ids in one plan would be ambiguous
    val rFresh = right.filter(col(rightTime).isNotNull)
      .select(right.columns.map(c => col(c).as(s"_r_$c")).toIndexedSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rFresh.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column '$n' not found in ${p.output.map(_.name)}"))
    val node = graft.plans.AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, leftTime),
      attr(rPlan, s"_r_$key"), attr(rPlan, s"_r_$rightTime"))
    org.apache.spark.sql.GraftOfRowsBridge.ofRows(spark, node)
      .select((left.columns.map(col).toSeq :+
        col(s"_r_$rightTime").as(s"asof_$rightTime")) ++
        rightPayload.map(c => col(s"_r_$c").as(s"asof_$c")): _*)
  }

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.filterNot(c => c == key || c == rightTime).toSeq

    val payloadCol = struct(
      (col(rightTime).as("_rt") +: rightPayload.map(col)): _*)
    val payloadType = right.select(payloadCol.as("p")).schema("p").dataType

    val lNorm = left.select(
      (col(key).as("_k") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(null).cast(payloadType).as("_payload") +:
        leftCols.map(col)): _*)
    // a NULL right time can never satisfy rightTime <= leftTime; left
    // in, it would sort first (nulls-first) and leak its payload. A
    // NULL right KEY never matches either (SQL equi-join semantics —
    // the native exec agrees); unfiltered, the window's partitionBy
    // would GROUP null keys together and match them to null-key left
    // rows, which no SQL join does.
    val rNorm = right.filter(col(rightTime).isNotNull && col(key).isNotNull).select(
      (col(key).as("_k") +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        payloadCol.as("_payload") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    // right (side 0) sorts before left (side 1) at equal times → <= match
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lNorm.unionByName(rNorm)
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((leftCols.map(col) :+
        col("_match._rt").as(s"asof_$rightTime")) ++
        rightPayload.map(c => col(s"_match.$c").as(s"asof_$c")): _*)
  }
}
