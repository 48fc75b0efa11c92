package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join — for each left row, the most recent right row
  * with `rightTime <= leftTime` within the same key (SURVEY.md §2.3;
  * the `join_asof` query is this operator specialized to events).
  *
  * Spark-first formulation: no per-key subquery and no custom
  * SparkPlan. Both sides are tagged and unioned, one window pass keyed
  * on the join key carries the latest right payload forward, then left
  * rows are filtered back out. Cost: one shuffle on the key + one
  * sort — O(n log n) per partition, state bounded by the key's row
  * count, skew handled by AQE like any window. A custom
  * LogicalPlan/Strategy (SURVEY §7) would only pay off if the sort
  * could be avoided via pre-sorted bucketed inputs.
  *
  * Ties (`rightTime == leftTime`): the right row is visible (<= match).
  * Multiple right rows at the same instant resolve to the last in
  * (time) order — supply distinct right times for full determinism.
  *
  * Output: every left column, plus `asof_<rightTime>` and
  * `asof_<payload>` columns (null when no right row precedes).
  */
object AsOfJoin {

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
    // in, it would sort first (nulls-first) and leak its payload
    val rNorm = right.filter(col(rightTime).isNotNull).select(
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
