package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, GenericInternalRow, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.DataType

/** Whole-operator as-of join as a first-class Catalyst citizen
  * (SURVEY.md §7 / custom-operator tier (c)): a logical node, a
  * planner strategy, and a physical merge-join exec, registered via
  * [[GraftSparkExtensions]].
  *
  * Why a custom SparkPlan when [[graft.operators.AsOfJoin]] already
  * composes the same semantics from a union + window: the composed
  * form must materialize the UNION of both sides through one window
  * pass — every right row flows through the left side's shuffle AND
  * sort with a payload struct column attached. The native exec
  * declares the textbook requirements instead (co-partition on key,
  * per-side sort by (key, time)) and streams a single forward merge
  * pass per partition: no union, no payload struct, no window state,
  * and — the actual 100 TB win — when inputs are ALREADY bucketed and
  * sorted by (key, time), EnsureRequirements inserts no shuffle and
  * no sort at all, which the composed union form can never achieve
  * (its window input is the union, which is never pre-sorted).
  *
  * Semantics (identical to the composed operator, cross-checked in
  * AsOfJoinExecSpec and by the `join_asof` DuckDB oracle): for each
  * left row, the LAST right row of the same key with
  * `rightTime <= leftTime`; null keys and null times never match.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute)
  extends BinaryNode {

  // The exec builds its orderings from the LEFT attribute types and
  // merges raw values across sides, so a mismatched (or unordered)
  // right type would surface as a deep runtime ClassCastException in
  // the merge loop. Fail at plan construction instead: the node is
  // only well-formed when each (left, right) pair shares one ordered
  // data type. (Validation waits until all four attributes are
  // resolved, so analyzer-phase copies don't trip on placeholders.)
  if (Seq(leftKey, leftTime, rightKey, rightTime).forall(_.resolved)) {
    require(RowOrdering.isOrderable(leftKey.dataType),
      s"as-of join key type ${leftKey.dataType.catalogString} is not orderable")
    require(RowOrdering.isOrderable(leftTime.dataType),
      s"as-of join time type ${leftTime.dataType.catalogString} is not orderable")
    require(DataType.equalsStructurally(leftKey.dataType, rightKey.dataType, ignoreNullability = true),
      s"as-of join key types differ: left ${leftKey.dataType.catalogString} " +
        s"vs right ${rightKey.dataType.catalogString}")
    require(DataType.equalsStructurally(leftTime.dataType, rightTime.dataType, ignoreNullability = true),
      s"as-of join time types differ: left ${leftTime.dataType.catalogString} " +
        s"vs right ${rightTime.dataType.catalogString}")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinNode → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

/** Per-partition forward merge over co-partitioned, (key, time)-sorted
  * children. State: ONE buffered candidate row — O(1) memory per
  * partition regardless of key cardinality or time range, vs the
  * window form's per-key running frame.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // rows stream out in left order, partitioned like the left child
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    val lKey = BindReferences.bindReference[Expression](leftKey, left.output)
    val lTime = BindReferences.bindReference[Expression](leftTime, left.output)
    val rKey = BindReferences.bindReference[Expression](rightKey, right.output)
    val rTime = BindReferences.bindReference[Expression](rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.length
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      // downstream operators expect UnsafeRow; identity projection over
      // the joined schema materializes one (the SortMergeJoin pattern)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      var cand: InternalRow = null // last right row of the current key window
      var candKey: Any = null      // re-read from the COPIED row (no buffer aliasing)
      lIter.map { l =>
        val lk = lKey.eval(l)
        val lt = lTime.eval(l)
        if (lk == null || lt == null) proj(joined(l, nullRight))
        else {
          // consume right rows that can no longer be "future" for this
          // left row: stale keys drop, in-key rows with rt <= lt become
          // the candidate (later rows overwrite — last-wins semantics)
          var continue = true
          while (continue && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKey.eval(head)
            if (rk == null) rBuf.next()
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) rBuf.next()
              else if (c > 0) continue = false
              else {
                val rt = rTime.eval(head)
                if (rt == null) rBuf.next()
                else if (timeOrd.compare(rt, lt) <= 0) {
                  cand = rBuf.next().copy()
                  candKey = rKey.eval(cand)
                } else continue = false
              }
            }
          }
          if (cand != null && keyOrd.compare(candKey, lk) == 0) proj(joined(l, cand))
          else proj(joined(l, nullRight))
        }
      }
    }
  }
}
