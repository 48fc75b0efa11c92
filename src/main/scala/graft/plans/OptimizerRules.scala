package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Abs, And, Expression, GreaterThanOrEqual, Length, LessThan, LessThanOrEqual,
  Levenshtein, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreePattern
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bounded-predicate rewrite for Levenshtein filters.
  *
  * `levenshtein(a, b) <= k` (and the `<` form) is the verify step of
  * every fuzzy-dedup pipeline, and as written it runs the full
  * O(|a|·|b|) dynamic program on every candidate pair before the
  * comparison throws most of them away. Two facts make it cheaper
  * without changing a single result:
  *
  *  1. edit distance ≥ abs(length(a) − length(b)) — a length gap
  *     larger than k refutes the pair in O(1), and Spark's And
  *     short-circuits, so the DP never runs for those rows;
  *  2. Spark's three-argument `Levenshtein(a, b, threshold = k)`
  *     computes the BANDED dynamic program — O(k·min(|a|,|b|)) — and
  *     returns −1 when the distance exceeds k, so
  *     `levenshtein(a, b) <= k  ⟺  levenshtein(a, b, k) >= 0`.
  *
  * The rewrite fires only on non-negative integer literal bounds, in
  * Filter conditions AND Join conditions — predicate pushdown turns a
  * post-join `filter(edit_dist <= k)` into the join's residual
  * condition, which is exactly where the verify step of an LSH-blocked
  * fuzzy match evaluates. It is naturally idempotent (the rewritten
  * form contains a thresholded Levenshtein, which the pattern no
  * longer matches), which matters because injected operator-
  * optimization rules run inside Catalyst's fixed-point batch.
  *
  * Null semantics are unchanged: every added conjunct is null exactly
  * when the original predicate is null, and Filter treats both null
  * and false as "drop".
  *
  * Registered via [[GraftSparkExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftSparkExtensions`).
  */
object BoundedLevenshteinRule extends Rule[LogicalPlan] {

  private def rewrite(a: Expression, b: Expression, k: Int): Expression = {
    val bound = Literal(k, IntegerType)
    val lengthGuard = LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), bound)
    val banded = GreaterThanOrEqual(Levenshtein(a, b, Some(bound)), Literal(0, IntegerType))
    And(lengthGuard, banded)
  }

  private def rewriteCond(cond: Expression): Expression = cond.transformUp {
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 0 =>
      rewrite(a, b, k)
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 1 =>
      rewrite(a, b, k - 1)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformWithPruning(
    t => t.containsPattern(TreePattern.FILTER) || t.containsPattern(TreePattern.JOIN)) {
    case f @ Filter(cond, child) =>
      val newCond = rewriteCond(cond)
      if (newCond fastEquals cond) f else Filter(newCond, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val newCond = rewriteCond(cond)
      if (newCond fastEquals cond) j else j.copy(condition = Some(newCond))
  }
}
