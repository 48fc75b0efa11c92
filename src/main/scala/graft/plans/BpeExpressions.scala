package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One greedy left-to-right BPE pair-merge pass over a sentinel-spaced
  * symbol string: scan the symbols once, merge (a,b)→ab, resume AFTER
  * the merged symbol — exact Sennrich merge-all semantics, and
  * BIT-IDENTICAL to the higher-order fold it replaces
  * (`aggregate(filter(split(sym,' '), …), '', merge-accumulator)` in
  * LlmQueries.bpeMergeStep's r10 form — Round11BpeSpec pins the two
  * constructions equal on the corpus).
  *
  * Why an Expression: the HOF fold evaluates INTERPRETED, allocating a
  * boxed accumulator string per symbol per token — and the BPE encode
  * path chains five of them over every corpus token, which made
  * bpe_apply the bench's most expensive query (6.6 s at sf0.1, the
  * closest approach to the worst-query gate). This expression runs the
  * same fold as one compiled loop inside whole-stage codegen — the
  * FloatVecDot precedent (SURVEY.md §7 reserves custom Catalyst work
  * for exactly these interpreted hot loops).
  *
  * The merged-symbol resume rule lives in `lastStart`: after a merge
  * the merged symbol (a+b) becomes the last symbol, so an immediately
  * following `b` cannot merge again ("dining" with (i,n) gives
  * [d,in,in,g], never [d,ini,n,g] or [d,in,i,n,g]).
  */
case class BpeMergeAll(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_merge expects (string, string, string), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")

  override def nullSafeEval(s: Any, a: Any, b: Any): Any =
    BpeMergeAll.merge(
      s.asInstanceOf[UTF8String],
      a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, a, b) =>
      s"${ev.value} = graft.plans.BpeMergeAll.merge($s, $a, $b);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BpeMergeAll =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeMergeAll {

  /** The compiled fold. Token charset is the normalized [a-z0-9]
    * alphabet (TextFunctions.tokens), so Java char semantics and
    * UTF8String byte semantics agree; `lastStart` is the index in the
    * accumulator where the most recently appended symbol begins —
    * "the accumulator's last symbol equals a" is one region compare,
    * not an endsWith over the whole string.
    */
  def merge(symU: UTF8String, aU: UTF8String, bU: UTF8String): UTF8String = {
    val s = symU.toString
    val a = aU.toString
    val b = bU.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n + 2)
    sb.append(' ')
    var lastStart = -1 // start of the last symbol within sb, or -1 = empty acc
    var i = 0
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        val st = i
        while (i < n && s.charAt(i) != ' ') i += 1
        val isB = (i - st) == b.length && s.regionMatches(st, b, 0, b.length)
        if (lastStart < 0) {
          lastStart = sb.length
          sb.append(s, st, i)
        } else if (isB && sb.length - lastStart == a.length &&
          sb.indexOf(a, lastStart) == lastStart) {
          // last symbol is exactly `a`: acc := acc-without-a + a + b,
          // i.e. append b; the merged symbol starts where `a` did
          sb.append(s, st, i)
        } else {
          sb.append(' ')
          lastStart = sb.length
          sb.append(s, st, i)
        }
      }
    }
    sb.append(' ')
    UTF8String.fromString(sb.toString)
  }
}

/** Session registration + Column-level API (VecFunctions pattern). */
object BpeFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_merge")))
      reg.createOrReplaceTempFunction(
        "bpe_merge", exprs => BpeMergeAll(exprs(0), exprs(1), exprs(2)), "built-in")
  }

  /** Requires `register(spark)` (or the session extensions) first. */
  def bpeMerge(sym: Column, a: Column, b: Column): Column =
    call_function("bpe_merge", sym, a, b)
}
