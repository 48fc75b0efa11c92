package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Σ aᵢ·bᵢ over two `array<float>` columns, accumulated left-to-right
  * in double precision.
  *
  * Semantically identical (bit-for-bit: same IEEE operation order) to
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0d, _+_)` — but the
  * higher-order route falls back to interpreted evaluation with
  * per-element boxing, while this expression participates in
  * whole-stage codegen with a primitive loop. On the 100M+-pair
  * similarity joins this is the hot inner loop, which is exactly the
  * case SURVEY.md §7 reserves custom Catalyst work for.
  */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** SparkSessionExtensions hook: the production path for shipping the
  * engine's Catalyst extensions to every session on a cluster —
  * `spark.sql.extensions=graft.plans.GraftSparkExtensions` (or
  * `builder.withExtensions(new GraftSparkExtensions)`) injects
  * `vec_dot` at session build time, so plain SQL users get the
  * codegen'd expression without any driver-side register call. The
  * test harness builds its shared session through this class
  * (SparkSpecBase), which is what SqlSurfaceSpec's bare-SQL vec_dot
  * query exercises.
  */
class GraftSparkExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("bpe_merge"),
      new ExpressionInfo(classOf[BpeMergeAll].getName, "bpe_merge"),
      (exprs: Seq[Expression]) => BpeMergeAll(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("char_run_counts"),
      new ExpressionInfo(classOf[CharRunCounts].getName, "char_run_counts"),
      (exprs: Seq[Expression]) => CharRunCounts(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("char_class_counts"),
      new ExpressionInfo(classOf[CharClassCounts].getName, "char_class_counts"),
      (exprs: Seq[Expression]) => CharClassCounts(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("norm_text"),
      new ExpressionInfo(classOf[NormText].getName, "norm_text"),
      (exprs: Seq[Expression]) => NormText(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => BoundedLevenshteinRule)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

/** Session registration + Column-level API for the vector expressions. */
object VecFunctions {

  /** Idempotent per-session registration. The exists-check keeps
    * repeated calls (every query touching vectors registers defensively)
    * from logging a `SimpleFunctionRegistry` replaced-function warning
    * per call.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot")))
      reg.createOrReplaceTempFunction(
        "vec_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")
  }

  /** Requires `register(spark)` on the owning session first. */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
}
