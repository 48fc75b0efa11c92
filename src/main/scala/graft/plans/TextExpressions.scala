package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character-class run counter over a string column:
  * `struct(words, syllables, sentences)` where
  *
  *  - words     = maximal `[a-zA-Z0-9]+` runs,
  *  - syllables = maximal `[aeiouyAEIOUY]+` runs,
  *  - sentences = maximal `[.!?]+` runs.
  *
  * Exactly the three `regexp_count` calls flesch_readability needs,
  * fused into ONE traversal of the raw UTF-8 bytes with no regex
  * machinery and no lowercased copy. Byte-level ASCII classification
  * is semantics-preserving: every non-ASCII code point is encoded as
  * bytes ≥ 0x80, which belong to none of the three classes — the same
  * "breaks the run, never extends it" behavior the Java-regex and RE2
  * character classes give, so counts are identical to the regex
  * formulation on any UTF-8 input (pinned corpus-wide by Wave42Spec).
  *
  * The 10× scale sweep measured the three-regex formulation at 71 s
  * (the whole query's cost); this expression participates in
  * whole-stage codegen with a primitive byte loop — the
  * FloatVecDot rationale applied to the text-quality hot path.
  */
case class CharRunCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharRunCounts.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"char_run_counts expects string, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    var w = 0L; var y = 0L; var sn = 0L
    var inW = false; var inY = false; var inS = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      val isW = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9')
      val isY = c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' ||
        c == 'y' || c == 'A' || c == 'E' || c == 'I' || c == 'O' ||
        c == 'U' || c == 'Y'
      val isS = c == '.' || c == '!' || c == '?'
      if (isW && !inW) w += 1
      if (isY && !inY) y += 1
      if (isS && !inS) sn += 1
      inW = isW; inY = isY; inS = isS
      i += 1
    }
    new GenericInternalRow(Array[Any](w, y, sn))
  }

  // Generated-Java style constraints (all three bit Janino here): no
  // // comments (contexts that collapse newlines would swallow the
  // next statement), and NEVER continue a line with a leading "||" —
  // the javaCode Block wrapper applies its own stripMargin('|'), so a
  // line starting with optional whitespace + '|' loses those chars and
  // the mangled Java ("(a && b) (c && d)") then reads as a cast.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val ch = ctx.freshName("c")
      val w = ctx.freshName("w")
      val y = ctx.freshName("y")
      val sn = ctx.freshName("sn")
      val inW = ctx.freshName("inW")
      val inY = ctx.freshName("inY")
      val inS = ctx.freshName("inS")
      val isW = ctx.freshName("isW")
      val isY = ctx.freshName("isY")
      val isS = ctx.freshName("isS")
      s"""
         |byte[] $b = $c.getBytes();
         |long $w = 0L; long $y = 0L; long $sn = 0L;
         |boolean $inW = false; boolean $inY = false; boolean $inS = false;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  byte $ch = $b[$i];
         |  boolean $isW = $ch >= 'a' && $ch <= 'z' ||
         |    $ch >= 'A' && $ch <= 'Z' || $ch >= '0' && $ch <= '9';
         |  boolean $isY = $ch == 'a' || $ch == 'e' || $ch == 'i' ||
         |    $ch == 'o' || $ch == 'u' || $ch == 'y' || $ch == 'A' ||
         |    $ch == 'E' || $ch == 'I' || $ch == 'O' || $ch == 'U' ||
         |    $ch == 'Y';
         |  boolean $isS = $ch == '.' || $ch == '!' || $ch == '?';
         |  if ($isW && !$inW) $w++;
         |  if ($isY && !$inY) $y++;
         |  if ($isS && !$inS) $sn++;
         |  $inW = $isW; $inY = $isY; $inS = $isS;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[]{$w, $y, $sn});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharRunCounts =
    copy(child = newChild)
}

object CharRunCounts {
  val schema: StructType = StructType(Seq(
    StructField("words", LongType, nullable = false),
    StructField("syllables", LongType, nullable = false),
    StructField("sentences", LongType, nullable = false)))
}

/** One-pass writing-system classifier counts over a string column:
  * `struct(latin, digit, cyr, greek, cjk, n_cp)` — CODE-POINT counts
  * of Latin letters, ASCII digits, Cyrillic (U+0400–U+04FF), Greek
  * (U+0370–U+03FF), CJK Unified (U+4E00–U+9FFF), and the total
  * code-point count. The UTF-8 decode is inlined into the byte loop
  * (lead-byte dispatch, no String allocation, no regex): a 2-byte
  * lead consumes its continuation, a 3/4-byte lead likewise, and a
  * malformed lead degrades to one code point — so `n_cp` equals the
  * regex engines' code-point `length()` on any well-formed UTF-8 and
  * every class count equals the corresponding RE2/Java character-
  * class count (`[A-Za-z]`, `[0-9]`, `[\x{0400}-\x{04FF}]`, …).
  * CharRunCounts' fused-traversal rationale applied to script
  * detection: five regexp_replace passes collapse into one scan.
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharClassCounts.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"char_class_counts expects string, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    var lat = 0L; var dig = 0L; var cyr = 0L; var grk = 0L; var cjk = 0L
    var n = 0L
    var i = 0
    while (i < b.length) {
      val b0 = b(i) & 0xFF
      var cp = 0xFFFD
      var adv = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xE0) == 0xC0 && i + 1 < b.length) {
        cp = ((b0 & 0x1F) << 6) | (b(i + 1) & 0x3F); adv = 2
      } else if ((b0 & 0xF0) == 0xE0 && i + 2 < b.length) {
        cp = ((b0 & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) |
          (b(i + 2) & 0x3F); adv = 3
      } else if ((b0 & 0xF8) == 0xF0 && i + 3 < b.length) {
        cp = ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
          ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F); adv = 4
      }
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) lat += 1
      else if (cp >= '0' && cp <= '9') dig += 1
      else if (cp >= 0x0400 && cp <= 0x04FF) cyr += 1
      else if (cp >= 0x0370 && cp <= 0x03FF) grk += 1
      else if (cp >= 0x4E00 && cp <= 0x9FFF) cjk += 1
      n += 1
      i += adv
    }
    new GenericInternalRow(Array[Any](lat, dig, cyr, grk, cjk, n))
  }

  // Same generated-Java constraints as CharRunCounts (no //-comments,
  // no leading "||" continuations).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val b0 = ctx.freshName("b0")
      val cp = ctx.freshName("cp")
      val adv = ctx.freshName("adv")
      val lat = ctx.freshName("lat")
      val dig = ctx.freshName("dig")
      val cyr = ctx.freshName("cyr")
      val grk = ctx.freshName("grk")
      val cjk = ctx.freshName("cjk")
      val n = ctx.freshName("n")
      s"""
         |byte[] $b = $c.getBytes();
         |long $lat = 0L; long $dig = 0L; long $cyr = 0L;
         |long $grk = 0L; long $cjk = 0L; long $n = 0L;
         |int $i = 0;
         |while ($i < $b.length) {
         |  int $b0 = $b[$i] & 0xFF;
         |  int $cp = 0xFFFD;
         |  int $adv = 1;
         |  if ($b0 < 0x80) { $cp = $b0; }
         |  else if (($b0 & 0xE0) == 0xC0 && $i + 1 < $b.length) {
         |    $cp = (($b0 & 0x1F) << 6) ^ ($b[$i + 1] & 0x3F); $adv = 2;
         |  } else if (($b0 & 0xF0) == 0xE0 && $i + 2 < $b.length) {
         |    $cp = (($b0 & 0x0F) << 12) ^ (($b[$i + 1] & 0x3F) << 6)
         |      ^ ($b[$i + 2] & 0x3F); $adv = 3;
         |  } else if (($b0 & 0xF8) == 0xF0 && $i + 3 < $b.length) {
         |    $cp = (($b0 & 0x07) << 18) ^ (($b[$i + 1] & 0x3F) << 12)
         |      ^ (($b[$i + 2] & 0x3F) << 6) ^ ($b[$i + 3] & 0x3F); $adv = 4;
         |  }
         |  if ($cp >= 'A' && $cp <= 'Z') $lat++;
         |  else if ($cp >= 'a' && $cp <= 'z') $lat++;
         |  else if ($cp >= '0' && $cp <= '9') $dig++;
         |  else if ($cp >= 0x0400 && $cp <= 0x04FF) $cyr++;
         |  else if ($cp >= 0x0370 && $cp <= 0x03FF) $grk++;
         |  else if ($cp >= 0x4E00 && $cp <= 0x9FFF) $cjk++;
         |  $n++;
         |  $i += $adv;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[]{$lat, $dig, $cyr, $grk, $cjk, $n});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)
}

object CharClassCounts {
  val schema: StructType = StructType(Seq(
    StructField("latin", LongType, nullable = false),
    StructField("digit", LongType, nullable = false),
    StructField("cyr", LongType, nullable = false),
    StructField("greek", LongType, nullable = false),
    StructField("cjk", LongType, nullable = false),
    StructField("n_cp", LongType, nullable = false)))
}

/** One-pass text normalization — the engine's shared tokenization
  * primitive `trim(regexp_replace(regexp_replace(lower(text),
  * '[^a-z0-9\s]', ' '), '\s+', ' '))` fused into a single byte
  * traversal: lowercase once via the SAME `UTF8String.toLowerCase`
  * Spark's `lower()` uses, then emit the `[a-z0-9]+` runs joined by
  * single spaces. Equivalence argument: after the first regex every
  * non-`[a-z0-9]` code point is whitespace-or-space, the second
  * collapses each separator gap to one space, and trim drops the
  * ends — i.e. exactly "keep runs, single-space-join". Byte-level
  * classification is safe post-lowercase because every non-ASCII
  * code point encodes as bytes ≥ 0x80 (never in the kept range), so
  * runs are byte-exact (CharRunCounts' argument). The oracle keeps
  * the regex formulation, so every hash compare re-proves the
  * equivalence corpus-wide. The 10× long-doc sweep priced the
  * two-regex form at ~120 s for a single scan-bound consumer.
  */
case class NormText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"norm_text expects string, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NormText.norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NormText.norm($c)")

  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
}

object NormText {
  /** Static worker shared by eval and generated code. */
  def norm(s: UTF8String): UTF8String = {
    val b = s.toLowerCase.getBytes
    val out = new Array[Byte](b.length)
    var o = 0
    var inRun = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (!inRun && o > 0) { out(o) = ' '; o += 1 }
        out(o) = c; o += 1
        inRun = true
      } else {
        inRun = false
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }
}

/** Session registration + Column API (VecFunctions' pattern). */
object TextRunFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("char_run_counts")))
      reg.createOrReplaceTempFunction(
        "char_run_counts", exprs => CharRunCounts(exprs(0)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("char_class_counts")))
      reg.createOrReplaceTempFunction(
        "char_class_counts", exprs => CharClassCounts(exprs(0)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("norm_text")))
      reg.createOrReplaceTempFunction(
        "norm_text", exprs => NormText(exprs(0)), "built-in")
  }

  def normText(c: Column): Column = call_function("norm_text", c)

  def charRunCounts(c: Column): Column = call_function("char_run_counts", c)

  def charClassCounts(c: Column): Column =
    call_function("char_class_counts", c)
}
