package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Wave-49: script detection (new CharClassCounts codegen
  * expression), difference-in-differences, Poisson-bootstrap CI —
  * from-scratch re-derivations plus constructed known-answer and
  * expression-equivalence fixtures.
  */
class Wave49Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("char_class_counts equals the regex formulation on mixed text") {
    // unicode fixture: latin, digits, cyrillic, greek, cjk, emoji
    // (4-byte, counted in n_cp, in no class), mixed in one string
    val rows = Seq(
      "hello world 123",
      "Привет мир 42 ok",
      "αβγδε φχψω",
      "你好世界 hello",
      "😀😀 abc Ж λ 你",
      "",
      "!!! ??? ...")
    val df = rows.toDF("text")
      .withColumn("cc", graft.plans.TextRunFunctions.charClassCounts(col("text")))
    graft.plans.TextRunFunctions.register(spark)
    val got = df.selectExpr("cc.latin", "cc.digit", "cc.cyr", "cc.greek",
      "cc.cjk", "cc.n_cp").as[(Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    val expected = rows.map { t =>
      val cps = t.codePoints().toArray
      (cps.count(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')).toLong,
        cps.count(c => c >= '0' && c <= '9').toLong,
        cps.count(c => c >= 0x0400 && c <= 0x04FF).toLong,
        cps.count(c => c >= 0x0370 && c <= 0x03FF).toLong,
        cps.count(c => c >= 0x4E00 && c <= 0x9FFF).toLong,
        cps.length.toLong)
    }
    assert(got == expected, s"first diff: ${got.zip(expected)
      .find(p => p._1 != p._2)}")
    // and equals the regex formulation (the oracle's shape) per class
    val viaRegex = rows.toDF("text").selectExpr(
      "length(regexp_replace(text, '[^A-Za-z]', '')) AS lat",
      "length(regexp_replace(text, '[^0-9]', '')) AS dig",
      "length(regexp_replace(text, '[^\\u0400-\\u04FF]', '')) AS cyr")
      .as[(Int, Int, Int)].collect().toSeq
    assert(got.map(g => (g._1.toInt, g._2.toInt, g._3.toInt)) == viaRegex)
  }

  test("script_detect: constructed corpus classifies each script") {
    val dir = tmpDir("wave49_script")
    Seq(
      (1L, "hello plain english text", "en", "web", 24L),
      (2L, "Привет мир это кириллица", "ru", "web", 24L),
      (3L, "你好世界这是中文文本", "zh", "web", 10L),
      (4L, "αβγ δεζ ηθι κλμ", "el", "web", 15L),
      (5L, "123 456 789 000", "en", "web", 15L),
      (6L, "abc Привет 你好 ok", "en", "web", 17L),
      (7L, "!!! ... ???", "en", "web", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("script_detect")(spark, dir)
      .select("lang", "script")
      .as[(String, String)].collect().toSet
    assert(got == Set(("en", "latin"), ("ru", "cyrillic"), ("zh", "cjk"),
      ("el", "greek"), ("en", "digit"), ("en", "mixed"), ("en", "none")),
      s"got $got")
  }

  test("did_estimator: matches a from-scratch 2x2 walk") {
    val ev = Tables.events(spark, sf)
      .filter("ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL")
      .selectExpr("user_id", "value", "event_type",
        "unix_millis(ts) DIV 86400000 AS day")
      .as[(Long, Double, String, Long)].collect()
    val cutoff = (ev.map(_._4).min + ev.map(_._4).max) / 2
    val treated = ev.filter(_._4 <= cutoff).groupBy(_._1).collect {
      case (u, xs) if xs.count(_._3 == "purchase") * 5 >= xs.length => u
    }.toSet
    def cell(g: Boolean, p: Boolean) =
      ev.filter(e => treated(e._1) == g && (e._4 > cutoff) == p)
    def mean(xs: Array[(Long, Double, String, Long)]): Option[Double] =
      if (xs.isEmpty) None
      else Some(xs.map(e => BigDecimal(e._2)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / xs.length)
    val (c00, c01, c10, c11) =
      (cell(false, false), cell(false, true), cell(true, false), cell(true, true))
    val got = SparkEntry.queries("did_estimator")(spark, sf)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert((got._1, got._2, got._3, got._4) ==
      (c00.length.toLong, c01.length.toLong, c10.length.toLong, c11.length.toLong))
    assert(got._5 == mean(c00) && got._6 == mean(c01) &&
      got._7 == mean(c10) && got._8 == mean(c11), s"cell means: $got")
    val expDid = for {
      m11 <- mean(c11); m10 <- mean(c10); m01 <- mean(c01); m00 <- mean(c00)
    } yield (m11 - m10) - (m01 - m00)
    assert(got._9 == expDid, s"did: $got vs $expDid")
  }

  test("poisson_bootstrap_ci: matches a from-scratch replicate walk") {
    val ev = Tables.events(spark, sf)
      .filter("event_id IS NOT NULL AND value IS NOT NULL")
      .selectExpr("event_id", "value").as[(Long, Double)].collect()
    val e1 = math.exp(-1.0)
    val cum = Iterator.iterate((e1, 0)) { case (p, k) => (p / (k + 1), k + 1) }
      .map(_._1).take(8).toIndexedSeq.scanLeft(0.0)(_ + _).drop(1)
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val reps = (0 until 40).map { r =>
      var n = 0L
      var sv = BigDecimal(0)
      ev.foreach { case (id, v) =>
        val off = 8 * (r % 4)
        val u = java.lang.Long.parseLong(
          md5hex(s"${r / 4}:$id").substring(off, off + 8), 16)
          .toDouble / 4294967296.0
        val w = cum.indexWhere(u < _) match {
          case -1 => 8L
          case k => k.toLong
        }
        n += w
        sv += BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * w
      }
      (r, n, if (n > 0) sv.toDouble / n else Double.NaN)
    }
    val means = reps.map(_._3).filterNot(_.isNaN).sorted
    val lo = means(math.max(1, math.ceil(means.size * 0.025).toInt) - 1)
    val hi = means(math.min(means.size, math.ceil(means.size * 0.975).toInt) - 1)
    val got = SparkEntry.queries("poisson_bootstrap_ci")(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    assert(got.size == 40)
    got.zip(reps).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2, s"n_eff: $g vs $e")
      assert(g._3 == e._3 || (g._3.isNaN && e._3.isNaN), s"mean: $g vs $e")
      assert(g._4 == lo && g._5 == hi, s"ci: $g vs ($lo, $hi)")
    }
    // the CI must bracket the full-sample mean on this fixture
    val full = ev.map(p => BigDecimal(p._2)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / ev.length
    assert(lo <= full && full <= hi, s"CI ($lo, $hi) brackets $full")
  }
}
