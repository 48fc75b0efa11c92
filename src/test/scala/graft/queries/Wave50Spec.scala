package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Wave-50: sequential-pattern mining, RAKE keyword extraction,
  * A-ES weighted sampling — from-scratch re-derivations plus
  * constructed known-answer fixtures.
  */
class Wave50Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, k: Int) = {
    val p = math.pow(10, k); math.floor(x * p + 0.5) / p
  }

  test("prefixspan_lite: matches a brute-force subsequence count") {
    val ev = Tables.events(spark, sf)
      .filter("user_id IS NOT NULL AND ts IS NOT NULL" +
        " AND event_type IS NOT NULL")
      .selectExpr("user_id", "event_id", "event_type", "unix_millis(ts)")
      .as[(Long, Long, String, Long)].collect()
    val seqs = ev.groupBy(_._1).map { case (_, xs) =>
      xs.sortBy(x => (x._4, x._2)).map(_._3).toSeq
    }.toSeq
    val types = ev.map(_._3).distinct.sorted
    def containsSub(seq: Seq[String], pat: Seq[String]): Boolean = {
      var i = 0
      for (t <- seq if i < pat.length) if (t == pat(i)) i += 1
      i == pat.length
    }
    val pats = (for (a <- types; b <- types) yield Seq(a, b)) ++
      (for (a <- types; b <- types; c <- types) yield Seq(a, b, c))
    val expected = pats.map { p =>
      (p.mkString(">"), p.length, seqs.count(containsSub(_, p)).toLong)
    }.filter(_._3 > 0)
      .map(r => (r._1, r._2, r._3, r._3.toDouble / seqs.size))
      .sortBy(r => (-r._3, r._1)).toSeq
    val got = SparkEntry.queries("prefixspan_lite")(spark, sf)
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    assert(got.exists(_._2 == 3), "3-patterns present on the fixture")
  }

  test("rake_keywords: constructed known-answer") {
    val dir = tmpDir("wave50_rake")
    // "deep learning" appears twice as a phrase; "the" splits runs
    Seq(
      (1L, "deep learning of the deep learning", "en", "web", 34L),
      (2L, "fast systems and deep learning", "en", "web", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("rake_keywords")(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    // phrases: "deep learning" x3, "fast systems" x1
    // freq: deep 3, learning 3, fast 1, systems 1
    // deg: deep 2+2+2=6, learning 6, fast 2, systems 2
    // scores: deep 2.0, learning 2.0, fast 2.0, systems 2.0
    // phrase scores: both 4.0; tie broken by phrase asc
    assert(got == Seq(("deep learning", 3L, 4.0), ("fast systems", 1L, 4.0)),
      s"got $got")
  }

  test("rake_keywords: fixture top-30 matches a from-scratch RAKE") {
    val stops = Set("the", "a", "of", "and", "to", "in", "is")
    val texts = Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokens($"text").as("t"))
      .as[Seq[String]].collect().map(_.filter(_.nonEmpty))
    val phrases = texts.flatMap { toks =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = scala.collection.mutable.ArrayBuffer.empty[String]
      toks.foreach { t =>
        if (stops(t)) { if (cur.nonEmpty) { out += cur.mkString(" "); cur.clear() } }
        else cur += t
      }
      if (cur.nonEmpty) out += cur.mkString(" ")
      out
    }
    val wordRows = phrases.flatMap { p =>
      val ws = p.split(" "); ws.map(w => (w, ws.length.toLong))
    }
    val wsc = wordRows.groupBy(_._1).map { case (w, xs) =>
      w -> rnd(xs.map(_._2).sum.toDouble / xs.length, 8)
    }
    val expected = phrases.groupBy(identity).map { case (p, xs) =>
      val score = p.split(" ").map(w => BigDecimal(wsc(w))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      (p, xs.length.toLong, score)
    }.toSeq.sortBy(r => (-r._3, r._1)).take(30)
    val got = SparkEntry.queries("rake_keywords")(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("weighted_sample_aes: matches a from-scratch exponential race") {
    val docs = Tables.documents(spark, sf)
      .filter("doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0")
      .selectExpr("doc_id", "n_chars").as[(Long, Long)].collect()
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val keyed = docs.map { case (id, w) =>
      val h = java.lang.Long.parseLong(md5hex(s"aes:$id").substring(0, 13), 16)
      val u = (h.toDouble + 1.0) / 4503599627370497.0
      (id, w, rnd(-math.log(u) / w.toDouble, 12))
    }
    val expected = keyed.sortBy(r => (r._3, r._1)).take(100).toSeq
    val got = SparkEntry.queries("weighted_sample_aes")(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // weight sanity: the sample is length-biased vs uniform
    val meanW = got.map(_._2).sum.toDouble / got.size
    val popW = docs.map(_._2).sum.toDouble / docs.size
    assert(meanW > popW, s"length-biased sample: $meanW vs pop $popW")
  }
}
