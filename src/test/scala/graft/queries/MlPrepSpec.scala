package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Fourteenth-wave ML-prep operators. The hash-driven ops
  * (epoch_shuffle, span_corruption) are recomputed from scratch with
  * java.security.MessageDigest — an arbiter that shares no code with
  * the queries or their DuckDB oracles (the BPE lesson). pca_power
  * and linear_probe are checked against plain-double driver math
  * (no decimal snapping), so the snapped distributed computation has
  * to land within float noise of the un-snapped reference.
  */
class MlPrepSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hexLong(h: String, digits: Int): Long =
    java.lang.Long.parseLong(h.take(digits), 16)

  // token counts via the engine's own tokenizer (the hash/shuffle math
  // is what this arbiter independently recomputes)
  private lazy val docToks: Seq[(Long, Long)] =
    graft.Tables.documents(spark, sf)
      .select($"doc_id",
        graft.functions.TextFunctions.nTokens($"text").cast("long"))
      .as[(Long, Long)].collect().toSeq

  test("epoch_shuffle: equals a MessageDigest re-shuffle from scratch") {
    val byShard = docToks.map { case (id, nt) =>
      val h = md5hex(s"epoch1:$id")
      (hexLong(h, 8) % 8, h, id, nt)
    }.groupBy(_._1)
    val want = byShard.map { case (shard, rows) =>
      val ranked = rows.sortBy { case (_, h, id, _) => (h, id) }.zipWithIndex
      val sig = ranked.map { case ((_, _, id, _), i) =>
        BigInt(hexLong(md5hex(s"sig:${i + 1}:$id"), 12))
      }.sum % 1000000007L
      shard -> (rows.size.toLong, rows.map(_._4).sum, sig.toLong)
    }
    val got = SparkEntry.queries("epoch_shuffle")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == want.size)
    got.foreach { case (shard, nDocs, nTok, sig) =>
      val (wDocs, wTok, wSig) = want(shard)
      withClue(s"shard $shard: ") {
        assert(nDocs == wDocs); assert(nTok == wTok); assert(sig == wSig)
      }
    }
  }

  test("span_corruption: equals a MessageDigest mask replay") {
    val got = SparkEntry.queries("span_corruption")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    val wantDocs = docToks.filter(_._2 > 0).toMap
    assert(got.length == wantDocs.size)
    got.foreach { case (id, nTok, nSpans, nMasked, frac) =>
      val nt = wantDocs(id)
      val starts = (0L until nt).map(p =>
        hexLong(md5hex(s"mask:$id:$p"), 8) % 100 < 15)
      val masked = (0L until nt).count(p =>
        (math.max(0L, p - 2) to p).exists(q => starts(q.toInt)))
      withClue(s"doc $id: ") {
        assert(nTok == nt)
        assert(nSpans == starts.count(identity).toLong)
        assert(nMasked == masked.toLong)
        assert(frac == masked.toDouble / nt.toDouble)
      }
    }
  }

  test("collocation_pmi: ratios match a driver-side count recompute") {
    val toks = graft.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokens($"text"))
      .as[Seq[String]].collect().map(_.filter(_.nonEmpty))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n1 = uni.values.sum.toDouble
    val pairs = toks.flatMap(w => w.zip(w.drop(1)))
    val n2 = pairs.length.toDouble
    val big = pairs.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 5).toMap
    def snap(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val want = big.map { case ((a, b), cab) =>
      (a, b) -> ((cab.toDouble / n2) / ((uni(a).toDouble / n1) * (uni(b).toDouble / n1)))
    }.map { case (k, r) => k -> snap(r) }
    val got = SparkEntry.queries("collocation_pmi")(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(got.nonEmpty && got.length <= 50)
    got.foreach { case (w1, w2, cab, ratio) =>
      withClue(s"($w1,$w2): ") {
        assert(cab == big((w1, w2)))
        assert(ratio == want((w1, w2)))
      }
    }
    // top-50 really is the top: every returned ratio >= every omitted one
    val omitted = want.keySet -- got.map(r => (r._1, r._2)).toSet
    if (omitted.nonEmpty && got.length == 50) {
      val floor = got.map(_._4).min
      assert(omitted.forall(k => want(k) <= floor))
    }
  }

  test("boilerplate_ngrams: df threshold replayed from driver shingles") {
    val docSh = graft.Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.TextFunctions.tokens($"text"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, w) => id -> w.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet }
      .filter(_._2.nonEmpty).toMap
    val df = docSh.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val got = SparkEntry.queries("boilerplate_ngrams")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == docSh.size)
    got.foreach { case (id, nSh, nBoiler, frac) =>
      val sh = docSh(id)
      val wantBoiler = sh.count(s => df(s) >= 5).toLong
      withClue(s"doc $id: ") {
        assert(nSh == sh.size.toLong)
        assert(nBoiler == wantBoiler)
        assert(frac == wantBoiler.toDouble / sh.size.toDouble)
      }
    }
  }

  test("vocab_coverage: OOV accounting replayed against the top-1000 vocab") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"lang", graft.functions.TextFunctions.tokens($"text"))
      .as[(String, Seq[String])].collect()
      .map { case (l, w) => l -> w.filter(_.nonEmpty) }
    val tf = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
    val vocab = tf.toSeq.sortBy { case (t, c) => (-c, t) }.take(1000)
      .map(_._1).toSet
    val got = SparkEntry.queries("vocab_coverage")(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    got.foreach { case (lang, nTok, nOov, rate) =>
      val toks = docs.filter(_._1 == lang).flatMap(_._2)
      val oov = toks.count(t => !vocab.contains(t)).toLong
      withClue(s"lang $lang: ") {
        assert(nTok == toks.length.toLong)
        assert(nOov == oov)
        assert(rate == oov.toDouble / toks.length.toDouble)
      }
    }
  }

  test("linear_probe: matches un-snapped driver-side OLS within float noise") {
    val feats = graft.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.normText($"text"),
        graft.functions.TextFunctions.tokens($"text"))
      .as[(String, Seq[String])].collect()
      .map { case (norm, w) => (norm, w.filter(_.nonEmpty)) }
      .filter(_._2.nonEmpty)
      .map { case (norm, w) =>
        val nt = w.size.toDouble
        val x1 = (norm.length - (w.size - 1)).toDouble / nt
        val x2 = w.distinct.size.toDouble / nt
        val stop = Set("the", "a", "of", "and", "to", "in", "is")
        val y = w.count(stop.contains).toDouble / nt
        (x1, x2, y)
      }
    val n = feats.length.toDouble
    def s(f: ((Double, Double, Double)) => Double): Double = feats.map(f).sum
    val (s1, s2) = (s(_._1), s(_._2))
    val (s11, s22, s12) = (s(t => t._1 * t._1), s(t => t._2 * t._2),
      s(t => t._1 * t._2))
    val (sy, s1y, s2y) = (s(_._3), s(t => t._1 * t._3), s(t => t._2 * t._3))
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)) / det
    val b1 = (n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)) / det
    val b2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)) / det
    val Seq((gotN, gb0, gb1, gb2)) = SparkEntry.queries("linear_probe")(spark, sf)
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(gotN == feats.length.toLong)
    assert(math.abs(gb0 - b0) < 1e-3, s"b0 $gb0 vs $b0")
    assert(math.abs(gb1 - b1) < 1e-3, s"b1 $gb1 vs $b1")
    assert(math.abs(gb2 - b2) < 1e-3, s"b2 $gb2 vs $b2")
  }

  test("pca_power: matches un-snapped driver-side power iteration") {
    val embs = graft.Tables.embeddings(spark, sf)
      .select($"embedding").as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    val dim = embs.head.length
    def iterate(v: Array[Double]): (Array[Double], Double) = {
      val w = new Array[Double](dim)
      embs.foreach { x =>
        var sBuf = 0.0
        var i = 0
        while (i < dim) { sBuf += x(i) * v(i); i += 1 }
        i = 0
        while (i < dim) { w(i) += sBuf * x(i); i += 1 }
      }
      val nrm = math.sqrt(w.map(c => c * c).sum)
      (w.map(_ / nrm), nrm)
    }
    val (v1, _) = iterate(Array.fill(dim)(0.125))
    val (v2, lambda) = iterate(v1)
    val got = SparkEntry.queries("pca_power")(spark, sf)
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    assert(got.length == dim)
    got.foreach { case (pos, loading, gl) =>
      assert(math.abs(loading - v2(pos)) < 1e-5, s"pos $pos: $loading vs ${v2(pos)}")
      assert(math.abs(gl - lambda) / lambda < 1e-6, s"lambda $gl vs $lambda")
    }
    val norm2 = got.map(r => r._2 * r._2).sum
    assert(math.abs(norm2 - 1.0) < 1e-4, s"not unit norm: $norm2")
  }

  test("ann_recall_eval: consistent with the two underlying knn queries") {
    val ex = LlmQueries.defs("knn_bruteforce")(spark, sf)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val iv = LlmQueries.defs("knn_ivf")(spark, sf)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = SparkEntry.queries("ann_recall_eval")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, hits, recall) =>
      val want = ex(q).intersect(iv.getOrElse(q, Set.empty)).size.toLong
      withClue(s"query $q: ") {
        assert(hits == want)
        assert(recall == want.toDouble / 5.0)
        assert(recall >= 0.0 && recall <= 1.0)
      }
    }
  }
}
