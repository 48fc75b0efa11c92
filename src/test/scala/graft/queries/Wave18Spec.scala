package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Eighteenth-wave operators: vocabulary growth, Zipf profile,
  * embedding drift, content-hash snapshot diff.
  */
class Wave18Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("vocab_growth: equals an NTILE + first-occurrence replay") {
    val toks = graft.Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.TextFunctions.tokens($"text"))
      .as[(Long, Seq[String])].collect()
    val ids = toks.map(_._1).sorted
    val n = ids.length
    val decOf = ids.zipWithIndex.map { case (id, i) =>
      // NTILE(10) semantics: first (n % 10) tiles get one extra row
      val base = n / 10
      val extra = n % 10
      val cut = (1 to 10).scanLeft(0)((acc, t) =>
        acc + base + (if (t <= extra) 1 else 0)).tail
      id -> (cut.indexWhere(i < _) + 1)
    }.toMap
    val firstDoc = toks.flatMap { case (id, w) =>
      w.filter(_.nonEmpty).map(t => t -> id)
    }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val perDec = firstDoc.values.map(decOf).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("vocab_growth")(spark, sf)
      .as[(Int, Long, Long)].collect()
    assert(got.map(_._1).toSet == perDec.keySet)
    var cum = 0L
    got.sortBy(_._1).foreach { case (dec, newT, cumT) =>
      cum += perDec(dec)
      withClue(s"decile $dec: ") {
        assert(newT == perDec(dec)); assert(cumT == cum)
      }
    }
    // total distinct vocabulary accounted for
    assert(got.map(_._2).sum == firstDoc.size.toLong)
  }

  test("zipf_profile: top-20 and ratios equal driver recompute") {
    val tf = graft.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokens($"text"))
      .as[Seq[String]].collect().flatten.filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = tf.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    val tf1 = top.head._2.toDouble
    val got = SparkEntry.queries("zipf_profile")(spark, sf)
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    assert(got.length == top.length)
    got.zip(top).zipWithIndex.foreach {
      case (((rank, term, cnt, rel), (wTerm, wCnt)), i) =>
        withClue(s"rank ${i + 1}: ") {
          assert(rank == i + 1L)
          assert(term == wTerm && cnt == wCnt)
          assert(rel == math.floor(cnt.toDouble / tf1 * 1e6 + 0.5) / 1e6)
        }
    }
    // Zipf sanity: monotone non-increasing
    assert(got.map(_._4).toSeq == got.map(_._4).sortBy(-_).toSeq)
  }

  test("embedding_drift: matches un-snapped driver half-centroid math") {
    val embs = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    val got = SparkEntry.queries("embedding_drift")(spark, sf)
      .as[(Int, Long, Long, Double)].collect()
    val byLabel = embs.groupBy(_._2)
    assert(got.length == byLabel.size)
    got.foreach { case (lbl, nEven, nOdd, shift) =>
      val vs = byLabel(lbl)
      val (ev, od) = vs.partition(_._1 % 2 == 0)
      withClue(s"label $lbl: ") {
        assert(nEven == ev.length.toLong && nOdd == od.length.toLong)
        val dim = vs.head._3.length
        val s2 = (0 until dim).map { p =>
          val ce = ev.map(_._3(p).toDouble).sum / ev.length
          val co = od.map(_._3(p).toDouble).sum / od.length
          (ce - co) * (ce - co)
        }.sum
        assert(math.abs(shift - math.sqrt(s2)) < 1e-4,
          s"shift $shift vs ${math.sqrt(s2)}")
      }
    }
  }

  test("dataset_version_diff: content-hash diff equals driver replay") {
    val rows = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"lang",
        graft.functions.TextFunctions.fingerprint($"text"))
      .as[(Long, String, String)].collect()
    val want = rows.groupBy(r => (r._2, r._3)).map { case ((lang, _), ds) =>
      val v1 = ds.exists(_._1 % 10 != 9)
      val v2 = ds.exists(_._1 % 10 != 0)
      (lang, v1, v2)
    }.groupBy(_._1).map { case (lang, fps) =>
      lang -> ((fps.count(f => f._2 && !f._3).toLong,
        fps.count(f => !f._2 && f._3).toLong,
        fps.count(f => f._2 && f._3).toLong))
    }
    val got = SparkEntry.queries("dataset_version_diff")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == want.size)
    got.foreach { case (lang, removed, added, kept) =>
      val (wr, wa, wk) = want(lang)
      withClue(s"lang $lang: ") {
        assert(removed == wr); assert(added == wa); assert(kept == wk)
        assert(kept > 0, "80% overlap must keep fingerprints")
      }
    }
  }
}
