package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Fifteenth-wave QA/eval/resampling operators. Arbiters: driver-side
  * shingle-set ground truth for the LSH eval, MessageDigest replay
  * for the resample draw, from-scratch funnel attribution, plain
  * Scala prefix sums for the skew-free running-sum trim (which also
  * independently validates DistributedNtile.withRunningSum), and
  * un-snapped double math for the outlier z-scores.
  */
class QaSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("lsh_recall_eval: counts equal driver-side ground truth") {
    val sh = graft.Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.TextFunctions.tokens($"text"))
      .as[(Long, Seq[String])].collect()
      .filter(_._1 < 250)
      .map { case (id, w) => id -> w.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet }
      .filter(_._2.nonEmpty)
    val truePairs = (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      inter = (sa & sb).size
      if inter.toDouble / (sa.size + sb.size - inter).toDouble >= 0.4
    } yield (a, b)).toSet
    val cand = LlmQueries.defs("minhash_dedup")(spark, sf)
      .as[(Long, Long)].collect()
      .filter { case (a, b) => a < 250 && b < 250 }.toSet
    val Seq((nTrue, nCand, nHit, recall, prec)) =
      SparkEntry.queries("lsh_recall_eval")(spark, sf)
        .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(nTrue == truePairs.size.toLong)
    assert(nCand == cand.size.toLong)
    assert(nHit == truePairs.intersect(cand).size.toLong)
    assert(nTrue > 0, "fixture should contain true near-dup pairs in the sample")
    assert(recall == nHit.toDouble / nTrue.toDouble)
    assert(prec == (if (nCand == 0) 1.0 else nHit.toDouble / nCand.toDouble))
  }

  test("importance_resample: draw and threshold replay via MessageDigest") {
    val rows = SparkEntry.queries("importance_resample")(spark, sf)
      .as[(Long, Double, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_._5) && rows.exists(!_._5),
      "resample should keep some docs and drop some docs")
    rows.foreach { case (id, w, draw, keepBp, kept) =>
      val wantDraw = java.lang.Long.parseLong(
        md5hex(s"resample:$id").take(8), 16) % 10000
      withClue(s"doc $id: ") {
        assert(draw == wantDraw)
        // w in the output is 6dp-rounded while the query thresholds on
        // the raw weight — allow one basis point of rounding slack
        val wantBp = math.floor(math.min(1.0, w * 0.5) * 10000.0 + 0.5).toLong
        assert(math.abs(keepBp - wantBp) <= 1L, s"keep_bp $keepBp vs ~$wantBp")
        assert(kept == (draw < keepBp))
      }
    }
  }

  test("curation_funnel: first-kill attribution equals driver replay") {
    val perDoc = graft.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.langIdHeuristic($"text"),
        graft.functions.TextFunctions.nTokens($"text").cast("long"),
        graft.functions.TextFunctions.qualityScore($"text"))
      .as[(String, Long, Double)].collect()
    val want = perDoc.map { case (lang, nTok, q) =>
      val stage = if (lang == "unknown") "1_lang"
        else if (nTok < 16) "2_short"
        else if (q < 0.2) "3_quality" else "4_kept"
      (stage, nTok)
    }.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    val got = SparkEntry.queries("curation_funnel")(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet == want.keySet)
    val total = perDoc.length.toDouble
    got.foreach { case (stage, nDocs, nTok, share) =>
      val (wd, wt) = want(stage)
      withClue(s"stage $stage: ") {
        assert(nDocs == wd); assert(nTok == wt)
        assert(share == math.floor(wd.toDouble / total * 1e6 + 0.5) / 1e6)
      }
    }
  }

  test("embedding_outliers: z matches un-snapped driver math, ranked desc") {
    val embs = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    val byLabel = embs.groupBy(_._2)
    val stats = byLabel.map { case (lbl, vs) =>
      val dim = vs.head._3.length
      val cent = Array.tabulate(dim)(p => vs.map(_._3(p).toDouble).sum / vs.size)
      val d2s = vs.map { case (id, _, e) =>
        id -> e.zipWithIndex.map { case (x, p) =>
          (x.toDouble - cent(p)) * (x.toDouble - cent(p)) }.sum }
      val mean = d2s.map(_._2).sum / d2s.size
      val varr = d2s.map(t => t._2 * t._2).sum / d2s.size - mean * mean
      lbl -> (d2s.toMap, mean, math.sqrt(math.max(varr, 0.0)))
    }
    val got = SparkEntry.queries("embedding_outliers")(spark, sf)
      .as[(Long, Int, Double, Double)].collect()
    assert(got.length == 20)
    val zs = got.map(r => math.abs(r._4))
    assert(zs.toSeq == zs.sortBy(-_).toSeq, "not ranked by |z| desc")
    got.foreach { case (id, lbl, d2, z) =>
      val (d2s, mean, std) = stats(lbl)
      withClue(s"vec $id: ") {
        assert(math.abs(d2 - d2s(id)) < 1e-4)
        val wantZ = if (std == 0.0) 0.0 else (d2s(id) - mean) / std
        assert(math.abs(z - wantZ) < 1e-3, s"z $z vs $wantZ")
      }
    }
  }

  test("mixture_drift: exact parity-half recompute") {
    val srcs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val even = srcs.filter(_._1 % 2 == 0).groupBy(_._2).view.mapValues(_.length.toLong)
    val odd = srcs.filter(_._1 % 2 != 0).groupBy(_._2).view.mapValues(_.length.toLong)
    val (tEven, tOdd) = (even.values.sum.toDouble, odd.values.sum.toDouble)
    def snap(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val got = SparkEntry.queries("mixture_drift")(spark, sf)
      .as[(String, Long, Long, Double, Double, Double)].collect()
    got.foreach { case (src, nE, nO, pE, pO, drift) =>
      withClue(s"source $src: ") {
        assert(nE == even.getOrElse(src, 0L))
        assert(nO == odd.getOrElse(src, 0L))
        assert(pE == snap(nE / tEven)); assert(pO == snap(nO / tOdd))
        assert(drift == snap(math.abs(nE / tEven - nO / tOdd)))
      }
    }
  }

  test("token_budget_trim: equals driver-side prefix sums (validates withRunningSum)") {
    val base = graft.Tables.documents(spark, sf)
      .select($"source", $"doc_id",
        graft.functions.TextFunctions.nTokens($"text").cast("long"),
        graft.functions.TextFunctions.qualityScore($"text"))
      .as[(String, Long, Long, Double)].collect()
    val want = base.groupBy(_._1).map { case (src, rows) =>
      val ordered = rows.sortBy { case (_, id, _, q) => (-q, id) }
      var cum = 0L
      var (nKept, tokKept) = (0L, 0L)
      ordered.foreach { case (_, _, nt, _) =>
        if (cum < 1000L) { nKept += 1; tokKept += nt }
        cum += nt
      }
      src -> (rows.length.toLong, rows.map(_._3).sum, nKept, tokKept)
    }
    val got = SparkEntry.queries("token_budget_trim")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.length == want.size)
    got.foreach { case (src, nDocs, tokTotal, nKept, tokKept) =>
      val (wd, wt, wk, wtk) = want(src)
      withClue(s"source $src: ") {
        assert(nDocs == wd); assert(tokTotal == wt)
        assert(nKept == wk); assert(tokKept == wtk)
      }
    }
  }

  test("token_budget_trim plan: range-partitioned, no per-source global sort") {
    val df = SparkEntry.queries("token_budget_trim")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("rangepartitioning"),
      "running sum must be computed over range partitions")
  }
}
