package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Twentieth-wave distribution-statistics operators. Arbiters are
  * driver-side from-scratch recomputations that do NOT share the
  * relational formulation: pairwise O(pos·neg) AUC, sorted-merge KS
  * sup-norm, brute-force all-pairs Pareto dominance, and direct
  * transition tallies — so a formulation bug (not just an engine
  * divergence) fails here even though the DuckDB oracle mirrors the
  * relational shape.
  */
class StatSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("auc_eval equals pairwise Mann-Whitney AUC") {
    val rows = graft.Tables.embeddings(spark, sf)
      .select($"embedding" (0).cast("double"), $"label")
      .as[(Double, Int)].collect()
    val pos = rows.filter(_._2 >= 5).map(_._1)
    val neg = rows.filter(_._2 < 5).map(_._1)
    var wins = 0.0
    for (p <- pos; n <- neg)
      wins += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val expected = wins / (pos.length.toDouble * neg.length)
    val r = SparkEntry.queries("auc_eval")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().head
    assert(r._1 == pos.length && r._2 == neg.length)
    assert(math.abs(r._4 - expected) < 1e-12,
      s"auc ${r._4} vs pairwise $expected")
  }

  test("ks_test equals sorted-scan sup-norm distance") {
    val ev = graft.Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
    val a = ev.filter(_._1 == "click").map(_._2).sorted
    val b = ev.filter(_._1 == "view").map(_._2).sorted
    val values = (a ++ b).distinct.sorted
    def ecdf(xs: Array[Double], v: Double): Double = {
      // count of elements <= v / n
      var lo = 0; var hi = xs.length
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (xs(mid) <= v) lo = mid + 1 else hi = mid
      }
      lo.toDouble / xs.length
    }
    val expected = values.map(v => math.abs(ecdf(a, v) - ecdf(b, v))).max
    val r = SparkEntry.queries("ks_test")(spark, sf)
      .select($"d_stat").as[Double].collect().head
    assert(math.abs(r - expected) < 1e-12, s"d_stat $r vs scan $expected")
  }

  test("hist_equidepth: balanced bins covering every row, ordered ranges") {
    val bins = SparkEntry.queries("hist_equidepth")(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(bins.length == 16)
    val total = graft.Tables.lineitem(spark, sf).count()
    assert(bins.map(_._2).sum == total)
    assert(bins.map(_._2).max - bins.map(_._2).min <= 1,
      "equi-depth bins must differ by at most one row")
    // bin value ranges are non-overlapping and ascending (ties at the
    // boundary may share a value; hi(k) <= lo(k+1) must still hold
    // because the order is tie-broken by a unique key)
    bins.sortBy(_._1).sliding(2).foreach {
      case Array(x, y) => assert(x._4 <= y._3 + 1e-9)
      case _           => ()
    }
  }

  test("event_transitions: probabilities sum to 1 per source state and counts tally") {
    val rows = SparkEntry.queries("event_transitions")(spark, sf)
      .as[(String, String, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (from, g) =>
      val s = g.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-9, s"p-sum for $from = $s")
    }
    // independent tally from the raw events
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id",
        org.apache.spark.sql.functions.unix_micros($"ts"),
        $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val tally = ev.groupBy(_._1).values.toSeq.flatMap { es =>
      es.toSeq.sortBy(e => (e._2, e._3)).sliding(2).collect {
        case Seq(p, c) => (p._4, c._4)
      }
    }.groupBy(x => x).map { case (k, v) => k -> v.size.toLong }
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap == tally)
  }

  test("chi2_terms: grid-complete, nonnegative, and Σ(o)=rt per term") {
    val rows = SparkEntry.queries("chi2_terms")(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.length == 30)
    assert(rows.forall(_._3 >= 0.0))
    // the term totals must match an independent count over the corpus
    val counts = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions
        .explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
      .filter($"t" =!= "").groupBy($"t").count()
      .as[(String, Long)].collect().toMap
    rows.foreach { case (term, rt, _) =>
      assert(counts(term) == rt, s"rt($term)")
    }
  }

  test("pareto_front equals brute-force dominance on the small fixture") {
    val pts = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars",
        graft.functions.TextFunctions.tokens($"text"))
      .as[(Long, Long, Seq[String])].collect()
      .map { case (id, x, toks) =>
        val y = toks.filter(_.nonEmpty).distinct.size.toLong
        (id, x, y)
      }
    val front = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.map(p => (p._1, p._2, p._3)).toSet
    val got = SparkEntry.queries("pareto_front")(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == front, s"skyline mismatch: got ${got.size}, want ${front.size}")
  }

  test("compaction_plan: bins equal driver-side largest-first packing walk") {
    val files = graft.Tables.documents(spark, sf)
      .select($"source", $"doc_id", $"n_chars")
      .as[(String, Long, Long)].collect()
    val expect = files.groupBy(_._1).toSeq.flatMap { case (src, fs) =>
      var cum = 0L
      fs.sortBy(f => (-f._3, f._2)).map { f =>
        cum += f._3
        (src, (cum - 1) / 4096 + 1, f._3)
      }
    }.groupBy(t => (t._1, t._2)).map { case ((src, bin), v) =>
      (src, bin) -> (v.size.toLong, v.map(_._3).sum, v.map(_._3).max)
    }
    val got = SparkEntry.queries("compaction_plan")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got == expect)
  }

  test("grouped_linear_fit: slope/intercept match driver-side OLS per source") {
    val rows = graft.Tables.documents(spark, sf)
      .select($"source",
        graft.functions.TextFunctions.nTokens($"text").cast("double"),
        graft.functions.TextFunctions.qualityScore($"text"))
      .as[(String, Double, Double)].collect().filter(_._2 > 0)
    val expect = rows.groupBy(_._1).map { case (src, g) =>
      val n = g.length.toDouble
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxx = g.map(r => r._2 * r._2).sum
      val sxy = g.map(r => r._2 * r._3).sum
      val den = n * sxx - sx * sx
      val b1 = if (den == 0.0) 0.0 else (n * sxy - sx * sy) / den
      src -> (g.length.toLong, b1, (sy - b1 * sx) / n)
    }
    val got = SparkEntry.queries("grouped_linear_fit")(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (src, n, b1, b0) =>
      val (en, eb1, eb0) = expect(src)
      assert(n == en, s"$src n")
      assert(math.abs(b1 - eb1) < 1e-5, s"$src slope $b1 vs $eb1")
      assert(math.abs(b0 - eb0) < 1e-5, s"$src intercept $b0 vs $eb0")
    }
  }

  test("iqr_outliers: fences from driver-side sorted quartiles") {
    val ev = graft.Tables.events(spark, sf)
      .select($"event_type", $"value", $"event_id")
      .as[(String, Double, Long)].collect()
    val got = SparkEntry.queries("iqr_outliers")(spark, sf)
      .as[(String, Long, Double, Double, Long, Long)].collect()
    got.foreach { case (et, n, q1, q3, nLow, nHigh) =>
      val vs = ev.filter(_._1 == et).sortBy(r => (r._2, r._3)).map(_._2)
      assert(n == vs.length)
      // NTILE boundary: tile 1 holds ceil-ish first quarter; its max
      // is the (bucketSize(1))-th order statistic
      def tileEnd(t: Int): Int = {
        val base = vs.length / 4; val extra = vs.length % 4
        (1 to t).map(i => base + (if (i <= extra) 1 else 0)).sum
      }
      assert(q1 == vs(tileEnd(1) - 1), s"$et q1")
      assert(q3 == vs(tileEnd(3) - 1), s"$et q3")
      val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
      assert(nLow == vs.count(_ < lo) && nHigh == vs.count(_ > hi), s"$et fences")
    }
  }

  test("ab_ttest: t statistic equals driver-side Welch computation") {
    val ev = graft.Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
    val a = ev.filter(_._1 == "click").map(_._2)
    val b = ev.filter(_._1 == "view").map(_._2)
    def mv(x: Array[Double]) = {
      val n = x.length.toDouble
      val m = x.sum / n
      (n, m, x.map(v => (v - m) * (v - m)).sum / (n - 1))
    }
    val (n1, m1, v1) = mv(a); val (n2, m2, v2) = mv(b)
    val t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    val r = SparkEntry.queries("ab_ttest")(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(r._1 == a.length && r._2 == b.length)
    assert(math.abs(r._3 - m1) < 1e-9 && math.abs(r._4 - m2) < 1e-9)
    assert(math.abs(r._5 - t) < 1e-6, s"t ${r._5} vs $t")
  }

  test("gini_concentration equals driver-side sorted-rank identity") {
    val rev = graft.Tables.orders(spark, sf)
      .select($"o_custkey", $"o_totalprice").as[(Long, Double)].collect()
      .groupBy(_._1).toSeq
      .map { case (k, v) =>
        (k, v.map(r => BigDecimal(r._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum)
      }
    val sorted = rev.sortBy { case (k, r) => (r, k) }
    val n = sorted.length.toDouble
    val tot = sorted.map(_._2).sum.toDouble
    val wsum = sorted.zipWithIndex
      .map { case ((_, r), i) => (i + 1) * r }.sum.toDouble
    val gini = (2.0 * wsum) / (n * tot) - (n + 1.0) / n
    val r = SparkEntry.queries("gini_concentration")(spark, sf)
      .as[(Long, Double, Double)].collect().head
    assert(r._1 == sorted.length)
    assert(math.abs(r._2 - tot) < 1e-6)
    assert(math.abs(r._3 - gini) < 1e-6, s"gini ${r._3} vs $gini")
    assert(r._3 >= 0.0 && r._3 <= 1.0)
  }

  test("triangle_count: wedge cap is dormant at fixture scale") {
    val maxDeg = LlmQueries.pairTable(spark, sf)
      .groupBy($"doc_a").count()
      .agg(org.apache.spark.sql.functions.max("count"))
      .as[Long].collect().headOption.getOrElse(0L)
    assert(maxDeg < 64,
      s"fixture out-degree $maxDeg reached WedgeCap; cap no longer dormant")
  }
}
