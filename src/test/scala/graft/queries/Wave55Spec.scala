package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-55 operators (round 12): mutual information, Jensen–Shannon
  * source-mix divergence, and the k-anonymity/l-diversity audit.
  * Each test checks SEMANTICS against an independent driver-side
  * brute-force replica on the sf0.001 fixture (the DuckDB oracle
  * already pins cross-engine value equality); replicas apply the
  * SAME snap discipline (10dp terms, decimal sums, snapped closing
  * ops), so comparisons are exact to 1e-9. Information-theoretic
  * bounds (MI ≤ min(H), JSD ≤ ln 2) are asserted as independent
  * sanity checks.
  */
class Wave55Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, d: Int): Double = {
    val p = math.pow(10, d)
    val y = x * p + 0.5
    (y - (((y % 1.0) + 1.0) % 1.0)) / p
  }

  private def decSum(terms: Iterable[Double]): Double =
    terms.map(BigDecimal(_)).sum.toDouble

  test("mutual_info: matches a brute-force replica; information inequalities hold") {
    val rows = Tables.documents(spark, sf)
      .select($"lang", $"source")
      .as[(Option[String], Option[String])].collect()
      .map { case (l, s2) => (l.getOrElse("__null__"), s2.getOrElse("__null__")) }
    val n = rows.length.toLong
    val joint = rows.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val mx = rows.groupBy(_._1).map { case (k, g) => k -> g.length.toLong }
    val my = rows.groupBy(_._2).map { case (k, g) => k -> g.length.toLong }
    val nd = n.toDouble
    val mi = rnd(decSum(joint.map { case ((x, y), c) =>
      rnd((c.toDouble / nd) *
        math.log((c.toDouble * nd) / (mx(x).toDouble * my(y).toDouble)), 10)
    }), 8)
    def h(m: Map[String, Long]): Double =
      rnd(0.0 - decSum(m.valuesIterator.map(c =>
        rnd((c.toDouble / nd) * math.log(c.toDouble / nd), 10)).toSeq), 8)
    val (hx, hy) = (h(mx), h(my))
    val nmi =
      if (hx * hy > 0.0) Some(rnd(mi / math.sqrt(hx * hy), 6)) else None
    val got = SparkEntry.queries("mutual_info")(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double, Option[Double])]
      .collect()
    assert(got.length == 1)
    val (gn, kx, ky, gmi, ghx, ghy, gnmi) = got.head
    assert(gn == n && kx == mx.size.toLong && ky == my.size.toLong)
    assert(math.abs(gmi - mi) < 1e-9, s"MI $gmi vs $mi")
    assert(math.abs(ghx - hx) < 1e-9 && math.abs(ghy - hy) < 1e-9)
    assert(gnmi.isDefined == nmi.isDefined)
    for (w <- nmi; v <- gnmi) assert(math.abs(v - w) < 1e-9)
    // I(X;Y) >= 0 and <= min(H(X), H(Y)) — snap slack only
    assert(gmi >= -1e-6, "MI must be non-negative")
    assert(gmi <= math.min(ghx, ghy) + 1e-6, "MI <= min entropy")
    gnmi.foreach(v => assert(v >= -1e-6 && v <= 1.0 + 1e-6))
  }

  test("js_divergence: matches a brute-force top-200+oov replica; 0 <= JSD <= ln 2") {
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text")
      .as[(Option[String], Option[String])].collect()
    val toks = docs.flatMap { case (src, t) =>
      val norm = t.getOrElse("").toLowerCase
        .replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ").trim
      if (norm.isEmpty) Array.empty[(String, String)]
      else norm.split(" ").map(w => (src.getOrElse("__null__"), w))
    }
    val topSet = toks.groupBy(_._2).map { case (t, g) => (t, g.length.toLong) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(200).map(_._1).toSet
    val mapped = toks.map { case (s2, t) =>
      (s2, if (topSet(t)) t else "__oov__")
    }
    val cell = mapped.groupBy(identity)
      .map { case (k, g) => k -> g.length.toLong }
    val cs = mapped.groupBy(_._1).map { case (k, g) => k -> g.length.toLong }
    val q = mapped.groupBy(_._2).map { case (k, g) => k -> g.length.toLong }
    val nn = mapped.length.toDouble
    val want = cs.map { case (src, csn) =>
      val (sp, sq) = q.toSeq.map { case (t, cq) =>
        val c = cell.getOrElse((src, t), 0L)
        val p = c.toDouble / csn.toDouble
        val qd = cq.toDouble / nn
        val m = (p + qd) / 2.0
        val pt = if (c > 0) rnd(p * math.log(p / m), 10) else 0.0
        val qt = rnd(qd * math.log(qd / m), 10)
        (pt, qt)
      }.unzip
      src -> ((csn, rnd(0.5 * decSum(sp) + 0.5 * decSum(sq), 8)))
    }
    val got = SparkEntry.queries("js_divergence")(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(got.map(_._1).toSet == want.keySet, "source set")
    got.foreach { case (src, nTok, jsd) =>
      withClue(s"source $src: ") {
        val (wn, wj) = want(src)
        assert(nTok == wn)
        assert(math.abs(jsd - wj) < 1e-9, s"JSD $jsd vs $wj")
        assert(jsd >= -1e-9 && jsd <= math.log(2.0) + 1e-6)
      }
    }
  }

  test("k_anonymity: matches a brute-force group audit; global stats recompute") {
    val rows = Tables.customer(spark, sf)
      .select($"c_nationkey", $"c_mktsegment", $"c_acctbal")
      .as[(Option[Int], Option[String], Option[Double])].collect()
      .map { case (nk, seg, bal) =>
        (nk.getOrElse(-1), seg.getOrElse("__null__"),
          bal.map(b => math.floor(b / 1000.0).toLong).getOrElse(-999999L))
      }
    val grp = rows.groupBy(r => (r._1, r._2)).map { case (k, g) =>
      k -> ((g.length.toLong, g.map(_._3).distinct.length.toLong))
    }
    val kAnon = grp.valuesIterator.map(_._1).min
    val lMin = grp.valuesIterator.map(_._2).min
    val nRows = rows.length.toLong
    val risky = grp.valuesIterator.map(_._1).filter(_ < 5L).sum
    val got = SparkEntry.queries("k_anonymity")(spark, sf)
      .as[(Int, String, Long, Long, Boolean, Long, Long, Long, Long, Double)]
      .collect()
    assert(got.map(r => (r._1, r._2)).toSet == grp.keySet, "group set")
    got.foreach { case (nk, seg, n, l, r, gk, gl, ng, gn, fr) =>
      withClue(s"group ($nk,$seg): ") {
        val (wn, wl) = grp((nk, seg))
        assert(n == wn && l == wl)
        assert(r == (n < 5L))
        assert(gk == kAnon && gl == lMin)
        assert(ng == grp.size.toLong && gn == nRows)
        assert(math.abs(fr - rnd(risky.toDouble / nRows.toDouble, 6)) < 1e-12)
        // l-diversity can never exceed the crowd size
        assert(l <= n)
      }
    }
  }
}
