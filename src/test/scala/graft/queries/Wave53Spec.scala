package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-53 operators (round 12): per-doc character entropy and the
  * Hill tail-index estimator. Each test checks SEMANTICS against an
  * independent driver-side brute-force replica on the sf0.001
  * fixture (the DuckDB oracle already pins cross-engine value
  * equality); the replica applies the SAME snap discipline (10dp
  * terms, decimal sums, snapped closing division), so comparisons
  * are exact to 1e-9.
  */
class Wave53Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, d: Int): Double = {
    val p = math.pow(10, d)
    val y = x * p + 0.5
    (y - (((y % 1.0) + 1.0) % 1.0)) / p
  }

  test("char_entropy: matches a brute-force per-doc entropy; bounds hold") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").where($"text".isNotNull)
      .as[(Long, String)].collect()
    val want = docs.flatMap { case (id, text) =>
      val s = text.toLowerCase.filter(c => c.isDigit || (c >= 'a' && c <= 'z'))
      if (s.isEmpty) None
      else {
        val counts = s.groupBy(identity).map { case (_, g) => g.length.toLong }
        val n = s.length.toLong
        val sum = counts.map { c =>
          val p = c.toDouble / n.toDouble
          BigDecimal(rnd(p * (math.log(p) / math.log(2.0)), 10))
        }.sum
        Some(id -> ((n, counts.size.toLong, rnd(-sum.toDouble, 8))))
      }
    }.toMap
    val got = SparkEntry.queries("char_entropy")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet == want.keySet, "doc set")
    got.foreach { case (id, n, dist, h) =>
      withClue(s"doc $id: ") {
        val (wn, wd, wh) = want(id)
        assert(n == wn && dist == wd)
        assert(math.abs(h - wh) < 1e-9, s"entropy $h vs $wh")
        // Shannon bounds: 0 <= H <= log2(|alphabet|)
        assert(h >= 0.0 && h <= math.log(dist.toDouble) / math.log(2.0) + 1e-9)
      }
    }
  }

  test("blocking_quality: counts tie to exact_dedup and the candidate graph; ratios recompute") {
    val row = SparkEntry.queries("blocking_quality")(spark, sf)
      .as[(Long, Long, Option[Double], Long, Long, Option[Double])].head()
    val (nDocs, nCand, rr, nTrue, tic, pc) = row
    // n_true is Σ C(m,2) over exact_dedup's copy groups — independent path
    val wantTrue = SparkEntry.queries("exact_dedup")(spark, sf)
      .select("n_copies").as[Long].collect()
      .map(m => m * (m - 1) / 2).sum
    assert(nTrue == wantTrue, s"true pairs $nTrue vs $wantTrue")
    assert(nDocs == graft.Tables.documents(spark, sf).count())
    assert(tic <= nTrue && tic <= nCand)
    val allPairs = nDocs.toDouble * (nDocs - 1).toDouble / 2.0
    assert(math.abs(rr.get - rnd(1.0 - nCand.toDouble / allPairs, 10)) < 1e-12)
    pc.foreach(p => assert(math.abs(p - rnd(tic.toDouble / nTrue.toDouble, 10)) < 1e-12))
    // the fixture plants exact duplicates with >= 3 tokens: the LSH
    // block must cover them all (pc = 1) or this corpus' blocking
    // parameters are wrong
    if (nTrue > 0) assert(pc.get >= 0.99, s"pair completeness ${pc.get}")
    assert(rr.get > 0.9, s"reduction ratio ${rr.get} — blocking is not blocking")
  }

  test("rocchio_expand: matches a brute-force PRF replica on the fixture") {
    val rows = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").where($"text".isNotNull)
      .as[(Long, String)].collect()
    val toks = rows.map { case (id, t) =>
      id -> t.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").trim
        .split("\\s+").filter(_.nonEmpty).toSeq
    }
    val nDocs = Tables.documents(spark, sf).count()
    val tf = toks.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (w, g) => ((id, w), g.length.toLong) }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val seeds = tf.groupBy(_._1._2).map { case (w, g) => w -> g.values.sum }
      .toSeq.sortBy { case (w, s) => (-s, w) }.take(2).map(_._1).toSet
    def w(id: Long, t: String): Double =
      rnd(tf((id, t)).toDouble * ((nDocs + 1).toDouble / (df(t) + 1).toDouble), 8)
    val ds = toks.map(_._1).distinct.flatMap { id =>
      val sc = seeds.toSeq.filter(t => tf.contains((id, t)))
        .map(t => BigDecimal(w(id, t))).sum
      if (sc > 0) Some(id -> sc.toDouble) else None
    }
    val top = ds.sortBy { case (id, sc) => (-sc, id) }.take(10).map(_._1)
    val r = top.length
    val cent = top.flatMap(id => toks.toMap.apply(id).distinct.map(t => t -> BigDecimal(w(id, t))))
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }
    val terms = cent.keySet ++ seeds
    val want = terms.toSeq.map { t =>
      val q0 = if (seeds(t)) 1.0 else 0.0
      (t, seeds(t),
        rnd(q0 + 0.75 * (cent.getOrElse(t, BigDecimal(0)).toDouble / r.toDouble), 8))
    }.sortBy { case (t, _, wt) => (-wt, t) }.take(20)
    val got = SparkEntry.queries("rocchio_expand")(spark, sf)
      .as[(String, Boolean, Double)].collect().toSeq
    assert(got == want, s"got $got\nwant $want")
  }

  test("hill_tail_index: matches a brute-force top-k replica; alpha recomputes from snapped H") {
    val vals = Tables.events(spark, sf)
      .selectExpr("event_type", "event_id",
        "CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS x")
      .where("event_type IS NOT NULL AND value IS NOT NULL" +
        " AND CAST(value AS DECIMAL(18,2)) > 0")
      .as[(String, Long, Double)].collect()
    val want = vals.groupBy(_._1).flatMap { case (t, rows) =>
      val top = rows.sortBy(r => (-r._3, r._2)).take(50)
      if (top.length < 10) None
      else {
        val xk = top.map(_._3).min
        val kEff = top.length
        val sum = top.dropRight(1).map(r =>
          BigDecimal(rnd(math.log(r._3 / xk), 10))).sum
        val h = rnd(sum.toDouble / (kEff - 1).toDouble, 8)
        val alpha = if (h > 0.0) Some(rnd(1.0 / h, 6)) else None
        Some(t -> ((kEff.toLong, xk, h, alpha)))
      }
    }
    val got = SparkEntry.queries("hill_tail_index")(spark, sf)
      .as[(String, Long, Double, Double, Option[Double])].collect()
    assert(got.map(_._1).toSet == want.keySet, "type set")
    got.foreach { case (t, k, xk, h, alpha) =>
      withClue(s"type $t: ") {
        val (wk, wxk, wh, walpha) = want(t)
        assert(k == wk && xk == wxk)
        assert(math.abs(h - wh) < 1e-9, s"H $h vs $wh")
        (alpha, walpha) match {
          case (Some(a), Some(wa)) => assert(math.abs(a - wa) < 1e-9)
          case (None, None)        => ()
          case other               => fail(s"alpha mismatch: $other")
        }
      }
    }
  }
}
