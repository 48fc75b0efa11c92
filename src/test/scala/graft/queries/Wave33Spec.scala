package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Wave-33 operators: template dedup, tokenizer fertility, candidate-
  * graph link prediction, gap sessionization, Mann-Whitney U,
  * Cramér's V, Benford conformance. Each test checks the SEMANTICS
  * against an independent driver-side brute-force replica on the
  * fixture (the oracle already pins cross-engine value equality).
  */
class Wave33Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("template_dedup: digit-masked skeletons cluster; distinct skeletons do not") {
    val dir = tmpDir("template")
    Seq(
      (1L, "Order 12345 shipped on day 3 to zone 7.", "en", "a", 1L),
      (2L, "Order 99 shipped on day 12 to zone 400.", "en", "a", 1L),
      (3L, "Order 5 shipped on day 1 to zone 2.", "en", "a", 1L),
      (4L, "A completely different sentence with 42 numbers.", "en", "a", 1L),
      (5L, "Another unique skeleton entirely.", "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("template_dedup")(spark, dir)
      .as[(String, Long, Long)].collect()
    // the full profile: one 3-doc cluster (docs 1-3 share the
    // digit-masked skeleton) leading the ordering, then 2 singletons
    assert(rows.length == 3, s"expected 3 template groups, got ${rows.toSeq}")
    assert(rows.head._2 == 3L && rows.head._3 == 1L,
      s"expected a 3-doc template cluster with rep 1 first, got ${rows.toSeq}")
    assert(rows.tail.forall(_._2 == 1L), s"singleton tail wrong: ${rows.toSeq}")
  }

  test("tokenizer_fertility: per-lang ratio >= 1 and sums match the per-doc token_count table") {
    val fert = SparkEntry.queries("tokenizer_fertility")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(fert.nonEmpty)
    // the BPE-ish pre-tokenizer never produces fewer pieces than
    // whitespace words (every normalized word contains at least one
    // letter-run/digit/punct token)
    assert(fert.forall(_._5 >= 1.0),
      s"fertility below 1: ${fert.filter(_._5 < 1.0).toSeq}")
    val perDoc = SparkEntry.queries("token_count")(spark, sf)
      .as[(Long, Int, Int)].collect()
    assert(fert.map(_._3).sum == perDoc.map(_._2.toLong).sum,
      "ws_tokens totals diverge from token_count")
    assert(fert.map(_._4).sum == perDoc.map(_._3.toLong).sum,
      "bpe_tokens totals diverge from token_count")
  }

  test("jaccard_link_pred: matches driver-side brute force on the fixture graph; cap dormant") {
    val rows = SparkEntry.queries("jaccard_link_pred")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double, Boolean)].collect()
    assert(rows.forall(!_._7), "WedgeCap engaged at fixture scale")
    val edges = LlmQueries.pairTable(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val adj = (edges.toSeq ++ edges.toSeq.map { case (a, b) => (b, a) })
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
    // brute-force: all non-edge pairs at distance 2, exact Jaccard
    val brute = (for {
      (u, nu) <- adj.toSeq
      v <- nu; w <- nu
      if v < w && !edges.contains((v, w))
    } yield (v, w)).distinct.map { case (v, w) =>
      val cn = adj(v).intersect(adj(w)).size.toLong
      val j = cn.toDouble / (adj(v).size + adj(w).size - cn).toDouble
      (v, w, cn, math.floor(j * 1e6 + 0.5) / 1e6)
    }
    val bruteMap = brute.map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    rows.foreach { case (a, b, cn, da, db, jacc, _) =>
      val (bcn, bj) = bruteMap((a, b))
      assert(cn == bcn && jacc == bj && da == adj(a).size && db == adj(b).size,
        s"pair ($a,$b): got (cn=$cn, j=$jacc, $da, $db), brute (cn=$bcn, j=$bj)")
    }
    // top-of-list check: nothing brute-force scores above the head row
    if (rows.nonEmpty) {
      val best = brute.map(_._4).max
      assert(rows.head._6 == best, s"head jacc ${rows.head._6} != brute best $best")
    }
  }

  test("sessionize: matches a driver-side gap-split replica") {
    val got = SparkEntry.queries("sessionize")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "unix_millis(ts) as ms")
      .as[(Long, Long, String, Long)].collect()
    val brute = ev.groupBy(_._1).flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      var sid = 0L
      var prev = Option.empty[Long]
      val tagged = sorted.map { r =>
        if (prev.isEmpty || r._4 - prev.get > 1800000L) sid += 1
        prev = Some(r._4)
        (sid, r)
      }
      tagged.groupBy(_._1).map { case (s, g) =>
        (uid, s) -> (g.size.toLong, g.map(_._2._4).min, g.map(_._2._4).max,
          g.map(_._2._3).distinct.size.toLong)
      }
    }.toMap
    assert(got == brute,
      s"sessionize diverges from replica: ${got.toSet.diff(brute.toSet).take(3)} vs ${brute.toSet.diff(got.toSet).take(3)}")
  }

  test("mann_whitney: matches a driver-side rank-sum replica") {
    val Seq((na, nb, u1, tie, z)) = SparkEntry.queries("mann_whitney")(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val vals = graft.Tables.events(spark, sf)
      .filter($"event_type".isin("click", "view"))
      .select($"event_type" === "click", $"value").as[(Boolean, Double)].collect()
    val bna = vals.count(_._1).toLong
    val bnb = vals.count(!_._1).toLong
    // average ranks over the pooled sorted values
    val sorted = vals.sortBy(_._2)
    val groups = sorted.zipWithIndex.groupBy(_._1._2)
    var r1 = 0.0
    var tie3 = 0.0
    groups.foreach { case (_, g) =>
      val ranks = g.map(_._2 + 1)
      val avg = ranks.sum.toDouble / ranks.length
      r1 += avg * g.count(_._1._1)
      val t = g.length.toDouble
      tie3 += t * t * t - t
    }
    val bu1 = r1 - bna.toDouble * (bna + 1).toDouble / 2.0
    val n = (bna + bnb).toDouble
    val varU = bna.toDouble * bnb.toDouble / 12.0 *
      ((n + 1.0) - tie3 / (n * (n - 1.0)))
    val bz = (bu1 - bna.toDouble * bnb.toDouble / 2.0) / math.sqrt(varU)
    assert(na == bna && nb == bnb)
    assert(math.abs(u1 - bu1) < 1e-6, s"u1 $u1 vs brute $bu1")
    assert(tie == tie3, s"tie_term $tie vs brute $tie3")
    assert(math.abs(z - bz) < 1e-5, s"z $z vs brute $bz")
  }

  test("cramers_v: matches a driver-side contingency replica and sits in [0,1]") {
    val Seq((n, r, c, chi2, v)) = SparkEntry.queries("cramers_v")(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    val cells = graft.Tables.events(spark, sf)
      .selectExpr("coalesce(event_type, '__null__')",
        "coalesce(unix_millis(ts) DIV 3600000 % 24, -1)")
      .as[(String, Long)].collect()
    val byCell = cells.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rts = byCell.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cts = byCell.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val bn = cells.length.toLong
    var bchi = 0.0
    for ((t, rt) <- rts; (h, ct) <- cts) {
      val e = rt.toDouble * ct.toDouble / bn.toDouble
      val o = byCell.getOrElse((t, h), 0L).toDouble
      bchi += math.floor((o - e) * (o - e) / e * 1e6 + 0.5) / 1e6
    }
    val k = math.min(rts.size, cts.size).toDouble
    val bv = math.sqrt(bchi / (bn.toDouble * (k - 1.0)))
    assert(n == bn && r == rts.size.toLong && c == cts.size.toLong)
    assert(math.abs(chi2 - bchi) < 1e-6, s"chi2 $chi2 vs brute $bchi")
    assert(v >= 0.0 && v <= 1.0 && math.abs(v - bv) < 1e-5,
      s"v $v vs brute $bv")
  }

  test("image_neardup: matches a driver-side banded-Hamming replica; never vacuously empty") {
    val rows = SparkEntry.queries("image_neardup")(spark, sf)
      .as[(Long, Long, Int, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty, "no near-dup image pairs at fixture scale — the oracle check would be vacuous")
    // driver-side replica from the closed-form pixel model
    def ahash(id: Long): Long = {
      val px = Array.tabulate(16, 16)((x, y) =>
        java.lang.Math.floorMod(id * 7 + x * 3 + y * 5, 256L))
      val gmean = px.flatten.sum / 256
      var h = 0L
      for (by <- 0 until 8; bx <- 0 until 8)
        if ((px(2 * bx)(2 * by) + px(2 * bx + 1)(2 * by) +
          px(2 * bx)(2 * by + 1) + px(2 * bx + 1)(2 * by + 1)) / 4 > gmean)
          h |= 1L << (by * 8 + bx)
      h
    }
    val n = graft.Tables.documents(spark, sf).count()
    val groups = (0L until n).groupBy(ahash)
    val dh = groups.keys.toSeq
    val brute = (for {
      a <- dh; b <- dh
      if a < b
      if (0 until 4).exists(j => ((a >> (16 * j)) & 0xFFFF) == ((b >> (16 * j)) & 0xFFFF))
      hd = java.lang.Long.bitCount(a ^ b)
      if hd <= 6
    } yield (a, b) -> (hd, groups(a).size.toLong, groups(b).size.toLong,
      groups(a).min, groups(b).min)).toMap
    assert(rows.length == brute.size,
      s"pair count ${rows.length} vs replica ${brute.size}")
    rows.foreach { case (a, b, hd, na, nb, ra, rb, np) =>
      val (bhd, bna, bnb, bra, brb) = brute((a, b))
      assert(hd == bhd && na == bna && nb == bnb && ra == bra && rb == brb
        && np == bna * bnb, s"pair ($a,$b) diverges from replica")
    }
  }

  test("benford_test: digit spine complete, counts total, chi2 parts recompute") {
    val rows = SparkEntry.queries("benford_test")(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == (1 to 9), "digit spine incomplete")
    val nPos = graft.Tables.orders(spark, sf)
      .filter($"o_totalprice" > 0).count()
    assert(rows.map(_._2).sum == nPos,
      "digit counts do not total the positive-price row count")
    rows.foreach { case (d, cnt, obs, exp, chi) =>
      val e = math.log10(1.0 + 1.0 / d)
      assert(exp == math.floor(e * 1e6 + 0.5) / 1e6, s"digit $d exp_share")
      val nd = nPos.toDouble
      val bchi = math.floor((cnt - nd * e) * (cnt - nd * e) / (nd * e) * 1e6 + 0.5) / 1e6
      assert(chi == bchi, s"digit $d chi2_part $chi vs $bchi")
      assert(obs == math.floor(cnt / nd * 1e6 + 0.5) / 1e6, s"digit $d obs_share")
    }
  }
}
