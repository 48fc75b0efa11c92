package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Sixteenth-wave operators: media fingerprints, TPC-H Q7/Q8 shapes,
  * and triadic-closure link prediction. Arbiters recompute everything
  * from scratch driver-side: the fingerprint math from the closed
  * forms (codec correctness is implied by equality — a decoder that
  * returns different pixels/samples cannot reproduce the hash), the
  * TPC-H aggregates with BigDecimal joins over collected tables, and
  * the link scores from an adjacency-set intersection.
  */
class MediaGraphSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("image_ahash: equals closed-form pixel math (through the real codec)") {
    val got = SparkEntry.queries("image_ahash")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, meanPx, ahash, nSet) =>
      val px = Array.tabulate(16, 16)((x, y) =>
        java.lang.Math.floorMod(id * 7 + x * 3 + y * 5, 256L))
      val gmean = px.flatten.sum / 256
      var wantHash = 0L
      var wantSet = 0L
      for (by <- 0 until 8; bx <- 0 until 8) {
        val bsum = px(2 * bx)(2 * by) + px(2 * bx + 1)(2 * by) +
          px(2 * bx)(2 * by + 1) + px(2 * bx + 1)(2 * by + 1)
        if (bsum / 4 > gmean) {
          wantHash |= 1L << (by * 8 + bx); wantSet += 1
        }
      }
      withClue(s"doc $id: ") {
        assert(meanPx == gmean); assert(ahash == wantHash); assert(nSet == wantSet)
      }
    }
    // gradient images differ → hashes must discriminate
    assert(got.map(_._3).distinct.length > 1)
  }

  test("audio_fingerprint: equals closed-form energy deltas (through the real codec)") {
    val got = SparkEntry.queries("audio_fingerprint")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, nw, fp, nRise) =>
      val n = 800 + java.lang.Math.floorMod(id, 5L).toInt * 160
      val energies = (0 until n / 160).map { w =>
        (0 until 160).map { j =>
          val i = w * 160 + j
          val amp = java.lang.Math.floorMod(id * 31 + i.toLong * 17, 2003L) - 1001L
          amp * amp
        }.sum
      }
      var wantFp = 0L
      var wantRise = 0L
      energies.sliding(2).zipWithIndex.foreach { case (Seq(a, b), k) =>
        if (b > a) { wantFp |= 1L << k; wantRise += 1 }
      }
      withClue(s"doc $id: ") {
        assert(nw == (n / 160).toLong); assert(fp == wantFp); assert(nRise == wantRise)
      }
    }
  }

  private def revenue(ep: Double, disc: Double): BigDecimal =
    BigDecimal(ep).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
      (BigDecimal(1).setScale(2) -
        BigDecimal(disc).setScale(2, BigDecimal.RoundingMode.HALF_UP))

  test("tpch_volume_shipping: equals a BigDecimal driver recompute") {
    val li = graft.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount",
        org.apache.spark.sql.functions.year($"l_shipdate"))
      .as[(Long, Long, Double, Double, Int)].collect()
    val ord = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey").as[(Long, Long)].collect().toMap
    val supN = graft.Tables.supplier(spark, sf)
      .select($"s_suppkey", $"s_nationkey").as[(Long, Int)].collect().toMap
    val custN = graft.Tables.customer(spark, sf)
      .select($"c_custkey", $"c_nationkey").as[(Long, Int)].collect().toMap
    val natReg = graft.Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_regionkey").as[(Int, Int)].collect().toMap
    val regName = graft.Tables.region(spark, sf)
      .select($"r_regionkey", $"r_name").as[(Int, String)].collect().toMap
    def regionOf(nk: Int): String = regName(natReg(nk))
    val want = li.flatMap { case (ok, sk, ep, disc, yr) =>
      for {
        ck <- ord.get(ok)
        sr <- supN.get(sk).map(regionOf)
        cr <- custN.get(ck).map(regionOf)
        if sr != cr
      } yield ((sr, cr, yr), revenue(ep, disc))
    }.groupBy(_._1).view.mapValues(xs => (xs.map(_._2).sum, xs.length.toLong)).toMap
    val got = SparkEntry.queries("tpch_volume_shipping")(spark, sf)
      .as[(String, String, Int, Double, Long)].collect()
    assert(got.nonEmpty)
    assert(got.map(r => (r._1, r._2, r._3)).toSet == want.keySet)
    got.foreach { case (sr, cr, yr, rev, n) =>
      val (wRev, wN) = want((sr, cr, yr))
      withClue(s"($sr,$cr,$yr): ") {
        assert(n == wN); assert(rev == wRev.toDouble)
      }
    }
  }

  test("tpch_market_share: share is the exact decimal-revenue ratio") {
    val got = SparkEntry.queries("tpch_market_share")(spark, sf)
      .as[(Int, Option[Double], Double, Option[Double])].collect()
    assert(got.nonEmpty)
    got.foreach { case (yr, natRev, totRev, share) =>
      withClue(s"year $yr: ") {
        assert(totRev > 0.0)
        (natRev, share) match {
          case (Some(nr), Some(sh)) =>
            assert(nr >= 0.0 && nr <= totRev)
            assert(sh == math.floor(nr / totRev * 1e6 + 0.5) / 1e6)
          case (None, None) => () // no NATION_2 revenue that year
          case other => fail(s"inconsistent null-ness: $other")
        }
      }
    }
  }

  test("nn_descent_step: scores equal adjacency-set recompute; all true non-edges") {
    // rebuild the label-blocked top-3 kNN digraph driver-side with
    // plain double cosines (independent of the query's norm-cached
    // formulation), then symmetrize and count wedges
    val embs = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    def snap6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byLabel = embs.groupBy(_._2)
    val knn = embs.flatMap { case (id, lbl, e) =>
      byLabel(lbl).filter(_._1 != id)
        .map { case (o, _, oe) => (o, snap6(cos(e, oe))) }
        .sortBy { case (o, c) => (-c, o) }.take(3)
        .map { case (o, _) => (id, o) }
    }
    val sym = (knn ++ knn.map(_.swap)).toSet
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      .toMap.withDefaultValue(Set.empty[Long])
    val got = SparkEntry.queries("nn_descent_step")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty, "kNN digraph should admit non-edge wedges")
    got.foreach { case (a, b, cn, degA, degB, jacc) =>
      withClue(s"pair ($a,$b): ") {
        assert(a < b)
        assert(!sym.contains((a, b)), "proposed pair is an existing edge")
        val wantCn = adj(a).intersect(adj(b)).size.toLong
        assert(cn == wantCn && cn >= 2)
        assert(degA == adj(a).size.toLong && degB == adj(b).size.toLong)
        val raw = cn.toDouble / (degA + degB - cn).toDouble
        assert(jacc == snap6(raw))
      }
    }
  }
}
