package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-56 operators (round 12): MAP/MRR retrieval eval, Newman
  * modularity of the source partition over the near-dup graph, and
  * the Theta-method forecast. Each test checks SEMANTICS against an
  * independent driver-side brute-force replica on the sf0.001
  * fixture (the DuckDB oracle already pins cross-engine value
  * equality); replicas apply the same snap discipline, so
  * comparisons are exact to 1e-9.
  */
class Wave56Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, d: Int): Double = {
    val p = math.pow(10, d)
    val y = x * p + 0.5
    (y - (((y % 1.0) + 1.0) % 1.0)) / p
  }

  private def decSum(terms: Iterable[Double]): Double =
    terms.map(BigDecimal(_)).sum.toDouble

  test("map_eval: matches a brute-force AP/RR replica at K=10") {
    val rows = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"value", $"event_type")
      .where($"user_id".isNotNull)
      .as[(Long, Long, Option[Double], Option[String])].collect()
    val k = 10
    // .toSeq BEFORE flatMap: mapping a Map to (ap, rr) pairs would
    // re-key by ap and silently merge users with equal AP
    val perUser = rows.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      // value DESC NULLS LAST, event_id ASC
      val ranked = evs.sortBy { case (_, eid, v, _) =>
        (v.map(x => -x).getOrElse(Double.MaxValue), eid)
      }
      val rels = ranked.map(r => r._4.exists(t => t == "purchase" || t == "click"))
      val rTot = rels.count(identity).toLong
      if (rTot == 0) None
      else {
        var cum = 0L
        val apTerms = rels.take(k).zipWithIndex.flatMap { case (rel, i) =>
          if (rel) { cum += 1; Some(rnd(cum.toDouble / (i + 1).toDouble, 10)) }
          else None
        }
        val ap = rnd(decSum(apTerms) / math.min(rTot, k.toLong).toDouble, 8)
        val firstRel = rels.take(k).indexOf(true)
        val rr = if (firstRel < 0) 0.0 else rnd(1.0 / (firstRel + 1).toDouble, 8)
        Some((ap, rr))
      }
    }
    val wantMap = rnd(decSum(perUser.map(_._1)) / perUser.size.toDouble, 6)
    val wantMrr = rnd(decSum(perUser.map(_._2)) / perUser.size.toDouble, 6)
    val got = SparkEntry.queries("map_eval")(spark, sf)
      .as[(Long, Option[Double], Option[Double])].collect()
    assert(got.length == 1)
    val (nU, gMap, gMrr) = got.head
    assert(nU == perUser.size.toLong)
    assert(math.abs(gMap.get - wantMap) < 1e-9, s"MAP ${gMap.get} vs $wantMap")
    assert(math.abs(gMrr.get - wantMrr) < 1e-9, s"MRR ${gMrr.get} vs $wantMrr")
    // MRR >= MAP is NOT an identity, but both live in [0, 1]
    Seq(gMap.get, gMrr.get).foreach(v => assert(v >= 0.0 && v <= 1.0 + 1e-9))
  }

  test("graph_modularity: matches a brute-force replica over the pair table; identities hold") {
    val pairs = LlmQueries.pairTable(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val srcOf = Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, Option[String])].collect()
      .map { case (id, s2) => id -> s2.getOrElse("__null__") }.toMap
    val lab = pairs.map { case (a, b) => (srcOf(a), srcOf(b)) }
    val m = lab.length.toLong
    val dC = (lab.map(_._1) ++ lab.map(_._2)).groupBy(identity)
      .map { case (s2, g) => s2 -> g.length.toLong }
    val eC = lab.filter(p => p._1 == p._2).groupBy(_._1)
      .map { case (s2, g) => s2 -> g.length.toLong }
    val md = m.toDouble
    val terms = dC.map { case (s2, d2) =>
      val e = eC.getOrElse(s2, 0L)
      s2 -> ((e, d2, rnd(e.toDouble / md -
        (d2.toDouble / (2.0 * md)) * (d2.toDouble / (2.0 * md)), 10)))
    }
    val q = rnd(decSum(terms.valuesIterator.map(_._3).toSeq), 8)
    val got = SparkEntry.queries("graph_modularity")(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(got.map(_._1).toSet == terms.keySet, "community set")
    // identities: sum of degree masses is 2m; intra edges <= m
    assert(got.map(_._3).sum == 2 * m, "sum d_c = 2m")
    assert(got.map(_._2).sum <= m)
    got.foreach { case (s2, e, d2, gm, fr, gq) =>
      withClue(s"community $s2: ") {
        val (we, wd, _) = terms(s2)
        assert(e == we && d2 == wd && gm == m)
        assert(math.abs(fr - rnd(e.toDouble / md, 6)) < 1e-12)
        assert(math.abs(gq - q) < 1e-9, s"Q $gq vs $q")
        assert(gq >= -1.0 - 1e-9 && gq <= 1.0 + 1e-9)
      }
    }
  }

  test("theta_forecast: matches a brute-force SES+drift replica") {
    val cells = Tables.events(spark, sf)
      .where($"ts".isNotNull && $"event_type".isNotNull)
      .selectExpr("event_type", "unix_millis(ts) DIV 86400000 AS day")
      .as[(String, Long)].collect()
    val d0 = cells.map(_._2).min
    val d1 = cells.map(_._2).max
    val want = cells.groupBy(_._1).flatMap { case (t, g) =>
      val counts = g.groupBy(_._2).map { case (dd, gg) => dd -> gg.length.toLong }
      val s = (d0 to d1).map(dd => counts.getOrElse(dd, 0L)).toArray
      val n = s.length
      if (n < 9) None
      else {
        val nTrain = n - 7
        var l = s(0).toDouble
        (2 to nTrain).foreach(i => l = 0.5 * s(i - 1).toDouble + 0.5 * l)
        val sxt = (1 to nTrain).map(t2 => BigInt(t2) * BigInt(s(t2 - 1))).sum
        val sx = (1 to nTrain).map(t2 => BigInt(s(t2 - 1))).sum
        val num = BigInt(12) * sxt - BigInt(6) * BigInt(nTrain + 1) * sx
        val den = BigInt(nTrain).pow(3) - BigInt(nTrain)
        val b = num.toDouble / den.toDouble
        val mae = (1 to 7).map(h =>
          math.abs(l + h.toDouble * (b * 0.5) - s(nTrain + h - 1).toDouble))
          .sum / 7.0
        Some(t -> ((n.toLong, rnd(l, 6), rnd(b, 6),
          rnd(l + 1.0 * (b * 0.5), 6), rnd(mae, 6))))
      }
    }
    val got = SparkEntry.queries("theta_forecast")(spark, sf)
      .as[(String, Int, Double, Double, Double, Double)].collect()
    assert(got.map(_._1).toSet == want.keySet, "type set")
    got.foreach { case (t, n, l, b, f1, mae) =>
      withClue(s"type $t: ") {
        val (wn, wl, wb, wf, wm) = want(t)
        assert(n.toLong == wn)
        assert(math.abs(l - wl) < 1e-9, s"level $l vs $wl")
        assert(math.abs(b - wb) < 1e-9, s"slope $b vs $wb")
        assert(math.abs(f1 - wf) < 1e-9)
        assert(math.abs(mae - wm) < 1e-9, s"mae $mae vs $wm")
        assert(mae >= 0.0)
      }
    }
  }
}
