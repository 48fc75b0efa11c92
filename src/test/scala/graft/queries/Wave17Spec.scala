package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Seventeenth-wave operators: b-bit MinHash, k-core peel, curriculum
  * phases, SimHash recall eval, GROUP BY ALL. Arbiters recompute from
  * the underlying artifacts driver-side.
  */
class Wave17Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("minhash_b_bit: bit agreement replayed from the signature table") {
    val sigs = LlmQueries.sigTable(spark, sf).collect().map { r =>
      r.getLong(0) -> (1 to 8).map(i =>
        Integer.parseInt(r.getString(i).substring(7, 8), 16) % 2)
    }.toMap
    val got = SparkEntry.queries("minhash_b_bit")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, agree, est) =>
      val want = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong
      withClue(s"pair ($a,$b): ") {
        assert(agree == want)
        assert(est == (agree.toDouble / 8.0) * 2.0 - 1.0)
      }
    }
  }

  test("kcore_peel: equals a driver-side two-round peel") {
    val edges = LlmQueries.pairTable(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    def degrees(es: Seq[(Long, Long)]): Map[Long, Long] =
      (es.map(_._1) ++ es.map(_._2)).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
    val d0 = degrees(edges.toSeq)
    val killed1 = d0.filter(_._2 < 2).keySet
    val e1 = edges.filterNot { case (a, b) => killed1(a) || killed1(b) }
    val d1 = degrees(e1.toSeq).withDefaultValue(0L)
    val got = SparkEntry.queries("kcore_peel")(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    assert(got.length == d0.size)
    got.foreach { case (id, deg0, degAfter, round) =>
      withClue(s"node $id: ") {
        assert(deg0 == d0(id))
        assert(degAfter == d1(id))
        val wantRound = if (d0(id) < 2) 1 else if (d1(id) < 2) 2 else 0
        assert(round == wantRound)
      }
    }
  }

  test("curriculum_schedule: equals an NTILE replay over engine features") {
    val rows = graft.Tables.documents(spark, sf)
      .select($"lang", $"doc_id",
        graft.functions.TextFunctions.nTokens($"text").cast("long"),
        graft.functions.TextFunctions.qualityScore($"text"))
      .as[(String, Long, Long, Double)].collect()
    val assigned: Seq[((String, Int), (Long, Double))] =
      rows.groupBy(_._1).toSeq.flatMap { case (lang, rs) =>
        val ordered = rs.toSeq.sortBy { case (_, id, _, q) => (q, id) }
        val n = ordered.length
        // NTILE(3): first (n % 3) tiles get one extra row
        val base = n / 3
        val extra = n % 3
        val sizes = (1 to 3).map(t => base + (if (t <= extra) 1 else 0))
        val tiles = sizes.zipWithIndex.flatMap { case (sz, i) =>
          Seq.fill(sz)(i + 1)
        }
        ordered.zip(tiles).map { case ((_, _, nt, q), tile) =>
          ((lang, tile), (nt, q))
        }
      }
    val want = assigned.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.size.toLong, xs.map(_._2._1).sum,
        xs.map(_._2._2).min, xs.map(_._2._2).max))
    }
    val got = SparkEntry.queries("curriculum_schedule")(spark, sf)
      .as[(String, Int, Long, Long, Double, Double)].collect()
    assert(got.length == want.size)
    got.foreach { case (lang, phase, nDocs, nTok, qMin, qMax) =>
      val (wd, wt, wqn, wqx) = want((lang, phase))
      withClue(s"($lang, phase $phase): ") {
        assert(nDocs == wd); assert(nTok == wt)
        assert(qMin == wqn); assert(qMax == wqx)
      }
    }
    // curriculum property: phases are ordered easy→hard within lang
    got.groupBy(_._1).foreach { case (lang, ps) =>
      val byPhase = ps.sortBy(_._2)
      byPhase.sliding(2).foreach {
        case Array(lo, hi) =>
          assert(lo._6 <= hi._5 || lo._6 <= hi._6,
            s"$lang: phase ${lo._2} max q ${lo._6} above phase ${hi._2}")
        case _ => ()
      }
    }
  }

  test("simhash_recall_eval: counts equal driver-side ground truth") {
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
    val cand = LlmQueries.defs("simhash_neardup")(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
      .filter { case (a, b) => a < 250 && b < 250 }.toSet
    val Seq((nTrue, nCand, nHit, recall, prec)) =
      SparkEntry.queries("simhash_recall_eval")(spark, sf)
        .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(nTrue == truePairs.size.toLong && nTrue > 0)
    assert(nCand == cand.size.toLong)
    assert(nHit == truePairs.intersect(cand).size.toLong)
    assert(recall == nHit.toDouble / nTrue.toDouble)
    assert(prec == (if (nCand == 0) 1.0 else nHit.toDouble / nCand.toDouble))
  }

  test("sql_group_by_all: equals the explicit grouping") {
    val got = SparkEntry.queries("sql_group_by_all")(spark, sf)
      .as[(String, String, Long, Double)].collect()
    val want = graft.Tables.orders(spark, sf)
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          $"o_totalprice".cast("decimal(18,2)")).cast("double").as("total"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (st, pr, n, total) =>
      val (wn, wt) = want((st, pr))
      assert(n == wn && total == wt, s"($st,$pr)")
    }
  }
}
