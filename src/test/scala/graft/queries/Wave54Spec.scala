package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-54 operators (round 12): one-way ANOVA, Jarque–Bera
  * normality, and Spearman rank correlation. Each test checks
  * SEMANTICS against an independent driver-side brute-force replica
  * on the sf0.001 fixture (the DuckDB oracle already pins
  * cross-engine value equality); the replicas apply the SAME snap
  * discipline (exact decimal/integer sums, snapped closing ops), so
  * comparisons are exact to 1e-9.
  */
class Wave54Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, d: Int): Double = {
    val p = math.pow(10, d)
    val y = x * p + 0.5
    (y - (((y % 1.0) + 1.0) % 1.0)) / p
  }

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100)
      .toLongExact

  private def groups(): Map[String, Array[Long]] =
    Tables.events(spark, sf)
      .select($"event_type", $"value").where($"value".isNotNull)
      .as[(Option[String], Double)].collect()
      .groupBy(_._1.getOrElse("__null__"))
      .map { case (g, rows) => g -> rows.map(r => cents(r._2)) }

  test("anova_oneway: matches a brute-force F replica; identities hold") {
    val gs = groups()
    val nn = gs.valuesIterator.map(_.length.toLong).sum
    val k = gs.size.toLong
    val s1t = gs.valuesIterator.map(_.map(BigInt(_)).sum).sum
    val gm = (BigDecimal(s1t) / 100).toDouble / nn.toDouble
    val perG = gs.map { case (g, cs) =>
      val nG = cs.length.toLong
      val s1 = cs.map(BigInt(_)).sum
      val s2 = cs.map(c => BigInt(c) * BigInt(c)).sum
      val meanG = (BigDecimal(s1) / 100).toDouble / nG.toDouble
      val ssbT = rnd(nG.toDouble * (meanG - gm) * (meanG - gm), 6)
      val sswT = rnd(
        (BigDecimal(s2) / 10000).toDouble -
          (BigDecimal(s1) / 100).toDouble * (BigDecimal(s1) / 100).toDouble /
          nG.toDouble, 6)
      g -> ((nG, meanG, ssbT, sswT))
    }
    val ssb = rnd(perG.valuesIterator.map(t => BigDecimal(t._3)).sum.toDouble, 6)
    val ssw = rnd(perG.valuesIterator.map(t => BigDecimal(t._4)).sum.toDouble, 6)
    val f =
      if (k < 2 || nn <= k || ssw <= 0.0) None
      else Some(rnd((ssb / (k - 1).toDouble) / (ssw / (nn - k).toDouble), 6))
    val got = SparkEntry.queries("anova_oneway")(spark, sf)
      .as[(String, Long, Double, Long, Long, Double, Double, Option[Double])]
      .collect()
    assert(got.map(_._1).toSet == perG.keySet, "group set")
    got.foreach { case (g, nG, meanG, gnn, gk, gssb, gssw, gf) =>
      withClue(s"group $g: ") {
        val (wn, wm, _, _) = perG(g)
        assert(nG == wn && gnn == nn && gk == k)
        assert(math.abs(meanG - rnd(wm, 6)) < 1e-9)
        assert(math.abs(gssb - ssb) < 1e-9 && math.abs(gssw - ssw) < 1e-9)
        assert(gf.isDefined == f.isDefined)
        for (w <- f; v <- gf) assert(math.abs(v - w) < 1e-9, s"F $v vs $w")
        // F must be non-negative when defined
        gf.foreach(v => assert(v >= 0.0))
      }
    }
  }

  test("jarque_bera: matches a brute-force moment replica; JB recomputes from snapped S/K") {
    val gs = groups()
    val got = SparkEntry.queries("jarque_bera")(spark, sf)
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Boolean])].collect()
    assert(got.map(_._1).toSet == gs.keySet)
    val crit = -2.0 * math.log(0.05)
    got.foreach { case (g, n, skew, kurt, jb, reject) =>
      withClue(s"group $g: ") {
        val cs = gs(g)
        assert(n == cs.length.toLong)
        val sc = cs.map(BigInt(_)).sum
        // (Σ − Σ%n)/n: exact division, trunc-toward-zero for any sign
        // (BigInt % has dividend sign, matching Spark % / DuckDB %)
        val muT = (sc - (sc % n)) / n
        val dd = cs.map(c => BigInt(c) - muT)
        val d1 = dd.sum
        val d2 = dd.map(x => x * x).sum
        val d3 = dd.map(x => x * x * x).sum
        val d4 = dd.map(x => x * x * x * x).sum
        val nd = n.toDouble
        val b1 = d1.toDouble / nd
        val r2 = d2.toDouble / nd
        val r3 = d3.toDouble / nd
        val r4 = d4.toDouble / nd
        val m2 = r2 - b1 * b1
        val m3 = r3 - 3.0 * b1 * r2 + 2.0 * b1 * b1 * b1
        val m4 = r4 - 4.0 * b1 * r3 + 6.0 * b1 * b1 * r2 -
          3.0 * b1 * b1 * b1 * b1
        if (n < 2 || m2 <= 0.0) {
          assert(skew.isEmpty && kurt.isEmpty && jb.isEmpty)
        } else {
          val wS = rnd(m3 / (m2 * math.sqrt(m2)), 6)
          val wK = rnd(m4 / (m2 * m2) - 3.0, 6)
          assert(math.abs(skew.get - wS) < 1e-9, s"S ${skew.get} vs $wS")
          assert(math.abs(kurt.get - wK) < 1e-9, s"K ${kurt.get} vs $wK")
          val wJb = rnd(nd / 6.0 * (wS * wS + wK * wK / 4.0), 6)
          assert(math.abs(jb.get - wJb) < 1e-9, s"JB ${jb.get} vs $wJb")
          assert(jb.get >= 0.0)
          assert(reject.contains(jb.get > crit))
        }
      }
    }
  }

  test("jarque_bera: an out-of-envelope deviation NULLs the group's moments, not a crash") {
    // ADVICE r12: past |d| > 10^6 cents the d^2 downcast used to NULL
    // in Spark but ERROR in DuckDB — the JbDevBound guard makes both
    // engines NULL the group identically. One $10M-outlier row trips
    // it; the clean group keeps its moments.
    val dir = java.nio.file.Files.createTempDirectory("jb_oob").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val rows = (0 until 30).map { i =>
      (i.toLong, ts, 1L, "clean", (i % 9).toDouble, """{"k": 1}""")
    } ++ (0 until 30).map { i =>
      (100L + i, ts, 1L, "spiked",
        if (i == 0) 5.0e7 else (i % 9).toDouble, """{"k": 1}""")
    }
    spark.createDataFrame(rows).toDF(
        "event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("jarque_bera")(spark, dir)
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Boolean])].collect()
      .map(r => r._1 -> r).toMap
    val sp = got("spiked")
    assert(sp._2 == 30L, "n counts every row, oob included")
    assert(sp._3.isEmpty && sp._4.isEmpty && sp._5.isEmpty && sp._6.isEmpty,
      "out-of-envelope group must NULL all moments")
    val cl = got("clean")
    assert(cl._3.isDefined && cl._5.isDefined,
      "in-envelope group keeps its moments")
  }

  test("spearman_rho: matches an exact BigInt doubled-rank replica; |rho| <= 1") {
    val rows = Tables.lineitem(spark, sf)
      .select($"l_quantity", $"l_extendedprice")
      .where($"l_quantity".isNotNull && $"l_extendedprice".isNotNull)
      .as[(Double, Double)].collect()
    def doubledRanks(vs: Array[Double]): Map[Double, Long] = {
      val counts = vs.groupBy(identity).map { case (v, g) => v -> g.length.toLong }
      val sorted = counts.toSeq.sortBy(_._1)
      var below = 0L
      sorted.map { case (v, n) =>
        val r = 2L * below + n + 1L
        below += n
        v -> r
      }.toMap
    }
    val rxm = doubledRanks(rows.map(_._1))
    val rym = doubledRanks(rows.map(_._2))
    val n = BigInt(rows.length)
    var sx, sy, sxy, sxx, syy = BigInt(0)
    rows.foreach { case (x, y) =>
      val rx = BigInt(rxm(x)); val ry = BigInt(rym(y))
      sx += rx; sy += ry; sxy += rx * ry; sxx += rx * rx; syy += ry * ry
    }
    val num = n * sxy - sx * sy
    val den1 = n * sxx - sx * sx
    val den2 = n * syy - sy * sy
    val want =
      if (den1 <= 0 || den2 <= 0) None
      else Some(rnd(num.toDouble /
        (math.sqrt(den1.toDouble) * math.sqrt(den2.toDouble)), 6))
    val got = SparkEntry.queries("spearman_rho")(spark, sf)
      .as[(Long, Option[Double])].collect()
    assert(got.length == 1)
    val (gn, grho) = got.head
    assert(gn == rows.length.toLong)
    assert(grho.isDefined == want.isDefined)
    for (w <- want; v <- grho) {
      assert(math.abs(v - w) < 1e-9, s"rho $v vs $w")
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9)
    }
  }
}
