package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-61 operators (round 12): hour_profile, seasonality_strength,
  * tokenizer_compression. Brute-force replicas on sf0.001; the
  * strength test recomputes the variance ratios from
  * seasonal_decompose's OWN published output, pinning the
  * composition.
  */
class Wave61Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, d: Int): Double = {
    val p = math.pow(10, d)
    val y = x * p + 0.5
    (y - (((y % 1.0) + 1.0) % 1.0)) / p
  }

  test("hour_profile: matches a brute-force hour histogram; shares sum to 1 per type") {
    val rows = Tables.events(spark, sf)
      .where($"ts".isNotNull)
      .selectExpr("coalesce(event_type, '__null__') AS g", "hour(ts) AS h")
      .as[(String, Int)].collect()
    val want = rows.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val tot = rows.groupBy(_._1).map { case (k, g) => k -> g.length.toLong }
    val got = SparkEntry.queries("hour_profile")(spark, sf)
      .as[(String, Int, Long, Double, Boolean)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == want.keySet)
    got.groupBy(_._1).foreach { case (g, cells) =>
      withClue(s"type $g: ") {
        cells.foreach { case (_, h, n, share, _) =>
          assert(n == want((g, h)))
          assert(math.abs(share -
            rnd(n.toDouble / tot(g).toDouble, 6)) < 1e-12)
        }
        assert(cells.map(_._3).sum == tot(g))
        // exactly one peak, and it carries the max count with the
        // earliest-hour tiebreak
        val peaks = cells.filter(_._5)
        assert(peaks.length == 1)
        val maxN = cells.map(_._3).max
        val wantPeak = cells.filter(_._3 == maxN).map(_._2).min
        assert(peaks.head._2 == wantPeak && peaks.head._3 == maxN)
      }
    }
  }

  test("seasonality_strength: recomputes from seasonal_decompose's output; F in [0,1]") {
    val dec = SparkEntry.queries("seasonal_decompose")(spark, sf)
      .selectExpr("trend", "seasonal", "resid")
      .as[(Double, Double, Double)].collect()
    def decimal6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def varOf(xs: Array[BigDecimal]): Double = {
      val n = xs.length
      val s1 = xs.sum
      val s2 = xs.map(x => x * x).sum
      ((n.toDouble * s2.toDouble) - s1.toDouble * s1.toDouble) /
        (n.toDouble * n.toDouble)
    }
    val r = dec.map(x => decimal6(x._3))
    val sr = dec.map(x => decimal6(x._2 + x._3))
    val tr = dec.map(x => decimal6(x._1 + x._3))
    val vr = rnd(varOf(r), 8)
    val vsr = rnd(varOf(sr), 8)
    val vtr = rnd(varOf(tr), 8)
    val fs = if (vsr > 0) Some(rnd(math.max(0.0, 1.0 - vr / vsr), 6)) else None
    val ft = if (vtr > 0) Some(rnd(math.max(0.0, 1.0 - vr / vtr), 6)) else None
    val got = SparkEntry.queries("seasonality_strength")(spark, sf)
      .as[(Long, Double, Double, Double, Option[Double], Option[Double])]
      .collect()
    assert(got.length == 1)
    val (n, gvr, gvsr, gvtr, gfs, gft) = got.head
    assert(n == dec.length.toLong)
    assert(math.abs(gvr - vr) < 1e-9 && math.abs(gvsr - vsr) < 1e-9 &&
      math.abs(gvtr - vtr) < 1e-9)
    for (w <- fs; v <- gfs) {
      assert(math.abs(v - w) < 1e-9, s"Fs $v vs $w")
      assert(v >= 0.0 && v <= 1.0 + 1e-9)
    }
    for (w <- ft; v <- gft) assert(math.abs(v - w) < 1e-9)
  }

  test("tokenizer_compression: matches a brute-force token-count replica") {
    val rows = Tables.documents(spark, sf)
      .select($"source", $"text").where($"text".isNotNull)
      .as[(Option[String], String)].collect()
    val bpeRe = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]".r
    val want = rows.groupBy(_._1.getOrElse("__null__")).map { case (src, g) =>
      val chars = g.map(_._2.length.toLong).sum
      val wtok = g.map { r =>
        val norm = r._2.toLowerCase.replaceAll("[^a-z0-9\\s]", " ")
          .replaceAll("\\s+", " ").trim
        if (norm.isEmpty) 0L else norm.split(" ").length.toLong
      }.sum
      val btok = g.map(r => bpeRe.findAllIn(r._2).length.toLong).sum
      src -> ((g.length.toLong, chars, wtok, btok))
    }
    val got = SparkEntry.queries("tokenizer_compression")(spark, sf)
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect()
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (src, nd, ch, wt, bt, cpb, cpw) =>
      withClue(s"source $src: ") {
        val (wn, wc, ww, wb) = want(src)
        assert(nd == wn && ch == wc && wt == ww && bt == wb)
        if (wb > 0)
          assert(math.abs(cpb.get -
            rnd(wc.toDouble / wb.toDouble, 4)) < 1e-12)
        if (ww > 0)
          assert(math.abs(cpw.get -
            rnd(wc.toDouble / ww.toDouble, 4)) < 1e-12)
        // a BPE-ish tokenizer never produces fewer tokens than words
        assert(bt >= wt)
      }
    }
  }
}
