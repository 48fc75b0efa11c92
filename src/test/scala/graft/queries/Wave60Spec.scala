package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-60 operators (round 12): Ljung–Box, MDE/power sizing, and
  * the Markov entropy rate. Brute-force replicas on sf0.001 with the
  * same snap discipline; the statistical constants (χ²₈ 0.95, normal
  * quantiles) are re-derived here independently by bisection so a
  * typo in the production literal cannot hide.
  */
class Wave60Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, d: Int): Double = {
    val p = math.pow(10, d)
    val y = x * p + 0.5
    (y - (((y % 1.0) + 1.0) % 1.0)) / p
  }

  private def decSum(terms: Iterable[Double]): Double =
    terms.map(BigDecimal(_)).sum.toDouble

  private def bisect(f: Double => Double, target: Double,
      lo0: Double, hi0: Double): Double = {
    var lo = lo0; var hi = hi0
    (1 to 200).foreach { _ =>
      val m = (lo + hi) / 2
      if (f(m) < target) lo = m else hi = m
    }
    (lo + hi) / 2
  }

  test("statistical constants match independent bisection derivations") {
    // chi2(df=8) CDF has the closed form 1 - exp(-x/2)*sum_{k<=3}(x/2)^k/k!
    def chi2cdf8(x: Double): Double = {
      val h = x / 2
      1.0 - math.exp(-h) * (1.0 + h + h * h / 2 + h * h * h / 6)
    }
    val crit = bisect(chi2cdf8, 0.95, 0.0, 100.0)
    assert(math.abs(crit - 15.507313055865449) < 1e-9)
    def ncdf(z: Double): Double =
      0.5 * (1.0 + erf(z / math.sqrt(2.0)))
    val z975 = bisect(ncdf, 0.975, -10, 10)
    val z80 = bisect(ncdf, 0.80, -10, 10)
    assert(math.abs(z975 - 1.9599639845400536) < 1e-9)
    assert(math.abs(z80 - 0.8416212335729141) < 1e-9)
  }

  // Abramowitz & Stegun 7.1.26 is NOT precise enough (4.5e-4); use
  // the Taylor/continued-fraction-free approach: numeric integration
  // of the error function with Simpson at fine steps.
  private def erf(x: Double): Double = {
    val n = 20000
    val h = x / n
    var s = 0.0
    (0 until n).foreach { i =>
      val a = i * h; val b = (i + 1) * h; val m = (a + b) / 2
      s += (math.exp(-a * a) + 4 * math.exp(-m * m) + math.exp(-b * b)) *
        (b - a) / 6
    }
    2.0 / math.sqrt(math.Pi) * s
  }

  private def daySeriesMap(): Map[String, Array[Long]] = {
    val cells = Tables.events(spark, sf)
      .where($"ts".isNotNull && $"event_type".isNotNull)
      .selectExpr("event_type", "unix_millis(ts) DIV 86400000 AS day")
      .as[(String, Long)].collect()
    val d0 = cells.map(_._2).min
    val d1 = cells.map(_._2).max
    cells.groupBy(_._1).map { case (t, g) =>
      val counts = g.groupBy(_._2).map { case (dd, gg) => dd -> gg.length.toLong }
      t -> (d0 to d1).map(dd => counts.getOrElse(dd, 0L)).toArray
    }
  }

  test("ljung_box: matches a brute-force Q replica; Q >= 0") {
    val L = 8
    val want = daySeriesMap().flatMap { case (t, s) =>
      val n = s.length
      if (n < L + 2) None
      else {
        val xb = s.map(BigInt(_)).sum.toDouble / n.toDouble
        var den = 0.0
        s.foreach(x => den += (x.toDouble - xb) * (x.toDouble - xb))
        if (den <= 0.0) None
        else {
          val r = (1 to L).map { k =>
            var num = 0.0
            (1 to n - k).foreach(tt =>
              num += (s(tt - 1).toDouble - xb) * (s(tt + k - 1).toDouble - xb))
            rnd(num / den, 12)
          }
          var sum2 = 0.0
          (1 to L).foreach(k => sum2 += r(k - 1) * r(k - 1) / (n - k).toDouble)
          Some(t -> ((n, rnd(n.toDouble * (n.toDouble + 2.0) * sum2, 6))))
        }
      }
    }
    val got = SparkEntry.queries("ljung_box")(spark, sf)
      .as[(String, Int, Double, Boolean)].collect()
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (t, n, q, rej) =>
      withClue(s"type $t: ") {
        val (wn, wq) = want(t)
        assert(n == wn)
        assert(math.abs(q - wq) < 1e-9, s"Q $q vs $wq")
        assert(q >= 0.0)
        assert(rej == (q > 15.507313055865449))
      }
    }
  }

  test("mde_power: matches an exact-moment replica; MDE shrinks as n grows") {
    val rows = Tables.events(spark, sf)
      .select($"event_type", $"value").where($"value".isNotNull)
      .as[(Option[String], Double)].collect()
    def cents(v: Double): Long =
      (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100)
        .toLongExact
    val zsum = 1.9599639845400536 + 0.8416212335729141
    val want = rows.groupBy(_._1.getOrElse("__null__")).map { case (g, rs) =>
      val cs = rs.map(r => BigInt(cents(r._2)))
      val n = cs.length.toLong
      val s1 = cs.sum
      val s2 = cs.map(c => c * c).sum
      val vnum = BigInt(n) * s2 - s1 * s1
      val nd = n.toDouble
      val mean = rnd(s1.toDouble / nd / 100.0, 6)
      val sd = if (n >= 2 && vnum > 0)
        Some(rnd(math.sqrt(vnum.toDouble / (nd * (nd - 1.0))) / 100.0, 6))
      else None
      val mde = sd.map(s2d => rnd(zsum * s2d * math.sqrt(2.0 / nd), 6))
      g -> ((n, mean, sd, mde))
    }
    val got = SparkEntry.queries("mde_power")(spark, sf)
      .as[(String, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect()
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (g, n, mean, sd, mde, rel) =>
      withClue(s"group $g: ") {
        val (wn, wm, ws, wd) = want(g)
        assert(n == wn)
        assert(math.abs(mean - wm) < 1e-9)
        for (w <- ws; v <- sd) assert(math.abs(v - w) < 1e-9)
        for (w <- wd; v <- mde) {
          assert(math.abs(v - w) < 1e-9, s"MDE $v vs $w")
          assert(v > 0.0)
        }
        for (v <- rel; m <- mde) if (mean > 0)
          assert(math.abs(v - rnd(m / mean, 6)) < 1e-12)
      }
    }
  }

  test("markov_entropy_rate: matches a brute-force chain replica; 0 <= H <= ln k") {
    val evs = Tables.events(spark, sf)
      .where($"event_type".isNotNull)
      .selectExpr("user_id", "unix_millis(ts) AS tsm", "event_id",
        "event_type")
      .as[(Option[Long], Option[Long], Long, String)].collect()
    val trans = evs.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val seq2 = g.sortBy(r => (r._2.getOrElse(Long.MaxValue), r._3))
        .map(_._4)
      seq2.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq
    }
    val cnt = trans.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val tot = trans.groupBy(_._1).map { case (k, g) => k -> g.length.toLong }
    val states = tot.keySet.toSeq.sorted
    val kk = states.length.toLong
    // integer-scaled power iteration, exactly the engine's ps/v math
    val ps = cnt.collect { case ((f, t), c) if tot.contains(f) && states.contains(t) =>
      (f, t) -> (BigInt(c) * 1000000000L / tot(f))
    }
    var v = states.map(st => st -> BigInt(1000000000L / kk)).toMap
    (1 to 10).foreach { _ =>
      v = states.map { t =>
        t -> ps.collect { case ((f, t2), p) if t2 == t => v(f) * p }
          .sum./(BigInt(1000000000L))
      }.toMap
    }
    val tv = v.values.sum
    val terms = cnt.toSeq.map { case ((f, t), c) =>
      val piI = v(f).toDouble / tv.toDouble
      val pij = c.toDouble / tot(f).toDouble
      rnd(piI * (pij * math.log(pij)), 10)
    }
    val h = rnd(0.0 - decSum(terms), 6)
    val norm = if (kk > 1) Some(rnd(h / math.log(kk.toDouble), 6)) else None
    val got = SparkEntry.queries("markov_entropy_rate")(spark, sf)
      .as[(Long, Long, Double, Option[Double])].collect()
    assert(got.length == 1)
    val (gk, gn, gh, gnorm) = got.head
    assert(gk == kk && gn == cnt.size.toLong)
    assert(math.abs(gh - h) < 1e-9, s"H $gh vs $h")
    assert(gh >= -1e-9 && gh <= math.log(kk.toDouble) + 1e-6)
    for (w <- norm; vv <- gnorm) {
      assert(math.abs(vv - w) < 1e-9)
      assert(vv >= -1e-9 && vv <= 1.0 + 1e-6)
    }
  }
}
