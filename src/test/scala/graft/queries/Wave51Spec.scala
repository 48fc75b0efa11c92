package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-51: Holt-Winters, Croston, Fellegi-Sunter linkage —
  * from-scratch re-derivations on the sf0.001 fixtures.
  */
class Wave51Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, k: Int) = {
    val p = math.pow(10, k); math.floor(x * p + 0.5) / p
  }

  /** The bounded zero-filled day series per type, recomputed. */
  private def daySeriesRef(): Seq[(String, Array[Long])] = {
    val ev = Tables.events(spark, sf)
      .filter("ts IS NOT NULL AND event_type IS NOT NULL")
      .selectExpr("event_type", "unix_millis(ts) DIV 86400000 AS day")
      .as[(String, Long)].collect()
    val d0 = ev.map(_._2).min
    val bounded = ev.filter(_._2 < d0 + 366L)
    val d1 = bounded.map(_._2).max
    bounded.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      val byDay = xs.groupBy(_._2).map { case (dd, v) => dd -> v.size.toLong }
      (t, (d0 to d1).map(dd => byDay.getOrElse(dd, 0L)).toArray)
    }
  }

  test("holt_winters: matches a from-scratch triple-exponential fold") {
    val expected = daySeriesRef().filter(_._2.length >= 21).map {
      case (t, s) =>
        val n = s.length; val nTrain = n - 7
        var l = s.slice(0, 7).sum / 7.0
        var b = (s.slice(7, 14).sum - s.slice(0, 7).sum) / 49.0
        val sv = Array.tabulate(7)(j => s(j).toDouble - l)
        for (tt <- 8 to nTrain) {
          val x = s(tt - 1).toDouble
          val i0 = (tt - 1) % 7
          val nl = 0.4 * (x - sv(i0)) + 0.6 * (l + b)
          val nb = 0.2 * (nl - l) + 0.8 * b
          sv(i0) = 0.3 * (x - nl) + 0.7 * sv(i0)
          l = nl; b = nb
        }
        val mae = (1 to 7).map(h => math.abs(
          l + h * b + sv((nTrain + h - 1) % 7) - s(nTrain + h - 1))).sum / 7.0
        (t, n, rnd(l, 6), rnd(b, 6), sv.map(rnd(_, 6)).toSeq, rnd(mae, 6))
    }
    val got = SparkEntry.queries("holt_winters")(spark, sf)
      .as[(String, Int, Double, Double, Double, Double, Double, Double,
        Double, Double, Double, Double)].collect().toSeq
      .map(r => (r._1, r._2, r._3, r._4,
        Seq(r._5, r._6, r._7, r._8, r._9, r._10, r._11), r._12))
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    assert(got.nonEmpty, "fixture series long enough for HW")
  }

  test("croston_forecast: matches a from-scratch intermittent fold") {
    val expected = daySeriesRef().filter(_._2.length >= 9).flatMap {
      case (t, s) =>
        val n = s.length; val nTrain = n - 7
        val nDemand = s.slice(0, nTrain).count(_ > 0).toLong
        if (nDemand == 0) None
        else {
          var seen = false; var z = 0.0; var p = 0.0; var q = 1.0
          for (tt <- 1 to nTrain) {
            val x = s(tt - 1).toDouble
            if (!seen && x > 0) { seen = true; z = x; p = tt.toDouble; q = 1.0 }
            else if (seen && x > 0) {
              z = z + (x - z) / 4.0; p = p + (q - p) / 4.0; q = 1.0
            } else if (seen) q += 1.0
          }
          val mae = (1 to 7).map(h =>
            math.abs(z / p - s(nTrain + h - 1))).sum / 7.0
          Some((t, n, nDemand, rnd(z, 6), rnd(p, 6), rnd(z / p, 6),
            rnd(mae, 6)))
        }
    }
    val got = SparkEntry.queries("croston_forecast")(spark, sf)
      .as[(String, Int, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("fs_linkage: agreement weights and classes on the fixture") {
    val meta = Tables.documents(spark, sf)
      .selectExpr("doc_id", "lang", "source", "n_chars")
      .as[(Long, Option[String], Option[String], Option[Long])]
      .collect().map(d => d._1 -> (d._2, d._3, d._4)).toMap
    val w = Seq((0.95, 0.30), (0.90, 0.20), (0.85, 0.10)).map {
      case (m, u) => (math.log(m / u), math.log((1 - m) / (1 - u)))
    }
    val got = SparkEntry.queries("fs_linkage")(spark, sf)
      .as[(Long, Long, Boolean, Boolean, Boolean, Double, String)]
      .collect().toSeq
    assert(got.nonEmpty, "candidate pairs exist on the fixture")
    got.foreach { case (a, b, aL, aS, aN, score, cls) =>
      val (la, sa, na) = meta(a); val (lb, sb, nb) = meta(b)
      assert(aL == (la == lb), s"lang agree: $a $b")
      assert(aS == (sa == sb), s"source agree: $a $b")
      val expN = (for (x <- na; y <- nb)
        yield math.abs(x - y) * 10 <= math.max(x, y)).getOrElse(false)
      assert(aN == expN, s"len agree: $a $b")
      val expScore = (if (aL) w(0)._1 else w(0)._2) +
        (if (aS) w(1)._1 else w(1)._2) + (if (aN) w(2)._1 else w(2)._2)
      assert(score == expScore, s"score: $a $b $score vs $expScore")
      val expCls = if (score >= 2.0) "match"
        else if (score >= 0.0) "possible" else "non_match"
      assert(cls == expCls, s"cls: $a $b")
    }
    // ordering: score desc, then keys
    val scores = got.map(_._6)
    assert(scores == scores.sorted.reverse, "score-desc ordering")
  }
}
