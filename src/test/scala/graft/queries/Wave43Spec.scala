package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-43: SAX symbolization, Holt linear forecasting, Tukey median
  * polish — each re-derived from scratch driver-side on the fixture.
  */
class Wave43Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** The fixture's bounded zero-filled daily series per type (the
    * dtw_distance construction, replicated independently).
    */
  private def series: Map[String, IndexedSeq[Long]] = {
    val cells = Tables.events(spark, sf)
      .filter("ts IS NOT NULL AND event_type IS NOT NULL")
      .selectExpr("event_type AS t", "unix_millis(ts) DIV 86400000 AS day")
      .groupBy("t", "day").count()
      .as[(String, Long, Long)].collect().toSeq
    val d0 = cells.map(_._2).min
    val bounded = cells.filter(_._2 < d0 + 366L)
    val d1 = bounded.map(_._2).max
    val spine = d0 to d1
    bounded.groupBy(_._1).map { case (t, cs) =>
      val m = cs.map(c => c._2 -> c._3).toMap
      t -> spine.map(dd => m.getOrElse(dd, 0L))
    }
  }

  test("sax_symbolize: matches a from-scratch PAA + breakpoint walk") {
    val expected = series.map { case (t, s) =>
      val n = s.size
      val mu = s.sum.toDouble / n
      val sigma = math.sqrt(math.max(
        s.map(x => x * x).sum.toDouble / n - mu * mu, 0.0))
      val w = math.min(10, n)
      val word = (0 until w).map { k =>
        val lo = k * n / w + 1
        val hi = (k + 1) * n / w
        val mz =
          if (sigma == 0.0) 0.0
          else (lo to hi).map(i => (s(i - 1).toDouble - mu) / sigma).sum /
            (hi - lo + 1).toDouble
        if (mz < -0.6745) 'a'
        else if (mz < 0.0) 'b'
        else if (mz < 0.6745) 'c'
        else 'd'
      }.mkString
      (t, n, w, word)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("sax_symbolize")(spark, sf)
      .as[(String, Int, Int, String)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // constant series -> sigma=0 -> z=0 -> all 'c' by the breakpoint walk
    assert((if (0.0 < 0.6745) 'c' else 'd') == 'c')
  }

  test("holt_forecast: matches the textbook level/trend recursion") {
    def rnd(x: Double, k: Int) = {
      val p = math.pow(10, k); math.floor(x * p + 0.5) / p
    }
    val expected = series.filter(_._2.size >= 9).map { case (t, s) =>
      val nTrain = s.size - 7
      var l = s(0).toDouble
      var b = s(1).toDouble - s(0).toDouble
      for (i <- 2 until nTrain) {
        val x = s(i).toDouble
        val nl = 0.5 * x + 0.5 * (l + b)
        val nb = 0.3 * (nl - l) + 0.7 * b
        l = nl; b = nb
      }
      val mae = (1 to 7).map(h =>
        math.abs(l + h.toDouble * b - s(nTrain + h - 1).toDouble)).sum / 7.0
      (t, s.size, rnd(l, 6), rnd(b, 6), rnd(mae, 6))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("holt_forecast")(spark, sf)
      .as[(String, Int, Double, Double, Double)].collect().toSeq
    assert(got.nonEmpty, "fixture month must clear the 9-day minimum")
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("median_polish: matches a from-scratch polish; column medians vanish") {
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.size
      if (n % 2 == 1) s(n / 2) else s(n / 2 - 1) + (s(n / 2) - s(n / 2 - 1)) * 0.5
    }
    val ser = series
    val types = ser.keys.toSeq.sorted
    val nDays = ser(types.head).size
    val rm = types.map(t => t -> median(ser(t).map(_.toDouble))).toMap
    val r1 = types.map(t => t -> ser(t).map(_.toDouble - rm(t)))
    val cm = (0 until nDays).map(d => median(r1.map(_._2(d))))
    val full = for {
      (t, row) <- r1; d <- 0 until nDays
    } yield (t, d, row(d) - cm(d))
    // the column sweep zeroes every column median by construction
    (0 until nDays).foreach { d =>
      assert(median(full.filter(_._2 == d).map(_._3)) == 0.0)
    }
    def rnd(x: Double, k: Int) = {
      val p = math.pow(10, k); math.floor(x * p + 0.5) / p
    }
    val d0 = Tables.events(spark, sf)
      .filter("ts IS NOT NULL AND event_type IS NOT NULL")
      .selectExpr("min(unix_millis(ts) DIV 86400000)").as[Long].head()
    val expected = full
      .map { case (t, d, r) => (rnd(math.abs(r), 6), t, d0 + d, r) }
      .sortBy(x => (-x._1, x._2, x._3))
      .take(50)
      .map { case (_, t, day, r) => (t, day, rnd(r, 6)) }
    val got = SparkEntry.queries("median_polish")(spark, sf)
      .select("event_type", "day", "residual")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }
}
