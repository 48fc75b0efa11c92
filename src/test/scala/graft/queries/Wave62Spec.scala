package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-62 operators (round 12): conversion_latency, freshness_audit,
  * source_dup_rate. Brute-force replicas on sf0.001; the latency test
  * cross-checks against funnel_conversion's own per-user rows (the
  * composition principle), and the dup-rate test ties to exact_dedup.
  */
class Wave62Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, d: Int): Double = {
    val p = math.pow(10, d)
    val y = x * p + 0.5
    (y - (((y % 1.0) + 1.0) % 1.0)) / p
  }

  private def pct(xs: Seq[Long], q: Double): Double = {
    val s = xs.sorted
    val pos = (s.length - 1).toDouble * q
    val lo = pos.toInt
    val frac = pos - lo
    if (lo + 1 < s.length) s(lo) * (1 - frac) + s(lo + 1) * frac
    else s(lo).toDouble
  }

  test("conversion_latency: ties to funnel_conversion's per-user rows") {
    val fc = SparkEntry.queries("funnel_conversion")(spark, sf)
      .as[(Long, Long, Option[Long], Boolean)].collect()
    val lats = fc.flatMap { case (_, sMs, pMs, _) => pMs.map(_ - sMs) }
    val nSign = fc.length.toLong
    val nConv = lats.length.toLong
    val got = SparkEntry.queries("conversion_latency")(spark, sf)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(got.length == 1)
    val (gs, gc, rate, p50, p90) = got.head
    assert(gs == nSign && gc == nConv)
    assert(math.abs(rate.get -
      rnd(nConv.toDouble / nSign.toDouble, 6)) < 1e-12)
    if (nConv > 0) {
      assert(math.abs(p50.get - rnd(pct(lats.toSeq, 0.5), 4)) < 1e-9)
      assert(math.abs(p90.get - rnd(pct(lats.toSeq, 0.9), 4)) < 1e-9)
      assert(p90.get >= p50.get && p50.get >= 0.0)
    }
  }

  test("freshness_audit: matches a brute-force day-span replica") {
    val rows = Tables.events(spark, sf)
      .where($"ts".isNotNull)
      .selectExpr("coalesce(event_type, '__null__') AS g",
        "unix_millis(ts) DIV 86400000 AS day")
      .as[(String, Long)].collect()
    val d1 = rows.map(_._2).max
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val days = rs.map(_._2)
      val (f, l) = (days.min, days.max)
      val act = days.distinct.length.toLong
      g -> ((f, l, act, d1 - l, l - f + 1,
        rnd(act.toDouble / (l - f + 1).toDouble, 6)))
    }
    val got = SparkEntry.queries("freshness_audit")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (g, f, l, a, stale, span, ratio) =>
      withClue(s"type $g: ") {
        val (wf, wl, wa, ws, wsp, wr) = want(g)
        assert(f == wf && l == wl && a == wa && stale == ws && span == wsp)
        assert(math.abs(ratio - wr) < 1e-12)
        assert(a <= span && stale >= 0)
      }
    }
  }

  test("source_dup_rate: ties to exact_dedup's copy groups") {
    val dedup = SparkEntry.queries("exact_dedup")(spark, sf)
      .as[(String, Long, Long)].collect()
      .map { case (fp, keeper, _) => fp -> keeper }.toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        graft.functions.TextFunctions.fingerprint($"text").as("fp"))
      .as[(Long, Option[String], String)].collect()
    val want = docs.groupBy(_._2.getOrElse("__null__")).map { case (s2, g) =>
      val dups = g.count(r => dedup(r._3) != r._1).toLong
      val nfp = g.map(_._3).distinct.length.toLong
      s2 -> ((g.length.toLong, dups, nfp,
        rnd(dups.toDouble / g.length.toDouble, 6)))
    }
    val got = SparkEntry.queries("source_dup_rate")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet == want.keySet)
    // global conservation: per-source dups sum to the corpus dup count
    val totalDups = docs.length.toLong - dedup.size.toLong
    assert(got.map(_._3).sum == totalDups, "dup mass conservation")
    got.foreach { case (s2, n, dups, nfp, rate) =>
      withClue(s"source $s2: ") {
        val (wn, wd, wf, wr) = want(s2)
        assert(n == wn && dups == wd && nfp == wf)
        assert(math.abs(rate - wr) < 1e-12)
      }
    }
  }
}
