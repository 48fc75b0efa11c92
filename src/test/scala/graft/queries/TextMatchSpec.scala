package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Twenty-second wave. Arbiters recompute each statistic from raw
  * strings/longs in plain Scala — the winnowing pipeline (normalize →
  * md5 8-grams → 4-window minima) is fully replayed for the reported
  * match pairs, so a construction bug shared by both engines would
  * still fail here.
  */
class TextMatchSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Driver-side winnowing fingerprint set of one normalized text. */
  private def winnowSet(t: String): Set[Long] = {
    if (t.length < 11) return Set.empty
    val hashes = (0 to t.length - 8).map { i =>
      java.lang.Long.parseLong(md5hex(t.substring(i, i + 8)).take(8), 16)
    }
    hashes.sliding(4).map(_.min).toSet
  }

  private def norm(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ").trim

  test("winnow_matches: reported pairs match driver-side winnowing replay") {
    val rows = SparkEntry.queries("winnow_matches")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty, "expected at least one shared-span pair")
    val texts = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    // fingerprint document frequency for the boilerplate cap
    val docFps = texts.map { case (id, t) => id -> winnowSet(norm(t)) }
    val freq = docFps.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).map { case (fp, v) => fp -> v.size }
    def kept(s: Set[Long]) = s.filter(fp => freq(fp) >= 2 && freq(fp) <= 64)
    rows.foreach { case (a, b, nShared, containment) =>
      assert(a < b && nShared >= 2 && containment > 0 && containment <= 1.0)
      val sa = docFps(a); val sb = docFps(b)
      val expect = (kept(sa) & kept(sb)).size.toLong
      assert(expect == nShared, s"pair ($a,$b) shared $nShared vs replay $expect")
      val expectCont = nShared.toDouble / math.min(sa.size, sb.size)
      assert(math.abs(containment - expectCont) < 1e-5)
    }
  }

  test("cooccur_window: top pairs equal driver-side window tally") {
    val toks = graft.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokens($"text"))
      .as[Seq[String]].collect().map(_.filter(_.nonEmpty))
    val tally = scala.collection.mutable.Map[(String, String), Long]()
    for (ws <- toks; i <- ws.indices; off <- 1 to 2; if i + off < ws.length)
      tally((ws(i), ws(i + off))) = tally.getOrElse((ws(i), ws(i + off)), 0L) + 1
    val expected = tally.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(30)
      .map { case ((a, b), n) => (a, b, n) }
    val got = SparkEntry.queries("cooccur_window")(spark, sf)
      .as[(String, String, Long)].collect().toSeq
    assert(got == expected)
  }

  test("user_burstiness: cv equals driver-side moment recompute") {
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id",
        org.apache.spark.sql.functions.unix_micros($"ts"), $"event_id")
      .as[(Long, Long, Long)].collect()
    val expect = ev.groupBy(_._1).collect {
      case (u, es) if es.length >= 2 =>
        val gaps = es.sortBy(e => (e._2, e._3)).toSeq.sliding(2)
          .map { case Seq(p, c) => (c._2 - p._2) / 1000000L }.toSeq
        val n = gaps.size.toDouble
        val mean = gaps.sum / n
        val v = math.max(gaps.map(g => g.toDouble * g).sum / n - mean * mean, 0.0)
        u -> (gaps.size.toLong, mean, if (mean == 0.0) None else Some(math.sqrt(v) / mean))
    }
    val got = SparkEntry.queries("user_burstiness")(spark, sf)
      .as[(Long, Long, Double, Option[Double])].collect()
    assert(got.length == expect.size)
    got.foreach { case (u, n, m, cv) =>
      val (en, em, ecv) = expect(u)
      assert(n == en && math.abs(m - em) < 1e-9, s"user $u moments")
      (cv, ecv) match {
        case (Some(c), Some(e)) => assert(math.abs(c - e) < 1e-9, s"user $u cv")
        case (None, None)       => ()
        case other              => fail(s"user $u cv shape $other")
      }
    }
  }

  test("group_quantiles: four balanced tiles per priority covering all orders") {
    val rows = SparkEntry.queries("group_quantiles")(spark, sf)
      .as[(String, Int, Long, Double, Double)].collect()
    val total = graft.Tables.orders(spark, sf).count()
    assert(rows.map(_._3).sum == total)
    rows.groupBy(_._1).foreach { case (prio, g) =>
      assert(g.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4), s"$prio tiles")
      assert(g.map(_._3).max - g.map(_._3).min <= 1, s"$prio balance")
      g.sortBy(_._2).sliding(2).foreach {
        case Array(x, y) => assert(x._5 <= y._4 + 1e-9, s"$prio tile ranges")
        case _           => ()
      }
    }
  }
}
