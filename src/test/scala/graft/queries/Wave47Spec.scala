package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Wave-47: LTTB downsampling, NDCG@10 ranking eval, HITS hubs &
  * authorities — each re-derived from scratch driver-side on the
  * sf0.001 fixtures (independent of both the engine's plan and the
  * DuckDB oracle), plus constructed known-answer cases.
  */
class Wave47Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- lttb_downsample ----------------------------------------------

  /** From-scratch exact-integer LTTB over one series (1-based days,
    * counts), k = 20, strict-> earliest-index tie-break — the same
    * contract as the query, independently coded.
    */
  private def lttbRef(s: Array[Long], k: Int = 20): Seq[Long] = {
    val n = s.length
    if (n <= k) return (1L to n.toLong)
    val w = k - 2
    val m = n - 2L
    var sel = Vector(1L)
    for (i <- 0 until w) {
      val lo = (i * m) / w + 2
      val hi = ((i + 1) * m) / w + 1
      val nlo = ((i + 1) * m) / w + 2
      val nhi = math.min(((i + 2) * m) / w + 1, n.toLong)
      val c = nhi - nlo + 1
      val sx = (nlo + nhi) * c / 2
      val sy = (nlo to nhi).map(j => s(j.toInt - 1)).sum
      val ax = sel.last
      val ay = s(ax.toInt - 1)
      var bj = 0L; var ba = -1L
      for (j <- lo to hi) {
        val area = math.abs(
          (ax * c - sx) * (s(j.toInt - 1) - ay) - (ax - j) * (sy - ay * c))
        if (area > ba) { bj = j; ba = area }
      }
      sel = sel :+ bj
    }
    sel :+ n.toLong
  }

  test("lttb_downsample: matches a from-scratch exact-integer LTTB") {
    // rebuild the bounded zero-filled day series per type from events
    val ev = Tables.events(spark, sf)
      .filter("ts IS NOT NULL AND event_type IS NOT NULL")
      .selectExpr("event_type", "unix_millis(ts) DIV 86400000 AS day")
      .as[(String, Long)].collect()
    val d0 = ev.map(_._2).min
    val bounded = ev.filter(_._2 < d0 + 366L)
    val d1 = bounded.map(_._2).max
    val expected = bounded.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (t, xs) =>
        val byDay = xs.groupBy(_._2).map { case (dd, v) => dd -> v.size.toLong }
        val s = (d0 to d1).map(dd => byDay.getOrElse(dd, 0L)).toArray
        lttbRef(s).zipWithIndex.map { case (idx, p) =>
          (t, s.length, p + 1, idx, s(idx.toInt - 1))
        }
    }
    val got = SparkEntry.queries("lttb_downsample")(spark, sf)
      .as[(String, Int, Int, Long, Long)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // shape: every series starts at 1, ends at n, emits min(20, n)
    got.groupBy(_._1).foreach { case (t, rows) =>
      val n = rows.head._2
      assert(rows.map(_._3) == (1 to math.min(20, n)), s"$t positions")
      assert(rows.head._4 == 1L && rows.last._4 == n.toLong, s"$t endpoints")
      assert(rows.map(_._4) == rows.map(_._4).sorted, s"$t monotone idx")
    }
  }

  test("lttb_downsample: a constructed spike must be selected") {
    // 40 quiet days, one 50-event spike on day 25: the spike's bucket
    // representative must be the spike itself
    val dir = tmpDir("wave47_lttb")
    val rows = (0 until 40).flatMap { day =>
      val nEv = if (day == 25) 50 else 1
      (0 until nEv).map(j =>
        ((day * 100 + j).toLong, day * 86400000L, 1L, "view", 1.0, "{}"))
    }
    rows.toDF("event_id", "ms", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"ms" * 1000))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("lttb_downsample")(spark, dir)
      .as[(String, Int, Int, Long, Long)].collect().toSeq
    assert(got.exists(r => r._4 == 26L && r._5 == 50L),
      s"spike day must survive downsampling: $got")
    assert(got.size == 20, s"40-day series downsamples to 20: ${got.size}")
  }

  // ---- ndcg_eval ------------------------------------------------------

  test("ndcg_eval: matches a from-scratch NDCG@10") {
    val ev = Tables.events(spark, sf)
      .filter("user_id IS NOT NULL")
      .selectExpr("user_id", "event_id", "value",
        "CASE event_type WHEN 'purchase' THEN 7 WHEN 'click' THEN 3" +
          " WHEN 'view' THEN 1 ELSE 0 END AS g")
      .as[(Long, Long, Option[Double], Long)].collect()
    val disc = (1 to 10).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
    val perUser = ev.groupBy(_._1).map { case (_, xs) =>
      // score desc nulls last, event_id asc
      val byScore = xs.sortBy(x => (x._3.isEmpty, x._3.map(-_).getOrElse(0.0), x._2))
      val byGain = xs.sortBy(x => (-x._4, x._2))
      def fold(ranked: Seq[Long]): Double =
        ranked.take(10).zipWithIndex
          .map { case (gg, i) => gg.toDouble * disc(i) }
          .foldLeft(0.0)(_ + _)
      val dcg = fold(byScore.map(_._4).toSeq)
      val idcg = fold(byGain.map(_._4).toSeq)
      if (idcg > 0) dcg / idcg else 0.0
    }.toSeq
    def rnd(x: Double, k: Int) = {
      val p = math.pow(10, k); math.floor(x * p + 0.5) / p
    }
    val snapped = perUser.map(x =>
      BigDecimal(rnd(x, 12)).setScale(12, BigDecimal.RoundingMode.HALF_UP))
    val expMean = rnd(snapped.sum.toDouble / perUser.size, 6)
    val got = SparkEntry.queries("ndcg_eval")(spark, sf)
      .as[(Long, Double, Long)].collect().head
    assert(got._1 == perUser.size.toLong, s"n_users: $got")
    assert(got._2 == expMean, s"mean_ndcg: ${got._2} vs $expMean")
    assert(got._3 == perUser.count(_ == 1.0).toLong, s"n_perfect: $got")
    assert(got._2 > 0.0 && got._2 <= 1.0, s"ndcg in (0,1]: $got")
  }

  // ---- hits_scores ----------------------------------------------------

  test("hits_scores: matches a from-scratch HITS power iteration") {
    val ed = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".cast("long"), $"l_suppkey".cast("long"))
      .distinct().as[(Long, Long)].collect()
    def rnd(x: Double, k: Int) = {
      val p = math.pow(10, k); math.floor(x * p + 0.5) / p
    }
    // decimal-exact contribution sums via BigDecimal, 12dp snaps
    var h = ed.map(_._1).distinct.map(_ -> 1.0).toMap
    var a = Map.empty[Long, Double]
    for (_ <- 1 to 3) {
      val ar = ed.groupBy(_._2).map { case (sp, es) =>
        sp -> es.map(e => BigDecimal(h(e._1))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      }
      val amax = ar.values.max
      a = ar.map { case (sp, v) => sp -> rnd(v / amax, 12) }
      val hr = ed.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => BigDecimal(a(e._2))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      }
      val hmax = hr.values.max
      h = hr.map { case (c, v) => c -> rnd(v / hmax, 12) }
    }
    val topA = a.toSeq.sortBy(p => (-p._2, p._1)).take(20)
      .map(p => ("authority", p._1, p._2))
    val topH = h.toSeq.sortBy(p => (-p._2, p._1)).take(20)
      .map(p => ("hub", p._1, p._2))
    val expected = (topA ++ topH).sortBy(r => (r._1, -r._3, r._2))
    val got = SparkEntry.queries("hits_scores")(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    assert(got.count(_._1 == "authority") ==
      math.min(20, a.size), s"authority count: ${got.size}")
    assert(got.count(_._1 == "hub") ==
      math.min(20, h.size), s"hub count: ${got.size}")
    assert(got.exists(_._3 == 1.0), "the max-normalized top score is 1")
  }
}
