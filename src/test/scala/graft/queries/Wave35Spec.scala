package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-35 operators: Kruskal–Wallis, Brown–Forsythe (Levene),
  * per-customer Kendall tau, and 1-D earth mover's distance. Each
  * test checks SEMANTICS against an independent driver-side
  * brute-force replica on the sf0.001 fixture (the DuckDB oracle
  * already pins cross-engine value equality); doubles compare within
  * 1e-9 of the replica — the snap discipline makes both sides exact
  * far below that.
  */
class Wave35Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** (group, value) pairs exactly as the queries construct them. */
  private def groupedValues(): Seq[(String, Double)] =
    Tables.events(spark, sf)
      .selectExpr("coalesce(event_type, '__null__') AS g", "value")
      .filter("value IS NOT NULL")
      .as[(String, Double)].collect().toSeq

  test("kruskal_wallis: matches a brute-force rank computation on the fixture") {
    val data = groupedValues()
    // brute: doubled average ranks over the global sorted multiset
    val sorted = data.map(_._2).sorted
    val below = sorted.groupBy(identity).map { case (v, _) =>
      v -> sorted.count(_ < v).toLong
    }
    val cnt = sorted.groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    def rank2(v: Double): Long = 2L * below(v) + cnt(v) + 1L
    val groups = data.groupBy(_._1)
    val n = data.size.toLong
    val r2g = groups.map { case (g, vs) =>
      g -> vs.map(p => rank2(p._2)).sum
    }
    val s = r2g.map { case (g, r2) =>
      val ng = groups(g).size.toDouble
      rnd6(r2.toDouble * r2.toDouble / (4.0 * ng))
    }.sum
    val nd = n.toDouble
    val tie3 = cnt.values.map(t => t.toDouble * t * t - t).sum
    val h = 12.0 / (nd * (nd + 1.0)) * s - 3.0 * (nd + 1.0)
    val c = 1.0 - tie3 / (nd * nd * nd - nd)
    val rows = SparkEntry.queries("kruskal_wallis")(spark, sf)
      .as[(String, Long, Double, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == groups.keys.toSeq.sorted)
    rows.foreach { case (g, ng, meanRank, k, nn, hStat, hAdj) =>
      assert(ng == groups(g).size.toLong, s"group $g size")
      assert(k == groups.size.toLong && nn == n)
      val expMean = rnd6(r2g(g).toDouble / (2.0 * ng.toDouble))
      assert(math.abs(meanRank - expMean) < 1e-9, s"mean rank $g")
      assert(math.abs(hStat - rnd6(h)) < 1e-9, s"H: $hStat vs ${rnd6(h)}")
      assert(math.abs(hAdj - rnd6(h / c)) < 1e-9, "H_adj")
    }
    // the fixture's 5 uniform classes should NOT show a huge H —
    // sanity that the statistic is scaled correctly (H ~ chi2(k-1))
    assert(rows.head._6 < 100.0, s"H implausibly large: ${rows.head._6}")
  }

  test("levene_test: matches a brute-force Brown-Forsythe replica") {
    val data = groupedValues()
    val groups = data.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2) }
    // interpolated median then 4dp snap — quantile_cont semantics
    def med4(vs: Seq[Double]): Double = {
      val s0 = vs.sorted
      val h = (s0.size - 1) * 0.5
      val lo = s0(h.toInt)
      val hi = s0(math.ceil(h).toInt)
      val m = lo + (h - h.toInt) * (hi - lo)
      math.floor(m * 1e4 + 0.5) / 1e4
    }
    // z in exact 1e-4 units so Σz, Σz² are integers (the decimal
    // moments' integer shadow)
    val zUnits = groups.map { case (g, vs) =>
      val m = med4(vs)
      g -> vs.map(v => math.floor(math.abs(v - m) * 1e4 + 0.5).toLong)
    }
    val nG = groups.map { case (g, vs) => g -> vs.size.toLong }
    val n = data.size.toLong
    val k = groups.size.toLong
    val s1 = zUnits.map { case (g, zs) => g -> zs.sum }
    val s2 = zUnits.map { case (g, zs) => g -> zs.map(z => z * z).sum }
    def s1d(g: String) = s1(g).toDouble / 1e4
    def s2d(g: String) = s2(g).toDouble / 1e8
    val zbar = s1.values.sum.toDouble / 1e4 / n.toDouble
    val ssb = groups.keys.map { g =>
      val zg = s1d(g) / nG(g).toDouble
      rnd6(nG(g).toDouble * (zg - zbar) * (zg - zbar))
    }.sum
    val ssw = groups.keys.map { g =>
      rnd6(s2d(g) - s1d(g) * s1d(g) / nG(g).toDouble)
    }.sum
    val w = (n - k).toDouble / (k - 1).toDouble * (ssb / ssw)
    val rows = SparkEntry.queries("levene_test")(spark, sf)
      .as[(String, Long, Double, Double, Long, Long, Double, Double, Double)]
      .collect()
    assert(rows.map(_._1).toSeq == groups.keys.toSeq.sorted)
    rows.foreach { case (g, ng, med, meanAbs, nn, kk, sb, sw, wStat) =>
      assert(ng == nG(g) && nn == n && kk == k)
      assert(med == med4(groups(g)), s"median $g")
      assert(math.abs(meanAbs - rnd6(s1d(g) / ng.toDouble)) < 1e-9)
      assert(math.abs(sb - rnd6(ssb)) < 1e-6, s"ssb $sb vs $ssb")
      assert(math.abs(sw - rnd6(ssw)) < 1e-6, s"ssw $sw vs $ssw")
      assert(math.abs(wStat - rnd6(w)) < 1e-9, s"W $wStat vs ${rnd6(w)}")
    }
  }

  test("kendall_tau: matches per-customer brute force; min-orders filter holds") {
    val o = Tables.orders(spark, sf)
      .filter("o_custkey IS NOT NULL AND o_orderdate IS NOT NULL" +
        " AND o_totalprice IS NOT NULL")
      .selectExpr("o_custkey", "o_orderkey",
        "cast(o_orderdate as string) AS od", "o_totalprice")
      .as[(Long, Long, String, Double)].collect()
    val byCust = o.groupBy(_._1)
    val out = SparkEntry.queries("kendall_tau")(spark, sf)
    // the KendallMaxOrders pair cap must stay dormant at fixture
    // scale: every group uncapped, so brute force sees ALL pairs
    assert(out.filter("capped").count() == 0L,
      "order cap engaged on the fixture — brute-force comparison below is void")
    val rows = out.drop("capped")
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect()
    val expected = byCust.filter(_._2.length >= 5)
    assert(rows.map(_._1).toSet == expected.keySet, "customer set")
    rows.foreach { case (ck, nOrders, nPairs, conc, disc, tx, ty, tau) =>
      val os = byCust(ck).sortBy(_._2)
      assert(nOrders == os.length.toLong)
      val pairs = for {
        i <- os.indices; j <- os.indices if os(i)._2 < os(j)._2
      } yield {
        val sx = os(i)._3.compareTo(os(j)._3).sign
        val sy = os(i)._4.compare(os(j)._4).sign
        (sx, sy)
      }
      assert(nPairs == pairs.size.toLong &&
        nPairs == nOrders * (nOrders - 1) / 2)
      assert(conc == pairs.count(p => p._1 * p._2 > 0).toLong, s"conc $ck")
      assert(disc == pairs.count(p => p._1 * p._2 < 0).toLong, s"disc $ck")
      assert(tx == pairs.count(_._1 == 0).toLong, s"tie_x $ck")
      assert(ty == pairs.count(_._2 == 0).toLong, s"tie_y $ck")
      assert(math.abs(tau -
        rnd6((conc - disc).toDouble / nPairs.toDouble)) < 1e-9)
    }
  }

  test("kendall_tau: KendallMaxOrders cap engages with honesty column on a wide group") {
    // synthetic orders dir: customer 1 has 120 orders (past the 100
    // cap), customer 2 has 6 (under). The capped group's statistic
    // must be computed over its FIRST 100 orders by o_orderkey, with
    // capped = true and the TRUE n_orders reported.
    val dir = java.nio.file.Files.createTempDirectory("kendall_cap").toString
    val rows = (1 to 120).map { i =>
      (i.toLong, 1L, "O", i * 10.0 + (if (i % 3 == 0) -5.0 else 5.0),
        java.sql.Timestamp.valueOf(f"2024-01-${(i % 28) + 1}%02d 00:00:00"))
    } ++ (201 to 206).map { i =>
      (i.toLong, 2L, "O", i * 1.0,
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    }
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("kendall_tau")(spark, dir)
      .select("o_custkey", "n_orders", "n_pairs", "capped")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    val (_, n1, p1, c1) = out(0)
    assert(n1 == 120L && c1, "true order count + capped flag for the wide group")
    assert(p1 == 100L * 99L / 2L, "pairs computed over the first-100 subset")
    val (_, n2, p2, c2) = out(1)
    assert(n2 == 6L && !c2 && p2 == 15L, "under-cap group untouched")
  }

  test("emd_1d: matches brute-force CDF transport on the fixture; identical dists give 0") {
    val data = groupedValues()
    val binned = data.map { case (g, v) => (g, math.floor(v / 25.0).toLong) }
    val types = binned.map(_._1).distinct.sorted
    val bins = binned.map(_._2).distinct.sorted
    val nT = binned.groupBy(_._1).map { case (g, vs) => g -> vs.size.toLong }
    def cdf(g: String): Seq[Double] = {
      var cum = 0L
      bins.map { b =>
        cum += binned.count(p => p._1 == g && p._2 == b)
        cum.toDouble / nT(g).toDouble
      }
    }
    val cdfs = types.map(g => g -> cdf(g)).toMap
    val rows = SparkEntry.queries("emd_1d")(spark, sf)
      .as[(String, String, Long, Long, Double)].collect()
    val expPairs = for {
      a <- types; b <- types if a < b
    } yield (a, b)
    assert(rows.map(r => (r._1, r._2)).toSeq == expPairs)
    rows.foreach { case (a, b, na, nb, emd) =>
      assert(na == nT(a) && nb == nT(b))
      val brute = bins.indices
        .map(i => rnd6(math.abs(cdfs(a)(i) - cdfs(b)(i)))).sum
      assert(math.abs(emd - rnd6(brute)) < 1e-6,
        s"emd($a,$b): $emd vs $brute")
      assert(emd >= 0.0)
    }
    // self-transport is zero by construction: any type against an
    // exact copy of itself would produce identical CDFs — covered by
    // the |Δ| ≥ 0 term structure; spot-check the triangle-ish bound
    // emd(a,c) <= emd(a,b) + emd(b,c) on the first three types
    if (types.size >= 3) {
      val m = rows.map(r => (r._1, r._2) -> r._5).toMap
      def e(x: String, y: String) = if (x < y) m((x, y)) else m((y, x))
      val Seq(a, b, c) = types.take(3)
      assert(e(a, c) <= e(a, b) + e(b, c) + 1e-9, "EMD triangle inequality")
    }
  }

  test("audio_neardup: complete vs brute-force signature-space pairing at hamming <= 2") {
    val fps = SparkEntry.queries("audio_fingerprint")(spark, sf)
      .select("doc_id", "n_windows", "fp")
      .as[(Long, Long, Long)].collect()
    val sigs = fps.groupBy(t => (t._2, t._3)).map { case ((nw, fp), ds) =>
      (nw, fp, ds.length.toLong, ds.map(_._1).min)
    }.toSeq
    val brute = (for {
      (nw, fa, na, ra) <- sigs; (nw2, fb, nb, rb) <- sigs
      if nw == nw2 && fa < fb &&
        java.lang.Long.bitCount(fa ^ fb) <= 2
    } yield (nw, fa, fb, java.lang.Long.bitCount(fa ^ fb), na, nb, ra, rb,
      na * nb)).toSet
    val rows = SparkEntry.queries("audio_neardup")(spark, sf)
      .as[(Long, Long, Long, Int, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(rows.nonEmpty, "vacuous at fixture scale")
    // banded candidate generation must be COMPLETE at hamming <= 2
    // (3 bands x 3 bits, pigeonhole) — set equality, not subset
    assert(rows == brute,
      s"missing: ${(brute -- rows).take(3)}; extra: ${(rows -- brute).take(3)}")
  }

  test("cms_heavy_hitters: matches a driver-side sketch replica; est >= exact always") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(r: Int, term: String): Long =
      java.lang.Long.parseLong(md5hex(s"$r:$term").substring(0, 8), 16) % 256L
    val counts = LlmQueries.termTable(spark, sf)
      .groupBy("term").count()
      .as[(String, Long)].collect().toMap
    val counters = scala.collection.mutable.Map
      .empty[(Int, Long), Long].withDefaultValue(0L)
    counts.foreach { case (t, c) =>
      (0 until 4).foreach(r => counters((r, bucket(r, t))) += c)
    }
    val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    val rows = SparkEntry.queries("cms_heavy_hitters")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == top.map(_._1),
      "top-20 term set/order diverges from exact counts")
    rows.foreach { case (term, exact, est, over) =>
      assert(exact == counts(term))
      val brute = (0 until 4).map(r => counters((r, bucket(r, term)))).min
      assert(est == brute, s"$term: est $est vs replica $brute")
      assert(est >= exact && over == est - exact,
        s"CMS guarantee violated for $term: est $est < exact $exact")
    }
  }

  test("interval_overlap_join: matches brute-force session overlap on the fixture") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "unix_millis(ts) AS ms")
      .as[(Long, Long, String, Long)].collect()
    def sessions(kind: String): Seq[(Long, Long, Long, Long, Long)] =
      ev.filter(_._3 == kind).groupBy(_._1).toSeq.flatMap {
        case (u, es) =>
          val sorted = es.sortBy(e => (e._4, e._2))
          var sid = 0L
          var prev = Long.MinValue
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long)] // (sid, ms, 1)
          sorted.foreach { e =>
            if (prev == Long.MinValue || e._4 - prev > 345600000L) sid += 1
            prev = e._4
            out += ((sid, e._4, 1L))
          }
          out.groupBy(_._1).map { case (s0, ms0) =>
            (u, s0, ms0.size.toLong, ms0.map(_._2).min, ms0.map(_._2).max)
          }
      }
    val va = sessions("view")
    val cl = sessions("click")
    val brute = (for {
      (u, sv, nv, st1, en1) <- va
      (u2, sc, nc, st2, en2) <- cl
      if u == u2 && st1 <= en2 && st2 <= en1
    } yield (u, sv, sc, nv, nc,
      math.min(en1, en2) - math.max(st1, st2))).toSet
    val rows = SparkEntry.queries("interval_overlap_join")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(rows.nonEmpty, "vacuous at fixture scale")
    assert(rows == brute,
      s"missing: ${(brute -- rows).take(3)}; extra: ${(rows -- brute).take(3)}")
  }

  test("url_dedup: variant classes merge; canonical form is fully normalized") {
    val rows = SparkEntry.queries("url_dedup")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum == 500L, "every doc lands in exactly one group")
    // merging must actually happen: the synthetic variant classes are
    // designed to collide within the (host, path) identity space
    assert(rows.exists(_._4 > 1L), "no canonical group merged raw variants")
    rows.foreach { case (u, _, _, _) =>
      assert(u == u.toLowerCase, s"canonical not lowercased: $u")
      assert(!u.contains("#") && !u.contains("utm_") && !u.endsWith("/") &&
        !u.contains(":80") && !u.contains(":443"),
        s"normalization incomplete: $u")
      assert(u.startsWith("http://") || u.startsWith("https://"))
    }
    // keep-first: keeper is the min doc_id among the group's members —
    // spot-check by recomputing one group's membership brute-force
    val g = rows.maxBy(_._2)
    val members = (0L until 500L).filter { id =>
      val host = s"www.site${id % 7}.example.com"
      val path = s"/articles/item${id % 13}"
      val scheme = if (id % 4 <= 1) "http" else "https"
      s"$scheme://$host$path" == g._1
    }
    assert(members.nonEmpty && g._3 == members.min && g._2 == members.size.toLong,
      s"group ${g._1}: got (n=${g._2}, keeper=${g._3}), brute (${members.size}, ${members.min})")
  }

  test("conformal_calibration: exact order statistic and coverage near 1 - alpha") {
    val rows = SparkEntry.queries("conformal_calibration")(spark, sf)
      .as[(Long, Long, Double, Long, Long, Double)].collect()
    assert(rows.length == 1)
    val (nCal, kRank, qHat, nTest, nCov, coverage) =
      (rows.head._1, rows.head._2, rows.head._3, rows.head._4,
        rows.head._5, rows.head._6)
    // brute-force replica off the same deterministic split
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val scored = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(element_at(embedding, 1) as double) AS s",
        "cast(label as double) AS y")
      .as[(Long, Double, Double)].collect()
      .map { case (id, sc, y) =>
        val isCal =
          java.lang.Long.parseLong(md5hex(s"conf:$id").substring(0, 8), 16) <
            2147483648L
        (math.abs(sc - y / 9.0), isCal)
      }
    val cal = scored.filter(_._2).map(_._1).sorted
    val test0 = scored.filterNot(_._2).map(_._1)
    assert(nCal == cal.length.toLong && nTest == test0.length.toLong)
    val k = (9 * (cal.length + 1) + 9) / 10
    assert(kRank == k.toLong)
    assert(qHat == cal(k - 1), s"q_hat $qHat vs brute ${cal(k - 1)}")
    assert(nCov == test0.count(_ <= qHat).toLong)
    // the conformal guarantee: empirical coverage concentrates near
    // 1 - alpha = 0.9 (generous band — the fixture is small)
    assert(coverage > 0.8 && coverage <= 1.0, s"coverage $coverage")
  }
}
