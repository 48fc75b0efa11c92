package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-37 operators: association rules (Apriori pair stage), RFM
  * segmentation, isotonic calibration (PAVA via the minimax
  * identity), and empirical-Bayes rate shrinkage. Each test checks
  * SEMANTICS against an independent driver-side brute-force replica
  * on the sf0.001 fixture (the DuckDB oracle already pins
  * cross-engine value equality).
  */
class Wave37Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("assoc_rules: matches a brute-force Apriori replica; lift order holds") {
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey")
      .as[(Long, Long)].collect().toSeq.distinct
    val nB = li.map(_._1).distinct.size.toLong
    val itemN = li.groupBy(_._2).map { case (i, xs) => i -> xs.size.toLong }
    val freq = itemN.filter { case (_, n) => n * 2000L >= nB }
    val byBasket = li.filter(p => freq.contains(p._2)).groupBy(_._1)
    val pairN = byBasket.values.toSeq
      .flatMap { xs =>
        val is = xs.map(_._2).sorted
        for (a <- is; b <- is if a < b) yield (a, b)
      }
      .groupBy(identity).map { case (p, occ) => p -> occ.size.toLong }
      .filter(_._2 >= 3L)
    val expected = pairN.toSeq.flatMap { case ((a, b), nab) =>
      Seq((a, b, freq(a), freq(b), nab), (b, a, freq(b), freq(a), nab))
    }.map { case (an, co, na, nc, nab) =>
      val lift = (nab * nB).toDouble / (na * nc).toDouble
      (an, co, na, nc, nab, nab.toDouble / nB.toDouble,
        nab.toDouble / na.toDouble, lift)
    }.sortBy(r => (-r._8, r._1, r._2)).take(100)
    val rows = SparkEntry.queries("assoc_rules")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(rows.nonEmpty, "fixture must produce rules")
    assert(rows == expected,
      s"first diff: ${rows.zip(expected).find(p => p._1 != p._2)}")
  }

  test("rfm_segmentation: matches a brute-force quartile replica") {
    val cust = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "cast(o_orderdate as string) AS od",
        "cast(o_totalprice as decimal(18,2)) AS tp")
      .as[(Long, String, BigDecimal)].collect().toSeq
      .groupBy(_._1).map { case (c, os) =>
        (c, os.map(_._2).max, os.size.toLong, os.map(_._3).sum)
      }.toSeq
    def ntile4[K](xs: Seq[(Long, K)])(implicit ord: Ordering[K]): Map[Long, Int] = {
      val sorted = xs.sortBy(x => (x._2, x._1))(
        Ordering.Tuple2(ord, Ordering.Long))
      val n = sorted.size
      sorted.zipWithIndex.map { case ((c, _), i) =>
        // SQL NTILE: first n%4 buckets get one extra row
        val big = n % 4
        val base = n / 4
        val t = if (i < big * (base + 1)) i / (base + 1)
        else big + (i - big * (base + 1)) / base
        c -> (t + 1)
      }.toMap
    }
    val r = ntile4(cust.map(c => (c._1, c._2)))(Ordering.String.reverse)
    val f = ntile4(cust.map(c => (c._1, c._3)))(Ordering.Long.reverse)
    val m = ntile4(cust.map(c => (c._1, c._4)))(
      Ordering.by[BigDecimal, BigDecimal](identity).reverse)
    val expected = cust.groupBy(c => (r(c._1), f(c._1), m(c._1)))
      .map { case ((rt, ft, mt), cs) =>
        (rt, ft, mt, cs.size.toLong, cs.map(_._3).sum,
          cs.map(_._4).sum.toDouble)
      }.toSeq.sorted
    val rows = SparkEntry.queries("rfm_segmentation")(spark, sf)
      .as[(Int, Int, Int, Long, Long, Double)].collect().toSeq.sorted
    assert(rows == expected,
      s"first diff: ${rows.zip(expected).find(p => p._1 != p._2)}")
    assert(rows.map(_._4).sum == cust.size.toLong, "every customer lands in a segment")
  }

  test("isotonic_fit: fitted values are monotone and match the minimax replica") {
    val sc = Tables.embeddings(spark, sf)
      .filter("label IS NOT NULL AND embedding[0] IS NOT NULL")
      .selectExpr("cast(element_at(embedding, 1) as double) AS score",
        "cast(label as long) AS y")
      .as[(Double, Long)].collect().toSeq
    val lo = sc.map(_._1).min
    val hi = sc.map(_._1).max
    def bin(s: Double): Long =
      if (hi <= lo) 0L
      else math.min(31L, math.floor((s - lo) * 32.0 / (hi - lo)).toLong)
    val cells = sc.groupBy(p => bin(p._1)).toSeq.sortBy(_._1)
      .map { case (b, ys) => (b, ys.size.toLong, ys.map(_._2).sum) }
    def segMean(i: Int, j: Int): Long = {
      val slice = cells.slice(i, j + 1)
      slice.map(_._3).sum * 1000000000L / slice.map(_._2).sum
    }
    val k = cells.size
    val expected = cells.indices.map { b =>
      val fs = (0 to b).map { i =>
        (b until k).map(j => segMean(i, j)).min
      }.max
      (cells(b)._1, cells(b)._2,
        rnd6(cells(b)._3.toDouble / cells(b)._2.toDouble),
        fs.toDouble / 1e9)
    }
    val rows = SparkEntry.queries("isotonic_fit")(spark, sf)
      .as[(Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(rows.size == expected.size)
    rows.zip(expected).foreach { case (got, exp) =>
      assert(got._1 == exp._1 && got._2 == exp._2, s"cell ${got._1}")
      assert(math.abs(got._3 - exp._3) < 1e-9, s"mean bin ${got._1}")
      assert(math.abs(got._4 - exp._4) < 1e-12, s"fitted bin ${got._1}")
    }
    // the defining property: nondecreasing in bin
    rows.sliding(2).foreach {
      case Seq(a, b) => assert(a._4 <= b._4, s"not monotone at bin ${b._1}")
      case _ => ()
    }
  }

  test("eb_shrinkage: matches the moments replica; shrunk lies between raw and prior mean") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("source", "n_chars").as[(String, Long)].collect().toSeq
    val per = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (s0, ds) =>
      (s0, ds.size.toLong, ds.count(_._2 < 200L).toLong)
    }
    val rs = per.map { case (_, n, x) => x * 1000000000L / n }
    val k = per.size.toLong
    val ms = rs.sum / k
    val vnum = rs.map(r => (r - ms) * (r - ms)).sum
    val m = ms.toDouble / 1e9
    val v = (vnum.toDouble / k.toDouble) / 1e18
    val c = (m * (1.0 - m)) / v - 1.0
    assert(v > 0 && c > 0, "fixture must exercise the non-degenerate path")
    val rows = SparkEntry.queries("eb_shrinkage")(spark, sf)
      .as[(String, Long, Long, Double, Option[Double], Option[Double], Double)]
      .collect().toSeq
    assert(rows.map(_._1) == per.map(_._1))
    rows.zip(per).foreach { case ((s0, n, x, raw, al, be, sh), (_, en, ex)) =>
      assert(n == en && x == ex, s"counts $s0")
      assert(math.abs(raw - rnd6(ex.toDouble / en.toDouble)) < 1e-12)
      assert(math.abs(al.get - rnd6(m * c)) < 1e-12, s"alpha $s0")
      assert(math.abs(be.get - rnd6((1.0 - m) * c)) < 1e-12, s"beta $s0")
      val expSh = rnd6((ex.toDouble + m * c) / (en.toDouble + c))
      assert(math.abs(sh - expSh) < 1e-12, s"shrunk $s0")
      // shrinkage pulls toward the prior mean, never past it
      val (lo0, hi0) = (math.min(raw, m), math.max(raw, m))
      assert(sh >= lo0 - 1e-6 && sh <= hi0 + 1e-6, s"shrunk out of band $s0")
    }
  }
}
