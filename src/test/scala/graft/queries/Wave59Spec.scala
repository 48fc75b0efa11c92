package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-59 operators (round 12): code_detect, join_skew_report,
  * pacf_durbin, and the fused NormText expression. Brute-force
  * replicas on sf0.001 with the same snap discipline; the NormText
  * test pins the byte-pass against the regex chain IN-ENGINE on the
  * fixture corpus plus crafted unicode edge cases (Kelvin sign,
  * dotted-I, combining marks, exotic whitespace).
  */
class Wave59Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, d: Int): Double = {
    val p = math.pow(10, d)
    val y = x * p + 0.5
    (y - (((y % 1.0) + 1.0) % 1.0)) / p
  }

  private def decSum(terms: Iterable[Double]): Double =
    terms.map(BigDecimal(_)).sum.toDouble

  test("NormText equals the two-regex chain on the corpus and unicode edges") {
    val regexChain = "trim(regexp_replace(regexp_replace(lower(t)," +
      " '[^a-z0-9\\\\s]', ' '), '\\\\s+', ' '))"
    val crafted = Seq(
      "", " ", "\t\n\r", "ABC def", "  a  b  ",
      "KKelvin", "İstanbul", "étude", // Kelvin sign, dotted I, combining acute
      " nbsp gap", "中文 mixed ascii",
      "tab\tsep\nnewline", "123-456=789", "trailing\n", "\nleading")
    val corpus = Tables.documents(spark, sf)
      .where($"text".isNotNull).select($"text".as("t"))
      .unionAll(crafted.toDF("t"))
    val diff = corpus
      .selectExpr("t", "norm_text(t) AS a", s"$regexChain AS b")
      .where("a IS DISTINCT FROM b")
      .count()
    assert(diff == 0L, "norm_text diverged from the regex chain")
    // null passes through as null
    val nr = Seq[Option[String]](None).toDF("t")
      .selectExpr("norm_text(t) AS a").as[Option[String]].head()
    assert(nr.isEmpty)
  }

  test("code_detect: matches a brute-force replica; fractions bounded") {
    val rows = Tables.documents(spark, sf)
      .select($"source", $"text").where($"text".isNotNull)
      .as[(Option[String], String)].collect()
    val want = rows.flatMap { case (src, t) =>
      if (t.isEmpty) None
      else {
        val len = t.length.toLong
        val sym = t.count(c => "{}();=<>[]".contains(c)).toLong
        val nLines = 1L + t.count(_ == '\n')
        val nl2 = t.sliding(2).count(w => w == "\n " || w == "\n\t")
        val first = t.startsWith(" ") || t.startsWith("\t")
        val nIndent = nl2 + (if (first) 1L else 0L)
        val density = rnd(sym.toDouble / len.toDouble, 8)
        val indentFrac = rnd(nIndent.toDouble / nLines.toDouble, 8)
        Some((src.getOrElse("__null__"), density, indentFrac,
          density > 0.05 || indentFrac > 0.3))
      }
    }.groupBy(_._1).map { case (src, g) =>
      src -> ((g.length.toLong, g.count(_._4).toLong,
        rnd(decSum(g.map(_._2)) / g.length.toDouble, 6),
        rnd(decSum(g.map(_._3)) / g.length.toDouble, 6)))
    }
    val got = SparkEntry.queries("code_detect")(spark, sf)
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (src, n, nc, cf, ad, ai) =>
      withClue(s"source $src: ") {
        val (wn, wc, wd, wi) = want(src)
        assert(n == wn && nc == wc)
        assert(math.abs(cf - rnd(wc.toDouble / wn.toDouble, 6)) < 1e-12)
        assert(math.abs(ad - wd) < 1e-9 && math.abs(ai - wi) < 1e-9)
        assert(cf >= 0.0 && cf <= 1.0)
      }
    }
  }

  test("join_skew_report: matches a brute-force key-count replica") {
    def keyCounts(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(c).where(s"$c IS NOT NULL")
        .as[Long].collect().groupBy(identity)
        .map { case (_, g) => g.length.toLong }.toSeq.sorted
    val legs = Seq(
      ("events", "user_id", Tables.events(spark, sf)),
      ("lineitem", "l_orderkey", Tables.lineitem(spark, sf)),
      ("lineitem", "l_partkey", Tables.lineitem(spark, sf)),
      ("orders", "o_custkey", Tables.orders(spark, sf)))
    val want = legs.map { case (tn, cn, df) =>
      val cnts = keyCounts(df, cn)
      val nKeys = cnts.length.toLong
      val nRows = cnts.sum
      val maxC = cnts.max
      // Spark `percentile` exact interpolation at q = 0.99
      val pos = (nKeys - 1).toDouble * 0.99
      val lo = pos.toInt
      val frac = pos - lo
      val p99 =
        if (lo + 1 < nKeys) cnts(lo) * (1 - frac) + cnts(lo + 1) * frac
        else cnts(lo).toDouble
      (tn, cn) -> ((nRows, nKeys, maxC, rnd(p99, 4),
        rnd(maxC.toDouble / nRows.toDouble, 6),
        rnd(maxC.toDouble * nKeys.toDouble / nRows.toDouble, 4)))
    }.toMap
    val got = SparkEntry.queries("join_skew_report")(spark, sf)
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect()
    assert(got.map(r => (r._1, r._2)).toSet == want.keySet)
    got.foreach { case (tn, cn, nr, nk, mx, p99, share, skew) =>
      withClue(s"$tn.$cn: ") {
        val (wr, wk, wm, wp, ws, wf) = want((tn, cn))
        assert(nr == wr && nk == wk && mx == wm)
        assert(math.abs(p99 - wp) < 1e-9, s"p99 $p99 vs $wp")
        assert(math.abs(share - ws) < 1e-12)
        assert(math.abs(skew - wf) < 1e-9)
        assert(skew >= 1.0 - 1e-9, "max >= avg")
      }
    }
  }

  test("pacf_durbin: matches a brute-force Durbin-Levinson replica; pacf_1 = r_1") {
    val cells = Tables.events(spark, sf)
      .where($"ts".isNotNull && $"event_type".isNotNull)
      .selectExpr("event_type", "unix_millis(ts) DIV 86400000 AS day")
      .as[(String, Long)].collect()
    val d0 = cells.map(_._2).min
    val d1 = cells.map(_._2).max
    val L = 8
    val want = cells.groupBy(_._1).flatMap { case (t, g) =>
      val counts = g.groupBy(_._2).map { case (dd, gg) => dd -> gg.length.toLong }
      val s = (d0 to d1).map(dd => counts.getOrElse(dd, 0L)).toArray
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
          }.toArray
          var v = 1.0
          val phi = Array.fill(L + 1)(0.0)
          val pacf = Array.fill(L + 1)(0.0)
          (1 to L).foreach { k =>
            var sum2 = 0.0
            (1 until k).foreach(j => sum2 += phi(j) * r(k - j - 1))
            val alpha = (r(k - 1) - sum2) / v
            val old = phi.clone()
            (1 until k).foreach(j => phi(j) = old(j) - alpha * old(k - j))
            phi(k) = alpha
            pacf(k) = alpha
            v = v * (1.0 - alpha * alpha)
          }
          Some(t -> ((n, (1 to L).map(k => rnd(pacf(k), 6)))))
        }
      }
    }
    val got = SparkEntry.queries("pacf_durbin")(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == want.keySet)
    got.foreach { row =>
      val t = row.getString(0)
      withClue(s"type $t: ") {
        val (wn, wp) = want(t)
        assert(row.getInt(1) == wn)
        (1 to L).foreach { k =>
          val v = row.getDouble(1 + k)
          assert(math.abs(v - wp(k - 1)) < 1e-9, s"pacf_$k $v vs ${wp(k - 1)}")
        }
        // pacf_1 must equal r_1 (snap levels differ: 12dp vs 6dp)
        assert(math.abs(row.getDouble(2)) <= 1.0 + 1e-6)
      }
    }
  }
}
