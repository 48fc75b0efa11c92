package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-58 operators (round 12): PSI stability, CUPED variance
  * reduction, and the splitter SRM check. Brute-force replicas on
  * sf0.001 with the same snap discipline; exact to 1e-9.
  */
class Wave58Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, d: Int): Double = {
    val p = math.pow(10, d)
    val y = x * p + 0.5
    (y - (((y % 1.0) + 1.0) % 1.0)) / p
  }

  private def decSum(terms: Iterable[Double]): Double =
    terms.map(BigDecimal(_)).sum.toDouble

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100)
      .toLongExact

  test("psi_stability: matches a brute-force reference-decile replica; PSI >= 0") {
    val rows = Tables.events(spark, sf)
      .where($"ts".isNotNull && $"event_type".isNotNull && $"value".isNotNull)
      .selectExpr("event_type", "unix_millis(ts) DIV 86400000 AS day",
        "value", "event_id")
      .as[(String, Long, Double, Long)].collect()
    val mid = (rows.map(_._2).min + rows.map(_._2).max + 1) / 2
    val want = rows.groupBy(_._1).flatMap { case (t, g) =>
      val ref = g.filter(_._2 < mid).sortBy(r => (r._3, r._4))
      if (ref.isEmpty) None
      else {
        // SQL NTILE(10): first (n % 10) tiles get the extra row
        val n = ref.length; val base = n / 10; val rem = n % 10
        var idx = 0
        val edges = (1 to math.min(10, n)).flatMap { tile =>
          val sz = base + (if (tile <= rem) 1 else 0)
          val slice = ref.slice(idx, idx + sz); idx += sz
          if (slice.nonEmpty && tile < 10) Some(slice.map(_._3).max) else None
        }
        val nb = edges.length + 1
        def binOf(v: Double): Int = 1 + edges.count(v > _)
        val cr = Array.fill(nb + 1)(0L); val cc = Array.fill(nb + 1)(0L)
        g.foreach { r =>
          val b = binOf(r._3)
          if (r._2 < mid) cr(b) += 1 else cc(b) += 1
        }
        val nr = cr.sum; val nc = cc.sum
        val terms = (1 to nb).map { b =>
          val p = (cr(b).toDouble + 0.5) / (nr.toDouble + 0.5 * nb.toDouble)
          val q = (cc(b).toDouble + 0.5) / (nc.toDouble + 0.5 * nb.toDouble)
          rnd((p - q) * math.log(p / q), 10)
        }
        Some(t -> ((nr, nc, nb, rnd(decSum(terms), 8))))
      }
    }
    val got = SparkEntry.queries("psi_stability")(spark, sf)
      .as[(String, Long, Long, Option[Int], Option[Double],
        Option[Boolean], Boolean)].collect()
    // types with reference rows carry full PSI rows; ref-empty types
    // (none in the fixtures, but the contract since ADVICE r12) would
    // surface as new_type rows with NULL psi instead of dropping
    val (newTypes, scored) = got.partition(_._7)
    assert(scored.map(_._1).toSet == want.keySet, "type set")
    newTypes.foreach { case (t, nr, _, nb, psi, drift, _) =>
      withClue(s"new type $t: ") {
        assert(nr == 0L && nb.isEmpty && psi.isEmpty && drift.isEmpty)
      }
    }
    scored.foreach { case (t, nr, nc, nb, psiO, driftO, newType) =>
      withClue(s"type $t: ") {
        val (wr, wc, wb, wp) = want(t)
        val psi = psiO.get
        assert(nr == wr && nc == wc && nb.contains(wb))
        assert(!newType)
        assert(math.abs(psi - wp) < 1e-9, s"PSI $psi vs $wp")
        assert(psi >= -1e-9, "PSI is non-negative")
        assert(driftO.contains(psi > 0.2))
      }
    }
  }

  test("psi_stability: a type with zero reference rows surfaces as new_type, not a drop") {
    // ADVICE r12: "brandnew" exists ONLY in the current half — no
    // deciles to bin against — and must still appear in the report.
    val dir = java.nio.file.Files.createTempDirectory("psi_new_type").toString
    val rows = (0 until 40).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        f"2024-01-${1 + i % 20}%02d 00:00:00"), // days 0..19, mid = 10
        (i % 7).toLong, "steady", (i % 13).toDouble, """{"k": 1}""")
    } ++ Seq((100L, java.sql.Timestamp.valueOf("2024-01-18 00:00:00"),
      1L, "brandnew", 5.0, """{"k": 1}"""))
    spark.createDataFrame(rows).toDF(
        "event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("psi_stability")(spark, dir)
      .as[(String, Long, Long, Option[Int], Option[Double],
        Option[Boolean], Boolean)].collect()
    assert(got.map(_._1).toSeq.sorted == Seq("brandnew", "steady"))
    val nt = got.find(_._1 == "brandnew").get
    assert(nt._7 && nt._2 == 0L && nt._3 == 1L &&
      nt._4.isEmpty && nt._5.isEmpty && nt._6.isEmpty)
    val st = got.find(_._1 == "steady").get
    assert(!st._7 && st._5.isDefined)
  }

  test("cuped_adjust: matches an exact BigInt replica; identity var_adj = var_y(1 - rho2)") {
    val rows = Tables.events(spark, sf)
      .where($"ts".isNotNull && $"user_id".isNotNull && $"value".isNotNull)
      .selectExpr("user_id", "unix_millis(ts) DIV 86400000 AS day", "value")
      .as[(Long, Long, Double)].collect()
    val mid = (rows.map(_._2).min + rows.map(_._2).max + 1) / 2
    val per = rows.groupBy(_._1).map { case (_, g) =>
      (BigInt(g.filter(_._2 < mid).map(r => cents(r._3)).sum),
        BigInt(g.filter(_._2 >= mid).map(r => cents(r._3)).sum))
    }.toSeq
    val n = BigInt(per.size)
    val sx = per.map(_._1).sum; val sy = per.map(_._2).sum
    val sxy = per.map(p => p._1 * p._2).sum
    val sxx = per.map(p => p._1 * p._1).sum
    val syy = per.map(p => p._2 * p._2).sum
    val cv = n * sxy - sx * sy
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    val theta = if (vx > 0) Some(rnd(cv.toDouble / vx.toDouble, 6)) else None
    val rho2 = if (vx > 0 && vy > 0)
      Some(rnd((cv.toDouble * cv.toDouble) / (vx.toDouble * vy.toDouble), 6))
    else None
    val varY = rnd(vy.toDouble / (n.toDouble * n.toDouble), 4)
    val got = SparkEntry.queries("cuped_adjust")(spark, sf)
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect()
    assert(got.length == 1)
    val (gn, gt, gr, gv, ga) = got.head
    assert(gn == per.size.toLong)
    assert(gt.isDefined == theta.isDefined && gr.isDefined == rho2.isDefined)
    for (w <- theta; v <- gt) assert(math.abs(v - w) < 1e-9)
    for (w <- rho2; v <- gr) {
      assert(math.abs(v - w) < 1e-9)
      assert(v >= 0.0 && v <= 1.0 + 1e-9, "rho2 in [0,1]")
    }
    assert(math.abs(gv.get - varY) < 1e-9)
    for (r <- gr; v <- gv; a <- ga)
      assert(math.abs(a - rnd(v * (1.0 - r), 4)) < 1e-12, "CUPED identity")
  }

  test("srm_check: matches an md5-bucket replica; flags agree with the chi2 line") {
    val ids = Tables.documents(spark, sf).select($"doc_id")
      .as[Long].collect()
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"split:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val splits = ids.map { id =>
      val b = bucket(id)
      if (b < 90) "train" else if (b < 95) "val" else "test"
    }
    val counts = splits.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val nt = ids.length.toLong
    val ratios = Map("train" -> 0.90, "val" -> 0.05, "test" -> 0.05)
    val chi = rnd(decSum(ratios.toSeq.map { case (sp, r) =>
      val o = counts.getOrElse(sp, 0L).toDouble
      val e = nt.toDouble * r
      rnd((o - e) * (o - e) / e, 8)
    }), 6)
    val crit = -2.0 * math.log(0.05)
    val got = SparkEntry.queries("srm_check")(spark, sf)
      .as[(String, Long, Double, Option[Double], Long, Option[Double],
        Option[Boolean])].collect()
    assert(got.map(_._1).toSeq.sorted == Seq("test", "train", "val"))
    got.foreach { case (sp, gn, r, e, gnt, gchi, flag) =>
      withClue(s"split $sp: ") {
        assert(gn == counts.getOrElse(sp, 0L) && gnt == nt)
        assert(r == ratios(sp))
        assert(math.abs(e.get - rnd(nt.toDouble * r, 4)) < 1e-12)
        assert(math.abs(gchi.get - chi) < 1e-9, s"chi2 ${gchi.get} vs $chi")
        assert(flag.contains(gchi.get > crit))
      }
    }
  }
}
