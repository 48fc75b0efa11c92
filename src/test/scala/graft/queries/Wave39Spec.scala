package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-39 operators: quantile normalization and the deterministic
  * discrete-Laplace count release. Brute-force replicas on the
  * sf0.001 fixture; the DuckDB oracle pins cross-engine equality.
  */
class Wave39Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("quantile_normalize: matches an ntile replica; profile is shared across types") {
    val evs = Tables.events(spark, sf)
      .filter("value IS NOT NULL")
      .selectExpr("coalesce(event_type, '__null__') AS t", "value", "event_id")
      .as[(String, Double, Long)].collect().toSeq
    val cells = evs.groupBy(_._1).toSeq.flatMap { case (t, xs) =>
      val sorted = xs.sortBy(x => (x._2, x._3))
      val n = sorted.size
      val big = n % 16
      val base = n / 16
      sorted.zipWithIndex.map { case (x, i) =>
        val qb = if (i < big * (base + 1)) i / (base + 1)
        else big + (i - big * (base + 1)) / base
        (t, qb + 1, BigDecimal(x._2).setScale(2))
      }
    }.groupBy(p => (p._1, p._2)).map { case ((t, qb), vs) =>
      (t, qb, vs.size.toLong, vs.map(_._3).sum)
    }.toSeq
    val pooled = cells.groupBy(_._2).map { case (qb, cs) =>
      qb -> cs.map(_._4).sum.toDouble / cs.map(_._3).sum.toDouble
    }
    val expected = cells.map { case (t, qb, n, sv) =>
      (t, qb, n, rnd6(sv.toDouble / n.toDouble), rnd6(pooled(qb)))
    }.sortBy(r => (r._1, r._2))
    val rows = SparkEntry.queries("quantile_normalize")(spark, sf)
      .as[(String, Int, Long, Double, Double)].collect().toSeq
    assert(rows == expected,
      s"first diff: ${rows.zip(expected).find(p => p._1 != p._2)}")
    // the defining property: one shared marginal — every type maps
    // bucket qb onto the SAME normalized mean
    rows.groupBy(_._2).foreach { case (qb, rs) =>
      assert(rs.map(_._5).distinct.size == 1, s"profile split at qb=$qb")
    }
  }

  test("dp_noise_counts: matches a trailing-zero-geometric replica") {
    def tz(tag: String, src: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((tag + src).getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 8)
      val h = java.lang.Long.parseLong(hex, 16)
      if (h == 0L) 32L else java.lang.Long.bitCount((h & -h) - 1).toLong
    }
    val docs = Tables.documents(spark, sf)
      .selectExpr("coalesce(source, '__null__') AS s").as[String]
      .collect().toSeq
    val expected = docs.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (s0, xs) =>
        val (ga, gb) = (tz("dpa:", s0), tz("dpb:", s0))
        (s0, xs.size.toLong, ga, gb, ga - gb, xs.size.toLong + ga - gb)
      }
    val rows = SparkEntry.queries("dp_noise_counts")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows == expected,
      s"first diff: ${rows.zip(expected).find(p => p._1 != p._2)}")
    rows.foreach { case (s0, n, ga, gb, noise, rel) =>
      assert(ga >= 0 && ga <= 32 && gb >= 0 && gb <= 32, s"geometric range $s0")
      assert(rel - n == noise, s"release arithmetic $s0")
    }
  }
}
