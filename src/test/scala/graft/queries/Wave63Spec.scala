package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-63 operators (round 12): simpson_check and source_overlap.
  * Brute-force replicas on sf0.001 with the same exact-moment and
  * snap discipline.
  */
class Wave63Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, d: Int): Double = {
    val p = math.pow(10, d)
    val y = x * p + 0.5
    (y - (((y % 1.0) + 1.0) % 1.0)) / p
  }

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100)
      .toLongExact

  test("simpson_check: matches an exact BigInt slope replica; pooled row consistent") {
    val rows = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
      .where($"l_quantity".isNotNull && $"l_extendedprice".isNotNull)
      .as[(Option[String], Double, Double)].collect()
      .map(r => (r._1.getOrElse("__null__"), BigInt(r._2.toLong),
        BigInt(cents(r._3))))
    def slope(rs: Array[(String, BigInt, BigInt)]): Option[Double] = {
      val n = BigInt(rs.length)
      val sx = rs.map(_._2).sum; val sy = rs.map(_._3).sum
      val sxy = rs.map(r => r._2 * r._3).sum
      val sxx = rs.map(r => r._2 * r._2).sum
      val den = n * sxx - sx * sx
      if (den > 0) Some(rnd((n * sxy - sx * sy).toDouble / den.toDouble, 6))
      else None
    }
    val pooled = slope(rows)
    val per = rows.groupBy(_._1).map { case (g, rs) =>
      g -> ((rs.length.toLong, slope(rs.toArray)))
    }
    val got = SparkEntry.queries("simpson_check")(spark, sf)
      .as[(String, Long, Option[Double], Long, Option[Double], Boolean)]
      .collect()
    assert(got.map(_._1).toSet == per.keySet)
    got.foreach { case (g, n, sl, nt, ps, rev) =>
      withClue(s"stratum $g: ") {
        val (wn, ws) = per(g)
        assert(n == wn && nt == rows.length.toLong)
        assert(sl.isDefined == ws.isDefined)
        for (w <- ws; v <- sl) assert(math.abs(v - w) < 1e-9)
        for (w <- pooled; v <- ps) assert(math.abs(v - w) < 1e-9)
        val wantRev = (for (a <- sl; b <- ps) yield
          (a > 0 && b < 0) || (a < 0 && b > 0)).getOrElse(false)
        assert(rev == wantRev)
      }
    }
  }

  test("source_overlap: matches a brute-force distinct-term Jaccard matrix") {
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").as[(Option[String], Option[String])]
      .collect()
    val terms = docs.flatMap { case (src, t) =>
      val norm = t.getOrElse("").toLowerCase
        .replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ").trim
      if (norm.isEmpty) Array.empty[(String, String)]
      else norm.split(" ").map(w => (src.getOrElse("__null__"), w))
    }.distinct
    val bySrc = terms.groupBy(_._1).map { case (s2, g) =>
      s2 -> g.map(_._2).toSet
    }
    val srcs = bySrc.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      a = srcs(i); b = srcs(j)
      inter = (bySrc(a) intersect bySrc(b)).size.toLong
      if inter > 0
    } yield (a, b) -> ((bySrc(a).size.toLong, bySrc(b).size.toLong, inter)))
      .toMap
    val got = SparkEntry.queries("source_overlap")(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == want.keySet,
      s"pair set ${got.map(r => (r._1, r._2)).toSet} vs ${want.keySet}")
    got.foreach { case (sa, sb, na, nb, nc, j) =>
      withClue(s"pair ($sa,$sb): ") {
        val (wa, wb, wc) = want((sa, sb))
        assert(na == wa && nb == wb && nc == wc)
        assert(math.abs(j -
          rnd(wc.toDouble / (wa + wb - wc).toDouble, 6)) < 1e-12)
        assert(j >= 0.0 && j <= 1.0)
      }
    }
  }
}
