package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Wave-44: ALS half-step, hashing-trick featurization, session
  * type-mix outliers — re-derived from scratch driver-side.
  */
class Wave44Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def rnd(x: Double, k: Int) = {
    val p = math.pow(10, k); math.floor(x * p + 0.5) / p
  }

  test("als_user_factors: solves the exact 2x2 ridge normal equations") {
    def y(tag: String, t: String): Long =
      java.lang.Long.parseLong(md5hex(tag + t).substring(0, 4), 16) % 1000L
    val r = Tables.events(spark, sf)
      .filter("user_id IS NOT NULL AND event_type IS NOT NULL")
      .groupBy($"user_id", $"event_type").count()
      .as[(Long, String, Long)].collect()
    val expected = r.groupBy(_._1).map { case (u, rows) =>
      var a11 = 0L; var a12 = 0L; var a22 = 0L; var b1 = 0L; var b2 = 0L
      var n = 0L
      rows.foreach { case (_, t, c) =>
        val y1 = y("alsy1:", t); val y2 = y("alsy2:", t)
        a11 += y1 * y1; a12 += y1 * y2; a22 += y2 * y2
        b1 += c * y1; b2 += c * y2; n += c
      }
      val d11 = (a11 + 1000L).toDouble; val d22 = (a22 + 1000L).toDouble
      val d12 = a12.toDouble
      val det = d11 * d22 - d12 * d12
      (u, n, rnd((d22 * b1.toDouble - d12 * b2.toDouble) / det, 6),
        rnd((d11 * b2.toDouble - d12 * b1.toDouble) / det, 6))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("als_user_factors")(spark, sf)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // the factors actually solve (A+laI)u = b: residual ~ 0 before rounding
    val (u0, t0s) = (r.head._1, r.filter(_._1 == r.head._1))
    val y1s = t0s.map(x => y("alsy1:", x._2).toDouble)
    val y2s = t0s.map(x => y("alsy2:", x._2).toDouble)
    val rs = t0s.map(_._3.toDouble)
    val a11 = y1s.map(v => v * v).sum + 1000.0
    val a12 = y1s.zip(y2s).map(p => p._1 * p._2).sum
    val a22 = y2s.map(v => v * v).sum + 1000.0
    val b1 = rs.zip(y1s).map(p => p._1 * p._2).sum
    val b2 = rs.zip(y2s).map(p => p._1 * p._2).sum
    val det = a11 * a22 - a12 * a12
    val u1 = (a22 * b1 - a12 * b2) / det
    val u2 = (a11 * b2 - a12 * b1) / det
    assert(math.abs(a11 * u1 + a12 * u2 - b1) < 1e-6 * math.abs(b1) + 1e-9)
    assert(math.abs(a12 * u1 + a22 * u2 - b2) < 1e-6 * math.abs(b2) + 1e-9)
  }

  test("feature_hash: matches an independent md5 bucket recount; weights sum to 1") {
    val toks = Tables.documents(spark, sf)
      .filter("text IS NOT NULL")
      .select($"source", explode(TF.tokens($"text")).as("term"))
      .filter($"term" =!= "")
      .as[(String, String)].collect()
    val expected = toks
      .map { case (src, term) =>
        (src, java.lang.Long.parseLong(
          md5hex("fh:" + term).substring(0, 8), 16) % 64L)
      }
      .groupBy(identity).map { case ((src, b), xs) => (src, b, xs.size.toLong) }
      .groupBy(_._1).flatMap { case (_, rows) =>
        val tot = rows.map(_._3).sum.toDouble
        rows.map(r => (r._1, r._2, r._3, rnd(r._3.toDouble / tot, 6)))
      }.toSeq.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("feature_hash")(spark, sf)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    got.groupBy(_._1).foreach { case (src, rows) =>
      val s = rows.map(_._4).sum
      assert(math.abs(s - 1.0) < 64 * 5e-7 + 1e-9, s"$src weights sum to $s")
    }
  }

  test("session_outliers: matches a from-scratch session scoring") {
    val ev = Tables.events(spark, sf)
      .filter("user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL")
      .selectExpr("user_id", "event_id", "event_type", "unix_millis(ts)")
      .as[(Long, Long, String, Long)].collect()
    val n = ev.length.toDouble
    val pg = ev.groupBy(_._3).map { case (t, xs) => t -> xs.length / n }
    val csum = pg.values.toSeq.sorted
      .map(p => math.round(rnd(p * p, 12) * 1e12)).sum / 1e12
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      val sorted = xs.sortBy(x => (x._4, x._2))
      var sid = 0L; var prev = Long.MinValue
      sorted.map { x =>
        if (prev == Long.MinValue || x._4 - prev > 1800000L) sid += 1
        prev = x._4
        (u, sid, x._3)
      }
    }
    val expected = sessions.groupBy(x => (x._1, x._2)).map { case ((u, sid), xs) =>
      val nEv = xs.size.toLong
      val terms = xs.groupBy(_._3).toSeq.map { case (t, ys) =>
        val ps = ys.size.toDouble / nEv.toDouble
        val g = pg(t)
        math.round(rnd((ps - g) * (ps - g) - g * g, 12) * 1e12)
      }
      (u, sid, nEv, rnd(terms.sum / 1e12 + csum, 6))
    }.toSeq
      .sortBy(x => (-x._4, x._1, x._2)).take(20)
    val got = SparkEntry.queries("session_outliers")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }
}
