package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Nineteenth-wave operators: late-interaction rerank (the streaming
  * CDC op is exercised live in StreamingSpec).
  */
class Wave19Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("maxsim_rerank: equals a MessageDigest MaxSim replay") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.TextFunctions.tokens($"text"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, w) => id -> w.filter(_.nonEmpty).toSet }
      .filter(_._2.nonEmpty).toMap
    def vec(term: String): Array[Double] = {
      val h = md5hex(s"tv:$term")
      Array.tabulate(4)(k =>
        (Integer.parseInt(h.substring(2 * k, 2 * k + 2), 16) - 127.5) / 255.0)
    }
    def snap(x: Double, n: Int): Double = {
      val p = math.pow(10, n); math.floor(x * p + 0.5) / p
    }
    val queries = docs.keys.filter(_ < 10)
    val want = queries.flatMap { q =>
      val qTerms = docs(q)
      val cands = docs.keys.filter(d => d != q)
        .map(d => d -> qTerms.intersect(docs(d)).size)
        .filter(_._2 >= 2).toSeq
        .sortBy { case (d, n) => (-n, d) }.take(10).map(_._1)
      cands.map { d =>
        val score = qTerms.toSeq.map { qt =>
          val qv = vec(qt)
          docs(d).map { dt =>
            val dv = vec(dt)
            snap((0 until 4).map(k => qv(k) * dv(k)).sum, 8)
          }.max
        }.map(BigDecimal(_).setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum
        (q, d) -> snap(score.toDouble, 6)
      }
    }.toMap
    val got = SparkEntry.queries("maxsim_rerank")(spark, sf)
      .as[(Long, Long, Int, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, d, rn, ms) =>
      withClue(s"($q,$d): ") {
        assert(want.contains((q, d)), "not in the candidate set")
        assert(ms == want((q, d)), s"maxsim $ms vs ${want((q, d))}")
        assert(rn >= 1 && rn <= 3)
      }
    }
    // the top-3 really are the top of the candidate pool
    got.groupBy(_._1).foreach { case (q, rows) =>
      val returned = rows.map(_._4).min
      val pool = want.collect { case ((qq, d), s) if qq == q &&
        !rows.exists(_._2 == d) => s }
      if (rows.length == 3 && pool.nonEmpty)
        assert(pool.forall(_ <= returned), s"query $q: omitted candidate beats returned")
    }
  }
}
