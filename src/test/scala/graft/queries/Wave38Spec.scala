package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-38 operators: MMR diversification, Markov stationary
  * distribution, and Kaplan–Meier survival. Each test checks
  * SEMANTICS against an independent driver-side brute-force replica
  * on the sf0.001 fixture (the DuckDB oracle already pins
  * cross-engine value equality).
  */
class Wave38Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val nn = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
    if (nn == 0.0) 0.0 else dot(a, b) / nn
  }

  test("mmr_diversify: matches a brute-force greedy MMR replica") {
    val pool = Tables.embeddings(spark, sf)
      .filter("vec_id < 200").selectExpr("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)
    val q = pool.find(_._1 == 0L).get._2
    val rel = pool.map { case (id, e) => id -> rnd6(cos(e, q)) }.toMap
    val emb = pool.toMap
    var cand = pool.map(_._1)
    var msim = cand.map(_ -> 0.0).toMap
    val expected = (1 to 5).map { k =>
      val pick = cand
        .map(id => (id, 0.7 * rel(id) - 0.3 * msim(id)))
        .minBy { case (id, sc) => (-sc, id) }
      val (pid, score) = pick
      val row = (k, pid, rel(pid), msim(pid), score)
      cand = cand.filterNot(_ == pid)
      msim = cand.map(id =>
        id -> math.max(msim(id), rnd6(cos(emb(id), emb(pid))))).toMap
      row
    }
    val rows = SparkEntry.queries("mmr_diversify")(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(rows.map(r => (r._1, r._2)) == expected.map(r => (r._1, r._2)),
      s"selection order: $rows vs $expected")
    rows.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-12 && math.abs(g._4 - e._4) < 1e-12
        && math.abs(g._5 - e._5) < 1e-12, s"pick ${g._1}")
    }
    // selections are distinct and the first pick is the most relevant
    assert(rows.map(_._2).distinct.size == 5)
    assert(rows.head._3 == rows.map(_._3).max, "pick 1 must maximize relevance")
  }

  test("markov_stationary: matches a 10-step scaled-integer replica; pi sums to ~1") {
    val evs = Tables.events(spark, sf)
      .filter("event_type IS NOT NULL AND user_id IS NOT NULL")
      .selectExpr("user_id", "unix_millis(ts) AS ms", "event_id", "event_type")
      .as[(Long, Option[Long], Long, String)].collect().toSeq
    val pairs = evs.groupBy(_._1).values.toSeq.flatMap { us =>
      val ordered = us.sortBy(u => (u._2.getOrElse(Long.MaxValue), u._3))
      ordered.map(_._4).sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq
    }
    val cnt = pairs.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val cf = cnt.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val states = cf.keySet
    val tr = cnt.collect { case ((f, t), c) if states(t) =>
      (f, t) -> c * 1000000000L / cf(f)
    }
    val k = states.size.toLong
    var v: Map[String, Long] = states.map(_ -> 1000000000L / k).toMap
    (1 to 10).foreach { _ =>
      v = v.toSeq
        .flatMap { case (st, m) =>
          tr.collect { case ((f, t), ps) if f == st => t -> (BigInt(m) * ps) }
        }
        .groupBy(_._1)
        .map { case (t, xs) => t -> (xs.map(_._2).sum / 1000000000L).toLong }
    }
    val tv = v.values.sum
    val rows = SparkEntry.queries("markov_stationary")(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(rows.map(_._1).sorted == v.keys.toSeq.sorted)
    rows.foreach { case (st, vs, pi) =>
      assert(vs == v(st), s"mass $st: $vs vs ${v(st)}")
      assert(math.abs(pi - rnd6(vs.toDouble / tv.toDouble)) < 1e-12)
    }
    val piSum = rows.map(_._3).sum
    assert(math.abs(piSum - 1.0) < 1e-3, s"pi must be a distribution: $piSum")
  }

  test("survival_km: matches a sequential fold replica; survival is nonincreasing") {
    val evs = Tables.events(spark, sf)
      .filter("ts IS NOT NULL AND user_id IS NOT NULL")
      .selectExpr("user_id", "unix_millis(ts) AS ms", "event_type")
      .as[(Long, Long, String)].collect().toSeq
    val users = evs.groupBy(_._1).map { case (_, us) =>
      val dur = (us.map(_._2).max - us.map(_._2).min) / 60000L
      (dur, if (us.exists(_._3 == "purchase")) 1L else 0L)
    }.toSeq
    val grid = users.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      (t, xs.size.toLong, xs.map(_._2).sum)
    }
    val nTot = users.size.toLong
    var cum = 0L
    val risk = grid.map { case (t, m, dd) =>
      cum += m
      (t, nTot - cum + m, dd)
    }.filter(_._3 > 0)
    var s = 1000000000000L
    val expected = risk.map { case (t, nr, dd) =>
      s = (BigInt(s) * (nr - dd) / nr).toLong
      (t, nr, dd, s.toDouble / 1e12)
    }
    val rows = SparkEntry.queries("survival_km")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(rows.nonEmpty, "fixture must produce event times")
    assert(rows == expected,
      s"first diff: ${rows.zip(expected).find(p => p._1 != p._2)}")
    rows.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._4 >= b._4, s"survival must be nonincreasing at t=${b._1}")
        assert(a._2 >= b._2, s"risk set must shrink at t=${b._1}")
      case _ => ()
    }
  }
}
