package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Waves 25/26/28 arbiters: driver-side recomputations independent of
  * the relational formulations (and of the DuckDB oracles that mirror
  * them).
  */
class Wave26Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("xml_scan: round-trip equals a direct aggregate of the source table") {
    val got = SparkEntry.queries("xml_scan")(spark, sf)
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = graft.Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (k, v) =>
        k -> (v.map(r => BigDecimal(r._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble, v.size.toLong)
      }
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (s, n)) =>
      assert(n == want(k)._2 && math.abs(s - want(k)._1) < 1e-9, s"type $k")
    }
  }

  test("event_trigrams: top paths equal a driver-side sliding tally") {
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id",
        org.apache.spark.sql.functions.unix_micros($"ts"),
        $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val tally = scala.collection.mutable.Map[(String, String, String), Long]()
    ev.groupBy(_._1).values.foreach { es =>
      es.toSeq.sortBy(e => (e._2, e._3)).sliding(3).foreach {
        case Seq(a, b, c) =>
          val k = (a._4, b._4, c._4)
          tally(k) = tally.getOrElse(k, 0L) + 1
        case _ => ()
      }
    }
    val expect = tally.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
      .map { case ((a, b, c), n) => (a, b, c, n) }
    val got = SparkEntry.queries("event_trigrams")(spark, sf)
      .as[(String, String, String, Long)].collect().toSeq
    assert(got == expect)
  }

  test("label_propagation: every prediction is its cell's seed majority") {
    val cells = LlmQueries.ivfCells(spark, sf)
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    val labels = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val votes = cells.toSeq.filter(_._1 % 4 == 0)
      .groupBy(_._2).map { case (cell, members) =>
        val counts = members.map(m => labels(m._1))
          .groupBy(identity(_)).map { case (l, v) => l -> v.size }
        // majority with smallest-label tiebreak
        val (lab, n) = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head
        cell -> (lab, n.toLong)
      }
    val got = SparkEntry.queries("label_propagation")(spark, sf)
      .as[(Long, Long, Int, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (vid, cell, pred, nv) =>
      assert(vid % 4 != 0 && cells(vid) == cell)
      votes.get(cell) match {
        case Some((lab, n)) => assert(pred == lab && nv == n, s"vec $vid")
        case None           => assert(pred == -1 && nv == 0L, s"vec $vid")
      }
    }
    LlmQueries.release(spark, sf, "ivf_cells")
  }

  test("classifier_eval: confusion metrics equal a driver-side tally") {
    val rows = graft.Tables.documents(spark, sf)
      .select($"lang", graft.functions.TextFunctions.langIdHeuristic($"text"))
      .as[(String, String)].collect()
    val classes = (rows.map(_._1) ++ rows.map(_._2)).distinct.sorted
    val got = SparkEntry.queries("classifier_eval")(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(got.map(_._1).toSeq == classes.toSeq)
    got.foreach { case (cls, nTrue, nPred, tp, prec, rec) =>
      assert(nTrue == rows.count(_._1 == cls).toLong)
      assert(nPred == rows.count(_._2 == cls).toLong)
      assert(tp == rows.count(r => r._1 == cls && r._2 == cls).toLong)
      val ep = if (nPred == 0) 0.0 else tp.toDouble / nPred
      val er = if (nTrue == 0) 0.0 else tp.toDouble / nTrue
      assert(math.abs(prec - ep) < 1e-6 && math.abs(rec - er) < 1e-6, cls)
    }
  }

  test("autocorr_lag equals a driver-side ACF computation") {
    val hours = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.unix_micros($"ts"))
      .as[Long].collect().map(_ / 3600000000L)
    val series = hours.groupBy(identity(_)).map { case (h, v) => h -> v.size.toDouble }
    val n = series.size.toDouble
    val mu = series.values.sum / n
    val den = series.values.map(x => (x - mu) * (x - mu)).sum
    val got = SparkEntry.queries("autocorr_lag")(spark, sf)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1, 2, 3))
    got.foreach { case (l, nPairs, acf) =>
      val pairs = series.toSeq.flatMap { case (h, x) =>
        series.get(h + l).map(y => (x - mu) * (y - mu))
      }
      assert(nPairs == pairs.size.toLong, s"lag $l pairs")
      assert(math.abs(acf - pairs.sum / den) < 1e-5, s"lag $l acf")
      assert(acf >= -1.0 - 1e-9 && acf <= 1.0 + 1e-9)
    }
  }

  test("trend_test and theil_sen equal driver-side pairwise computations") {
    val hours = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.unix_micros($"ts"))
      .as[Long].collect().map(_ / 3600000000L)
    val series = hours.groupBy(identity(_)).map { case (h, v) => h -> v.size.toLong }
      .toSeq.sortBy(_._1)
    val n = series.size.toLong
    val pairs = for (i <- series.indices; j <- i + 1 until series.size)
      yield (series(i), series(j))
    val sStat = pairs.map { case ((_, x1), (_, x2)) =>
      java.lang.Long.signum(x2 - x1).toLong
    }.sum
    val tie = series.groupBy(_._2).values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val varS = (n * (n - 1) * (2 * n + 5) - tie).toDouble / 18.0
    val z =
      if (sStat > 0) (sStat - 1).toDouble / math.sqrt(varS)
      else if (sStat < 0) (sStat + 1).toDouble / math.sqrt(varS)
      else 0.0
    val t = SparkEntry.queries("trend_test")(spark, sf)
      .as[(Long, Long, Double)].collect().head
    assert(t._1 == n && t._2 == sStat)
    assert(math.abs(t._3 - z) < 1e-6, s"z ${t._3} vs $z")

    val slopes = pairs.map { case ((h1, x1), (h2, x2)) =>
      (x2 - x1).toDouble / (h2 - h1).toDouble
    }.sorted
    val m = slopes.size
    val med = (slopes((m + 1) / 2 - 1) + slopes(m / 2)) / 2.0
    val ts = SparkEntry.queries("theil_sen")(spark, sf)
      .as[(Long, Double)].collect().head
    assert(ts._1 == m.toLong)
    assert(math.abs(ts._2 - med) < 1e-6, s"median ${ts._2} vs $med")
  }

  test("bfs_hops equals a driver-side breadth-first walk") {
    val edges = LlmQueries.pairTable(spark, sf)
      .as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    var dist = docs.filter(_ % 100 == 0).map(_ -> 0).toMap
    for (k <- 1 to 3) {
      val frontier = dist.filter(_._2 == k - 1).keys
      val reached = frontier.flatMap(u => edges.getOrElse(u, Set.empty))
        .filterNot(dist.contains)
      dist = dist ++ reached.map(_ -> k)
    }
    val expect = docs.toSeq.map(d => dist.getOrElse(d, -1))
      .groupBy(identity(_)).map { case (k, v) => k -> v.size.toLong }
    val got = SparkEntry.queries("bfs_hops")(spark, sf)
      .as[(Int, Long)].collect().toMap
    assert(got == expect)
  }

  test("kneser_ney_lm: probabilities equal a driver-side KN computation") {
    val toks = graft.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokens($"text"))
      .as[Seq[String]].collect().filter(_.size >= 2)
    val bigrams = toks.flatMap(w => w.sliding(2).map(p => (p(0), p(1))))
    val c12 = bigrams.groupBy(identity(_)).map { case (k, v) => k -> v.size.toLong }
    val c1 = c12.toSeq.groupBy(_._1._1).map { case (w1, g) => w1 -> g.map(_._2).sum }
    val n1fw = c12.keys.toSeq.groupBy(_._1).map { case (w1, g) => w1 -> g.size.toLong }
    val ncw2 = c12.keys.toSeq.groupBy(_._2).map { case (w2, g) => w2 -> g.size.toLong }
    val nbb = c12.size.toDouble
    val got = SparkEntry.queries("kneser_ney_lm")(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(got.length == 50)
    got.foreach { case (w1, w2, c, p) =>
      assert(c12((w1, w2)) == c)
      val expect = math.max(c - 0.75, 0.0) / c1(w1) +
        (0.75 * n1fw(w1) / c1(w1)) * (ncw2(w2) / nbb)
      assert(math.abs(p - expect) < 1e-6, s"($w1,$w2) $p vs $expect")
      // a valid probability, and interpolation keeps it strictly > MLE discount floor
      assert(p > 0.0 && p <= 1.0 + 1e-9)
    }
  }

  test("good_turing: r* equals the frequency-of-frequencies identity") {
    val counts = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions
        .explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
      .filter($"t" =!= "").groupBy($"t").count()
      .as[(String, Long)].collect().map(_._2)
    val fof = counts.groupBy(identity(_)).map { case (r, v) => r -> v.size.toLong }
    val got = SparkEntry.queries("good_turing")(spark, sf)
      .as[(Long, Long, Option[Double])].collect()
    assert(got.length == math.min(20, fof.size),
      s"expected the ${math.min(20, fof.size)} smallest r rows")
    assert(got.map(_._1).toSeq == fof.keys.toSeq.sorted.take(20))
    got.foreach { case (r, nr, rstar) =>
      assert(fof(r) == nr)
      (rstar, fof.get(r + 1)) match {
        case (Some(rs), Some(n1)) =>
          val expect = (r + 1).toDouble * n1 / nr
          assert(math.abs(rs - expect) < 1e-6, s"r=$r")
        case (None, None) => ()
        case other        => fail(s"r=$r shape $other")
      }
    }
  }

  test("fps_coreset: selections equal a driver-side farthest-point walk") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .sortBy(_._1)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    def snap(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val seed = vecs.find(_._1 == 0L).get._2
    var dist = vecs.map { case (id, v) => id -> snap(1.0 - cos(v, seed)) }.toMap
    val f1 = dist.toSeq.sortBy { case (id, dv) => (-dv, id) }.head
    val f1v = vecs.find(_._1 == f1._1).get._2
    val dist2 = vecs.map { case (id, v) =>
      id -> math.min(dist(id), snap(1.0 - cos(v, f1v)))
    }.toMap
    val f2 = dist2.toSeq.sortBy { case (id, dv) => (-dv, id) }.head
    val got = SparkEntry.queries("fps_coreset")(spark, sf)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(got(0) == ((0, 0L, 0.0)))
    assert(got(1)._2 == f1._1 && math.abs(got(1)._3 - f1._2) < 1e-6)
    assert(got(2)._2 == f2._1 && math.abs(got(2)._3 - f2._2) < 1e-6)
  }
}
