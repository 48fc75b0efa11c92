package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-57 operators (round 12): Cohen's kappa, the decile lift
  * table, and the Page–Hinkley drift detector. Brute-force replicas
  * on sf0.001 with the same snap discipline; exact to 1e-9.
  */
class Wave57Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, d: Int): Double = {
    val p = math.pow(10, d)
    val y = x * p + 0.5
    (y - (((y % 1.0) + 1.0) % 1.0)) / p
  }

  test("cohens_kappa: matches a brute-force confusion replica; kappa <= po bound holds") {
    val rows = Tables.documents(spark, sf)
      .select($"lang", $"text").as[(Option[String], Option[String])].collect()
    def predict(t: Option[String]): String = {
      val norm = t.getOrElse("").toLowerCase
        .replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ").trim
      def has(w: String) = s" $norm ".contains(s" $w ")
      if (has("der") || has("und") || has("die")) "de"
      else if (has("le") || has("la") || has("et")) "fr"
      else if (has("el") || has("los") || has("una")) "es"
      else if (has("the") || has("and") || has("is")) "en"
      else "unknown"
    }
    val pairs = rows.map { case (l, t) => (l.getOrElse("__null__"), predict(t)) }
    val n = pairs.length.toLong
    val diag = pairs.count(p => p._1 == p._2).toLong
    val ra = pairs.groupBy(_._1).map { case (k, g) => k -> BigInt(g.length) }
    val cb = pairs.groupBy(_._2).map { case (k, g) => k -> BigInt(g.length) }
    val sPe = ra.map { case (k, r) => r * cb.getOrElse(k, BigInt(0)) }.sum
    val po = rnd(diag.toDouble / n.toDouble, 6)
    val pe = rnd(sPe.toDouble / (n.toDouble * n.toDouble), 6)
    val kappa =
      if (1.0 - pe <= 0.0) None else Some(rnd((po - pe) / (1.0 - pe), 6))
    val got = SparkEntry.queries("cohens_kappa")(spark, sf)
      .as[(Long, Long, Double, Double, Option[Double])].collect()
    assert(got.length == 1)
    val (gn, gd, gpo, gpe, gk) = got.head
    assert(gn == n && gd == diag)
    assert(math.abs(gpo - po) < 1e-9 && math.abs(gpe - pe) < 1e-9)
    assert(gk.isDefined == kappa.isDefined)
    for (w <- kappa; v <- gk) {
      assert(math.abs(v - w) < 1e-9, s"kappa $v vs $w")
      assert(v <= 1.0 + 1e-9) // perfect agreement bound
    }
  }

  test("lift_table: matches NTILE-decile brute force; gains are monotone, overall lift is 1") {
    val rows = Tables.embeddings(spark, sf)
      .selectExpr("element_at(embedding, 1) AS score", "label", "vec_id")
      .as[(Option[Float], Option[Int], Long)].collect()
    // score DESC NULLS LAST, vec_id ASC; then SQL NTILE(10)
    val sorted = rows.sortBy { case (sc, _, id) =>
      (sc.map(x => -x.toDouble).getOrElse(Double.MaxValue), id)
    }
    val n = sorted.length
    val base = n / 10; val rem = n % 10
    val want = scala.collection.mutable.Map.empty[Int, (Long, Long)]
    var idx = 0
    (1 to 10).foreach { tile =>
      val sz = base + (if (tile <= rem) 1 else 0)
      val slice = sorted.slice(idx, idx + sz); idx += sz
      if (sz > 0) {
        val pos = slice.count(_._2.exists(_ >= 5)).toLong
        want(tile) = (sz.toLong, pos)
      }
    }
    val pt = want.values.map(_._2).sum
    val nt = want.values.map(_._1).sum
    val got = SparkEntry.queries("lift_table")(spark, sf)
      .as[(Int, Long, Long, Double, Option[Double], Option[Double])]
      .collect()
    assert(got.map(_._1).toSet == want.keySet)
    var cumN = 0L; var cumP = 0L; var prevGain = 0.0
    got.sortBy(_._1).foreach { case (dec, gn, gp, rr, gain, lift) =>
      withClue(s"decile $dec: ") {
        val (wn, wp) = want(dec)
        assert(gn == wn && gp == wp)
        cumN += wn; cumP += wp
        assert(math.abs(rr - rnd(wp.toDouble / wn.toDouble, 6)) < 1e-12)
        val wantGain = rnd(cumP.toDouble / pt.toDouble, 6)
        assert(math.abs(gain.get - wantGain) < 1e-12)
        assert(gain.get >= prevGain - 1e-12, "gain monotone")
        prevGain = gain.get
        val wantLift = rnd((cumP.toDouble / pt.toDouble) /
          (cumN.toDouble / nt.toDouble), 6)
        assert(math.abs(lift.get - wantLift) < 1e-12)
      }
    }
    // the last row covers everything: gain = 1, lift = 1
    val last = got.maxBy(_._1)
    assert(math.abs(last._5.get - 1.0) < 1e-9)
    assert(math.abs(last._6.get - 1.0) < 1e-9)
  }

  test("page_hinkley: matches a brute-force running-mean fold; PH >= 0") {
    val cells = Tables.events(spark, sf)
      .where($"ts".isNotNull && $"event_type".isNotNull)
      .selectExpr("event_type", "unix_millis(ts) DIV 86400000 AS day")
      .as[(String, Long)].collect()
    val d0 = cells.map(_._2).min
    val d1 = cells.map(_._2).max
    val want = cells.groupBy(_._1).map { case (t, g) =>
      val counts = g.groupBy(_._2).map { case (dd, gg) => dd -> gg.length.toLong }
      val s = (d0 to d1).map(dd => counts.getOrElse(dd, 0L))
      var tt = 0.0; var cum = 0.0; var mht = 0.0; var minm = 0.0
      var ph = 0.0; var targ = 0.0
      s.foreach { xl =>
        val x = xl.toDouble
        tt += 1.0
        cum += x
        mht += x - cum / tt
        minm = math.min(minm, mht)
        val cand = mht - minm
        if (cand > ph) targ = tt
        ph = math.max(ph, cand)
      }
      t -> ((s.length, rnd(cum / s.length.toDouble, 6), rnd(ph, 6),
        targ.toInt))
    }
    val got = SparkEntry.queries("page_hinkley")(spark, sf)
      .as[(String, Int, Double, Double, Int)].collect()
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (t, nd, mean, ph, ta) =>
      withClue(s"type $t: ") {
        val (wn, wm, wp, wt) = want(t)
        assert(nd == wn)
        assert(math.abs(mean - wm) < 1e-9)
        assert(math.abs(ph - wp) < 1e-9, s"PH $ph vs $wp")
        assert(ta == wt, s"t_alarm $ta vs $wt")
        assert(ph >= 0.0)
      }
    }
  }
}
