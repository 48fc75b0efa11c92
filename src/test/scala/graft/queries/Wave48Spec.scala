package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Wave-48: out-of-fold target encoding, WoE/IV feature screening,
  * Benjamini-Hochberg FDR control — re-derived from scratch
  * driver-side on the sf0.001 fixtures.
  */
class Wave48Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, k: Int) = {
    val p = math.pow(10, k); math.floor(x * p + 0.5) / p
  }

  test("target_encode: matches a from-scratch out-of-fold encoding") {
    val ev = Tables.events(spark, sf)
      .filter("event_id IS NOT NULL")
      .selectExpr("event_type", "pmod(event_id, 5)",
        "CASE WHEN value > 50.0 THEN 1 ELSE 0 END")
      .as[(String, Long, Long)].collect()
    val gn = ev.size.toLong
    val gsy = ev.map(_._3).sum
    val prior = gsy.toDouble / gn
    val expected = ev.groupBy(e => (e._1, e._2)).map { case ((t, f), xs) =>
      val all = ev.filter(_._1 == t)
      val nOof = all.size - xs.size
      val sOof = all.map(_._3).sum - xs.map(_._3).sum
      (t, f, nOof.toLong, sOof,
        (sOof.toDouble + 20.0 * prior) / (nOof.toDouble + 20.0))
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("target_encode")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // leakage property: the encoding never uses the fold's own rows —
    // a category seen in one fold only encodes to the pure prior
    got.filter(_._3 == 0L).foreach(r =>
      assert(r._5 == prior, s"empty-oof row must encode to prior: $r"))
  }

  test("woe_iv: matches a from-scratch WoE/IV") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "CASE WHEN value > 50.0 THEN 1 ELSE 0 END")
      .as[(String, Long)].collect()
    val byCat = ev.groupBy(_._1)
    val pt = ev.map(_._2).sum
    val nt = ev.size - pt
    val scored = byCat.map { case (t, xs) =>
      val pos = xs.map(_._2).sum
      val neg = xs.size - pos
      val woe = rnd(math.log(((pos + 0.5) / pt.toDouble)
        / ((neg + 0.5) / nt.toDouble)), 10)
      val iv = rnd((pos.toDouble / pt - neg.toDouble / nt) * woe, 10)
      (t, pos, neg, woe, iv)
    }.toSeq.sortBy(_._1)
    val ivTotal = scored.map(r => BigDecimal(r._5)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val expected = scored.map(r => (r._1, r._2, r._3, r._4, r._5, ivTotal))
    val got = SparkEntry.queries("woe_iv")(spark, sf)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("fdr_bh: matches a from-scratch chi2 -> A&S p -> step-up walk") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "lang = 'en'")
      .as[(Long, Option[Boolean])].collect()
      .map(d => d._1 -> d._2.getOrElse(false)).toMap
    val pres = Tables.documents(spark, sf)
      .select($"doc_id",
        explode(array_distinct(filter(
          graft.functions.TextFunctions.tokens($"text"),
          t => t =!= ""))).as("term"))
      .as[(Long, String)].collect()
    val enTot = docs.values.count(identity).toLong
    val nenTot = docs.size - enTot
    val top = pres.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
      .toSeq.sortBy(p => (-p._2, p._1)).take(200)
    val scored = top.map { case (term, _) =>
      val ds = pres.filter(_._2 == term).map(_._1)
      val a = ds.count(docs(_)).toLong
      val b = ds.size - a
      val c = enTot - a; val dd = nenTot - b; val n = enTot + nenTot
      val chi2 =
        if (a + b == 0 || c + dd == 0 || a + c == 0 || b + dd == 0) 0.0
        else ((n.toDouble * (a.toDouble * dd.toDouble - b.toDouble * c.toDouble))
          * (a.toDouble * dd.toDouble - b.toDouble * c.toDouble)) /
          ((((a + b).toDouble * (c + dd).toDouble) * (a + c).toDouble)
            * (b + dd).toDouble)
      val z = math.sqrt(chi2 / 2.0)
      val t = 1.0 / (1.0 + 0.3275911 * z)
      val p = rnd(t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
        + t * (-1.453152027 + t * 1.061405429)))) * math.exp(-(z * z)), 10)
      (term, chi2, p)
    }
    val m = scored.size
    val ranked = scored.sortBy(r => (r._3, r._1)).zipWithIndex.map {
      case ((term, chi2, p), i) =>
        (term, chi2, p, i + 1, rnd((i + 1).toDouble * 0.05 / m, 10))
    }
    val k = ranked.filter(r => r._3 <= r._5).map(_._4).maxOption.getOrElse(0)
    val expected = ranked.map(r => (r._1, r._2, r._3, r._4, r._5, r._4 <= k))
    val got = SparkEntry.queries("fdr_bh")(spark, sf)
      .as[(String, Double, Double, Int, Double, Boolean)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // BH structure: p in [0,1], rejections are a prefix of the ranking
    got.foreach(r => assert(r._3 >= 0.0 && r._3 <= 1.0, s"p in [0,1]: $r"))
    val rejRanks = got.filter(_._6).map(_._4)
    assert(rejRanks == (1 to rejRanks.size), s"rejection prefix: $rejRanks")
  }
}
