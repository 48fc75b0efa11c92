package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Wave-45: higher-moment profiling, TextTiling segmentation, golden-
  * record merge — re-derived from scratch driver-side.
  */
class Wave45Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, k: Int) = {
    val p = math.pow(10, k); math.floor(x * p + 0.5) / p
  }

  test("moments_profile: matches exact integer central moments") {
    val cases = Seq(
      ("lineitem", "l_extendedprice", Tables.lineitem(spark, sf)),
      ("lineitem", "l_quantity", Tables.lineitem(spark, sf)),
      ("lineitem", "l_discount", Tables.lineitem(spark, sf)),
      ("orders", "o_totalprice", Tables.orders(spark, sf)),
      ("events", "value", Tables.events(spark, sf)))
    val expected = cases.map { case (tn, cn, df) =>
      val cents = df.select(
        (col(cn).cast("decimal(18,2)") * 100).cast("long").as("c"))
        .filter($"c".isNotNull).as[Long].collect()
      val n = cents.length.toLong
      val sc = cents.map(BigInt(_)).sum
      val mu = (sc / n).toLong // floors for positive sums
      val devs = cents.map(c => BigInt(c - mu))
      val s2 = devs.map(d => d * d).sum
      val s3 = devs.map(d => d * d * d).sum
      val s4 = devs.map(d => d * d * d * d).sum
      val m2 = s2.toDouble / n; val m3 = s3.toDouble / n
      val m4 = s4.toDouble / n
      (tn, cn, n, rnd(sc.toDouble / n / 100.0, 6),
        rnd(math.sqrt(m2) / 100.0, 6),
        rnd(m3 / (m2 * math.sqrt(m2)), 6),
        rnd(m4 / (m2 * m2) - 3.0, 6))
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("moments_profile")(spark, sf)
      .as[(String, String, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // skewness/kurtosis are shift-invariant up to the <=1-cent floored
    // mean; sanity: l_discount (uniform-ish) has negative excess kurtosis
    val disc = got.find(r => r._2 == "l_discount").get
    assert(disc._7 < 0.0, s"uniform-ish discount should be platykurtic: $disc")
  }

  test("texttiling_segments: matches a from-scratch block walk; repeated text has no boundary") {
    val docs = Tables.documents(spark, sf)
      .filter("text IS NOT NULL")
      .select($"doc_id", TF.tokens($"text").as("toks"))
      .filter(expr("size(toks) > 0 AND NOT (size(toks) = 1 AND toks[0] = '')"))
      .as[(Long, Seq[String])].collect()
    val expected = docs.map { case (id, toks) =>
      val n = toks.size
      val nb = (n + 19) / 20
      val sims = if (nb >= 2) (0 until nb - 1).map { i =>
        val a = toks.slice(i * 20, math.min((i + 1) * 20, n)).distinct.toSet
        val b = toks.slice((i + 1) * 20, math.min((i + 2) * 20, n)).distinct.toSet
        val inter = (a & b).size
        inter.toDouble / (a.size + b.size - inter).toDouble
      } else Seq.empty[Double]
      val nbd = sims.count(_ < 0.1)
      (id, n, nb.toLong, nbd, nbd + 1,
        if (nb >= 2) rnd(sims.sum / (nb - 1).toDouble, 6) else Double.NaN)
    }.sortBy(_._1)
    val got = SparkEntry.queries("texttiling_segments")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getInt(4),
        if (r.isNullAt(5)) Double.NaN else r.getDouble(5))).toSeq
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 &&
        g._4 == e._4 && g._5 == e._5 &&
        (g._6.isNaN && e._6.isNaN || g._6 == e._6), s"diff: $g vs $e")
    }
    // property: a document of one repeated token segments exactly once
    val dir = tmpDir("wave45_tt")
    Seq((0L, ("tok " * 100).trim, "en", "src", 399L),
      (1L, "only four tokens here", "en", "src", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("texttiling_segments")(spark, dir)
      .select("doc_id", "n_boundaries", "n_segments")
      .as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows == Map(0L -> ((0, 1)), 1L -> ((0, 1))), s"got $rows")
  }

  test("golden_record: field survivorship on a constructed cluster") {
    // three near-identical docs (one shared long text => one LSH
    // cluster) with conflicting lang/source fields
    val base = ("the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest tonight") * 3
    val dir = tmpDir("wave45_gr")
    Seq(
      (10L, base + " alpha", "en", "srcA", 0L),
      (11L, base + " beta", "de", "srcB", 0L),
      (12L, base + " gamma", "en", "srcB", 0L),
      (13L, "completely unrelated tiny text", "fr", "srcC", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("golden_record")(spark, dir)
      .as[(Long, Long, Long, Long, String, String)].collect().toSeq
    assert(got.size == 1, s"exactly the constructed cluster: $got")
    val r = got.head
    assert(r._1 == 10L && r._2 == 3L && r._3 == 10L,
      s"canonical id must be the min member: $r")
    assert(r._5 == "en", s"lang mode is en (2 of 3): $r")
    assert(r._6 == "srcB", s"source mode is srcB (2 of 3): $r")
    assert(r._4 == (base + " gamma").length,
      s"max_chars survives from the longest member: $r")
  }

  test("golden_record: fixture clusters are >=2 members with min-id canonical") {
    val got = SparkEntry.queries("golden_record")(spark, sf)
      .as[(Long, Long, Long, Long, String, String)].collect().toSeq
    got.foreach { r =>
      assert(r._2 >= 2L, s"singleton leaked: $r")
      assert(r._3 == r._1, s"canonical must equal the min-label cluster id: $r")
    }
  }
}
