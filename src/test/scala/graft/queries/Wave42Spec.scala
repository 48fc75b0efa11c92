package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Wave-42: JL random projection, Simpson diversity, Burrows' Delta —
  * plus the flesch_readability word-count equivalence the wave-41
  * optimization relies on.
  */
class Wave42Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("CharRunCounts equals the regex trio and TF.nTokens corpus-wide") {
    graft.plans.TextRunFunctions.register(spark)
    val rc = graft.plans.TextRunFunctions.charRunCounts($"text")
    val diff = Tables.documents(spark, sf)
      .filter("text IS NOT NULL")
      .select(
        TF.nTokens($"text").cast("long").as("a"),
        regexp_count(lower($"text"), lit("[a-z0-9]+")).cast("long").as("b"),
        regexp_count(lower($"text"), lit("[aeiouy]+")).cast("long").as("c"),
        regexp_count($"text", lit("[.!?]+")).cast("long").as("e"),
        rc.getField("words").as("w"),
        rc.getField("syllables").as("y"),
        rc.getField("sentences").as("sn"))
      .filter($"a" =!= $"b" || $"b" =!= $"w" || $"c" =!= $"y" ||
        $"e" =!= $"sn")
      .count()
    assert(diff == 0L, s"$diff docs disagree across the three formulations")
    // non-ASCII: multi-byte code points break runs exactly like the
    // regex classes (bytes >= 0x80 are in no class)
    val probe = Seq("héllo wörld. Ça va?! xy9z", "", "...", "aeiou Émile")
      .toDF("text")
      .select(graft.plans.TextRunFunctions.charRunCounts($"text").as("rc"),
        regexp_count(lower($"text"), lit("[a-z0-9]+")).cast("long").as("b"),
        regexp_count(lower($"text"), lit("[aeiouy]+")).cast("long").as("c"),
        regexp_count($"text", lit("[.!?]+")).cast("long").as("e"))
      .filter($"rc.words" =!= $"b" || $"rc.syllables" =!= $"c" ||
        $"rc.sentences" =!= $"e")
      .count()
    assert(probe == 0L, "non-ASCII probe rows disagree with the regexes")
  }

  test("rp_project: matches a from-scratch driver-side projection and pairing") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val signs = IndexedSeq.tabulate(8, 64) { (j, i) =>
      val h = md.digest(s"rp:$i:$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
    // the Rademacher matrix should be roughly balanced (sanity, not parity)
    val bal = signs.flatten.sum.abs
    assert(bal < 64 * 8 / 4, s"sign matrix suspiciously unbalanced: $bal")
    val vecs = Tables.embeddings(spark, sf)
      .filter("vec_id < 200 AND embedding IS NOT NULL")
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }; s
    }
    def rnd(x: Double, n: Int) = {
      val p = math.pow(10, n); math.floor(x * p + 0.5) / p
    }
    val proj = vecs.map { case (id, e) =>
      val ed = e.map(_.toDouble)
      (id, ed, signs.map(sg => dot(ed, sg.toArray) / math.sqrt(8.0)))
    }
    val pairs = for {
      (ia, ea, pa) <- proj; (ib, eb, pb) <- proj if ia < ib
    } yield {
      val d2p = (0 until 8).map(j => (pa(j) - pb(j)) * (pa(j) - pb(j))).sum
      val d2t = dot(ea, ea) + dot(eb, eb) - 2.0 * dot(ea, eb)
      (ia, ib, rnd(d2p, 6), rnd(d2t, 6))
    }
    val expected = pairs.sortBy(p => (p._3, p._1, p._2)).take(20).toSeq
    val got = SparkEntry.queries("rp_project")(spark, sf)
      .as[(Long, Long, Double, Double)].collect().toSeq
    // the 8-term sums: driver folds left like the engine's reduce
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // JL sanity: projected distance is a contraction estimate — the
    // top-20 projected-closest pairs should skew below the median true
    // d2. k=8 on 50-cluster Gaussians is deliberately coarse (the
    // whole point is 8 mults/pair), so require strictly-above-chance
    // (chance = 10/20), not a tight recall bound.
    val medTrue = pairs.map(_._4).sorted.apply(pairs.length / 2)
    val hits = got.count(_._4 < medTrue)
    assert(hits > 10, s"projection lost the metric: only $hits/20 below median")
  }

  test("simpson_diversity: matches a from-scratch token recount") {
    val toks = Tables.documents(spark, sf)
      .filter("text IS NOT NULL")
      .select($"source", explode(TF.tokens($"text")).as("term"))
      .filter($"term" =!= "")
      .as[(String, String)].collect()
    val expected = toks.groupBy(_._1).map { case (src, ts) =>
      val counts = ts.groupBy(_._2).map(_._2.size.toLong)
      val n = counts.sum
      val sc2 = counts.map(c => c * (c - 1)).sum
      def rnd(x: Double, k: Int) = {
        val p = math.pow(10, k); math.floor(x * p + 0.5) / p
      }
      (src, n, counts.size.toLong,
        rnd(sc2.toDouble / (n.toDouble * (n - 1).toDouble), 9),
        rnd((n.toDouble * (n - 1).toDouble) / sc2.toDouble, 4))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("simpson_diversity")(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("burrows_delta: zero distance between token-identical sources") {
    val dir = tmpDir("wave42_burrows")
    // two sources with IDENTICAL token distributions, one divergent
    val rows = Seq(
      (0L, "alpha beta gamma alpha", "en", "srcA", 22L),
      (1L, "delta alpha beta beta", "en", "srcA", 22L),
      (2L, "alpha beta gamma alpha", "en", "srcB", 22L),
      (3L, "delta alpha beta beta", "en", "srcB", 22L),
      (4L, "omega omega omega psi psi chi", "en", "srcC", 29L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("burrows_delta")(spark, dir)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got(("srcA", "srcB")) == 0.0, s"identical sources must be 0: $got")
    assert(got(("srcA", "srcC")) > 0.0 && got(("srcB", "srcC")) > 0.0)
    assert(got(("srcA", "srcC")) == got(("srcB", "srcC")),
      "equal distributions must sit at the same distance from srcC")
  }

  test("burrows_delta: fixture run is symmetric-complete and in-range") {
    val got = SparkEntry.queries("burrows_delta")(spark, sf)
      .as[(String, String, Long, Double)].collect().toSeq
    val sources = Tables.documents(spark, sf)
      .filter("source IS NOT NULL AND text IS NOT NULL")
      .select("source").distinct().as[String].collect().sorted
    assert(got.size == sources.length * (sources.length - 1) / 2,
      "one row per unordered source pair")
    got.foreach { r =>
      assert(r._1 < r._2, "pairs are emitted once, a < b")
      assert(r._3 == 30L, s"top-30 pool expected, got ${r._3}")
      assert(r._4 >= 0.0, "delta is a mean of absolute values")
    }
  }
}
