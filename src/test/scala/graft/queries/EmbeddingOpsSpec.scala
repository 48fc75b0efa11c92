package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Thirteenth-wave training-prep operators. kmeans_iterate gets a
  * full driver-side recompute (independent arbiter); the contrastive
  * ops get label-contract and ordering checks against the raw
  * embeddings table.
  */
class EmbeddingOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val labelOf: Map[Long, Int] =
    graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap

  test("knn_hard_negatives: every negative crosses the label boundary, ranked desc") {
    val rows = SparkEntry.queries("knn_hard_negatives")(spark, sf)
      .as[(Long, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, neg, _, _) =>
      assert(labelOf(q) != labelOf(neg), s"neg $neg shares label with query $q")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val bySim = rs.sortBy(_._3).map(_._4)
      assert(bySim.toSeq == bySim.sortBy(-_).toSeq, s"query $q sims not desc")
      assert(rs.length <= 3)
    }
  }

  test("contrastive_triplets: pos same-label non-self, neg cross-label, margin exact") {
    val rows = SparkEntry.queries("contrastive_triplets")(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, pos, neg, ps, ns, m) =>
      assert(pos != q, s"anchor $q chose itself as positive")
      assert(labelOf(q) == labelOf(pos), s"positive $pos crosses label of $q")
      assert(labelOf(q) != labelOf(neg), s"negative $neg shares label of $q")
      assert(m == ps - ns, s"margin drift for $q")
    }
  }

  test("kmeans_iterate: matches a from-scratch driver-side Lloyd update") {
    val embs = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val cents = embs.filter(_._1 < 50).map { case (id, e) => id -> e }.toMap
    def snap(x: Double, n: Int): Double = {
      val p = math.pow(10, n); math.floor(x * p + 0.5) / p
    }
    // independent arbiter: plain nearest-centroid assignment on exact
    // double math (no xx−2xc+cc rearrangement), BigDecimal dim means
    val assign = embs.map { case (id, e) =>
      val best = cents.toSeq.map { case (c, ce) =>
        val d2 = e.zip(ce).map { case (a, b) =>
          (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble)
        }.sum
        (d2, c)
      }.minBy { case (d2, c) => (d2, c) }
      id -> best._2
    }
    val byCell = assign.groupBy(_._2)
    val expected = byCell.map { case (cell, members) =>
      val vecs = members.map(m => embs.find(_._1 == m._1).get._2)
      val dim = vecs.head.length
      val mean = (0 until dim).map { p =>
        val s = vecs.map(v => BigDecimal(snap(v(p).toDouble, 6))).sum
        (s / vecs.length).toDouble
      }
      val shift2 = (0 until dim).map { p =>
        val md = mean(p) - cents(cell)(p).toDouble
        BigDecimal(snap(md * md, 12))
      }.sum.toDouble
      cell -> (members.size.toLong, snap(math.sqrt(shift2), 6))
    }
    val got = SparkEntry.queries("kmeans_iterate")(spark, sf)
      .as[(Long, Long, Double)].collect()
      .map { case (c, n, sh) => c -> (n, sh) }.toMap
    assert(got.keySet == expected.keySet, "cell sets differ")
    expected.foreach { case (cell, (n, sh)) =>
      assert(got(cell)._1 == n, s"cell $cell size ${got(cell)._1} != $n")
      // the arbiter computes d2 without the dot-product rearrangement,
      // so assignments can only differ on exact ties; the shift must
      // agree to rounding noise
      assert(math.abs(got(cell)._2 - sh) < 1e-9,
        s"cell $cell shift ${got(cell)._2} != $sh")
    }
  }

  test("ngram_novelty: copied doc has zero novelty, originals absorb it") {
    val dir = tmpDir("novelty")
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (1L, text, "en", "a", 1L),
      (2L, text, "en", "a", 1L), // exact copy — all shingles first-seen in doc 1
      (3L, "totally different words entirely fresh content here now", "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    LlmQueries.clearCaches(Some(spark))
    val rows = SparkEntry.queries("ngram_novelty")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(rows(1L)._4 == 1.0, "first doc not fully novel")
    assert(rows(2L)._4 == 0.0, "exact copy reported novel shingles")
    assert(rows(3L)._4 == 1.0, "unrelated doc not fully novel")
    // distinct shingles partition exactly into novel claims
    val totalNovel = rows.values.map(_._3).sum
    val distinctShingles = LlmQueries.distinctShingleTable(spark, dir)
      .select($"sh").distinct().count()
    assert(totalNovel == distinctShingles)
    LlmQueries.clearCaches(Some(spark))
  }

  test("quality_calibration: buckets in range, doc counts conserved") {
    val rows = SparkEntry.queries("quality_calibration")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, n, np, pr) =>
      assert(b >= 0 && b <= 20, s"bucket $b out of range")
      assert(np <= n)
      assert(pr >= 0.0 && pr <= 1.0)
    }
    val scored = SparkEntry.queries("lm_score")(spark, sf).count()
    assert(rows.map(_._2).sum == scored,
      "calibration drops or double-counts scored docs")
  }
}
