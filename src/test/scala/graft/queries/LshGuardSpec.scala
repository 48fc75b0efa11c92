package graft.queries

import graft.{SparkSpecBase, SparkEntry}
import org.apache.spark.sql.functions._

/** The LSH mega-bucket guard: a band key whose bucket exceeds
  * LshBucketCap must not generate quadratic candidate pairs (the
  * measured 10×-scale hazard — one 905-doc bucket is 409k pairs under
  * all-pairs, 904 under the guard), yet dedup RECALL must be
  * unchanged — every doc of the capped bucket still lands in one
  * cluster, and genuine near-dup pairs outside the bucket are still
  * pairwise-verified.
  */
class LshGuardSpec extends SparkSpecBase {
  import spark.implicits._

  test("capped bucket degrades to star edges; small buckets stay all-pairs") {
    // bucket (0,"k"): 6 docs, cap 4 → star edges to rep 0 only
    // bucket (1,"m"): 3 docs ≤ cap → all 3 pairs
    val bands = (
      (0L to 5L).map(id => (id, 0, "k")) ++
      Seq(10L, 11L, 12L).map(id => (id, 1, "m"))
    ).toDF("doc_id", "band", "key")
    val got = LlmQueries.candidatePairs(bands, cap = 4)
      .as[(Long, Long)].collect().toSet
    val stars = (1L to 5L).map((0L, _)).toSet
    val small = Set((10L, 11L), (10L, 12L), (11L, 12L))
    assert(got == stars ++ small, s"got $got")
  }

  test("guarded pairs span the same components as unguarded all-pairs") {
    // two oversized buckets sharing doc 7 (chains the components) plus
    // a small bucket — component structure must be IDENTICAL with and
    // without the guard, because a star spans what the clique spans
    val bands = (
      (0L to 7L).map(id => (id, 0, "a")) ++
      (7L to 14L).map(id => (id, 1, "b")) ++
      Seq(20L, 21L).map(id => (id, 2, "c"))
    ).toDF("doc_id", "band", "key")
    val docs = ((0L to 14L) ++ Seq(20L, 21L, 30L)).toDF("id")
    def comps(cap: Long): Map[Long, Long] =
      graft.operators.ConnectedComponents.minLabel(
        docs,
        LlmQueries.candidatePairs(bands, cap)
          .select($"doc_a".as("src"), $"doc_b".as("dst")))
        .as[(Long, Long)].collect().toMap
    val guarded = comps(cap = 4)
    val unguarded = comps(cap = Long.MaxValue)
    assert(guarded == unguarded,
      s"components diverged: ${guarded.toSeq.sorted} vs ${unguarded.toSeq.sorted}")
    assert((0L to 14L).forall(guarded(_) == 0L), guarded.toString)
    assert(guarded(20L) == 20L && guarded(21L) == 20L && guarded(30L) == 30L)
  }

  test("production cap triggers on a boilerplate corpus without losing planted recall") {
    val dir = tmpDir("boilerplate_docs")
    val boiler = "all rights reserved this page is intentionally left blank " +
      "please enable javascript to view the content of this website properly " +
      "copyright notice terms of service privacy policy contact us about us"
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles watch from a mossy stone bridge near the old paper mill " +
      "and a small river bends quietly through the valley toward the sea"
    val near = base.replace("seventeen", "nineteen")
    val unrelated = "a cooking recipe that folds butter into laminated dough " +
      "with three letter folds chilled between turns for flaky croissants " +
      "baked at two hundred degrees until golden and crisp"
    val nBoiler = (LlmQueries.LshBucketCap + 44).toInt // 300 > cap
    val rows =
      (0 until nBoiler).map(i => (i.toLong, boiler)) ++
      Seq((1000L, base), (1001L, near), (1002L, unrelated))
    rows.map { case (id, t) => (id, t, "en", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    try {
      val pairs = SparkEntry.queries("minhash_dedup")(spark, dir)
        .as[(Long, Long)].collect()
      // the identical boilerplate docs share every band key → one
      // mega-bucket → exactly nBoiler-1 star edges from rep 0, not
      // the ~45k the clique would emit
      val boilerPairs = pairs.filter { case (a, b) => a < 1000L && b < 1000L }
      assert(boilerPairs.length == nBoiler - 1, s"${boilerPairs.length} pairs")
      assert(boilerPairs.forall(_._1 == 0L), "star edges must anchor at the rep")
      // planted near-dup outside the bucket still pairwise-generated
      // and Jaccard-verified
      assert(pairs.contains((1000L, 1001L)), pairs.filter(_._1 >= 1000L).toSeq.toString)
      val verified = SparkEntry.queries("ngram_jaccard")(spark, dir)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(verified.contains((1000L, 1001L)), "near-dup pair lost in verification")
      // the per-doc verification budget ENGAGES on the star rep: doc 0
      // owns nBoiler-1 star edges in the candidate graph, but exact
      // verification scores at most VerifyDegreeCap of them (the
      // round-14 100× finding: unbudgeted Σ_pairs |shingles| exhausted
      // local disk even on 8-byte shingle ids). The budget must bound
      // the VERIFIER without touching the candidate graph above.
      val repVerified = verified.count(_._1 == 0L)
      assert(repVerified.toLong == LlmQueries.VerifyDegreeCap,
        s"star rep verified $repVerified pairs; budget is ${LlmQueries.VerifyDegreeCap}")
      // recall at the cluster level: every boilerplate doc resolves to
      // one component; base/near pair to each other; unrelated alone
      val clusters = SparkEntry.queries("dedup_clusters")(spark, dir)
        .as[(Long, Long)].collect().toMap
      assert((0 until nBoiler).forall(i => clusters(i.toLong) == 0L))
      assert(clusters(1000L) == 1000L && clusters(1001L) == 1000L)
      assert(clusters(1002L) == 1002L)
    } finally LlmQueries.clearCaches(Some(spark))
  }
}
