package graft.queries

import graft.{SparkSpecBase, SparkEntry}
import org.apache.spark.sql.functions._

/** Semantic recall of the dedup pipeline on PLANTED duplicates: the
  * oracle gate proves Spark and DuckDB agree on what the pipeline
  * computes; this spec proves the pipeline computes the RIGHT thing —
  * exact copies and lightly-edited near-copies are recovered as
  * candidate pairs, verified by Jaccard, and collapsed into one
  * cluster, while unrelated documents stay unpaired.
  */
class DedupRecallSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkCorpus(): String = {
    val dir = tmpDir("planted_docs")
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles watch from a mossy stone bridge near the old paper mill " +
      "and a small river bends quietly through the valley toward the sea"
    val nearCopy = base.replace("seventeen", "nineteen") // 1-token edit
    val nearCopy2 = base + " in the late afternoon light"  // small suffix
    val unrelatedA = "completely different content about compilers and type " +
      "systems with monomorphization inlining escape analysis and register " +
      "allocation across basic blocks in a static single assignment form"
    val unrelatedB = "a cooking recipe that folds butter into laminated dough " +
      "with three letter folds chilled between turns for flaky croissants " +
      "baked at two hundred degrees until golden and crisp"
    val rows = Seq(
      (0L, base), (1L, nearCopy), (2L, nearCopy2), (3L, base), // 3 near + 1 exact
      (4L, unrelatedA), (5L, unrelatedB))
      .map { case (id, t) => (id, t, "en", "planted", t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted exact and near duplicates are recovered; unrelated docs are not paired") {
    val dir = mkCorpus()
    try {
      val planted = Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))

      // candidate generation (MinHash LSH) finds every planted pair
      val cand = SparkEntry.queries("minhash_dedup")(spark, dir)
        .as[(Long, Long)].collect().toSet
      assert(planted.subsetOf(cand), s"missed candidates: ${planted -- cand}")
      // and nothing involving the unrelated docs
      assert(!cand.exists { case (a, b) => a >= 4L || b >= 4L },
        s"false candidates: ${cand.filter { case (a, b) => a >= 4L || b >= 4L }}")

      // Jaccard verification keeps the planted pairs (>= 0.4 on 1-edit copies)
      val verified = SparkEntry.queries("ngram_jaccard")(spark, dir)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(planted.subsetOf(verified), s"verification dropped: ${planted -- verified}")

      // exact dedup collapses the byte-identical pair only
      val exact = SparkEntry.queries("exact_dedup")(spark, dir)
        .filter($"n_copies" > 1).as[(String, Long, Long)].collect()
      assert(exact.length == 1 && exact.head._2 == 0L && exact.head._3 == 2L)

      // cluster resolution: docs 0-3 one component with keeper 0,
      // unrelated docs are their own singletons
      val clusters = SparkEntry.queries("dedup_clusters")(spark, dir)
        .as[(Long, Long)].collect().toMap
      assert(Seq(0L, 1L, 2L, 3L).forall(clusters(_) == 0L), clusters.toString)
      assert(clusters(4L) == 4L && clusters(5L) == 5L)

      // 64-bit simhash agrees: planted pairs within Hamming 3
      val sim = SparkEntry.queries("simhash_neardup")(spark, dir)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(sim.contains((0L, 3L)), "exact copy not Hamming-0")
    } finally LlmQueries.clearCaches(Some(spark))
  }
}
