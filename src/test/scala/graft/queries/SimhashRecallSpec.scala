package graft.queries

import graft.{SparkSpecBase, SparkEntry}
import org.apache.spark.sql.functions._

/** Evidence for the SimHash banding constants: ground-truth recall of
  * `simhash_neardup` (Hamming ≤ 3 over the N-derived band layout)
  * against EXACT 3-gram Jaccard similarity on a seeded corpus of
  * planted near-duplicates. The oracle gate proves Spark and DuckDB
  * agree on what the pipeline computes; this spec proves the Hamming-3
  * threshold recovers the pairs it is DESIGNED for — and pins the
  * decay as the edit fraction grows, so the candidate→verify dedup
  * story rests on committed numbers, not on the banding being
  * plausible.
  *
  * The regime matters. Each simhash bit is the sign of a ±1 sum over
  * a doc's shingles, so for a pair at cosine angle θ the per-bit flip
  * probability is θ/π and E[Hamming] = 64·θ/π. Hamming ≤ 3 therefore
  * requires cos ≳ 0.995 — roughly one token edit per ~500+ tokens.
  * It is a NEAR-EXACT duplicate detector (boilerplate variants,
  * whitespace/champion pages), complementary to the MinHash path
  * whose threshold (Jaccard ≈ 0.4+) catches loose rewrites. A 40-token
  * doc with one edit sits at Jaccard ≈ 0.85 but E[Hamming] ≈ 8 —
  * correctly NOT caught, measured recall there is ~9%.
  */
class SimhashRecallSpec extends SparkSpecBase {
  import spark.implicits._

  private val vocabSize = 400
  private val docLen = 1000
  private def word(i: Int) = s"tok$i"

  /** Deterministic corpus: 40 base docs of 1000 tokens; 30 planted
    * copies of base doc i at doc_id 1000+i — 10 exact (0 edits), 10
    * with 1 token replaced, 10 with 3 tokens replaced at spread-out
    * positions. Seeded Random — identical corpus every run.
    */
  private def mkCorpus(): (String, Map[Long, IndexedSeq[String]]) = {
    val rnd = new scala.util.Random(42)
    val base = (0 until 40).map { i =>
      i.toLong -> IndexedSeq.fill(docLen)(word(rnd.nextInt(vocabSize)))
    }
    val edited = (0 until 30).map { i =>
      val nEdits = i / 10 match { case 0 => 0; case 1 => 1; case _ => 3 }
      val toks = (0 until nEdits).foldLeft(base(i)._2) { (t, e) =>
        t.updated((97 + 293 * e + 31 * i) % t.length, word(rnd.nextInt(vocabSize)))
      }
      (1000L + i) -> toks
    }
    val docs = (base ++ edited).toMap
    val dir = tmpDir("simhash_recall_docs")
    docs.toSeq.map { case (id, toks) =>
      val text = toks.mkString(" ")
      (id, text, "en", "planted", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    (dir, docs)
  }

  private def shingles(toks: IndexedSeq[String]): Set[String] =
    toks.sliding(3).map(_.mkString(" ")).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size.toDouble

  test("Hamming<=3 recovers near-exact duplicates; reported pairs are truly similar") {
    val (dir, docs) = mkCorpus()
    try {
      val ids = docs.keys.toSeq.sorted
      val sh = docs.map { case (id, t) => id -> shingles(t) }
      def tier(t: Int) = (0 until 10).map(k => (t * 10 + k).toLong)
        .map(i => (i, i + 1000L)).toSet

      val got = SparkEntry.queries("simhash_neardup")(spark, dir)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

      def recallOf(pairs: Set[(Long, Long)]): Double =
        pairs.count(got).toDouble / pairs.size
      val (rExact, r1, r3) = (recallOf(tier(0)), recallOf(tier(1)), recallOf(tier(2)))
      def jaccOf(pairs: Set[(Long, Long)]): Double =
        pairs.map { case (a, b) => jaccard(sh(a), sh(b)) }.min
      info(f"exact copies  (jacc = 1.000): recall = $rExact%.2f")
      info(f"1-edit copies (jacc >= ${jaccOf(tier(1))}%.4f): recall = $r1%.2f")
      info(f"3-edit copies (jacc >= ${jaccOf(tier(2))}%.4f): recall = $r3%.2f")

      // Every reported pair must be genuinely similar — Hamming <= 3 on
      // 64 bits must not pair unrelated random docs.
      val truthJacc = got.map { case (a, b) => jaccard(sh(a), sh(b)) }
      info(s"lowest true jaccard among ${got.size} reported pairs: ${truthJacc.minOption}")

      // Pinned bounds = measured values with margin (seed 42 is
      // deterministic; margins absorb future banding-layout changes,
      // which can only ADD candidates — the Hamming filter is exact).
      // Theory for this corpus: 1 edit in 1000 tokens -> cos ~ 0.997,
      // E[Hamming] ~ 1.6, P(H<=3) ~ 0.93; 3 edits -> E[H] ~ 2.7 (when
      // edits' shingle damage does not overlap), P(H<=3) ~ 0.7.
      assert(rExact == 1.0, f"exact-copy recall $rExact%.2f must be 1.0 (Hamming 0)")
      assert(r1 >= 0.8, f"1-edit recall $r1%.2f below pinned 0.8")
      assert(r3 >= 0.5, f"3-edit recall $r3%.2f below pinned 0.5")
      assert(truthJacc.forall(_ >= 0.9),
        s"reported a dissimilar pair (jaccard ${truthJacc.minOption})")
    } finally LlmQueries.clearCaches(Some(spark))
  }

  test("band layout invariants: complete for Hamming<=3 at every corpus size") {
    for (n <- Seq(1L, 10L, 100L, 1000L, 64000L, 1000000L, 50000000L, Long.MaxValue / 2)) {
      val (bands, w) = LlmQueries.simhashBandLayout(n)
      assert(bands >= 4, s"n=$n: $bands bands < 4 breaks Hamming<=3 pigeonhole")
      assert(w >= 4 && w <= 16, s"n=$n: width $w outside [4,16]")
      assert(bands * w <= 64, s"n=$n: layout $bands x $w exceeds 64 bits")
    }
    // monotone: more docs never narrows bands
    val widths = Seq(100L, 10000L, 1000000L, 100000000L)
      .map(n => LlmQueries.simhashBandLayout(n)._2)
    assert(widths == widths.sorted, s"width not monotone in n: $widths")
  }

  test("band buckets stay non-degenerate on the seeded corpus") {
    val (dir, docs) = mkCorpus()
    try {
      val n = docs.size
      val buckets = LlmQueries.simhashBands(spark, dir)
        .groupBy($"band", $"key").count()
      val maxBucket = buckets.agg(max($"count")).head().getLong(0)
      info(s"n=$n, max band bucket = $maxBucket")
      // SimHash bits are corpus-biased, so buckets are NOT uniform —
      // but a bucket holding most of the corpus means the band key
      // carries no information and the self-join degenerates toward
      // quadratic. Guard at half the corpus.
      assert(maxBucket <= n / 2, s"degenerate band bucket: $maxBucket of $n docs")
    } finally LlmQueries.clearCaches(Some(spark))
  }
}
