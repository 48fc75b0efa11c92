package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * after the per-document analyses in [[LlmQueries]] (SURVEY.md §2.11
  * extensions): dedup-cluster resolution, deterministic stratified
  * sampling, benchmark-contamination screening, and quality-percentile
  * gating.
  *
  * Scale/perf design:
  *  - `dedup_clusters` is iterative min-label propagation over the LSH
  *    candidate edges — the standard distributed connected-components
  *    shape (each iteration: one keyed join + one aggregate; no
  *    adjacency ever collects to the driver). Near-dup clusters are
  *    small-diameter, so it converges in a handful of rounds; a corpus
  *    with pathological chain components would swap in large-star /
  *    small-star alternation (O(log n) rounds) with the same per-round
  *    plan shape.
  *  - Sampling/gating are pure column arithmetic (seeded md5 →
  *    uniform; window percent_rank) — single-pass, codegen'd,
  *    shuffle-free except the per-stratum window.
  *  - Contamination screening keeps shingles as rows and semi-joins
  *    against the (small) benchmark shingle set — broadcast at scale,
  *    never an array intersection.
  */
object CorpusOpsQueries {

  /** Training-shard fan-out for shard_plan (one knob, mirrored into
    * its oracle so Spark and DuckDB can never disagree on S).
    */
  private val ShardCount = 16

  /** Winnowing doc-length bound: fingerprints (and therefore span
    * cuts) consider the first N normalized chars of each document —
    * the MOSS-style size cap. Two reasons, both measured on the 10×
    * long-doc sweep corpus (VERDICT r10 item 2 / ADVICE r10): the
    * array-HOF build holds ~2×8 bytes per char in ONE row (no spill
    * path), and the gram-hash cost is ∝ chars (winnow_fingerprint hit
    * 213 s when 0.5% of docs carried 12-50k chars). 20k covers every
    * fixture (adversarial max 5k) so the cap is DORMANT at oracle
    * scale; it is mirrored verbatim into [[duckWinnowCtes]], so both
    * engines always fingerprint the same prefix. Bounds per-row array
    * width at ~320 KB.
    */
  private val WinnowMaxChars = 20000

  /** Count-min-sketch geometry for cms_heavy_hitters (depth × width
    * counters) and the exact-top-K readout size. W = 256 keeps the
    * expected overcount ≈ N/256 visible at fixture scale (a sketch
    * whose error the oracle can SEE is a tested sketch); production
    * widths just change the literal. Mirrored.
    */
  private val CmsDepth = 4
  private val CmsWidth = 256L
  private val CmsTopK = 20

  /** rocchio_expand shape: seed terms (top-[[RocchioSeeds]] by total
    * tf), feedback-doc count R, expansion-term count E. Mirrored.
    */
  private val RocchioSeeds = 2
  private val RocchioR = 10
  private val RocchioE = 20

  /** Per-doc winnowing build (doc_id, wins): char 8-gram md5 hashes
    * over normalized text (capped at [[WinnowMaxChars]]) and the min
    * of each sliding 4-window, full windows only
    * (Schleimer/Wilkerson/Aiken winnowing, SIGMOD 2003 — public).
    * wins[i] (0-based) is the minimum over gram positions i+1..i+4,
    * i.e. the full window ENDING at 1-based gram position p = i + 4.
    *
    * IMPERATIVE mapPartitions, deliberately (the documented
    * last-resort case, alongside heavy_hitters' Misra-Gries pass and
    * the image/audio codec rows): this is the engine's one char-level
    * sliding-window computation, and three successive declarative
    * shapes each hid a measured scale hazard —
    *  - r9's explode + doc-keyed window: O(n) per doc but a
    *    corpus-wide char-row SHUFFLE (the r9 profile's biggest line,
    *    ~16.5 s at sf0.1);
    *  - r10's array-HOF projection with t.substr(p, k) grams:
    *    shuffle-free, but UTF8String.substring walks bytes from the
    *    string start, so grams cost O(p) each = O(n²) per doc
    *    (measured 2,188 cpu-s on the 10× long-doc sweep corpus);
    *  - pre-splitting a char array to make grams O(k): CollapseProject
    *    inlines the split INTO the per-gram lambda (a lambda-embedded
    *    reference counts as "used once"), re-splitting the whole text
    *    per gram — worse than the substr it replaced.
    * The per-partition loop is O(n) per doc, shuffle-free, and has no
    * expression-layer inlining surface. Hash values are bit-identical
    * to the declarative form and the oracle (first 4 md5 bytes as
    * unsigned big-endian = conv(substr(md5_hex, 1, 8), 16, 10));
    * Round9Spec pins both the fingerprint sets and the window counts
    * against an independent explode+window replica.
    */
  private def winnowDocBuild(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 8; val w = 4
    Tables.documents(s, d)
      .select($"doc_id",
        substring(TF.normText($"text"), 1, WinnowMaxChars).as("t"))
      .filter(length($"t") >= k + w - 1)
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, t) =>
          val n = t.length - (k - 1)
          val g = new Array[Long](n)
          var i = 0
          while (i < n) {
            md.reset()
            val h = md.digest(t.substring(i, i + k)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            g(i) = java.lang.Integer.toUnsignedLong(
              ((h(0) & 0xff) << 24) | ((h(1) & 0xff) << 16) |
                ((h(2) & 0xff) << 8) | (h(3) & 0xff))
            i += 1
          }
          val wins = new Array[Long](n - (w - 1))
          var j = 0
          while (j < wins.length) {
            var m = g(j)
            var x = 1
            while (x < w) { if (g(j + x) < m) m = g(j + x); x += 1 }
            wins(j) = m
            j += 1
          }
          (id, wins)
        }
      }
      .toDF("doc_id", "wins")
  }

  /** Memoized per-doc winnowing sketch (doc_id, n_windows, fps):
    * full-window count plus the DISTINCT fingerprint set as an array —
    * built by [[winnowDocBuild]] in one shuffle-free pass and shared
    * by winnow_fingerprint (per-doc stats are array arithmetic on it)
    * and winnow_matches (explodes fps for the shared-fingerprint
    * join). ~1 distinct long per ~4 chars of corpus: dramatically
    * smaller than the window-rows relation (which measurably SPILLED
    * when cached in r9), so this is the artifact worth keeping hot.
    * Released after winnow_matches (the family's last consumer).
    */
  private[queries] def winnowDocTable(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    LlmQueries.memoized(s, d, "winnow_fps") {
      winnowDocBuild(s, d)
        .select(col("doc_id"),
          size(col("wins")).cast("long").as("n_windows"),
          array_distinct(col("wins")).as("fps"))
    }

  /** Distinct per-doc fingerprint rows (doc_id, fp), exploded from the
    * memoized [[winnowDocTable]] — the row-shaped view winnow_matches'
    * join branches consume.
    */
  private[queries] def winnowFps(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    winnowDocTable(s, d).select(col("doc_id"), explode(col("fps")).as("fp"))

  /** Winnowing window rows (doc_id, p, fp) WITH gram positions —
    * [[winnowDocBuild]] posexploded. Only span-level consumers
    * (substring_dedup_cut) need positions; the fingerprint family
    * reads the compact [[winnowDocTable]] instead.
    *
    * posexplode_OUTER, deliberately: for a plain posexplode,
    * `InferFiltersFromGenerate` synthesizes a `size(wins) > 0`
    * predicate below the Generate, and predicate pushdown inlines the
    * whole array-HOF winnow build into it — re-evaluating the
    * normalization regex PER GRAM inside the predicate's transform
    * lambdas, O(n_chars²) per document (measured: a single sf0.001
    * task pegged a core for 14+ minutes). The rule skips outer
    * generates, and `wins` is never empty here (the `length(t) >= 11`
    * source filter guarantees >= 1 full window), so _outer is
    * value-identical and keeps the build evaluated once per doc.
    */
  private[queries] def winnowWindows(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import s.implicits._
    winnowDocBuild(s, d)
      .select($"doc_id", posexplode_outer($"wins").as(Seq("i", "fp")))
      .select($"doc_id", ($"i" + 4).as("p"), $"fp")
  }

  /** DuckDB mirror of [[winnowDocBuild]]: CTEs n → g → f; `f` holds
    * (doc_id, p, fp) with the p >= 4 full-window filter applied by
    * the consumer (winnow_fingerprint keeps it in its WHERE so its
    * committed oracle text stays byte-stable). The Spark side now
    * computes the same windows as array HOFs; values are identical
    * (same grams, same md5-hex→BIGINT hash, same 4-window minima).
    */
  private[queries] val duckWinnowCtes: String =
    s"""n AS (SELECT doc_id, substr(${LlmQueries.NORM}, 1, $WinnowMaxChars) AS t
       |           FROM documents
       |           WHERE length(substr(${LlmQueries.NORM}, 1, $WinnowMaxChars)) >= 11),
       |g AS (SELECT doc_id, p,
       |    ('0x' || substr(md5(substr(t, p, 8)), 1, 8))::BIGINT AS h
       |  FROM (SELECT doc_id, t, unnest(range(1, length(t) - 6)) AS p
       |        FROM n) i),
       |f AS (SELECT doc_id, p, min(h) OVER (PARTITION BY doc_id ORDER BY p
       |        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp FROM g)""".stripMargin

  /** Per-node out-neighbor bound for triangle_count's wedge stage —
    * the "next cap" the 100× sweep called for (BASELINE.md round-9):
    * a capped-bucket star representative accumulates out-degree ≈
    * bucket size (~9k at 100×), making the wedge stage Σdeg² in star
    * size. Keeping only each node's [[WedgeCap]] smallest-id
    * out-neighbors bounds wedges at WedgeCap² per node. 64 is ~5×
    * the max observed fixture degree (13 at sf0.1), so the cap is
    * DORMANT at every oracle scale — it only engages on degenerate
    * mega-star reps, where dropped wedges are star edges that close
    * no triangle unless the leaf pair independently shares an
    * uncapped bucket. Mirrored verbatim into the DuckDB oracle, so
    * both engines always count the same graph.
    */
  private[graft] val WedgeCap = 64

  /** Literal keyword lexicon for taxonomy_classify, mirrored into its
    * oracle. Terms are drawn from the fixtures' vocabulary so the
    * rule stage classifies real hits rather than defaulting every doc
    * to 'unknown'.
    */
  private[queries] val TaxonomyLexicon: Seq[(String, String)] = Seq(
    "joins" -> "join", "joins" -> "merge", "joins" -> "hash",
    "joins" -> "key",
    "scans" -> "scan", "scans" -> "filter", "scans" -> "table",
    "scans" -> "column",
    "streaming" -> "stream", "streaming" -> "batch",
    "streaming" -> "window", "streaming" -> "spark",
    "sorting" -> "sort", "sorting" -> "order", "sorting" -> "group",
    "sorting" -> "agg")

  /** Converged component table (doc_id, lbl) over the LSH candidate
    * graph — [[graft.operators.ConnectedComponents.minLabel]] applied
    * to the candidate pairs, memoized+persisted per (session, dir)
    * like the signature tables (one computation serves Verify, Bench,
    * and repeat callers; freed via LlmQueries.clearCaches).
    */
  private def clusterLabels(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    LlmQueries.memoized(s, d, "cluster_labels", persistIt = false) {
      val docs = Tables.documents(s, d).select(col("doc_id").as("id"))
      val pairs = LlmQueries.pairTable(s, d)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      // the memoized entry is minLabel's own persisted frame — the
      // rename happens OUTSIDE the cache so clearCaches' unpersist()
      // hits the frame that holds the blocks (unpersist on a child
      // projection would be a silent no-op)
      graft.operators.ConnectedComponents.minLabel(docs, pairs)
    }.select(col("id").as("doc_id"), col("component").as("lbl"))

  /** Uniform [0,1) from the first 8 md5 hex digits of "smp:<doc_id>" —
    * the seeded, engine-reproducible analog of rand(seed) (Spark's
    * rand is partition-dependent and unreproducible elsewhere).
    */
  private def hashUniform(idCol: org.apache.spark.sql.Column, seed: String = "smp") =
    conv(substring(md5(concat(lit(seed + ":"), idCol.cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0

  val defs: Map[String, QueryFn] = Map(
    // Connected components over the MinHash-LSH candidate pairs:
    // every doc resolves to the minimum doc_id of its near-dup
    // cluster (the canonical "keeper"). Iterative min-label
    // propagation; convergence checked with an aggregate per round.
    "dedup_clusters" -> ((s, d) => {
      import s.implicits._
      clusterLabels(s, d).select($"doc_id", $"lbl".as("cluster")).orderBy($"doc_id")
    }),

    // SemDeDup-style semantic dedup over EMBEDDINGS: connected
    // components of the cosine-similarity graph (label-blocked pairs
    // with cos > 0.8), each vector resolving to the min vec_id of its
    // semantic cluster — the embedding-space analog of dedup_clusters,
    // the step that collapses paraphrases exact/near-text dedup cannot
    // see. Memoized with persistIt=false: the entry IS minLabel's own
    // persisted frame (same contract as cluster_labels).
    "semdedup_clusters" -> ((s, d) => {
      import s.implicits._
      LlmQueries.memoized(s, d, "semdedup_labels", persistIt = false) {
        val vertices = Tables.embeddings(s, d).select($"vec_id".as("id"))
        val edges = LlmQueries.embNearPairs(s, d)
          .select($"vec_a".as("src"), $"vec_b".as("dst"))
        graft.operators.ConnectedComponents.minLabel(vertices, edges)
      }.select($"id".as("vec_id"), $"component".as("cluster"))
        .orderBy($"vec_id")
    }),

    // The dedup endgame: keep the HIGHEST-QUALITY document of each
    // near-dup cluster (not the arbitrary min-id keeper) — cluster
    // labels join to quality scores, one top-1 window per cluster.
    // Tie-break on doc_id keeps it deterministic.
    "dedup_keep_best" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"cluster").orderBy($"quality".desc, $"doc_id")
      clusterLabels(s, d)
        .select($"doc_id", $"lbl".as("cluster"))
        .join(Tables.documents(s, d)
          .select($"doc_id", TF.qualityScore($"text").as("quality")), Seq("doc_id"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"cluster", $"doc_id".as("kept_doc"), $"quality")
        .orderBy($"cluster")
    }),

    // Golden-record merge (wave 45): FIELD-LEVEL survivorship over
    // the near-dup clusters — where dedup_keep_best keeps one whole
    // document, the golden record composes the merged row a master-
    // data pipeline publishes: canonical id = min doc_id, length =
    // the cluster max, lang/source = the cluster MODE (count desc,
    // value asc tiebreak — deterministic). Only multi-member
    // clusters surface (singletons have nothing to merge). Rides the
    // memoized cluster labels; two bounded cluster-keyed aggregates
    // + two top-1 windows — no new corpus-scale stage.
    "golden_record" -> ((s, d) => {
      import s.implicits._
      val m = clusterLabels(s, d)
        .select($"doc_id", $"lbl".as("cluster"))
        .join(Tables.documents(s, d)
          .select($"doc_id", $"lang", $"source", $"n_chars"), Seq("doc_id"))
      val sizes = m.groupBy($"cluster")
        .agg(count(lit(1)).as("n_members"),
          min($"doc_id").as("canonical_id"),
          max($"n_chars").as("max_chars"))
        .where($"n_members" >= 2L)
      def modeOf(c: String, out: String) = {
        val w = Window.partitionBy($"cluster")
          .orderBy($"cnt".desc, col(c).asc_nulls_last)
        m.groupBy($"cluster", col(c)).agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(w))
          .where($"rk" === 1)
          .select($"cluster", col(c).as(out))
      }
      sizes
        .join(modeOf("lang", "lang_mode"), Seq("cluster"))
        .join(modeOf("source", "source_mode"), Seq("cluster"))
        .select($"cluster", $"n_members", $"canonical_id", $"max_chars",
          $"lang_mode", $"source_mode")
        .orderBy($"cluster")
    }),

    // BM25 top terms per document — the retrieval-grade upgrade of
    // tfidf_topk: term saturation (k1) and document-length
    // normalization (b) in the standard Okapi form, with the idf as
    // the same smoothed RATIONAL weight (exact cross-engine IEEE
    // arithmetic; ln() would differ in the last ulp and is monotone
    // anyway). All inputs are exact integers entering one fixed
    // sequence of double ops.
    "bm25_topk" -> ((s, d) => {
      import s.implicits._
      val k1 = 1.2
      val b = 0.75
      val terms = LlmQueries.termTable(s, d)
      val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val dl = terms.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
      val df = terms.select($"doc_id", $"term").distinct()
        .groupBy($"term").agg(count(lit(1)).as("df"))
      val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
        sum($"dl").cast("double").as("total_dl"))
      val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")
      val tfd = $"tf".cast("double")
      // 1.0 - b folds to the exact double 0.25, matching the oracle's
      // (1.0 - 0.75) computed in SQL
      val denom = tfd + lit(k1) * (lit(1.0 - b) + lit(b) *
        ($"dl".cast("double") / ($"total_dl" / $"n_docs")))
      val score = (tfd * (k1 + 1.0) / denom) *
        (($"n_docs" + 1.0) / ($"df".cast("double") + 1.0))
      tf.join(dl, Seq("doc_id")).join(df, Seq("term")).crossJoin(broadcast(stats))
        .select($"doc_id", $"term", $"tf", rnd(score, 6).as("score"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .orderBy($"doc_id", $"rk")
    }),

    // Dedup yield report: how many clusters of each size — the number
    // a curation run publishes ("N docs collapsed into M clusters").
    // Two hash aggregates over the memoized cluster table.
    "dedup_stats" -> ((s, d) => {
      import s.implicits._
      clusterLabels(s, d)
        .groupBy($"lbl").agg(count(lit(1)).as("cluster_size"))
        .groupBy($"cluster_size").agg(count(lit(1)).as("n_clusters"))
        .orderBy($"cluster_size")
    }),

    // Incremental dedup — the path a DAILY pipeline actually runs: an
    // incoming batch (doc_id % 10 == 0 stands in) screens against the
    // EXISTING corpus instead of recomputing full-corpus dedup. Exact
    // pass: fingerprint anti-join. Near pass: the batch's LSH band
    // keys semi-join the corpus band table (the persisted signature
    // store an incremental run reads instead of rebuilding). Output:
    // batch docs clean to admit.
    "dedup_incremental" -> ((s, d) => {
      import s.implicits._
      val fps = Tables.documents(s, d)
        .select($"doc_id", TF.fingerprint($"text").as("fp"))
      val exactSurvivors = fps.filter($"doc_id" % 10 === 0)
        .join(fps.filter($"doc_id" % 10 =!= 0).select($"fp"), Seq("fp"), "left_anti")
      val bands = LlmQueries.bandTable(s, d)
      val nearHits = bands.filter($"doc_id" % 10 === 0)
        .join(bands.filter($"doc_id" % 10 =!= 0).select($"band", $"key"),
          Seq("band", "key"), "left_semi")
        .select($"doc_id").distinct()
      exactSurvivors.select($"doc_id")
        .join(nearHits, Seq("doc_id"), "left_anti")
        .orderBy($"doc_id")
    }),

    // Candidate-graph diagnostics: near-dup degree distribution — how
    // many docs have k candidate partners. The curation run's health
    // metric (a fat tail here means a degenerate band key is inflating
    // Σ bucket² — the same hazard the band-skew spec guards). Reads the
    // memoized band table; two hash aggregates.
    "graph_degree_dist" -> ((s, d) => {
      import s.implicits._
      val cand = LlmQueries.pairTable(s, d)
      val degrees = cand.select($"doc_a".as("doc_id"))
        .union(cand.select($"doc_b".as("doc_id")))
        .groupBy($"doc_id").agg(count(lit(1)).as("degree"))
      degrees.groupBy($"degree").agg(count(lit(1)).as("n_docs"))
        .orderBy($"degree")
    }),

    // Triangle counting over the near-dup candidate graph — the
    // clustering-coefficient ingredient that distinguishes a tight
    // paraphrase CLIQUE from a hub-and-spoke boilerplate star (stars
    // have zero triangles; template families are triangle-dense).
    // Standard distributed edge-orientation scheme: edges already
    // arrive oriented (doc_a < doc_b from the LSH pair table), wedges
    // form at the low endpoint (two edges sharing doc_a, second
    // endpoints ordered), and one more keyed join closes each wedge.
    // Work is Σ deg² over the candidate graph — exactly the quantity
    // the band-bucket cap already bounds; no shuffle carries more
    // than (wedge, node) rows. Per-node triangle participation, not
    // one scalar, so the output stays hash-checkable row by row.
    // Measured scale shape (100× sweep, BASELINE.md round-9): the
    // cap's star edges give each capped-bucket REPRESENTATIVE degree
    // ≈ bucket size, so the wedge stage was quadratic in the max star
    // size even though edge count stays linear. The promised per-node
    // wedge bound now lands here: each node keeps only its [[WedgeCap]]
    // smallest-id out-neighbors before wedge formation (row_number per
    // u — window groups are bounded by the LSH bucket cap's linear
    // edge guarantee), so wedge work is ≤ WedgeCap² per node no matter
    // how large a star rep grows. The cap is dormant at fixture scales
    // (max degree 13 at sf0.1) and mirrored in the oracle's CTEs.
    "triangle_count" -> ((s, d) => {
      import s.implicits._
      val raw = LlmQueries.pairTable(s, d).select($"doc_a".as("u"), $"doc_b".as("v"))
      val e = raw
        .withColumn("rn", row_number()
          .over(Window.partitionBy($"u").orderBy($"v")))
        .filter($"rn" <= WedgeCap).drop("rn")
      val wedges = e.join(e.select($"u", $"v".as("w")), Seq("u"))
        .filter($"v" < $"w")
      val tri = wedges.join(e.select($"u".as("v"), $"v".as("w")), Seq("v", "w"))
      // `capped` surfaces the WedgeCap bound in the RESULT (ADVICE r9):
      // true = this node's out-adjacency was truncated, so its n_tri is
      // a lower bound, not an exact count. Dormant (all false) at every
      // oracle scale; at degenerate-mega-star scale the consumer sees
      // exactly which counts are estimates. Mirrored in the oracle.
      val deg = raw.groupBy($"u").agg(count(lit(1)).as("outdeg"))
      tri.select($"u".as("node"))
        .unionAll(tri.select($"v".as("node")))
        .unionAll(tri.select($"w".as("node")))
        .groupBy($"node").agg(count(lit(1)).as("n_tri"))
        .join(deg.select($"u".as("node"), $"outdeg"), Seq("node"), "left")
        .select($"node", $"n_tri",
          (coalesce($"outdeg", lit(0L)) > WedgeCap).as("capped"))
        .orderBy($"node")
    }),

    // Three-round BFS reach from the doc_id%100 seed set over the
    // symmetrized candidate graph: how much of the near-dup graph a
    // seed audit touches per hop (the contagion-radius telemetry
    // behind "if these seeds are contaminated, what else is").
    // Each round is one keyed join + one min aggregate — the
    // ConnectedComponents per-round shape at fixed depth; unreached
    // docs report dist -1 via the closing left join.
    "bfs_hops" -> ((s, d) => {
      import s.implicits._
      val cand = LlmQueries.pairTable(s, d)
      val edges = cand.select($"doc_a".as("u"), $"doc_b".as("v"))
        .unionAll(cand.select($"doc_b".as("u"), $"doc_a".as("v")))
      val docs = Tables.documents(s, d).select($"doc_id")
      var dist = docs.filter($"doc_id" % 100 === 0)
        .select($"doc_id", lit(0).as("dist"))
      for (_ <- 1 to 3) {
        val next = dist.join(edges, $"doc_id" === $"u")
          .select($"v".as("doc_id"), ($"dist" + 1).as("dist"))
        dist = dist.unionAll(next)
          .groupBy($"doc_id").agg(min($"dist").as("dist"))
      }
      docs.join(dist, Seq("doc_id"), "left")
        .select(coalesce($"dist", lit(-1)).as("dist"))
        .groupBy($"dist").agg(count(lit(1)).as("n_docs"))
        .orderBy($"dist")
    }),

    // Vocabulary growth curve (the Heaps'-law audit): how many NEW
    // terms each doc_id decile contributes. First-occurrence doc per
    // term is one min aggregate over the memoized term relation;
    // deciles come from DistributedNtile (no corpus-wide
    // single-partition sort); the cumulative sum runs on ≤ 10 rows
    // through BoundedWindow. Scaling-law telemetry for tokenizer and
    // dedup planning — a corpus whose curve flattens early is
    // duplicate-heavy.
    "vocab_growth" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"doc_id")
        .withColumn("g", lit(1))
      val dec = graft.operators.DistributedNtile
        .withNtile(docs, "g", Seq($"doc_id"), 10, "decile")
        .select($"doc_id", $"decile")
      val firsts = LlmQueries.termTable(s, d)
        .groupBy($"term").agg(min($"doc_id").as("doc_id"))
      val perDec = firsts.join(dec, Seq("doc_id"))
        .groupBy($"decile").agg(count(lit(1)).as("new_terms"))
      val w = graft.operators.BoundedWindow
        .orderBy("vocab_growth: 10 decile rows", 10L, $"decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perDec.withColumn("cum_terms", sum($"new_terms").over(w))
        .orderBy($"decile")
    }),

    // Zipf rank-frequency profile of the top-20 terms: rank, count,
    // and frequency relative to rank 1 — the transcendental-free
    // form of a Zipf-exponent fit (rel_freq ≈ rank^-s; the ratio
    // table IS the fit input). TakeOrdered top-20, rank window on
    // the 20 survivors, one broadcast of the rank-1 row.
    "zipf_profile" -> ((s, d) => {
      import s.implicits._
      val tf = LlmQueries.termTable(s, d)
        .groupBy($"term").agg(count(lit(1)).as("tf"))
      val top = tf.orderBy($"tf".desc, $"term").limit(20)
      val w = graft.operators.BoundedWindow
        .orderBy("zipf_profile: top-20 limit", 20L, $"tf".desc, $"term")
      val ranked = top
        .withColumn("rank", row_number().over(w).cast("long"))
      val t1 = ranked.filter($"rank" === 1L).select($"tf".as("tf1"))
      ranked.crossJoin(broadcast(t1))
        .select($"rank", $"term", $"tf",
          rnd($"tf".cast("double") / $"tf1".cast("double"), 6).as("rel_freq"))
        .orderBy($"rank")
    }),

    // Two unrolled k-core peeling rounds (k=2) over the near-dup
    // candidate graph: remove degree-<2 nodes, recompute, remove
    // again — the standard densest-region screen that separates
    // pendant/isolated near-dup pairs from template families. Each
    // round is one degree aggregate + two anti-joins (all keyed);
    // fixed round count keeps the oracle expressible as unrolled
    // CTEs (pagerank_lite's convention — a production peel iterates
    // with the ConnectedComponents checkpoint policy).
    "kcore_peel" -> ((s, d) => {
      import s.implicits._
      val e = LlmQueries.pairTable(s, d)
        .select($"doc_a".as("u"), $"doc_b".as("v"))
      val sym = e.unionAll(e.select($"v".as("u"), $"u".as("v")))
      val deg0 = sym.groupBy($"u").agg(count(lit(1)).as("deg0"))
      val kill1 = deg0.filter($"deg0" < 2).select($"u")
      val e1 = sym.join(kill1, Seq("u"), "left_anti")
        .join(kill1.select($"u".as("v")), Seq("v"), "left_anti")
      val deg1 = e1.groupBy($"u").agg(count(lit(1)).as("deg_after"))
      deg0.join(deg1, Seq("u"), "left")
        .select($"u".as("doc_id"), $"deg0",
          coalesce($"deg_after", lit(0L)).as("deg_after"),
          when($"deg0" < 2, 1)
            .when(coalesce($"deg_after", lit(0L)) < 2, 2)
            .otherwise(0).as("removed_round"))
        .orderBy($"doc_id")
    }),

    // Deterministic stratified Bernoulli sampling for training-data
    // mixes: per-language keep rates, seeded-hash uniform per doc —
    // reproducible across runs, engines, partitionings.
    "sample_stratified" -> ((s, d) => {
      import s.implicits._
      val rate = when($"lang" === "en", 0.3)
        .when($"lang" === "de", 0.6)
        .otherwise(1.0)
      Tables.documents(s, d)
        .select($"doc_id", $"lang", hashUniform($"doc_id").as("u"), rate.as("rate"))
        .filter($"u" < $"rate")
        .select($"doc_id", $"lang", $"u")
        .orderBy($"doc_id")
    }),

    // Benchmark decontamination: corpus docs sharing >= 3 distinct
    // 3-gram shingles with the benchmark set (docs with doc_id % 97 =
    // 0 stand in for an eval set). The benchmark shingle set is tiny
    // relative to the corpus -> broadcast equi-join on the shingle.
    "contamination_check" -> ((s, d) => {
      import s.implicits._
      val dsh = LlmQueries.distinctShingleTable(s, d)
      val benchSh = dsh.filter($"doc_id" % 97 === 0).select($"sh").distinct()
      dsh.filter($"doc_id" % 97 =!= 0)
        .join(benchSh, Seq("sh"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
        .filter($"n_shared" >= 3)
        .orderBy($"doc_id")
    }),

    // TF-IDF-style top terms per document. The inverse-document-
    // frequency weight is the smoothed RATIONAL form (N+1)/(df+1) —
    // rational so the score is exact IEEE arithmetic in any engine
    // (ln() is libm-dependent in its last ulp and would break
    // bit-exact oracles; ranking is unaffected since ln is monotone).
    // Term rows → two hash aggregates (tf, df) + a broadcast of the
    // (vocabulary-sized) df table + a per-doc top-k window: at 100 TB
    // the df table is the only global state and it aggregates
    // map-side first.
    "tfidf_topk" -> ((s, d) => {
      import s.implicits._
      val terms = LlmQueries.termTable(s, d)
      val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = terms.select($"doc_id", $"term").distinct()
        .groupBy($"term").agg(count(lit(1)).as("df"))
      val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")
      tf.join(df, Seq("term")).crossJoin(broadcast(nDocs))
        .select($"doc_id", $"term", $"tf",
          ($"tf".cast("double") * (($"n_docs" + 1).cast("double") / ($"df" + 1).cast("double")))
            .as("score"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .orderBy($"doc_id", $"rk")
    }),

    // Rocchio pseudo-relevance-feedback query expansion (wave 53,
    // round 12; Rocchio 1971, the PRF baseline every retrieval stack
    // ships): seed query → tf-idf top-R feedback docs → centroid of
    // their term vectors → expanded term weights α·q₀ + β·centroid/R
    // → top-E expansion terms. Seeds are data-derived but
    // deterministic (top-2 corpus terms by total tf, term tiebreak).
    // Numeric discipline: per-(doc,term) tf-idf uses tfidf_topk's
    // exact rational idf (N+1)/(df+1) and snaps to 8dp ONCE; every
    // downstream sum (doc scores over ≤2 seed terms, centroid over
    // ≤R docs) runs on DECIMAL(38,8) — order-free under any
    // partitioning; the closing weight recomputes from snapped
    // values in a fixed op order. Scale shape: tf/df hash aggregates
    // (map-side-combinable), both top-k cuts are orderBy+limit
    // (TakeOrdered — distributed, never a global window), the R-doc
    // and 2-seed relations broadcast back. No corpus-scale join
    // keyed on anything but (term | doc_id).
    "rocchio_expand" -> ((s, d) => {
      import s.implicits._
      val terms = LlmQueries.termTable(s, d)
      val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = terms.select($"doc_id", $"term").distinct()
        .groupBy($"term").agg(count(lit(1)).as("df"))
      val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val seeds = tf.groupBy($"term").agg(sum($"tf").as("stf"))
        .orderBy($"stf".desc, $"term").limit(RocchioSeeds).select($"term")
      val w = tf.join(df, Seq("term")).crossJoin(broadcast(nDocs))
        .select($"doc_id", $"term",
          rnd($"tf".cast("double") *
            (($"n_docs" + 1).cast("double") / ($"df" + 1).cast("double")), 8)
            .as("w"))
      val ds = w.join(broadcast(seeds), Seq("term"))
        .groupBy($"doc_id")
        .agg(sum($"w".cast("decimal(38,8)")).cast("double").as("sc"))
      val top = ds.orderBy($"sc".desc, $"doc_id").limit(RocchioR)
        .select($"doc_id")
      val rEff = top.agg(count(lit(1)).as("r"))
      val cent = w.join(broadcast(top), Seq("doc_id"))
        .groupBy($"term").agg(sum($"w".cast("decimal(38,8)")).as("cw"))
      cent.join(seeds.withColumn("is_seed", lit(true)), Seq("term"), "full_outer")
        .crossJoin(broadcast(rEff))
        .select($"term", coalesce($"is_seed", lit(false)).as("is_seed"),
          rnd(when(coalesce($"is_seed", lit(false)), 1.0).otherwise(0.0)
            + lit(0.75) * (coalesce($"cw", lit(0).cast("decimal(38,8)"))
              .cast("double") / $"r".cast("double")), 8).as("weight"))
        .orderBy($"weight".desc, $"term").limit(RocchioE)
    }),

    // Deterministic sequence packing: contiguous token-budget bins per
    // language in doc_id order (the order-free approximation of
    // first-fit packing — reproducible under any partitioning, unlike
    // greedy bin packing, which is inherently sequential). One window
    // pass; bins close when the running total crosses the budget.
    "pack_sequences" -> ((s, d) => {
      import s.implicits._
      val budget = 2048
      val w = Window.partitionBy($"lang").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select($"doc_id", $"lang", TF.bpeTokenCount($"text").as("tokens"))
        .withColumn("cum", sum($"tokens").over(w))
        .select($"doc_id", $"lang", $"tokens",
          floor(($"cum" - $"tokens") / budget).cast("long").as("bin"))
        .orderBy($"doc_id")
    }),

    // Quality gating by per-source percentile: keep the top half of
    // each source by quality score. percent_rank is (rank-1)/(n-1) —
    // exact small-integer division, identical across engines.
    "quality_gate" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"quality", $"doc_id")
      Tables.documents(s, d)
        .select($"doc_id", $"source", TF.qualityScore($"text").as("quality"))
        .withColumn("pr", percent_rank().over(w))
        .filter($"pr" >= 0.5)
        .orderBy($"doc_id")
    }),

    // The curation capstone: the full filter→dedup→select flow a
    // training-data run executes, composed from the engine's own
    // pieces — (1) per-source quality gate keeps the top half, (2)
    // survivors join the memoized near-dup cluster table, (3) one
    // keep-best window elects the highest-quality survivor per
    // cluster. Output: the admitted corpus with its token budget. At
    // scale this is two windows and one keyed join beyond the shared
    // cluster resolution — no operator here rescans text.
    "curate_corpus" -> ((s, d) => {
      import s.implicits._
      val wq = Window.partitionBy($"source").orderBy($"quality", $"doc_id")
      val gated = Tables.documents(s, d)
        .select($"doc_id", $"source", TF.qualityScore($"text").as("quality"),
          TF.nTokens($"text").cast("long").as("n_tokens"))
        .withColumn("pr", percent_rank().over(wq))
        .filter($"pr" >= 0.5)
      val wk = Window.partitionBy($"cluster").orderBy($"quality".desc, $"doc_id")
      gated
        .join(clusterLabels(s, d).select($"doc_id", $"lbl".as("cluster")), Seq("doc_id"))
        .withColumn("rk", row_number().over(wk))
        .filter($"rk" === 1)
        .select($"doc_id", $"cluster", $"source", $"quality", $"n_tokens")
        .orderBy($"doc_id")
    }),

    // Corpus mixture report — the table a pretraining run reads to
    // decide sampling weights: per-source doc/token counts, token
    // share, and the cumulative share in descending-token order (how
    // much of the corpus the top-k sources cover). One hash aggregate
    // over the corpus; the global window runs over S source rows
    // (bounded — sources are a catalog, not data), so the
    // single-partition window is fine at any corpus size.
    "source_mix" -> ((s, d) => {
      import s.implicits._
      val bySrc = Tables.documents(s, d)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(TF.nTokens($"text").cast("long")).as("tokens"))
      val tot = bySrc.agg(sum($"tokens").as("total"))
      val w = graft.operators.BoundedWindow
        .orderBy("source_mix: one row per source label", 10000L,
          $"tokens".desc, $"source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bySrc.crossJoin(broadcast(tot))
        .select($"source", $"n_docs", $"tokens",
          ($"tokens".cast("double") / $"total".cast("double")).as("share"),
          (sum($"tokens").over(w).cast("double") / $"total".cast("double"))
            .as("cum_share"))
        .orderBy($"tokens".desc, $"source")
    }),

    // Temperature-reweighted mixture sampling (α = 0.5): each source's
    // sampling weight is √tokens (the classic temperature flattening —
    // α = 1 reproduces natural proportions, α → 0 uniform), scaled so
    // the expected kept-token budget is τ·total. Per-doc keep decision
    // is the seeded md5 uniform vs the source's rate — one broadcast
    // join of S rates against the corpus, single scan, no shuffle of
    // document rows. √ is IEEE-correctly-rounded in both engines and
    // the weight sum is 6dp-snapped decimal (order-free), so the rate
    // is bit-identical and the op keeps a full oracle.
    "mixture_sample" -> ((s, d) => {
      import s.implicits._
      val tau = 0.25
      val docs = Tables.documents(s, d)
        .select($"doc_id", $"source", TF.nTokens($"text").cast("long").as("n_tok"))
      val bySrc = docs.groupBy($"source").agg(sum($"n_tok").as("src_tok"))
        .withColumn("w6", rnd(sqrt($"src_tok".cast("double")), 6))
      val tot = bySrc.agg(sum($"src_tok").as("total_tok"),
        sum($"w6".cast("decimal(28,6)")).cast("double").as("w_sum"))
      // a zero-token source would make the rate 0/0 = NaN (and Spark's
      // least() treats NaN as largest → keep-all); pin it to 0.0 —
      // sampling an empty stratum yields nothing in every engine
      val rates = bySrc.crossJoin(broadcast(tot))
        .select($"source",
          when($"src_tok" === 0, lit(0.0)).otherwise(
            least(lit(1.0),
              lit(tau) * $"total_tok".cast("double") * $"w6" / $"w_sum"
                / $"src_tok".cast("double"))).as("rate"))
      docs.join(broadcast(rates), Seq("source"))
        .withColumn("u", hashUniform($"doc_id"))
        .filter($"u" < $"rate")
        .select($"doc_id", $"source", $"n_tok", $"u", $"rate")
        .orderBy($"doc_id")
    }),

    // PageRank (5 fixed power iterations, damping 0.85) over the
    // shared near-dup candidate graph — the canonical iterative graph
    // op beyond connected components: per iteration ONE keyed join
    // (ranks → symmetrized edges, contribution r/deg) and one
    // aggregate, the same per-round shape as ConnectedComponents, so
    // it scales the same way (no adjacency on the driver, no
    // cross join). Determinism across engines: contributions snap to
    // a 12dp grid and sum as DECIMAL (order-free); the damping update
    // is a fixed double op order; output snaps to 8dp. Fixed
    // iteration count keeps the oracle expressible as unrolled CTEs.
    //
    // Lineage policy (shared with ConnectedComponents): every 2nd
    // iteration truncates the rank frame with a LAZY
    // localCheckpoint(eager = false) — the logical plan collapses to
    // a LogicalRDD immediately (plan depth stays bounded at ~2
    // iterations however many rounds run), while materialization
    // still rides the caller's own action, so the query stays a lazy
    // DataFrame with no side-effect jobs. Unlike CC, each pagerank
    // round references the previous rank exactly once, so growth is
    // linear, not exponential — truncation here buys bounded
    // re-planning and a bounded recompute horizon on executor loss,
    // at the cost of ceil(iters/2) generations of (doc_id, r) blocks
    // reclaimed by the ContextCleaner once unreferenced.
    "pagerank_lite" -> ((s, d) => {
      import s.implicits._
      val iters = 5
      val docs = Tables.documents(s, d).select($"doc_id")
      // max(1, ·): the 1/n teleport constants on an EMPTY corpus are
      // multiplied into zero rows anyway, but ANSI mode rejects the
      // literal division before that can happen
      val n = math.max(1L,
        LlmQueries.memoizedCount(s, d, "documents_count")(docs.count()))
      // sym/deg get referenced by EVERY unrolled iteration: without
      // collapsing them, each iteration's plan re-inlines the whole
      // candidate-pair subtree, and Catalyst re-codegens it per
      // iteration — measured 68 codegen units / 10 s JIT / 6.5 s GC
      // for ~8 s of actual data work at sf0.1 (round 14). The same
      // LAZY localCheckpoint as the rank frame collapses each to a
      // LogicalRDD immediately (no side-effect job; materialization
      // rides the caller's action), so per-iteration plans stay small
      // and codegen/JIT cost is O(1) in the iteration count.
      val e = LlmQueries.pairTable(s, d)
        .select($"doc_a".as("src"), $"doc_b".as("dst"))
      val sym = e.union(e.select($"dst".as("src"), $"src".as("dst")))
        .localCheckpoint(eager = false)
      val deg = sym.groupBy($"src").agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = false)
      var r = docs.select($"doc_id", rnd(lit(1.0) / lit(n.toDouble), 12).as("r"))
      for (it <- 1 to iters) {
        val contrib = r.join(sym, $"doc_id" === $"src")
          .join(deg, Seq("src"))
          .select($"dst",
            rnd($"r" / $"deg".cast("double"), 12).cast("decimal(28,12)").as("c"))
          .groupBy($"dst").agg(sum($"c").cast("double").as("inflow"))
        r = docs.join(contrib, $"doc_id" === $"dst", "left")
          .select($"doc_id",
            rnd(lit(0.15) / lit(n.toDouble)
              + lit(0.85) * coalesce($"inflow", lit(0.0)), 12).as("r"))
        if (it % 2 == 0) r = r.localCheckpoint(eager = false)
      }
      r.select($"doc_id", rnd($"r", 8).as("rank"))
        .orderBy($"doc_id")
    }),

    // The corpus datasheet — the per-language summary a dataset card
    // publishes: volume (docs, tokens, token share), quality (exact
    // mean and median of the 4dp quality score), document shape (mean
    // tokens/doc), and the gopher-rule pass rate. One scan computes
    // every per-doc column; one L-group aggregate + a one-row
    // broadcast total. All means divide exact decimal sums; the
    // median is the exact interpolated percentile.
    "dataset_card" -> ((s, d) => {
      import s.implicits._
      val perDoc = Tables.documents(s, d)
        .select($"lang", TF.nTokens($"text").cast("long").as("n_tok"),
          TF.qualityScore($"text").as("q"),
          // when/otherwise, not a bare cast: a NULL text must count as
          // a gopher FAIL (the oracle's CASE ELSE 0), not null out the
          // group's pass-rate sum
          when(LlmQueries.gopherPass($"text"), 1L).otherwise(0L).as("pass"))
      val tot = perDoc.agg(sum($"n_tok").as("total_tok"))
      perDoc.groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").as("tokens"),
          (sum($"n_tok").cast("double") / count(lit(1))).as("mean_doc_tokens"),
          (sum($"q".cast("decimal(18,4)")).cast("double") / count(lit(1)))
            .as("mean_quality"),
          rnd(expr("percentile(q, 0.5)"), 4).as("median_quality"),
          (sum($"pass").cast("double") / count(lit(1))).as("gopher_pass_rate"))
        .crossJoin(broadcast(tot))
        .withColumn("token_share",
          $"tokens".cast("double") / $"total_tok".cast("double"))
        .drop("total_tok")
        .orderBy($"lang".asc_nulls_last)
    }),

    // Exact heavy hitters WITHOUT a full-vocabulary shuffle — the
    // two-pass Misra–Gries pattern: pass 1 builds a k=400 MG summary
    // per partition (pure per-partition imperative sketch — the
    // documented mapPartitions use case) whose union is a GUARANTEED
    // superset of every term with global frequency > N/400 (pigeonhole
    // over partition counts); pass 2 exact-counts only those
    // candidates (broadcast semi-join) and keeps terms above the
    // N/200 report threshold. The output is EXACT — the sketch is an
    // invisible optimization — so the op keeps a plain HAVING oracle.
    // At 100 TB this replaces a full term groupBy (vocabulary-sized
    // shuffle) with a bounded candidate set per partition; the
    // threshold compare is integer (cnt·200 > N), no division.
    "heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val K = 400
      val terms = LlmQueries.termTable(s, d)
      val n = LlmQueries.memoizedCount(s, d, "term_rows_count")(terms.count())
      val cands = terms.select($"term").as[String].mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { t =>
          if (m.contains(t) || m.size < K) m.update(t, m.getOrElse(t, 0L) + 1L)
          else {
            // Misra–Gries decrement step: all counters down one,
            // zeros evicted (the arriving term is absorbed by it)
            val dead = List.newBuilder[String]
            m.foreach { case (k0, v) =>
              if (v == 1L) dead += k0 else m.update(k0, v - 1L)
            }
            dead.result().foreach(m.remove)
          }
        }
        m.keysIterator
      }.distinct().toDF("term")
      terms.join(broadcast(cands), Seq("term"), "left_semi")
        .groupBy($"term").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" * 200 > n)
        .select($"term", $"cnt",
          ($"cnt".cast("double") / lit(n).cast("double")).as("share"))
        .orderBy($"cnt".desc, $"term")
    }),

    // Count-min-sketch heavy hitters (wave 35): the SKETCH-based
    // sibling of heavy_hitters — at 100 TB the exact Misra–Gries
    // pass still exact-counts its candidates; a CMS answers "how
    // often (approximately) does ANY term occur" from D×W = 4×256
    // mergeable integer counters, constant state no matter the
    // corpus (the streaming/distributed-merge property: counter
    // grids from different shards ADD). Hashes are seeded md5 →
    // BIGINT (engine-reproducible), so the sketch itself is under
    // value oracle, not just its contract. Counters build from the
    // VOCABULARY-scale term-count relation, not the token stream —
    // summing per-term counts into buckets is arithmetically the
    // token-level sketch at a fraction of the rows (term_rows is the
    // one corpus-scale input, shared/memoized). The readout checks
    // the CMS guarantee where it matters: est ≥ exact on the exact
    // top-20, with the overcount surfaced per term.
    "cms_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      def bucket(r: Column, term: Column): Column =
        conv(substring(md5(concat(r.cast("string"), lit(":"), term)),
          1, 8), 16, 10).cast("long") % CmsWidth
      val depths = explode(array((0 until CmsDepth).map(lit(_)): _*)).as("r")
      val tc = LlmQueries.termTable(s, d)
        .groupBy($"term").agg(count(lit(1)).as("cnt"))
      val counters = tc.select($"term", $"cnt", depths)
        .withColumn("bucket", bucket($"r", $"term"))
        .groupBy($"r", $"bucket").agg(sum($"cnt").as("c"))
      val top = tc.orderBy($"cnt".desc, $"term").limit(CmsTopK)
      top.select($"term", $"cnt", depths)
        .withColumn("bucket", bucket($"r", $"term"))
        .join(counters, Seq("r", "bucket"))
        .groupBy($"term", $"cnt").agg(min($"c").as("cms_est"))
        .select($"term", $"cnt".as("exact_cnt"), $"cms_est",
          ($"cms_est" - $"cnt").as("overcount"))
        .orderBy($"exact_cnt".desc, $"term")
    }),

    // Deterministic shard planning — the "write N balanced output
    // shards" step before a training run: each doc lands in one of 16
    // shards via the seeded md5 uniform (engine-reproducible, stable
    // under re-partitioning and re-runs), and the report is per-shard
    // docs/tokens plus the balance ratio vs the ideal tokens/S. One
    // scan, one S-group aggregate; the balance check is what a
    // pipeline alerts on before committing a shard layout. The shard
    // uniform uses its OWN seed prefix ("shard:"), not the sampling
    // ops' "smp:" — with a shared seed, every doc kept by
    // mixture_sample (u < rate ≈ 0.25) would land in shards 0-3 and
    // the balance guarantee would collapse exactly when the two
    // stages compose into one pipeline.
    "shard_plan" -> ((s, d) => {
      import s.implicits._
      val S = ShardCount
      val docs = Tables.documents(s, d)
        .select($"doc_id", TF.nTokens($"text").cast("long").as("n_tok"),
          floor(hashUniform($"doc_id", "shard") * S).cast("int").as("shard"))
      val tot = docs.agg(sum($"n_tok").as("total_tok"))
      docs.groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("tokens"))
        .crossJoin(broadcast(tot))
        .select($"shard", $"n_docs", $"tokens",
          ($"tokens".cast("double") / ($"total_tok".cast("double") / lit(S.toDouble)))
            .as("balance"))
        .orderBy($"shard")
    }),

    // Per-document lexical-diversity profile: type-token ratio and the
    // Simpson concentration index Σcᵢ²/n² — the transcendental-free
    // repetition signal (a doc that repeats one phrase concentrates
    // mass; Simpson → 1). Polynomial in integer counts + one IEEE
    // division per output, so it is bit-identical across engines with
    // DSIR-style data selection (Data Selection via Importance
    // Resampling, Xie et al. 2023 — public): documents scored by how
    // target-like their hashed-bigram feature distribution is. Bigrams
    // hash into K=1024 buckets (md5-hex, the engine's cross-engine
    // hash); per-bucket Laplace-smoothed probabilities are estimated
    // on the target slice (lang='en' — in production a held-out
    // high-quality corpus) and on the full raw corpus, and each doc's
    // weight is the mean smoothed probability RATIO over its features.
    // The paper takes log-importance weights; the ratio mean is the
    // oracle-deterministic surrogate (ln differs between engines in
    // the last ulp), identical in structure: weight > 1 ⇔ the doc's
    // features are more probable under the target model.
    //
    // 100 TB shape: feature extraction is one codegen'd scan-explode;
    // BOTH count aggregates land on K=1024 buckets (bounded state,
    // map-side partial agg does nearly all the work); the ratio table
    // is ≤ K rows and BROADCASTS to the scoring join, so the only
    // full-size shuffle is the final per-doc aggregate. Nothing about
    // the plan grows with corpus size except the scans.
    "dsir_select" -> ((s, d) => {
      import s.implicits._
      val K = 1024
      val toks = Tables.documents(s, d)
        .select($"doc_id", $"lang", TF.tokens($"text").as("w"))
        .filter(size($"w") >= 2)
      val feats = toks
        .select($"doc_id", $"lang",
          explode(sequence(lit(1), size($"w") - 1)).as("i"), $"w")
        .select($"doc_id", $"lang",
          (conv(substring(md5(concat_ws(" ",
            element_at($"w", $"i"), element_at($"w", $"i" + 1))), 1, 8), 16, 10)
            .cast("long") % K).as("b"))
      // ONE stats pass: raw and target bucket counts ride the same
      // aggregate (conditional sum ≡ the filtered count, same
      // integers), and the corpus totals are sums over the K-row
      // stats table — so the whole query reads the corpus exactly
      // twice (stats + scoring) instead of four times
      val stats = feats.groupBy($"b").agg(
        count(lit(1)).as("cr"),
        sum(when($"lang" === "en", 1L).otherwise(0L)).as("ct"))
      // corpus totals as window sums OVER the K-row stats table (an
      // aggregate-of-stats would re-execute the stats lineage — a
      // third corpus scan); the unpartitioned window moves 1024 rows,
      // not the corpus
      val all = graft.operators.BoundedWindow
        .global("dsir_select: K=1024 hash-bucket stats", 1024L)
      // every op here is a fixed-order IEEE sequence over exact
      // integers (two divisions, one division of the quotients), so
      // the pre-round doubles are bit-identical across engines
      val ratios = stats
        .withColumn("n_raw", sum($"cr").over(all))
        .withColumn("n_tgt", sum($"ct").over(all))
        .select($"b", rnd(
          (($"ct" + 1).cast("double") / ($"n_tgt" + K).cast("double")) /
            (($"cr" + 1).cast("double") / ($"n_raw" + K).cast("double")), 6).as("r"))
      feats.join(broadcast(ratios), Seq("b"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_feats"),
          (sum($"r".cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("w"))
        .withColumn("selected", $"w" > 1.0)
        .orderBy($"doc_id")
    }),

    // CCNet-style perplexity bucketing (Wenzek et al. 2020 — public):
    // per-language head/middle/tail terciles by language-model score,
    // the partition CCNet uses to keep head, inspect middle, drop
    // tail. The LM is the corpus's own bigram model (lm_score's exact
    // pipeline — in production a pretrained external LM); higher
    // mean bigram probability = "lower perplexity" = head.
    //
    // 100 TB shape: identical to lm_score (bounded LM broadcast, one
    // per-doc aggregate) plus the ranking CCNet fundamentally
    // requires — computed skew-free: DistributedNtile range-
    // partitions (lang, mean_p desc, doc_id) so a dominant language
    // spans many partitions, then derives the exact NTILE(3)
    // assignment from local ranks + broadcast per-partition offsets.
    // No task ever sorts more than one range partition, whatever the
    // language mix (the oracle's plain ntile stays value-identical).
    "ccnet_buckets" -> ((s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select($"doc_id", $"lang", TF.tokens($"text").as("w"))
        .filter(size($"w") >= 2)
      val pairs = toks
        .select($"doc_id", $"lang",
          explode(sequence(lit(1), size($"w") - 1)).as("i"), $"w")
        .select($"doc_id", $"lang",
          element_at($"w", $"i").as("w1"), element_at($"w", $"i" + 1).as("w2"))
      val c12 = pairs.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
      // window-sum c1 over the aggregated bigram types (lm_score's
      // one-scan formulation), never a self-join re-planning the scan
      val lm = c12
        .withColumn("c1", sum($"c12").over(Window.partitionBy($"w1")))
        .select($"w1", $"w2", ($"c12".cast("double") / $"c1".cast("double")).as("p"))
      val scored = pairs.join(broadcast(lm), Seq("w1", "w2"))
        .groupBy($"doc_id", $"lang")
        .agg((sum(rnd($"p", 6).cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("mean_p"))
      graft.operators.DistributedNtile
        .withNtile(scored, "lang", Seq($"mean_p".desc, $"doc_id"), 3, "t")
        .select($"doc_id", $"lang", $"mean_p",
          when($"t" === 1, "head").when($"t" === 2, "middle")
            .otherwise("tail").as("bucket"))
        .orderBy($"doc_id")
    }),

    // Stupid-backoff bigram scoring (Brants et al. 2007, "Large
    // Language Models in Machine Translation" — public): the LM
    // trains on HALF the corpus (even doc_ids) and scores ALL docs,
    // so unseen bigrams actually occur and the backoff path is
    // exercised: s(w2|w1) = c12/c1 when the training LM saw the
    // bigram, else 0.4 · Laplace unigram (c2+1)/(N+V). This is the
    // held-out-perplexity shape CCNet/Gopher filtering actually uses
    // (lm_score trains and scores on the same corpus, so its join
    // always hits). Plan: both LM relations are |type|-bounded and
    // broadcast; the scalar (N, V) row cross-joins; one per-doc
    // aggregate — same 100 TB shape as lm_score with one extra
    // broadcast probe.
    "lm_backoff_score" -> ((s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select($"doc_id", TF.tokens($"text").as("w"))
        .filter(size($"w") >= 2)
      val pairsAll = toks
        .select($"doc_id", explode(sequence(lit(1), size($"w") - 1)).as("i"), $"w")
        .select($"doc_id",
          element_at($"w", $"i").as("w1"), element_at($"w", $"i" + 1).as("w2"))
      val trainTerms = Tables.documents(s, d)
        .filter($"doc_id" % 2 === 0)
        .select($"doc_id", explode(TF.tokens($"text")).as("t"))
        .filter($"t" =!= "")
      val uni = trainTerms.groupBy($"t").agg(count(lit(1)).as("c2"))
      val totals = uni.agg(sum($"c2").as("n_train"),
        count(lit(1)).as("v_train"))
      val pairsTrain = pairsAll.filter($"doc_id" % 2 === 0)
      val c12 = pairsTrain.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
      val lm = c12
        .withColumn("c1", sum($"c12").over(Window.partitionBy($"w1")))
        .select($"w1", $"w2",
          ($"c12".cast("double") / $"c1".cast("double")).as("p_seen"))
      val scored = pairsAll
        .join(broadcast(lm), Seq("w1", "w2"), "left")
        .join(broadcast(uni.select($"t".as("w2"), $"c2")), Seq("w2"), "left")
        .crossJoin(broadcast(totals))
        .select($"doc_id", $"p_seen",
          coalesce($"p_seen",
            lit(0.4) * ((coalesce($"c2", lit(0L)) + lit(1L)).cast("double") /
              ($"n_train" + $"v_train").cast("double"))).as("sc"))
      scored.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when($"p_seen".isNull, 1L).otherwise(0L)).as("n_backoff"),
          (sum(rnd($"sc", 6).cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("mean_score"))
        .orderBy($"doc_id")
    }),

    // Keyword-lexicon domain classification — the taxonomy-labeling
    // pass a data-mixing pipeline runs to budget domains (the
    // rule-based first stage before any learned classifier). The
    // lexicon is a literal 16-term / 4-topic table mirrored into the
    // oracle; scoring is one broadcast join over the exploded terms,
    // one (doc, topic) count, and a doc-partitioned argmax window
    // with a deterministic tiebreak (hits desc, topic asc). Docs
    // hitting nothing classify as 'unknown' via a left anti-ish
    // left join. 100 TB: lexicon broadcasts, everything else keys on
    // doc_id.
    "taxonomy_classify" -> ((s, d) => {
      import s.implicits._
      val lex = broadcast(TaxonomyLexicon.toDF("topic", "lex_term"))
      val hits = LlmQueries.termTable(s, d)
        .join(lex, $"term" === $"lex_term")
        .groupBy($"doc_id", $"topic").agg(count(lit(1)).as("hits"))
      val best = hits
        .withColumn("rk", row_number().over(
          Window.partitionBy($"doc_id").orderBy($"hits".desc, $"topic")))
        .filter($"rk" === 1)
        .select($"doc_id", $"topic", $"hits")
      Tables.documents(s, d).select($"doc_id")
        .join(best, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"topic", lit("unknown")).as("topic"),
          coalesce($"hits", lit(0L)).as("hits"))
        .orderBy($"doc_id")
    }),

    // Power-of-2 token-length histogram — the length curve every
    // dataset card plots. Exact integer bucketing without
    // transcendentals: bucket = floor(log2(n)) + 1 computed as
    // length(bin(n)) (both engines render exact binary strings), so
    // the histogram is hash-exact. One scan, one 20-ish-row
    // aggregate.
    "length_histogram" -> ((s, d) => {
      import s.implicits._
      val n = Tables.documents(s, d)
        .select($"doc_id", TF.nTokens($"text").cast("long").as("n_tok"))
        .filter($"n_tok" > 0)
      n.withColumn("bucket", length(bin($"n_tok")).cast("long"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
          min($"n_tok").as("min_tok"), max($"n_tok").as("max_tok"),
          sum($"n_tok").as("total_tok"))
        .orderBy($"bucket")
    }),

    // Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    // SIGMOD 2003 — public): char 8-gram hashes over normalized text,
    // then the minimum hash of each sliding 4-window; the distinct
    // window minima are the doc's fingerprint set (guaranteed to
    // catch any match of length >= k + w - 1 = 11 chars). Since r10
    // the whole construction is per-doc array HOFs on the memoized
    // [[winnowDocTable]] — every per-doc statistic here is array
    // arithmetic on the cached sketch, with NO explode, NO doc-keyed
    // window shuffle, and no second corpus character pass (the r9
    // VERDICT's top profile item). The md5-hex → long hash is the
    // engine's standard cross-engine hash (dsir_select's bucket
    // idiom), so the oracle reproduces fingerprints exactly.
    // At 100 TB: a pure map over the documents scan plus one ORDER BY.
    "winnow_fingerprint" -> ((s, d) => {
      import s.implicits._
      winnowDocTable(s, d)
        .select($"doc_id", $"n_windows",
          size($"fps").cast("long").as("n_fp"),
          rnd(size($"fps").cast("double") / $"n_windows".cast("double"), 6)
            .as("density"),
          array_min($"fps").as("fp_min"), array_max($"fps").as("fp_max"))
        .orderBy($"doc_id")
    }),

    // SUBSTRING-LEVEL duplicate REMOVAL (keep-first, cut-later — the
    // output an exact-substring dedup pipeline actually writes, Lee
    // et al. 2022 "Deduplicating Training Data Makes Language Models
    // Better"): any winnowing window whose fingerprint FIRST appeared
    // in an earlier document marks chars [p-3, p+7] of this doc's
    // normalized text as duplicated; per doc the marked intervals
    // merge by sorted-interval union (adjacent intervals coalesce)
    // and the merged spans are cut out of the text. The guarantee is
    // winnowing's: every 11-char sub-run of a duplicated run shares
    // its window with the first occurrence, so the WHOLE duplicated
    // run is always cut; a boundary-straddling window whose min gram
    // lies inside the run can additionally match, so the cut may
    // overreach each run edge by at most w - 1 = 3 chars
    // (spec-pinned bound).
    // Plan shape: ONE fp -> min(doc_id) aggregate then a keyed join
    // back onto the position-preserving window rows — NO document
    // pair join anywhere (unlike winnow_matches there is no pair
    // report to bound, so no FpDocCap: boilerplate spans are exactly
    // what a cut operator must remove). The per-doc interval union
    // exploits the equal window width: with every interval
    // [p-3, p+7], two sorted windows merge iff their position gap is
    // <= 11, so islands fall out of LINEAR array HOFs over the sorted
    // position array (an array-accumulator fold here would copy the
    // accumulator per element — O(n²) per doc, measured minutes at
    // sf0.01); text reconstruction joins the between-island segments
    // with ONE array_join. Row width ∝ duplicated windows — the
    // winnow sketch's bound. Three keyed shuffles total (fp agg, fp
    // join, doc agg), all scan-proportional at 100 TB.
    "substring_dedup_cut" -> ((s, d) => {
      import s.implicits._
      val wins = winnowWindows(s, d)
      val firstDoc = winnowFps(s, d)
        .groupBy($"fp").agg(min($"doc_id").as("first_doc"))
      val dup = wins.join(firstDoc, Seq("fp"))
        .filter($"doc_id" > $"first_doc")
      // islands over sorted positions: a window starts an island when
      // no predecessor sits within 11 positions; `get` (0-based,
      // null-safe out of bounds) keeps the boundary comparisons total
      val ivs = dup.groupBy($"doc_id")
        .agg(sort_array(collect_list($"p")).as("ps"))
        .withColumn("idx", sequence(lit(0), size($"ps") - 1))
        .withColumn("starts", filter($"idx", i =>
          i === 0 || get($"ps", i) - get($"ps", i - 1) > 11))
        .withColumn("ends", filter($"idx", i =>
          i === size($"ps") - 1 || get($"ps", i + 1) - get($"ps", i) > 11))
        .select($"doc_id", zip_with($"starts", $"ends", (si, ei) =>
          struct((get($"ps", si) - 3).as("s"), (get($"ps", ei) + 7).as("e")))
          .as("ivs"))
      Tables.documents(s, d)
        .select($"doc_id", TF.normText($"text").as("t"))
        .join(ivs, Seq("doc_id"), "left")
        .select($"doc_id", $"t", $"ivs",
          coalesce(size($"ivs"), lit(0)).cast("long").as("n_spans"),
          coalesce(aggregate($"ivs", lit(0L), (a, iv) =>
            a + (iv.getField("e") - iv.getField("s") + 1)), lit(0L))
            .as("cut_chars"))
        .select($"doc_id", $"n_spans", $"cut_chars",
          when($"ivs".isNull, $"t").otherwise(concat(
            array_join(transform(sequence(lit(0), size($"ivs") - 1), j => {
              val segStart = when(j === 0, lit(1))
                .otherwise(get($"ivs", j - 1).getField("e") + 1)
              $"t".substr(segStart, get($"ivs", j).getField("s") - segStart)
            }), ""),
            $"t".substr(element_at($"ivs", -1).getField("e") + 1, length($"t"))))
            .as("text_dedup"))
        .orderBy($"doc_id")
    }),

    // Symmetric int8 quantization audit over the embedding table —
    // the compression step an ANN/vector-store deployment applies
    // before indexing (scale = max|x|/127, q = clamp(round(x/scale)),
    // like FAISS SQ8). Everything is array HOFs inside one codegen'd
    // projection — no explode, no shuffle before the final ORDER BY —
    // so at 100 TB it is a pure map over the vector scan. Per-dim
    // squared reconstruction errors snap to a 12dp grid and sum as
    // DECIMAL through an in-order fold, so the MSE is bit-identical
    // across engines; n_zero counts quantized-to-zero dims (the
    // sparsity a PQ/SQ codec actually exploits). Zero vectors keep
    // scale 0 and quantize to all-zeros (guarded division).
    "embedding_quantize" -> ((s, d) => {
      import s.implicits._
      // NULL vectors are unquantizable — skip them, like the oracle's
      // unnest (which emits no dim rows for a NULL list)
      val e = Tables.embeddings(s, d)
        .filter($"embedding".isNotNull)
        .select($"vec_id",
          transform($"embedding", v => v.cast("double")).as("x"))
        .withColumn("scale",
          array_max(transform($"x", v => abs(v))) / lit(127.0))
        .withColumn("q", transform($"x", v =>
          when($"scale" === 0.0, lit(0.0))
            .otherwise(greatest(lit(-127.0),
              least(lit(127.0), floor(v / $"scale" + lit(0.5)).cast("double"))))))
        .withColumn("sqs", zip_with($"x", $"q",
          (v, qv) => rnd((v - qv * $"scale") * (v - qv * $"scale"), 12)
            .cast("decimal(28,12)")))
      e.select($"vec_id",
        rnd($"scale", 8).as("scale"),
        size(filter($"q", qv => qv === 0.0)).cast("long").as("n_zero"),
        rnd(
          aggregate($"sqs", lit(0).cast("decimal(28,12)"),
            (a, b) => (a + b).cast("decimal(28,12)")).cast("double") /
            size($"x").cast("double"), 10).as("mse"))
        .orderBy($"vec_id")
    }),

    // no rounding. Two hash aggregates over the shared term relation;
    // at 100 TB this is the same shape as the tf stage of tfidf.
    "token_diversity" -> ((s, d) => {
      import s.implicits._
      val counts = LlmQueries.termTable(s, d)
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("c"))
      counts.groupBy($"doc_id")
        .agg(sum($"c").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum($"c" * $"c").as("sum_c2"))
        .select($"doc_id", $"n_tokens", $"n_types",
          ($"n_types".cast("double") / $"n_tokens".cast("double")).as("ttr"),
          ($"sum_c2".cast("double") / ($"n_tokens" * $"n_tokens").cast("double"))
            .as("simpson"))
        .orderBy($"doc_id")
    }),

    // Template-cluster detection (wave 33): documents that differ only
    // in their NUMBERS collapse to one md5 "template" key after a
    // digit-run mask over the normalized text — the CCNet-style
    // machine-generated-page signal exact_dedup misses (each page is
    // unique, the skeleton is not). Pure scan projection + one
    // map-side-combinable hash aggregate: at 100 TB the shuffle
    // carries one pre-aggregated row per template key, never text.
    // NULL text yields a NULL template key in both engines, so dirty
    // rows surface as one honest NULL cluster instead of vanishing.
    // Emits the FULL template profile (singletons included) rather
    // than filtering to n_docs > 1: whether any cluster exists is
    // fixture-shape-dependent (none below sf0.1), and a result that
    // can be empty at the oracle scale makes the hash check vacuous —
    // the good_turing rule (DESIGN.md, waves 30-32). Consumers read
    // clusters as the n_docs > 1 prefix of the ordering.
    "template_dedup" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          md5(regexp_replace(TF.normText($"text"), "[0-9]+", "0"))
            .as("template"))
        .groupBy($"template")
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("rep_doc"))
        .orderBy($"n_docs".desc, $"template".asc_nulls_last)
    }),

    // Tokenizer fertility by language (wave 33): subword-per-word
    // ratio of the BPE-ish pre-tokenizer vs whitespace words — the
    // standard tokenizer-evaluation statistic ("how many pieces does
    // a word shatter into in each language"), the aggregate readout
    // the per-doc token_count table stops short of. One scan, one
    // |langs|-row aggregate; the ratio divides two exact integer sums
    // once, so no double-accumulation order exists.
    "tokenizer_fertility" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"lang", TF.nTokens($"text").cast("long").as("ws"),
          TF.bpeTokenCount($"text").cast("long").as("bpe"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"ws").as("ws_tokens"), sum($"bpe").as("bpe_tokens"))
        .select($"lang", $"n_docs", $"ws_tokens", $"bpe_tokens",
          when(coalesce($"ws_tokens", lit(0L)) === 0L,
            lit(null).cast("double"))
            .otherwise(rnd($"bpe_tokens".cast("double") /
              $"ws_tokens".cast("double"), 6)).as("fertility"))
        .orderBy($"lang".asc_nulls_last)
    }),

    // Newman modularity of the SOURCE partition over the near-dup
    // candidate graph (wave 56; Newman & Girvan 2004): how
    // assortative is duplication w.r.t. crawl source — Q ≈ 0 means
    // near-dups cross sources (cross-crawl contamination, the
    // expensive kind), Q → 1 means duplication stays inside each
    // slice. Q = Σ_c (e_c/m − (d_c/2m)²) over the communities that
    // the source column already defines — no iterative detection
    // pass, so the whole statistic is two bounded aggregates over
    // the memoized LSH pair table: one doc→source join per endpoint,
    // intra-edge counts e_c and degree masses d_c per community
    // (≤|sources| rows), per-community terms snapped 10dp and
    // decimal-summed. Per-community rows with the global Q repeated
    // (kruskal readout convention). NULL sources form an honest
    // '__null__' community.
    "graph_modularity" -> ((s, d) => {
      import s.implicits._
      val cand = LlmQueries.pairTable(s, d)
      val srcMap = Tables.documents(s, d)
        .select($"doc_id", coalesce($"source", lit("__null__")).as("src"))
      val lab = cand
        .join(srcMap.select($"doc_id".as("doc_a"), $"src".as("sa")),
          Seq("doc_a"))
        .join(srcMap.select($"doc_id".as("doc_b"), $"src".as("sb")),
          Seq("doc_b"))
      val mTot = lab.agg(count(lit(1)).as("m"))
      val dC = lab.select($"sa".as("src")).unionAll(lab.select($"sb".as("src")))
        .groupBy($"src").agg(count(lit(1)).as("d_c"))
      val eC = lab.filter($"sa" === $"sb")
        .groupBy($"sa").agg(count(lit(1)).as("e_c"))
        .withColumnRenamed("sa", "src")
      val terms = dC.join(eC, Seq("src"), "left")
        .withColumn("e_c", coalesce($"e_c", lit(0L)))
        .crossJoin(broadcast(mTot))
      val md = $"m".cast("double")
      val qTerm = rnd($"e_c".cast("double") / md -
        ($"d_c".cast("double") / (lit(2.0) * md)) *
          ($"d_c".cast("double") / (lit(2.0) * md)), 10)
        .cast("decimal(38,10)")
      val qSum = terms.agg(sum(qTerm).cast("double").as("q0"))
      terms
        .crossJoin(broadcast(qSum.select(rnd($"q0", 8).as("modularity"))))
        .select($"src", $"e_c", $"d_c", $"m",
          rnd($"e_c".cast("double") / md, 6).as("intra_frac"),
          $"modularity")
        .orderBy($"src")
    }),

    // Link prediction over the near-dup candidate graph (wave 33):
    // top-50 NON-edge pairs ranked by neighborhood Jaccard
    // (common-neighbors / union-of-neighborhoods) — "these two docs
    // share most of their near-dup neighbors but no LSH band put them
    // together", the transitive-dup audit that catches what banding
    // narrowly missed. Wedge enumeration rides triangle_count's
    // [[WedgeCap]] discipline (per-node adjacency truncated to the
    // WedgeCap smallest neighbor ids, so wedge work is ≤ WedgeCap²
    // per node at any scale); `capped` surfaces per pair whether any
    // counted wedge center was truncated (true ⇒ cn is a lower
    // bound), the triangle_count honesty convention. Degrees in the
    // denominator stay UNtruncated. Dormant at oracle scale,
    // spec-pinned.
    "jaccard_link_pred" -> ((s, d) => {
      import s.implicits._
      val e = LlmQueries.pairTable(s, d)
      val sym = e.select($"doc_a".as("u"), $"doc_b".as("v"))
        .unionAll(e.select($"doc_b".as("u"), $"doc_a".as("v")))
      val deg = sym.groupBy($"u").agg(count(lit(1)).as("deg"))
      val adj = sym
        .withColumn("rn", row_number()
          .over(Window.partitionBy($"u").orderBy($"v")))
        .filter($"rn" <= WedgeCap).drop("rn")
        .join(deg, Seq("u"))
        .withColumn("cap", $"deg" > WedgeCap)
      val cn = adj.select($"u", $"v", $"cap")
        .join(adj.select($"u", $"v".as("w")), Seq("u"))
        .filter($"v" < $"w")
        .groupBy($"v".as("doc_a"), $"w".as("doc_b"))
        .agg(count(lit(1)).as("cn"),
          max(when($"cap", 1).otherwise(0)).as("capx"))
      cn.join(e, Seq("doc_a", "doc_b"), "left_anti")
        .join(deg.select($"u".as("doc_a"), $"deg".as("deg_a")), Seq("doc_a"))
        .join(deg.select($"u".as("doc_b"), $"deg".as("deg_b")), Seq("doc_b"))
        .select($"doc_a", $"doc_b", $"cn", $"deg_a", $"deg_b",
          rnd($"cn".cast("double") /
            ($"deg_a" + $"deg_b" - $"cn").cast("double"), 6).as("jacc"),
          ($"capx" === 1).as("capped"))
        .orderBy($"jacc".desc, $"doc_a", $"doc_b")
        .limit(50)
    })
  )

  val oracles: Map[String, String] = Map(
    // same even-doc training slice, same seen-bigram ratio, same
    // 0.4 · (x/y) backoff op order, same 6dp snap + decimal-sum mean
    "lm_backoff_score" ->
      s"""WITH toks AS (SELECT doc_id, ${LlmQueries.TOKS} AS w FROM documents),
         |idx AS (SELECT doc_id, w, unnest(range(1, len(w))) AS i
         |        FROM toks WHERE len(w) >= 2),
         |pairs AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2 FROM idx),
         |tt AS (SELECT unnest(${LlmQueries.TOKS}) AS t FROM documents
         |       WHERE doc_id % 2 = 0),
         |uni AS (SELECT t, count(*) AS c2 FROM tt WHERE t <> '' GROUP BY t),
         |tot AS (SELECT sum(c2) AS n_train, count(*) AS v_train FROM uni),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs
         |        WHERE doc_id % 2 = 0 GROUP BY w1, w2),
         |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
         |lm AS (SELECT w1, w2, CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p_seen
         |       FROM c12 JOIN c1 USING (w1)),
         |sc AS (SELECT doc_id, p_seen,
         |    coalesce(p_seen, 0.4 * (CAST(coalesce(c2, 0) + 1 AS DOUBLE)
         |      / CAST(n_train + v_train AS DOUBLE))) AS sc
         |  FROM pairs LEFT JOIN lm USING (w1, w2)
         |  LEFT JOIN uni ON pairs.w2 = uni.t CROSS JOIN tot)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  CAST(sum(CASE WHEN p_seen IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_backoff,
         |  CAST(sum(CAST(${Q.duckRnd("sc", 6)} AS DECIMAL(18,6))) AS DOUBLE)
         |    / count(*) AS mean_score
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same literal lexicon, same hits argmax with (hits desc, topic)
    // tiebreak, same unknown default
    "taxonomy_classify" -> {
      val lexValues = TaxonomyLexicon
        .map { case (t, k) => s"('$t','$k')" }.mkString(", ")
      s"""WITH lex(topic, term) AS (VALUES $lexValues),
         |t AS (SELECT doc_id, unnest(${LlmQueries.TOKS}) AS term FROM documents),
         |h AS (SELECT doc_id, topic, count(*) AS hits
         |      FROM t JOIN lex USING (term) GROUP BY doc_id, topic),
         |b AS (SELECT doc_id, topic, hits, row_number() OVER (
         |        PARTITION BY doc_id ORDER BY hits DESC, topic) AS rk FROM h)
         |SELECT d.doc_id, coalesce(s.topic, 'unknown') AS topic,
         |  CAST(coalesce(s.hits, 0) AS BIGINT) AS hits
         |FROM documents d LEFT JOIN
         |  (SELECT doc_id, topic, hits FROM b WHERE rk = 1) s
         |  ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // same exact integer bucketing: length of the binary rendering
    "length_histogram" ->
      s"""WITH n AS (SELECT doc_id, CAST(${LlmQueries.NTOK} AS BIGINT) AS n_tok
         |           FROM documents)
         |SELECT CAST(length(bin(n_tok)) AS BIGINT) AS bucket,
         |  count(*) AS n_docs, min(n_tok) AS min_tok, max(n_tok) AS max_tok,
         |  CAST(sum(n_tok) AS BIGINT) AS total_tok
         |FROM n WHERE n_tok > 0 GROUP BY 1 ORDER BY bucket""".stripMargin,

    // same char 8-grams over the same normalization, same md5-hex →
    // BIGINT hash, same 4-window minima
    "winnow_fingerprint" ->
      s"""WITH $duckWinnowCtes
         |SELECT doc_id, count(*) AS n_windows,
         |  count(DISTINCT fp) AS n_fp,
         |  ${Q.duckRnd(
             "CAST(count(DISTINCT fp) AS DOUBLE) / CAST(count(*) AS DOUBLE)",
             6)} AS density,
         |  min(fp) AS fp_min, max(fp) AS fp_max
         |FROM f WHERE p >= 4 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same windows, same fp -> first-doc rule; the interval union is
    // gaps-and-islands (equal-width intervals sorted by start, break
    // when s > prev running max(e) + 1), text reconstruction is
    // string_agg of the between-interval segments plus the tail —
    // value-identical to Spark's sorted-array fold
    "substring_dedup_cut" ->
      s"""WITH $duckWinnowCtes,
         |w AS (SELECT doc_id, p, fp FROM f WHERE p >= 4),
         |fd AS (SELECT fp, min(doc_id) AS first_doc FROM w GROUP BY fp),
         |dup AS (SELECT w.doc_id, w.p - 3 AS s, w.p + 7 AS e
         |        FROM w JOIN fd USING (fp) WHERE w.doc_id > fd.first_doc),
         |m AS (SELECT doc_id, s, e,
         |    CASE WHEN s <= max(e) OVER (PARTITION BY doc_id ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
         |      THEN 0 ELSE 1 END AS brk FROM dup),
         |gi AS (SELECT doc_id, s, e,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS grp FROM m),
         |iv AS (SELECT doc_id, grp, min(s) AS s, max(e) AS e
         |       FROM gi GROUP BY doc_id, grp),
         |sg AS (SELECT doc_id, s, e,
         |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1
         |      AS prev_pos FROM iv),
         |ck AS (SELECT sg.doc_id, count(*) AS n_spans,
         |    CAST(sum(e - s + 1) AS BIGINT) AS cut_chars,
         |    string_agg(substr(n.t, prev_pos, s - prev_pos), '' ORDER BY s)
         |      || substr(n.t, max(e) + 1) AS kept
         |    FROM sg JOIN n USING (doc_id) GROUP BY sg.doc_id, n.t),
         |alln AS (SELECT doc_id, ${LlmQueries.NORM} AS t FROM documents)
         |SELECT alln.doc_id,
         |  coalesce(ck.n_spans, 0) AS n_spans,
         |  coalesce(ck.cut_chars, 0) AS cut_chars,
         |  coalesce(ck.kept, alln.t) AS text_dedup
         |FROM alln LEFT JOIN ck ON alln.doc_id = ck.doc_id
         |ORDER BY alln.doc_id""".stripMargin,

    // same double op order: scale = max|x|/127, q = clamped
    // floor(x/scale + 0.5), per-dim squared error snapped to 12dp and
    // decimal-summed
    "embedding_quantize" ->
      s"""WITH d AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
         |s AS (SELECT vec_id, max(abs(x)) / 127.0 AS scale, count(*) AS dim
         |      FROM d GROUP BY vec_id),
         |q AS (SELECT d.vec_id, x, scale, dim,
         |    CASE WHEN scale = 0 THEN 0.0
         |         ELSE greatest(-127.0, least(127.0, floor(x / scale + 0.5)))
         |    END AS qv
         |  FROM d JOIN s USING (vec_id)),
         |e AS (SELECT vec_id, scale, dim, qv,
         |    ${Q.duckRnd("(x - qv * scale) * (x - qv * scale)", 12)} AS sq
         |  FROM q)
         |SELECT vec_id, ${Q.duckRnd("scale", 8)} AS scale,
         |  CAST(sum(CASE WHEN qv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         |  ${Q.duckRnd(
             "CAST(sum(CAST(sq AS DECIMAL(28,12))) AS DOUBLE) / CAST(dim AS DOUBLE)",
             10)} AS mse
         |FROM e GROUP BY vec_id, scale, dim ORDER BY vec_id""".stripMargin,

    // same hashed-bigram buckets (md5 hex → int, identical bytes),
    // same smoothed-ratio op order, same 6dp round + decimal sum
    "dsir_select" ->
      s"""WITH toks AS (SELECT doc_id, lang, ${LlmQueries.TOKS} AS w FROM documents),
         |idx AS (SELECT doc_id, lang, w, unnest(range(1, len(w))) AS i
         |        FROM toks WHERE len(w) >= 2),
         |feats AS (SELECT doc_id, lang,
         |  ('0x' || substr(md5(w[i] || ' ' || w[i+1]), 1, 8))::BIGINT % 1024 AS b
         |  FROM idx),
         |raw AS (SELECT b, count(*) AS cr FROM feats GROUP BY b),
         |tgt AS (SELECT b, count(*) AS ct FROM feats WHERE lang = 'en' GROUP BY b),
         |tot AS (SELECT count(*) AS n_raw,
         |        sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_tgt FROM feats),
         |ratios AS (SELECT b, ${Q.duckRnd(
             "(CAST(coalesce(ct, 0) + 1 AS DOUBLE) / CAST(n_tgt + 1024 AS DOUBLE)) / " +
               "(CAST(cr + 1 AS DOUBLE) / CAST(n_raw + 1024 AS DOUBLE))", 6)} AS r
         |  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot)
         |SELECT doc_id, count(*) AS n_feats,
         |  CAST(sum(CAST(r AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS w,
         |  (CAST(sum(CAST(r AS DECIMAL(18,6))) AS DOUBLE) / count(*)) > 1.0 AS selected
         |FROM feats JOIN ratios USING (b)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "ccnet_buckets" ->
      s"""WITH toks AS (SELECT doc_id, lang, ${LlmQueries.TOKS} AS w FROM documents),
         |idx AS (SELECT doc_id, lang, w, unnest(range(1, len(w))) AS i
         |        FROM toks WHERE len(w) >= 2),
         |pairs AS (SELECT doc_id, lang, w[i] AS w1, w[i+1] AS w2 FROM idx),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
         |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
         |lm AS (SELECT w1, w2, CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p
         |       FROM c12 JOIN c1 USING (w1)),
         |scored AS (SELECT doc_id, lang,
         |  CAST(sum(CAST(${Q.duckRnd("p", 6)} AS DECIMAL(18,6))) AS DOUBLE)
         |    / count(*) AS mean_p
         |  FROM pairs JOIN lm USING (w1, w2)
         |  GROUP BY doc_id, lang)
         |SELECT doc_id, lang, mean_p,
         |  CASE ntile(3) OVER (PARTITION BY lang ORDER BY mean_p DESC, doc_id)
         |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM scored ORDER BY doc_id""".stripMargin,

    // Transitive closure via recursive CTE: min reachable doc_id ==
    // the propagated min label. Tiny closures at test scale; the
    // Spark side is the one that has to scale.
    "dedup_clusters" ->
      s"""WITH RECURSIVE ${LlmQueries.duckCandidateCtes},
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM cand
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM cand),
         |reach AS (
         |  SELECT doc_id, doc_id AS r FROM documents
         |  UNION
         |  SELECT e.a AS doc_id, reach.r FROM edges e JOIN reach ON reach.doc_id = e.b
         |)
         |SELECT doc_id, min(r) AS cluster FROM reach
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "semdedup_clusters" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT vec_a, vec_b FROM (
         |   SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${Q.duckRnd(LlmQueries.duckCos("a.embedding", "b.embedding"), 6)} AS cos_sim
         |   FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id) t
         |  WHERE cos_sim > 0.8),
         |edges AS (SELECT vec_a AS a, vec_b AS b FROM pairs
         |          UNION ALL SELECT vec_b AS a, vec_a AS b FROM pairs),
         |reach AS (
         |  SELECT vec_id, vec_id AS r FROM embeddings
         |  UNION
         |  SELECT e.a AS vec_id, reach.r FROM edges e JOIN reach ON reach.vec_id = e.b
         |)
         |SELECT vec_id, min(r) AS cluster FROM reach
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "dedup_keep_best" ->
      s"""WITH RECURSIVE ${LlmQueries.duckCandidateCtes},
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM cand
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM cand),
         |reach AS (
         |  SELECT doc_id, doc_id AS r FROM documents
         |  UNION
         |  SELECT e.a AS doc_id, reach.r FROM edges e JOIN reach ON reach.doc_id = e.b
         |),
         |clusters AS (SELECT doc_id, min(r) AS cluster FROM reach GROUP BY doc_id),
         |q AS (SELECT doc_id, ${LlmQueries.duckQuality} AS quality FROM documents)
         |SELECT cluster, kept_doc, quality FROM (
         |  SELECT c.cluster, c.doc_id AS kept_doc, q.quality,
         |    row_number() OVER (PARTITION BY c.cluster
         |      ORDER BY q.quality DESC, c.doc_id) AS rk
         |  FROM clusters c JOIN q USING (doc_id)) x
         |WHERE rk = 1 ORDER BY cluster""".stripMargin,

    // same recursive closure, same mode tiebreak (count desc, value
    // asc nulls last), same ≥2-member cut
    "golden_record" ->
      s"""WITH RECURSIVE ${LlmQueries.duckCandidateCtes},
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM cand
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM cand),
         |reach AS (
         |  SELECT doc_id, doc_id AS r FROM documents
         |  UNION
         |  SELECT e.a AS doc_id, reach.r FROM edges e JOIN reach ON reach.doc_id = e.b
         |),
         |clusters AS (SELECT doc_id, min(r) AS cluster FROM reach GROUP BY doc_id),
         |m AS (SELECT c.cluster, d.doc_id, d.lang, d.source, d.n_chars
         |  FROM clusters c JOIN documents d ON c.doc_id = d.doc_id),
         |sizes AS (SELECT cluster, count(*) AS n_members,
         |    min(doc_id) AS canonical_id, max(n_chars) AS max_chars
         |  FROM m GROUP BY cluster HAVING count(*) >= 2),
         |lm AS (SELECT cluster, lang AS lang_mode FROM (
         |  SELECT cluster, lang, row_number() OVER (PARTITION BY cluster
         |    ORDER BY count(*) DESC, lang ASC NULLS LAST) AS rk
         |  FROM m GROUP BY cluster, lang) x WHERE rk = 1),
         |sm AS (SELECT cluster, source AS source_mode FROM (
         |  SELECT cluster, source, row_number() OVER (PARTITION BY cluster
         |    ORDER BY count(*) DESC, source ASC NULLS LAST) AS rk
         |  FROM m GROUP BY cluster, source) x WHERE rk = 1)
         |SELECT s.cluster, s.n_members, s.canonical_id, s.max_chars,
         |  lm.lang_mode, sm.source_mode
         |FROM sizes s JOIN lm ON s.cluster = lm.cluster
         |  JOIN sm ON s.cluster = sm.cluster
         |ORDER BY s.cluster""".stripMargin,

    "bm25_topk" -> {
      // literals composed the way the Spark side folds them
      // ((1.2 + 1.0), 1.0 - 0.75 + 0.75*x) so every double matches
      val score =
        "(CAST(tf.tf AS DOUBLE) * (1.2 + 1.0) / (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl.dl AS DOUBLE) / (total_dl / n_docs))))) * ((n_docs + 1.0) / (CAST(df.df AS DOUBLE) + 1.0))"
      val rscore = Q.duckRnd(score, 6)
      s"""WITH terms AS (SELECT doc_id, unnest(${LlmQueries.TOKS}) AS term FROM documents),
         |t AS (SELECT doc_id, term FROM terms WHERE term <> ''),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
         |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM t) dd GROUP BY term),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, CAST(sum(dl) AS DOUBLE) AS total_dl FROM dl)
         |SELECT doc_id, term, tf, score, rk FROM (
         |  SELECT tf.doc_id, tf.term, tf.tf, $rscore AS score,
         |    row_number() OVER (PARTITION BY tf.doc_id ORDER BY $rscore DESC, tf.term) AS rk
         |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN st) x
         |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin
    },

    "dedup_stats" ->
      s"""WITH RECURSIVE ${LlmQueries.duckCandidateCtes},
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM cand
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM cand),
         |reach AS (
         |  SELECT doc_id, doc_id AS r FROM documents
         |  UNION
         |  SELECT e.a AS doc_id, reach.r FROM edges e JOIN reach ON reach.doc_id = e.b
         |),
         |clusters AS (SELECT doc_id, min(r) AS cluster FROM reach GROUP BY doc_id),
         |sizes AS (SELECT cluster, count(*) AS cluster_size FROM clusters GROUP BY cluster)
         |SELECT cluster_size, count(*) AS n_clusters FROM sizes
         |GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,

    "dedup_incremental" ->
      s"""WITH ${LlmQueries.duckCandidateCtes},
         |fps AS (SELECT doc_id, md5(coalesce(array_to_string(list_sort(${LlmQueries.TOKS}), ' '), '')) AS fp
         |        FROM documents),
         |exact_sur AS (
         | SELECT doc_id FROM fps f
         | WHERE doc_id % 10 = 0
         |  AND NOT EXISTS (SELECT 1 FROM fps o
         |                  WHERE o.doc_id % 10 <> 0 AND o.fp = f.fp)),
         |nearhit AS (
         | SELECT DISTINCT a.doc_id FROM bands a
         | WHERE a.doc_id % 10 = 0
         |  AND EXISTS (SELECT 1 FROM bands b
         |              WHERE b.doc_id % 10 <> 0 AND b.band = a.band AND b.key = a.key))
         |SELECT doc_id FROM exact_sur
         |WHERE doc_id NOT IN (SELECT doc_id FROM nearhit)
         |ORDER BY doc_id""".stripMargin,

    // same three unrolled min-distance rounds, same -1 unreached
    "bfs_hops" -> {
      def round(k: Int) =
        s"""d$k AS (SELECT doc_id, CAST(min(dist) AS INTEGER) AS dist FROM (
           |  SELECT doc_id, dist FROM d${k - 1}
           |  UNION ALL
           |  SELECT e.v AS doc_id, p.dist + 1 AS dist
           |  FROM d${k - 1} p JOIN e ON p.doc_id = e.u) u$k
           | GROUP BY doc_id)""".stripMargin
      s"""WITH ${LlmQueries.duckCandidateCtes},
         |e AS (SELECT doc_a AS u, doc_b AS v FROM cand
         |      UNION ALL SELECT doc_b, doc_a FROM cand),
         |d0 AS (SELECT doc_id, CAST(0 AS INTEGER) AS dist FROM documents
         |       WHERE doc_id % 100 = 0),
         |${round(1)}, ${round(2)}, ${round(3)}
         |SELECT coalesce(d3.dist, -1) AS dist, count(*) AS n_docs
         |FROM documents LEFT JOIN d3 USING (doc_id)
         |GROUP BY coalesce(d3.dist, -1) ORDER BY dist""".stripMargin
    },

    "triangle_count" ->
      s"""WITH ${LlmQueries.duckCandidateCtes},
         |e AS (SELECT u, v FROM (
         |  SELECT doc_a AS u, doc_b AS v,
         |   row_number() OVER (PARTITION BY doc_a ORDER BY doc_b) AS rn
         |  FROM cand) c WHERE rn <= $WedgeCap),
         |tri AS (
         | SELECT w1.u, w1.v, w1.w FROM (
         |  SELECT a.u, a.v, b.v AS w FROM e a JOIN e b ON a.u = b.u AND a.v < b.v) w1
         | JOIN e c ON c.u = w1.v AND c.v = w1.w),
         |deg AS (SELECT doc_a AS node, count(*) AS outdeg FROM cand
         |        GROUP BY doc_a),
         |g AS (SELECT node, count(*) AS n_tri FROM (
         | SELECT u AS node FROM tri
         | UNION ALL SELECT v AS node FROM tri
         | UNION ALL SELECT w AS node FROM tri) t
         |GROUP BY node)
         |SELECT g.node, g.n_tri,
         | coalesce(d.outdeg, 0) > $WedgeCap AS capped
         |FROM g LEFT JOIN deg d USING (node) ORDER BY node""".stripMargin,

    // plain corpus-wide NTILE in the oracle (DistributedNtile matches
    // NTILE semantics exactly); missing deciles drop out identically
    "vocab_growth" ->
      s"""WITH dd AS (SELECT doc_id, CAST(ntile(10) OVER (ORDER BY doc_id)
         |    AS INTEGER) AS decile FROM documents),
         |t AS (SELECT doc_id, unnest(${LlmQueries.TOKS}) AS term FROM documents),
         |f AS (SELECT term, min(doc_id) AS doc_id FROM t WHERE term <> ''
         |      GROUP BY term),
         |p AS (SELECT decile, count(*) AS new_terms
         |      FROM f JOIN dd USING (doc_id) GROUP BY decile)
         |SELECT decile, new_terms,
         |  CAST(sum(new_terms) OVER (ORDER BY decile
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_terms
         |FROM p ORDER BY decile""".stripMargin,

    "zipf_profile" ->
      s"""WITH t AS (SELECT unnest(${LlmQueries.TOKS}) AS term FROM documents),
         |c AS (SELECT term, count(*) AS tf FROM t WHERE term <> ''
         |      GROUP BY term),
         |top AS (SELECT term, tf FROM c ORDER BY tf DESC, term LIMIT 20),
         |r AS (SELECT CAST(row_number() OVER (ORDER BY tf DESC, term)
         |    AS BIGINT) AS rank, term, tf FROM top),
         |t1 AS (SELECT tf AS tf1 FROM r WHERE rank = 1)
         |SELECT rank, term, CAST(tf AS BIGINT) AS tf,
         |  ${Q.duckRnd("CAST(tf AS DOUBLE) / CAST(t1.tf1 AS DOUBLE)", 6)}
         |    AS rel_freq
         |FROM r, t1 ORDER BY rank""".stripMargin,

    "kcore_peel" ->
      s"""WITH ${LlmQueries.duckCandidateCtes},
         |e AS (SELECT doc_a AS u, doc_b AS v FROM cand),
         |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
         |d0 AS (SELECT u, count(*) AS deg0 FROM sym GROUP BY u),
         |k1 AS (SELECT u FROM d0 WHERE deg0 < 2),
         |e1 AS (SELECT s.u, s.v FROM sym s
         |  LEFT JOIN k1 a ON s.u = a.u LEFT JOIN k1 b ON s.v = b.u
         |  WHERE a.u IS NULL AND b.u IS NULL),
         |d1 AS (SELECT u, count(*) AS deg_after FROM e1 GROUP BY u)
         |SELECT d0.u AS doc_id, CAST(d0.deg0 AS BIGINT) AS deg0,
         |  CAST(coalesce(d1.deg_after, 0) AS BIGINT) AS deg_after,
         |  CAST(CASE WHEN d0.deg0 < 2 THEN 1
         |    WHEN coalesce(d1.deg_after, 0) < 2 THEN 2 ELSE 0 END
         |    AS INTEGER) AS removed_round
         |FROM d0 LEFT JOIN d1 ON d0.u = d1.u
         |ORDER BY doc_id""".stripMargin,

    "graph_degree_dist" ->
      s"""WITH ${LlmQueries.duckCandidateCtes},
         |deg AS (
         | SELECT doc_id, count(*) AS degree FROM (
         |  SELECT doc_a AS doc_id FROM cand
         |  UNION ALL SELECT doc_b AS doc_id FROM cand) t
         | GROUP BY doc_id)
         |SELECT degree, count(*) AS n_docs FROM deg
         |GROUP BY degree ORDER BY degree""".stripMargin,

    "sample_stratified" -> {
      val hv = LlmQueries.duckHex8ToBigint("h")
      s"""SELECT doc_id, lang, u FROM (
         |  SELECT doc_id, lang, ($hv) / 4294967296.0 AS u,
         |    (CASE WHEN lang = 'en' THEN 0.3
         |          WHEN lang = 'de' THEN 0.6 ELSE 1.0 END) AS rate
         |  FROM (SELECT doc_id, lang,
         |          md5('smp:' || CAST(doc_id AS VARCHAR)) AS h
         |        FROM documents) t0) t
         |WHERE u < rate ORDER BY doc_id""".stripMargin
    },

    "contamination_check" ->
      s"""WITH ${LlmQueries.duckShingleCtes},
         |shr AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM sh),
         |bench AS (SELECT DISTINCT s FROM shr WHERE doc_id % 97 = 0)
         |SELECT doc_id, count(*) AS n_shared
         |FROM shr JOIN bench USING (s)
         |WHERE doc_id % 97 <> 0
         |GROUP BY doc_id HAVING count(*) >= 3
         |ORDER BY doc_id""".stripMargin,

    "tfidf_topk" -> {
      val score =
        "CAST(tf.tf AS DOUBLE) * (CAST(n_docs + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE))"
      s"""WITH terms AS (SELECT doc_id, unnest(${LlmQueries.TOKS}) AS term FROM documents),
         |t AS (SELECT doc_id, term FROM terms WHERE term <> ''),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM t) dd GROUP BY term),
         |nd AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT doc_id, term, tf, score, rk FROM (
         |  SELECT tf.doc_id, tf.term, tf.tf, $score AS score,
         |    row_number() OVER (PARTITION BY tf.doc_id ORDER BY $score DESC, tf.term) AS rk
         |  FROM tf JOIN df USING (term) CROSS JOIN nd) x
         |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin
    },

    // same seeds, same snapped-once tf-idf, same decimal sums, same
    // two orderBy+limit cuts
    "rocchio_expand" -> {
      val wExpr =
        "CAST(tf AS DOUBLE) * (CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE))"
      s"""WITH terms AS (SELECT doc_id, unnest(${LlmQueries.TOKS}) AS term FROM documents),
         |t AS (SELECT doc_id, term FROM terms WHERE term <> ''),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS df
         |  FROM (SELECT DISTINCT doc_id, term FROM t) dd GROUP BY term),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |seeds AS (SELECT term FROM (
         |  SELECT term, sum(tf) AS stf FROM tf GROUP BY term
         |  ORDER BY stf DESC, term LIMIT $RocchioSeeds) s),
         |w AS (SELECT doc_id, term, ${Q.duckRnd(wExpr, 8)} AS w
         |  FROM tf JOIN df USING (term) CROSS JOIN nd),
         |ds AS (SELECT doc_id,
         |    CAST(sum(CAST(w AS DECIMAL(38,8))) AS DOUBLE) AS sc
         |  FROM w JOIN seeds USING (term) GROUP BY doc_id),
         |top AS (SELECT doc_id FROM ds ORDER BY sc DESC, doc_id LIMIT $RocchioR),
         |re AS (SELECT count(*) AS r FROM top),
         |cent AS (SELECT term, sum(CAST(w AS DECIMAL(38,8))) AS cw
         |  FROM w JOIN top USING (doc_id) GROUP BY term),
         |wt AS (SELECT coalesce(cent.term, seeds.term) AS term,
         |    seeds.term IS NOT NULL AS is_seed,
         |    ${Q.duckRnd(
        "CASE WHEN seeds.term IS NOT NULL THEN 1.0 ELSE 0.0 END" +
          " + 0.75 * (CAST(coalesce(cw, 0) AS DOUBLE) / CAST(r AS DOUBLE))",
        8)} AS weight
         |  FROM cent FULL OUTER JOIN seeds ON cent.term = seeds.term
         |  CROSS JOIN re)
         |SELECT term, is_seed, weight FROM wt
         |ORDER BY weight DESC, term LIMIT $RocchioE""".stripMargin
    },

    "pack_sequences" -> {
      val bpe = """len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))"""
      s"""SELECT doc_id, lang, tokens,
         | CAST(floor((cum - tokens) / 2048) AS BIGINT) AS bin
         |FROM (
         | SELECT doc_id, lang, $bpe AS tokens,
         |  sum($bpe) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         | FROM documents) t
         |ORDER BY doc_id""".stripMargin
    },

    "quality_gate" ->
      s"""SELECT doc_id, source, quality, pr FROM (
         |  SELECT doc_id, source, ${LlmQueries.duckQuality} AS quality,
         |    percent_rank() OVER (PARTITION BY source
         |      ORDER BY ${LlmQueries.duckQuality}, doc_id) AS pr
         |  FROM documents) t
         |WHERE pr >= 0.5 ORDER BY doc_id""".stripMargin,

    "curate_corpus" ->
      s"""WITH RECURSIVE ${LlmQueries.duckCandidateCtes},
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM cand
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM cand),
         |reach AS (
         |  SELECT doc_id, doc_id AS r FROM documents
         |  UNION
         |  SELECT e.a AS doc_id, reach.r FROM edges e JOIN reach ON reach.doc_id = e.b
         |),
         |clusters AS (SELECT doc_id, min(r) AS cluster FROM reach GROUP BY doc_id),
         |gated AS (
         |  SELECT doc_id, source, quality, n_tokens FROM (
         |    SELECT doc_id, source, ${LlmQueries.duckQuality} AS quality,
         |      CAST(${LlmQueries.NTOK} AS BIGINT) AS n_tokens,
         |      percent_rank() OVER (PARTITION BY source
         |        ORDER BY ${LlmQueries.duckQuality}, doc_id) AS pr
         |    FROM documents) t
         |  WHERE pr >= 0.5)
         |SELECT doc_id, cluster, source, quality, n_tokens FROM (
         |  SELECT g.doc_id, c.cluster, g.source, g.quality, g.n_tokens,
         |    row_number() OVER (PARTITION BY c.cluster
         |      ORDER BY g.quality DESC, g.doc_id) AS rk
         |  FROM gated g JOIN clusters c USING (doc_id)) x
         |WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "source_mix" ->
      s"""WITH t AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(${LlmQueries.NTOK}) AS BIGINT) AS tokens
         | FROM documents GROUP BY source),
         |s AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM t)
         |SELECT source, n_docs, tokens,
         | CAST(tokens AS DOUBLE) / CAST(total AS DOUBLE) AS share,
         | CAST(sum(tokens) OVER (ORDER BY tokens DESC, source
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |   / CAST(total AS DOUBLE) AS cum_share
         |FROM t CROSS JOIN s ORDER BY tokens DESC, source""".stripMargin,

    "mixture_sample" -> {
      val hv = LlmQueries.duckHex8ToBigint("h")
      val w6 = Q.duckRnd("sqrt(CAST(src_tok AS DOUBLE))", 6)
      s"""WITH docs AS (SELECT doc_id, source,
         |  CAST(${LlmQueries.NTOK} AS BIGINT) AS n_tok FROM documents),
         |bysrc AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tok,
         |  $w6 AS w6 FROM docs GROUP BY source),
         |tot AS (SELECT CAST(sum(src_tok) AS BIGINT) AS total_tok,
         |  CAST(sum(CAST(w6 AS DECIMAL(28,6))) AS DOUBLE) AS w_sum FROM bysrc),
         |rates AS (SELECT source,
         |  (CASE WHEN src_tok = 0 THEN 0.0 ELSE
         |    least(1.0, 0.25 * CAST(total_tok AS DOUBLE) * w6 / w_sum
         |      / CAST(src_tok AS DOUBLE)) END) AS rate
         | FROM bysrc CROSS JOIN tot)
         |SELECT doc_id, source, n_tok, u, rate FROM (
         |  SELECT d.doc_id, d.source, d.n_tok,
         |    ($hv) / 4294967296.0 AS u, r.rate
         |  FROM (SELECT doc_id, source, n_tok,
         |          md5('smp:' || CAST(doc_id AS VARCHAR)) AS h FROM docs) d
         |  JOIN rates r USING (source)) t
         |WHERE u < rate ORDER BY doc_id""".stripMargin
    },

    // 5 unrolled power iterations mirroring the Spark recurrence
    // exactly (12dp contribution snap, DECIMAL inflow sum, fixed
    // damping op order, 8dp output snap).
    "pagerank_lite" -> {
      val iterCtes = (1 to 5).map { k =>
        val prev = s"r${k - 1}"
        val contrib = Q.duckRnd(s"$prev.r / CAST(deg.deg AS DOUBLE)", 12)
        val upd = Q.duckRnd("0.15 / nn.n + 0.85 * coalesce(c.inflow, 0.0)", 12)
        s"""c$k AS (SELECT e.dst,
           |  CAST(sum(CAST($contrib AS DECIMAL(28,12))) AS DOUBLE) AS inflow
           | FROM $prev JOIN edges e ON $prev.doc_id = e.src
           |  JOIN deg ON deg.src = e.src
           | GROUP BY e.dst),
           |r$k AS (SELECT d.doc_id, $upd AS r
           | FROM documents d CROSS JOIN nn
           |  LEFT JOIN c$k c ON c.dst = d.doc_id)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${LlmQueries.duckCandidateCtes},
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |          UNION ALL SELECT doc_b AS src, doc_a AS dst FROM cand),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         |r0 AS (SELECT doc_id, ${Q.duckRnd("1.0 / nn.n", 12)} AS r
         |       FROM documents CROSS JOIN nn),
         |$iterCtes
         |SELECT doc_id, ${Q.duckRnd("r", 8)} AS rank
         |FROM r5 ORDER BY doc_id""".stripMargin
    },

    "dataset_card" ->
      s"""WITH perdoc AS (SELECT lang,
         |  CAST(${LlmQueries.NTOK} AS BIGINT) AS n_tok,
         |  ${LlmQueries.duckQuality} AS q,
         |  (CASE WHEN ${LlmQueries.duckGopherPass} THEN 1 ELSE 0 END) AS pass
         | FROM documents),
         |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total_tok FROM perdoc)
         |SELECT lang, count(*) AS n_docs,
         | CAST(sum(n_tok) AS BIGINT) AS tokens,
         | CAST(sum(n_tok) AS DOUBLE) / count(*) AS mean_doc_tokens,
         | CAST(sum(CAST(q AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS mean_quality,
         | ${Q.duckRnd("quantile_cont(q, 0.5)", 4)} AS median_quality,
         | CAST(sum(pass) AS DOUBLE) / count(*) AS gopher_pass_rate,
         | CAST(sum(n_tok) AS DOUBLE) / CAST(total_tok AS DOUBLE) AS token_share
         |FROM perdoc CROSS JOIN tot
         |GROUP BY lang, total_tok ORDER BY lang""".stripMargin,

    "heavy_hitters" ->
      s"""WITH t AS (SELECT unnest(${LlmQueries.TOKS}) AS term FROM documents),
         |tt AS (SELECT term FROM t WHERE term <> ''),
         |n AS (SELECT count(*) AS n FROM tt)
         |SELECT term, count(*) AS cnt,
         | CAST(count(*) AS DOUBLE) / CAST(n AS DOUBLE) AS share
         |FROM tt CROSS JOIN n
         |GROUP BY term, n HAVING count(*) * 200 > n
         |ORDER BY cnt DESC, term""".stripMargin,

    // same seeded-md5 bucket hashes, same D×W counter grid built
    // from the same term-count relation, same min-over-rows estimate
    "cms_heavy_hitters" ->
      s"""WITH t AS (SELECT unnest(${LlmQueries.TOKS}) AS term FROM documents),
         |tt AS (SELECT term FROM t WHERE term <> ''),
         |tc AS (SELECT term, count(*) AS cnt FROM tt GROUP BY term),
         |r AS (SELECT range AS r FROM range(0, $CmsDepth)),
         |rw AS (SELECT tc.term, tc.cnt, r.r,
         |  ('0x' || substr(md5(r.r::VARCHAR || ':' || tc.term), 1, 8))::BIGINT
         |    % $CmsWidth AS bucket
         | FROM tc CROSS JOIN r),
         |counters AS (SELECT r, bucket, CAST(sum(cnt) AS BIGINT) AS c
         | FROM rw GROUP BY r, bucket),
         |top AS (SELECT term, cnt FROM tc
         | ORDER BY cnt DESC, term LIMIT $CmsTopK),
         |tb AS (SELECT top.term, top.cnt, r.r,
         |  ('0x' || substr(md5(r.r::VARCHAR || ':' || top.term), 1, 8))::BIGINT
         |    % $CmsWidth AS bucket
         | FROM top CROSS JOIN r)
         |SELECT term, cnt AS exact_cnt, min(c) AS cms_est,
         | min(c) - cnt AS overcount
         |FROM tb JOIN counters USING (r, bucket)
         |GROUP BY term, cnt
         |ORDER BY exact_cnt DESC, term""".stripMargin,

    "shard_plan" -> {
      val hv = LlmQueries.duckHex8ToBigint("h")
      val s16 = ShardCount
      s"""WITH docs AS (SELECT doc_id,
         |  CAST(${LlmQueries.NTOK} AS BIGINT) AS n_tok,
         |  CAST(floor((($hv) / 4294967296.0) * $s16) AS INTEGER) AS shard
         | FROM (SELECT doc_id, text,
         |         md5('shard:' || CAST(doc_id AS VARCHAR)) AS h FROM documents) t),
         |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total_tok FROM docs)
         |SELECT shard, count(*) AS n_docs,
         | CAST(sum(n_tok) AS BIGINT) AS tokens,
         | CAST(sum(n_tok) AS DOUBLE) / (CAST(total_tok AS DOUBLE) / $s16.0) AS balance
         |FROM docs CROSS JOIN tot
         |GROUP BY shard, total_tok ORDER BY shard""".stripMargin
    },

    "token_diversity" ->
      s"""WITH terms AS (SELECT doc_id, unnest(${LlmQueries.TOKS}) AS term FROM documents),
         |t AS (SELECT doc_id, term FROM terms WHERE term <> ''),
         |c AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY doc_id, term),
         |p AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  count(*) AS n_types, CAST(sum(c * c) AS BIGINT) AS sum_c2
         | FROM c GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_types,
         | CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
         | CAST(sum_c2 AS DOUBLE) / CAST(n_tokens * n_tokens AS DOUBLE) AS simpson
         |FROM p ORDER BY doc_id""".stripMargin,

    // same digit-run mask over the same normalization, same md5 key;
    // NULL text -> NULL template group in both engines
    "template_dedup" ->
      s"""WITH m AS (SELECT doc_id,
         |  md5(regexp_replace(${LlmQueries.NORM}, '[0-9]+', '0', 'g'))
         |    AS template
         | FROM documents)
         |SELECT template, count(*) AS n_docs, min(doc_id) AS rep_doc
         |FROM m GROUP BY template
         |ORDER BY n_docs DESC, template""".stripMargin,

    // same whitespace-token count (NTOK) and BPE-ish pre-tokenizer
    // regex, exact integer sums, one closing division
    "tokenizer_fertility" ->
      s"""WITH t AS (SELECT lang, CAST(${LlmQueries.NTOK} AS BIGINT) AS ws,
         |  CAST(len(regexp_extract_all(text,
         |    '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe
         | FROM documents)
         |SELECT lang, count(*) AS n_docs,
         | CAST(sum(ws) AS BIGINT) AS ws_tokens,
         | CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
         | CASE WHEN coalesce(sum(ws), 0) = 0 THEN NULL
         |      ELSE ${Q.duckRnd(
             "CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE)", 6)}
         | END AS fertility
         |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    // replays the LSH candidate pipeline (shared CTEs), the same
    // WedgeCap-truncated adjacency, the same untruncated degrees
    "jaccard_link_pred" ->
      s"""WITH ${LlmQueries.duckCandidateCtes},
         |sym AS (SELECT doc_a AS u, doc_b AS v FROM cand
         |        UNION ALL SELECT doc_b, doc_a FROM cand),
         |deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY u),
         |adj AS (SELECT a.u, a.v, deg.deg, deg.deg > $WedgeCap AS cap
         | FROM (SELECT u, v,
         |        row_number() OVER (PARTITION BY u ORDER BY v) AS rn
         |       FROM sym) a
         | JOIN deg ON deg.u = a.u WHERE a.rn <= $WedgeCap),
         |w AS (SELECT a1.v AS doc_a, a2.v AS doc_b, a1.cap
         | FROM adj a1 JOIN adj a2 ON a1.u = a2.u AND a1.v < a2.v),
         |cnt AS (SELECT doc_a, doc_b, count(*) AS cn,
         |  max(CASE WHEN cap THEN 1 ELSE 0 END) AS capx
         | FROM w GROUP BY doc_a, doc_b),
         |ne AS (SELECT c.doc_a, c.doc_b, c.cn, c.capx FROM cnt c
         | LEFT JOIN cand e ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
         | WHERE e.doc_a IS NULL)
         |SELECT ne.doc_a, ne.doc_b, cn,
         | da.deg AS deg_a, db.deg AS deg_b,
         | ${Q.duckRnd(
             "CAST(cn AS DOUBLE) / CAST(da.deg + db.deg - cn AS DOUBLE)", 6)}
         |   AS jacc,
         | capx = 1 AS capped
         |FROM ne JOIN deg da ON da.u = ne.doc_a
         | JOIN deg db ON db.u = ne.doc_b
         |ORDER BY jacc DESC, ne.doc_a, ne.doc_b LIMIT 50""".stripMargin,

    "graph_modularity" ->
      s"""WITH ${LlmQueries.duckCandidateCtes},
         |sm AS (SELECT doc_id, coalesce(source, '__null__') AS src
         |  FROM documents),
         |lab AS (SELECT a.src AS sa, b.src AS sb FROM cand
         |  JOIN sm a ON cand.doc_a = a.doc_id
         |  JOIN sm b ON cand.doc_b = b.doc_id),
         |mt AS (SELECT count(*) AS m FROM lab),
         |dc AS (SELECT src, count(*) AS d_c FROM
         |    (SELECT sa AS src FROM lab UNION ALL SELECT sb FROM lab) t
         |  GROUP BY src),
         |ec AS (SELECT sa AS src, count(*) AS e_c FROM lab
         |  WHERE sa = sb GROUP BY sa),
         |terms AS (SELECT dc.src, coalesce(ec.e_c, 0) AS e_c, dc.d_c, mt.m
         |  FROM dc LEFT JOIN ec USING (src) CROSS JOIN mt),
         |x AS (SELECT src, e_c, d_c, m,
         |    ${Q.duckRnd(
        "CAST(e_c AS DOUBLE) / CAST(m AS DOUBLE)" +
          " - (CAST(d_c AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))" +
          " * (CAST(d_c AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))", 10)}
         |      AS qt
         |  FROM terms),
         |qs AS (SELECT ${Q.duckRnd(
        "CAST(sum(CAST(qt AS DECIMAL(38,10))) AS DOUBLE)", 8)}
         |    AS modularity FROM x)
         |SELECT src, e_c, d_c, m,
         |  ${Q.duckRnd("CAST(e_c AS DOUBLE) / CAST(m AS DOUBLE)", 6)}
         |    AS intra_frac,
         |  modularity
         |FROM x CROSS JOIN qs ORDER BY src""".stripMargin
  )
}
