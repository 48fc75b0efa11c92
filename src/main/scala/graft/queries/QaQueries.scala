package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Fifteenth wave — pipeline QA, evaluation, and resampling: the ops
  * that close the loop on the curation/index stages already in the
  * inventory (SURVEY.md §2.11 extensions). Evaluation COMPOSES the
  * queries it evaluates (and their oracle SQL), so a regression in
  * the evaluated path is a hash mismatch in the driver's correctness
  * file — the ann_recall_eval principle applied to dedup and DSIR.
  *
  * Scale/perf design:
  *  - `lsh_recall_eval` measures LSH candidate recall/precision
  *    against exact Jaccard ground truth on a BOUNDED deterministic
  *    sample (doc_id < 100): ground truth is all-pairs only within
  *    the sample (≤ K² shingle-join work), never corpus-wide.
  *  - `importance_resample` is one projection over dsir_select's
  *    output: the keep decision is a pure function of (doc_id,
  *    weight) — an md5 draw against a weight-derived basis-point
  *    threshold — so the resample is reproducible under any
  *    partitioning, retry, or backfill (split_assign's property).
  *  - `curation_funnel` attributes every document to the FIRST
  *    filter that kills it, in one scan — the attrition report every
  *    curation pipeline publishes.
  *  - `embedding_outliers` is the per-label distance-to-centroid
  *    z-score audit: centroids and stats are bounded label-keyed
  *    aggregates that broadcast; the corpus never self-joins.
  *  - `mixture_drift` compares source composition across the
  *    doc_id-parity halves — the ingest-drift canary; one scan, one
  *    source-keyed aggregate.
  *  - `token_budget_trim` selects best-first per source under a
  *    token budget via [[graft.operators.DistributedNtile
  *    .withRunningSum]] — the exact running sum computed skew-free
  *    (range partitioning + broadcast carry), so a dominant source
  *    cannot route its corpus slice through one window task.
  */
object QaQueries {

  /** Jaccard threshold defining a true near-dup pair (ngram_jaccard's
    * verification threshold) and the evaluation sample bound.
    */
  private val JaccThresh = 0.4
  // 250 (not 100): the sf0.01 fixture's injected near-dup pairs have
  // no pair with both ids under 100 — a sample bound that small makes
  // the eval vacuously n_true = 0 at that scale. 250 keeps all-pairs
  // ground truth bounded (≤ 250² shingle-join work) while containing
  // true pairs at every fixture scale.
  private val SampleN = 250

  /** Per-source token budget for token_budget_trim. */
  private val BudgetTok = 1000L

  /** Candidate-pair budget for jaccard_band_sweep's exact-Jaccard
    * pass: above this the sweep switches to the deterministic
    * hash-rank sample (mirrored into the oracle; dormant at every
    * fixture scale — sf0.1 has ~40k candidate pairs).
    */
  private val PairSampleCap = 200000L

  private def hexBucket(c: org.apache.spark.sql.Column, digits: Int) =
    conv(substring(c, 1, digits), 16, 10).cast("long")

  /** Candidate-generator recall/precision against exact-Jaccard
    * ground truth on the bounded doc_id < [[SampleN]] sample — ONE
    * definition of "true near-dup pair", graded against whichever
    * candidate relation (doc_a, doc_b, ...) is passed in.
    */
  private def recallEvalAgainst(
      s: org.apache.spark.sql.SparkSession, d: String,
      candidates: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val dsh = LlmQueries.distinctShingleTable(s, d)
      .filter($"doc_id" < SampleN)
    val sizes = dsh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = dsh.select($"doc_id".as("doc_a"), $"sh")
      .join(dsh.select($"doc_id".as("doc_b"), $"sh"), Seq("sh"))
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("n_int"))
    val truePairs = inter
      .join(sizes.select($"doc_id".as("doc_a"), $"n_sh".as("n_a")), Seq("doc_a"))
      .join(sizes.select($"doc_id".as("doc_b"), $"n_sh".as("n_b")), Seq("doc_b"))
      .filter($"n_int".cast("double") /
        ($"n_a" + $"n_b" - $"n_int").cast("double") >= JaccThresh)
      .select($"doc_a", $"doc_b")
    val cand = candidates
      .filter($"doc_a" < SampleN && $"doc_b" < SampleN)
      .select($"doc_a", $"doc_b")
    val hit = truePairs
      .join(cand.withColumn("is_cand", lit(1)), Seq("doc_a", "doc_b"), "left")
      .agg(count(lit(1)).as("n_true"), count($"is_cand").as("n_hit"))
    val nc = cand.agg(count(lit(1)).as("n_cand"))
    hit.crossJoin(nc)
      .select($"n_true", $"n_cand", $"n_hit",
        when($"n_true" === 0L, 1.0)
          .otherwise($"n_hit".cast("double") / $"n_true".cast("double"))
          .as("recall"),
        when($"n_cand" === 0L, 1.0)
          .otherwise($"n_hit".cast("double") / $"n_cand".cast("double"))
          .as("prec"))
  }

  /** jaccard_band_sweep's body with the sample cap as a parameter —
    * production always passes [[PairSampleCap]]; the spec passes a
    * tiny cap to exercise the ENGAGED sample path at fixture scale
    * (where the production cap is deliberately dormant).
    */
  private[queries] def jaccardBandSweep(
      s: org.apache.spark.sql.SparkSession, d: String,
      cap: Long): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val dsh = LlmQueries.distinctShingleTable(s, d)
    val sizes = dsh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    val candAll = LlmQueries.pairTable(s, d)
    val tot = broadcast(candAll.agg(count(lit(1)).as("n_total")))
    val cand = candAll.crossJoin(tot)
      .filter(
        conv(substring(md5(concat_ws("|", $"doc_a", $"doc_b")), 1, 8), 16, 10)
          .cast("long") * $"n_total" < lit(cap) * lit(4294967296L))
      .select($"doc_a", $"doc_b")
    val inter = cand
      .join(dsh.select($"doc_id".as("doc_a"), $"sh"), Seq("doc_a"))
      .join(dsh.select($"doc_id".as("doc_b"), $"sh"), Seq("doc_b", "sh"))
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("n_int"))
    val jacc = cand
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .withColumn("n_int", coalesce($"n_int", lit(0L)))
      .join(sizes.select($"doc_id".as("doc_a"), $"n_sh".as("n_a")), Seq("doc_a"))
      .join(sizes.select($"doc_id".as("doc_b"), $"n_sh".as("n_b")), Seq("doc_b"))
      .select(($"n_int".cast("double") /
        ($"n_a" + $"n_b" - $"n_int").cast("double")).as("jacc"))
    val bands = jacc
      .select(floor($"jacc" * 10).cast("int").as("band"))
      .groupBy($"band").agg(count(lit(1)).as("n_pairs"))
    val w = graft.operators.BoundedWindow
      .orderBy("jaccard_band_sweep: <=11 bands", 11L, $"band".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bands.withColumn("cum_ge", sum($"n_pairs").over(w))
      .crossJoin(tot)
      .select($"band", $"n_pairs", $"cum_ge",
        ($"n_total" > cap).as("sampled"))
      .orderBy($"band")
  }

  val defs: Map[String, QueryFn] = Map(

    // Dedup-threshold tuning table: the exact-Jaccard distribution of
    // the LSH candidate pairs in 0.1-wide bands, with the descending
    // cumulative "pairs you would merge at threshold >= b/10". The
    // table a corpus owner reads before picking minhash_dedup's
    // verification threshold. Zero-intersection candidates band at 0
    // (left join keeps them); the band relation is <= 11 rows, so the
    // cumulative rides BoundedWindow.
    //
    // Above [[PairSampleCap]] candidate pairs the sweep reads a
    // DETERMINISTIC hash-rank sample instead of the full pass (the r9
    // 100× sweep measured the exact full pass at 614.8 s — a tuning
    // TABLE does not need every pair): a pair survives iff
    // md5(doc_a|doc_b)[0..8) * n_total < Cap * 2^32 — pure BIGINT
    // arithmetic, identical in both engines, corpus-order-free, and
    // DORMANT (keeps everything) whenever n_total <= Cap, so fixture
    // oracles are the exact distribution. Expected sample size ≈ Cap;
    // the `sampled` output column says which mode produced the table
    // (the triangle_count `capped` honesty convention). Overflow-safe
    // while n_total < 2^31 pairs — the LSH mega-bucket cap bounds the
    // pair family far below that.
    "jaccard_band_sweep" -> ((s, d) => jaccardBandSweep(s, d, PairSampleCap)),

    // Per-class precision/recall of the lang_id heuristic against the
    // documents.lang ground truth — the confusion-matrix readout that
    // turns a classifier query into an evaluated classifier. Classes
    // are the UNION of truth and prediction labels (a pred-only class
    // like 'unknown' must surface with recall 0, not vanish), built
    // by a full-outer join of the two marginal totals — all on the
    // ≤|classes|² confusion aggregate, one corpus scan total.
    "classifier_eval" -> ((s, d) => {
      import s.implicits._
      val p = Tables.documents(s, d).select($"lang".as("truth"),
        TF.langIdHeuristic($"text").as("pred"))
      val cm = p.groupBy($"truth", $"pred").agg(count(lit(1)).as("n"))
      val rowt = cm.groupBy($"truth").agg(sum($"n").as("n_true"))
        .select($"truth".as("cls"), $"n_true")
      val colt = cm.groupBy($"pred").agg(sum($"n").as("n_pred"))
        .select($"pred".as("cls"), $"n_pred")
      val diag = cm.filter($"truth" === $"pred")
        .select($"truth".as("cls"), $"n".as("tp"))
      rowt.join(colt, Seq("cls"), "full")
        .join(diag, Seq("cls"), "left")
        .select($"cls",
          coalesce($"n_true", lit(0L)).as("n_true"),
          coalesce($"n_pred", lit(0L)).as("n_pred"),
          coalesce($"tp", lit(0L)).as("tp"))
        .withColumn("precision", when($"n_pred" === 0L, lit(0.0))
          .otherwise(rnd($"tp".cast("double") / $"n_pred".cast("double"), 6)))
        .withColumn("recall", when($"n_true" === 0L, lit(0.0))
          .otherwise(rnd($"tp".cast("double") / $"n_true".cast("double"), 6)))
        .orderBy($"cls".asc_nulls_last)
    }),

    // LSH candidate-generation quality: recall and precision of
    // minhash_dedup's candidate pairs against exact Jaccard ≥ 0.4
    // ground truth, restricted to the deterministic doc_id < 100
    // sample (all-pairs ground truth is only computable on a bounded
    // sample — the standard index-eval pattern). Composes the live
    // minhash_dedup query; the oracle composes its SQL.
    "lsh_recall_eval" -> ((s, d) =>
      recallEvalAgainst(s, d, LlmQueries.defs("minhash_dedup")(s, d))),

    // The same harness graded against the SimHash pairing — the two
    // candidate generators share ONE ground-truth definition, so
    // their recall numbers are directly comparable.
    "simhash_recall_eval" -> ((s, d) =>
      recallEvalAgainst(s, d, LlmQueries.defs("simhash_neardup")(s, d))),

    // DSIR importance RESAMPLING (the second half of Xie et al. 2023
    // that dsir_select's scoring stops short of): keep probability
    // min(1, w/2), realized as a deterministic md5 draw per doc_id
    // against the weight's basis-point threshold. Composes the live
    // dsir_select query (one extra projection — the ratio table and
    // both stats passes are inherited, not recomputed).
    "importance_resample" -> ((s, d) => {
      import s.implicits._
      CorpusOpsQueries.defs("dsir_select")(s, d)
        .select($"doc_id", rnd($"w", 6).as("w"),
          (hexBucket(md5(concat(lit("resample:"), $"doc_id".cast("string"))), 8)
            % 10000L).as("draw"),
          floor(least(lit(1.0), $"w" * 0.5) * 10000.0 + 0.5).cast("long")
            .as("keep_bp"))
        .withColumn("kept", $"draw" < $"keep_bp")
        .orderBy($"doc_id")
    }),

    // Curation attrition funnel: each doc attributed to the FIRST
    // stage that rejects it (language-ID unknown → too short →
    // quality floor → kept), with doc/token mass per stage — one
    // scan, one 4-row aggregate. Stage names carry their order so
    // the output sorts as the funnel reads.
    "curation_funnel" -> ((s, d) => {
      import s.implicits._
      val staged = Tables.documents(s, d)
        .select(
          when(TF.langIdHeuristic($"text") === "unknown", "1_lang")
            .when(TF.nTokens($"text") < 16, "2_short")
            .when(TF.qualityScore($"text") < 0.2, "3_quality")
            .otherwise("4_kept").as("stage"),
          TF.nTokens($"text").cast("long").as("n_tok"))
      val tot = staged.agg(count(lit(1)).as("n_total"))
      staged.groupBy($"stage")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tok"))
        .crossJoin(broadcast(tot))
        .select($"stage", $"n_docs", $"n_tok",
          rnd($"n_docs".cast("double") / $"n_total".cast("double"), 6)
            .as("share"))
        .orderBy($"stage")
    }),

    // Per-label embedding outlier audit: distance² to the label
    // centroid, z-scored within the label — the mislabeled-vector /
    // noise-vector signal a SemDeDup-style pipeline inspects before
    // clustering. Centroids (labels × 64 rows) and stats (labels
    // rows) broadcast; top-20 by |z| is a TakeOrdered.
    "embedding_outliers" -> ((s, d) => {
      import s.implicits._
      val dims = Tables.embeddings(s, d)
        .select($"vec_id", $"label", posexplode($"embedding").as(Seq("pos", "xv")))
        .select($"vec_id", $"label", $"pos", $"xv".cast("double").as("x"))
      val cents = dims.groupBy($"label", $"pos")
        .agg((sum($"x".cast("decimal(18,8)")).cast("double") / count(lit(1)))
          .as("cv"))
      val d2 = dims.join(broadcast(cents), Seq("label", "pos"))
        .groupBy($"vec_id", $"label")
        .agg(sum(rnd(($"x" - $"cv") * ($"x" - $"cv"), 12).cast("decimal(28,12)"))
          .cast("double").as("d2raw"))
        .select($"vec_id", $"label", rnd($"d2raw", 6).as("d2"))
      val st = d2.groupBy($"label")
        .agg(count(lit(1)).as("n"),
          sum($"d2".cast("decimal(18,6)")).cast("double").as("sd"),
          sum(rnd($"d2" * $"d2", 8).cast("decimal(28,8)")).cast("double")
            .as("sdd"))
        .select($"label", ($"sd" / $"n".cast("double")).as("mean"),
          sqrt(greatest(($"sdd" / $"n".cast("double")) -
            (($"sd" / $"n".cast("double")) * ($"sd" / $"n".cast("double"))),
            lit(0.0))).as("std"))
      d2.join(broadcast(st), Seq("label"))
        .select($"vec_id", $"label", $"d2",
          when($"std" === 0.0, 0.0)
            .otherwise(rnd(($"d2" - $"mean") / $"std", 4)).as("z"))
        .orderBy(abs($"z").desc, $"vec_id")
        .limit(20)
    }),

    // Source-mix drift between the doc_id-parity halves of the corpus
    // — the ingest canary: a source whose share moved between halves
    // signals a crawl/backfill composition change. One scan, one
    // source-keyed aggregate, 2-row totals broadcast.
    "mixture_drift" -> ((s, d) => {
      import s.implicits._
      val cnt = Tables.documents(s, d)
        .select($"source", (pmod($"doc_id", lit(2L)) === 0L).as("even"))
        .groupBy($"source")
        .agg(sum(when($"even", 1L).otherwise(0L)).as("n_even"),
          sum(when(!$"even", 1L).otherwise(0L)).as("n_odd"))
      val tot = cnt.agg(sum($"n_even").as("t_even"), sum($"n_odd").as("t_odd"))
      cnt.crossJoin(broadcast(tot))
        .select($"source", $"n_even", $"n_odd",
          rnd($"n_even".cast("double") / $"t_even".cast("double"), 6)
            .as("p_even"),
          rnd($"n_odd".cast("double") / $"t_odd".cast("double"), 6)
            .as("p_odd"),
          rnd(abs($"n_even".cast("double") / $"t_even".cast("double") -
            $"n_odd".cast("double") / $"t_odd".cast("double")), 6).as("drift"))
        .orderBy($"source".asc_nulls_last)
    }),

    // Best-first per-source selection under a token budget: rank by
    // quality (doc_id tiebreak), keep docs that START before the
    // budget is exhausted. The exact running sum is computed
    // skew-free via DistributedNtile.withRunningSum — range
    // partitioning + broadcast carry, never a per-source
    // single-partition sort.
    "token_budget_trim" -> ((s, d) => {
      import s.implicits._
      val base = Tables.documents(s, d)
        .select($"source", $"doc_id",
          TF.nTokens($"text").cast("long").as("n_tok"),
          TF.qualityScore($"text").as("q"))
      val ranked = graft.operators.DistributedNtile.withRunningSum(
        base, "source", Seq($"q".desc, $"doc_id"), $"n_tok", "cum")
      ranked
        .withColumn("kept", $"cum" - $"n_tok" < BudgetTok)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("tok_total"),
          sum(when($"kept", 1L).otherwise(0L)).as("n_kept"),
          sum(when($"kept", $"n_tok").otherwise(0L)).as("tok_kept"))
        // null-ridden corpora: the null-source stratum must sort
        // where DuckDB puts it (NULLS LAST)
        .orderBy($"source".asc_nulls_last)
    }),

    // Empirical-Bayes beta-binomial shrinkage of per-source junk
    // rates (method-of-moments prior — the standard stabilizer for
    // small-source rate estimates before domain_cap / source_mix
    // decisions act on them). Scale shape: ONE corpus scan → a
    // |sources|-bounded (n, x) aggregate; everything after runs on
    // that bounded relation (two scalar aggregates broadcast back).
    // Rates are SCALED-INTEGER divisions ((x·10⁹) DIV n — exact,
    // identical cross-engine; x·10⁹ fits long up to ~9.2e9 junk
    // docs per source), the prior moments stay in exact integers /
    // decimals until one fixed IEEE sequence per source, and v = 0
    // or a non-positive concentration degenerates to the raw rate
    // (alpha/beta null) — mirrored.
    "eb_shrinkage" -> ((s, d) => {
      import s.implicits._
      // memoized: the |sources|-bounded cell table has three
      // consumers (prior mean, prior variance, the final select) —
      // cached it costs ONE corpus scan; bounded, so never released
      // (the emd_cells rule)
      val per = LlmQueries.memoized(s, d, "eb_cells") {
        Tables.documents(s, d)
          .groupBy($"source")
          .agg(count(lit(1)).as("n"),
            sum(when($"n_chars" < 200L, 1L).otherwise(0L)).as("x"))
          .withColumn("rs", expr("(x * CAST(1000000000 AS BIGINT)) DIV n"))
      }
      val mv = per
        .agg(count(lit(1)).as("k"), sum($"rs").as("srs"))
        .withColumn("ms", expr("srs DIV k"))
        .select($"k", $"ms")
      val vv = per.crossJoin(broadcast(mv))
        .groupBy($"k", $"ms")
        .agg(sum((($"rs" - $"ms") * ($"rs" - $"ms")).cast("decimal(38,0)"))
          .as("vnum"))
      val prior = vv.select(
          ($"ms".cast("double") / lit(1.0e9)).as("m"),
          (($"vnum".cast("double") / $"k".cast("double")) / lit(1.0e18))
            .as("v"))
        .withColumn("c", when($"v" > lit(0.0),
          ($"m" * (lit(1.0) - $"m")) / $"v" - lit(1.0)))
      per.crossJoin(broadcast(prior))
        .select($"source", $"n", $"x",
          rnd($"x".cast("double") / $"n".cast("double"), 6).as("raw_rate"),
          when($"c" > lit(0.0), rnd($"m" * $"c", 6)).as("alpha"),
          when($"c" > lit(0.0), rnd((lit(1.0) - $"m") * $"c", 6)).as("beta"),
          when($"c" > lit(0.0),
            rnd(($"x".cast("double") + $"m" * $"c") /
              ($"n".cast("double") + $"c"), 6))
            .otherwise(rnd($"x".cast("double") / $"n".cast("double"), 6))
            .as("shrunk"))
        .orderBy($"source".asc_nulls_last)
    }),

    // Noised count release in the discrete-Laplace shape (the
    // two-sided-geometric mechanism DP count releases use): noise =
    // G₁ − G₂ with each Gᵢ a geometric(1/2) read off the TRAILING
    // ZERO BITS of a 32-bit key-derived hash — tz(x) = bit_count(
    // (x & -x) − 1), exact integer, codegen'd, identical
    // cross-engine. DETERMINISM CAVEAT (by design, stated): hash-
    // derived noise makes the release REPRODUCIBLE pipeline plumbing
    // for tests and diffs; an actual privacy deployment must swap in
    // true randomness — the mechanism's shape, not its entropy
    // source, is what this operator pins. Scale: one corpus scan →
    // |sources|-bounded aggregate; the noise is a projection.
    "dp_noise_counts" -> ((s, d) => {
      import s.implicits._
      def tz(tag: String) = {
        val h = conv(substring(md5(concat(lit(tag),
          coalesce($"source", lit("__null__")))), 1, 8), 16, 10)
          .cast("long")
        when(h === 0L, lit(32L))
          .otherwise(bit_count(h.bitwiseAND(-h) - 1).cast("long"))
      }
      Tables.documents(s, d)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_true"))
        .select($"source", $"n_true", tz("dpa:").as("g_a"), tz("dpb:").as("g_b"))
        .select($"source", $"n_true", $"g_a", $"g_b",
          ($"g_a" - $"g_b").as("noise"),
          ($"n_true" + $"g_a" - $"g_b").as("n_released"))
        .orderBy($"source".asc_nulls_last)
    }),

    // k-anonymity / l-diversity audit over the customer dimension
    // (wave 55; Sweeney 2002, Machanavajjhala 2007): the release
    // check a privacy reviewer runs BEFORE dp_noise_counts ever
    // publishes — group sizes over the quasi-identifier pair
    // (nation, market segment) give k (the smallest crowd any row
    // hides in), distinct account-balance bands per group give l
    // (whether the crowd also varies on the sensitive attribute).
    // One dimension-table aggregate to a ≤|nations|·|segments| group
    // relation; the global k/l/risk-fraction readout broadcasts back
    // onto it (kruskal readout convention). NULL QI values form
    // honest sentinel levels (a NULL segment is still a disclosure
    // class); NULL balances get a sentinel band so they count as one
    // distinct sensitive value, not zero. The balance band is
    // floor(acctbal/1000) — the same IEEE divide+floor in both
    // engines.
    "k_anonymity" -> ((s, d) => {
      import s.implicits._
      val cust = Tables.customer(s, d)
        .select(coalesce($"c_nationkey", lit(-1)).as("nationkey"),
          coalesce($"c_mktsegment", lit("__null__")).as("mktsegment"),
          when($"c_acctbal".isNull, lit(-999999L))
            .otherwise(floor($"c_acctbal" / lit(1000.0))).as("bal_bucket"))
      val grp = cust.groupBy($"nationkey", $"mktsegment").agg(
        count(lit(1)).as("n"),
        countDistinct($"bal_bucket").as("l_div"))
      val glob = grp.agg(min($"n").as("k_anon"), min($"l_div").as("l_min"),
        count(lit(1)).as("n_groups"), sum($"n").as("n_rows"),
        sum(when($"n" < KAnonThresh, $"n").otherwise(0L)).as("rows_risky"))
      grp.crossJoin(broadcast(glob))
        .select($"nationkey", $"mktsegment", $"n", $"l_div",
          ($"n" < KAnonThresh).as("risky"),
          $"k_anon", $"l_min", $"n_groups", $"n_rows",
          rnd($"rows_risky".cast("double") / $"n_rows".cast("double"), 6)
            .as("frac_risky"))
        .orderBy($"nationkey", $"mktsegment")
    }),

    // Cohen's kappa between the declared language metadata and the
    // n-gram language detector (wave 57; Cohen 1960): chance-corrected
    // agreement — the QA number that separates "the detector mostly
    // agrees with the metadata" from "they agree no more than two
    // random labelers would". One documents scan to the confusion
    // matrix (bounded ≤|langs|² relation); p_o from the exact integer
    // diagonal, p_e from exact decimal marginal products, and κ =
    // (p_o − p_e)/(1 − p_e) recomputed from the SNAPPED p_o/p_e so
    // both engines divide identical doubles. No transcendental
    // anywhere. NULL metadata forms an honest '__null__' class (it
    // can only agree with nothing — exactly the disagreement a QA
    // reviewer wants counted).
    "cohens_kappa" -> ((s, d) => {
      import s.implicits._
      val pairs = Tables.documents(s, d).select(
        coalesce($"lang", lit("__null__")).as("a"),
        TF.langIdHeuristic($"text").as("b"))
      val cm = pairs.groupBy($"a", $"b").agg(count(lit(1)).as("c"))
      val ra = cm.groupBy($"a").agg(sum($"c").as("ra"))
      val cb = cm.groupBy($"b").agg(sum($"c").as("cb"))
      val nn = cm.agg(sum($"c").as("nn"))
      val diag = cm.filter($"a" === $"b")
        .agg(coalesce(sum($"c"), lit(0L)).as("diag"))
      val pe = ra.join(cb, $"a" === $"b")
        .agg(coalesce(
          sum($"ra".cast("decimal(19,0)") * $"cb".cast("decimal(19,0)")),
          lit(0).cast("decimal(38,0)")).as("s_pe"))
      nn.crossJoin(broadcast(diag)).crossJoin(broadcast(pe))
        .select($"nn".as("n"), $"diag",
          ($"diag".cast("double") / $"nn".cast("double")).as("po0"),
          ($"s_pe".cast("double") /
            ($"nn".cast("double") * $"nn".cast("double"))).as("pe0"))
        .select($"n", $"diag",
          rnd($"po0", 6).as("po"), rnd($"pe0", 6).as("pe"))
        .select($"n", $"diag", $"po", $"pe",
          when(lit(1.0) - $"pe" <= 0.0, lit(null).cast("double"))
            .otherwise(rnd(($"po" - $"pe") / (lit(1.0) - $"pe"), 6))
            .as("kappa"))
    }),

    // Sample-ratio-mismatch check on the train/val/test splitter
    // (wave 58; the SRM chi-square every experimentation platform
    // runs before trusting a bucketed readout — Fabijan et al. 2019):
    // recomputes split_assign's md5 bucket assignment (the same pure
    // row-key function), counts per split, and tests the observed
    // counts against the declared 90/5/5 contract with a χ²
    // goodness-of-fit at df = 2. Counts are exact integers; expected
    // counts and per-split (o−e)²/e terms are pinned IEEE on shared
    // ratio literals, 8dp-snapped and decimal-summed over the 3-row
    // grid (built from a literal split table, so a split with ZERO
    // rows still contributes its full expectation). One scan, one
    // 3-row aggregate.
    "srm_check" -> ((s, d) => {
      import s.implicits._
      val bucket = conv(
        substring(md5(concat(lit("split:"), $"doc_id".cast("string"))),
          1, 8), 16, 10).cast("long") % 100
      val counts = Tables.documents(s, d)
        .select(when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test").as("split"))
        .groupBy($"split").agg(count(lit(1)).as("n"))
      val ratios = SrmRatios.toDF("split", "ratio")
      val tot = counts.agg(coalesce(sum($"n"), lit(0L)).as("nt"))
      val grid = ratios.join(counts, Seq("split"), "left")
        .withColumn("n", coalesce($"n", lit(0L)))
        .crossJoin(broadcast(tot))
      val e = $"nt".cast("double") * $"ratio"
      val term = rnd(($"n".cast("double") - e) * ($"n".cast("double") - e)
        / e, 8).cast("decimal(38,8)")
      val chi = grid.agg(sum(when($"nt" > 0L, term)).cast("double")
        .as("chi0"), max($"nt").as("ntg"))
        .select(when($"ntg" > 0L, rnd($"chi0", 6)).as("chi2"))
      grid.crossJoin(broadcast(chi))
        .select($"split", $"n", $"ratio",
          when($"nt" > 0L, rnd(e, 4)).as("expected"),
          $"nt".as("n_total"), $"chi2",
          ($"chi2" > lit(SrmCrit)).as("srm_flag"))
        .orderBy($"split")
    })
  )

  /** split_assign's declared 90/5/5 contract as (split, ratio) rows —
    * the srm_check expectation table, mirrored in the oracle. Ratio
    * doubles are embedded via shortest round-trip repr.
    */
  private val SrmRatios: Seq[(String, Double)] =
    Seq(("test", 0.05), ("train", 0.90), ("val", 0.05))

  /** SRM rejection line: χ²₂ 0.95 quantile = −2·ln(0.05) (df = 2 for
    * three splits). Shared literal with the oracle.
    */
  private val SrmCrit: Double = -2.0 * math.log(0.05)

  /** k-anonymity "small crowd" threshold: groups under this size are
    * flagged risky and their row mass feeds frac_risky. Mirrored in
    * the oracle.
    */
  private val KAnonThresh = 5L


  import LlmQueries.{NORM, NTOK, TOKS, duckShingleCtes, duckQuality, duckLangCase}

  /** The recall-eval oracle parameterized by the candidate
    * generator's own oracle SQL (spliced verbatim — the composition
    * guarantee on the DuckDB side).
    */
  private def duckRecallEval(candidateSql: String): String =
    s"""WITH $duckShingleCtes,
       |ds AS (SELECT DISTINCT doc_id, s FROM
       |  (SELECT doc_id, unnest(sh) AS s FROM sh) t WHERE doc_id < $SampleN),
       |sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
       |it AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
       |  FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |tp AS (SELECT da, db FROM it
       |  JOIN sz sa ON it.da = sa.doc_id JOIN sz sb ON it.db = sb.doc_id
       |  WHERE CAST(ni AS DOUBLE) / CAST(sa.n + sb.n - ni AS DOUBLE)
       |    >= $JaccThresh),
       |cd AS (SELECT doc_a, doc_b FROM ($candidateSql) c
       |  WHERE doc_a < $SampleN AND doc_b < $SampleN),
       |ag AS (SELECT
       |  (SELECT count(*) FROM tp) AS n_true,
       |  (SELECT count(*) FROM cd) AS n_cand,
       |  (SELECT count(*) FROM tp JOIN cd
       |    ON tp.da = cd.doc_a AND tp.db = cd.doc_b) AS n_hit)
       |SELECT n_true, n_cand, n_hit,
       |  CASE WHEN n_true = 0 THEN 1.0
       |    ELSE CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE) END AS recall,
       |  CASE WHEN n_cand = 0 THEN 1.0
       |    ELSE CAST(n_hit AS DOUBLE) / CAST(n_cand AS DOUBLE) END AS prec
       |FROM ag""".stripMargin

  val oracles: Map[String, String] = Map(

    // same jacc formula as ngram_jaccard's oracle (list-intersection
    // form keeps zero-overlap candidates naturally), same banding,
    // same md5-rank sample rule (identical BIGINT arithmetic, dormant
    // below the cap)
    "jaccard_band_sweep" ->
      s"""WITH ${LlmQueries.duckCandidateCtes},
         |ct AS (SELECT count(*) AS n_total FROM cand),
         |cs AS (SELECT doc_a, doc_b FROM cand, ct
         |  WHERE ('0x' || substr(md5(doc_a::VARCHAR || '|' || doc_b::VARCHAR),
         |      1, 8))::BIGINT * n_total < $PairSampleCap * 4294967296),
         |j AS (SELECT
         |  CAST(len(list_filter(list_distinct(sa.sh), x -> list_contains(sb.sh, x))) AS DOUBLE)
         |   / (len(list_distinct(sa.sh)) + len(list_distinct(sb.sh))
         |      - len(list_filter(list_distinct(sa.sh), x -> list_contains(sb.sh, x)))) AS jacc
         | FROM cs c
         |  JOIN sh sa ON sa.doc_id = c.doc_a
         |  JOIN sh sb ON sb.doc_id = c.doc_b),
         |b AS (SELECT CAST(floor(jacc * 10) AS INTEGER) AS band,
         |  count(*) AS n_pairs FROM j GROUP BY band)
         |SELECT band, n_pairs,
         | CAST(sum(n_pairs) OVER (ORDER BY band DESC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |   AS cum_ge,
         | (SELECT n_total FROM ct) > $PairSampleCap AS sampled
         |FROM b ORDER BY band""".stripMargin,

    // composes the lang_id oracle's CASE verbatim — one definition
    // of the classifier under evaluation
    "classifier_eval" ->
      s"""WITH p AS (SELECT lang AS truth, ${LlmQueries.duckLangCase} AS pred
         |           FROM documents),
         |cm AS (SELECT truth, pred, count(*) AS n FROM p GROUP BY truth, pred),
         |rowt AS (SELECT truth AS cls, CAST(sum(n) AS BIGINT) AS n_true
         |         FROM cm GROUP BY truth),
         |colt AS (SELECT pred AS cls, CAST(sum(n) AS BIGINT) AS n_pred
         |         FROM cm GROUP BY pred),
         |diag AS (SELECT truth AS cls, n AS tp FROM cm WHERE truth = pred)
         |SELECT cls,
         | coalesce(n_true, 0) AS n_true,
         | coalesce(n_pred, 0) AS n_pred,
         | CAST(coalesce(tp, 0) AS BIGINT) AS tp,
         | CASE WHEN coalesce(n_pred, 0) = 0 THEN 0.0
         |      ELSE ${Q.duckRnd(
             "CAST(coalesce(tp, 0) AS DOUBLE) / CAST(n_pred AS DOUBLE)", 6)}
         |   END AS precision,
         | CASE WHEN coalesce(n_true, 0) = 0 THEN 0.0
         |      ELSE ${Q.duckRnd(
             "CAST(coalesce(tp, 0) AS DOUBLE) / CAST(n_true AS DOUBLE)", 6)}
         |   END AS recall
         |FROM rowt FULL JOIN colt USING (cls) LEFT JOIN diag USING (cls)
         |ORDER BY cls""".stripMargin,

    // ground truth + composed candidate SQL, same sample bound — one
    // truth block (duckRecallEval) for both generators
    "lsh_recall_eval" ->
      duckRecallEval(LlmQueries.oracles("minhash_dedup")),

    "simhash_recall_eval" ->
      duckRecallEval(LlmQueries.oracles("simhash_neardup")),

    // composed dsir_select SQL + the same md5 draw and bp threshold
    "importance_resample" ->
      s"""WITH ds AS (SELECT * FROM (${CorpusOpsQueries.oracles("dsir_select")}) t)
         |SELECT doc_id, ${Q.duckRnd("w", 6)} AS w,
         |  ('0x' || substr(md5('resample:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         |    % 10000 AS draw,
         |  CAST(floor(least(1.0, w * 0.5) * 10000.0 + 0.5) AS BIGINT) AS keep_bp,
         |  (('0x' || substr(md5('resample:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         |    % 10000) < CAST(floor(least(1.0, w * 0.5) * 10000.0 + 0.5) AS BIGINT)
         |    AS kept
         |FROM ds ORDER BY doc_id""".stripMargin,

    // same stage predicates in the same precedence
    "curation_funnel" ->
      s"""WITH st AS (SELECT
         |  CASE WHEN ($duckLangCase) = 'unknown' THEN '1_lang'
         |       WHEN $NTOK < 16 THEN '2_short'
         |       WHEN ($duckQuality) < 0.2 THEN '3_quality'
         |       ELSE '4_kept' END AS stage,
         |  CAST($NTOK AS BIGINT) AS n_tok
         |  FROM documents),
         |tot AS (SELECT count(*) AS n_total FROM st)
         |SELECT stage, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tok,
         |  ${Q.duckRnd("CAST(count(*) AS DOUBLE) / CAST(any_value(t.n_total) AS DOUBLE)", 6)}
         |    AS share
         |FROM st, tot t GROUP BY stage ORDER BY stage""".stripMargin,

    // same decimal centroid means, same snapped d2, same z op order
    "embedding_outliers" ->
      s"""WITH dm AS (SELECT vec_id, label,
         |    generate_subscripts(embedding, 1) - 1 AS pos,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |c AS (SELECT label, pos,
         |    CAST(sum(CAST(x AS DECIMAL(18,8))) AS DOUBLE) / count(*) AS cv
         |  FROM dm GROUP BY label, pos),
         |d AS (SELECT vec_id, dm.label,
         |    ${Q.duckRnd(
               s"CAST(sum(CAST(${Q.duckRnd("(x - cv) * (x - cv)", 12)}" +
                 " AS DECIMAL(28,12))) AS DOUBLE)", 6)} AS d2
         |  FROM dm JOIN c ON dm.label = c.label AND dm.pos = c.pos
         |  GROUP BY vec_id, dm.label),
         |s AS (SELECT label, count(*) AS n,
         |    CAST(sum(CAST(d2 AS DECIMAL(18,6))) AS DOUBLE) AS sd,
         |    CAST(sum(CAST(${Q.duckRnd("d2 * d2", 8)} AS DECIMAL(28,8)))
         |      AS DOUBLE) AS sdd
         |  FROM d GROUP BY label),
         |st AS (SELECT label, sd / CAST(n AS DOUBLE) AS mean,
         |    sqrt(greatest((sdd / CAST(n AS DOUBLE)) -
         |      ((sd / CAST(n AS DOUBLE)) * (sd / CAST(n AS DOUBLE))), 0.0))
         |      AS std
         |  FROM s)
         |SELECT vec_id, d.label, d2,
         |  CASE WHEN std = 0.0 THEN 0.0
         |    ELSE ${Q.duckRnd("(d2 - mean) / std", 4)} END AS z
         |FROM d JOIN st ON d.label = st.label
         |ORDER BY abs(CASE WHEN std = 0.0 THEN 0.0
         |  ELSE ${Q.duckRnd("(d2 - mean) / std", 4)} END) DESC, vec_id
         |LIMIT 20""".stripMargin,

    // same parity split, same ratio op order
    "mixture_drift" ->
      s"""WITH c AS (SELECT source,
         |    sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_even,
         |    sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS n_odd
         |  FROM documents GROUP BY source),
         |t AS (SELECT sum(n_even) AS t_even, sum(n_odd) AS t_odd FROM c)
         |SELECT source, CAST(n_even AS BIGINT) AS n_even,
         |  CAST(n_odd AS BIGINT) AS n_odd,
         |  ${Q.duckRnd("CAST(n_even AS DOUBLE) / CAST(t_even AS DOUBLE)", 6)}
         |    AS p_even,
         |  ${Q.duckRnd("CAST(n_odd AS DOUBLE) / CAST(t_odd AS DOUBLE)", 6)}
         |    AS p_odd,
         |  ${Q.duckRnd(
             "abs(CAST(n_even AS DOUBLE) / CAST(t_even AS DOUBLE)" +
               " - CAST(n_odd AS DOUBLE) / CAST(t_odd AS DOUBLE))", 6)} AS drift
         |FROM c, t ORDER BY source""".stripMargin,

    // same rank order, same ROWS-frame running sum, same budget
    "token_budget_trim" ->
      s"""WITH b AS (SELECT source, doc_id, CAST($NTOK AS BIGINT) AS n_tok,
         |    $duckQuality AS q FROM documents),
         |r AS (SELECT source, n_tok, sum(n_tok) OVER (PARTITION BY source
         |    ORDER BY q DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM b)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS tok_total,
         |  CAST(sum(CASE WHEN cum - n_tok < $BudgetTok THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN cum - n_tok < $BudgetTok THEN n_tok ELSE 0 END)
         |    AS BIGINT) AS tok_kept
         |FROM r GROUP BY source ORDER BY source""".stripMargin,

    // same scaled-integer rates, same method-of-moments prior, same
    // degenerate fallback
    "eb_shrinkage" ->
      """WITH per AS (SELECT source, count(*) AS n,
        |    CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS x
        |  FROM documents GROUP BY source),
        |rs AS (SELECT source, n, x, (x * 1000000000) // n AS rs FROM per),
        |mv AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(rs) AS BIGINT) AS srs FROM rs),
        |ms AS (SELECT k, srs // k AS ms FROM mv),
        |vv AS (SELECT k, ms,
        |    CAST(sum(CAST((r.rs - ms) * (r.rs - ms) AS DECIMAL(38,0)))
        |      AS DECIMAL(38,0)) AS vnum
        |  FROM rs r CROSS JOIN ms GROUP BY k, ms),
        |pr AS (SELECT CAST(ms AS DOUBLE) / 1000000000.0 AS m,
        |    (CAST(vnum AS DOUBLE) / CAST(k AS DOUBLE))
        |      / 1000000000000000000.0 AS v
        |  FROM vv),
        |pc AS (SELECT m, v, CASE WHEN v > 0.0
        |    THEN (m * (1.0 - m)) / v - 1.0 ELSE NULL END AS c FROM pr)
        |SELECT source, n, x,
        |  floor(CAST(x AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS raw_rate,
        |  CASE WHEN c > 0.0
        |    THEN floor(m * c * 1000000.0 + 0.5) / 1000000.0 END AS alpha,
        |  CASE WHEN c > 0.0
        |    THEN floor((1.0 - m) * c * 1000000.0 + 0.5) / 1000000.0
        |    END AS beta,
        |  CASE WHEN c > 0.0
        |    THEN floor((CAST(x AS DOUBLE) + m * c)
        |      / (CAST(n AS DOUBLE) + c) * 1000000.0 + 0.5) / 1000000.0
        |    ELSE floor(CAST(x AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0
        |      + 0.5) / 1000000.0 END AS shrunk
        |FROM rs CROSS JOIN pc ORDER BY source""".stripMargin,

    // same 32-bit hash keys, same trailing-zero geometric read, same
    // two-sided difference
    "dp_noise_counts" ->
      """WITH c AS (SELECT source, count(*) AS n_true FROM documents
        |  GROUP BY source),
        |h AS (SELECT source, n_true,
        |  ('0x' || substr(md5('dpa:' || coalesce(source, '__null__')),
        |    1, 8))::BIGINT AS ha,
        |  ('0x' || substr(md5('dpb:' || coalesce(source, '__null__')),
        |    1, 8))::BIGINT AS hb
        | FROM c),
        |g AS (SELECT source, n_true,
        |  CASE WHEN ha = 0 THEN CAST(32 AS BIGINT)
        |    ELSE CAST(bit_count((ha & (-ha)) - 1) AS BIGINT) END AS g_a,
        |  CASE WHEN hb = 0 THEN CAST(32 AS BIGINT)
        |    ELSE CAST(bit_count((hb & (-hb)) - 1) AS BIGINT) END AS g_b
        | FROM h)
        |SELECT source, n_true, g_a, g_b, g_a - g_b AS noise,
        |  n_true + g_a - g_b AS n_released
        |FROM g ORDER BY source""".stripMargin,

    "k_anonymity" ->
      s"""WITH cust AS (SELECT coalesce(c_nationkey, -1) AS nationkey,
         |    coalesce(c_mktsegment, '__null__') AS mktsegment,
         |    CASE WHEN c_acctbal IS NULL THEN -999999
         |      ELSE CAST(floor(c_acctbal / 1000.0) AS BIGINT) END
         |      AS bal_bucket
         |  FROM customer),
         |grp AS (SELECT nationkey, mktsegment, count(*) AS n,
         |    CAST(count(DISTINCT bal_bucket) AS BIGINT) AS l_div
         |  FROM cust GROUP BY nationkey, mktsegment),
         |gstats AS (SELECT CAST(min(n) AS BIGINT) AS k_anon,
         |    CAST(min(l_div) AS BIGINT) AS l_min,
         |    count(*) AS n_groups, CAST(sum(n) AS BIGINT) AS n_rows,
         |    CAST(sum(CASE WHEN n < $KAnonThresh THEN n ELSE 0 END)
         |      AS BIGINT) AS rows_risky
         |  FROM grp)
         |SELECT nationkey, mktsegment, n, l_div,
         |  n < $KAnonThresh AS risky,
         |  k_anon, l_min, n_groups, n_rows,
         |  ${Q.duckRnd(
        "CAST(rows_risky AS DOUBLE) / CAST(n_rows AS DOUBLE)", 6)}
         |    AS frac_risky
         |FROM grp CROSS JOIN gstats
         |ORDER BY nationkey, mktsegment""".stripMargin,

    "cohens_kappa" ->
      s"""WITH pairs AS (SELECT coalesce(lang, '__null__') AS a,
         |    $duckLangCase AS b
         |  FROM documents),
         |cm AS (SELECT a, b, count(*) AS c FROM pairs GROUP BY a, b),
         |ra AS (SELECT a, CAST(sum(c) AS BIGINT) AS ra FROM cm GROUP BY a),
         |cb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cm GROUP BY b),
         |nn AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cm),
         |diag AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS diag
         |  FROM cm WHERE a = b),
         |pe AS (SELECT coalesce(
         |    sum(CAST(ra.ra AS DECIMAL(19,0)) * CAST(cb.cb AS DECIMAL(19,0))),
         |    CAST(0 AS DECIMAL(38,0))) AS s_pe
         |  FROM ra JOIN cb ON ra.a = cb.b),
         |asm AS (SELECT nn AS n, diag,
         |    CAST(diag AS DOUBLE) / CAST(nn AS DOUBLE) AS po0,
         |    CAST(s_pe AS DOUBLE)
         |      / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)) AS pe0
         |  FROM nn CROSS JOIN diag CROSS JOIN pe),
         |sn AS (SELECT n, diag, ${Q.duckRnd("po0", 6)} AS po,
         |    ${Q.duckRnd("pe0", 6)} AS pe
         |  FROM asm)
         |SELECT n, diag, po, pe,
         |  CASE WHEN 1.0 - pe <= 0.0 THEN NULL
         |    ELSE ${Q.duckRnd("(po - pe) / (1.0 - pe)", 6)} END AS kappa
         |FROM sn""".stripMargin,

    "srm_check" -> {
      val ratioRows = SrmRatios.map { case (sp, r) =>
        s"('$sp', CAST('${java.lang.Double.toString(r)}' AS DOUBLE))"
      }.mkString(", ")
      val crit = s"CAST('${java.lang.Double.toString(SrmCrit)}' AS DOUBLE)"
      s"""WITH b AS (SELECT
         |    ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
         |      1, 8))::BIGINT % 100 AS bkt
         |  FROM documents),
         |counts AS (SELECT CASE WHEN bkt < 90 THEN 'train'
         |    WHEN bkt < 95 THEN 'val' ELSE 'test' END AS split,
         |    count(*) AS n
         |  FROM b GROUP BY 1),
         |ratios AS (SELECT * FROM (VALUES $ratioRows) v(split, ratio)),
         |tot AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS nt
         |  FROM counts),
         |grid AS (SELECT r.split, coalesce(c.n, 0) AS n, r.ratio, t.nt
         |  FROM ratios r LEFT JOIN counts c ON r.split = c.split
         |  CROSS JOIN tot t),
         |chi AS (SELECT CASE WHEN max(nt) > 0 THEN ${Q.duckRnd(
        "CAST(sum(CASE WHEN nt > 0 THEN CAST(" +
          Q.duckRnd(
            "(CAST(n AS DOUBLE) - CAST(nt AS DOUBLE) * ratio)" +
              " * (CAST(n AS DOUBLE) - CAST(nt AS DOUBLE) * ratio)" +
              " / (CAST(nt AS DOUBLE) * ratio)", 8) +
          " AS DECIMAL(38,8)) END) AS DOUBLE)", 6)} END AS chi2
         |  FROM grid)
         |SELECT split, n, ratio,
         |  CASE WHEN nt > 0 THEN ${Q.duckRnd(
        "CAST(nt AS DOUBLE) * ratio", 4)} END AS expected,
         |  nt AS n_total, chi2, chi2 > $crit AS srm_flag
         |FROM grid CROSS JOIN chi ORDER BY split""".stripMargin
    }
  )
}
