package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => TF}
import graft.operators.DistributedNtile
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Fourteenth wave — the ML-side prep a training-data pipeline runs
  * after curation (SURVEY.md §2.11 extensions): deterministic epoch
  * shuffling, T5-style span-corruption accounting, PMI collocations,
  * cross-document boilerplate detection, vocabulary coverage, a
  * closed-form linear probe, distributed PCA power iteration, and an
  * ANN-recall evaluation harness over the existing index paths.
  *
  * Scale/perf design:
  *  - `epoch_shuffle` proves the training order without materializing
  *    it: the order signature is a SUM of positional hashes (rank is
  *    hashed into each term), so it is order-sensitive in value but
  *    order-free in aggregation — no `collect_list` of a corpus-sized
  *    shard, no single-partition sort. The per-shard rank window is
  *    partitioned by shard (distributed).
  *  - `span_corruption` derives mask membership from md5(doc_id, pos)
  *    — reproducible under any partitioning — and resolves span
  *    overlap relationally (window max over 2 preceding rows) instead
  *    of a sequential greedy scan.
  *  - `collocation_pmi` keeps everything in counts until one fixed
  *    IEEE op sequence per surviving bigram; the global top-k is a
  *    TakeOrdered (per-partition heaps), not a global sort.
  *  - `boilerplate_ngrams` rides the memoized distinct-shingle
  *    relation (built once per session/dir, released after
  *    ngram_novelty per BenchShared's schedule): one shingle-keyed df
  *    aggregate + one doc-keyed join back — both linear.
  *  - `linear_probe` is closed-form distributed OLS: ONE pass
  *    accumulates the 3×3 normal-equation moments as decimal-snapped
  *    sums (order-independent), then Cramer's rule runs on the single
  *    result row. No gradient loop, no driver-side math.
  *  - `pca_power` is the canonical distributed power iteration:
  *    each of 2 iterations is two keyed aggregates over the
  *    posexploded corpus (rows ∝ N·dim) against a broadcast 64-row
  *    direction vector; the normalizer stays in-plan via a broadcast
  *    1-row cross join — no collect.
  *  - `ann_recall_eval` composes the existing knn_bruteforce and
  *    knn_ivf queries (and their oracles compose the same SQL), so
  *    index-quality regression is hash-checked, not eyeballed.
  */
object MlPrepQueries {

  /** Document-frequency threshold above which a shingle counts as
    * cross-document boilerplate (mirrored into the oracle).
    */
  private val BoilerDf = 5

  /** Span-corruption parameters: mask-start rate (percent of token
    * positions) and span length, mirrored into the oracle.
    */
  private val MaskStartPct = 15
  private val SpanLen = 3

  /** Minimum bigram count for a PMI collocation candidate. */
  private val PmiMinCount = 5

  /** md5-hex-prefix → non-negative bigint bucket (Spark side; the
    * oracle uses the '0x'-prefix cast — both read the same 8 hex
    * chars, < 2^32 so never negative).
    */
  private def hexBucket(c: Column, digits: Int): Column =
    conv(substring(c, 1, digits), 16, 10).cast("long")

  val defs: Map[String, QueryFn] = Map(

    // Deterministic epoch shuffle + sharding: training order is a pure
    // function of (epoch, doc_id) — h = md5('epoch1:'||doc_id) orders
    // docs, h mod 8 shards them. The output is the per-shard manifest
    // a trainer would consume, with an order SIGNATURE: each doc
    // contributes md5('sig:'||rank||':'||doc_id) (rank baked in, so
    // any reordering changes the value) summed in decimal and reduced
    // mod 1e9+7 — order-sensitive proof, order-free aggregation.
    "epoch_shuffle" -> ((s, d) => {
      import s.implicits._
      val h = md5(concat(lit("epoch1:"), $"doc_id".cast("string")))
      val w = Window.partitionBy($"shard").orderBy($"h", $"doc_id")
      Tables.documents(s, d)
        .select($"doc_id", TF.nTokens($"text").cast("long").as("n_tok"), h.as("h"))
        .withColumn("shard", hexBucket($"h", 8) % 8)
        .withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("term", hexBucket(
          md5(concat(lit("sig:"), $"rank".cast("string"), lit(":"),
            $"doc_id".cast("string"))), 12))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tok"),
          (sum($"term".cast("decimal(38,0)")) % 1000000007L).cast("long")
            .as("order_sig"))
        .orderBy($"shard")
    }),

    // T5-style span corruption accounting: position p starts a mask
    // span iff md5('mask:'||doc_id||':'||p) lands under MaskStartPct;
    // a token is masked iff any start lies in [p-SpanLen+1, p] (span
    // UNION semantics — overlap allowed — so membership is a window
    // max, not a sequential greedy scan). Per-doc corruption stats
    // only need positions, not token text: the explode is over
    // sequence(0, n_tok-1).
    "span_corruption" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"doc_id").orderBy($"pos")
        .rowsBetween(-(SpanLen - 1), 0)
      Tables.documents(s, d)
        .select($"doc_id", TF.nTokens($"text").cast("long").as("n_tok"))
        .filter($"n_tok" > 0)
        .select($"doc_id", $"n_tok",
          explode(sequence(lit(0L), $"n_tok" - 1L)).as("pos"))
        .withColumn("start",
          (hexBucket(md5(concat(lit("mask:"), $"doc_id".cast("string"),
            lit(":"), $"pos".cast("string"))), 8) % 100 <
            MaskStartPct).cast("int"))
        .withColumn("masked", max($"start").over(w))
        .groupBy($"doc_id")
        .agg(first($"n_tok").as("n_tok"),
          sum($"start").cast("long").as("n_spans"),
          sum($"masked").cast("long").as("n_masked"))
        .select($"doc_id", $"n_tok", $"n_spans", $"n_masked",
          ($"n_masked".cast("double") / $"n_tok".cast("double")).as("mask_frac"))
        .orderBy($"doc_id")
    }),

    // PMI collocations, transcendental-free: PMI is monotone in the
    // ratio p(ab)/(p(a)p(b)), so the ratio itself is reported —
    // (cab/N2)/((ca/N1)*(cb/N1)) in ONE fixed IEEE op sequence both
    // engines share (a log would differ in ULPs across libms).
    // Unigram counts ride the memoized term relation; bigrams are one
    // lead-window pass; the top-50 is a TakeOrdered.
    "collocation_pmi" -> ((s, d) => {
      import s.implicits._
      val uni = LlmQueries.termTable(s, d)
        .groupBy($"term").agg(count(lit(1)).as("c"))
      val n1 = uni.agg(sum($"c").cast("double").as("n1"))
      val wd = Window.partitionBy($"doc_id").orderBy($"pos")
      val pairs = Tables.documents(s, d)
        .select($"doc_id", posexplode(TF.tokens($"text")).as(Seq("pos", "w1")))
        .filter($"w1" =!= "")
        .withColumn("w2", lead($"w1", 1).over(wd))
        .filter($"w2".isNotNull)
      val big = pairs.groupBy($"w1", $"w2").agg(count(lit(1)).as("cab"))
        .filter($"cab" >= PmiMinCount)
      val n2 = pairs.groupBy().agg(count(lit(1)).cast("double").as("n2"))
      big
        .join(uni.select($"term".as("w1"), $"c".as("ca")), Seq("w1"))
        .join(uni.select($"term".as("w2"), $"c".as("cb")), Seq("w2"))
        .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
        .select($"w1", $"w2", $"cab",
          rnd(($"cab".cast("double") / $"n2") /
            (($"ca".cast("double") / $"n1") * ($"cb".cast("double") / $"n1")),
            4).as("pmi_ratio"))
        .orderBy($"pmi_ratio".desc, $"w1", $"w2")
        .limit(50)
    }),

    // Cross-document boilerplate: a distinct shingle appearing in ≥
    // BoilerDf docs is boilerplate (nav bars, cookie banners — the
    // C4/CCNet removal target); per doc, the fraction of its distinct
    // shingles that are boilerplate. Rides the memoized
    // distinct-shingle relation; one df aggregate keyed by shingle +
    // one join back keyed by doc — both linear in corpus size.
    "boilerplate_ngrams" -> ((s, d) => {
      import s.implicits._
      val dsh = LlmQueries.distinctShingleTable(s, d)
      val df = dsh.groupBy($"sh").agg(count(lit(1)).as("df"))
      dsh.join(df, Seq("sh"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when($"df" >= BoilerDf, 1L).otherwise(0L)).as("n_boiler"))
        .select($"doc_id", $"n_shingles", $"n_boiler",
          ($"n_boiler".cast("double") / $"n_shingles".cast("double"))
            .as("boiler_frac"))
        .orderBy($"doc_id")
    }),

    // Vocabulary coverage: OOV rate per language against the top-1000
    // frequency vocabulary (vocab_build's ranking) — the tokenizer
    // sanity check before training. The vocab is bounded (1000 rows)
    // → broadcast membership join; the unigram relation is one scan.
    "vocab_coverage" -> ((s, d) => {
      import s.implicits._
      val voc = LlmQueries.termTable(s, d)
        .groupBy($"term").agg(count(lit(1)).as("tf"))
        .orderBy($"tf".desc, $"term").limit(1000)
        .select($"term", lit(1).as("in_v"))
      Tables.documents(s, d)
        .select($"lang", explode(TF.tokens($"text")).as("term"))
        .filter($"term" =!= "")
        .join(broadcast(voc), Seq("term"), "left")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_tok"),
          sum(when($"in_v".isNull, 1L).otherwise(0L)).as("n_oov"))
        .select($"lang", $"n_tok", $"n_oov",
          ($"n_oov".cast("double") / $"n_tok".cast("double")).as("oov_rate"))
        .orderBy($"lang")
    }),

    // Closed-form linear probe (distributed OLS): fit stopword ratio
    // on mean word length + distinct-token ratio — the quality-probe
    // fit a curation pipeline runs to calibrate a cheap filter. ONE
    // aggregate accumulates the normal-equation moments (each product
    // 10dp-snapped and decimal-summed → order-independent), then
    // Cramer's rule solves the 3×3 system on the single moment row.
    // Every post-aggregate double op is written in the same fixed
    // order as the oracle, so the coefficients are bit-identical.
    "linear_probe" -> ((s, d) => {
      import s.implicits._
      def m(c: Column): Column =
        sum(rnd(c, 10).cast("decimal(38,10)")).cast("double")
      val toks = TF.tokens($"text")
      val feats = Tables.documents(s, d)
        .select($"doc_id", TF.nTokens($"text").cast("long").as("nt"),
          length(TF.normText($"text")).cast("double").as("ln"),
          size(array_distinct(toks)).cast("double").as("ndis"),
          TF.stopwordRatio($"text").as("y"))
        .filter($"nt" > 0)
        .select(
          (($"ln" - ($"nt" - 1L).cast("double")) / $"nt".cast("double")).as("x1"),
          ($"ndis" / $"nt".cast("double")).as("x2"), $"y")
      val mom = feats.agg(
        count(lit(1)).as("n_rows"),
        m($"x1").as("s1"), m($"x2").as("s2"),
        m($"x1" * $"x1").as("s11"), m($"x2" * $"x2").as("s22"),
        m($"x1" * $"x2").as("s12"),
        m($"y").as("sy"), m($"x1" * $"y").as("s1y"), m($"x2" * $"y").as("s2y"))
      // symmetric system [[a,b,c],[b,e,f],[c,f,g]] · β = [sy,s1y,s2y]
      val a = $"n_rows".cast("double")
      val (b, c, e, f, g) = ($"s1", $"s2", $"s11", $"s12", $"s22")
      val det = a * ($"s11" * $"s22" - $"s12" * $"s12") -
        b * (b * g - f * c) + c * (b * f - e * c)
      val d0 = $"sy" * (e * g - f * f) - b * ($"s1y" * g - f * $"s2y") +
        c * ($"s1y" * f - e * $"s2y")
      val d1 = a * ($"s1y" * g - $"s2y" * f) - $"sy" * (b * g - f * c) +
        c * (b * $"s2y" - $"s1y" * c)
      val d2 = a * (e * $"s2y" - $"s1y" * f) - b * (b * $"s2y" - $"s1y" * c) +
        $"sy" * (b * f - e * c)
      def coef(di: Column): Column =
        when(det === 0.0, 0.0).otherwise(di / det)
      mom.select($"n_rows",
        rnd(coef(d0), 6).as("b0"), rnd(coef(d1), 6).as("b1"),
        rnd(coef(d2), 6).as("b2"))
    }),

    // Distributed PCA power iteration (top principal direction of the
    // uncentered Gram matrix — the embedding-whitening first step):
    // v₀ = 1/8 (unit by construction), two iterations of
    // w = Σᵢ (xᵢ·v) xᵢ with every product snapped to decimal before
    // the order-free sum, normalizer kept in-plan via broadcast.
    // Output: the 64 loadings + the Rayleigh-quotient estimate ‖w‖.
    "pca_power" -> ((s, d) => {
      import s.implicits._
      val dims = Tables.embeddings(s, d)
        .select($"vec_id", posexplode($"embedding").as(Seq("pos", "xv")))
        .select($"vec_id", $"pos", $"xv".cast("double").as("x"))
      def iterate(v: DataFrame): DataFrame = {
        val sRows = dims.join(broadcast(v), Seq("pos"))
          .groupBy($"vec_id")
          .agg(sum(rnd($"x" * $"vp", 12).cast("decimal(38,12)"))
            .cast("double").as("sc"))
        val wRows = dims.join(sRows, Seq("vec_id"))
          .groupBy($"pos")
          .agg(sum(rnd($"x" * $"sc", 9).cast("decimal(38,9)"))
            .cast("double").as("wp"))
        val nrm = wRows.agg(
          sqrt(sum(rnd($"wp" * $"wp", 6).cast("decimal(38,6)"))
            .cast("double")).as("nrm"))
        wRows.crossJoin(broadcast(nrm))
          .select($"pos",
            when($"nrm" === 0.0, 0.0).otherwise($"wp" / $"nrm").as("vp"),
            $"nrm")
      }
      val v0 = s.range(64).select($"id".cast("int").as("pos"),
        lit(0.125).as("vp"))
      val v2 = iterate(iterate(v0).select($"pos", $"vp"))
      v2.select($"pos", rnd($"vp", 6).as("loading"), rnd($"nrm", 4).as("lambda"))
        .orderBy($"pos")
    }),

    // Late-interaction (ColBERT-style) rerank: candidates from cheap
    // term overlap, reranked by MaxSim — Σ over query terms of the
    // max token-to-token similarity against the candidate doc. Token
    // "embeddings" are 4-dim md5-derived vectors (deterministic
    // seeded hashing, the LSH-hyperplane idiom), so every similarity
    // is replayable arithmetic; swap in real token vectors and the
    // plan is unchanged. Cost is the late-interaction contract:
    // |Q| queries × top-10 candidates × len² token pairs — bounded
    // by the candidate cap, never corpus-quadratic; the per-query-
    // term max and the per-pair decimal sum are both keyed aggregates.
    "maxsim_rerank" -> ((s, d) => {
      import s.implicits._
      val t = LlmQueries.termTable(s, d)
        .select($"doc_id", $"term").distinct()
      val cand = t.filter($"doc_id" < 10)
        .select($"doc_id".as("q_id"), $"term")
        .join(t, Seq("term"))
        .filter($"q_id" =!= $"doc_id")
        .groupBy($"q_id", $"doc_id").agg(count(lit(1)).as("n_shared"))
        .filter($"n_shared" >= 2)
      val wc = Window.partitionBy($"q_id").orderBy($"n_shared".desc, $"doc_id")
      val topCand = cand.withColumn("rc", row_number().over(wc))
        .filter($"rc" <= 10).select($"q_id", $"doc_id")
      def tv(term: org.apache.spark.sql.Column, k: Int) =
        (conv(substring(md5(concat(lit("tv:"), term)), 2 * k + 1, 2), 16, 10)
          .cast("double") - 127.5) / 255.0
      val qt = t.filter($"doc_id" < 10)
        .select($"doc_id".as("q_id"), $"term".as("qterm"))
      val dt = t.select($"doc_id", $"term".as("dterm"))
      val sims = topCand.join(qt, Seq("q_id")).join(dt, Seq("doc_id"))
        .select($"q_id", $"doc_id", $"qterm",
          rnd((0 until 4).map(k => tv($"qterm", k) * tv($"dterm", k))
            .reduce(_ + _), 8).as("sim"))
      val best = sims.groupBy($"q_id", $"doc_id", $"qterm")
        .agg(max($"sim").as("best"))
      val score = best.groupBy($"q_id", $"doc_id")
        .agg(sum($"best".cast("decimal(18,8)")).cast("double").as("raw"))
      val wf = Window.partitionBy($"q_id").orderBy($"maxsim".desc, $"doc_id")
      score.select($"q_id", $"doc_id", rnd($"raw", 6).as("maxsim"))
        .withColumn("rn", row_number().over(wf))
        .filter($"rn" <= 3)
        .select($"q_id", $"doc_id", $"rn", $"maxsim")
        .orderBy($"q_id", $"rn")
    }),

    // ANN index-quality evaluation: recall@5 of the IVF path against
    // the exact brute-force top-5, per query — COMPOSED from the two
    // existing queries (and the oracle composes their SQL), so an
    // index regression is a hash mismatch in the driver's correctness
    // file, not a judgement call.
    "ann_recall_eval" -> ((s, d) => {
      import s.implicits._
      val ex = LlmQueries.defs("knn_bruteforce")(s, d)
        .select($"q_id", $"neighbor_id")
      val iv = LlmQueries.defs("knn_ivf")(s, d)
        .select($"q_id", $"neighbor_id", lit(1).as("hit"))
      ex.join(iv, Seq("q_id", "neighbor_id"), "left")
        .groupBy($"q_id")
        .agg(count($"hit").as("n_hits"))
        .select($"q_id", $"n_hits",
          ($"n_hits".cast("double") / 5.0).as("recall_at_5"))
        .orderBy($"q_id")
    }),

    // Split-conformal calibration (wave 36): the distribution-free
    // prediction-interval machinery a model-serving pipeline runs
    // over held-out scores — compute the ceil((n+1)(1−α)) order
    // statistic of the calibration nonconformity scores (α = 0.1,
    // exact integer rank arithmetic, no quantile interpolation) and
    // evaluate empirical coverage on the disjoint test split. The
    // calibration/test split is the seeded-md5 uniform (its own
    // "conf:" prefix — split_assign's independence discipline); the
    // order statistic is "min score with cum ≥ k" off one
    // distributed prefix sum over DISTINCT scores (auc_eval's
    // machinery — no global sort); the coverage pass is one
    // map-side-combinable aggregate with the scalar q̂ broadcast.
    // Everything is exact: q̂ is an actual data value, k is integer,
    // and the one closing division is snapped.
    "conformal_calibration" -> ((s, d) => {
      import s.implicits._
      val scored = Tables.embeddings(s, d)
        .filter($"label".isNotNull && element_at($"embedding", 1).isNotNull)
        .select($"vec_id",
          abs(element_at($"embedding", 1).cast("double") -
            $"label".cast("double") / lit(9.0)).as("nonconf"),
          (conv(substring(md5(concat(lit("conf:"),
            $"vec_id".cast("string"))), 1, 8), 16, 10)
            .cast("long") < lit(2147483648L)).as("is_cal"))
      val cal = scored.filter($"is_cal")
      val nc = cal.agg(count(lit(1)).as("n_cal"))
      val calScores = cal.groupBy($"nonconf").agg(count(lit(1)).as("n"))
        .withColumn("g", lit(1))
      val run = DistributedNtile.withRunningSum(
        calScores, "g", Seq($"nonconf".asc_nulls_last), $"n", "cum")
      val qrow = run.crossJoin(broadcast(nc))
        .filter($"cum" >= expr("(9 * (n_cal + 1) + 9) DIV 10"))
        .agg(min($"nonconf").as("q_hat"))
      scored.filter(!$"is_cal")
        .crossJoin(broadcast(qrow))
        .agg(count(lit(1)).as("n_test"),
          coalesce(sum(when($"nonconf" <= $"q_hat", 1L).otherwise(0L)),
            lit(0L)).as("n_covered"),
          min($"q_hat").as("q_hat"))
        .crossJoin(broadcast(nc))
        .select($"n_cal",
          expr("(9 * (n_cal + 1) + 9) DIV 10").as("k_rank"),
          $"q_hat", $"n_test", $"n_covered",
          when($"n_test" === 0L, lit(null).cast("double"))
            .otherwise(rnd($"n_covered".cast("double") /
              $"n_test".cast("double"), 6)).as("coverage"))
    }),

    // Isotonic calibration fit — PAVA via the minimax identity
    // fitted(b) = max_{i≤b} min_{j≥b} mean(y over bins i..j)
    // (Barlow et al. 1972, public; equal to pool-adjacent-violators
    // on the binned data, the standard score-calibration step next
    // to conformal_calibration). Scale shape: the ONLY corpus-scale
    // stage is the equi-width binned (n, Σy) aggregate (map-side
    // combinable); prefix sums and the (i,j,b) minimax lattice run
    // on the ≤IsoBins-row grid (BoundedWindow + two bounded
    // non-equi joins — broadcast nested loop over ≤32³ combos).
    // Segment means are SCALED-INTEGER divisions ((Σy·10⁹) DIV n —
    // exact, identical cross-engine; labels are 0-9 so the scaled
    // numerator stays far under long range at any sweep scale), so
    // the max/min lattice never compares a double; the one closing
    // rescale is a single correctly-rounded IEEE division.
    "isotonic_fit" -> ((s, d) => {
      import s.implicits._
      val sc = Tables.embeddings(s, d)
        .filter($"label".isNotNull && element_at($"embedding", 1).isNotNull)
        .select(element_at($"embedding", 1).cast("double").as("score"),
          $"label".cast("long").as("y"))
      val mm = sc.agg(min($"score").as("lo"), max($"score").as("hi"))
      val cells = sc.crossJoin(broadcast(mm))
        .select(
          when($"hi" <= $"lo", lit(0L)).otherwise(
            least(lit(IsoBins - 1),
              floor(($"score" - $"lo") * IsoBins.toDouble / ($"hi" - $"lo"))
                .cast("long"))).as("bin"),
          $"y")
        .groupBy($"bin").agg(count(lit(1)).as("n"), sum($"y").as("sy"))
      val w = graft.operators.BoundedWindow
        .orderBy("isotonic_fit: bin grid", IsoBins, $"bin".asc)
      val pre = cells
        .withColumn("cn", sum($"n").over(w))
        .withColumn("cy", sum($"sy").over(w))
      val segs = pre.as("i").join(pre.as("j"), col("i.bin") <= col("j.bin"))
        .select(col("i.bin").as("si"), col("j.bin").as("sj"),
          expr("""((j.cy - i.cy + i.sy) * CAST(1000000000 AS BIGINT))
                 | DIV (j.cn - i.cn + i.n)""".stripMargin.replace("\n", " "))
            .as("ms"))
      val fit = segs
        .join(cells.select($"bin"), $"si" <= $"bin" && $"bin" <= $"sj")
        .groupBy($"bin", $"si").agg(min($"ms").as("mn"))
        .groupBy($"bin").agg(max($"mn").as("fs"))
      cells.join(fit, Seq("bin"))
        .select($"bin", $"n",
          rnd($"sy".cast("double") / $"n".cast("double"), 6).as("mean_raw"),
          ($"fs".cast("double") / lit(1.0e9)).as("fitted"))
        .orderBy($"bin")
    }),

    // Quantile normalization (the cross-assay feature alignment
    // standard): each event type's value distribution is mapped onto
    // the POOLED per-quantile profile, so every group shares one
    // marginal distribution. Per-type quantile buckets ride
    // DistributedNtile (skew-free exact NTILE — a dominant type
    // never routes through one task); the pooled profile is a
    // ≤QnBuckets-row decimal-exact aggregate broadcast back onto
    // the per-(type, bucket) summary. Reported per cell: the raw
    // mean and the normalized (pooled) mean the transform assigns.
    "quantile_normalize" -> ((s, d) => {
      import s.implicits._
      val base = Tables.events(s, d)
        .filter($"value".isNotNull)
        .select(coalesce($"event_type", lit("__null__")).as("t"),
          $"value", $"event_id")
      val tiled = DistributedNtile.withNtile(base, "t",
        Seq($"value".asc_nulls_last, $"event_id".asc_nulls_last),
        QnBuckets, "qb")
      val cells = tiled.groupBy($"t", $"qb")
        .agg(count(lit(1)).as("n"), sum(dec($"value")).as("sv"))
      val pooled = cells.groupBy($"qb")
        .agg((sum($"sv").cast("double") /
          sum($"n").cast("double")).as("mean_norm"))
      cells.join(broadcast(pooled), Seq("qb"))
        .select($"t", $"qb", $"n",
          rnd($"sv".cast("double") / $"n".cast("double"), 6).as("mean_raw"),
          rnd($"mean_norm", 6).as("mean_norm"))
        .orderBy($"t", $"qb")
    }),

    // One ALS half-step for implicit feedback (wave 44, Hu et al.
    // 2008's shape at k=2): fix the item (event-type) factors, solve
    // every user's 2×2 ridge normal equations in closed form — the
    // distributed update a recommender training pipeline runs per
    // sweep. Item factors are md5-derived INTEGERS in [0,1000)
    // (identical cross-engine), so every normal-equation entry is an
    // exact int64 sum off ONE (user, type)-keyed count aggregate;
    // only the final 2×2 solve runs in doubles (same op order both
    // engines). Linear in events, shuffle keyed by (user, type) then
    // user.
    "als_user_factors" -> ((s, d) => {
      import s.implicits._
      def yv(tag: String) =
        conv(substring(md5(concat(lit(tag), $"event_type")), 1, 4), 16, 10)
          .cast("long") % 1000L
      val r = Tables.events(s, d)
        .where($"user_id".isNotNull && $"event_type".isNotNull)
        .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("r"))
        .select($"user_id", $"r",
          yv("alsy1:").as("y1"), yv("alsy2:").as("y2"))
      val agg = r.groupBy($"user_id").agg(
        sum($"r").as("n_events"),
        sum($"y1" * $"y1").as("a11"),
        sum($"y1" * $"y2").as("a12"),
        sum($"y2" * $"y2").as("a22"),
        sum($"r" * $"y1").as("b1"),
        sum($"r" * $"y2").as("b2"))
      val a11 = ($"a11" + AlsLambda).cast("double")
      val a22 = ($"a22" + AlsLambda).cast("double")
      val a12 = $"a12".cast("double")
      val b1 = $"b1".cast("double")
      val b2 = $"b2".cast("double")
      val det = a11 * a22 - a12 * a12
      agg.select($"user_id", $"n_events",
        rnd((a22 * b1 - a12 * b2) / det, 6).as("u1"),
        rnd((a11 * b2 - a12 * b1) / det, 6).as("u2"))
        .orderBy($"user_id")
    }),

    // Hashing-trick featurization (wave 44, Weinberger et al. 2009):
    // every token maps to one of 64 md5 buckets — the fixed-width
    // featurization that needs NO vocabulary build or broadcast (the
    // property that makes it the streaming/oov-safe alternative to
    // vocab_build at corpus scale). Reported per source as the
    // bucket-count profile with normalized weights; one scan, one
    // (source, bucket) aggregate, output bounded at
    // |sources| × 64.
    "feature_hash" -> ((s, d) => {
      import s.implicits._
      // count FIRST, hash the distinct (source, term) rows after:
      // bucket is a pure function of term, so aggregating counts
      // before the md5 is algebraically identical — and it cuts the
      // md5 calls from one per TOKEN INSTANCE to one per distinct
      // term (the 10× sweep measured the per-instance formulation at
      // 74 s; the hash, not the scan, was the cost)
      val tc = Tables.documents(s, d)
        .where($"text".isNotNull)
        .select($"source", explode(TF.tokens($"text")).as("term"))
        .where($"term" =!= "")
        .groupBy($"source", $"term").agg(count(lit(1)).as("tn"))
      val c = tc
        .select($"source",
          (conv(substring(md5(concat(lit("fh:"), $"term")), 1, 8), 16, 10)
            .cast("long") % FhBuckets).as("bucket"), $"tn")
        .groupBy($"source", $"bucket").agg(sum($"tn").as("n"))
      // window, not a self-join on source: a NULL source stratum must
      // keep its rows (equi-join keys drop nulls; partitions don't)
      c.withColumn("n_tok",
        sum($"n").over(Window.partitionBy($"source")))
        .select($"source", $"bucket", $"n",
          rnd($"n".cast("double") / $"n_tok".cast("double"), 6).as("weight"))
        .orderBy($"source".asc_nulls_last, $"bucket")
    }),

    // Weighted sampling WITHOUT replacement (wave 50, Efraimidis &
    // Spirtakis 2006 — the A-ES exponential race): each doc draws a
    // deterministic uniform u ∈ (0,1] from md5(aes:doc_id), its race
    // key is −ln(u)/w (w = n_chars — longer docs proportionally more
    // likely), and the K smallest keys win. This is THE distributed
    // weighted sampler: a pure projection + TakeOrdered(K) — no
    // global sort, no sequential state, reproducible under any
    // partitioning. ln snaps at 12dp (the one transcendental);
    // sample membership is stable under the snap except on
    // measure-zero key ties, which the doc_id tiebreak fixes.
    "weighted_sample_aes" -> ((s, d) => {
      import s.implicits._
      val u = (conv(substring(md5(concat(lit("aes:"),
        $"doc_id".cast("string"))), 1, 13), 16, 10)
        .cast("long").cast("double") + lit(1.0)) / lit(AesDiv)
      Tables.documents(s, d)
        .where($"doc_id".isNotNull && $"n_chars".isNotNull && $"n_chars" > 0)
        .select($"doc_id", $"n_chars".as("w"),
          rnd(-log(u) / $"n_chars".cast("double"), 12).as("ekey"))
        .orderBy($"ekey".asc, $"doc_id")
        .limit(AesK)
    }),

    // Out-of-fold smoothed target encoding (wave 48) — the
    // categorical-feature encoder every tabular model pipeline runs,
    // built the one leakage-safe way: each row's encoding comes ONLY
    // from the OTHER folds (fold = event_id mod TeFolds), with an
    // additive-smoothing pull toward the global prior so rare
    // categories don't memorize their own targets. ONE corpus-scale
    // (category, fold) aggregate; the out-of-fold totals come from a
    // category-partitioned window over that ≤|categories|×folds grid
    // (a window, not a self-join — a NULL category stratum must keep
    // its rows). All-integer until the single closing division chain
    // (fixed IEEE op order, no snap needed).
    "target_encode" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .where($"event_id".isNotNull)
        .select($"event_type",
          pmod($"event_id", lit(TeFolds.toLong)).as("fold"),
          when($"value" > TeTarget, 1L).otherwise(0L).as("y"))
      val cell = ev.groupBy($"event_type", $"fold")
        .agg(count(lit(1)).as("n"), sum($"y").as("sy"))
      val g = cell.agg(sum($"n").as("gn"), sum($"sy").as("gsy"))
      val wCat = Window.partitionBy($"event_type")
      cell.crossJoin(broadcast(g))
        .withColumn("nt", sum($"n").over(wCat))
        .withColumn("syt", sum($"sy").over(wCat))
        .select($"event_type", $"fold",
          ($"nt" - $"n").as("n_oof"), ($"syt" - $"sy").as("sum_oof"),
          ((($"syt" - $"sy").cast("double")
            + lit(TeAlpha) * ($"gsy".cast("double") / $"gn".cast("double")))
            / (($"nt" - $"n").cast("double") + lit(TeAlpha))).as("enc"))
        .orderBy($"event_type".asc_nulls_last, $"fold")
    }),

    // Leakage-safe churn labeling (wave 46): the supervised-label
    // prep every retention model needs, built the one correct way —
    // features come ONLY from events at or before the cutoff (7 days
    // before the feed's end), the label ONLY from activity after it.
    // A user seen solely after the cutoff has no feature row (no
    // training example without features); recency is measured AT the
    // cutoff, never across it. All integer arithmetic; one
    // user-keyed aggregate + one broadcast anti-ish join.
    "churn_labels" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .where($"user_id".isNotNull && $"ts".isNotNull &&
          $"event_type".isNotNull)
        .select($"user_id", $"event_type", unix_millis($"ts").as("ms"))
      val mx = ev.agg(max($"ms").as("mx"))
        .select(($"mx" - lit(ChurnHorizonMs)).as("cutoff"))
      val evc = ev.crossJoin(broadcast(mx))
      val post = evc.where($"ms" > $"cutoff")
        .select($"user_id").distinct().withColumn("active_after", lit(1))
      evc.where($"ms" <= $"cutoff")
        .groupBy($"user_id", $"cutoff")
        .agg(count(lit(1)).as("n_events"),
          sum(when($"event_type" === "click", 1L).otherwise(0L))
            .as("n_click"),
          sum(when($"event_type" === "view", 1L).otherwise(0L))
            .as("n_view"),
          sum(when($"event_type" === "purchase", 1L).otherwise(0L))
            .as("n_purchase"),
          countDistinct(expr("ms DIV 86400000")).as("days_active"),
          max($"ms").as("last_ms"))
        .join(post, Seq("user_id"), "left")
        .select($"user_id", $"n_events", $"n_click", $"n_view",
          $"n_purchase", $"days_active",
          expr("(cutoff - last_ms) DIV 86400000").as("recency_days"),
          $"active_after".isNull.as("churned"))
        .orderBy($"user_id")
    })
  )

  /** Churn label horizon: the post-cutoff observation window. */
  private val ChurnHorizonMs = 7L * 86400000L

  /** target_encode fold count, binary-target threshold (median-ish on
    * the fixture's value distribution), and smoothing strength —
    * literals mirrored in the oracle.
    */
  private val TeFolds = 5
  private val TeTarget = 50.0
  private val TeAlpha = 20.0

  /** weighted_sample_aes sample size and the (2^52 + 1) divisor that
    * maps 13 md5 hex chars + 1 onto u ∈ (0,1] (never 0, so −ln(u) is
    * finite). Mirrored in the oracle.
    */
  private val AesK = 100
  private val AesDiv = 4503599627370497.0

  /** ALS ridge term and feature-hash width, mirrored in the oracles. */
  private val AlsLambda = 1000L
  private val FhBuckets = 64L

  /** Quantile-bucket count for quantile_normalize — the pooled
    * profile resolution. Mirrored in the oracle.
    */
  private val QnBuckets = 16

  /** Equi-width score-bin count for isotonic_fit — bounded grid, so
    * the minimax lattice is ≤ IsoBins³ rows regardless of corpus
    * size. Mirrored in the oracle.
    */
  private val IsoBins = 32L

  import LlmQueries.{NORM, NTOK, TOKS, duckShingleCtes}

  private val duckStopRatio: String =
    s"""(CASE WHEN $NTOK = 0 THEN 0.0 ELSE
       | CAST(len(list_filter($TOKS, t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len($TOKS) END)""".stripMargin

  val oracles: Map[String, String] = Map(

    // same md5-derived u ∈ (0,1], same −ln(u)/w race key, same 12dp
    // snap and doc_id tiebreak
    "weighted_sample_aes" ->
      s"""SELECT doc_id, n_chars AS w,
         | ${Q.duckRnd(
        "-ln((CAST(('0x' || substring(md5('aes:' ||" +
          " CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 1.0)" +
          s" / $AesDiv) / CAST(n_chars AS DOUBLE)", 12)} AS ekey
         |FROM documents
         |WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
         |ORDER BY ekey, doc_id LIMIT $AesK""".stripMargin,

    // same pmod fold, same out-of-fold window subtraction, same
    // single closing division chain
    "target_encode" ->
      s"""WITH e AS (SELECT event_type,
         |    ((event_id % $TeFolds) + $TeFolds) % $TeFolds AS fold,
         |    CASE WHEN value > $TeTarget THEN 1 ELSE 0 END AS y
         |  FROM events WHERE event_id IS NOT NULL),
         |cell AS (SELECT event_type, fold, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(y) AS BIGINT) AS sy
         |  FROM e GROUP BY event_type, fold),
         |g AS (SELECT CAST(sum(n) AS BIGINT) AS gn,
         |    CAST(sum(sy) AS BIGINT) AS gsy FROM cell),
         |w AS (SELECT event_type, fold, n, sy,
         |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS nt,
         |    CAST(sum(sy) OVER (PARTITION BY event_type) AS BIGINT) AS syt
         |  FROM cell)
         |SELECT event_type, fold, nt - n AS n_oof, syt - sy AS sum_oof,
         | (CAST(syt - sy AS DOUBLE)
         |    + $TeAlpha * (CAST(gsy AS DOUBLE) / CAST(gn AS DOUBLE)))
         |   / (CAST(nt - n AS DOUBLE) + $TeAlpha) AS enc
         |FROM w CROSS JOIN g
         |ORDER BY event_type NULLS LAST, fold""".stripMargin,

    // same md5 order key, same shard bucket, same positional-hash
    // signature reduced mod 1e9+7
    "epoch_shuffle" ->
      s"""WITH h AS (SELECT doc_id, CAST($NTOK AS BIGINT) AS n_tok,
         |    md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
         |sh AS (SELECT doc_id, n_tok, h,
         |    ('0x' || substr(h, 1, 8))::BIGINT % 8 AS shard FROM h),
         |r AS (SELECT doc_id, n_tok, shard, CAST(row_number() OVER (
         |    PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS rank
         |  FROM sh),
         |t AS (SELECT shard, n_tok,
         |    ('0x' || substr(md5('sig:' || CAST(rank AS VARCHAR) || ':' ||
         |      CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS term
         |  FROM r)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tok,
         |  CAST(sum(CAST(term AS DECIMAL(38,0))) % 1000000007 AS BIGINT)
         |    AS order_sig
         |FROM t GROUP BY shard ORDER BY shard""".stripMargin,

    // same md5 start rule, same window-union span membership
    "span_corruption" ->
      s"""WITH n AS (SELECT doc_id, CAST($NTOK AS BIGINT) AS n_tok
         |  FROM documents WHERE $NTOK > 0),
         |p AS (SELECT doc_id, n_tok, unnest(range(0, n_tok)) AS pos FROM n),
         |f AS (SELECT doc_id, n_tok, pos,
         |  CASE WHEN ('0x' || substr(md5('mask:' || CAST(doc_id AS VARCHAR)
         |    || ':' || CAST(pos AS VARCHAR)), 1, 8))::BIGINT % 100
         |    < $MaskStartPct THEN 1 ELSE 0 END AS start
         |  FROM p),
         |m AS (SELECT doc_id, n_tok, start, max(start) OVER (
         |    PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN ${SpanLen - 1} PRECEDING AND CURRENT ROW) AS masked
         |  FROM f)
         |SELECT doc_id, any_value(n_tok) AS n_tok,
         |  CAST(sum(start) AS BIGINT) AS n_spans,
         |  CAST(sum(masked) AS BIGINT) AS n_masked,
         |  CAST(sum(masked) AS DOUBLE) / CAST(any_value(n_tok) AS DOUBLE)
         |    AS mask_frac
         |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same count tables, same single fixed IEEE op sequence
    "collocation_pmi" ->
      s"""WITH t AS (SELECT doc_id, unnest($TOKS) AS term FROM documents),
         |u AS (SELECT term, count(*) AS c FROM t WHERE term <> '' GROUP BY term),
         |n1 AS (SELECT CAST(sum(c) AS DOUBLE) AS n1 FROM u),
         |toks AS (SELECT doc_id, $TOKS AS w FROM documents),
         |idx AS (SELECT w, unnest(range(1, len(w))) AS i FROM toks
         |        WHERE len(w) >= 2),
         |pr AS (SELECT w[i] AS w1, w[i + 1] AS w2 FROM idx),
         |n2 AS (SELECT CAST(count(*) AS DOUBLE) AS n2 FROM pr),
         |b AS (SELECT w1, w2, count(*) AS cab FROM pr GROUP BY w1, w2
         |      HAVING count(*) >= $PmiMinCount)
         |SELECT w1, w2, CAST(cab AS BIGINT) AS cab,
         |  ${Q.duckRnd(
             "(CAST(cab AS DOUBLE) / n2.n2) / ((CAST(ca.c AS DOUBLE) / n1.n1)" +
               " * (CAST(cb.c AS DOUBLE) / n1.n1))", 4)} AS pmi_ratio
         |FROM b JOIN u ca ON b.w1 = ca.term JOIN u cb ON b.w2 = cb.term,
         |  n1, n2
         |ORDER BY pmi_ratio DESC, w1, w2 LIMIT 50""".stripMargin,

    // same distinct-shingle relation, same df threshold
    "boilerplate_ngrams" ->
      s"""WITH $duckShingleCtes,
         |ds AS (SELECT DISTINCT doc_id, s FROM
         |  (SELECT doc_id, unnest(sh) AS s FROM sh) t),
         |df AS (SELECT s, count(*) AS df FROM ds GROUP BY s)
         |SELECT ds.doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN df.df >= $BoilerDf THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_boiler,
         |  CAST(sum(CASE WHEN df.df >= $BoilerDf THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS boiler_frac
         |FROM ds JOIN df ON ds.s = df.s
         |GROUP BY ds.doc_id ORDER BY ds.doc_id""".stripMargin,

    // same top-1000 (tf desc, term) vocabulary, same OOV accounting
    "vocab_coverage" ->
      s"""WITH t AS (SELECT doc_id, lang, unnest($TOKS) AS term FROM documents),
         |u AS (SELECT term FROM (SELECT term, count(*) AS tf FROM t
         |      WHERE term <> '' GROUP BY term
         |      ORDER BY tf DESC, term LIMIT 1000) v)
         |SELECT lang, count(*) AS n_tok,
         |  CAST(sum(CASE WHEN u.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_oov,
         |  CAST(sum(CASE WHEN u.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS oov_rate
         |FROM t LEFT JOIN u ON t.term = u.term
         |WHERE t.term <> ''
         |GROUP BY lang ORDER BY lang""".stripMargin,

    // same 10dp-snapped decimal moments, same Cramer expression order
    "linear_probe" -> {
      def m(expr: String): String =
        s"CAST(sum(CAST(${Q.duckRnd(expr, 10)} AS DECIMAL(38,10))) AS DOUBLE)"
      s"""WITH f AS (SELECT
         |    (CAST(length($NORM) AS DOUBLE) - CAST($NTOK - 1 AS DOUBLE))
         |      / CAST($NTOK AS DOUBLE) AS x1,
         |    CAST(len(list_distinct($TOKS)) AS DOUBLE)
         |      / CAST($NTOK AS DOUBLE) AS x2,
         |    $duckStopRatio AS y
         |  FROM documents WHERE $NTOK > 0),
         |mom AS (SELECT count(*) AS n_rows,
         |  ${m("x1")} AS s1, ${m("x2")} AS s2,
         |  ${m("x1 * x1")} AS s11, ${m("x2 * x2")} AS s22,
         |  ${m("x1 * x2")} AS s12,
         |  ${m("y")} AS sy, ${m("x1 * y")} AS s1y, ${m("x2 * y")} AS s2y
         |  FROM f),
         |sol AS (SELECT n_rows,
         |  CAST(n_rows AS DOUBLE) * (s11 * s22 - s12 * s12)
         |    - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2) AS det,
         |  sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
         |    + s2 * (s1y * s12 - s11 * s2y) AS d0,
         |  CAST(n_rows AS DOUBLE) * (s1y * s22 - s2y * s12)
         |    - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2) AS d1,
         |  CAST(n_rows AS DOUBLE) * (s11 * s2y - s1y * s12)
         |    - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2) AS d2
         |  FROM mom)
         |SELECT n_rows,
         |  ${Q.duckRnd("CASE WHEN det = 0.0 THEN 0.0 ELSE d0 / det END", 6)} AS b0,
         |  ${Q.duckRnd("CASE WHEN det = 0.0 THEN 0.0 ELSE d1 / det END", 6)} AS b1,
         |  ${Q.duckRnd("CASE WHEN det = 0.0 THEN 0.0 ELSE d2 / det END", 6)} AS b2
         |FROM sol""".stripMargin
    },

    // same v0, same snap digits, same two-iteration replay
    "pca_power" -> {
      def sIter(v: String): String =
        s"""SELECT d.vec_id, CAST(sum(CAST(${Q.duckRnd(s"d.x * $v", 12)}
           | AS DECIMAL(38,12))) AS DOUBLE) AS sc""".stripMargin
      s"""WITH d AS (SELECT vec_id,
         |    generate_subscripts(embedding, 1) - 1 AS pos,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |s1 AS (${sIter("0.125")} FROM d GROUP BY d.vec_id),
         |w1 AS (SELECT d.pos, CAST(sum(CAST(${Q.duckRnd("d.x * s1.sc", 9)}
         |    AS DECIMAL(38,9))) AS DOUBLE) AS wp
         |  FROM d JOIN s1 ON d.vec_id = s1.vec_id GROUP BY d.pos),
         |n1 AS (SELECT sqrt(CAST(sum(CAST(${Q.duckRnd("wp * wp", 6)}
         |    AS DECIMAL(38,6))) AS DOUBLE)) AS nrm FROM w1),
         |v1 AS (SELECT pos, CASE WHEN nrm = 0.0 THEN 0.0 ELSE wp / nrm END
         |    AS vp FROM w1, n1),
         |s2 AS (${sIter("v1.vp")} FROM d JOIN v1 ON d.pos = v1.pos
         |  GROUP BY d.vec_id),
         |w2 AS (SELECT d.pos, CAST(sum(CAST(${Q.duckRnd("d.x * s2.sc", 9)}
         |    AS DECIMAL(38,9))) AS DOUBLE) AS wp
         |  FROM d JOIN s2 ON d.vec_id = s2.vec_id GROUP BY d.pos),
         |n2 AS (SELECT sqrt(CAST(sum(CAST(${Q.duckRnd("wp * wp", 6)}
         |    AS DECIMAL(38,6))) AS DOUBLE)) AS nrm FROM w2)
         |SELECT pos, ${Q.duckRnd(
             "CASE WHEN nrm = 0.0 THEN 0.0 ELSE wp / nrm END", 6)} AS loading,
         |  ${Q.duckRnd("nrm", 4)} AS lambda
         |FROM w2, n2 ORDER BY pos""".stripMargin
    },

    // same md5-derived token vectors, same left-assoc 4-term dot,
    // same snap digits and rank order
    "maxsim_rerank" -> {
      def tv(term: String, k: Int): String =
        s"(CAST(('0x' || substr(md5('tv:' || $term), ${2 * k + 1}, 2))::BIGINT" +
          s" AS DOUBLE) - 127.5) / 255.0"
      val dot = (0 until 4)
        .map(k => s"${tv("qterm", k)} * ${tv("dterm", k)}").mkString(" + ")
      s"""WITH t AS (SELECT DISTINCT doc_id, term FROM
         |  (SELECT doc_id, unnest($TOKS) AS term FROM documents) x
         |  WHERE term <> ''),
         |c0 AS (SELECT q.doc_id AS q_id, t.doc_id AS doc_id,
         |    count(*) AS n_shared
         |  FROM t q JOIN t ON q.term = t.term
         |  WHERE q.doc_id < 10 AND q.doc_id <> t.doc_id
         |  GROUP BY q.doc_id, t.doc_id HAVING count(*) >= 2),
         |tc AS (SELECT q_id, doc_id FROM (
         |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY n_shared DESC, doc_id) AS rc FROM c0) r
         |  WHERE rc <= 10),
         |qt AS (SELECT doc_id AS q_id, term AS qterm FROM t WHERE doc_id < 10),
         |dt AS (SELECT doc_id, term AS dterm FROM t),
         |sims AS (SELECT tc.q_id, tc.doc_id, qt.qterm,
         |    ${Q.duckRnd(dot, 8)} AS sim
         |  FROM tc JOIN qt ON tc.q_id = qt.q_id
         |    JOIN dt ON tc.doc_id = dt.doc_id),
         |b AS (SELECT q_id, doc_id, qterm, max(sim) AS best
         |  FROM sims GROUP BY q_id, doc_id, qterm),
         |sc AS (SELECT q_id, doc_id,
         |    CAST(sum(CAST(best AS DECIMAL(18,8))) AS DOUBLE) AS raw
         |  FROM b GROUP BY q_id, doc_id)
         |SELECT q_id, doc_id, rn, maxsim FROM (
         |  SELECT q_id, doc_id, ${Q.duckRnd("raw", 6)} AS maxsim,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY ${Q.duckRnd("raw", 6)} DESC, doc_id) AS rn
         |  FROM sc) f
         |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin
    },

    // composes the knn_bruteforce and knn_ivf oracle SQL verbatim, so
    // the three can never drift apart
    "ann_recall_eval" ->
      s"""WITH ex AS (SELECT q_id, neighbor_id FROM
         |  (${LlmQueries.oracles("knn_bruteforce")}) x),
         |iv AS (SELECT q_id, neighbor_id FROM
         |  (${LlmQueries.oracles("knn_ivf")}) y)
         |SELECT ex.q_id, count(iv.neighbor_id) AS n_hits,
         |  CAST(count(iv.neighbor_id) AS DOUBLE) / 5.0 AS recall_at_5
         |FROM ex LEFT JOIN iv
         |  ON ex.q_id = iv.q_id AND ex.neighbor_id = iv.neighbor_id
         |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin,

    // same seeded split, same integer rank, same order statistic off
    // the same distinct-score prefix sum, same snapped coverage
    "conformal_calibration" ->
      """WITH s AS (SELECT vec_id,
        |  abs(CAST(embedding[1] AS DOUBLE) - CAST(label AS DOUBLE) / 9.0)
        |    AS nonconf,
        |  ('0x' || substr(md5('conf:' || vec_id::VARCHAR), 1, 8))::BIGINT
        |    < 2147483648 AS is_cal
        | FROM embeddings
        | WHERE label IS NOT NULL AND embedding[1] IS NOT NULL),
        |cal AS (SELECT nonconf FROM s WHERE is_cal),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
        |cs AS (SELECT nonconf, count(*) AS n FROM cal GROUP BY nonconf),
        |run AS (SELECT nonconf,
        |  CAST(sum(n) OVER (ORDER BY nonconf
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum
        | FROM cs),
        |q AS (SELECT min(nonconf) AS q_hat FROM run CROSS JOIN nc
        | WHERE cum >= (9 * (n_cal + 1) + 9) // 10),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(coalesce(sum(CASE WHEN nonconf <= q_hat THEN 1 ELSE 0 END),
        |    0) AS BIGINT) AS n_covered,
        |  min(q_hat) AS q_hat
        | FROM s CROSS JOIN q WHERE NOT is_cal)
        |SELECT nc.n_cal, (9 * (nc.n_cal + 1) + 9) // 10 AS k_rank,
        | t.q_hat, t.n_test, t.n_covered,
        | CASE WHEN t.n_test = 0 THEN NULL
        |  ELSE floor(CAST(t.n_covered AS DOUBLE) / CAST(t.n_test AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 END AS coverage
        |FROM t CROSS JOIN nc""".stripMargin,

    // same equi-width bins, same scaled-integer segment means, same
    // minimax lattice over the bounded grid
    "isotonic_fit" ->
      s"""WITH s AS (SELECT CAST(embedding[1] AS DOUBLE) AS score,
         |    CAST(label AS BIGINT) AS y
         |  FROM embeddings
         |  WHERE label IS NOT NULL AND embedding[1] IS NOT NULL),
         |mm AS (SELECT min(score) AS lo, max(score) AS hi FROM s),
         |cells AS (SELECT CASE WHEN hi <= lo THEN 0
         |    ELSE least($IsoBins - 1, CAST(floor((score - lo) * $IsoBins.0
         |      / (hi - lo)) AS BIGINT)) END AS bin,
         |    count(*) AS n, CAST(sum(y) AS BIGINT) AS sy
         |  FROM s, mm GROUP BY 1),
         |pre AS (SELECT bin, n, sy,
         |    CAST(sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
         |    CAST(sum(sy) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cy
         |  FROM cells),
         |segs AS (SELECT i.bin AS si, j.bin AS sj,
         |    ((j.cy - i.cy + i.sy) * 1000000000) // (j.cn - i.cn + i.n)
         |      AS ms
         |  FROM pre i JOIN pre j ON i.bin <= j.bin),
         |mn AS (SELECT c.bin, s.si, min(s.ms) AS mn FROM segs s
         |  JOIN cells c ON s.si <= c.bin AND c.bin <= s.sj
         |  GROUP BY c.bin, s.si),
         |fit AS (SELECT bin, CAST(max(mn) AS BIGINT) AS fs FROM mn
         |  GROUP BY bin)
         |SELECT c.bin, c.n,
         |  ${Q.duckRnd("CAST(c.sy AS DOUBLE) / CAST(c.n AS DOUBLE)", 6)}
         |    AS mean_raw,
         |  CAST(f.fs AS DOUBLE) / 1000000000.0 AS fitted
         |FROM cells c JOIN fit f ON c.bin = f.bin
         |ORDER BY c.bin""".stripMargin,

    // same per-type NTILE (DistributedNtile mirrors SQL NTILE), same
    // decimal value sums, same pooled-profile division
    "quantile_normalize" ->
      s"""WITH b AS (SELECT coalesce(event_type, '__null__') AS t,
         |    value, event_id,
         |    CAST(ntile($QnBuckets) OVER (
         |      PARTITION BY coalesce(event_type, '__null__')
         |      ORDER BY value, event_id) AS INTEGER) AS qb
         |  FROM events WHERE value IS NOT NULL),
         |cells AS (SELECT t, qb, count(*) AS n,
         |    sum(CAST(value AS DECIMAL(18,2))) AS sv
         |  FROM b GROUP BY t, qb),
         |pooled AS (SELECT qb,
         |    CAST(sum(sv) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS mean_norm
         |  FROM cells GROUP BY qb)
         |SELECT c.t, c.qb, c.n,
         |  ${Q.duckRnd("CAST(c.sv AS DOUBLE) / CAST(c.n AS DOUBLE)", 6)}
         |    AS mean_raw,
         |  ${Q.duckRnd("p.mean_norm", 6)} AS mean_norm
         |FROM cells c JOIN pooled p ON c.qb = p.qb
         |ORDER BY c.t, c.qb""".stripMargin,

    // same md5 item factors, same int64 normal equations, same
    // closed-form 2×2 solve op order
    "als_user_factors" ->
      s"""WITH r AS (SELECT user_id, event_type, count(*) AS r
         |  FROM events WHERE user_id IS NOT NULL
         |    AND event_type IS NOT NULL GROUP BY 1, 2),
         |y AS (SELECT user_id, r,
         |    ('0x' || substr(md5('alsy1:' || event_type), 1, 4))::BIGINT
         |      % 1000 AS y1,
         |    ('0x' || substr(md5('alsy2:' || event_type), 1, 4))::BIGINT
         |      % 1000 AS y2
         |  FROM r),
         |a AS (SELECT user_id,
         |    CAST(sum(r) AS BIGINT) AS n_events,
         |    CAST(sum(y1 * y1) AS BIGINT) AS a11,
         |    CAST(sum(y1 * y2) AS BIGINT) AS a12,
         |    CAST(sum(y2 * y2) AS BIGINT) AS a22,
         |    CAST(sum(r * y1) AS BIGINT) AS b1,
         |    CAST(sum(r * y2) AS BIGINT) AS b2
         |  FROM y GROUP BY user_id)
         |SELECT user_id, n_events,
         |  ${Q.duckRnd(
        "(CAST(a22 + 1000 AS DOUBLE) * CAST(b1 AS DOUBLE)" +
          " - CAST(a12 AS DOUBLE) * CAST(b2 AS DOUBLE))" +
          " / (CAST(a11 + 1000 AS DOUBLE) * CAST(a22 + 1000 AS DOUBLE)" +
          " - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE))", 6)} AS u1,
         |  ${Q.duckRnd(
        "(CAST(a11 + 1000 AS DOUBLE) * CAST(b2 AS DOUBLE)" +
          " - CAST(a12 AS DOUBLE) * CAST(b1 AS DOUBLE))" +
          " / (CAST(a11 + 1000 AS DOUBLE) * CAST(a22 + 1000 AS DOUBLE)" +
          " - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE))", 6)} AS u2
         |FROM a ORDER BY user_id""".stripMargin,

    // same md5 buckets, same normalized weights
    "feature_hash" ->
      s"""WITH t AS (SELECT source, unnest(${LlmQueries.TOKS}) AS term
         |  FROM documents WHERE text IS NOT NULL),
         |tc AS (SELECT source, term, count(*) AS tn FROM t
         |  WHERE term <> '' GROUP BY source, term),
         |b AS (SELECT source,
         |    ('0x' || substr(md5('fh:' || term), 1, 8))::BIGINT % 64
         |      AS bucket, tn
         |  FROM tc),
         |c AS (SELECT source, bucket, CAST(sum(tn) AS BIGINT) AS n FROM b
         |  GROUP BY source, bucket)
         |SELECT source, bucket, n,
         |  ${Q.duckRnd(
        "CAST(n AS DOUBLE)" +
          " / CAST(sum(n) OVER (PARTITION BY source) AS DOUBLE)", 6)}
         |    AS weight
         |FROM c ORDER BY source ASC NULLS LAST, bucket""".stripMargin,

    // same cutoff, same at-or-before/after split, same integer
    // features
    "churn_labels" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) // 1000 AS ms
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |    AND event_type IS NOT NULL),
         |cut AS (SELECT max(ms) - $ChurnHorizonMs AS cutoff FROM e),
         |post AS (SELECT DISTINCT user_id FROM e, cut WHERE ms > cutoff),
         |f AS (SELECT user_id, any_value(cutoff) AS cutoff,
         |    count(*) AS n_events,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_click,
         |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_view,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_purchase,
         |    CAST(count(DISTINCT ms // 86400000) AS BIGINT) AS days_active,
         |    max(ms) AS last_ms
         |  FROM e, cut WHERE ms <= cutoff GROUP BY user_id)
         |SELECT f.user_id, f.n_events, f.n_click, f.n_view, f.n_purchase,
         |  f.days_active, (f.cutoff - f.last_ms) // 86400000 AS recency_days,
         |  post.user_id IS NULL AS churned
         |FROM f LEFT JOIN post ON f.user_id = post.user_id
         |ORDER BY f.user_id""".stripMargin
  )
}
