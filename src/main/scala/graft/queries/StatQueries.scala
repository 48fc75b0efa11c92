package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => TF}
import graft.operators.DistributedNtile
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Twentieth wave — distribution statistics and dataset-evaluation
  * operators (SURVEY.md §2.11 extensions): the hypothesis-test /
  * ranking-metric layer a curation pipeline runs to DECIDE between
  * dataset variants, where earlier waves only described one corpus.
  * Every op is a global-distribution computation, which is exactly
  * where single-partition sorts hide — so the whole wave rides the
  * skew-free two-phase primitives ([[DistributedNtile]]) instead of
  * raw unpartitioned ordered windows over corpus-sized relations.
  *
  * Scale/perf design:
  *  - `auc_eval` is the tie-corrected Mann-Whitney AUC: one groupBy
  *    to distinct scores, one distributed exclusive prefix sum, one
  *    map-side-combinable final aggregate. All-integer until the
  *    single closing division, so the statistic is bit-reproducible
  *    under any partitioning.
  *  - `ks_test` builds both empirical CDFs with the same distributed
  *    prefix sums over distinct values; the sup-norm argmax is a
  *    TakeOrdered(1), never a global sort.
  *  - `hist_equidepth` is [[DistributedNtile.withNtile]] over a
  *    tie-broken total order — exact SQL NTILE semantics with no
  *    single-task corpus sort (the plain `ntile() OVER (ORDER BY …)`
  *    plan at 100 TB).
  *  - `event_transitions` pays one user-keyed window shuffle (the
  *    sessionize_gaps shape); everything after the (from,to) count
  *    aggregate is arithmetic on a ≤|types|² relation.
  *  - `chi2_terms` computes cell counts relationally and evaluates
  *    every expected-count cell on the FULL top-terms × langs grid
  *    (a bounded crossJoin, 30×|langs| rows) — absent cells
  *    contribute their expectation, as the test requires. Per-term
  *    sums of double contributions are decimal-snapped (the
  *    linear_probe moment-sum discipline) so partition order can
  *    never flip a low-order bit.
  *  - `pareto_front` is the skyline operator in its
  *    prefix-max formulation: dominance against all higher-x points
  *    collapses to ONE distributed exclusive running max over the
  *    per-x maxima ([[DistributedNtile.withRunningMaxExcl]]) — no
  *    all-pairs dominance join at any scale. StatSpec checks it
  *    against brute-force dominance on the small fixture.
  */
object StatQueries {

  /** Equi-depth bin fan-out (mirrored into the oracle). */
  private val HistBins = 16

  /** Top-terms universe for the χ² association test (mirrored). */
  private val Chi2Terms = 30

  /** Positive-class threshold for auc_eval: labels 5-9 are "positive"
    * (the fixture's labels are uniform 0-9, so both classes are
    * populated at every scale). Mirrored into the oracle.
    */
  private val PosLabel = 5

  /** ndcg_eval cutoff and its 10 discount constants 1/log2(r+1),
    * r = 1..10. The doubles are computed HERE once; the oracle embeds
    * their shortest round-trip decimal repr via [[ndcgDiscSql]], so
    * both engines multiply by bit-identical constants and no log2 is
    * evaluated at query time in either engine.
    */
  private val NdcgK = 10

  /** woe_iv binary-target threshold (median-ish of the fixture value
    * distribution; shared with target_encode's TeTarget by value, not
    * by coupling), fdr_bh family size and FDR level q — literals
    * mirrored in the oracles.
    */
  private val WoeTarget = 50.0
  private val FdrTerms = 200
  private val FdrQ = 0.05

  /** poisson_bootstrap_ci replicate count, the 2^32 divisor turning
    * one 8-hex md5 lane into u ∈ [0,1) (each md5 serves four
    * replicates), and the Poisson(1) inverse-CDF thresholds
    * c_k = P(X ≤ k) for k = 0..7 (w = first k with u < c_k, else 8).
    * The doubles are computed HERE once and embed into the oracle as
    * shortest round-trip literals ([[bootCumSql]]), so both engines
    * draw identical weights.
    */
  private val BootR = 40
  private val Pow32 = 4294967296.0
  private val BootCum: IndexedSeq[Double] = {
    val e1 = math.exp(-1.0)
    val ps = Iterator.iterate((e1, 0)) { case (p, k) =>
      (p / (k + 1), k + 1)
    }.map(_._1).take(8).toIndexedSeq
    ps.scanLeft(0.0)(_ + _).drop(1)
  }
  private def bootCumSql(uExpr: String): String = {
    val cases = BootCum.zipWithIndex.map { case (c, k) =>
      s"WHEN $uExpr < CAST('${java.lang.Double.toString(c)}' AS DOUBLE)" +
        s" THEN $k"
    }.mkString(" ")
    s"CASE $cases ELSE ${BootCum.length} END"
  }
  private val NdcgDisc: IndexedSeq[Double] =
    (1 to NdcgK).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
  private def ndcgDiscSql: String =
    NdcgDisc.map(dd => s"CAST('${java.lang.Double.toString(dd)}' AS DOUBLE)")
      .mkString("[", ", ", "]")

  /** Session gap for sessionize: a new session starts after 30 min of
    * inactivity (the analytics-industry default). Mirrored.
    */
  private val SessionGapMs = 1800000L

  /** Minimum orders per customer for kendall_tau — below this the
    * pair statistic is noise (≤ 10 pairs). Mirrored.
    */
  private val KendallMinOrders = 5L

  /** Hill-estimator order-statistic depth: the tail index is
    * estimated from the top-[[HillK]] values per group. Groups with
    * fewer than [[HillMinK]] positive values are dropped (the
    * estimator is noise below that). Mirrored.
    */
  private val HillK = 50L
  private val HillMinK = 10L

  /** Per-customer order cap for kendall_tau's O(n_g²) pair join —
    * the triangle_count wedge-cap precedent: the statistic is
    * computed over each customer's FIRST KendallMaxOrders orders by
    * order key (deterministic subset), with a `capped` honesty
    * column so a reader can see which groups were bounded. The
    * fixtures' data model keeps orders/customer in the tens (cap
    * dormant, all rows `capped = false`); the 100× key-shifted sweep
    * corpus reaches ~1000 orders/customer, where the uncapped join
    * would be ~10⁹ pairs — per-group cost is now ≤ C(100,2) = 4950
    * pairs regardless of corpus scale. Mirrored in the oracle via
    * the same row_number window.
    */
  private val KendallMaxOrders = 100L

  /** Session gap for interval_overlap_join's interval construction
    * (96 h): the fixture's users emit ~2 events/day, so the 30-min
    * sessionize gap yields instant [t,t] intervals that never
    * overlap (measured: 0 rows at every sf). 96 h produces multi-day
    * activity intervals — 35/379 overlap pairs at sf0.001/sf0.01 —
    * which is the regime an interval×interval join exists for.
    * Mirrored.
    */
  private val OverlapGapMs = 345600000L

  /** Time-bucket width for interval_overlap_join's equi-join key
    * (1 week). 96 h-gap intervals span ≤ ~6 buckets in the fixture,
    * so the explode fan-out is small and bounded.
    */
  private val OverlapBucketMs = 604800000L

  /** Benford first-digit expected shares log10(1 + 1/d), d = 1..9 —
    * computed ONCE in the JVM and inlined into BOTH engines as the
    * same shortest-round-trip double literal (Double.toString), so no
    * engine evaluates a libm log at query time (transcendentals
    * differ in the last ulp across engines; literals cannot).
    */
  private val BenfordShares: Seq[Double] =
    (1 to 9).map(dd => math.log10(1.0 + 1.0 / dd))

  val defs: Map[String, QueryFn] = Map(
    // Tie-corrected Mann-Whitney AUC of embedding[0] as a scorer of
    // label >= PosLabel: per distinct score s, U gains
    // n_pos(s) · (neg_below(s) + n_neg(s)/2). Doubling removes the
    // half: u2 = Σ n_pos·(2·neg_below + n_neg) stays integral, and
    // AUC = u2 / (2·n_pos·n_neg) is the one double division.
    "auc_eval" -> ((s, d) => {
      import s.implicits._
      val scored = Tables.embeddings(s, d).select(
        element_at($"embedding", 1).as("score"),
        when($"label" >= PosLabel, 1L).otherwise(0L).as("pos"))
      val perScore = scored.groupBy($"score").agg(
        sum($"pos").as("n_pos"),
        sum(lit(1L) - $"pos").as("n_neg"))
        .withColumn("g", lit(1))
      // asc_nulls_last on every nullable order key in this file: Spark
      // ascending sorts NULLS FIRST, DuckDB's default is NULLS LAST, so
      // a null score/value/price would silently shift every downstream
      // tile/prefix-sum assignment off the oracle's (ADVICE r9)
      val run = DistributedNtile.withRunningSum(
        perScore, "g", Seq($"score".asc_nulls_last), $"n_neg", "cneg")
      run.agg(
        sum($"n_pos").as("n_pos"),
        sum($"n_neg").as("n_neg"),
        sum($"n_pos" * (lit(2L) * ($"cneg" - $"n_neg") + $"n_neg")).as("u2"))
        .select($"n_pos", $"n_neg", $"u2",
          ($"u2".cast("double") /
            (lit(2.0) * $"n_pos" * $"n_neg")).as("auc"))
    }),

    // NDCG@10 ranking evaluation (wave 47, Järvelin & Kekäläinen
    // 2002): treats each user as a query, `value` as the ranker's
    // score, and event_type as graded relevance (purchase 7, click 3,
    // view 1 — the 2^rel−1 gains pre-folded). Per user: DCG over the
    // top-10 by score, IDCG over the top-10 by gain, ndcg = dcg/idcg.
    // Two row_number passes share ONE user-keyed exchange; rows
    // outside both top-10s are dropped before the per-user aggregate,
    // so state per user is ≤ 20 rows regardless of history length.
    // Determinism: the 10 discount constants 1/log2(r+1) are shared
    // LITERALS (shortest round-trip repr — no cross-engine log2), each
    // term gain·disc is one exact IEEE product, and both engines fold
    // the ≤10 terms in rank order — dcg/idcg are bit-identical with
    // no snap; only the cross-user mean snaps (12dp decimal sum).
    "ndcg_eval" -> ((s, d) => {
      import s.implicits._
      val discArr = array(NdcgDisc.map(lit): _*)
      val base = Tables.events(s, d)
        .where($"user_id".isNotNull)
        .select($"user_id", $"event_id", $"value",
          expr("CASE event_type WHEN 'purchase' THEN 7 WHEN 'click' THEN 3" +
            " WHEN 'view' THEN 1 ELSE 0 END").cast("long").as("g"))
      val wR = Window.partitionBy($"user_id")
        .orderBy($"value".desc_nulls_last, $"event_id")
      val wI = Window.partitionBy($"user_id").orderBy($"g".desc, $"event_id")
      val ranked = base
        .withColumn("rn", row_number().over(wR))
        .withColumn("irn", row_number().over(wI))
        .where($"rn" <= NdcgK || $"irn" <= NdcgK)
        .select($"user_id", $"g", $"rn", $"irn",
          // guarded: a row kept for its irn can carry rn > K, where
          // the discount lookup must not be evaluated (ANSI element_at
          // throws out-of-bounds)
          when($"rn" <= NdcgK,
            $"g".cast("double") * element_at(discArr, $"rn")).as("td"),
          when($"irn" <= NdcgK,
            $"g".cast("double") * element_at(discArr, $"irn")).as("ti"))
      def fold(c: String) =
        s"aggregate(transform(array_sort($c), p -> p.v)," +
          " CAST(0 AS DOUBLE), (a, x) -> a + x)"
      val perUser = ranked.groupBy($"user_id").agg(
        sort_array(collect_list(when($"rn" <= NdcgK,
          struct($"rn", $"td".as("v"))))).as("dl"),
        sort_array(collect_list(when($"irn" <= NdcgK,
          struct($"irn".as("rn"), $"ti".as("v"))))).as("il"))
        .selectExpr("user_id", s"${fold("dl")} AS dcg", s"${fold("il")} AS idcg")
        .select($"user_id",
          when($"idcg" > 0, $"dcg" / $"idcg").otherwise(lit(0.0)).as("ndcg"))
      perUser.agg(
        count(lit(1)).as("n_users"),
        sum(rnd($"ndcg", 12).cast("decimal(20,12)")).as("sm"),
        coalesce(sum(when($"ndcg" === 1.0, 1L)), lit(0L)).as("n_perfect"))
        .select($"n_users",
          when($"n_users" > 0,
            rnd($"sm".cast("double") / $"n_users".cast("double"), 6))
            .as("mean_ndcg"),
          $"n_perfect")
    }),

    // Weight of Evidence / Information Value (wave 48) — the credit-
    // scoring-lineage feature-screening statistic: per category,
    // woe = ln(smoothed positive share / smoothed negative share),
    // iv_term = (share diff)·woe, and the feature's total IV. ONE
    // corpus-scale category aggregate; everything after runs on the
    // ≤|categories| grid. The ln is the one transcendental — snapped
    // to 10dp (engines' ln may differ in the last ulp); shares are
    // exact-integer ratios, the IV total sums 10dp decimals
    // (order-free).
    "woe_iv" -> ((s, d) => {
      import s.implicits._
      val cell = Tables.events(s, d)
        .select($"event_type",
          when($"value" > WoeTarget, 1L).otherwise(0L).as("y"))
        .groupBy($"event_type")
        .agg(sum($"y").as("n_pos"), (count(lit(1)) - sum($"y")).as("n_neg"))
      val tot = cell.agg(sum($"n_pos").as("pt"), sum($"n_neg").as("nt"))
      // Degenerate-corpus guard (ADVICE r11): if every row is one
      // class (pt = 0 or nt = 0) the smoothed share divides by zero
      // and ln(±Inf) flows into the rounding snap — Spark and DuckDB
      // disagree on the wreckage (NaN vs Inf). Both engines emit NULL
      // woe/iv_term for that corpus instead (mirrored CASE below).
      val nonDegenerate = $"pt" > 0L && $"nt" > 0L
      val scored = cell.crossJoin(broadcast(tot))
        .withColumn("woe", when(nonDegenerate, rnd(
          log((($"n_pos".cast("double") + 0.5) / $"pt".cast("double"))
            / (($"n_neg".cast("double") + 0.5) / $"nt".cast("double"))), 10)))
        .withColumn("iv_term", when(nonDegenerate, rnd(
          ($"n_pos".cast("double") / $"pt".cast("double")
            - $"n_neg".cast("double") / $"nt".cast("double")) * $"woe", 10)))
      val iv = scored.agg(
        sum($"iv_term".cast("decimal(28,10)")).cast("double").as("iv_total"))
      scored.crossJoin(broadcast(iv))
        .select($"event_type", $"n_pos", $"n_neg", $"woe", $"iv_term",
          $"iv_total")
        .orderBy($"event_type".asc_nulls_last)
    }),

    // Benjamini-Hochberg FDR control (wave 48, B&H 1995) over a real
    // multiple-testing family: per top-term 2×2 chi² of document
    // presence vs lang='en', p-values via the 1-df closed form
    // p = erfc(√(χ²/2)) evaluated with the Abramowitz-Stegun 7.1.26
    // rational approximation (shared literal coefficients — the only
    // cross-engine-risky op is exp, so p snaps to 10dp), then the
    // step-up rule: k = max{i : p(i) ≤ i·q/m}, reject ranks ≤ k.
    // Corpus-scale work: the distinct-presence aggregate and the
    // top-m cut; the BH walk itself runs on the m-bounded grid
    // (declared BoundedWindow).
    "fdr_bh" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
        .select($"doc_id", ($"lang" === "en").as("en"))
      // per-doc array_distinct in the projection, NOT a corpus-wide
      // SELECT DISTINCT: the presence relation arrives deduplicated
      // from the scan, so the only shuffles are the term-keyed
      // aggregates (the 10× sweep measured the distinct-shuffle
      // formulation at 215 s; this shape is simpson_diversity's)
      val pres = Tables.documents(s, d)
        .select(($"lang" === "en").as("en"),
          explode(array_distinct(filter(TF.tokens($"text"),
            t => t =!= ""))).as("term"))
      val totals = docs.agg(
        coalesce(sum(when($"en", 1L).otherwise(0L)), lit(0L)).as("en_tot"),
        coalesce(sum(when($"en", 0L).otherwise(1L)), lit(0L)).as("nen_tot"))
      val top = pres.groupBy($"term").agg(count(lit(1)).as("df_all"))
        .orderBy($"df_all".desc, $"term").limit(FdrTerms)
      val cnt = pres.join(broadcast(top.select($"term")), Seq("term"))
        .groupBy($"term")
        .agg(sum(when($"en", 1L).otherwise(0L)).as("a"),
          sum(when($"en", 0L).otherwise(1L)).as("b"))
        .crossJoin(broadcast(totals))
        .select($"term", $"a", $"b",
          ($"en_tot" - $"a").as("c"), ($"nen_tot" - $"b").as("d"),
          ($"en_tot" + $"nen_tot").as("n"))
      // χ² = n·(ad−bc)² / (r1·r2·c1·c2), zero on any degenerate margin
      val chiExpr =
        """CASE WHEN (a + b) = 0 OR (c + d) = 0 OR (a + c) = 0
          |  OR (b + d) = 0 THEN CAST(0 AS DOUBLE)
          |ELSE ((CAST(n AS DOUBLE)
          |  * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
          |     - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
          |  * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
          |     - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
          |  / (((CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE))
          |     * CAST(a + c AS DOUBLE)) * CAST(b + d AS DOUBLE)) END"""
          .stripMargin.replace("\n", " ")
      val scored = cnt
        .withColumn("chi2", expr(chiExpr))
        .withColumn("z", sqrt($"chi2" / 2.0))
        .withColumn("t", lit(1.0) / (lit(1.0) + lit(0.3275911) * $"z"))
        .withColumn("p", rnd(
          $"t" * (lit(0.254829592) + $"t" * (lit(-0.284496736)
            + $"t" * (lit(1.421413741) + $"t" * (lit(-1.453152027)
              + $"t" * lit(1.061405429))))) * exp(-($"z" * $"z")), 10))
      val m = scored.agg(count(lit(1)).as("m"))
      val ranked = scored.crossJoin(broadcast(m))
        .withColumn("rank", row_number().over(graft.operators.BoundedWindow
          .orderBy(s"fdr_bh top-$FdrTerms terms", FdrTerms,
            // NULLS LAST pinned on both engines (ADVICE r11): Spark's
            // default asc is NULLS FIRST, DuckDB's is NULLS LAST — p
            // is non-null today, but a future NaN-producing chi2 edit
            // must not silently diverge the BH rank cross-engine.
            $"p".asc_nulls_last, $"term".asc)))
        .withColumn("crit",
          rnd($"rank".cast("double") * lit(FdrQ) / $"m".cast("double"), 10))
      val k = ranked.agg(
        coalesce(max(when($"p" <= $"crit", $"rank")), lit(0)).as("k"))
      ranked.crossJoin(broadcast(k))
        .select($"term", $"chi2", $"p", $"rank", $"crit",
          ($"rank" <= $"k").as("rejected"))
        .orderBy($"rank")
    }),

    // Difference-in-differences (wave 49) — the workhorse causal
    // estimator for a natural experiment: treated = users whose
    // PRE-period purchase share is ≥ 20% (exact-integer test
    // 5·n_purchase ≥ n_events on pre-cutoff rows only — treatment
    // assignment that never peeks past the cutoff, churn_labels'
    // time-travel discipline), periods split at the midpoint of the
    // observed day span, outcome = mean event value per
    // (group, period) cell. DiD = (T_post − T_pre) − (C_post −
    // C_pre). ONE user-keyed aggregate for the flag + ONE user-keyed
    // flag join + ONE global conditional aggregate; cell means are
    // exact decimal sums over one double division, the estimate a
    // fixed IEEE chain — no snap.
    "did_estimator" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .where($"ts".isNotNull && $"user_id".isNotNull && $"value".isNotNull)
        .select($"user_id", $"value", $"event_type",
          expr("unix_millis(ts) DIV 86400000").as("day"))
      val span = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
        .select(expr("(d0 + d1) DIV 2").as("cutoff"))
      val treated = ev.crossJoin(broadcast(span))
        .where($"day" <= $"cutoff")
        .groupBy($"user_id")
        .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L))
          .as("np"), count(lit(1)).as("n"))
        .where($"np" * 5 >= $"n")
        .select($"user_id").withColumn("tr", lit(1))
      val cellAgg = ev.join(treated, Seq("user_id"), "left")
        .crossJoin(broadcast(span))
        .select($"tr".isNotNull.as("g"), ($"day" > $"cutoff").as("post"),
          $"value")
      def cnt(g: Boolean, p: Boolean) =
        count(when(col("g") === g && col("post") === p, 1))
      def sm(g: Boolean, p: Boolean) =
        sum(when(col("g") === g && col("post") === p, dec($"value")))
      val row = cellAgg.agg(
        cnt(false, false).as("n_c_pre"), cnt(false, true).as("n_c_post"),
        cnt(true, false).as("n_t_pre"), cnt(true, true).as("n_t_post"),
        sm(false, false).as("s00"), sm(false, true).as("s01"),
        sm(true, false).as("s10"), sm(true, true).as("s11"))
      def mean(sc: String, nc: String) =
        when(col(nc) > 0, col(sc).cast("double") / col(nc).cast("double"))
      row.select($"n_c_pre", $"n_c_post", $"n_t_pre", $"n_t_post",
        mean("s00", "n_c_pre").as("m_c_pre"),
        mean("s01", "n_c_post").as("m_c_post"),
        mean("s10", "n_t_pre").as("m_t_pre"),
        mean("s11", "n_t_post").as("m_t_post"))
        .withColumn("did",
          ($"m_t_post" - $"m_t_pre") - ($"m_c_post" - $"m_c_pre"))
    }),

    // Poisson bootstrap CI (wave 49, Chamandy et al. 2012 — the
    // bootstrap that actually runs at 100 TB): instead of resampling
    // rows (which needs the full dataset per replicate), each row
    // contributes an independent Poisson(1) weight per replicate,
    // derived DETERMINISTICALLY from md5(rep:event_id) via the
    // inverse CDF over shared literal thresholds — so the whole
    // R-replicate bootstrap of mean(value) is ONE scan + ONE
    // (rep)-keyed map-side-combinable aggregate, and both engines
    // reproduce it bit-for-bit. CI bounds are order statistics of
    // the R replicate means (2.5%/97.5% ranks on the R-bounded list).
    "poisson_bootstrap_ci" -> ((s, d) => {
      import s.implicits._
      // one md5 serves FOUR replicates (sigTable's 8-hex-lane idiom):
      // the hex lands in a column BETWEEN the two generators, so it
      // is evaluated once per (row, hash-group), not once per
      // (row, replicate, threshold) — the inline-md5 formulation
      // measured 249 s at the 10× sweep, this shape ~an order less
      val ev = Tables.events(s, d)
        .where($"event_id".isNotNull && $"value".isNotNull)
        .select($"event_id", $"value")
        .select($"value", $"event_id",
          explode(lit((0 until BootR / 4).toArray)).as("grp"))
        .select($"value", $"grp",
          md5(concat($"grp".cast("string"), lit(":"),
            $"event_id".cast("string"))).as("hx"))
        .select($"value", $"grp", $"hx",
          explode(lit((0 until 4).toArray)).as("lane"))
      val u = (conv(expr("substring(hx, 1 + 8 * lane, 8)"), 16, 10)
        .cast("long").cast("double") / lit(Pow32))
      val wCol = {
        val base: Column = lit(BootCum.length.toLong) // u >= last threshold
        BootCum.zipWithIndex.reverse.foldLeft(base) { case (els, (c, k)) =>
          when(u < lit(c), k.toLong).otherwise(els)
        }
      }
      val rel = ev
        .select(($"grp" * 4 + $"lane").as("rep"), wCol.as("w"), $"value")
        .groupBy($"rep")
        .agg(sum($"w").as("n_eff"),
          sum($"w" * dec($"value")).cast("double").as("sv"))
        .select($"rep", $"n_eff",
          when($"n_eff" > 0, $"sv" / $"n_eff".cast("double")).as("mean_r"))
      val ci = rel.agg(sort_array(collect_list($"mean_r")).as("l"))
      rel.crossJoin(broadcast(ci))
        .select($"rep", $"n_eff", $"mean_r",
          when(size($"l") >= 1, element_at($"l",
            greatest(lit(1), ceil(size($"l") * lit(0.025)).cast("int"))))
            .as("ci_lo"),
          when(size($"l") >= 1, element_at($"l",
            least(size($"l"), ceil(size($"l") * lit(0.975)).cast("int"))))
            .as("ci_hi"))
        .orderBy($"rep")
    }),

    // Two-sample Kolmogorov-Smirnov: sup-norm distance between the
    // click and view value distributions. Both ECDFs come from ONE
    // distinct-value relation via two distributed prefix sums; the
    // statistic row is TakeOrdered(1) on (d_stat desc, value).
    "ks_test" -> ((s, d) => {
      import s.implicits._
      val base = Tables.events(s, d)
        .filter($"event_type".isin("click", "view"))
        .select($"value",
          when($"event_type" === "click", 1L).otherwise(0L).as("ia"),
          when($"event_type" === "view", 1L).otherwise(0L).as("ib"))
      val perVal = base.groupBy($"value").agg(
        sum($"ia").as("a"), sum($"ib").as("b"))
        .withColumn("g", lit(1))
      val tot = base.agg(
        sum($"ia").as("na"), sum($"ib").as("nb"))
      val run1 = DistributedNtile.withRunningSum(
        perVal, "g", Seq($"value".asc_nulls_last), $"a", "ca")
      val run = DistributedNtile.withRunningSum(
        run1, "g", Seq($"value".asc_nulls_last), $"b", "cb")
      run.crossJoin(broadcast(tot))
        .select($"value", $"ca", $"cb", $"na", $"nb",
          abs($"ca".cast("double") / $"na".cast("double")
            - $"cb".cast("double") / $"nb".cast("double")).as("d_stat"))
        .orderBy($"d_stat".desc, $"value")
        .limit(1)
    }),

    // Exact equi-depth histogram of l_extendedprice: NTILE(16) over a
    // tie-broken total order, computed skew-free, then per-bin stats.
    // The optimizer statistic every engine keeps, as a first-class
    // relational op.
    "hist_equidepth" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .select($"l_extendedprice", $"l_orderkey", $"l_linenumber")
        .withColumn("g", lit(1))
      DistributedNtile.withNtile(li, "g",
        Seq($"l_extendedprice".asc_nulls_last, $"l_orderkey".asc_nulls_last,
          $"l_linenumber".asc_nulls_last),
        HistBins, "bin")
        .groupBy($"bin").agg(
          count(lit(1)).as("n"),
          min($"l_extendedprice").as("lo"),
          max($"l_extendedprice").as("hi"),
          dsum($"l_extendedprice").as("sum_price"))
        .orderBy($"bin")
    }),

    // First-order Markov transition matrix over per-user event
    // sequences: lag() in one user-keyed window shuffle, then counts
    // and row-conditional probabilities on the ≤|types|² aggregate.
    // The user-journey model behind funnel/next-event prediction.
    "event_transitions" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".asc_nulls_last, $"event_id".asc_nulls_last)
      val pairs = Tables.events(s, d)
        .withColumn("from_type", lag($"event_type", 1).over(w))
        .filter($"from_type".isNotNull)
        .groupBy($"from_type", $"event_type".as("to_type"))
        .agg(count(lit(1)).as("n"))
      pairs
        .withColumn("row_n", sum($"n").over(Window.partitionBy($"from_type")))
        .select($"from_type", $"to_type", $"n",
          ($"n".cast("double") / $"row_n".cast("double")).as("p"))
        .orderBy($"from_type".asc_nulls_last, $"to_type".asc_nulls_last)
    }),

    // Second-order sequence mining: top-20 event-type TRIGRAM paths
    // across user journeys (event_transitions is the first-order
    // cut). Two lags in the one user-keyed window shuffle; the path
    // aggregate is ≤|types|³ rows.
    "event_trigrams" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".asc_nulls_last, $"event_id".asc_nulls_last)
      Tables.events(s, d)
        .withColumn("e1", lag($"event_type", 2).over(w))
        .withColumn("e2", lag($"event_type", 1).over(w))
        .filter($"e1".isNotNull)
        .groupBy($"e1", $"e2", $"event_type".as("e3"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"e1".asc_nulls_last, $"e2".asc_nulls_last, $"e3".asc_nulls_last)
        .limit(20)
    }),

    // χ² association of the top-30 corpus terms with document
    // language — the classic feature-selection score for "which
    // terms are language-markers". Observed cells are counts on the
    // term×lang grid (INCLUDING absent cells via the bounded grid
    // crossJoin); expected cells are rt·ct/N within the top-terms
    // universe; contributions are decimal-snapped before the
    // per-term sum so the double total is partition-order-free.
    "chi2_terms" -> ((s, d) => {
      import s.implicits._
      val tl = LlmQueries.termTable(s, d)
        .join(Tables.documents(s, d).select($"doc_id", $"lang"), Seq("doc_id"))
        .select($"term", $"lang")
      val top = tl.groupBy($"term").agg(count(lit(1)).as("rt"))
        .orderBy($"rt".desc, $"term").limit(Chi2Terms)
      val cell = tl.join(broadcast(top.select($"term")), Seq("term"))
        .groupBy($"term", $"lang").agg(count(lit(1)).as("o"))
      val ct = cell.groupBy($"lang").agg(sum($"o").as("ct"))
      val nn = ct.agg(sum($"ct").as("nn"))
      val grid = top.crossJoin(broadcast(ct)).crossJoin(broadcast(nn))
        .join(cell, Seq("term", "lang"), "left")
        .withColumn("o", coalesce($"o", lit(0L)))
      val e = $"rt".cast("double") * $"ct".cast("double") / $"nn".cast("double")
      val diff = $"o".cast("double") - e
      // decimal(38,6), not (18,6): a per-cell (o-e)²/e is bounded only
      // by the top-term occurrence total N, which can pass 1e12 at
      // 100 TB — under ANSI mode an overflowing (18,6) snap is a
      // runtime error (ab_ttest's decimal(38,4) idiom)
      val contrib = rnd(diff * diff / e, 6).cast("decimal(38,6)")
      grid.groupBy($"term", $"rt")
        .agg(sum(contrib).cast("double").as("chi2"))
        .orderBy($"chi2".desc, $"term")
    }),

    // Tukey-fence outlier audit per event type: exact quartiles from
    // the skew-free per-group NTILE (Q1/Q3 = the tile-1/tile-3 upper
    // order statistics), fences at 1.5·IQR (dyadic — exact IEEE),
    // then one broadcast-join counting pass. The robust-statistics
    // sibling of outlier_zscore (median-based, resistant to the very
    // outliers it hunts).
    "iqr_outliers" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_type", $"value", $"event_id")
      val tiled = DistributedNtile.withNtile(
        ev, "event_type",
        Seq($"value".asc_nulls_last, $"event_id".asc_nulls_last), 4, "tile")
      val fences = tiled.groupBy($"event_type").agg(
        max(when($"tile" === 1, $"value")).as("q1"),
        max(when($"tile" === 3, $"value")).as("q3"))
      ev.join(broadcast(fences), Seq("event_type"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          first($"q1").as("q1"), first($"q3").as("q3"),
          count(when($"value" < $"q1" - lit(1.5) * ($"q3" - $"q1"), 1))
            .as("n_low"),
          count(when($"value" > $"q3" + lit(1.5) * ($"q3" - $"q1"), 1))
            .as("n_high"))
        .orderBy($"event_type")
    }),

    // Welch's two-sample t statistic for click-vs-view value — the
    // A/B-test readout. One conditional-sum aggregate carries both
    // sides' moments (counts and 2dp/4dp decimal-snapped sums are
    // exact); mean/variance/t are one fixed IEEE sequence (sqrt is
    // correctly rounded per IEEE-754, so it is cross-engine-safe).
    "ab_ttest" -> ((s, d) => {
      import s.implicits._
      val base = Tables.events(s, d)
        .filter($"event_type".isin("click", "view"))
        .select(($"event_type" === "click").as("isa"), $"value")
      val agg = base.agg(
        sum(when($"isa", 1L).otherwise(0L)).as("n1"),
        sum(when(!$"isa", 1L).otherwise(0L)).as("n2"),
        sum(when($"isa", dec($"value"))).cast("double").as("s1"),
        sum(when(!$"isa", dec($"value"))).cast("double").as("s2"),
        sum(when($"isa", rnd($"value" * $"value", 4).cast("decimal(38,4)")))
          .cast("double").as("ss1"),
        sum(when(!$"isa", rnd($"value" * $"value", 4).cast("decimal(38,4)")))
          .cast("double").as("ss2"))
      val (n1d, n2d) = ($"n1".cast("double"), $"n2".cast("double"))
      val m1 = $"s1" / n1d
      val m2 = $"s2" / n2d
      val v1 = ($"ss1" - n1d * (m1 * m1)) / (n1d - lit(1.0))
      val v2 = ($"ss2" - n2d * (m2 * m2)) / (n2d - lit(1.0))
      agg.select($"n1", $"n2", m1.as("mean_a"), m2.as("mean_b"),
        ((m1 - m2) / sqrt(v1 / n1d + v2 / n2d)).as("t_stat"))
    }),

    // Gini coefficient of per-customer revenue — the concentration
    // telemetry behind "is one tenant most of the load". Ranks come
    // from the distributed running count (no single-task sort of the
    // customer ledger); Σ rank·revenue stays exact in decimal; the
    // closing Gini identity is two divisions.
    "gini_concentration" -> ((s, d) => {
      import s.implicits._
      val r = Tables.orders(s, d).groupBy($"o_custkey")
        .agg(sum(dec($"o_totalprice")).cast("decimal(18,2)").as("rev"))
        .withColumn("g", lit(1))
      val ranked = DistributedNtile.withRunningSum(
        r, "g", Seq($"rev".asc_nulls_last, $"o_custkey".asc_nulls_last),
        lit(1L), "rank")
      val agg = ranked.agg(
        count(lit(1)).as("n_cust"),
        sum($"rev").cast("double").as("total_rev"),
        sum($"rank".cast("decimal(18,0)") * $"rev").cast("double").as("wsum"))
      val nd = $"n_cust".cast("double")
      agg.select($"n_cust", $"total_rev",
        rnd((lit(2.0) * $"wsum") / (nd * $"total_rev")
          - (nd + lit(1.0)) / nd, 6).as("gini"))
    }),

    // Per-source simple OLS of quality on document length — "which
    // sources degrade with length" as one grouped moment aggregate
    // (linear_probe's closed form, per group): n/Σx/Σy/Σxy/Σx²
    // decimal-snapped per source, slope/intercept by the two-variable
    // normal equations on the aggregate rows, identical IEEE op order
    // in both engines.
    "grouped_linear_fit" -> ((s, d) => {
      import s.implicits._
      def m(c: org.apache.spark.sql.Column) =
        sum(rnd(c, 10).cast("decimal(38,10)")).cast("double")
      val f = Tables.documents(s, d)
        .select($"source", TF.nTokens($"text").cast("long").as("nt"),
          TF.qualityScore($"text").as("y"))
        .filter($"nt" > 0)
        .select($"source", $"nt".cast("double").as("x"), $"y")
      val mom = f.groupBy($"source").agg(
        count(lit(1)).cast("double").as("n"),
        m($"x").as("sx"), m($"y").as("sy"),
        m($"x" * $"x").as("sxx"), m($"x" * $"y").as("sxy"))
      val den = $"n" * $"sxx" - $"sx" * $"sx"
      val b1 = when(den === 0.0, 0.0)
        .otherwise(($"n" * $"sxy" - $"sx" * $"sy") / den)
      mom.select($"source", $"n".cast("long").as("n_docs"),
        rnd(b1, 6).as("b1"),
        rnd((($"sy" - b1 * $"sx") / $"n"), 6).as("b0"))
        .orderBy($"source")
    }),

    // Per-group exact quartiles of order value by priority class —
    // [[DistributedNtile.withNtile]] on its REAL-group path: a
    // dominant priority class range-partitions across the cluster
    // instead of sorting in one task (the ccnet_buckets skew shape,
    // here as a first-class quantile-bands op).
    "group_quantiles" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
        .select($"o_orderpriority", $"o_totalprice", $"o_orderkey")
      DistributedNtile.withNtile(o, "o_orderpriority",
        Seq($"o_totalprice".asc_nulls_last, $"o_orderkey".asc_nulls_last),
        4, "q")
        .groupBy($"o_orderpriority", $"q").agg(
          count(lit(1)).as("n"),
          min($"o_totalprice").as("lo"),
          max($"o_totalprice").as("hi"))
        // null-ridden corpora: a null priority class must sort where
        // DuckDB puts it (NULLS LAST)
        .orderBy($"o_orderpriority".asc_nulls_last, $"q")
    }),

    // Skyline: documents on the (length, lexical-diversity) Pareto
    // frontier — no other doc is >= on both axes and > on one. The
    // prefix-max formulation: a point survives iff it holds its
    // x-column's max y AND every strictly-longer x-column maxes out
    // below it; the latter is one exclusive running max over per-x
    // maxima, descending in x.
    "pareto_front" -> ((s, d) => {
      import s.implicits._
      val p = Tables.documents(s, d).select(
        $"doc_id", $"n_chars".as("x"),
        when(length(TF.normText($"text")) === 0, lit(0L))
          .otherwise(size(array_distinct(TF.tokens($"text"))).cast("long"))
          .as("y"))
      val m = p.groupBy($"x").agg(max($"y").as("ymax"))
        .withColumn("g", lit(1))
      val r = DistributedNtile.withRunningMaxExcl(
        m, "g", Seq($"x".desc), $"ymax", "rmax")
        .select($"x", $"ymax", $"rmax")
      p.join(r, Seq("x"))
        .filter($"y" === $"ymax" && ($"rmax".isNull || $"rmax" < $"y"))
        .select($"doc_id", $"x".as("len_chars"), $"y".as("uniq_tokens"))
        .orderBy($"len_chars".desc, $"doc_id")
    }),

    // Gap-based sessionization (wave 33): the batch form of the
    // classic event-analytics primitive — per-user sessions split at
    // [[SessionGapMs]] of inactivity, with per-session rollups. One
    // user-keyed shuffle feeds the lag window, the running-sum window
    // AND the (user, session) aggregate (hash partitioning on user_id
    // satisfies all three — the interval_merge one-shuffle shape).
    // NULL timestamps sort last (both engines) and each becomes its
    // own degenerate 1-event session — dirty rows surface, nothing
    // shifts the real sessions.
    "sessionize" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select(
        $"user_id", $"event_id", $"event_type", unix_millis($"ts").as("ms"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ms".asc_nulls_last, $"event_id".asc_nulls_last)
      val sess = ev
        .withColumn("prev", lag($"ms", 1).over(w))
        .withColumn("new_s",
          when($"prev".isNull || $"ms" - $"prev" > SessionGapMs, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum($"new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          min($"ms").as("start_ms"), max($"ms").as("end_ms"),
          countDistinct($"event_type").as("n_types"))
        .withColumn("duration_ms", $"end_ms" - $"start_ms")
        .orderBy($"user_id".asc_nulls_last, $"session_id")
    }),

    // Session type-mix outliers (wave 44): score each session by the
    // squared L2 distance between its event-type distribution and
    // the corpus-wide one — the bot/anomaly screen over sessionize's
    // sessions. The absent-type terms are folded into a GLOBAL
    // constant (Σ(p_s−p_g)² = Σ_present[(p_s−p_g)²−p_g²] + Σ_all
    // p_g²), so no session×type grid is ever built: one sessionize
    // window pass + one (session, type) aggregate, linear in events.
    // Per-term values snap to decimal(18,12) before the per-session
    // sum, keeping the score partition-order-independent.
    "session_outliers" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .where($"user_id".isNotNull && $"ts".isNotNull &&
          $"event_type".isNotNull)
        .select($"user_id", $"event_id", $"event_type",
          unix_millis($"ts").as("ms"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ms".asc_nulls_last, $"event_id".asc_nulls_last)
      val sess = ev
        .withColumn("prev", lag($"ms", 1).over(w))
        .withColumn("new_s",
          when($"prev".isNull || $"ms" - $"prev" > SessionGapMs, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum($"new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val st = sess.groupBy($"user_id", $"session_id", $"event_type")
        .agg(count(lit(1)).as("c"))
      val sn = st.groupBy($"user_id", $"session_id")
        .agg(sum($"c").as("n_events"))
      val g = ev.groupBy($"event_type").agg(count(lit(1)).as("cg"))
        .crossJoin(broadcast(
          ev.groupBy().agg(count(lit(1)).cast("double").as("nn"))))
        .select($"event_type", ($"cg".cast("double") / $"nn").as("pg"))
      val const = g.agg(
        sum(rnd($"pg" * $"pg", 12).cast("decimal(18,12)")).as("csum"))
      val terms = st.join(sn, Seq("user_id", "session_id"))
        .join(broadcast(g), Seq("event_type"))
        .select($"user_id", $"session_id", $"n_events",
          rnd(($"c".cast("double") / $"n_events".cast("double") - $"pg") *
            ($"c".cast("double") / $"n_events".cast("double") - $"pg") -
            $"pg" * $"pg", 12).cast("decimal(18,12)").as("term"))
      terms.groupBy($"user_id", $"session_id")
        .agg(first($"n_events").as("n_events"), sum($"term").as("tsum"))
        .crossJoin(broadcast(const))
        .select($"user_id", $"session_id", $"n_events",
          rnd($"tsum".cast("double") + $"csum".cast("double"), 6)
            .as("score"))
        .orderBy(rnd($"tsum".cast("double") + $"csum".cast("double"), 6)
          .desc, $"user_id", $"session_id")
        .limit(20)
    }),

    // Mann-Whitney U rank-sum test with tie correction (wave 33):
    // does the click value distribution sit above view's — the
    // nonparametric sibling of ab_ttest (median-robust, the right
    // test when values are skewed). Average ranks come DOUBLED
    // (2·below + n + 1, integral) off one distributed prefix sum
    // over the distinct-value relation, so R1, U1 and the tie term
    // Σ(t³−t) are exact integers in decimal until the one closing
    // z = (U1 − n₁n₂/2)/σ_tie sequence (±,×,÷,sqrt only — sqrt is
    // IEEE-correctly-rounded, cross-engine-safe; no transcendentals).
    "mann_whitney" -> ((s, d) => {
      import s.implicits._
      val base = Tables.events(s, d)
        .filter($"event_type".isin("click", "view"))
        .select($"value",
          when($"event_type" === "click", 1L).otherwise(0L).as("ia"))
      val perVal = base.groupBy($"value").agg(
        sum($"ia").as("na"), sum(lit(1L) - $"ia").as("nb"))
        .withColumn("n", $"na" + $"nb")
        .withColumn("g", lit(1))
      val run = DistributedNtile.withRunningSum(
        perVal, "g", Seq($"value".asc_nulls_last), $"n", "cum")
      val agg = run.agg(
        sum($"na").as("n_a"), sum($"nb").as("n_b"),
        sum($"na".cast("decimal(18,0)") *
          (lit(2L) * ($"cum" - $"n") + $"n" + lit(1L)).cast("decimal(19,0)"))
          .as("r1x2"),
        sum(($"n".cast("decimal(12,0)") * $"n".cast("decimal(12,0)")
          * $"n".cast("decimal(12,0)") - $"n").cast("decimal(38,0)"))
          .as("tie3"))
      val (nad, nbd) = ($"n_a".cast("double"), $"n_b".cast("double"))
      val nd = nad + nbd
      val u1x2 = ($"r1x2" - $"n_a".cast("decimal(19,0)")
        * ($"n_a" + lit(1L)).cast("decimal(19,0)")).cast("double")
      val varU = nad * nbd / lit(12.0) *
        ((nd + lit(1.0)) - $"tie3".cast("double") / (nd * (nd - lit(1.0))))
      agg.select($"n_a", $"n_b",
        (u1x2 / lit(2.0)).as("u1"),
        $"tie3".cast("double").as("tie_term"),
        when($"n_a" === 0L || $"n_b" === 0L || $"n_a" + $"n_b" < 2L,
          lit(null).cast("double"))
          .otherwise(rnd((u1x2 - nad * nbd) / (lit(2.0) * sqrt(varU)), 6))
          .as("z_stat"))
    }),

    // Cramér's V association between event type and hour-of-day
    // (wave 33): the normalized-χ² effect size behind "is traffic
    // composition time-dependent". Contingency cells are one
    // map-side-combinable aggregate; the χ² grid is the bounded
    // |types|×24 crossJoin of the two marginals (absent cells
    // contribute their expectation, the chi2_terms convention);
    // contributions are decimal-snapped so the double total is
    // partition-order-free. NULL keys are coalesced to sentinel
    // categories up front — dirty rows form honest categories
    // instead of being dropped by null-rejecting grid joins.
    "cramers_v" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select(
        coalesce($"event_type", lit("__null__")).as("t"),
        coalesce(expr("unix_millis(ts) DIV 3600000 % 24"), lit(-1L)).as("h"))
      val cell = ev.groupBy($"t", $"h").agg(count(lit(1)).as("o"))
      val rt = cell.groupBy($"t").agg(sum($"o").as("rt"))
      val ct = cell.groupBy($"h").agg(sum($"o").as("ct"))
      val nn = cell.agg(sum($"o").as("nn"))
      val grid = rt.crossJoin(broadcast(ct)).crossJoin(broadcast(nn))
        .join(cell, Seq("t", "h"), "left")
        .withColumn("o", coalesce($"o", lit(0L)))
      val e = $"rt".cast("double") * $"ct".cast("double") / $"nn".cast("double")
      val diff = $"o".cast("double") - e
      val contrib = rnd(diff * diff / e, 6).cast("decimal(38,6)")
      val gagg = grid.agg(
        max($"nn").as("n"),
        countDistinct($"t").as("r_levels"),
        countDistinct($"h").as("c_levels"),
        sum(contrib).cast("double").as("chi2"))
      gagg.select($"n", $"r_levels", $"c_levels", $"chi2",
        when($"n".isNull || $"n" === 0L ||
          least($"r_levels", $"c_levels") < 2L, lit(null).cast("double"))
          .otherwise(rnd(sqrt($"chi2" / ($"n".cast("double") *
            (least($"r_levels", $"c_levels") - lit(1L)).cast("double"))), 6))
          .as("v"))
    }),

    // Kruskal–Wallis k-group rank test over event values by type
    // (wave 35): the k-sample generalization of mann_whitney — "do
    // ANY of the k traffic classes differ in value distribution".
    // Same skew-free machinery as its 2-sample sibling: doubled
    // average ranks (2·below + n + 1, integral) off one distributed
    // prefix sum over the DISTINCT-value relation, per-group doubled
    // rank sums as exact decimals, and the tie term Σ(t³−t) summed
    // once over distinct values. The closing H = 12/(N(N+1))·ΣR²/n
    // − 3(N+1) and its tie correction are one IEEE sequence per
    // engine; the per-group R²/(4n) contributions are
    // decimal(38,6)-snapped (chi2_terms discipline) so the
    // cross-group total is partition-order-free. NULL types form an
    // honest '__null__' group (cramers_v convention); NULL values
    // are excluded (a rank test has no rank for null). Output: one
    // row per group (n, mean rank) with the global H/H_adj repeated
    // — the readout a curation dashboard joins against.
    "kruskal_wallis" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .filter($"value".isNotNull)
        .select(coalesce($"event_type", lit("__null__")).as("g"), $"value")
      val pv = ev.groupBy($"value").agg(count(lit(1)).as("n"))
        .withColumn("one", lit(1))
      val run = DistributedNtile.withRunningSum(
        pv, "one", Seq($"value".asc), $"n", "cum")
      val ranked = run.select($"value",
        (lit(2L) * ($"cum" - $"n") + $"n" + lit(1L)).as("r2"),
        ($"n".cast("decimal(12,0)") * $"n".cast("decimal(12,0)")
          * $"n".cast("decimal(12,0)") - $"n").cast("decimal(38,0)").as("t3"))
      val glob = ranked.agg(sum($"t3").as("tie3"))
      val tot = pv.agg(sum($"n").as("nn"))
      val rg = ev.groupBy($"g", $"value").agg(count(lit(1)).as("ng"))
        .join(ranked.select($"value", $"r2"), Seq("value"))
        .groupBy($"g").agg(sum($"ng").as("n_g"),
          sum($"ng".cast("decimal(18,0)") * $"r2".cast("decimal(19,0)"))
            .as("r2_g"))
      // per-group term r2_g²/(4·n_g) is one IEEE division on exact
      // integer inputs — bit-identical cross-engine with NO snap. Do
      // NOT snap-and-decimal-sum here: Q.rnd's floor(x·10⁶) goes
      // through Spark's LONG-typed floor, which silently clamps at
      // Long.MaxValue once the term passes ~9.2e12 (exactly what
      // sf0.1 magnitudes reach — caught by the full-scale oracle
      // gate). The k terms (one per event type, bounded) sum in a
      // g-ordered fold instead, so the double sum order is pinned.
      val term = ($"r2_g".cast("double") * $"r2_g".cast("double") /
        (lit(4.0) * $"n_g".cast("double"))).as("v")
      val sums = rg.agg(
        sort_array(collect_list(struct($"g", term))).as("tl"),
        count(lit(1)).as("k"))
        .selectExpr(
          "aggregate(transform(tl, p -> p.v), CAST(0 AS DOUBLE)," +
            " (a2, x2) -> a2 + x2) AS s",
          "k")
      val nd = $"nn".cast("double")
      val h = lit(12.0) / (nd * (nd + lit(1.0))) * $"s" -
        lit(3.0) * (nd + lit(1.0))
      val c = lit(1.0) - $"tie3".cast("double") / (nd * nd * nd - nd)
      val gstats = sums.crossJoin(broadcast(tot)).crossJoin(broadcast(
          glob.select($"tie3")))
        .select($"k", $"nn",
          when($"nn" < 2L || $"k" < 2L, lit(null).cast("double"))
            .otherwise(rnd(h, 6)).as("h_stat"),
          when($"nn" < 2L || $"k" < 2L || c <= lit(0.0),
            lit(null).cast("double"))
            .otherwise(rnd(h / c, 6)).as("h_adj"))
      rg.crossJoin(broadcast(gstats))
        .select($"g", $"n_g",
          rnd($"r2_g".cast("double") / (lit(2.0) * $"n_g".cast("double")), 6)
            .as("mean_rank"),
          $"k", $"nn", $"h_stat", $"h_adj")
        .orderBy($"g")
    }),

    // Brown–Forsythe (median-centered Levene) variance-homogeneity
    // test over event values by type (wave 35): "do the k classes
    // differ in SPREAD" — the dispersion sibling of kruskal_wallis,
    // and the assumption check before any pooled-variance test.
    // Group medians come exact-then-4dp-snapped and BROADCAST back
    // onto the scan (anomaly_mad shape — the fact table never
    // shuffles); each |x − med| deviation is 4dp-snapped into
    // decimal(18,4) so the per-group Σz and Σz² moments are exact,
    // order-independent decimals (linear_probe moment discipline;
    // z·z as decimal(38,8) stays exact). The closing W statistic
    // assembles from ≤k snapped per-group terms summed in
    // decimal(38,6). NULL types → '__null__' group; NULL values
    // excluded (no deviation without a value).
    "levene_test" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .filter($"value".isNotNull)
        .select(coalesce($"event_type", lit("__null__")).as("g"), $"value")
      val med = broadcast(ev.groupBy($"g")
        .agg(rnd(expr("percentile(value, 0.5)"), 4).as("med")))
      val dev = ev.join(med, Seq("g"))
        .withColumn("z", rnd(abs($"value" - $"med"), 4).cast("decimal(18,4)"))
      val grp = dev.groupBy($"g", $"med").agg(
        count(lit(1)).as("n_g"),
        sum($"z").as("s1"),
        sum($"z" * $"z").as("s2"))
      val tot = grp.agg(sum($"n_g").as("nn"),
        sum($"s1".cast("decimal(38,4)")).as("s1t"), count(lit(1)).as("k"))
      val zbarG = $"s1".cast("double") / $"n_g".cast("double")
      val zbar = $"s1t".cast("double") / $"nn".cast("double")
      val withTot = grp.crossJoin(broadcast(tot))
      val ssbTerm = rnd($"n_g".cast("double") * (zbarG - zbar)
        * (zbarG - zbar), 6).cast("decimal(38,6)")
      val sswTerm = rnd($"s2".cast("double") -
        $"s1".cast("double") * $"s1".cast("double") / $"n_g".cast("double"), 6)
        .cast("decimal(38,6)")
      val agg = withTot.groupBy($"nn", $"k").agg(
        sum(ssbTerm).cast("double").as("ssb"),
        sum(sswTerm).cast("double").as("ssw"))
      val w = ($"nn" - $"k").cast("double") / ($"k" - lit(1L)).cast("double") *
        ($"ssb" / $"ssw")
      val gstats = agg.select($"nn", $"k", rnd($"ssb", 6).as("ssb"),
        rnd($"ssw", 6).as("ssw"),
        when($"k" < 2L || $"nn" <= $"k" || $"ssw" <= lit(0.0),
          lit(null).cast("double")).otherwise(rnd(w, 6)).as("w_stat"))
      grp.crossJoin(broadcast(gstats))
        .select($"g", $"n_g", $"med",
          rnd($"s1".cast("double") / $"n_g".cast("double"), 6)
            .as("mean_absdev"),
          $"nn", $"k", $"ssb", $"ssw", $"w_stat")
        .orderBy($"g")
    }),

    // Hill tail-index estimator (wave 53, round 12; Hill 1975): the
    // heavy-tail exponent of each event type's value distribution —
    // the number a monitoring stack watches to catch "the p999 is
    // drifting because the tail got fatter, not because the mean
    // moved". H = mean of ln(x_i/x_k) over the top-(k−1) order
    // statistics relative to the k-th; tail index α = 1/H. Scale
    // shape: ONE row_number window per type (top-k cut — the only
    // corpus-scale exchange, keyed on the group), then a broadcast
    // of the 5-row (xk, k_eff) grid back onto ≤ k rows/group;
    // per-row ln terms snap to 10dp and sum as DECIMAL(38,10)
    // (order-free); α recomputes from the SNAPPED H so both engines
    // divide identical doubles. Groups under HillMinK positive
    // values drop (mirrored); an all-equal top block gives H = 0 →
    // α NULL in both engines.
    "hill_tail_index" -> ((s, d) => {
      import s.implicits._
      val pos = Tables.events(s, d)
        .filter($"event_type".isNotNull && $"value".isNotNull &&
          dec($"value") > 0)
        .select($"event_type", $"event_id", dec($"value").cast("double").as("x"))
      val ranked = pos.withColumn("rn", row_number().over(
          Window.partitionBy($"event_type")
            .orderBy($"x".desc, $"event_id".asc)))
        .filter($"rn" <= HillK)
      val grid = ranked.groupBy($"event_type")
        .agg(min($"x").as("xk"), count(lit(1)).as("k_eff"))
        .filter($"k_eff" >= HillMinK)
      val h = ranked.join(broadcast(grid), Seq("event_type"))
        .filter($"rn" < $"k_eff")
        .select($"event_type", $"xk", $"k_eff",
          rnd(log($"x" / $"xk"), 10).cast("decimal(38,10)").as("t"))
        .groupBy($"event_type")
        .agg(max($"xk").as("x_k"), max($"k_eff").as("k_eff"),
          rnd(sum($"t").cast("double") /
            (max($"k_eff") - lit(1L)).cast("double"), 8).as("hill_h"))
      h.select($"event_type", $"k_eff", $"x_k", $"hill_h",
          when($"hill_h" > 0.0, rnd(lit(1.0) / $"hill_h", 6)).as("tail_index"))
        .orderBy($"event_type")
    }),

    // Per-customer Kendall rank correlation between order date and
    // order value (wave 35): "do this customer's orders grow over
    // time" as a distribution over customers — concordant/discordant
    // pair counting, the O(n²)-per-group statistic. The group key
    // bounds the quadratic at fixture scale (orders/customer ≤ tens)
    // but scale-up multiplies group SIZE, not group count — so since
    // round 12 the pair join runs over each customer's first
    // [[KendallMaxOrders]] orders by order key (row_number window on
    // the same custkey exchange the join shuffles on), with a
    // `capped` honesty column; see KendallMaxOrders' scaladoc for
    // the 100× arithmetic. The self-join stays a co-partitioned
    // equi-join on o_custkey — never a corpus-scale cross join. All
    // counts are integers; tau_a = (C−D)/n_pairs is the one closing
    // division. Rows with NULL custkey/date/price are excluded up
    // front (a pair statistic has no place for them), mirrored in
    // the oracle's WHERE.
    "kendall_tau" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
        .filter($"o_custkey".isNotNull && $"o_orderdate".isNotNull &&
          $"o_totalprice".isNotNull)
        .select($"o_custkey", $"o_orderkey",
          $"o_orderdate".as("od"), $"o_totalprice".as("p"))
      val kept = o.withColumn("rn", row_number().over(
          Window.partitionBy($"o_custkey").orderBy($"o_orderkey")))
        .filter($"rn" <= KendallMaxOrders).drop("rn")
      def sgn(a: Column, b: Column): Column =
        when(a < b, 1L).when(a > b, -1L).otherwise(0L)
      val pairs = kept.as("a").join(kept.as("b"),
          col("a.o_custkey") === col("b.o_custkey") &&
            col("a.o_orderkey") < col("b.o_orderkey"))
        .select(col("a.o_custkey").as("o_custkey"),
          sgn(col("a.od"), col("b.od")).as("sx"),
          sgn(col("a.p"), col("b.p")).as("sy"))
      val perCust = pairs.groupBy($"o_custkey").agg(
        count(lit(1)).as("n_pairs"),
        sum(when($"sx" * $"sy" > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when($"sx" * $"sy" < 0, 1L).otherwise(0L)).as("discordant"),
        sum(when($"sx" === 0, 1L).otherwise(0L)).as("n_tie_x"),
        sum(when($"sy" === 0, 1L).otherwise(0L)).as("n_tie_y"))
      val cnt = o.groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
      perCust.join(cnt, Seq("o_custkey"))
        .filter($"n_orders" >= KendallMinOrders)
        .select($"o_custkey", $"n_orders", $"n_pairs",
          $"concordant", $"discordant", $"n_tie_x", $"n_tie_y",
          rnd(($"concordant" - $"discordant").cast("double") /
            $"n_pairs".cast("double"), 6).as("tau_a"),
          ($"n_orders" > KendallMaxOrders).as("capped"))
        .orderBy($"o_custkey")
    }),

    // Interval × interval overlap join (wave 35): which of a user's
    // view sessions overlap which of their click sessions — the
    // attribution primitive behind "was the purchase inside an active
    // browsing window". Both interval sets are corpus-derived (the
    // sessionize construction per event type at the 96 h activity
    // gap — see [[OverlapGapMs]]), so neither side broadcasts; the
    // join is the canonical BUCKETED interval join: each interval
    // explodes into the week-buckets it spans
    // (gap-bounded sessions span few), pairs meet in a co-partitioned
    // (user, bucket) equi-join, multi-bucket double-matches collapse
    // via DISTINCT, and the exact overlap predicate verifies — no
    // nested-loop, no corpus×corpus cross join at any scale. The
    // oracle uses DuckDB's direct range join (buckets are a pure
    // execution strategy, invisible in the result). NULL-timestamp
    // degenerate sessions carry NULL bounds and drop out of interval
    // semantics identically in both engines (NULL comparisons).
    "interval_overlap_join" -> ((s, d) => {
      import s.implicits._
      def sessions(kind: String) = {
        val ev = Tables.events(s, d).filter($"event_type" === kind)
          .select($"user_id", $"event_id", unix_millis($"ts").as("ms"))
        val w = Window.partitionBy($"user_id")
          .orderBy($"ms".asc_nulls_last, $"event_id".asc_nulls_last)
        ev.withColumn("prev", lag($"ms", 1).over(w))
          .withColumn("new_s",
            when($"prev".isNull || $"ms" - $"prev" > OverlapGapMs, 1L)
              .otherwise(0L))
          .withColumn("sid", sum($"new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id", $"sid")
          .agg(count(lit(1)).as("n_ev"),
            min($"ms").as("st"), max($"ms").as("en"))
      }
      val va = sessions("view").select($"user_id",
        $"sid".as("view_session"), $"n_ev".as("n_view_events"),
        $"st".as("va_st"), $"en".as("va_en"))
      val cl = sessions("click").select($"user_id",
        $"sid".as("click_session"), $"n_ev".as("n_click_events"),
        $"st".as("cl_st"), $"en".as("cl_en"))
      val vb = va.withColumn("bucket", explode(expr(
        s"sequence(va_st DIV $OverlapBucketMs, va_en DIV $OverlapBucketMs)")))
      val cb = cl.withColumn("bucket", explode(expr(
        s"sequence(cl_st DIV $OverlapBucketMs, cl_en DIV $OverlapBucketMs)")))
      vb.join(cb, Seq("user_id", "bucket"))
        .drop("bucket").distinct()
        .filter($"va_st" <= $"cl_en" && $"cl_st" <= $"va_en")
        .select($"user_id", $"view_session", $"click_session",
          $"n_view_events", $"n_click_events",
          (least($"va_en", $"cl_en") - greatest($"va_st", $"cl_st"))
            .as("overlap_ms"))
        .orderBy($"user_id", $"view_session", $"click_session")
    }),

    // Benford first-digit conformance of order totals (wave 33): the
    // data-forensics screen for fabricated/synthetic numeric columns.
    // The leading significant digit comes from the DECIMAL string
    // rendering (both engines print scale-2 decimals identically —
    // no double formatting, no log10 at query time: expected shares
    // are [[BenfordShares]] literals). Always 9 rows (static digit
    // spine), zero-filled; one scan, 9-group aggregate.
    "benford_test" -> ((s, d) => {
      import s.implicits._
      val shares = BenfordShares.zipWithIndex
        .map { case (sh, i) => (i + 1, sh) }
        .toDF("digit", "exp_share")
      val counts = Tables.orders(s, d)
        .filter($"o_totalprice" > 0)
        .select(regexp_extract(dec($"o_totalprice").cast("string"),
          "[1-9]", 0).cast("int").as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum($"n").as("nt"))
      val ntd = $"nt".cast("double")
      val ed = ntd * $"exp_share"
      shares.join(counts, Seq("digit"), "left")
        .withColumn("n", coalesce($"n", lit(0L)))
        .crossJoin(broadcast(tot))
        .select($"digit", $"n",
          when(coalesce($"nt", lit(0L)) === 0L, lit(null).cast("double"))
            .otherwise(rnd($"n".cast("double") / ntd, 6)).as("obs_share"),
          rnd($"exp_share", 6).as("exp_share"),
          when(coalesce($"nt", lit(0L)) === 0L, lit(null).cast("double"))
            .otherwise(rnd(($"n".cast("double") - ed) *
              ($"n".cast("double") - ed) / ed, 6)).as("chi2_part"))
        .orderBy($"digit")
    }),

    // Stationary distribution of the first-order event-type Markov
    // chain (event_transitions' matrix) via MarkovIters power-
    // iteration steps. All arithmetic is scaled-integer: transition
    // probabilities are (c·10⁹) DIV c_row, each step's mass is
    // Σ(v_i·p_ij) DIV 10⁹ with the sum carried in decimal so it
    // cannot overflow at any state count, and every intermediate is
    // an exact integer — the oracle replays the identical steps as
    // unrolled CTEs (pagerank_lite's convention). Transitions into
    // states with no outgoing edge are dropped (the chain restricted
    // to its from-state domain, so mass never parks in a sink) and
    // the vector is normalized once at the END. Scale shape: ONE
    // corpus pass (the user-keyed lag window) → a ≤|types|² matrix;
    // the iteration runs on broadcast-size relations only. Null
    // event types cannot form chain states (equi-join semantics
    // would silently drop their incoming edges — excluded up front,
    // mirrored).
    "markov_stationary" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc_nulls_last, $"event_id".asc_nulls_last)
      val cnt = Tables.events(s, d)
        .filter($"event_type".isNotNull)
        .withColumn("f", lag($"event_type", 1).over(w))
        .filter($"f".isNotNull)
        .groupBy($"f", $"event_type".as("t"))
        .agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy($"f").agg(sum($"c").as("cf"))
      val states = cnt.select($"f".as("st")).distinct()
      val tr = broadcast(cnt
        .join(tot, Seq("f"))
        .join(states.select($"st".as("t")), Seq("t"))
        .select($"f", $"t",
          expr("(c * CAST(1000000000 AS BIGINT)) DIV cf").as("ps")))
      val k = states.agg(count(lit(1)).as("kk"))
      val v0 = states.crossJoin(broadcast(k))
        .select($"st", expr("CAST(1000000000 AS BIGINT) DIV kk").as("v"))
      val vN = (1 to MarkovIters).foldLeft(v0) { (v, _) =>
        v.join(tr, $"st" === $"f")
          .groupBy($"t")
          .agg(expr("CAST(sum(CAST(v AS DECIMAL(20,0)) * " +
            "CAST(ps AS DECIMAL(20,0))) DIV 1000000000 AS BIGINT)").as("v"))
          .select($"t".as("st"), $"v")
      }
      val sv = vN.agg(sum($"v").as("tv"))
      vN.crossJoin(broadcast(sv))
        .select($"st".as("state"), $"v".as("v_scaled"),
          rnd($"v".cast("double") / $"tv".cast("double"), 6).as("pi"))
        .orderBy($"state")
    }),

    // One-way ANOVA F-test over event values by type (wave 54): the
    // parametric sibling of kruskal_wallis (location) and levene_test
    // (spread) — "do the k traffic classes differ in MEAN value".
    // Same scale shape as levene: one groupBy over the fact table
    // computing exact decimal moments (value is 2dp ⇒ Σv and Σv² are
    // exact decimals, order-free), a ≤k-row totals broadcast, per-group
    // SSB/SSW terms 6dp-snapped into decimal(38,6) so the cross-group
    // sums are partition-order-free, and F assembled from the SNAPPED
    // ssb/ssw so both engines divide identical doubles. NULL types →
    // '__null__' group (cramers_v convention); NULL values excluded.
    // The fact table shuffles once (the group aggregate); everything
    // after is arithmetic on ≤k rows.
    "anova_oneway" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .filter($"value".isNotNull)
        .select(coalesce($"event_type", lit("__null__")).as("g"),
          dec($"value").as("v"))
      val grp = ev.groupBy($"g").agg(
        count(lit(1)).as("n_g"),
        sum($"v").as("s1"),
        sum(($"v" * $"v").cast("decimal(38,4)")).as("s2"))
      val tot = grp.agg(sum($"n_g").as("nn"),
        sum($"s1".cast("decimal(38,2)")).as("s1t"), count(lit(1)).as("k"))
      val meanG = $"s1".cast("double") / $"n_g".cast("double")
      val gm = $"s1t".cast("double") / $"nn".cast("double")
      val withTot = grp.crossJoin(broadcast(tot))
      val ssbTerm = rnd($"n_g".cast("double") * (meanG - gm) * (meanG - gm), 6)
        .cast("decimal(38,6)")
      val sswTerm = rnd($"s2".cast("double") -
        $"s1".cast("double") * $"s1".cast("double") / $"n_g".cast("double"), 6)
        .cast("decimal(38,6)")
      val agg2 = withTot.groupBy($"nn", $"k").agg(
        sum(ssbTerm).cast("double").as("ssb0"),
        sum(sswTerm).cast("double").as("ssw0"))
      val snapped = agg2.select($"nn", $"k",
        rnd($"ssb0", 6).as("ssb"), rnd($"ssw0", 6).as("ssw"))
      val gstats = snapped.select($"nn", $"k", $"ssb", $"ssw",
        when($"k" < 2L || $"nn" <= $"k" || $"ssw" <= lit(0.0),
          lit(null).cast("double"))
          .otherwise(rnd(($"ssb" / ($"k" - lit(1L)).cast("double")) /
            ($"ssw" / ($"nn" - $"k").cast("double")), 6)).as("f_stat"))
      grp.crossJoin(broadcast(gstats))
        .select($"g", $"n_g", rnd(meanG, 6).as("mean_g"),
          $"nn", $"k", $"ssb", $"ssw", $"f_stat")
        .orderBy($"g")
    }),

    // Jarque–Bera normality test per event type (wave 54; Jarque &
    // Bera 1980): JB = n/6·(S² + K²/4) from sample skewness S and
    // excess kurtosis K — the screen that tells a monitoring stack
    // whether z-score thresholds are even meaningful for this class.
    // Moment discipline (moments_profile precedent): values → integer
    // cents, per-group pseudo-mean μ = trunc(Σc/n) via the
    // sign-stable (Σ − Σ%n)/n formula (identical trunc-toward-zero in
    // both engines for any sign), broadcast back onto the scan; the
    // centered power sums Σd..Σd⁴ are EXACT integers/decimals (|d| ≤
    // ~10⁶ cents ⇒ d⁴ ≤ 10²⁴ in decimal(38,0); sums safe past 10¹⁰
    // rows; rows beyond that bound trip the JbDevBound guard, which
    // NULLs the group's moments identically in both engines instead
    // of Spark nulling on the d² downcast where DuckDB errors).
    // Central moments about the true mean derive from the
    // exact sums by one pinned IEEE sequence per engine (b1 = Σd/n
    // correction terms), S/K snap at 6dp, and JB recomputes from the
    // SNAPPED S/K (hill_tail_index pattern). reject_normal compares
    // against the χ²₂ 0.95 quantile embedded as one shared literal.
    // One fact-table shuffle (the group aggregate); the μ broadcast
    // is ≤k rows.
    "jarque_bera" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .filter($"value".isNotNull)
        .select(coalesce($"event_type", lit("__null__")).as("g"),
          (dec($"value") * 100).cast("long").as("c"))
      val mu = ev.groupBy($"g")
        .agg(sum($"c").as("sc"), count(lit(1)).as("nmu"))
        .selectExpr("g", "(sc - sc % nmu) DIV nmu AS mu")
      val dev = ev.join(broadcast(mu), Seq("g"))
        .withColumn("dd", $"c" - $"mu")
        // out-of-envelope guard (see JbDevBound): past the documented
        // |d| bound the d² downcast would null in Spark but ERROR in
        // DuckDB — flag such rows and poison the group symmetrically
        .withColumn("oob",
          $"dd" > lit(JbDevBound) || $"dd" < -lit(JbDevBound))
        .withColumn("d2c",
          when($"oob", lit(null)).otherwise(
            ($"dd".cast("decimal(19,0)") * $"dd".cast("decimal(19,0)"))
              .cast("decimal(19,0)")))
      val g2 = dev.groupBy($"g").agg(
        count(lit(1)).as("n"),
        sum(when($"oob", 1L).otherwise(0L)).as("n_oob"),
        sum($"dd".cast("decimal(38,0)")).as("d1"),
        sum($"d2c".cast("decimal(38,0)")).as("d2"),
        sum(($"d2c" * $"dd".cast("decimal(19,0)")).cast("decimal(38,0)"))
          .as("d3"),
        sum(($"d2c" * $"d2c").cast("decimal(38,0)")).as("d4"))
      val st = g2.select($"g", $"n", $"n_oob",
        ($"d1".cast("double") / $"n".cast("double")).as("b1"),
        ($"d2".cast("double") / $"n".cast("double")).as("r2"),
        ($"d3".cast("double") / $"n".cast("double")).as("r3"),
        ($"d4".cast("double") / $"n".cast("double")).as("r4"))
      val m = st.select($"g", $"n", $"n_oob",
        ($"r2" - $"b1" * $"b1").as("m2"),
        ($"r3" - lit(3.0) * $"b1" * $"r2" +
          lit(2.0) * $"b1" * $"b1" * $"b1").as("m3"),
        ($"r4" - lit(4.0) * $"b1" * $"r3" +
          lit(6.0) * $"b1" * $"b1" * $"r2" -
          lit(3.0) * $"b1" * $"b1" * $"b1" * $"b1").as("m4"))
      val sk = m.select($"g", $"n",
        when($"n" < 2L || $"n_oob" > 0L || $"m2" <= lit(0.0),
          lit(null).cast("double"))
          .otherwise(rnd($"m3" / ($"m2" * sqrt($"m2")), 6)).as("skewness"),
        when($"n" < 2L || $"n_oob" > 0L || $"m2" <= lit(0.0),
          lit(null).cast("double"))
          .otherwise(rnd($"m4" / ($"m2" * $"m2") - lit(3.0), 6))
          .as("kurt_excess"))
      val jb = sk.select($"g", $"n", $"skewness", $"kurt_excess",
        when($"skewness".isNull, lit(null).cast("double"))
          .otherwise(rnd($"n".cast("double") / lit(6.0) *
            ($"skewness" * $"skewness" +
              $"kurt_excess" * $"kurt_excess" / lit(4.0)), 6)).as("jb_stat"))
      jb.select($"g", $"n", $"skewness", $"kurt_excess", $"jb_stat",
          ($"jb_stat" > lit(JbCrit)).as("reject_normal"))
        .orderBy($"g")
    }),

    // Spearman rank correlation between lineitem quantity and
    // extended price (wave 54): the tie-corrected rank version of
    // Pearson — monotone association without kendall_tau's per-group
    // quadratic pair join. Rank assignment is the kruskal/mann_whitney
    // machinery: doubled average ranks 2·below + n + 1 (INTEGRAL even
    // for ties) off one distributed prefix sum over each DISTINCT
    // value relation — never a row-per-row global sort — then joined
    // back to the fact rows (the x side broadcasts: quantity has ≤50
    // distinct values; the y side is a keyed shuffle join). Pearson
    // over the doubled ranks equals Pearson over average ranks
    // (affine invariance), and every sum is an exact decimal:
    // Σr ≤ 2n² (decimal(19,0) to n = 10⁹), Σr² and Σrxry ≤ 4n³
    // (decimal(28,0)); the closing num/den assemble as exact
    // decimal(38,0) products — NO double cancellation on ~4n⁴-sized
    // near-equal terms — and rho is the one IEEE division, 6dp-snapped.
    // Exact up to n ≈ 10⁹ rows; past that the (38,0) headroom is
    // gone and the assembly would need a two-level split (documented
    // bound, 1.7×10³ × the sf0.1 corpus).
    "spearman_rho" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .filter($"l_quantity".isNotNull && $"l_extendedprice".isNotNull)
        .select($"l_quantity".as("x"), $"l_extendedprice".as("y"))
      def doubledRanks(vals: org.apache.spark.sql.DataFrame,
          cname: String, rname: String) = {
        val pv = vals.groupBy(col(cname)).agg(count(lit(1)).as("n"))
          .withColumn("one", lit(1))
        DistributedNtile.withRunningSum(
            pv, "one", Seq(col(cname).asc), $"n", "cum")
          .select(col(cname),
            (lit(2L) * ($"cum" - $"n") + $"n" + lit(1L)).as(rname))
      }
      val rx = doubledRanks(li.select($"x"), "x", "r_x")
      val ry = doubledRanks(li.select($"y"), "y", "r_y")
      val j = li.join(broadcast(rx), Seq("x")).join(ry, Seq("y"))
        .select($"r_x".cast("decimal(19,0)").as("r_x"),
          $"r_y".cast("decimal(19,0)").as("r_y"))
      val sums = j.agg(count(lit(1)).as("n"),
        sum($"r_x".cast("decimal(38,0)")).as("sx"),
        sum($"r_y".cast("decimal(38,0)")).as("sy"),
        sum(($"r_x" * $"r_y").cast("decimal(38,0)")).as("sxy"),
        sum(($"r_x" * $"r_x").cast("decimal(38,0)")).as("sxx"),
        sum(($"r_y" * $"r_y").cast("decimal(38,0)")).as("syy"))
      val f = sums.select($"n",
        ($"n".cast("decimal(10,0)") * $"sxy".cast("decimal(28,0)") -
          $"sx".cast("decimal(19,0)") * $"sy".cast("decimal(19,0)"))
          .as("num"),
        ($"n".cast("decimal(10,0)") * $"sxx".cast("decimal(28,0)") -
          $"sx".cast("decimal(19,0)") * $"sx".cast("decimal(19,0)"))
          .as("den1"),
        ($"n".cast("decimal(10,0)") * $"syy".cast("decimal(28,0)") -
          $"sy".cast("decimal(19,0)") * $"sy".cast("decimal(19,0)"))
          .as("den2"))
      f.select($"n",
        when($"den1" <= lit(0) || $"den2" <= lit(0),
          lit(null).cast("double"))
          .otherwise(rnd($"num".cast("double") /
            (sqrt($"den1".cast("double")) * sqrt($"den2".cast("double"))),
            6)).as("rho"))
    }),

    // Mutual information between document language and source (wave
    // 55): the information-theoretic dependence screen — "how much
    // does knowing the source tell you about the language" — the
    // number a corpus-mix dashboard watches to catch a crawl slice
    // drifting monolingual. I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y)))
    // over OBSERVED cells only (absent cells contribute exactly 0).
    // Scale shape: one fact-table aggregate to the joint-count
    // relation (≤|langs|·|sources| rows); marginals, entropies and
    // the closing NMI all ride that tiny relation via broadcasts.
    // Per-cell p·ln terms snap at 10dp and sum as decimal(38,10)
    // (order-free); NMI = MI/√(H(X)·H(Y)) recomputes from the
    // SNAPPED MI/H values so both engines divide identical doubles.
    // NULL lang/source form honest '__null__' levels.
    "mutual_info" -> ((s, d) => {
      import s.implicits._
      val dd = Tables.documents(s, d)
        .select(coalesce($"lang", lit("__null__")).as("x"),
          coalesce($"source", lit("__null__")).as("y"))
      val joint = dd.groupBy($"x", $"y").agg(count(lit(1)).as("cxy"))
      val mx = joint.groupBy($"x").agg(sum($"cxy").as("cx"))
      val my = joint.groupBy($"y").agg(sum($"cxy").as("cy"))
      val nn = joint.agg(sum($"cxy").as("nn"))
      val cells = joint.join(broadcast(mx), Seq("x"))
        .join(broadcast(my), Seq("y")).crossJoin(broadcast(nn))
      val miTerm = rnd(($"cxy".cast("double") / $"nn".cast("double")) *
        log(($"cxy".cast("double") * $"nn".cast("double")) /
          ($"cx".cast("double") * $"cy".cast("double"))), 10)
        .cast("decimal(38,10)")
      val mi0 = cells.agg(sum(miTerm).cast("double").as("mi0"))
      def hSide(marg: org.apache.spark.sql.DataFrame, c: String,
          h0: String, k: String) =
        marg.crossJoin(broadcast(nn)).agg(
          sum(rnd((col(c).cast("double") / $"nn".cast("double")) *
            log(col(c).cast("double") / $"nn".cast("double")), 10)
            .cast("decimal(38,10)")).cast("double").as(h0),
          count(lit(1)).as(k))
      val hx = hSide(mx, "cx", "hx0", "k_x")
      val hy = hSide(my, "cy", "hy0", "k_y")
      dd.agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(mi0)).crossJoin(broadcast(hx))
        .crossJoin(broadcast(hy))
        .select($"n", $"k_x", $"k_y",
          rnd($"mi0", 8).as("mi"),
          rnd(lit(0.0) - $"hx0", 8).as("h_x"),
          rnd(lit(0.0) - $"hy0", 8).as("h_y"))
        .select($"n", $"k_x", $"k_y", $"mi", $"h_x", $"h_y",
          when($"h_x" * $"h_y" > 0.0,
            rnd($"mi" / sqrt($"h_x" * $"h_y"), 6)).as("nmi"))
    }),

    // Jensen–Shannon divergence of each source's token distribution
    // from the corpus-wide mix (wave 55): the symmetric, bounded
    // (≤ ln 2) sibling of dsir/histogram_drift for the question "which
    // crawl slice is most off-mix", robust where raw KL blows up on
    // zero cells. Vocabulary is bounded: the global top-[[JsdTerms]]
    // terms keep their identity, everything else collapses into one
    // '__oov__' bucket, so per-source state is a FIXED ≤ 201-vector
    // at any corpus size. Scale shape: the memoized term relation
    // aggregates once to (src, t) cells; the full src × term grid is
    // a bounded crossJoin (chi2_terms precedent — absent cells MUST
    // contribute their q·ln 2 mass); per-cell P/Q contributions snap
    // at 10dp and sum as decimal(38,10); the closing ½ΣP + ½ΣQ is
    // one pinned IEEE sequence on the exact decimal sums.
    "js_divergence" -> ((s, d) => {
      import s.implicits._
      val tl = LlmQueries.termTable(s, d)
        .join(Tables.documents(s, d).select($"doc_id",
          coalesce($"source", lit("__null__")).as("src")), Seq("doc_id"))
        .select($"src", $"term")
      val top = tl.groupBy($"term").agg(count(lit(1)).as("ct"))
        .orderBy($"ct".desc, $"term").limit(JsdTerms).select($"term")
      val mapped = tl
        .join(broadcast(top.withColumn("keep", lit(1))), Seq("term"), "left")
        .select($"src",
          when($"keep".isNotNull, $"term").otherwise(lit("__oov__")).as("t"))
      val cell = mapped.groupBy($"src", $"t").agg(count(lit(1)).as("c"))
      val cs = cell.groupBy($"src").agg(sum($"c").as("cs"))
      val q = cell.groupBy($"t").agg(sum($"c").as("cq"))
      val nn = cell.agg(sum($"c").as("nn"))
      val grid = cs.crossJoin(broadcast(q)).crossJoin(broadcast(nn))
        .join(cell, Seq("src", "t"), "left")
        .withColumn("c", coalesce($"c", lit(0L)))
      val p = $"c".cast("double") / $"cs".cast("double")
      val qd = $"cq".cast("double") / $"nn".cast("double")
      val m = (p + qd) / lit(2.0)
      val pTerm = when($"c" > 0L, rnd(p * log(p / m), 10))
        .otherwise(lit(0.0)).cast("decimal(38,10)")
      val qTerm = rnd(qd * log(qd / m), 10).cast("decimal(38,10)")
      grid.groupBy($"src").agg(max($"cs").as("n_tokens"),
          sum(pTerm).cast("double").as("sp"),
          sum(qTerm).cast("double").as("sq"))
        .select($"src", $"n_tokens",
          rnd(lit(0.5) * $"sp" + lit(0.5) * $"sq", 8).as("jsd"))
        .orderBy($"src")
    }),

    // MAP@K + MRR@K retrieval evaluation (wave 56): the order-aware
    // binary-relevance metrics that complete ndcg_eval's graded-gain
    // readout — the pair every retrieval eval harness reports
    // together. Same per-user ranking substrate as ndcg_eval (score
    // = value, one user-keyed window exchange carrying the rank, the
    // cumulative-relevant prefix AND the full-partition relevant
    // total — three window functions, ONE shuffle); precision@r
    // terms for relevant ranks ≤ K snap at 10dp and sum as
    // decimal(38,10) per user (order-free — no per-user fold
    // needed); AP divides by min(R, K), RR is 1/first-relevant-rank
    // within K (0 if none). Users with zero relevant events are
    // excluded (AP undefined — the standard convention, mirrored).
    // The closing MAP/MRR means divide exact decimal sums of the
    // 8dp-snapped per-user values.
    "map_eval" -> ((s, d) => {
      import s.implicits._
      val base = Tables.events(s, d)
        .where($"user_id".isNotNull)
        .select($"user_id", $"event_id", $"value",
          when($"event_type".isin("purchase", "click"), 1L).otherwise(0L)
            .as("rel"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"value".desc_nulls_last, $"event_id")
      val ranked = base
        .withColumn("rn", row_number().over(w))
        .withColumn("cumrel", sum($"rel").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        // full-partition total on the SAME (partition, order) spec —
        // only the frame differs, so Spark fuses all three window
        // functions into ONE Window operator on ONE exchange
        // (an orderless partitionBy spec would plan a second one)
        .withColumn("r_tot", sum($"rel").over(
          w.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      val per = ranked.filter($"rn" <= MapK)
        .groupBy($"user_id").agg(
          max($"r_tot").as("r_tot"),
          sum(when($"rel" === 1L,
            rnd($"cumrel".cast("double") / $"rn".cast("double"), 10)
              .cast("decimal(38,10)"))).as("ap_num"),
          min(when($"rel" === 1L, $"rn")).as("first_rel"))
      val perUser = per.filter($"r_tot" > 0L)
        .select($"user_id",
          rnd(coalesce($"ap_num", lit(0).cast("decimal(38,10)"))
            .cast("double") /
            least($"r_tot", lit(MapK.toLong)).cast("double"), 8).as("ap"),
          when($"first_rel".isNotNull,
            rnd(lit(1.0) / $"first_rel".cast("double"), 8))
            .otherwise(lit(0.0)).as("rr"))
      perUser.agg(count(lit(1)).as("n_users"),
          sum($"ap".cast("decimal(38,8)")).as("sap"),
          sum($"rr".cast("decimal(38,8)")).as("srr"))
        .select($"n_users",
          when($"n_users" > 0L, rnd($"sap".cast("double") /
            $"n_users".cast("double"), 6)).as("map_at_k"),
          when($"n_users" > 0L, rnd($"srr".cast("double") /
            $"n_users".cast("double"), 6)).as("mrr_at_k"))
    }),

    // Cumulative-gains / lift table by score decile (wave 57): the
    // model-evaluation readout a targeting team actually consumes —
    // "the top decile captures X% of positives at Y× base rate" —
    // completing auc_eval (threshold-free ranking quality) and
    // classifier_eval (fixed-threshold confusion) with the
    // decile-level decision table. Deciles come from
    // [[DistributedNtile.withNtile]] over (score desc, vec_id) —
    // exact SQL NTILE semantics with no single-task corpus sort —
    // then everything is integer arithmetic on a ≤10-row relation:
    // the cumulative runs through BoundedWindow, gains/lifts are
    // exact-integer ratios snapped at 6dp. Guards: a corpus with
    // zero positives yields NULL gain/lift rather than ±Inf.
    "lift_table" -> ((s, d) => {
      import s.implicits._
      val scored = Tables.embeddings(s, d).select(
        $"vec_id",
        element_at($"embedding", 1).as("score"),
        when($"label" >= PosLabel, 1L).otherwise(0L).as("pos"))
        .withColumn("g", lit(1))
      val tiled = DistributedNtile.withNtile(
        scored, "g", Seq($"score".desc_nulls_last, $"vec_id".asc), 10,
        "decile")
      val per = tiled.groupBy($"decile").agg(
        count(lit(1)).as("n"), sum($"pos").as("n_pos"))
      val tot = per.agg(sum($"n").as("nt"), sum($"n_pos").as("pt"))
      val w = graft.operators.BoundedWindow
        .orderBy("lift_table: <=10 deciles", 10L, $"decile".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      per.withColumn("cum_n", sum($"n").over(w))
        .withColumn("cum_pos", sum($"n_pos").over(w))
        .crossJoin(broadcast(tot))
        .select($"decile", $"n", $"n_pos",
          rnd($"n_pos".cast("double") / $"n".cast("double"), 6)
            .as("resp_rate"),
          when($"pt" > 0L,
            rnd($"cum_pos".cast("double") / $"pt".cast("double"), 6))
            .as("gain"),
          when($"pt" > 0L && $"cum_n" > 0L,
            rnd(($"cum_pos".cast("double") / $"pt".cast("double")) /
              ($"cum_n".cast("double") / $"nt".cast("double")), 6))
            .as("lift"))
        .orderBy($"decile")
    }),

    // CUPED variance reduction (wave 58; Deng, Xu, Kohavi & Walker
    // 2013): the pre-experiment covariate adjustment every modern
    // experimentation platform applies before reading a metric —
    // θ = cov(x,y)/var(x) over per-user (pre-period x, post-period y)
    // value sums, and the variance the adjusted metric would have:
    // var(y_adj) = var(y)·(1 − ρ²), an IDENTITY, so no second pass
    // over the data is needed. One fact scan to per-user conditional
    // cent sums (exact longs), then the spearman-style exact
    // decimal(38,0) moment assembly — covariance and variances as
    // exact integers, NO double cancellation — and three pinned
    // closing divisions on snapped inputs. The time split is the
    // ingest window's integer midpoint (psi_stability's convention).
    "cuped_adjust" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .filter($"ts".isNotNull && $"user_id".isNotNull &&
          $"value".isNotNull)
        .select($"user_id",
          expr("unix_millis(ts) DIV 86400000").as("day"),
          (dec($"value") * 100).cast("long").as("c"))
      val mid = broadcast(ev.agg(min($"day").as("d0"), max($"day").as("d1"))
        .selectExpr("(d0 + d1 + 1) DIV 2 AS mid"))
      val per = ev.crossJoin(mid)
        .groupBy($"user_id").agg(
          coalesce(sum(when($"day" < $"mid", $"c")), lit(0L)).as("x"),
          coalesce(sum(when($"day" >= $"mid", $"c")), lit(0L)).as("y"))
      val sums = per.agg(count(lit(1)).as("n"),
        sum($"x".cast("decimal(38,0)")).as("sx"),
        sum($"y".cast("decimal(38,0)")).as("sy"),
        sum(($"x".cast("decimal(19,0)") * $"y".cast("decimal(19,0)"))
          .cast("decimal(38,0)")).as("sxy"),
        sum(($"x".cast("decimal(19,0)") * $"x".cast("decimal(19,0)"))
          .cast("decimal(38,0)")).as("sxx"),
        sum(($"y".cast("decimal(19,0)") * $"y".cast("decimal(19,0)"))
          .cast("decimal(38,0)")).as("syy"))
      val asm = sums.select($"n",
        ($"n".cast("decimal(10,0)") * $"sxy".cast("decimal(28,0)") -
          $"sx".cast("decimal(19,0)") * $"sy".cast("decimal(19,0)"))
          .as("cv"),
        ($"n".cast("decimal(10,0)") * $"sxx".cast("decimal(28,0)") -
          $"sx".cast("decimal(19,0)") * $"sx".cast("decimal(19,0)"))
          .as("vx"),
        ($"n".cast("decimal(10,0)") * $"syy".cast("decimal(28,0)") -
          $"sy".cast("decimal(19,0)") * $"sy".cast("decimal(19,0)"))
          .as("vy"))
      val st = asm.select($"n",
        when($"vx" > 0,
          rnd($"cv".cast("double") / $"vx".cast("double"), 6)).as("theta"),
        when($"vx" > 0 && $"vy" > 0,
          rnd(($"cv".cast("double") * $"cv".cast("double")) /
            ($"vx".cast("double") * $"vy".cast("double")), 6)).as("rho2"),
        when($"n" > 0L,
          rnd($"vy".cast("double") /
            ($"n".cast("double") * $"n".cast("double")), 4)).as("var_y"))
      st.select($"n".as("n_users"), $"theta", $"rho2", $"var_y",
        when($"rho2".isNotNull && $"var_y".isNotNull,
          rnd($"var_y" * (lit(1.0) - $"rho2"), 4)).as("var_y_adj"))
    }),

    // Minimum detectable effect at 80% power / 5% two-sided α per
    // event type (wave 60): the pre-experiment sizing readout every
    // platform shows next to a metric — "with this n and this σ, the
    // smallest lift you could detect is X (Y% of the mean)". MDE =
    // (z_{0.975} + z_{0.80})·σ·√(2/n), the standard two-sample
    // normal approximation; the z quantiles are solved once by
    // bisection on erf and embedded as shared literals (no inverse
    // CDF at query time in either engine). σ and the mean assemble
    // from EXACT integer-cent moment sums via the spearman-style
    // decimal(38,0) products — no double cancellation — with one
    // pinned closing sequence. One fact scan, ≤k-row arithmetic.
    "mde_power" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .filter($"value".isNotNull)
        .select(coalesce($"event_type", lit("__null__")).as("g"),
          (dec($"value") * 100).cast("long").as("c"))
      val grp = ev.groupBy($"g").agg(
        count(lit(1)).as("n"),
        sum($"c".cast("decimal(38,0)")).as("s1"),
        sum(($"c".cast("decimal(19,0)") * $"c".cast("decimal(19,0)"))
          .cast("decimal(38,0)")).as("s2"))
      val asm = grp.select($"g", $"n",
        ($"n".cast("decimal(10,0)") * $"s2".cast("decimal(28,0)") -
          $"s1".cast("decimal(19,0)") * $"s1".cast("decimal(19,0)"))
          .as("vnum"),
        $"s1")
      val nd = $"n".cast("double")
      val stats = asm.select($"g", $"n",
        rnd($"s1".cast("double") / nd / lit(100.0), 6).as("mean_v"),
        when($"n" >= 2L && $"vnum" > 0,
          rnd(sqrt($"vnum".cast("double") /
            (nd * (nd - lit(1.0)))) / lit(100.0), 6)).as("sd_v"))
      stats.select($"g", $"n", $"mean_v", $"sd_v",
          when($"sd_v".isNotNull,
            rnd(lit(ZSum) * $"sd_v" * sqrt(lit(2.0) / nd), 6))
            .as("mde_abs"))
        .select($"g", $"n", $"mean_v", $"sd_v", $"mde_abs",
          when($"mde_abs".isNotNull && $"mean_v" > 0.0,
            rnd($"mde_abs" / $"mean_v", 6)).as("mde_rel"))
        .orderBy($"g")
    }),

    // Entropy rate of the event-type Markov chain (wave 60; Shannon
    // 1948, H = −Σᵢ πᵢ Σⱼ p(j|i)·ln p(j|i)): the one number that
    // says how PREDICTABLE user journeys are — composing the
    // markov_stationary substrate (same lag-window transition
    // counts, same integer-scaled 10-step power iteration for π)
    // with the transition entropies. p(j|i) uses the EXACT c/cf
    // integer ratio (not the iteration's scaled ps); per-transition
    // terms snap at 10dp and sum as decimal(38,10); the normalized
    // rate divides by ln(k) from the SNAPPED H. One fact-table
    // window pass; everything after rides the ≤k² transition
    // relation.
    //
    // Subchain scope (ADVICE r12): like markov_stationary, the chain
    // is restricted to SOURCE states — transitions into a type that
    // never appears as a source (an absorbing terminal type) are
    // excluded by the states join, so `n_transitions` counts
    // transitions within that source-state subchain, not every
    // observed (f, t) pair; the stationary vector and H are over the
    // same subchain. The oracle mirrors the restriction.
    "markov_entropy_rate" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc_nulls_last, $"event_id".asc_nulls_last)
      val cnt = Tables.events(s, d)
        .filter($"event_type".isNotNull)
        .withColumn("f", lag($"event_type", 1).over(w))
        .filter($"f".isNotNull)
        .groupBy($"f", $"event_type".as("t"))
        .agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy($"f").agg(sum($"c").as("cf"))
      val states = cnt.select($"f".as("st")).distinct()
      val tr = broadcast(cnt
        .join(tot, Seq("f"))
        .join(states.select($"st".as("t")), Seq("t"))
        .select($"f", $"t",
          expr("(c * CAST(1000000000 AS BIGINT)) DIV cf").as("ps")))
      val k = states.agg(count(lit(1)).as("kk"))
      val v0 = states.crossJoin(broadcast(k))
        .select($"st", expr("CAST(1000000000 AS BIGINT) DIV kk").as("v"))
      val vN = (1 to MarkovIters).foldLeft(v0) { (v, _) =>
        v.join(tr, $"st" === $"f")
          .groupBy($"t")
          .agg(expr("CAST(sum(CAST(v AS DECIMAL(20,0)) * " +
            "CAST(ps AS DECIMAL(20,0))) DIV 1000000000 AS BIGINT)").as("v"))
          .select($"t".as("st"), $"v")
      }
      val sv = vN.agg(sum($"v").as("tv"))
      val pij = $"c".cast("double") / $"cf".cast("double")
      val piI = $"v".cast("double") / $"tv".cast("double")
      val term = rnd(piI * (pij * log(pij)), 10).cast("decimal(38,10)")
      val hAgg = cnt.join(tot, Seq("f"))
        .join(vN.select($"st".as("f"), $"v"), Seq("f"))
        .crossJoin(broadcast(sv)).crossJoin(broadcast(k))
        .agg(max($"kk").as("k_states"),
          count(lit(1)).as("n_transitions"),
          sum(term).cast("double").as("h0"))
      hAgg.select($"k_states", $"n_transitions",
          rnd(lit(0.0) - $"h0", 6).as("entropy_rate"))
        .select($"k_states", $"n_transitions", $"entropy_rate",
          when($"k_states" > 1L,
            rnd($"entropy_rate" / log($"k_states".cast("double")), 6))
            .as("normalized_rate"))
    }),

    // Simpson's-paradox screen (wave 63; Simpson 1951): does the
    // quantity→price relationship REVERSE inside any return-flag
    // stratum relative to the pooled fit — the aggregation trap every
    // analytics reviewer checks before trusting a pooled slope. Both
    // the pooled and per-stratum LS slopes assemble from EXACT
    // integer moments (x = integer quantity units, y = price cents;
    // the spearman-style decimal(38,0) products — no double
    // cancellation), snap at 6dp, and the reversal flag compares the
    // SNAPPED signs. One fact scan to a ≤|strata|-row moment
    // relation; the pooled row is the same relation re-aggregated.
    "simpson_check" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .filter($"l_quantity".isNotNull && $"l_extendedprice".isNotNull)
        .select(coalesce($"l_returnflag", lit("__null__")).as("g"),
          $"l_quantity".cast("long").as("x"),
          (dec($"l_extendedprice") * 100).cast("long").as("y"))
      val mom = li.groupBy($"g").agg(
        count(lit(1)).as("n"),
        sum($"x".cast("decimal(38,0)")).as("sx"),
        sum($"y".cast("decimal(38,0)")).as("sy"),
        sum(($"x".cast("decimal(19,0)") * $"y".cast("decimal(19,0)"))
          .cast("decimal(38,0)")).as("sxy"),
        sum(($"x".cast("decimal(19,0)") * $"x".cast("decimal(19,0)"))
          .cast("decimal(38,0)")).as("sxx"))
      def slopeCols(src: org.apache.spark.sql.DataFrame) = src.select(
        src("*"),
        ($"n".cast("decimal(10,0)") * $"sxy".cast("decimal(28,0)") -
          $"sx".cast("decimal(19,0)") * $"sy".cast("decimal(19,0)"))
          .as("num"),
        ($"n".cast("decimal(10,0)") * $"sxx".cast("decimal(28,0)") -
          $"sx".cast("decimal(19,0)") * $"sx".cast("decimal(19,0)"))
          .as("den"))
      val per = slopeCols(mom).select($"g", $"n",
        when($"den" > 0,
          rnd($"num".cast("double") / $"den".cast("double"), 6))
          .as("slope"))
      val pooled = slopeCols(mom.agg(
          sum($"n").as("n"),
          sum($"sx".cast("decimal(38,0)")).as("sx"),
          sum($"sy".cast("decimal(38,0)")).as("sy"),
          sum($"sxy".cast("decimal(38,0)")).as("sxy"),
          sum($"sxx".cast("decimal(38,0)")).as("sxx")))
        .select($"n".as("n_total"),
          when($"den" > 0,
            rnd($"num".cast("double") / $"den".cast("double"), 6))
            .as("pooled_slope"))
      per.crossJoin(broadcast(pooled))
        .select($"g", $"n", $"slope", $"n_total", $"pooled_slope",
          ($"slope".isNotNull && $"pooled_slope".isNotNull &&
            (($"slope" > 0.0 && $"pooled_slope" < 0.0) ||
              ($"slope" < 0.0 && $"pooled_slope" > 0.0))).as("reversed"))
        .orderBy($"g")
    }))

  /** Power-iteration step count for markov_stationary — enough for a
    * handful-of-states chain to settle at 6dp, small enough that the
    * unrolled-CTE oracle and the chained tiny joins stay readable.
    * Mirrored in the oracle's CTE count.
    */
  private val MarkovIters = 10

  /** Jarque–Bera 5% critical value — the χ²₂ 0.95 quantile,
    * −2·ln(0.05). Computed once HERE; the oracle embeds the shortest
    * round-trip decimal repr so both engines compare the identical
    * double and no log is evaluated at query time in either engine.
    */
  /** jarque_bera per-row deviation bound, in cents (ADVICE r12): the
    * exact-moment discipline is proven for |d| ≤ 10⁶ cents (d⁴ ≤
    * 10²⁴ ⇒ power sums safe in decimal(38,0) past 10¹⁰ rows). Beyond
    * it the two engines used to FAIL DIFFERENTLY on the d² downcast —
    * Spark (non-ANSI) nulls on overflow where DuckDB errors — so both
    * sides now flag out-of-bound rows identically and NULL the
    * group's moments, making the out-of-envelope failure mode
    * symmetric and visible instead of engine-dependent.
    */
  private val JbDevBound: Long = 1000000L

  private val JbCrit: Double = -2.0 * math.log(0.05)
  private def jbCritSql: String =
    s"CAST('${java.lang.Double.toString(JbCrit)}' AS DOUBLE)"

  /** js_divergence identity-vocabulary bound: the global top-N terms
    * keep their identity, the rest collapse into '__oov__' — so the
    * per-source distribution vector is ≤ N+1 cells at ANY corpus
    * size. Mirrored in the oracle.
    */
  private val JsdTerms = 200

  /** map_eval cutoff K (ndcg_eval's NdcgK by value — independent
    * constants, no coupling). Mirrored in the oracle.
    */
  private val MapK = 10

  /** mde_power normal quantiles — z_{0.975} (two-sided 5% α) and
    * z_{0.80} (80% power), solved once by bisection on erf; their
    * one-IEEE-add sum is embedded in both engines via shortest
    * round-trip repr so no inverse CDF runs at query time.
    */
  private val Z975 = 1.9599639845400536
  private val Z80 = 0.8416212335729141
  private val ZSum: Double = Z975 + Z80
  private def zSumSql: String =
    s"CAST('${java.lang.Double.toString(ZSum)}' AS DOUBLE)"

  import LlmQueries.{NORM, NTOK, TOKS}

  val oracles: Map[String, String] = Map(
    "auc_eval" ->
      s"""WITH e AS (SELECT embedding[1] AS score,
         |  CASE WHEN label >= $PosLabel THEN 1 ELSE 0 END AS pos
         | FROM embeddings),
         |g AS (SELECT score, CAST(sum(pos) AS BIGINT) AS n_pos,
         |  CAST(sum(1 - pos) AS BIGINT) AS n_neg FROM e GROUP BY score),
         |r AS (SELECT n_pos, n_neg,
         |  CAST(coalesce(sum(n_neg) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS below FROM g)
         |SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
         | CAST(sum(n_neg) AS BIGINT) AS n_neg,
         | CAST(sum(n_pos * (2 * below + n_neg)) AS BIGINT) AS u2,
         | CAST(sum(n_pos * (2 * below + n_neg)) AS DOUBLE)
         |   / (2.0 * CAST(sum(n_pos) AS BIGINT) * CAST(sum(n_neg) AS BIGINT))
         |   AS auc
         |FROM r""".stripMargin,

    // same shared discount literals, same rank-ordered fold, same
    // 12dp decimal mean
    "ndcg_eval" ->
      s"""WITH e AS (SELECT user_id, event_id, value,
         |  CAST(CASE event_type WHEN 'purchase' THEN 7 WHEN 'click' THEN 3
         |    WHEN 'view' THEN 1 ELSE 0 END AS BIGINT) AS g
         | FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT user_id, g,
         |  row_number() OVER (PARTITION BY user_id
         |    ORDER BY value DESC NULLS LAST, event_id) AS rn,
         |  row_number() OVER (PARTITION BY user_id
         |    ORDER BY g DESC, event_id) AS irn FROM e),
         |f AS (SELECT * FROM r WHERE rn <= $NdcgK OR irn <= $NdcgK),
         |g1 AS (SELECT user_id,
         |  list(CAST(g AS DOUBLE) * ($ndcgDiscSql)[rn] ORDER BY rn)
         |    FILTER (WHERE rn <= $NdcgK) AS dl,
         |  list(CAST(g AS DOUBLE) * ($ndcgDiscSql)[irn] ORDER BY irn)
         |    FILTER (WHERE irn <= $NdcgK) AS il
         | FROM f GROUP BY user_id),
         |s2 AS (SELECT user_id,
         |  list_reduce(list_prepend(CAST(0 AS DOUBLE), coalesce(dl, [])),
         |    (a, x) -> a + x) AS dcg,
         |  list_reduce(list_prepend(CAST(0 AS DOUBLE), coalesce(il, [])),
         |    (a, x) -> a + x) AS idcg
         | FROM g1),
         |n AS (SELECT user_id,
         |  CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END AS ndcg FROM s2)
         |SELECT CAST(count(*) AS BIGINT) AS n_users,
         | CASE WHEN count(*) > 0 THEN ${Q.duckRnd(
          s"CAST(sum(CAST(${Q.duckRnd("ndcg", 12)} AS DECIMAL(20,12))) AS DOUBLE)"
            + " / count(*)", 6)} END AS mean_ndcg,
         | CAST(coalesce(sum(CASE WHEN ndcg = 1.0 THEN 1 ELSE 0 END), 0)
         |   AS BIGINT) AS n_perfect
         |FROM n""".stripMargin,

    // same exact-integer shares, same ln arg op order, same 10dp
    // snaps, same decimal IV total
    "woe_iv" ->
      s"""WITH cell AS (SELECT event_type,
         |  CAST(sum(CASE WHEN value > $WoeTarget THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_pos,
         |  CAST(count(*) - sum(CASE WHEN value > $WoeTarget THEN 1 ELSE 0
         |    END) AS BIGINT) AS n_neg
         | FROM events GROUP BY event_type),
         |tot AS (SELECT CAST(sum(n_pos) AS BIGINT) AS pt,
         |  CAST(sum(n_neg) AS BIGINT) AS nt FROM cell),
         |sc AS (SELECT event_type, n_pos, n_neg,
         |  CASE WHEN pt > 0 AND nt > 0 THEN ${Q.duckRnd(
          "ln(((CAST(n_pos AS DOUBLE) + 0.5) / CAST(pt AS DOUBLE))"
            + " / ((CAST(n_neg AS DOUBLE) + 0.5) / CAST(nt AS DOUBLE)))",
          10)} END AS woe,
         |  CAST(n_pos AS DOUBLE) / CAST(pt AS DOUBLE)
         |    - CAST(n_neg AS DOUBLE) / CAST(nt AS DOUBLE) AS dp,
         |  pt, nt
         | FROM cell CROSS JOIN tot),
         |sc2 AS (SELECT event_type, n_pos, n_neg, woe,
         |  CASE WHEN pt > 0 AND nt > 0
         |    THEN ${Q.duckRnd("dp * woe", 10)} END AS iv_term FROM sc),
         |iv AS (SELECT CAST(sum(CAST(iv_term AS DECIMAL(28,10)))
         |  AS DOUBLE) AS iv_total FROM sc2)
         |SELECT event_type, n_pos, n_neg, woe, iv_term, iv_total
         |FROM sc2 CROSS JOIN iv
         |ORDER BY event_type NULLS LAST""".stripMargin,

    // same distinct presence relation, same top-m cut, same
    // closed-form 1-df χ², same A&S 7.1.26 literals, same step-up
    "fdr_bh" -> {
      val chi =
        """CASE WHEN (a + b) = 0 OR (c + d) = 0 OR (a + c) = 0
          |  OR (b + d) = 0 THEN CAST(0 AS DOUBLE)
          |ELSE ((CAST(n AS DOUBLE)
          |  * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
          |     - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
          |  * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
          |     - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
          |  / (((CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE))
          |     * CAST(a + c AS DOUBLE)) * CAST(b + d AS DOUBLE)) END"""
          .stripMargin.replace("\n", " ")
      s"""WITH docs AS (SELECT doc_id, lang = 'en' AS en FROM documents),
         |pl AS (SELECT lang = 'en' AS en,
         |   unnest(list_distinct(list_filter($TOKS, t -> t <> '')))
         |     AS term
         |  FROM documents),
         |tt AS (SELECT
         |  CAST(coalesce(sum(CASE WHEN en THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS en_tot,
         |  CAST(coalesce(sum(CASE WHEN en THEN 0 ELSE 1 END), 0)
         |    AS BIGINT) AS nen_tot FROM docs),
         |top AS (SELECT term, count(*) AS df_all FROM pl GROUP BY term
         |  ORDER BY df_all DESC, term LIMIT $FdrTerms),
         |cnt AS (SELECT pl.term,
         |  CAST(sum(CASE WHEN en THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |  CAST(sum(CASE WHEN en THEN 0 ELSE 1 END) AS BIGINT) AS b
         | FROM pl JOIN top ON pl.term = top.term GROUP BY pl.term),
         |grid AS (SELECT term, a, b, en_tot - a AS c, nen_tot - b AS d,
         |  en_tot + nen_tot AS n FROM cnt CROSS JOIN tt),
         |ch AS (SELECT term, $chi AS chi2 FROM grid),
         |zz AS (SELECT term, chi2, sqrt(chi2 / 2.0) AS z FROM ch),
         |tz AS (SELECT term, chi2, z,
         |  1.0 / (1.0 + 0.3275911 * z) AS t FROM zz),
         |pp AS (SELECT term, chi2, ${Q.duckRnd(
          "t * (0.254829592 + t * (-0.284496736 + t * (1.421413741"
            + " + t * (-1.453152027 + t * 1.061405429)))) * exp(-(z * z))",
          10)} AS p FROM tz),
         |mm AS (SELECT count(*) AS m FROM pp),
         |rk AS (SELECT term, chi2, p,
         |  CAST(row_number() OVER (ORDER BY p NULLS LAST, term) AS INTEGER) AS rank
         | FROM pp),
         |cr AS (SELECT term, chi2, p, rank,
         |  ${Q.duckRnd(s"CAST(rank AS DOUBLE) * $FdrQ / CAST(m AS DOUBLE)",
          10)} AS crit FROM rk CROSS JOIN mm),
         |kk AS (SELECT CAST(coalesce(max(CASE WHEN p <= crit THEN rank
         |  END), 0) AS INTEGER) AS k FROM cr)
         |SELECT term, chi2, p, rank, crit, rank <= k AS rejected
         |FROM cr CROSS JOIN kk ORDER BY rank""".stripMargin
    },

    // same midpoint cutoff, same signup-treated flag, same exact
    // decimal cell means, same fixed-order closing chain
    "did_estimator" ->
      """WITH e AS (SELECT user_id, value, event_type,
        |   (epoch_us(ts) // 1000) // 86400000 AS day
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |   AND value IS NOT NULL),
        |cut AS (SELECT (min(day) + max(day)) // 2 AS cutoff FROM e),
        |tr AS (SELECT user_id FROM (SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np,
        |    CAST(count(*) AS BIGINT) AS n
        |   FROM e CROSS JOIN cut WHERE day <= cutoff GROUP BY user_id)
        |  WHERE np * 5 >= n),
        |f AS (SELECT tr.user_id IS NOT NULL AS g, e.day > cutoff AS post,
        |   e.value
        |  FROM e LEFT JOIN tr ON e.user_id = tr.user_id CROSS JOIN cut),
        |a AS (SELECT
        |  CAST(count(CASE WHEN NOT g AND NOT post THEN 1 END) AS BIGINT)
        |    AS n_c_pre,
        |  CAST(count(CASE WHEN NOT g AND post THEN 1 END) AS BIGINT)
        |    AS n_c_post,
        |  CAST(count(CASE WHEN g AND NOT post THEN 1 END) AS BIGINT)
        |    AS n_t_pre,
        |  CAST(count(CASE WHEN g AND post THEN 1 END) AS BIGINT)
        |    AS n_t_post,
        |  CAST(sum(CASE WHEN NOT g AND NOT post
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s00,
        |  CAST(sum(CASE WHEN NOT g AND post
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s01,
        |  CAST(sum(CASE WHEN g AND NOT post
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s10,
        |  CAST(sum(CASE WHEN g AND post
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s11
        | FROM f),
        |m AS (SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
        |  CASE WHEN n_c_pre > 0 THEN s00 / n_c_pre END AS m_c_pre,
        |  CASE WHEN n_c_post > 0 THEN s01 / n_c_post END AS m_c_post,
        |  CASE WHEN n_t_pre > 0 THEN s10 / n_t_pre END AS m_t_pre,
        |  CASE WHEN n_t_post > 0 THEN s11 / n_t_post END AS m_t_post
        | FROM a)
        |SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
        | m_c_pre, m_c_post, m_t_pre, m_t_post,
        | (m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS did
        |FROM m""".stripMargin,

    // same md5-derived uniforms, same shared inverse-CDF literals,
    // same decimal-weighted sums, same order-statistic CI ranks
    "poisson_bootstrap_ci" -> {
      val u = "(CAST(('0x' || substring(md5(CAST(rep // 4 AS VARCHAR)" +
        " || ':' || CAST(event_id AS VARCHAR)), 1 + 8 * (rep % 4), 8))" +
        s" AS BIGINT) / $Pow32)"
      s"""WITH reps AS (SELECT unnest(range(0, $BootR)) AS rep),
         |e AS (SELECT event_id, value FROM events
         |  WHERE event_id IS NOT NULL AND value IS NOT NULL),
         |wts AS (SELECT rep, ${bootCumSql(u)} AS w, value
         |  FROM e CROSS JOIN reps),
         |rel AS (SELECT CAST(rep AS INTEGER) AS rep,
         |   CAST(sum(w) AS BIGINT) AS n_eff,
         |   CAST(sum(w * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
         |  FROM wts GROUP BY rep),
         |mr AS (SELECT rep, n_eff,
         |   CASE WHEN n_eff > 0 THEN sv / n_eff END AS mean_r FROM rel),
         |ci AS (SELECT list_sort(list(mean_r) FILTER (mean_r IS NOT NULL))
         |   AS l FROM mr)
         |SELECT rep, n_eff, mean_r,
         | CASE WHEN len(l) >= 1 THEN
         |   l[greatest(1, CAST(ceil(len(l) * 0.025) AS INTEGER))] END
         |   AS ci_lo,
         | CASE WHEN len(l) >= 1 THEN
         |   l[least(len(l), CAST(ceil(len(l) * 0.975) AS INTEGER))] END
         |   AS ci_hi
         |FROM mr CROSS JOIN ci ORDER BY rep""".stripMargin
    },

    "ks_test" ->
      """WITH base AS (SELECT value,
        |  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
        |  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ib
        | FROM events WHERE event_type IN ('click', 'view')),
        |g AS (SELECT value, CAST(sum(ia) AS BIGINT) AS a,
        |  CAST(sum(ib) AS BIGINT) AS b FROM base GROUP BY value),
        |t AS (SELECT CAST(sum(ia) AS BIGINT) AS na,
        |  CAST(sum(ib) AS BIGINT) AS nb FROM base),
        |r AS (SELECT value,
        |  CAST(sum(a) OVER (ORDER BY value
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
        |  CAST(sum(b) OVER (ORDER BY value
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
        | FROM g)
        |SELECT value, ca, cb, na, nb,
        | abs(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
        |   - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) AS d_stat
        |FROM r CROSS JOIN t
        |ORDER BY d_stat DESC, value LIMIT 1""".stripMargin,

    "hist_equidepth" ->
      s"""WITH b AS (SELECT l_extendedprice,
         |  CAST(ntile($HistBins) OVER (ORDER BY l_extendedprice,
         |    l_orderkey, l_linenumber) AS INTEGER) AS bin
         | FROM lineitem)
         |SELECT bin, count(*) AS n,
         | min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
         | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         |   AS sum_price
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "event_transitions" ->
      """WITH p AS (SELECT from_type, event_type AS to_type FROM (
        | SELECT event_type, lag(event_type) OVER (
        |   PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        | FROM events) f WHERE from_type IS NOT NULL),
        |c AS (SELECT from_type, to_type, count(*) AS n
        | FROM p GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n,
        | CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type)
        |   AS DOUBLE) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,

    "event_trigrams" ->
      """WITH p AS (SELECT
        |  lag(event_type, 2) OVER w AS e1,
        |  lag(event_type, 1) OVER w AS e2,
        |  event_type AS e3
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1, e2, e3, count(*) AS n FROM p WHERE e1 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin,

    "chi2_terms" ->
      s"""WITH t AS (SELECT lang, unnest($TOKS) AS term FROM documents),
         |tl AS (SELECT lang, term FROM t WHERE term <> ''),
         |top AS (SELECT term, count(*) AS rt FROM tl GROUP BY term
         |  ORDER BY rt DESC, term LIMIT $Chi2Terms),
         |cell AS (SELECT term, lang, count(*) AS o FROM tl
         |  JOIN top USING (term) GROUP BY term, lang),
         |ct AS (SELECT lang, CAST(sum(o) AS BIGINT) AS ct
         |  FROM cell GROUP BY lang),
         |nn AS (SELECT CAST(sum(ct) AS BIGINT) AS nn FROM ct),
         |grid AS (SELECT top.term, top.rt, ct.lang, ct.ct, nn.nn,
         |  coalesce(cell.o, 0) AS o
         | FROM top CROSS JOIN ct CROSS JOIN nn
         | LEFT JOIN cell ON cell.term = top.term AND cell.lang = ct.lang),
         |x AS (SELECT term, rt,
         |  CAST(o AS DOUBLE)
         |    - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE)
         |    AS diff,
         |  CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE) AS e
         | FROM grid)
         |SELECT term, rt,
         | CAST(sum(CAST(${Q.duckRnd("diff * diff / e", 6)}
         |   AS DECIMAL(38,6))) AS DOUBLE) AS chi2
         |FROM x GROUP BY term, rt ORDER BY chi2 DESC, term""".stripMargin,

    "iqr_outliers" ->
      """WITH t AS (SELECT event_type, value,
        |  ntile(4) OVER (PARTITION BY event_type
        |    ORDER BY value, event_id) AS tile FROM events),
        |f AS (SELECT event_type,
        |  max(CASE WHEN tile = 1 THEN value END) AS q1,
        |  max(CASE WHEN tile = 3 THEN value END) AS q3
        | FROM t GROUP BY event_type)
        |SELECT e.event_type, count(*) AS n, f.q1, f.q3,
        | CAST(count(CASE WHEN value < q1 - 1.5 * (q3 - q1) THEN 1 END)
        |   AS BIGINT) AS n_low,
        | CAST(count(CASE WHEN value > q3 + 1.5 * (q3 - q1) THEN 1 END)
        |   AS BIGINT) AS n_high
        |FROM events e JOIN f USING (event_type)
        |GROUP BY e.event_type, f.q1, f.q3 ORDER BY event_type""".stripMargin,

    "ab_ttest" ->
      s"""WITH b AS (SELECT event_type = 'click' AS isa, value FROM events
         | WHERE event_type IN ('click', 'view')),
         |a AS (SELECT
         |  CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |  CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |  CAST(sum(CASE WHEN isa THEN CAST(value AS DECIMAL(18,2)) END)
         |    AS DOUBLE) AS s1,
         |  CAST(sum(CASE WHEN NOT isa THEN CAST(value AS DECIMAL(18,2)) END)
         |    AS DOUBLE) AS s2,
         |  CAST(sum(CASE WHEN isa THEN
         |    CAST(${Q.duckRnd("value * value", 4)} AS DECIMAL(38,4)) END)
         |    AS DOUBLE) AS ss1,
         |  CAST(sum(CASE WHEN NOT isa THEN
         |    CAST(${Q.duckRnd("value * value", 4)} AS DECIMAL(38,4)) END)
         |    AS DOUBLE) AS ss2
         | FROM b)
         |SELECT n1, n2,
         | s1 / CAST(n1 AS DOUBLE) AS mean_a,
         | s2 / CAST(n2 AS DOUBLE) AS mean_b,
         | ((s1 / CAST(n1 AS DOUBLE)) - (s2 / CAST(n2 AS DOUBLE)))
         |  / sqrt(((ss1 - CAST(n1 AS DOUBLE) * ((s1 / CAST(n1 AS DOUBLE))
         |      * (s1 / CAST(n1 AS DOUBLE)))) / (CAST(n1 AS DOUBLE) - 1.0))
         |      / CAST(n1 AS DOUBLE)
         |    + ((ss2 - CAST(n2 AS DOUBLE) * ((s2 / CAST(n2 AS DOUBLE))
         |      * (s2 / CAST(n2 AS DOUBLE)))) / (CAST(n2 AS DOUBLE) - 1.0))
         |      / CAST(n2 AS DOUBLE)) AS t_stat
         |FROM a""".stripMargin,

    "gini_concentration" ->
      s"""WITH r AS (SELECT o_custkey,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
         |    AS rev
         | FROM orders GROUP BY o_custkey),
         |k AS (SELECT rev, CAST(row_number() OVER (ORDER BY rev, o_custkey)
         |    AS DECIMAL(18,0)) AS rank FROM r),
         |a AS (SELECT count(*) AS n_cust,
         |  CAST(sum(rev) AS DOUBLE) AS total_rev,
         |  CAST(sum(rank * rev) AS DOUBLE) AS wsum FROM k)
         |SELECT n_cust, total_rev,
         | ${Q.duckRnd(
             "(2.0 * wsum) / (CAST(n_cust AS DOUBLE) * total_rev)" +
               " - (CAST(n_cust AS DOUBLE) + 1.0) / CAST(n_cust AS DOUBLE)",
             6)} AS gini
         |FROM a""".stripMargin,

    "grouped_linear_fit" ->
      s"""WITH f AS (SELECT source, CAST($NTOK AS DOUBLE) AS x,
         |  ${LlmQueries.duckQuality} AS y
         | FROM documents WHERE $NTOK > 0),
         |m AS (SELECT source, CAST(count(*) AS DOUBLE) AS n,
         |  CAST(sum(CAST(${Q.duckRnd("x", 10)} AS DECIMAL(38,10))) AS DOUBLE) AS sx,
         |  CAST(sum(CAST(${Q.duckRnd("y", 10)} AS DECIMAL(38,10))) AS DOUBLE) AS sy,
         |  CAST(sum(CAST(${Q.duckRnd("x * x", 10)} AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
         |  CAST(sum(CAST(${Q.duckRnd("x * y", 10)} AS DECIMAL(38,10))) AS DOUBLE) AS sxy
         | FROM f GROUP BY source),
         |c AS (SELECT source, n, sx, sy,
         |  CASE WHEN n * sxx - sx * sx = 0.0 THEN 0.0
         |       ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS b1
         | FROM m)
         |SELECT source, CAST(n AS BIGINT) AS n_docs,
         | ${Q.duckRnd("b1", 6)} AS b1,
         | ${Q.duckRnd("(sy - b1 * sx) / n", 6)} AS b0
         |FROM c ORDER BY source""".stripMargin,

    "group_quantiles" ->
      """WITH b AS (SELECT o_orderpriority, o_totalprice,
        |  CAST(ntile(4) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS q
        | FROM orders)
        |SELECT o_orderpriority, q, count(*) AS n,
        | min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM b GROUP BY o_orderpriority, q
        |ORDER BY o_orderpriority, q""".stripMargin,

    "pareto_front" ->
      s"""WITH p AS (SELECT doc_id, n_chars AS x,
         |  CASE WHEN length($NORM) = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(len(list_distinct($TOKS)) AS BIGINT) END AS y
         | FROM documents),
         |m AS (SELECT x, max(y) AS ymax FROM p GROUP BY x),
         |r AS (SELECT x, ymax, max(ymax) OVER (ORDER BY x DESC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rmax FROM m)
         |SELECT doc_id, x AS len_chars, y AS uniq_tokens
         |FROM p JOIN r USING (x)
         |WHERE y = ymax AND (rmax IS NULL OR rmax < y)
         |ORDER BY len_chars DESC, doc_id""".stripMargin,

    // same ms derivation (epoch_us // 1000 = unix_millis), same gap
    // flag (NULL-ts rows each open their own degenerate session in
    // both engines), same one-key rollup
    "sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_us(ts) // 1000 AS ms FROM events),
         |f AS (SELECT user_id, event_id, event_type, ms,
         |  CASE WHEN lag(ms) OVER w IS NULL
         |        OR ms - lag(ms) OVER w > $SessionGapMs
         |       THEN 1 ELSE 0 END AS new_s
         | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         |s AS (SELECT user_id, event_type, ms,
         |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS session_id
         | FROM f)
         |SELECT user_id, session_id, count(*) AS n_events,
         | min(ms) AS start_ms, max(ms) AS end_ms,
         | CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
         | max(ms) - min(ms) AS duration_ms
         |FROM s GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,

    // same session construction, same folded-constant decomposition,
    // same decimal(18,12) per-term snap
    "session_outliers" -> {
      val score = "CAST(tsum AS DOUBLE) + CAST(csum AS DOUBLE)"
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |    epoch_us(ts) // 1000 AS ms FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |    AND event_type IS NOT NULL),
         |f AS (SELECT user_id, event_id, event_type, ms,
         |  CASE WHEN lag(ms) OVER w IS NULL
         |        OR ms - lag(ms) OVER w > $SessionGapMs
         |       THEN 1 ELSE 0 END AS new_s
         | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         |s AS (SELECT user_id, event_type,
         |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS session_id
         | FROM f),
         |st AS (SELECT user_id, session_id, event_type, count(*) AS c
         |  FROM s GROUP BY 1, 2, 3),
         |sn AS (SELECT user_id, session_id,
         |    CAST(sum(c) AS BIGINT) AS n_events
         |  FROM st GROUP BY 1, 2),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM e),
         |g AS (SELECT event_type, CAST(count(*) AS DOUBLE) / nn AS pg
         |  FROM e, nn GROUP BY event_type, nn),
         |cst AS (SELECT sum(CAST(${Q.duckRnd("pg * pg", 12)}
         |    AS DECIMAL(18,12))) AS csum FROM g),
         |terms AS (SELECT st.user_id, st.session_id, sn.n_events,
         |    CAST(${Q.duckRnd(
        "(CAST(c AS DOUBLE) / CAST(n_events AS DOUBLE) - pg)" +
          " * (CAST(c AS DOUBLE) / CAST(n_events AS DOUBLE) - pg)" +
          " - pg * pg", 12)} AS DECIMAL(18,12)) AS term
         |  FROM st JOIN sn ON st.user_id = sn.user_id
         |    AND st.session_id = sn.session_id
         |  JOIN g ON st.event_type = g.event_type),
         |a AS (SELECT user_id, session_id, any_value(n_events) AS n_events,
         |    sum(term) AS tsum
         |  FROM terms GROUP BY 1, 2)
         |SELECT user_id, session_id, n_events,
         |  ${Q.duckRnd(score, 6)} AS score
         |FROM a, cst
         |ORDER BY ${Q.duckRnd(score, 6)} DESC, user_id, session_id
         |LIMIT 20""".stripMargin
    },

    // same doubled average ranks off the same distinct-value prefix
    // sum, same exact-decimal R1/U1/tie-term, same closing IEEE
    // sequence for z
    "mann_whitney" ->
      """WITH base AS (SELECT value,
        |  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
        | FROM events WHERE event_type IN ('click', 'view')),
        |g AS (SELECT value, CAST(sum(ia) AS BIGINT) AS na,
        |  CAST(sum(1 - ia) AS BIGINT) AS nb FROM base GROUP BY value),
        |r AS (SELECT na, nb, na + nb AS n,
        |  CAST(sum(na + nb) OVER (ORDER BY value
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum
        | FROM g),
        |a AS (SELECT
        |  CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b,
        |  sum(CAST(na AS DECIMAL(18,0))
        |    * CAST(2 * (cum - n) + n + 1 AS DECIMAL(19,0))) AS r1x2,
        |  sum(CAST(CAST(n AS DECIMAL(12,0)) * CAST(n AS DECIMAL(12,0))
        |    * CAST(n AS DECIMAL(12,0)) - n AS DECIMAL(38,0))) AS tie3
        | FROM r)
        |SELECT n_a, n_b,
        | CAST(r1x2 - CAST(n_a AS DECIMAL(19,0))
        |   * CAST(n_a + 1 AS DECIMAL(19,0)) AS DOUBLE) / 2.0 AS u1,
        | CAST(tie3 AS DOUBLE) AS tie_term,
        | CASE WHEN n_a = 0 OR n_b = 0 OR n_a + n_b < 2 THEN NULL
        |  ELSE floor(((CAST(r1x2 - CAST(n_a AS DECIMAL(19,0))
        |      * CAST(n_a + 1 AS DECIMAL(19,0)) AS DOUBLE)
        |    - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |   / (2.0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
        |     * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
        |       - CAST(tie3 AS DOUBLE)
        |         / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
        |           * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0))))))
        |   * 1000000.0 + 0.5) / 1000000.0
        | END AS z_stat
        |FROM a""".stripMargin,

    // same sentinel-coalesced keys, same bounded marginal grid with
    // expected-count cells, same decimal-snapped contributions
    "cramers_v" ->
      s"""WITH e AS (SELECT coalesce(event_type, '__null__') AS t,
         |  coalesce(((epoch_us(ts) // 1000) // 3600000) % 24, -1) AS h
         | FROM events),
         |cell AS (SELECT t, h, count(*) AS o FROM e GROUP BY t, h),
         |rt AS (SELECT t, CAST(sum(o) AS BIGINT) AS rt FROM cell GROUP BY t),
         |ct AS (SELECT h, CAST(sum(o) AS BIGINT) AS ct FROM cell GROUP BY h),
         |nn AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cell),
         |grid AS (SELECT rt.t, rt.rt, ct.h, ct.ct, nn.nn,
         |  coalesce(cell.o, 0) AS o
         | FROM rt CROSS JOIN ct CROSS JOIN nn
         | LEFT JOIN cell ON cell.t = rt.t AND cell.h = ct.h),
         |x AS (SELECT nn, t, h,
         |  CAST(o AS DOUBLE)
         |    - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE)
         |    AS diff,
         |  CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE) AS ee
         | FROM grid),
         |a AS (SELECT max(nn) AS n,
         |  CAST(count(DISTINCT t) AS BIGINT) AS r_levels,
         |  CAST(count(DISTINCT h) AS BIGINT) AS c_levels,
         |  CAST(sum(CAST(${Q.duckRnd("diff * diff / ee", 6)}
         |    AS DECIMAL(38,6))) AS DOUBLE) AS chi2
         | FROM x)
         |SELECT n, r_levels, c_levels, chi2,
         | CASE WHEN n IS NULL OR n = 0 OR least(r_levels, c_levels) < 2
         |  THEN NULL
         |  ELSE ${Q.duckRnd(
             "sqrt(chi2 / (CAST(n AS DOUBLE)" +
               " * CAST(least(r_levels, c_levels) - 1 AS DOUBLE)))", 6)}
         | END AS v
         |FROM a""".stripMargin,

    // same doubled average ranks off the same distinct-value prefix
    // sum, same exact-decimal group rank sums and tie term, same
    // decimal(38,6)-snapped R²/(4n) contributions, same closing IEEE
    // sequence for H and its tie correction
    "kruskal_wallis" -> {
      val hExpr = "12.0 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0))" +
        " * s - 3.0 * (CAST(nn AS DOUBLE) + 1.0)"
      val cExpr = "1.0 - CAST(tie3 AS DOUBLE) / (CAST(nn AS DOUBLE)" +
        " * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE))"
      s"""WITH e AS (SELECT coalesce(event_type, '__null__') AS g, value
         |  FROM events WHERE value IS NOT NULL),
         |pv AS (SELECT value, count(*) AS n FROM e GROUP BY value),
         |r AS (SELECT value, n,
         |  CAST(sum(n) OVER (ORDER BY value
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum
         | FROM pv),
         |rk AS (SELECT value, 2 * (cum - n) + n + 1 AS r2,
         |  CAST(CAST(n AS DECIMAL(12,0)) * CAST(n AS DECIMAL(12,0))
         |    * CAST(n AS DECIMAL(12,0)) - n AS DECIMAL(38,0)) AS t3
         | FROM r),
         |tie AS (SELECT sum(t3) AS tie3 FROM rk),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM pv),
         |rg AS (SELECT g, CAST(sum(ng) AS BIGINT) AS n_g,
         |  sum(CAST(ng AS DECIMAL(18,0)) * CAST(r2 AS DECIMAL(19,0)))
         |    AS r2_g
         | FROM (SELECT g, value, count(*) AS ng FROM e GROUP BY g, value) gv
         | JOIN rk USING (value) GROUP BY g),
         |sums AS (SELECT list_reduce(
         |    list_prepend(CAST(0 AS DOUBLE),
         |      list(CAST(r2_g AS DOUBLE) * CAST(r2_g AS DOUBLE)
         |        / (4.0 * CAST(n_g AS DOUBLE)) ORDER BY g)),
         |    (a2, x2) -> a2 + x2) AS s, count(*) AS k FROM rg),
         |gs AS (SELECT k, nn,
         |  CASE WHEN nn < 2 OR k < 2 THEN NULL
         |   ELSE ${Q.duckRnd(hExpr, 6)} END AS h_stat,
         |  CASE WHEN nn < 2 OR k < 2 OR ($cExpr) <= 0.0 THEN NULL
         |   ELSE ${Q.duckRnd(s"($hExpr) / ($cExpr)", 6)} END AS h_adj
         | FROM sums CROSS JOIN tot CROSS JOIN tie)
         |SELECT rg.g, rg.n_g,
         | ${Q.duckRnd(
             "CAST(r2_g AS DOUBLE) / (2.0 * CAST(n_g AS DOUBLE))", 6)}
         |   AS mean_rank,
         | gs.k, gs.nn, gs.h_stat, gs.h_adj
         |FROM rg CROSS JOIN gs ORDER BY g""".stripMargin
    },

    // same 4dp-snapped group medians and deviations, same exact
    // decimal moments, same decimal(38,6)-snapped SSB/SSW terms,
    // same closing W sequence
    "levene_test" -> {
      val zbarG = "CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE)"
      val zbar = "CAST(s1t AS DOUBLE) / CAST(nn AS DOUBLE)"
      s"""WITH e AS (SELECT coalesce(event_type, '__null__') AS g, value
         |  FROM events WHERE value IS NOT NULL),
         |m AS (SELECT g, ${Q.duckRnd("quantile_cont(value, 0.5)", 4)} AS med
         | FROM e GROUP BY g),
         |d AS (SELECT e.g, m.med,
         |  CAST(${Q.duckRnd("abs(e.value - m.med)", 4)} AS DECIMAL(18,4)) AS z
         | FROM e JOIN m USING (g)),
         |grp AS (SELECT g, med, CAST(count(*) AS BIGINT) AS n_g,
         |  sum(z) AS s1, sum(z * z) AS s2 FROM d GROUP BY g, med),
         |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS nn,
         |  sum(CAST(s1 AS DECIMAL(38,4))) AS s1t, count(*) AS k FROM grp),
         |wt AS (SELECT grp.g, grp.med, grp.n_g, grp.s1, grp.s2,
         |  tot.nn, tot.s1t, tot.k FROM grp CROSS JOIN tot),
         |agg AS (SELECT nn, k,
         |  CAST(sum(CAST(${Q.duckRnd(
               s"CAST(n_g AS DOUBLE) * (($zbarG) - ($zbar))" +
                 s" * (($zbarG) - ($zbar))", 6)}
         |    AS DECIMAL(38,6))) AS DOUBLE) AS ssb,
         |  CAST(sum(CAST(${Q.duckRnd(
               "CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)" +
                 " / CAST(n_g AS DOUBLE)", 6)}
         |    AS DECIMAL(38,6))) AS DOUBLE) AS ssw
         | FROM wt GROUP BY nn, k),
         |gs AS (SELECT nn, k, ${Q.duckRnd("ssb", 6)} AS ssb_r,
         |  ${Q.duckRnd("ssw", 6)} AS ssw_r,
         |  CASE WHEN k < 2 OR nn <= k OR ssw <= 0.0 THEN NULL
         |   ELSE ${Q.duckRnd(
               "CAST(nn - k AS DOUBLE) / CAST(k - 1 AS DOUBLE)" +
                 " * (ssb / ssw)", 6)} END AS w_stat
         | FROM agg)
         |SELECT grp.g, grp.n_g, grp.med,
         | ${Q.duckRnd("CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE)", 6)}
         |   AS mean_absdev,
         | gs.nn, gs.k, gs.ssb_r AS ssb, gs.ssw_r AS ssw, gs.w_stat
         |FROM grp CROSS JOIN gs ORDER BY g""".stripMargin
    },

    // same null exclusion, same bounded per-customer pair join, same
    // integer concordance counts, same single closing division
    // same top-k cut (row_number tie-broken by event_id), same 10dp
    // ln-term snap + decimal sum, same alpha from the SNAPPED H
    "hill_tail_index" ->
      s"""WITH pos AS (SELECT event_type, event_id,
         |    CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS x
         |  FROM events WHERE event_type IS NOT NULL
         |    AND value IS NOT NULL AND CAST(value AS DECIMAL(18,2)) > 0),
         |rk AS (SELECT event_type, event_id, x,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY x DESC, event_id) AS rn
         |  FROM pos),
         |top AS (SELECT * FROM rk WHERE rn <= $HillK),
         |grid AS (SELECT event_type, min(x) AS xk, count(*) AS k_eff
         |  FROM top GROUP BY event_type HAVING count(*) >= $HillMinK),
         |tm AS (SELECT t.event_type, g.xk, g.k_eff,
         |    ${Q.duckRnd("ln(t.x / g.xk)", 10)} AS tt
         |  FROM top t JOIN grid g USING (event_type)
         |  WHERE t.rn < g.k_eff),
         |h AS (SELECT event_type,
         |    CAST(max(k_eff) AS BIGINT) AS k_eff, max(xk) AS x_k,
         |    ${Q.duckRnd(
        "CAST(sum(CAST(tt AS DECIMAL(38,10))) AS DOUBLE)" +
          " / CAST(max(k_eff) - 1 AS DOUBLE)", 8)} AS hill_h
         |  FROM tm GROUP BY event_type)
         |SELECT event_type, k_eff, x_k, hill_h,
         |  CASE WHEN hill_h > 0.0
         |    THEN ${Q.duckRnd("1.0 / hill_h", 6)} END AS tail_index
         |FROM h ORDER BY event_type""".stripMargin,

    "kendall_tau" ->
      s"""WITH o AS (SELECT o_custkey, o_orderkey,
         |  o_orderdate AS od, o_totalprice AS p
         | FROM orders WHERE o_custkey IS NOT NULL
         |  AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
         |kept AS (SELECT o_custkey, o_orderkey, od, p FROM (
         |  SELECT *, row_number() OVER (PARTITION BY o_custkey
         |    ORDER BY o_orderkey) AS rn FROM o) WHERE rn <= $KendallMaxOrders),
         |p2 AS (SELECT a.o_custkey AS ck,
         |  CASE WHEN a.od < b.od THEN 1 WHEN a.od > b.od THEN -1 ELSE 0 END
         |    AS sx,
         |  CASE WHEN a.p < b.p THEN 1 WHEN a.p > b.p THEN -1 ELSE 0 END
         |    AS sy
         | FROM kept a JOIN kept b ON a.o_custkey = b.o_custkey
         |  AND a.o_orderkey < b.o_orderkey),
         |pc AS (SELECT ck, count(*) AS n_pairs,
         |  CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS concordant,
         |  CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS discordant,
         |  CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_tie_x,
         |  CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_tie_y
         | FROM p2 GROUP BY ck),
         |cnt AS (SELECT o_custkey AS ck, count(*) AS n_orders
         | FROM o GROUP BY o_custkey)
         |SELECT ck AS o_custkey, n_orders, n_pairs, concordant, discordant,
         | n_tie_x, n_tie_y,
         | ${Q.duckRnd(
             "CAST(concordant - discordant AS DOUBLE)" +
               " / CAST(n_pairs AS DOUBLE)", 6)} AS tau_a,
         | n_orders > $KendallMaxOrders AS capped
         |FROM pc JOIN cnt USING (ck) WHERE n_orders >= $KendallMinOrders
         |ORDER BY o_custkey""".stripMargin,

    // same per-type session construction, but a DIRECT range join —
    // the bucket expansion is a Spark execution strategy the result
    // is invisible to
    "interval_overlap_join" -> {
      def sessCte(kind: String, tag: String) =
        s"""f$tag AS (SELECT user_id, event_id, ms,
           |  CASE WHEN lag(ms) OVER w IS NULL
           |        OR ms - lag(ms) OVER w > $OverlapGapMs
           |       THEN 1 ELSE 0 END AS new_s
           | FROM e WHERE event_type = '$kind'
           | WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
           |s$tag AS (SELECT user_id, ms,
           |  CAST(sum(new_s) OVER (PARTITION BY user_id
           |    ORDER BY ms, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |    AS sid
           | FROM f$tag),
           |g$tag AS (SELECT user_id, sid, count(*) AS n_ev,
           |  min(ms) AS st, max(ms) AS en
           | FROM s$tag GROUP BY user_id, sid)""".stripMargin
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_us(ts) // 1000 AS ms FROM events),
         |${sessCte("view", "v")},
         |${sessCte("click", "c")}
         |SELECT gv.user_id, gv.sid AS view_session, gc.sid AS click_session,
         | gv.n_ev AS n_view_events, gc.n_ev AS n_click_events,
         | least(gv.en, gc.en) - greatest(gv.st, gc.st) AS overlap_ms
         |FROM gv JOIN gc ON gv.user_id = gc.user_id
         | AND gv.st <= gc.en AND gc.st <= gv.en
         |ORDER BY gv.user_id, view_session, click_session""".stripMargin
    },

    // the digit spine and the Benford shares are the same inlined
    // shortest-round-trip double literals Spark uses — no query-time
    // log10 anywhere
    "benford_test" -> {
      val digitList = (1 to 9).mkString("[", ", ", "]")
      val shareList = BenfordShares
        .map(sh => s"CAST($sh AS DOUBLE)").mkString("[", ", ", "]")
      s"""WITH d AS (SELECT unnest($digitList) AS digit,
         |  unnest($shareList) AS exp_raw),
         |c AS (SELECT CAST(regexp_extract(
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
         |    '[1-9]') AS INTEGER) AS digit, count(*) AS n
         | FROM orders WHERE o_totalprice > 0 GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c)
         |SELECT d.digit, coalesce(c.n, 0) AS n,
         | CASE WHEN coalesce(nt, 0) = 0 THEN NULL
         |  ELSE ${Q.duckRnd(
             "CAST(coalesce(c.n, 0) AS DOUBLE) / CAST(nt AS DOUBLE)", 6)}
         | END AS obs_share,
         | ${Q.duckRnd("exp_raw", 6)} AS exp_share,
         | CASE WHEN coalesce(nt, 0) = 0 THEN NULL
         |  ELSE ${Q.duckRnd(
             "(CAST(coalesce(c.n, 0) AS DOUBLE) - CAST(nt AS DOUBLE) * exp_raw)" +
               " * (CAST(coalesce(c.n, 0) AS DOUBLE) - CAST(nt AS DOUBLE) * exp_raw)" +
               " / (CAST(nt AS DOUBLE) * exp_raw)", 6)}
         | END AS chi2_part
         |FROM d LEFT JOIN c ON c.digit = d.digit CROSS JOIN t
         |ORDER BY d.digit""".stripMargin
    },

    // same scaled-integer matrix, same unrolled steps, same
    // end-of-run normalization
    "markov_stationary" -> {
      val steps = (1 to MarkovIters).map(i =>
        s"""v$i AS (SELECT tr.t AS st,
           |  CAST(sum(CAST(v.v AS HUGEINT) * tr.ps) // 1000000000
           |    AS BIGINT) AS v
           | FROM v${i - 1} v JOIN tr ON v.st = tr.f GROUP BY tr.t)"""
          .stripMargin).mkString(",\n")
      s"""WITH p AS (SELECT from_type AS f, event_type AS t FROM (
         |  SELECT event_type, lag(event_type) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id) AS from_type
         |  FROM events WHERE event_type IS NOT NULL) x
         | WHERE from_type IS NOT NULL),
         |cnt AS (SELECT f, t, count(*) AS c FROM p GROUP BY f, t),
         |tot AS (SELECT f, CAST(sum(c) AS BIGINT) AS cf FROM cnt
         |  GROUP BY f),
         |states AS (SELECT DISTINCT f AS st FROM cnt),
         |tr AS (SELECT c.f, c.t, (c.c * 1000000000) // t2.cf AS ps
         |  FROM cnt c JOIN tot t2 USING (f)
         |  JOIN states s ON c.t = s.st),
         |kk AS (SELECT CAST(count(*) AS BIGINT) AS kk FROM states),
         |v0 AS (SELECT st, 1000000000 // kk AS v
         |  FROM states CROSS JOIN kk),
         |$steps,
         |tv AS (SELECT CAST(sum(v) AS BIGINT) AS tv
         |  FROM v$MarkovIters)
         |SELECT st AS state, v AS v_scaled,
         |  ${Q.duckRnd("CAST(v AS DOUBLE) / CAST(tv AS DOUBLE)", 6)} AS pi
         |FROM v$MarkovIters CROSS JOIN tv ORDER BY state""".stripMargin
    },

    "anova_oneway" ->
      s"""WITH ev AS (SELECT coalesce(event_type, '__null__') AS g,
         |    CAST(value AS DECIMAL(18,2)) AS v
         |  FROM events WHERE value IS NOT NULL),
         |grp AS (SELECT g, count(*) AS n_g, SUM(v) AS s1,
         |    SUM(CAST(v * v AS DECIMAL(38,4))) AS s2
         |  FROM ev GROUP BY g),
         |tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS nn,
         |    SUM(CAST(s1 AS DECIMAL(38,2))) AS s1t, count(*) AS k
         |  FROM grp),
         |terms AS (SELECT g, n_g, s1, s2, nn, k,
         |    CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE) AS mean_g,
         |    CAST(s1t AS DOUBLE) / CAST(nn AS DOUBLE) AS gm
         |  FROM grp CROSS JOIN tot),
         |t2 AS (SELECT nn, k,
         |    CAST(${Q.duckRnd(
        "CAST(n_g AS DOUBLE) * (mean_g - gm) * (mean_g - gm)", 6)}
         |      AS DECIMAL(38,6)) AS ssb_t,
         |    CAST(${Q.duckRnd(
        "CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)" +
          " / CAST(n_g AS DOUBLE)", 6)}
         |      AS DECIMAL(38,6)) AS ssw_t
         |  FROM terms),
         |agg2 AS (SELECT nn, k, CAST(SUM(ssb_t) AS DOUBLE) AS ssb0,
         |    CAST(SUM(ssw_t) AS DOUBLE) AS ssw0
         |  FROM t2 GROUP BY nn, k),
         |snapped AS (SELECT nn, k, ${Q.duckRnd("ssb0", 6)} AS ssb,
         |    ${Q.duckRnd("ssw0", 6)} AS ssw
         |  FROM agg2),
         |gs AS (SELECT nn, k, ssb, ssw,
         |    CASE WHEN k < 2 OR nn <= k OR ssw <= 0.0 THEN NULL
         |      ELSE ${Q.duckRnd(
        "(ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(nn - k AS DOUBLE))",
        6)} END AS f_stat
         |  FROM snapped)
         |SELECT g, n_g,
         |  ${Q.duckRnd("CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE)", 6)}
         |    AS mean_g,
         |  nn, k, ssb, ssw, f_stat
         |FROM grp CROSS JOIN gs ORDER BY g""".stripMargin,

    "jarque_bera" ->
      s"""WITH ev AS (SELECT coalesce(event_type, '__null__') AS g,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM events WHERE value IS NOT NULL),
         |mu AS (SELECT g,
         |    CAST((sum(c) - sum(c) % count(*)) // count(*) AS BIGINT) AS mu
         |  FROM ev GROUP BY g),
         |dev AS (SELECT e.g, e.c - m.mu AS dd,
         |    CASE WHEN abs(e.c - m.mu) > $JbDevBound THEN NULL
         |      ELSE CAST(CAST(e.c - m.mu AS DECIMAL(19,0))
         |        * CAST(e.c - m.mu AS DECIMAL(19,0)) AS DECIMAL(19,0))
         |      END AS d2c
         |  FROM ev e JOIN mu m USING (g)),
         |g2 AS (SELECT g, count(*) AS n,
         |    SUM(CASE WHEN abs(dd) > $JbDevBound THEN 1 ELSE 0 END) AS n_oob,
         |    SUM(CAST(dd AS DECIMAL(38,0))) AS d1,
         |    SUM(CAST(d2c AS DECIMAL(38,0))) AS d2,
         |    SUM(CAST(d2c * CAST(dd AS DECIMAL(19,0)) AS DECIMAL(38,0)))
         |      AS d3,
         |    SUM(CAST(d2c * d2c AS DECIMAL(38,0))) AS d4
         |  FROM dev GROUP BY g),
         |st AS (SELECT g, n, n_oob,
         |    CAST(d1 AS DOUBLE) / CAST(n AS DOUBLE) AS b1,
         |    CAST(d2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
         |    CAST(d3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
         |    CAST(d4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
         |  FROM g2),
         |m AS (SELECT g, n, n_oob,
         |    r2 - b1 * b1 AS m2,
         |    r3 - 3.0 * b1 * r2 + 2.0 * b1 * b1 * b1 AS m3,
         |    r4 - 4.0 * b1 * r3 + 6.0 * b1 * b1 * r2
         |      - 3.0 * b1 * b1 * b1 * b1 AS m4
         |  FROM st),
         |sk AS (SELECT g, n,
         |    CASE WHEN n < 2 OR n_oob > 0 OR m2 <= 0.0 THEN NULL
         |      ELSE ${Q.duckRnd("m3 / (m2 * sqrt(m2))", 6)} END AS skewness,
         |    CASE WHEN n < 2 OR n_oob > 0 OR m2 <= 0.0 THEN NULL
         |      ELSE ${Q.duckRnd("m4 / (m2 * m2) - 3.0", 6)} END
         |      AS kurt_excess
         |  FROM m),
         |jb AS (SELECT g, n, skewness, kurt_excess,
         |    CASE WHEN skewness IS NULL THEN NULL
         |      ELSE ${Q.duckRnd(
        "CAST(n AS DOUBLE) / 6.0 * (skewness * skewness" +
          " + kurt_excess * kurt_excess / 4.0)", 6)} END AS jb_stat
         |  FROM sk)
         |SELECT g, n, skewness, kurt_excess, jb_stat,
         |  jb_stat > $jbCritSql AS reject_normal
         |FROM jb ORDER BY g""".stripMargin,

    "spearman_rho" ->
      s"""WITH li AS (SELECT l_quantity AS x, l_extendedprice AS y
         |  FROM lineitem WHERE l_quantity IS NOT NULL
         |    AND l_extendedprice IS NOT NULL),
         |px AS (SELECT x, count(*) AS n FROM li GROUP BY x),
         |rx AS (SELECT x,
         |    2 * (sum(n) OVER (ORDER BY x) - n) + n + 1 AS r_x FROM px),
         |py AS (SELECT y, count(*) AS n FROM li GROUP BY y),
         |ry AS (SELECT y,
         |    2 * (sum(n) OVER (ORDER BY y) - n) + n + 1 AS r_y FROM py),
         |j AS (SELECT CAST(r_x AS DECIMAL(19,0)) AS r_x,
         |    CAST(r_y AS DECIMAL(19,0)) AS r_y
         |  FROM li JOIN rx USING (x) JOIN ry USING (y)),
         |s AS (SELECT count(*) AS n,
         |    SUM(CAST(r_x AS DECIMAL(38,0))) AS sx,
         |    SUM(CAST(r_y AS DECIMAL(38,0))) AS sy,
         |    SUM(CAST(r_x * r_y AS DECIMAL(38,0))) AS sxy,
         |    SUM(CAST(r_x * r_x AS DECIMAL(38,0))) AS sxx,
         |    SUM(CAST(r_y * r_y AS DECIMAL(38,0))) AS syy
         |  FROM j),
         |f AS (SELECT n,
         |    CAST(n AS DECIMAL(10,0)) * CAST(sxy AS DECIMAL(28,0))
         |      - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
         |      AS num,
         |    CAST(n AS DECIMAL(10,0)) * CAST(sxx AS DECIMAL(28,0))
         |      - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
         |      AS den1,
         |    CAST(n AS DECIMAL(10,0)) * CAST(syy AS DECIMAL(28,0))
         |      - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
         |      AS den2
         |  FROM s)
         |SELECT n,
         |  CASE WHEN den1 <= 0 OR den2 <= 0 THEN NULL
         |    ELSE ${Q.duckRnd(
        "CAST(num AS DOUBLE) / (sqrt(CAST(den1 AS DOUBLE))" +
          " * sqrt(CAST(den2 AS DOUBLE)))", 6)} END AS rho
         |FROM f""".stripMargin,

    "mutual_info" ->
      s"""WITH dd AS (SELECT coalesce(lang, '__null__') AS x,
         |    coalesce(source, '__null__') AS y FROM documents),
         |joint AS (SELECT x, y, count(*) AS cxy FROM dd GROUP BY x, y),
         |mx AS (SELECT x, CAST(sum(cxy) AS BIGINT) AS cx
         |  FROM joint GROUP BY x),
         |my AS (SELECT y, CAST(sum(cxy) AS BIGINT) AS cy
         |  FROM joint GROUP BY y),
         |nn AS (SELECT CAST(sum(cxy) AS BIGINT) AS nn FROM joint),
         |cells AS (SELECT j.cxy, mx.cx, my.cy, nn.nn
         |  FROM joint j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN nn),
         |mi0 AS (SELECT CAST(sum(CAST(${Q.duckRnd(
        "(CAST(cxy AS DOUBLE) / CAST(nn AS DOUBLE))" +
          " * ln((CAST(cxy AS DOUBLE) * CAST(nn AS DOUBLE))" +
          " / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)))", 10)}
         |    AS DECIMAL(38,10))) AS DOUBLE) AS mi0 FROM cells),
         |hx AS (SELECT CAST(sum(CAST(${Q.duckRnd(
        "(CAST(cx AS DOUBLE) / CAST(nn AS DOUBLE))" +
          " * ln(CAST(cx AS DOUBLE) / CAST(nn AS DOUBLE))", 10)}
         |    AS DECIMAL(38,10))) AS DOUBLE) AS hx0, count(*) AS k_x
         |  FROM mx CROSS JOIN nn),
         |hy AS (SELECT CAST(sum(CAST(${Q.duckRnd(
        "(CAST(cy AS DOUBLE) / CAST(nn AS DOUBLE))" +
          " * ln(CAST(cy AS DOUBLE) / CAST(nn AS DOUBLE))", 10)}
         |    AS DECIMAL(38,10))) AS DOUBLE) AS hy0, count(*) AS k_y
         |  FROM my CROSS JOIN nn),
         |tot AS (SELECT count(*) AS n FROM dd),
         |asm AS (SELECT n, k_x, k_y,
         |    ${Q.duckRnd("mi0", 8)} AS mi,
         |    ${Q.duckRnd("0.0 - hx0", 8)} AS h_x,
         |    ${Q.duckRnd("0.0 - hy0", 8)} AS h_y
         |  FROM tot CROSS JOIN mi0 CROSS JOIN hx CROSS JOIN hy)
         |SELECT n, k_x, k_y, mi, h_x, h_y,
         |  CASE WHEN h_x * h_y > 0.0
         |    THEN ${Q.duckRnd("mi / sqrt(h_x * h_y)", 6)} END AS nmi
         |FROM asm""".stripMargin,

    "js_divergence" ->
      s"""WITH t0 AS (SELECT coalesce(source, '__null__') AS src,
         |    unnest($TOKS) AS term FROM documents),
         |tl AS (SELECT src, term FROM t0 WHERE term <> ''),
         |top AS (SELECT term FROM (SELECT term, count(*) AS ct FROM tl
         |  GROUP BY term ORDER BY ct DESC, term LIMIT $JsdTerms)),
         |mapped AS (SELECT src,
         |    CASE WHEN top.term IS NOT NULL THEN tl.term
         |      ELSE '__oov__' END AS t
         |  FROM tl LEFT JOIN top ON tl.term = top.term),
         |cell AS (SELECT src, t, count(*) AS c FROM mapped GROUP BY src, t),
         |cs AS (SELECT src, CAST(sum(c) AS BIGINT) AS cs
         |  FROM cell GROUP BY src),
         |q AS (SELECT t, CAST(sum(c) AS BIGINT) AS cq FROM cell GROUP BY t),
         |nn AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cell),
         |grid AS (SELECT cs.src, cs.cs, q.t, q.cq, nn.nn,
         |    coalesce(cell.c, 0) AS c
         |  FROM cs CROSS JOIN q CROSS JOIN nn
         |  LEFT JOIN cell ON cell.src = cs.src AND cell.t = q.t),
         |x AS (SELECT src, cs, c,
         |    CAST(c AS DOUBLE) / CAST(cs AS DOUBLE) AS p,
         |    CAST(cq AS DOUBLE) / CAST(nn AS DOUBLE) AS qd
         |  FROM grid),
         |y AS (SELECT src, cs,
         |    CASE WHEN c > 0 THEN ${Q.duckRnd(
        "p * ln(p / ((p + qd) / 2.0))", 10)} ELSE 0.0 END AS pt,
         |    ${Q.duckRnd("qd * ln(qd / ((p + qd) / 2.0))", 10)} AS qt
         |  FROM x)
         |SELECT src, CAST(max(cs) AS BIGINT) AS n_tokens,
         |  ${Q.duckRnd(
        "0.5 * CAST(sum(CAST(pt AS DECIMAL(38,10))) AS DOUBLE)" +
          " + 0.5 * CAST(sum(CAST(qt AS DECIMAL(38,10))) AS DOUBLE)", 8)}
         |    AS jsd
         |FROM y GROUP BY src ORDER BY src""".stripMargin,

    "map_eval" ->
      s"""WITH base AS (SELECT user_id, event_id, value,
         |    CASE WHEN event_type IN ('purchase', 'click')
         |      THEN 1 ELSE 0 END AS rel
         |  FROM events WHERE user_id IS NOT NULL),
         |ranked AS (SELECT user_id, rel,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY value DESC NULLS LAST, event_id) AS rn,
         |    CAST(sum(rel) OVER (PARTITION BY user_id
         |      ORDER BY value DESC NULLS LAST, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cumrel,
         |    CAST(sum(rel) OVER (PARTITION BY user_id) AS BIGINT) AS r_tot
         |  FROM base),
         |per AS (SELECT user_id, max(r_tot) AS r_tot,
         |    sum(CASE WHEN rel = 1 THEN CAST(${Q.duckRnd(
        "CAST(cumrel AS DOUBLE) / CAST(rn AS DOUBLE)", 10)}
         |      AS DECIMAL(38,10)) END) AS ap_num,
         |    min(CASE WHEN rel = 1 THEN rn END) AS first_rel
         |  FROM ranked WHERE rn <= $MapK GROUP BY user_id),
         |pu AS (SELECT user_id,
         |    ${Q.duckRnd(
        "CAST(coalesce(ap_num, CAST(0 AS DECIMAL(38,10))) AS DOUBLE)" +
          s" / CAST(least(r_tot, $MapK) AS DOUBLE)", 8)} AS ap,
         |    CASE WHEN first_rel IS NOT NULL
         |      THEN ${Q.duckRnd("1.0 / CAST(first_rel AS DOUBLE)", 8)}
         |      ELSE 0.0 END AS rr
         |  FROM per WHERE r_tot > 0)
         |SELECT count(*) AS n_users,
         |  CASE WHEN count(*) > 0 THEN ${Q.duckRnd(
        "CAST(sum(CAST(ap AS DECIMAL(38,8))) AS DOUBLE)" +
          " / CAST(count(*) AS DOUBLE)", 6)} END AS map_at_k,
         |  CASE WHEN count(*) > 0 THEN ${Q.duckRnd(
        "CAST(sum(CAST(rr AS DECIMAL(38,8))) AS DOUBLE)" +
          " / CAST(count(*) AS DOUBLE)", 6)} END AS mrr_at_k
         |FROM pu""".stripMargin,

    "lift_table" ->
      s"""WITH scored AS (SELECT vec_id, embedding[1] AS score,
         |    CASE WHEN label >= $PosLabel THEN 1 ELSE 0 END AS pos
         |  FROM embeddings),
         |t AS (SELECT pos, CAST(ntile(10) OVER (ORDER BY score DESC
         |    NULLS LAST, vec_id) AS INTEGER) AS decile
         |  FROM scored),
         |per AS (SELECT decile, count(*) AS n,
         |    CAST(sum(pos) AS BIGINT) AS n_pos
         |  FROM t GROUP BY decile),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
         |    CAST(sum(n_pos) AS BIGINT) AS pt FROM per),
         |c AS (SELECT decile, n, n_pos,
         |    CAST(sum(n) OVER (ORDER BY decile
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_n,
         |    CAST(sum(n_pos) OVER (ORDER BY decile
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_pos
         |  FROM per)
         |SELECT decile, n, n_pos,
         |  ${Q.duckRnd("CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)", 6)}
         |    AS resp_rate,
         |  CASE WHEN pt > 0 THEN ${Q.duckRnd(
        "CAST(cum_pos AS DOUBLE) / CAST(pt AS DOUBLE)", 6)} END AS gain,
         |  CASE WHEN pt > 0 AND cum_n > 0 THEN ${Q.duckRnd(
        "(CAST(cum_pos AS DOUBLE) / CAST(pt AS DOUBLE))" +
          " / (CAST(cum_n AS DOUBLE) / CAST(nt AS DOUBLE))", 6)} END
         |    AS lift
         |FROM c CROSS JOIN tot ORDER BY decile""".stripMargin,

    "cuped_adjust" ->
      s"""WITH ev AS (SELECT user_id,
         |    (epoch_us(ts) // 1000) // 86400000 AS day,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
         |    AND value IS NOT NULL),
         |mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev),
         |per AS (SELECT user_id,
         |    CAST(coalesce(sum(CASE WHEN day < mid THEN c END), 0)
         |      AS BIGINT) AS x,
         |    CAST(coalesce(sum(CASE WHEN day >= mid THEN c END), 0)
         |      AS BIGINT) AS y
         |  FROM ev CROSS JOIN mid GROUP BY user_id),
         |s AS (SELECT count(*) AS n,
         |    SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         |    SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         |    SUM(CAST(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
         |      AS DECIMAL(38,0))) AS sxy,
         |    SUM(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
         |      AS DECIMAL(38,0))) AS sxx,
         |    SUM(CAST(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
         |      AS DECIMAL(38,0))) AS syy
         |  FROM per),
         |asm AS (SELECT n,
         |    CAST(n AS DECIMAL(10,0)) * CAST(sxy AS DECIMAL(28,0))
         |      - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
         |      AS cv,
         |    CAST(n AS DECIMAL(10,0)) * CAST(sxx AS DECIMAL(28,0))
         |      - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
         |      AS vx,
         |    CAST(n AS DECIMAL(10,0)) * CAST(syy AS DECIMAL(28,0))
         |      - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
         |      AS vy
         |  FROM s),
         |st AS (SELECT n,
         |    CASE WHEN vx > 0 THEN ${Q.duckRnd(
        "CAST(cv AS DOUBLE) / CAST(vx AS DOUBLE)", 6)} END AS theta,
         |    CASE WHEN vx > 0 AND vy > 0 THEN ${Q.duckRnd(
        "(CAST(cv AS DOUBLE) * CAST(cv AS DOUBLE))" +
          " / (CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE))", 6)} END AS rho2,
         |    CASE WHEN n > 0 THEN ${Q.duckRnd(
        "CAST(vy AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))",
        4)} END AS var_y
         |  FROM asm)
         |SELECT n AS n_users, theta, rho2, var_y,
         |  CASE WHEN rho2 IS NOT NULL AND var_y IS NOT NULL
         |    THEN ${Q.duckRnd("var_y * (1.0 - rho2)", 4)} END AS var_y_adj
         |FROM st""".stripMargin,

    "mde_power" ->
      s"""WITH ev AS (SELECT coalesce(event_type, '__null__') AS g,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM events WHERE value IS NOT NULL),
         |grp AS (SELECT g, count(*) AS n,
         |    SUM(CAST(c AS DECIMAL(38,0))) AS s1,
         |    SUM(CAST(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))
         |      AS DECIMAL(38,0))) AS s2
         |  FROM ev GROUP BY g),
         |asm AS (SELECT g, n, s1,
         |    CAST(n AS DECIMAL(10,0)) * CAST(s2 AS DECIMAL(28,0))
         |      - CAST(s1 AS DECIMAL(19,0)) * CAST(s1 AS DECIMAL(19,0))
         |      AS vnum
         |  FROM grp),
         |stats AS (SELECT g, n,
         |    ${Q.duckRnd(
        "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0", 6)} AS mean_v,
         |    CASE WHEN n >= 2 AND vnum > 0 THEN ${Q.duckRnd(
        "sqrt(CAST(vnum AS DOUBLE) / (CAST(n AS DOUBLE)" +
          " * (CAST(n AS DOUBLE) - 1.0))) / 100.0", 6)} END AS sd_v
         |  FROM asm),
         |m1 AS (SELECT g, n, mean_v, sd_v,
         |    CASE WHEN sd_v IS NOT NULL THEN ${Q.duckRnd(
        s"$zSumSql * sd_v * sqrt(2.0 / CAST(n AS DOUBLE))", 6)} END
         |      AS mde_abs
         |  FROM stats)
         |SELECT g, n, mean_v, sd_v, mde_abs,
         |  CASE WHEN mde_abs IS NOT NULL AND mean_v > 0.0
         |    THEN ${Q.duckRnd("mde_abs / mean_v", 6)} END AS mde_rel
         |FROM m1 ORDER BY g""".stripMargin,

    "markov_entropy_rate" -> {
      val steps = (1 to MarkovIters).map(i =>
        s"""v$i AS (SELECT tr.t AS st,
           |  CAST(sum(CAST(v.v AS HUGEINT) * tr.ps) // 1000000000
           |    AS BIGINT) AS v
           | FROM v${i - 1} v JOIN tr ON v.st = tr.f GROUP BY tr.t)"""
          .stripMargin).mkString(",\n")
      s"""WITH p AS (SELECT from_type AS f, event_type AS t FROM (
         |  SELECT event_type, lag(event_type) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id) AS from_type
         |  FROM events WHERE event_type IS NOT NULL) x
         | WHERE from_type IS NOT NULL),
         |cnt AS (SELECT f, t, count(*) AS c FROM p GROUP BY f, t),
         |tot AS (SELECT f, CAST(sum(c) AS BIGINT) AS cf FROM cnt
         |  GROUP BY f),
         |states AS (SELECT DISTINCT f AS st FROM cnt),
         |tr AS (SELECT c.f, c.t, (c.c * 1000000000) // t2.cf AS ps
         |  FROM cnt c JOIN tot t2 USING (f)
         |  JOIN states s ON c.t = s.st),
         |kk AS (SELECT CAST(count(*) AS BIGINT) AS kk FROM states),
         |v0 AS (SELECT st, 1000000000 // kk AS v
         |  FROM states CROSS JOIN kk),
         |$steps,
         |tv AS (SELECT CAST(sum(v) AS BIGINT) AS tv
         |  FROM v$MarkovIters),
         |h AS (SELECT max(kk.kk) AS k_states,
         |    count(*) AS n_transitions,
         |    CAST(sum(CAST(${Q.duckRnd(
        "(CAST(vv.v AS DOUBLE) / CAST(tv.tv AS DOUBLE))" +
          " * ((CAST(c.c AS DOUBLE) / CAST(t2.cf AS DOUBLE))" +
          " * ln(CAST(c.c AS DOUBLE) / CAST(t2.cf AS DOUBLE)))", 10)}
         |      AS DECIMAL(38,10))) AS DOUBLE) AS h0
         |  FROM cnt c JOIN tot t2 USING (f)
         |  JOIN v$MarkovIters vv ON vv.st = c.f
         |  CROSS JOIN tv CROSS JOIN kk),
         |sn AS (SELECT k_states, n_transitions,
         |    ${Q.duckRnd("0.0 - h0", 6)} AS entropy_rate
         |  FROM h)
         |SELECT k_states, n_transitions, entropy_rate,
         |  CASE WHEN k_states > 1
         |    THEN ${Q.duckRnd(
        "entropy_rate / ln(CAST(k_states AS DOUBLE))", 6)} END
         |    AS normalized_rate
         |FROM sn""".stripMargin
    },

    "simpson_check" ->
      s"""WITH li AS (SELECT coalesce(l_returnflag, '__null__') AS g,
         |    CAST(l_quantity AS BIGINT) AS x,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS y
         |  FROM lineitem WHERE l_quantity IS NOT NULL
         |    AND l_extendedprice IS NOT NULL),
         |mom AS (SELECT g, count(*) AS n,
         |    SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         |    SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         |    SUM(CAST(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
         |      AS DECIMAL(38,0))) AS sxy,
         |    SUM(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
         |      AS DECIMAL(38,0))) AS sxx
         |  FROM li GROUP BY g),
         |per AS (SELECT g, n,
         |    CASE WHEN CAST(n AS DECIMAL(10,0)) * CAST(sxx AS DECIMAL(28,0))
         |        - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
         |        > 0
         |      THEN ${Q.duckRnd(
        "CAST(CAST(n AS DECIMAL(10,0)) * CAST(sxy AS DECIMAL(28,0))" +
          " - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))" +
          " AS DOUBLE) / CAST(CAST(n AS DECIMAL(10,0))" +
          " * CAST(sxx AS DECIMAL(28,0)) - CAST(sx AS DECIMAL(19,0))" +
          " * CAST(sx AS DECIMAL(19,0)) AS DOUBLE)", 6)} END AS slope
         |  FROM mom),
         |pm AS (SELECT CAST(sum(n) AS BIGINT) AS n,
         |    SUM(CAST(sx AS DECIMAL(38,0))) AS sx,
         |    SUM(CAST(sy AS DECIMAL(38,0))) AS sy,
         |    SUM(CAST(sxy AS DECIMAL(38,0))) AS sxy,
         |    SUM(CAST(sxx AS DECIMAL(38,0))) AS sxx
         |  FROM mom),
         |pooled AS (SELECT n AS n_total,
         |    CASE WHEN CAST(n AS DECIMAL(10,0)) * CAST(sxx AS DECIMAL(28,0))
         |        - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
         |        > 0
         |      THEN ${Q.duckRnd(
        "CAST(CAST(n AS DECIMAL(10,0)) * CAST(sxy AS DECIMAL(28,0))" +
          " - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))" +
          " AS DOUBLE) / CAST(CAST(n AS DECIMAL(10,0))" +
          " * CAST(sxx AS DECIMAL(28,0)) - CAST(sx AS DECIMAL(19,0))" +
          " * CAST(sx AS DECIMAL(19,0)) AS DOUBLE)", 6)} END
         |      AS pooled_slope
         |  FROM pm)
         |SELECT g, n, slope, n_total, pooled_slope,
         |  slope IS NOT NULL AND pooled_slope IS NOT NULL
         |    AND ((slope > 0.0 AND pooled_slope < 0.0)
         |      OR (slope < 0.0 AND pooled_slope > 0.0)) AS reversed
         |FROM per CROSS JOIN pooled ORDER BY g""".stripMargin)
}
