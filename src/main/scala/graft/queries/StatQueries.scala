package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => TF}
import graft.operators.DistributedNtile
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
    }))

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
         |ORDER BY len_chars DESC, doc_id""".stripMargin)
}
