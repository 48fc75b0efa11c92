package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Forty-first wave — data-profiling and drift-monitoring operators:
  * the discovery passes a lakehouse runs BEFORE trusting a new feed
  * (Metanome-style dependency profiling) and the monitoring pass it
  * runs forever after (binned-histogram drift). Plus the classic
  * readability quality signal for the curation stack.
  *
  * Scale/perf design:
  *  - `inclusion_deps` (FK-candidate discovery): each candidate pair
  *    is distinct(child) ⟕ distinct(parent) — the distincts are
  *    map-side-combinable hash aggregates and the join shuffles on
  *    the key only for big-big pairs (lineitem→orders); true
  *    dimension parents broadcast. Never an all-column scan: each
  *    leg reads exactly one column (`ReadSchema` is 1 field).
  *  - `fd_discovery` (functional-dependency check): one
  *    determinant-keyed aggregate per candidate (partial agg counts
  *    distinct dependents per group), then a single-row rollup.
  *    Linear in each table, shuffle keyed by the determinant.
  *  - `histogram_drift`: Population-Stability-shaped monitoring that
  *    is TRANSCENDENTAL-FREE (the collocation_pmi rule: libm `ln`
  *    differs in ULPs across engines, `sqrt` is IEEE-correctly
  *    rounded, so PSI's `ln(p/q)` is replaced by total-variation and
  *    Hellinger-via-Bhattacharyya `sqrt(1 − Σ√(pq))` — both standard
  *    drift distances). One stats pass (min/max of ts and value),
  *    one (type, half, bin) cell aggregate — the corpus-scale work
  *    is all map-side-combinable; the 10-bin grid per type is
  *    constant-size. Per-bin terms snap to decimal(18,9) before the
  *    final sum, so the 10-term reduction is exact and
  *    order-independent under any partitioning.
  *  - `flesch_readability`: pure scan projection (three codegen'd
  *    regexp counts per doc) + one source-keyed aggregate; per-doc
  *    scores snap to 4dp then sum on decimal(18,6), so the mean is
  *    partition-order-independent.
  */
object ProfilingQueries {

  /** Inclusion-dependency candidates: (child table, child col,
    * parent table, parent col, parent-is-dimension). The last flag
    * picks broadcast for the parent distinct side; big-big pairs
    * (lineitem→orders) shuffle on the key. The same list generates
    * the oracle SQL, so engine and oracle can never drift.
    */
  private val InclCandidates: Seq[(String, String, String, String, Boolean)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey", false),
    ("lineitem", "l_partkey", "part", "p_partkey", true),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey", true),
    ("orders", "o_custkey", "customer", "c_custkey", true),
    ("customer", "c_nationkey", "nation", "n_nationkey", true),
    // a DISCOVERED dependency (event actors are drawn from the
    // customer key space) and its partial reverse — the negative
    // control: most customers never appear as event actors, so
    // containment stays well below 1. The reverse parent is a fact
    // table whose distinct-actor set is unbounded at scale → no
    // broadcast on that leg.
    ("events", "user_id", "customer", "c_custkey", true),
    ("customer", "c_custkey", "events", "user_id", false))

  /** Functional-dependency candidates: (table, determinant,
    * dependent). Mix of true keys (first three) and violations.
    */
  private val FdCandidates: Seq[(String, String, String)] = Seq(
    ("nation", "n_nationkey", "n_name"),
    ("orders", "o_orderkey", "o_custkey"),
    ("documents", "doc_id", "source"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("events", "user_id", "event_type"),
    ("lineitem", "l_orderkey", "l_partkey"))

  private def tbl(s: SparkSession, d: String, name: String): DataFrame =
    name match {
      case "events" => Tables.events(s, d)
      case t        => Tables.t(s, d, t)
    }

  val defs: Map[String, QueryFn] = Map(

    // FK-candidate discovery (unary inclusion dependencies): for each
    // declared (child.col, parent.col) pair, the fraction of distinct
    // non-null child values present in the parent. containment = 1 ⇒
    // a valid FK target; the events→customer control stays partial.
    "inclusion_deps" -> ((s, d) => {
      import s.implicits._
      val per = InclCandidates.map { case (ct, cc, pt, pc, dim) =>
        val c = tbl(s, d, ct).select(col(cc).cast("long").as("k"))
          .where($"k".isNotNull).distinct()
        val p0 = tbl(s, d, pt).select(col(pc).cast("long").as("k"))
          .where($"k".isNotNull).distinct()
          .withColumn("hit", lit(1))
        val p = if (dim) broadcast(p0) else p0
        c.join(p, Seq("k"), "left")
          .agg(count(lit(1)).as("n_child"),
            coalesce(sum($"hit"), lit(0)).cast("long").as("n_hit"))
          .select(lit(s"$ct.$cc").as("child_col"),
            lit(s"$pt.$pc").as("parent_col"), $"n_child", $"n_hit")
      }
      per.reduce(_.unionAll(_))
        .select($"child_col", $"parent_col", $"n_child", $"n_hit",
          when($"n_child" > 0L,
            rnd($"n_hit".cast("double") / $"n_child".cast("double"), 6))
            .as("containment"),
          ($"n_hit" === $"n_child").as("holds"))
        .orderBy($"child_col", $"parent_col")
    }),

    // Functional-dependency check: does the determinant fix the
    // dependent? Per candidate: groups with >1 distinct dependent
    // (NULL counted as a value via a sentinel so a null-dependent
    // group is judged, not skipped).
    "fd_discovery" -> ((s, d) => {
      import s.implicits._
      val per = FdCandidates.map { case (t, det, dep) =>
        tbl(s, d, t)
          .where(col(det).isNotNull)
          .select(col(det).cast("string").as("det"),
            coalesce(col(dep).cast("string"), lit("__null__")).as("dep"))
          .groupBy($"det")
          .agg(countDistinct($"dep").as("card"))
          .agg(count(lit(1)).as("n_groups"),
            coalesce(sum(when($"card" > 1L, 1L).otherwise(0L)), lit(0L))
              .as("n_violating"),
            max($"card").as("max_card"))
          .select(lit(t).as("tbl"), lit(det).as("det_col"),
            lit(dep).as("dep_col"), $"n_groups", $"n_violating",
            $"max_card", ($"n_violating" === 0L).as("holds"))
      }
      per.reduce(_.unionAll(_)).orderBy($"tbl", $"det_col", $"dep_col")
    }),

    // Binned-histogram drift between the two time halves of the
    // events feed (reference window vs current window — the
    // ML-monitoring canary). 10 equal-width bins over the observed
    // value range, Laplace-smoothed per-half distributions, then
    // total-variation distance and Hellinger distance (via the
    // Bhattacharyya coefficient H = √(1 − Σ√(pq)) — sqrt only, no
    // libm ln, per the transcendental rule). Per-bin terms snap to
    // decimal(18,9) so the 10-term sums are exact both engines.
    "histogram_drift" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .where($"ts".isNotNull && $"event_type".isNotNull &&
          $"value".isNotNull)
        .select($"event_type".as("t"), unix_millis($"ts").as("ms"),
          $"value".cast("double").as("v"))
      val st = ev.agg(min($"ms").as("ms0"), max($"ms").as("ms1"),
        min($"v").as("v0"), max($"v").as("v1"))
      val binned = ev.crossJoin(broadcast(st))
        .withColumn("half",
          expr("CASE WHEN ms <= (ms0 + ms1) DIV 2 THEN 0 ELSE 1 END"))
        .withColumn("w", ($"v1" - $"v0") / lit(10.0))
        .withColumn("bin",
          when($"w" === 0.0, lit(0))
            .otherwise(least(floor(($"v" - $"v0") / $"w"), lit(9.0))
              .cast("int")))
      val cells = binned.groupBy($"t", $"bin")
        .agg(sum(when($"half" === 0, 1L).otherwise(0L)).as("ca"),
          sum(when($"half" === 1, 1L).otherwise(0L)).as("cb"))
      val totals = cells.groupBy($"t")
        .agg(sum($"ca").as("na"), sum($"cb").as("nb"))
      val grid = totals.crossJoin(
        broadcast(s.range(10).select($"id".cast("int").as("bin"))))
      val terms = grid
        .join(cells, Seq("t", "bin"), "left")
        .select($"t", $"na", $"nb",
          (coalesce($"ca", lit(0L)) + 1L).cast("double") /
            ($"na" + 10L).cast("double") as "p",
          (coalesce($"cb", lit(0L)) + 1L).cast("double") /
            ($"nb" + 10L).cast("double") as "q")
        .select($"t", $"na", $"nb",
          rnd(abs($"p" - $"q"), 9).cast("decimal(18,9)").as("tv"),
          rnd(sqrt($"p" * $"q"), 9).cast("decimal(18,9)").as("bc"))
      terms.groupBy($"t")
        .agg(first($"na").as("n_a"), first($"nb").as("n_b"),
          sum($"tv").as("stv"), sum($"bc").as("sbc"))
        .select($"t".as("event_type"), $"n_a", $"n_b",
          rnd(lit(0.5) * $"stv".cast("double"), 6).as("tvd"),
          rnd(sqrt(greatest(lit(1.0) - $"sbc".cast("double"), lit(0.0))), 6)
            .as("hellinger"))
        .withColumn("drifted", $"tvd" > 0.1)
        .orderBy($"event_type")
    }),

    // Writing-system detection (wave 49) — the script-mix profile a
    // multilingual corpus curation pass runs before language-ID can
    // be trusted (lang_id's n-gram heuristic assumes Latin text):
    // per doc, CODE-POINT counts of Latin/digit/Cyrillic/Greek/CJK
    // via [[graft.plans.CharClassCounts]] — ONE codegen'd byte pass
    // with the UTF-8 decode inlined, where the regex formulation is
    // five regexp_replace traversals (flesch_readability's lesson) —
    // then a majority-rule classification (class share ≥ 1/2, checked
    // in EXACT integer arithmetic 2·class ≥ total, priority order on
    // ties) and a (lang, script) cross-tab with the mean Latin share.
    "script_detect" -> ((s, d) => {
      import s.implicits._
      graft.plans.TextRunFunctions.register(s)
      val perDoc = Tables.documents(s, d)
        .withColumn("cc", graft.plans.TextRunFunctions.charClassCounts($"text"))
        .select($"lang", $"cc.latin".as("lat"), $"cc.digit".as("dig"),
          $"cc.cyr".as("cyr"), $"cc.greek".as("grk"), $"cc.cjk".as("cjk"))
        .withColumn("s5", $"lat" + $"dig" + $"cyr" + $"grk" + $"cjk")
        .withColumn("script",
          when($"s5".isNull || $"s5" === 0L, lit("none"))
            .when($"lat" * 2 >= $"s5", lit("latin"))
            .when($"dig" * 2 >= $"s5", lit("digit"))
            .when($"cyr" * 2 >= $"s5", lit("cyrillic"))
            .when($"grk" * 2 >= $"s5", lit("greek"))
            .when($"cjk" * 2 >= $"s5", lit("cjk"))
            .otherwise(lit("mixed")))
      perDoc.groupBy($"lang", $"script")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"s5" > 0,
            rnd($"lat".cast("double") / $"s5".cast("double"), 6)
              .cast("decimal(18,6)"))).cast("double").as("sls"),
          count(when($"s5" > 0, 1)).as("n_nz"))
        .select($"lang", $"script", $"n_docs",
          when($"n_nz" > 0, rnd($"sls" / $"n_nz".cast("double"), 6))
            .as("mean_latin_share"))
        .orderBy($"lang".asc_nulls_last, $"script")
    }),

    // Flesch reading-ease per source: 206.835 − 1.015·(words/sents)
    // − 84.6·(syllables/words), with words = alnum runs (equal to
    // TF.nTokens by construction: normText turns every non-alnum
    // char into a separator, so tokens ARE the maximal alnum runs),
    // sentences = [.!?]+ runs (min 1), and syllables ≈ [aeiouy]+
    // vowel-group runs — the standard regex approximation, but
    // counted by [[graft.plans.CharRunCounts]]: ONE codegen'd byte
    // pass instead of three regex traversals (the 10× sweep measured
    // the regex formulation at 71 s — the whole query's cost;
    // Wave42Spec pins the expression equal to the regexes AND to
    // TF.nTokens corpus-wide). Per-doc scores snap to 4dp, sum on
    // decimal(18,6) (exact), mean back in double space.
    // Per-document character-level Shannon entropy (wave 53, round
    // 12): the classic compressibility/junk signal — machine-
    // generated or repeated-template text scores far below natural
    // language's ~3.5-4.2 bits/char over [a-z0-9]. Scale shape: one
    // (doc, char) hash aggregate (map-side-combinable; alphabet ≤ 36
    // keys per doc) and one doc-keyed window+aggregate on the SAME
    // key — two corpus-scale exchanges, both keyed, no joins. The
    // closing sum follows the kruskal discipline: each p·log₂p term
    // snaps to 10dp and sums as DECIMAL(38,10), so the reduction is
    // exact and order-independent under any partitioning (libm log2
    // may differ in final ulps cross-engine; the snap absorbs it —
    // the woe_iv/ln precedent, green at all four robustness legs).
    "char_entropy" -> ((s, d) => {
      import s.implicits._
      val nrm = Tables.documents(s, d).where($"text".isNotNull)
        .select($"doc_id",
          regexp_replace(lower($"text"), "[^a-z0-9]", "").as("sN"))
        .where(length($"sN") > 0)
      val cnts = nrm
        .select($"doc_id", explode(split($"sN", "")).as("ch"))
        .where($"ch" =!= "")
        .groupBy($"doc_id", $"ch").agg(count(lit(1)).as("c"))
      val terms = cnts
        .withColumn("n", sum($"c").over(Window.partitionBy($"doc_id")))
        .withColumn("p", $"c".cast("double") / $"n".cast("double"))
        .withColumn("t", rnd($"p" * log2($"p"), 10).cast("decimal(38,10)"))
      terms.groupBy($"doc_id")
        .agg(max($"n").as("n_chars"),
          count(lit(1)).as("n_distinct"),
          rnd(-sum($"t").cast("double"), 8).as("entropy"))
        .orderBy($"doc_id")
    }),

    "flesch_readability" -> ((s, d) => {
      import s.implicits._
      graft.plans.TextRunFunctions.register(s)
      val scored = Tables.documents(s, d)
        .where($"text".isNotNull)
        .withColumn("rc", graft.plans.TextRunFunctions.charRunCounts($"text"))
        .select($"source",
          $"rc.words".as("w"),
          greatest($"rc.sentences", lit(1L)).as("sent"),
          $"rc.syllables".as("syl"))
        .where($"w" > 0L)
        .select($"source",
          rnd(lit(206.835)
            - lit(1.015) * ($"w".cast("double") / $"sent".cast("double"))
            - lit(84.6) * ($"syl".cast("double") / $"w".cast("double")),
            4).as("score"))
      scored.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"score".cast("decimal(18,6)")).as("ssc"),
          sum(when($"score" < 30.0, 1L).otherwise(0L)).as("n_difficult"))
        .select($"source", $"n_docs",
          rnd($"ssc".cast("double") / $"n_docs".cast("double"), 4)
            .as("avg_flesch"),
          $"n_difficult",
          rnd($"n_difficult".cast("double") / $"n_docs".cast("double"), 6)
            .as("difficult_frac"))
        .orderBy($"source".asc_nulls_last)
    }),

    // Higher-moment column profiling (wave 45): exact skewness and
    // excess kurtosis for the declared 2dp numeric columns — the
    // distribution-shape screen profile_table's min/max/sum pass
    // cannot see (fat tails, asymmetry — the columns that break
    // equal-width histograms and z-score rules). Two passes per
    // column: (Σcents, n) → integer pseudo-mean μ = Σ DIV n, then
    // central power sums Σd..Σd⁴ about μ — all EXACT integer/decimal
    // arithmetic (cents ≤ ~10⁷ ⇒ d⁴ ≤ 10²⁸ in decimal(38,0), sums
    // < 10³⁸ far beyond sweep scale; libm-free: skew = m₃/(m₂√m₂),
    // kurt = m₄/m₂² − 3, sqrt is IEEE-exact). Moments are about the
    // FLOORED integer mean by construction — documented, identical
    // both engines, and shift-invariant estimators are insensitive
    // to the ≤1-cent shift.
    "moments_profile" -> ((s, d) => {
      import s.implicits._
      // TWO scans per TABLE (not per column): the first 100× sweep
      // measured the per-column formulation at 326 s — 10 fact-table
      // scans; grouping the columns of one table into one multi-
      // aggregate pass cuts lineitem from 6 scans to 2.
      //
      // Operand widths sized so every decimal product stays ≤ 38
      // digits in BOTH engines (DuckDB rejects 38×38 multiplies at
      // bind time): |dv| ≤ 3·10⁸ cents (declared data bound: no
      // profiled column deviates more than ~$3M from its mean), so
      // dv: (10,0), d2 = dv² < 10¹⁷: declared (19,0) — one digit
      // wider than DuckDB's int64 decimal ceiling (width 18), which
      // forces its multiplies onto int128 instead of overflowing the
      // int64 fast path; products reach (29,0)/(38,0) and the sums
      // stay inside decimal(38,0).
      val per = MomentCols.groupBy(_._1).toSeq.flatMap { case (tn, cols) =>
        val cents = tbl(s, d, tn).select(cols.map { case (_, cn) =>
          (col(cn).cast("decimal(18,2)") * 100).cast("long").as(s"c_$cn")
        }: _*)
        val pass1 = cents.agg(
          count(lit(1)).as("ignored"),
          cols.flatMap { case (_, cn) =>
            Seq(sum(col(s"c_$cn").cast("decimal(38,0)")).as(s"sc_$cn"),
              count(col(s"c_$cn")).as(s"n_$cn"))
          }: _*)
          .select(cols.flatMap { case (_, cn) =>
            Seq(col(s"sc_$cn"), col(s"n_$cn"),
              expr(s"CAST(sc_$cn AS BIGINT) DIV n_$cn").as(s"mu_$cn"))
          }: _*)
        val dvs = cents.crossJoin(broadcast(pass1))
          .select(cols.flatMap { case (_, cn) =>
            Seq(col(s"sc_$cn"), col(s"n_$cn"),
              (col(s"c_$cn") - col(s"mu_$cn")).cast("decimal(10,0)")
                .as(s"dv_$cn"))
          }: _*)
          .select(cols.flatMap { case (_, cn) =>
            Seq(col(s"sc_$cn"), col(s"n_$cn"), col(s"dv_$cn"),
              (col(s"dv_$cn") * col(s"dv_$cn")).cast("decimal(19,0)")
                .as(s"d2_$cn"))
          }: _*)
        val sums = dvs.groupBy(
          cols.flatMap { case (_, cn) =>
            Seq(col(s"sc_$cn"), col(s"n_$cn"))
          }: _*)
          .agg(count(lit(1)).as("ignored2"),
            cols.flatMap { case (_, cn) =>
              Seq(sum(col(s"d2_$cn")).as(s"s2_$cn"),
                sum(col(s"d2_$cn") * col(s"dv_$cn")).as(s"s3_$cn"),
                sum(col(s"d2_$cn") * col(s"d2_$cn")).as(s"s4_$cn"))
            }: _*)
        cols.map { case (_, cn) =>
          val n = col(s"n_$cn")
          val m2 = col(s"s2_$cn").cast("double") / n.cast("double")
          val m3 = col(s"s3_$cn").cast("double") / n.cast("double")
          val m4 = col(s"s4_$cn").cast("double") / n.cast("double")
          sums.where(n > 0L).select(lit(tn).as("tbl"),
            lit(cn).as("col_name"), n.as("n"),
            rnd(col(s"sc_$cn").cast("double") / n.cast("double") / 100.0, 6)
              .as("mean"),
            rnd(sqrt(m2) / 100.0, 6).as("std"),
            when(m2 > 0.0, rnd(m3 / (m2 * sqrt(m2)), 6)).as("skewness"),
            when(m2 > 0.0, rnd(m4 / (m2 * m2) - 3.0, 6)).as("ex_kurtosis"))
        }
      }
      per.reduce(_.unionAll(_)).orderBy($"tbl", $"col_name")
    }),

    // Population Stability Index per event type between the time
    // halves of the ingest window (wave 58): THE industry drift
    // metric — "has this class's value distribution moved since the
    // reference period" — with the reference-decile binning a risk
    // team actually deploys. histogram_drift deliberately stays
    // transcendental-free (TV/Hellinger); psi_stability is the
    // complementary ln-based readout under the repo's snap
    // discipline (10dp-snapped per-bin terms, decimal sums — the
    // hill/mutual_info precedent). Bin edges are the REFERENCE
    // half's per-type deciles via the skew-free
    // [[graft.operators.DistributedNtile]] (never a corpus-wide
    // single-task sort); both halves bin against the SAME ≤9-edge
    // broadcast arrays; add-½ smoothing on the full per-type bin
    // grid keeps empty bins finite in both engines. One fact scan +
    // one keyed NTILE exchange + two bounded aggregates. A type with
    // NO reference-period rows (brand-new — itself a drift signal)
    // has no deciles to bin against: it is reported with NULL
    // psi/n_bins/drift and new_type = true rather than silently
    // dropped (ADVICE r12).
    "psi_stability" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .filter($"ts".isNotNull && $"event_type".isNotNull &&
          $"value".isNotNull)
        .select($"event_type".as("t"),
          expr("unix_millis(ts) DIV 86400000").as("day"),
          $"value", $"event_id")
      val mid = broadcast(ev.agg(min($"day").as("d0"), max($"day").as("d1"))
        .selectExpr("(d0 + d1 + 1) DIV 2 AS mid"))
      val halved = ev.crossJoin(mid)
        .select($"t", $"value", $"event_id", ($"day" < $"mid").as("ref"))
      val refRows = halved.filter($"ref")
      val tiled = graft.operators.DistributedNtile.withNtile(
        refRows, "t",
        Seq($"value".asc_nulls_last, $"event_id".asc_nulls_last), 10, "tile")
      val edges = tiled.groupBy($"t", $"tile")
        .agg(max($"value").as("edge"))
        .filter($"tile" < 10)
        .groupBy($"t")
        .agg(array_sort(collect_list(struct($"tile", $"edge"))).as("te"))
        .selectExpr("t", "transform(te, p -> p.edge) AS edges")
      // LEFT join (ADVICE r12): an event type with zero
      // reference-period rows — a brand-new type, itself a drift
      // signal — has no decile edges; an inner join would silently
      // drop it from the report. Such rows carry NULL nb/bin
      // (size/aggregate of a NULL array), flow into tot as an
      // (n_ref = 0, n_bins = NULL) row, skip the grid (the bin
      // explode yields nothing for NULL nb), and surface in the
      // output with NULL psi and new_type = true.
      // the join-miss marker is an EXPLICIT null test, not
      // size(NULL): under spark.sql.legacy.sizeOfNull (ANSI off)
      // size(NULL) is -1, which would silently turn a new type's
      // NULL nb into 0 and diverge from the oracle (ADVICE r13)
      val binned = halved.join(broadcast(edges), Seq("t"), "left")
        .selectExpr("t", "ref",
          "CASE WHEN edges IS NULL THEN CAST(NULL AS INT)" +
            " ELSE size(edges) + 1 END AS nb",
          "1 + aggregate(edges, 0, (a, e) ->" +
            " a + CASE WHEN value > e THEN 1 ELSE 0 END) AS bin")
      val cell = binned.groupBy($"t", $"nb", $"bin").agg(
        sum(when($"ref", 1L).otherwise(0L)).as("cr"),
        sum(when(!$"ref", 1L).otherwise(0L)).as("cc"))
      val tot = cell.groupBy($"t").agg(
        sum($"cr").as("nr"), sum($"cc").as("nc"), max($"nb").as("nb"))
      val grid = tot.selectExpr("t", "nr", "nc", "nb",
          "explode(sequence(1, nb)) AS bin")
        .join(cell.select($"t", $"bin", $"cr", $"cc"), Seq("t", "bin"), "left")
        .select($"t", $"nr", $"nc", $"nb", $"bin",
          coalesce($"cr", lit(0L)).as("cr"),
          coalesce($"cc", lit(0L)).as("cc"))
      val p = ($"cr".cast("double") + lit(0.5)) /
        ($"nr".cast("double") + lit(0.5) * $"nb".cast("double"))
      val q = ($"cc".cast("double") + lit(0.5)) /
        ($"nc".cast("double") + lit(0.5) * $"nb".cast("double"))
      val term = rnd((p - q) * log(p / q), 10).cast("decimal(38,10)")
      val psis = grid.groupBy($"t").agg(sum(term).cast("double").as("psi0"))
      // tot keeps every type (including edge-less new types); psi0 is
      // NULL exactly for those, hence new_type := psi IS NULL
      tot.join(psis, Seq("t"), "left")
        .select($"t".as("event_type"), $"nr".as("n_ref"),
          $"nc".as("n_cur"), $"nb".as("n_bins"),
          rnd($"psi0", 8).as("psi"))
        .select($"event_type", $"n_ref", $"n_cur", $"n_bins", $"psi",
          ($"psi" > lit(0.2)).as("drift"), $"psi".isNull.as("new_type"))
        .orderBy($"event_type")
    }),

    // Join-key skew audit (wave 59): the pre-flight a 100 TB join
    // actually needs — for every declared join key, the key-count
    // distribution facts that decide between a plain shuffle join,
    // AQE skew handling, and explicit salting: row/key counts, the
    // heaviest key's absolute count and share, the p99 key count,
    // and skew_factor = max/avg (the salting multiplier). One keyed
    // aggregate per key column (map-side combinable), a single-row
    // rollup each, and a 4-row union — the fact tables are scanned
    // once per audited column with one-column ReadSchema. NULL keys
    // are excluded (they never join).
    "join_skew_report" -> ((s, d) => {
      import s.implicits._
      val legs = SkewKeys.map { case (tn, cn) =>
        val cnts = tbl(s, d, tn).where(col(cn).isNotNull)
          .groupBy(col(cn)).agg(count(lit(1)).as("cnt"))
        cnts.agg(
            count(lit(1)).as("n_keys"),
            sum($"cnt").as("n_rows"),
            max($"cnt").as("max_cnt"),
            rnd(expr("percentile(cnt, 0.99)"), 4).as("p99_cnt"))
          .select(lit(tn).as("tbl"), lit(cn).as("col_name"),
            $"n_rows", $"n_keys", $"max_cnt", $"p99_cnt",
            rnd($"max_cnt".cast("double") / $"n_rows".cast("double"), 6)
              .as("top1_share"),
            rnd($"max_cnt".cast("double") * $"n_keys".cast("double") /
              $"n_rows".cast("double"), 4).as("skew_factor"))
      }
      legs.reduce(_ unionAll _).orderBy($"tbl", $"col_name")
    }),

    // Ingest-freshness audit per event type (wave 62): the staleness
    // report a data-SLA monitor publishes — last active day, days
    // stale relative to the corpus watermark, active-day count and
    // the activity ratio over the type's own span. One fact
    // aggregate to a ≤|types| relation plus a broadcast watermark;
    // all integer day arithmetic, one snapped ratio. NULL timestamps
    // drop (no day); NULL types form the '__null__' class.
    "freshness_audit" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .filter($"ts".isNotNull)
        .select(coalesce($"event_type", lit("__null__")).as("g"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
      val wm = broadcast(ev.agg(max($"day").as("d1")))
      val per = ev.groupBy($"g").agg(
        min($"day").as("first_day"), max($"day").as("last_day"),
        countDistinct($"day").as("active_days"))
      per.crossJoin(wm)
        .select($"g", $"first_day", $"last_day", $"active_days",
          ($"d1" - $"last_day").as("days_stale"),
          ($"last_day" - $"first_day" + lit(1L)).as("span_days"),
          rnd($"active_days".cast("double") /
            ($"last_day" - $"first_day" + lit(1L)).cast("double"), 6)
            .as("activity_ratio"))
        .orderBy($"g")
    }))

  /** moments_profile column list (2dp-decimal columns by the data
    * model), shared between the engine and the generated oracle.
    */
  private val MomentCols: Seq[(String, String)] = Seq(
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_quantity"),
    ("lineitem", "l_discount"),
    ("orders", "o_totalprice"),
    ("events", "value"))

  /** join_skew_report's audited join keys (the equi-join columns the
    * TPC-H-shaped and event queries actually shuffle on), shared
    * between the engine and the generated oracle.
    */
  private val SkewKeys: Seq[(String, String)] = Seq(
    ("events", "user_id"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"))

  val oracles: Map[String, String] = Map(

    // same code-point class counts (regex formulation — the
    // expression is pinned equal to it by Wave49Spec), same exact
    // 2·class ≥ total majority rule, same priority order
    "script_detect" ->
      s"""WITH cc AS (SELECT lang,
         |  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS lat,
         |  length(regexp_replace(text, '[^0-9]', '', 'g')) AS dig,
         |  length(regexp_replace(text,
         |    '[^\\x{0400}-\\x{04FF}]', '', 'g')) AS cyr,
         |  length(regexp_replace(text,
         |    '[^\\x{0370}-\\x{03FF}]', '', 'g')) AS grk,
         |  length(regexp_replace(text,
         |    '[^\\x{4E00}-\\x{9FFF}]', '', 'g')) AS cjk
         | FROM documents),
         |sc AS (SELECT lang, lat, dig, cyr, grk, cjk,
         |  lat + dig + cyr + grk + cjk AS s5 FROM cc),
         |cl AS (SELECT lang, lat, s5,
         |  CASE WHEN s5 IS NULL OR s5 = 0 THEN 'none'
         |    WHEN lat * 2 >= s5 THEN 'latin'
         |    WHEN dig * 2 >= s5 THEN 'digit'
         |    WHEN cyr * 2 >= s5 THEN 'cyrillic'
         |    WHEN grk * 2 >= s5 THEN 'greek'
         |    WHEN cjk * 2 >= s5 THEN 'cjk'
         |    ELSE 'mixed' END AS script
         | FROM sc)
         |SELECT lang, script, CAST(count(*) AS BIGINT) AS n_docs,
         | CASE WHEN count(CASE WHEN s5 > 0 THEN 1 END) > 0 THEN
         |  ${Q.duckRnd(
          "CAST(sum(CASE WHEN s5 > 0 THEN CAST(" +
            Q.duckRnd("CAST(lat AS DOUBLE) / CAST(s5 AS DOUBLE)", 6) +
            " AS DECIMAL(18,6)) END) AS DOUBLE)" +
            " / count(CASE WHEN s5 > 0 THEN 1 END)", 6)}
         | END AS mean_latin_share
         |FROM cl GROUP BY lang, script
         |ORDER BY lang NULLS LAST, script""".stripMargin,

    // same candidate list, same distinct-⟕-distinct shape
    "inclusion_deps" -> {
      val legs = InclCandidates.map { case (ct, cc, pt, pc, _) =>
        s"""SELECT '$ct.$cc' AS child_col, '$pt.$pc' AS parent_col,
           |  (SELECT count(*) FROM
           |    (SELECT DISTINCT CAST($cc AS BIGINT) AS k FROM $ct
           |     WHERE $cc IS NOT NULL) c) AS n_child,
           |  (SELECT count(*) FROM
           |    (SELECT DISTINCT CAST($cc AS BIGINT) AS k FROM $ct
           |     WHERE $cc IS NOT NULL) c
           |    JOIN (SELECT DISTINCT CAST($pc AS BIGINT) AS k FROM $pt
           |          WHERE $pc IS NOT NULL) p USING (k)) AS n_hit""".stripMargin
      }
      s"""WITH u AS (${legs.mkString("\nUNION ALL\n")})
         |SELECT child_col, parent_col, n_child, n_hit,
         |  CASE WHEN n_child > 0 THEN ${Q.duckRnd(
        "CAST(n_hit AS DOUBLE) / CAST(n_child AS DOUBLE)", 6)}
         |  END AS containment,
         |  n_hit = n_child AS holds
         |FROM u ORDER BY child_col, parent_col""".stripMargin
    },

    // same candidate list, same null-sentinel dependent
    "fd_discovery" -> {
      val legs = FdCandidates.map { case (t, det, dep) =>
        s"""SELECT '$t' AS tbl, '$det' AS det_col, '$dep' AS dep_col,
           |  count(*) AS n_groups,
           |  coalesce(CAST(sum(CASE WHEN card > 1 THEN 1 ELSE 0 END)
           |    AS BIGINT), 0) AS n_violating,
           |  max(card) AS max_card,
           |  coalesce(CAST(sum(CASE WHEN card > 1 THEN 1 ELSE 0 END)
           |    AS BIGINT), 0) = 0 AS holds
           |FROM (SELECT count(DISTINCT coalesce(CAST($dep AS VARCHAR),
           |    '__null__')) AS card
           |  FROM $t WHERE $det IS NOT NULL GROUP BY $det) g""".stripMargin
      }
      s"""SELECT * FROM (${legs.mkString("\nUNION ALL\n")}) u
         |ORDER BY tbl, det_col, dep_col""".stripMargin
    },

    // same half split, same bin arithmetic (one IEEE op sequence),
    // same decimal(18,9) snap before the 10-term sums
    "histogram_drift" ->
      s"""WITH ev AS (SELECT event_type AS t, epoch_ms(ts) AS ms,
         |    CAST(value AS DOUBLE) AS v
         |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |    AND value IS NOT NULL),
         |st AS (SELECT min(ms) AS ms0, max(ms) AS ms1,
         |    min(v) AS v0, max(v) AS v1 FROM ev),
         |b AS (SELECT t,
         |    CASE WHEN ms <= (ms0 + ms1) // 2 THEN 0 ELSE 1 END AS half,
         |    CASE WHEN (v1 - v0) / 10.0 = 0.0 THEN 0
         |      ELSE CAST(least(floor((v - v0) / ((v1 - v0) / 10.0)), 9.0)
         |        AS INT) END AS bin
         |  FROM ev, st),
         |cells AS (SELECT t, bin,
         |    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |  FROM b GROUP BY t, bin),
         |tot AS (SELECT t, CAST(sum(ca) AS BIGINT) AS na,
         |    CAST(sum(cb) AS BIGINT) AS nb FROM cells GROUP BY t),
         |grid AS (SELECT t, na, nb, gs.bin FROM tot,
         |    (SELECT unnest(range(0, 10)) AS bin) gs),
         |pq AS (SELECT g.t, g.na, g.nb,
         |    CAST(coalesce(c.ca, 0) + 1 AS DOUBLE) /
         |      CAST(g.na + 10 AS DOUBLE) AS p,
         |    CAST(coalesce(c.cb, 0) + 1 AS DOUBLE) /
         |      CAST(g.nb + 10 AS DOUBLE) AS q
         |  FROM grid g LEFT JOIN cells c ON g.t = c.t AND g.bin = c.bin),
         |terms AS (SELECT t, na, nb,
         |    CAST(${Q.duckRnd("abs(p - q)", 9)} AS DECIMAL(18,9)) AS tv,
         |    CAST(${Q.duckRnd("sqrt(p * q)", 9)} AS DECIMAL(18,9)) AS bc
         |  FROM pq),
         |agg AS (SELECT t, any_value(na) AS n_a, any_value(nb) AS n_b,
         |    sum(tv) AS stv, sum(bc) AS sbc FROM terms GROUP BY t)
         |SELECT t AS event_type, n_a, n_b,
         |  ${Q.duckRnd("0.5 * CAST(stv AS DOUBLE)", 6)} AS tvd,
         |  ${Q.duckRnd(
        "sqrt(greatest(1.0 - CAST(sbc AS DOUBLE), 0.0))", 6)} AS hellinger,
         |  ${Q.duckRnd("0.5 * CAST(stv AS DOUBLE)", 6)} > 0.1 AS drifted
         |FROM agg ORDER BY event_type""".stripMargin,

    // same regex trio, same 4dp per-doc snap + decimal(18,6) sum
    // same [a-z0-9] normalization, same per-char counts (chars via
    // 1-based index transform — string_split on an empty pattern is
    // not portable), same 10dp term snap and decimal sum
    "char_entropy" ->
      s"""WITH nrm AS (SELECT doc_id,
         |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
         |  FROM documents WHERE text IS NOT NULL),
         |ch AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(s) + 1),
         |      i -> s[CAST(i AS INTEGER)])) AS ch
         |  FROM nrm WHERE len(s) > 0),
         |cnts AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
         |tot AS (SELECT doc_id, ch, c,
         |    CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
         |  FROM cnts),
         |terms AS (SELECT doc_id, c, n,
         |    ${Q.duckRnd(
        "(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))" +
          " * log2(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))", 10)} AS t
         |  FROM tot)
         |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars,
         |  count(*) AS n_distinct,
         |  ${Q.duckRnd(
        "-CAST(sum(CAST(t AS DECIMAL(38,10))) AS DOUBLE)", 8)} AS entropy
         |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "flesch_readability" ->
      s"""WITH sc AS (SELECT source,
         |    ${Q.duckRnd(
        "206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(sent AS DOUBLE))" +
          " - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))", 4)} AS score
         |  FROM (SELECT source,
         |      len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
         |      greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sent,
         |      len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
         |    FROM documents WHERE text IS NOT NULL) t
         |  WHERE w > 0)
         |SELECT source, count(*) AS n_docs,
         |  ${Q.duckRnd(
        "CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE)" +
          " / CAST(count(*) AS DOUBLE)", 4)} AS avg_flesch,
         |  CAST(sum(CASE WHEN score < 30.0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_difficult,
         |  ${Q.duckRnd(
        "CAST(sum(CASE WHEN score < 30.0 THEN 1 ELSE 0 END) AS DOUBLE)" +
          " / CAST(count(*) AS DOUBLE)", 6)} AS difficult_frac
         |FROM sc GROUP BY source ORDER BY source ASC NULLS LAST""".stripMargin,

    // same candidate list, same floored integer pseudo-mean, same
    // decimal operand widths, same closing IEEE sequences
    "moments_profile" -> {
      val legs = MomentCols.map { case (tn, cn) =>
        val m2 = "CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)"
        val m3 = "CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
        val m4 = "CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)"
        s"""SELECT '$tn' AS tbl, '$cn' AS col_name, n,
           |  ${Q.duckRnd(
          "CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0", 6)} AS mean,
           |  ${Q.duckRnd(s"sqrt($m2) / 100.0", 6)} AS std,
           |  CASE WHEN $m2 > 0.0 THEN ${Q.duckRnd(
          s"($m3) / (($m2) * sqrt($m2))", 6)} END AS skewness,
           |  CASE WHEN $m2 > 0.0 THEN ${Q.duckRnd(
          s"($m4) / (($m2) * ($m2)) - 3.0", 6)} END AS ex_kurtosis
           |FROM (
           |  SELECT sc, n,
           |    sum(d2) AS s2, sum(d2 * dv) AS s3, sum(d2 * d2) AS s4
           |  FROM (
           |    SELECT sc, n, dv, CAST(dv * dv AS DECIMAL(19,0)) AS d2
           |    FROM (
           |      SELECT st.sc, st.n,
           |        CAST(c.c - st.mu AS DECIMAL(10,0)) AS dv
           |      FROM (SELECT CAST(CAST($cn AS DECIMAL(18,2)) * 100
           |            AS BIGINT) AS c
           |          FROM $tn WHERE $cn IS NOT NULL) c
           |      CROSS JOIN (
           |        SELECT sum(CAST(c AS DECIMAL(38,0))) AS sc,
           |          count(*) AS n,
           |          CAST(sum(CAST(c AS DECIMAL(38,0))) AS BIGINT)
           |            // count(*) AS mu
           |        FROM (SELECT CAST(CAST($cn AS DECIMAL(18,2)) * 100
           |              AS BIGINT) AS c
           |            FROM $tn WHERE $cn IS NOT NULL) c2) st
           |    ) t
           |  ) t2
           |  GROUP BY sc, n
           |) a""".stripMargin
      }
      s"""SELECT * FROM (${legs.mkString("\nUNION ALL\n")}) u
         |ORDER BY tbl, col_name""".stripMargin
    },

    "psi_stability" ->
      s"""WITH ev AS (SELECT event_type AS t,
         |    (epoch_us(ts) // 1000) // 86400000 AS day, value, event_id
         |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |    AND value IS NOT NULL),
         |mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev),
         |halved AS (SELECT t, value, event_id, day < mid AS ref
         |  FROM ev CROSS JOIN mid),
         |tiled AS (SELECT t, value,
         |    ntile(10) OVER (PARTITION BY t
         |      ORDER BY value NULLS LAST, event_id NULLS LAST) AS tile
         |  FROM halved WHERE ref),
         |te AS (SELECT t, tile, max(value) AS edge FROM tiled
         |  WHERE tile < 10 GROUP BY t, tile),
         |edges AS (SELECT t, list(edge ORDER BY tile) AS edges
         |  FROM te GROUP BY t),
         |binned AS (SELECT h.t, h.ref, len(e.edges) + 1 AS nb,
         |    1 + len(list_filter(e.edges, x -> h.value > x)) AS bin
         |  FROM halved h LEFT JOIN edges e ON h.t = e.t),
         |cell AS (SELECT t, nb, bin,
         |    CAST(sum(CASE WHEN ref THEN 1 ELSE 0 END) AS BIGINT) AS cr,
         |    CAST(sum(CASE WHEN ref THEN 0 ELSE 1 END) AS BIGINT) AS cc
         |  FROM binned GROUP BY t, nb, bin),
         |tot AS (SELECT t, CAST(sum(cr) AS BIGINT) AS nr,
         |    CAST(sum(cc) AS BIGINT) AS nc, max(nb) AS nb
         |  FROM cell GROUP BY t),
         |grid AS (SELECT tot.t, tot.nr, tot.nc, tot.nb, b.bin,
         |    coalesce(cell.cr, 0) AS cr, coalesce(cell.cc, 0) AS cc
         |  FROM tot CROSS JOIN LATERAL (SELECT unnest(range(1, nb + 1))
         |    AS bin) b
         |  LEFT JOIN cell ON cell.t = tot.t AND cell.bin = b.bin),
         |x AS (SELECT t, nr, nc, nb,
         |    (CAST(cr AS DOUBLE) + 0.5)
         |      / (CAST(nr AS DOUBLE) + 0.5 * CAST(nb AS DOUBLE)) AS p,
         |    (CAST(cc AS DOUBLE) + 0.5)
         |      / (CAST(nc AS DOUBLE) + 0.5 * CAST(nb AS DOUBLE)) AS q
         |  FROM grid),
         |psis AS (SELECT t,
         |    CAST(sum(CAST(${Q.duckRnd("(p - q) * ln(p / q)", 10)}
         |      AS DECIMAL(38,10))) AS DOUBLE) AS psi0
         |  FROM x GROUP BY t),
         |sn AS (SELECT tot.t AS event_type, tot.nr AS n_ref,
         |    tot.nc AS n_cur, CAST(tot.nb AS INTEGER) AS n_bins,
         |    ${Q.duckRnd("psi0", 8)} AS psi
         |  FROM tot LEFT JOIN psis ON tot.t = psis.t)
         |SELECT event_type, n_ref, n_cur, n_bins, psi, psi > 0.2 AS drift,
         |  psi IS NULL AS new_type
         |FROM sn ORDER BY event_type""".stripMargin,

    "join_skew_report" -> {
      val legs = SkewKeys.map { case (tn, cn) =>
        s"""SELECT '$tn' AS tbl, '$cn' AS col_name, n_rows, n_keys,
           |  max_cnt, p99_cnt,
           |  ${Q.duckRnd(
          "CAST(max_cnt AS DOUBLE) / CAST(n_rows AS DOUBLE)", 6)}
           |    AS top1_share,
           |  ${Q.duckRnd(
          "CAST(max_cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)" +
            " / CAST(n_rows AS DOUBLE)", 4)} AS skew_factor
           |FROM (SELECT count(*) AS n_keys,
           |    CAST(sum(cnt) AS BIGINT) AS n_rows,
           |    CAST(max(cnt) AS BIGINT) AS max_cnt,
           |    ${Q.duckRnd("quantile_cont(cnt, 0.99)", 4)} AS p99_cnt
           |  FROM (SELECT $cn, count(*) AS cnt FROM $tn
           |    WHERE $cn IS NOT NULL GROUP BY $cn) g) a""".stripMargin
      }
      s"""SELECT * FROM (${legs.mkString("\nUNION ALL\n")}) u
         |ORDER BY tbl, col_name""".stripMargin
    },

    "freshness_audit" ->
      s"""WITH ev AS (SELECT coalesce(event_type, '__null__') AS g,
         |    (epoch_us(ts) // 1000) // 86400000 AS day
         |  FROM events WHERE ts IS NOT NULL),
         |wm AS (SELECT max(day) AS d1 FROM ev),
         |per AS (SELECT g, min(day) AS first_day, max(day) AS last_day,
         |    CAST(count(DISTINCT day) AS BIGINT) AS active_days
         |  FROM ev GROUP BY g)
         |SELECT g, first_day, last_day, active_days,
         |  d1 - last_day AS days_stale,
         |  last_day - first_day + 1 AS span_days,
         |  ${Q.duckRnd(
        "CAST(active_days AS DOUBLE)" +
          " / CAST(last_day - first_day + 1 AS DOUBLE)", 6)}
         |    AS activity_ratio
         |FROM per CROSS JOIN wm ORDER BY g""".stripMargin)
}
