package graft.queries

import graft.{SparkSpecBase, SparkEntry}

/** Physical-plan assertions: the scale properties the queries claim
  * (pushdown, pruning, broadcast, top-k, codegen) must be visible in
  * the executed plan, not just hoped for (SURVEY.md §4.3).
  */
class PlanSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Plan string after execution — AQE has finalized, so codegen
    * stages (`*(n)` / WholeStageCodegen) are visible.
    */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // count() would build a separate query; AQE finalizes only on execution of THIS plan
    df.queryExecution.executedPlan.toString
  }

  test("agg_group: filter pushed to parquet, columns pruned, partial agg, codegen") {
    val p = finalPlan("agg_group")
    assert(p.contains("PushedFilters"), p.take(2000))
    assert(p.contains("LessThan(l_shipdate"), "shipdate filter not pushed")
    assert(!p.contains("l_partkey"), "unused column not pruned from scan")
    assert(p.contains("HashAggregate"), "no hash aggregate")
    assert(p.contains("WholeStageCodegen") || p.contains("*("), "not codegen'd")
  }

  test("join_inner: dimension joins broadcast, fact side not pre-shuffled") {
    val p = plan("join_inner")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("sort_desc: sort+limit fuses to top-k (no global sort)") {
    val p = plan("sort_desc")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("join_range: bucketed rewrite plans a hash join, not nested loop") {
    val p = plan("join_range")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "range join fell back to nested loop")
  }

  test("join_semi/anti plan as semi-join operators, not rewrites") {
    assert(plan("join_semi").contains("LeftSemi"))
    assert(plan("dedup_anti_join").contains("LeftAnti"))
  }

  test("knn_bruteforce: custom vec_dot expression participates in the plan") {
    val p = plan("knn_bruteforce")
    assert(p.toLowerCase.contains("floatvecdot") || p.contains("vec_dot"), p.take(2000))
  }

  test("sql_subquery: EXISTS plans as a semi join, not a rewrite through distinct") {
    val p = plan("sql_subquery")
    assert(p.contains("LeftSemi"), p.take(2000))
  }

  test("limit_n plans a limit, not a full materialization") {
    val p = plan("limit_n")
    assert(p.contains("TakeOrderedAndProject") || p.contains("GlobalLimit"), p.take(2000))
  }

  test("ngram_jaccard: relational verification — no array payloads, no interpreted HOFs") {
    val p = finalPlan("ngram_jaccard")
    assert(!p.contains("collect_set"), "shingle sets materialized as arrays again")
    // higher-order array intersection would appear as these expressions
    assert(!p.contains("array_intersect") && !p.contains("ArrayFilter"),
      "array intersection crept back in")
    assert(p.contains("HashAggregate"), "intersection should be a count aggregate")
  }

  test("knn_ivfpq: centroid probe broadcasts — never a cartesian shuffle") {
    // the K-row centroid table is crossJoin'd against queries and the
    // corpus; both sites pin broadcast(...) so the plan must show a
    // broadcast nested-loop, and a CartesianProduct anywhere means the
    // hint was dropped and a full shuffle cartesian crept in
    val p = plan("knn_ivfpq")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "centroid probe fell back to a cartesian shuffle")
  }

  test("contamination_check: benchmark shingle side broadcasts") {
    val p = finalPlan("contamination_check")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  /** Physical operators of `name`'s plan, NOT descending into cached
    * relations (an InMemoryTableScan leaf prints/holds the whole plan
    * that BUILT the cache — counting inside it would see the build
    * pipeline's operators, which this query precisely does not run).
    * AQE is off for the analysis so the tree is the plain physical
    * plan rather than staged wrappers.
    */
  private def physicalOps(name: String): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val root = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
      def walk(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => Seq(s)
        case other => other +: other.children.flatMap(walk)
      }
      walk(root)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bm25_topk: memoized term relation reused, exactly one ranking window") {
    val ops = physicalOps("bm25_topk")
    // tf / dl / df all branch off the ONE persisted term table — each
    // branch reads cached blocks instead of re-running tokenize+explode
    val cacheReads = ops.count(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec])
    assert(cacheReads >= 3, s"term relation not reused from cache ($cacheReads reads)")
    val windows = ops.count(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
    assert(windows == 1, s"expected exactly one top-k window, got $windows")
  }

  test("dedup_keep_best: cached cluster table read, single top-1 window") {
    val ops = physicalOps("dedup_keep_best")
    // cluster labels must come from the memoized ConnectedComponents
    // result, never a re-derived propagation loop
    assert(ops.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec]),
      "cluster table not read from cache")
    val windows = ops.count(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
    assert(windows == 1, s"expected exactly one keep-best window, got $windows")
  }

  test("pii_scrub: pure scan→project — no shuffle, no join, codegen'd") {
    val p = finalPlan("pii_scrub")
    // only the presentation ORDER BY may exchange (rangepartitioning);
    // a hashpartitioning exchange would mean a real data shuffle crept in
    assert(!p.contains("hashpartitioning"), "scrub pass introduced a data shuffle")
    assert(!p.contains("Join"), "scrub pass should not join")
    assert(p.contains("WholeStageCodegen") || p.contains("*("), "not codegen'd")
  }

  test("dup_ngram_frac: both shingle tables read from cache, no text rescan") {
    val ops = physicalOps("dup_ngram_frac")
    val cacheReads = ops.count(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec])
    assert(cacheReads >= 2, s"memoized shingle tables not reused ($cacheReads reads)")
    // a text rescan would show as a parquet FileScan node (the cached
    // relations' own build plans don't count — physicalOps stops at
    // the InMemoryTableScan boundary, and only nodes OUTSIDE it run)
    val fileScans = ops.count(
      _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    assert(fileScans == 0,
      s"metric rescanned parquet ($fileScans file scans) instead of the cached shingle tables")
  }

  test("unigram_surprise: vocabulary df table broadcasts, term rows from cache") {
    val p = finalPlan("unigram_surprise")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    val ops = physicalOps("unigram_surprise")
    assert(ops.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec]),
      "term relation not read from cache")
  }

  test("cdc_merge: rank-1 pruned map-side (WindowGroupLimit before the shuffle)") {
    val p = plan("cdc_merge")
    // Partial + Final WindowGroupLimit: the rank<=1 filter runs BEFORE
    // the exchange, so the shuffle carries at most one row per
    // (input partition, key) — merging a 100 TB change log stays a
    // keyed top-1, not a full-log sort.
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "expected Partial and Final WindowGroupLimit stages")
  }

  test("stream_join: user equi-join with time-range residual, not nested loop") {
    val p = finalPlan("stream_join")
    assert(p.contains("Join"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval join degenerated to nested loop/cartesian")
    val po = finalPlan("stream_join_outer")
    assert(po.contains("LeftOuter"), "outer attribution join lost its outer-ness")
    assert(!po.contains("BroadcastNestedLoopJoin") && !po.contains("CartesianProduct"),
      "outer interval join degenerated to nested loop/cartesian")
  }

  test("tpch_pricing: pushed date filter, pruned scan, partial aggregation") {
    val p = finalPlan("tpch_pricing")
    assert(p.contains("PushedFilters"), p.take(2000))
    assert(p.contains("LessThanOrEqual(l_shipdate"), "shipdate filter not pushed")
    assert(!p.contains("l_partkey"), "unused column not pruned from scan")
    assert(p.contains("HashAggregate"), "no hash aggregate")
  }

  test("revenue_topn: dimensions broadcast, no nested-loop anywhere") {
    val p = finalPlan("revenue_topn")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "region/nation/customer dims should all broadcast")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "dim hop degenerated to nested loop/cartesian")
  }

  test("bloom_join: might_contain probe on the fact scan, exact semi join after") {
    val p = finalPlan("bloom_join")
    assert(p.contains("might_contain"), p.take(2000))
    assert(p.contains("LeftSemi"), "exact semi join missing after the Bloom prune")
    // the probe must sit scan-side: no shuffle may run before the
    // filter, so the only hashpartitioning exchange feeds the final
    // aggregate, not the probe
    assert(p.contains("BroadcastHashJoin"), "pruned dim side should broadcast")
  }

  test("sessionize_gaps: one user-keyed shuffle feeds both window passes") {
    val p = finalPlan("sessionize_gaps")
    assert(!p.contains("Join"), "sessionization must not self-join")
    // exactly ONE data exchange: both window passes share the user_id
    // partitioning — a second hashpartitioning means the specs
    // diverged. Count inside the AQE FINAL plan only (the plan string
    // also embeds the Initial Plan section, which would double-count).
    val finalSection = p.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalSection).size
    assert(exchanges == 1, s"expected exactly one user_id shuffle, got $exchanges")
    assert(p.contains("Window"), "no window operator in plan")
  }

  test("partition_prune: directory-level pruning visible in the scan") {
    val p = finalPlan("partition_prune")
    assert(p.contains("PartitionFilters"), p.take(2000))
    assert(p.contains("o_orderpriority"), "partition predicate missing from scan")
    // the predicate must NOT survive as a post-scan data filter on the
    // partition column — pruning happens at file listing
    assert(!p.contains("PushedFilters: [IsNotNull(o_orderpriority"),
      "partition predicate leaked into data filters instead of pruning")
  }

  test("sql_hints: the BROADCAST hint flips the orders join to broadcast") {
    val p = plan("sql_hints")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("dpp_join: runtime partition pruning subquery on the partitioned scan") {
    val p = finalPlan("dpp_join")
    assert(p.toLowerCase.contains("dynamicpruning"),
      "no dynamic pruning expression in the partitioned scan:\n" + p.take(2000))
  }

  test("compaction_plan: no single-task corpus sort (range-partitioned running sum)") {
    val p = finalPlan("compaction_plan")
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning")
      || p.toLowerCase.contains("range"), p.take(2000))
  }

  test("stream_custom_state: one user-keyed exchange feeds the typed processor") {
    val p = finalPlan("stream_custom_state")
    assert(p.contains("MapGroups"), "typed group processor missing from plan")
    assert(!p.contains("Join"), "typed sessionization must not join")
  }

  test("doc_chunk: narrow scan→explode expansion, no data shuffle, no join") {
    val p = finalPlan("doc_chunk")
    assert(p.contains("Generate"), "expected explode Generate node")
    assert(!p.contains("Join"), "chunking must not join")
    // only the presentation ORDER BY exchanges (rangepartitioning)
    assert(!p.contains("hashpartitioning"), "chunk expansion introduced a data shuffle")
  }

  test("agg_incremental: both legs pre-aggregate before the merge union") {
    val p = finalPlan("agg_incremental")
    // The point of the operator: history and batch each collapse to
    // |groups| rows BEFORE union+merge — at 100 TB the merge step
    // never sees raw events. Partial+Final per leg plus the merge
    // aggregate = at least 5 HashAggregate nodes in the final plan.
    val finalSection = p.split("== Initial Plan ==").head
    assert("HashAggregate".r.findAllIn(finalSection).size >= 5,
      "expected per-leg partial aggregation before the merge")
    assert(p.contains("Union"), "merge union missing")
    assert(!p.contains("Join"), "incremental merge must not join")
  }

  test("locf_fill/ema_decay: one user-keyed shuffle, single window pass, no join") {
    for (q <- Seq("locf_fill", "ema_decay")) {
      val p = finalPlan(q)
      assert(!p.contains("Join"), s"$q: gap repair must not self-join")
      val finalSection = p.split("== Initial Plan ==").head
      val exchanges = "Exchange hashpartitioning".r.findAllIn(finalSection).size
      assert(exchanges == 1, s"$q: expected exactly one user_id shuffle, got $exchanges")
      assert("Window".r.findAllIn(finalSection).size == 1,
        s"$q: all window functions must share one Window pass")
    }
  }

  test("interval_merge: closing aggregate reuses the window's user partitioning") {
    val p = finalPlan("interval_merge")
    assert(!p.contains("Join"), "interval merge must not self-join")
    // groupBy(user_id, span_id) is satisfied by hashpartitioning(user_id)
    // from the window stage — one data exchange total (plus the
    // presentation rangepartitioning).
    val finalSection = p.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalSection).size
    assert(exchanges == 1, s"expected the span aggregate to reuse the user shuffle, got $exchanges")
  }

  test("sample_reservoir: fixed-size sample plans as top-k, not global sort") {
    val p = plan("sample_reservoir")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("join_nullsafe: null-safe equality still plans a broadcast hash join") {
    val p = plan("join_nullsafe")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "null-safe equality fell back to nested loop")
  }

  test("gap_fill: spine left-joins the daily aggregate with keyed joins only") {
    val p = finalPlan("gap_fill")
    assert(p.contains("LeftOuter"), "spine join lost its outer-ness")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "spine join degenerated to nested loop/cartesian")
    assert(p.contains("Generate"), "expected sequence+explode spine Generate node")
  }

  test("agg_mode: window top-1 runs over group counts, not the fact table") {
    val p = finalPlan("agg_mode")
    assert(p.contains("HashAggregate"), "count aggregate missing")
    assert(p.contains("Window") || p.contains("WindowGroupLimit"),
      "ranked tiebreak missing")
    assert(!p.contains("Join"), "mode must not self-join")
  }

  test("udtf_flatmap: typed expansion is a narrow stage, no data shuffle") {
    val p = finalPlan("udtf_flatmap")
    assert(p.contains("MapPartitions") || p.contains("MapElements"),
      "typed flatMap stage missing")
    assert(!p.contains("hashpartitioning"),
      "typed expansion introduced a data shuffle")
    assert(!p.contains("Join"), "expansion must not join")
  }

  test("variant_funcs: one scan, one aggregate, variant extraction inline") {
    val p = finalPlan("variant_funcs")
    assert(p.contains("HashAggregate"), "no hash aggregate")
    assert(!p.contains("Join"), "variant extraction must not join")
    assert(p.toLowerCase.contains("variant_get"), "variant extraction not in plan")
  }

  test("table_checksum: one scan, partial-aggregated signature, no join") {
    val p = finalPlan("table_checksum")
    val finalSection = p.split("== Initial Plan ==").head
    assert("HashAggregate".r.findAllIn(finalSection).size >= 2,
      "expected partial+final aggregation of the signature")
    assert(!p.contains("Join"), "checksum must not join")
    assert("Scan parquet".r.findAllIn(finalSection).size == 1,
      "signature must come from exactly one scan")
  }

  test("sql_lateral: decorrelated to a ranked join, not per-row re-execution") {
    val p = finalPlan("sql_lateral")
    assert(p.contains("WindowGroupLimit"),
      "correlated LIMIT should decorrelate to a pruned group top-k")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "lateral degenerated to nested loop/cartesian")
  }

  test("vocab_build/bigram_lm: global rank is top-k, never a full sort") {
    for (q <- Seq("vocab_build", "bigram_lm")) {
      val p = finalPlan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q: expected top-k plan, got:\n" + p.take(1500))
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q degenerated to nested loop/cartesian")
    }
  }

  test("bigram_lm: c1 folds from c12 — one corpus scan, reused exchange") {
    val p = finalPlan("bigram_lm")
    val finalSection = p.split("== Initial Plan ==").head
    // the tokenize+explode lineage must execute once: the c1 branch
    // reuses c12's (w1,w2) shuffle instead of re-scanning documents
    val scans = "Scan parquet".r.findAllIn(finalSection).size
    assert(scans == 1, s"expected one documents scan, got $scans")
  }

  test("table_diff: keyed full-outer merge join, not nested loop") {
    val p = finalPlan("table_diff")
    assert(p.contains("FullOuter"), p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "full-outer diff must plan a keyed join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "diff join degenerated to nested loop/cartesian")
  }

  // ---- round-5 driver-bench cost leaders -----------------------------
  // These five queries spiked in the round-5 driver bench on unchanged
  // code; pinning their executed shapes rules plan drift OUT in one
  // read whenever wall time moves again (the per-query cpu_sec/gc_sec
  // columns in the bench JSON cover the environmental side).

  test("state_merge: ONE keyed full-outer join, no nested loop, no extra scans") {
    val p = finalPlan("state_merge")
    assert(p.contains("FullOuter"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "state merge degenerated to nested loop/cartesian")
    val joins = "Join".r.findAllIn(p.split("== Initial Plan ==").head).size
    assert(joins >= 1, "no join in plan")
    // state side scans orders once, updates side scans lineitem once
    val scans = "Scan parquet".r.findAllIn(p.split("== Initial Plan ==").head).size
    assert(scans == 2, s"expected exactly 2 table scans, got $scans")
  }

  test("profile_table: 24-metric profile runs in ONE scan of lineitem") {
    val p = finalPlan("profile_table")
    val finalSection = p.split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(finalSection).size
    assert(scans == 1, s"per-column profiling re-scanned the table: $scans scans")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate") ||
      p.contains("SortAggregate"), "no aggregate in plan")
    assert(p.contains("Expand"), "multi-countDistinct should plan one Expand, not N scans")
    assert(!p.contains("Join"), "profiling must not join")
  }

  test("try_funcs: pure scan→project→sort — no join, no aggregate") {
    val p = finalPlan("try_funcs")
    assert(!p.contains("Join"), "try_funcs must not join")
    assert(!p.contains("HashAggregate"), "try_funcs must not aggregate")
    val scans = "Scan parquet".r.findAllIn(p.split("== Initial Plan ==").head).size
    assert(scans == 1, s"expected one orders scan, got $scans")
  }

  test("unpivot_melt: Expand over a 6-row aggregate, one scan, no join") {
    val p = finalPlan("unpivot_melt")
    val finalSection = p.split("== Initial Plan ==").head
    assert(finalSection.contains("Expand"), "unpivot should plan as Expand")
    val scans = "Scan parquet".r.findAllIn(finalSection).size
    assert(scans == 1, s"expected one lineitem scan, got $scans")
    assert(!p.contains("Join"), "unpivot must not join")
  }

  test("sql_subquery: scalar subquery broadcasts as a one-row subquery node") {
    val p = plan("sql_subquery")
    assert(p.contains("Subquery"), p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "scalar subquery degenerated to cartesian")
  }

  test("lm_score: LM broadcasts (never the corpus pairs), two scans total") {
    val p = finalPlan("lm_score")
    val finalSection = p.split("== Initial Plan ==").head
    // pairs side streams; the |bigram types|-bounded LM is the build
    // side — a pairs-side broadcast would ship every bigram occurrence
    assert(finalSection.contains("BuildRight"), p.take(2000))
    assert(!finalSection.contains("BuildLeft"),
      "corpus pairs chosen as broadcast build side")
    // tokenize+explode runs twice (pairs + LM counts), not three times
    val scans = "Scan parquet".r.findAllIn(finalSection).size
    assert(scans == 2, s"expected 2 documents scans, got $scans")
  }

  test("kmeans_assign: centroids broadcast, map-side argmin before the one shuffle") {
    val p = finalPlan("kmeans_assign")
    val finalSection = p.split("== Initial Plan ==").head
    assert(finalSection.contains("BroadcastExchange"), p.take(2000))
    // the N×K expansion reduces to one row per vector BEFORE the
    // vec_id exchange — partial min(struct) is the map-side combine
    assert(finalSection.contains("partial_min(struct"),
      "assignment shuffles the full N×K expansion")
    // the round-11 null-vector guard must ALSO reach the scan
    assert(finalSection.contains("LessThan(vec_id,50)")
        && finalSection.contains("IsNotNull(embedding)"),
      "centroid/null-vector filters not pushed to the parquet scan")
  }

  test("knn_ivfpq: probes/ADC table broadcast, scan side keyed — no cartesian scoring") {
    val p = finalPlan("knn_ivfpq")
    val finalSection = p.split("== Initial Plan ==").head
    // the ADC scoring join is keyed on (cell) then (q_id,m,code) with
    // the small sides broadcast — the corpus code rows never cross a
    // cartesian; the only nested-loop joins are the bounded K=50
    // centroid broadcasts of the coarse quantizer
    assert(finalSection.contains("BroadcastHashJoin"), p.take(2000))
    assert(!finalSection.contains("CartesianProduct"), "cartesian in ADC scoring")
    assert(finalSection.toLowerCase.contains("floatvecdot"),
      "codegen'd vec_dot missing from the plan")
    assert(finalSection.contains("partial_min(struct"),
      "cell assignment shuffles the full N×K expansion")
  }

  test("rrf_fusion: lexical side keyed on rare terms — exactly one declared brute-force NLJ") {
    val p = finalPlan("rrf_fusion")
    val finalSection = p.split("== Initial Plan ==").head
    // the semantic side is the declared brute-force contrast case
    // (one BroadcastNestedLoopJoin of the 20 query vectors); the
    // lexical side must join keyed on term — a second NLJ would mean
    // the posting-list join degenerated
    val nlj = finalSection.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin")
    assert(nlj == 1, s"expected exactly 1 nested-loop join, found $nlj")
    assert(!finalSection.contains("CartesianProduct"), "cartesian in fusion")
    assert(finalSection.contains("BroadcastHashJoin"), "rare-term join not broadcast-keyed")
  }

  test("mixture_sample: per-source rates broadcast onto a single corpus scan") {
    val p = finalPlan("mixture_sample")
    val finalSection = p.split("== Initial Plan ==").head
    assert(finalSection.contains("BroadcastHashJoin"), p.take(2000))
    assert(!finalSection.contains("SortMergeJoin"),
      "rate join shuffled the corpus instead of broadcasting S rates")
    assert(!finalSection.contains("CartesianProduct"), "cartesian in sampling")
  }

  test("dsir_select: bounded ratio table broadcasts onto the scoring join") {
    // the K=1024-bucket ratio table must BROADCAST to the per-feature
    // scoring join — a sort-merge there shuffles every bigram
    // occurrence of the corpus by bucket, exactly the full-size
    // shuffle the bounded-bucket design exists to avoid
    val p = finalPlan("dsir_select")
    val finalSection = p.split("== Initial Plan ==").head
    assert(finalSection.contains("BroadcastHashJoin"), p.take(2000))
    assert(!finalSection.contains("CartesianProduct"),
      "scalar totals join fell back to a cartesian shuffle")
  }

  test("ccnet_buckets: LM broadcasts; tercile is range-partitioned, never per-lang") {
    val ops = physicalOps("ccnet_buckets")
    assert(ops.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "bigram LM not broadcast to the scoring join")
    // DistributedNtile shape: the score rows flow through a RANGE
    // exchange on (lang, mean_p, doc_id) — a dominant language spans
    // many partitions — and no window over the score rows partitions
    // by lang alone (that would be the single-task-per-language sort
    // the operator exists to avoid). Windows: c1-sum (by w1), local
    // rank (by __pid, lang), and two over the tiny per-(pid,lang)
    // offset aggregate.
    val p = finalPlan("ccnet_buckets")
    assert(p.contains("rangepartitioning"),
      "tercile lost its range exchange:\n" + p.take(2000))
    val windows = ops.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size == 4,
      s"expected c1-sum + local-rank + 2 offset windows, got ${windows.size}")
    val rankWindows = windows.filter(_.windowExpression.exists(
      _.toString.contains("row_number")))
    assert(rankWindows.nonEmpty, "local-rank window missing")
    assert(rankWindows.forall(_.partitionSpec.size >= 2),
      "rank window must partition by (__pid, lang), not lang alone")
  }

  test("sessionize: lag window, running-sum window and session aggregate share ONE user shuffle") {
    val p = finalPlan("sessionize")
    assert(!p.contains("Join"), "sessionize must not join")
    val finalSection = p.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalSection).size
    assert(exchanges == 1,
      s"expected both windows + the session aggregate to reuse the user_id shuffle, got $exchanges")
  }

  test("template_dedup: one scan, map-side partial aggregate, no join") {
    // sf0.01, not sf0.001: the tiny fixture has no template cluster,
    // and AQE folds an empty result to EmptyRelation — no scan to pin
    val df = SparkEntry.queries("template_dedup")(spark, "/root/testdata/sf0.01")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "template_dedup must not join")
    val finalSection = p.split("== Initial Plan ==").head
    assert("FileScan parquet".r.findAllIn(finalSection).size == 1,
      "template_dedup must read the corpus exactly once:\n" + finalSection.take(4000))
    assert("partial_count".r.findAllIn(finalSection).nonEmpty,
      "template aggregate lost its map-side partial half — the shuffle would carry raw rows")
  }

  test("jaccard_link_pred: keyed joins only — no cartesian, anti join planned as LeftAnti") {
    val p = finalPlan("jaccard_link_pred")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "wedge/degree joins must stay keyed:\n" + p.take(2000))
    assert(p.contains("LeftAnti"), "existing-edge exclusion lost its anti join")
  }

  test("benford_test: positive-price filter pushed to the orders scan") {
    val p = finalPlan("benford_test")
    assert(p.contains("GreaterThan(o_totalprice"),
      "o_totalprice > 0 did not reach the parquet reader:\n" + p.take(2000))
  }

  test("audio_neardup: one decode chain (ReusedExchange), verify folded into the keyed join") {
    val p = finalPlan("audio_neardup")
    assert(p.contains("ReusedExchange"),
      "b-side must reuse the a-side signature shuffle — the codec chain may run only once:\n" +
        p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "banded pairing must stay a keyed join")
    assert(p.contains("bit_count"),
      "Hamming verification must sit in the join condition / filter")
  }

  test("kendall_tau: null filters pushed, pair join keyed on custkey") {
    val p = finalPlan("kendall_tau")
    assert(p.contains("IsNotNull(o_custkey"),
      "null exclusion did not reach the orders scan:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the per-customer pair join must stay keyed — its quadratic is bounded by the group")
  }

  test("interval_overlap_join: per-type filters pushed, one user shuffle per session leg, keyed bucket join") {
    // sf0.01 — the sf0.001 fixture has few overlap pairs but the plan
    // shape is scale-invariant; use the bigger corpus for stability
    val df = SparkEntry.queries("interval_overlap_join")(spark, "/root/testdata/sf0.01")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("EqualTo(event_type,view)") && p.contains("EqualTo(event_type,click)"),
      "session-leg type predicates did not reach the events scans:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "interval pairing must stay a keyed (user, bucket) equi-join")
    val finalSection = p.split("== Initial Plan ==").head
    val userShuffles = "Exchange hashpartitioning\\(user_id".r.findAllIn(finalSection).size
    assert(userShuffles == 2,
      s"expected exactly one user_id shuffle per session leg, got $userShuffles:\n" +
        finalSection.take(3000))
  }

  test("cms_heavy_hitters: term_rows cache shared, top-k never a global sort") {
    val p = finalPlan("cms_heavy_hitters")
    assert(p.contains("InMemoryTableScan"),
      "both branches must read the shared memoized term_rows cache:\n" + p.take(2000))
    assert(p.contains("TakeOrderedAndProject(limit=20"),
      "the exact top-20 readout must plan as a top-k, not a global sort")
  }

  test("emd_1d: cell consumers read the memoized grid (AQE reuses the rest)") {
    val p = finalPlan("emd_1d")
    val finalSection = p.split("== Initial Plan ==").head
    // one InMemoryTableScan suffices: AQE stage reuse collapses the
    // a/b CDF sides onto shared shuffle stages, so the cached cell
    // appears once and the remaining consumers ride reused stages
    assert(finalSection.contains("InMemoryTableScan"),
      "cell consumers must read the cached cell table, not fresh scans:\n" +
        finalSection.take(3000))
  }

  test("assoc_rules: memoized pairs, Apriori prune broadcast, top-k never a global sort") {
    try {
      val p = finalPlan("assoc_rules")
      val finalSection = p.split("== Initial Plan ==").head
      assert(finalSection.contains("InMemoryTableScan"),
        "pair consumers must read the memoized basket_items:\n" +
          finalSection.take(3000))
      assert(p.contains("TakeOrderedAndProject"),
        "rule ranking must be a top-k, not a global sort")
      // the basket self-join must be keyed (broadcast or shuffled hash
      // join), never a cartesian over the pruned item stream
      assert(!finalSection.contains("CartesianProduct"),
        "basket self-join degenerated to a cartesian")
    } finally graft.queries.LlmQueries.release(spark, sf, "basket_items")
  }

  test("eb_shrinkage: prior consumers read the memoized cell table") {
    val p = finalPlan("eb_shrinkage")
    val finalSection = p.split("== Initial Plan ==").head
    assert(finalSection.contains("InMemoryTableScan"),
      "prior consumers must read the cached eb_cells:\n" +
        finalSection.take(3000))
  }

  test("mmr_diversify: pool cut pushed to the scan, argmax is a 1-row top-k") {
    val p = finalPlan("mmr_diversify")
    assert(p.contains("LessThan(vec_id,200)"),
      "pool bound must reach the parquet scan")
    assert(p.contains("TakeOrderedAndProject(limit=1"),
      "greedy argmax must be a top-k, not a global sort")
  }

  test("survival_km: null filters pushed, one events scan feeds the grid") {
    val p = finalPlan("survival_km")
    assert(p.contains("IsNotNull(user_id)"),
      "null-user filter must reach the parquet scan")
    // the estimator itself runs on the bounded duration grid: the
    // only corpus-scale stage is the user-keyed aggregate
    assert(p.contains("hashpartitioning(user_id"),
      "per-user aggregate must shuffle on user_id")
  }

  test("char_entropy: both corpus-scale exchanges keyed on doc_id, no joins") {
    val p = finalPlan("char_entropy")
    assert(p.contains("IsNotNull(text)"),
      "text null filter must reach the parquet scan:\n" + p.take(2000))
    assert(!p.contains("Join"), "entropy needs aggregates + a window, never a join")
    // (doc, char) aggregate then doc-keyed window/aggregate — every
    // exchange hashes on doc_id (alone or with ch), nothing global
    assert(!p.contains("SinglePartition") && !p.contains("rangepartitioning(ch"),
      "no global exchange belongs in a per-doc statistic:\n" + p.take(3000))
  }

  test("hill_tail_index: top-k window keyed on event_type, grid broadcast back") {
    val p = finalPlan("hill_tail_index")
    assert(p.contains("hashpartitioning(event_type"),
      "the row_number top-k cut must shuffle on the group key")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "the 5-row (xk, k_eff) grid must broadcast, not shuffle-join")
    assert(!p.contains("CartesianProduct"),
      "no cartesian in a keyed top-k estimator")
  }

  test("rocchio_expand: top-k cuts are TakeOrdered, seed/feedback relations broadcast") {
    val p = finalPlan("rocchio_expand")
    assert(p.contains("TakeOrderedAndProject"),
      "seed/feedback/expansion cuts must be top-k, never a global sort:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "the 2-seed and R-doc relations must broadcast onto the term rows")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")
      || p.contains("BroadcastNestedLoopJoin BuildRight, Cross"),
      "only the 1-row count cross joins are allowed")
  }
}
