package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Flagship multi-operator analytics compositions — the shapes a
  * warehouse user of the reference pipeline actually runs downstream
  * of its star-schema load (`Scripts/transformation_job.py:19-34`
  * produces exactly these fact/dim tables): the TPC-H-style pricing
  * summary, a dims→fact revenue rollup, window-function
  * sessionization, and an explicit Bloom-filter-pruned join.
  *
  * Scale/perf design:
  *  - `tpch_pricing` is one scan → one partial-aggregated hash
  *    aggregate (6 groups); sums run in exact decimal so any partition
  *    order gives bit-identical doubles.
  *  - `revenue_topn` joins the fact table against three broadcast
  *    dimensions; only the customer⋈orders join shuffles, and both
  *    sides shuffle on the join key (no replication).
  *  - `sessionize_gaps` is the islands-and-gaps formulation: one
  *    window shuffle keyed by user, two window passes (lag + running
  *    sum), no self-join — the batch analog of session_window that
  *    assigns each EVENT its session ordinal.
  *  - `bloom_join` demonstrates the runtime-filter pattern: the
  *    dimension's keys fold into an O(KB) Bloom sketch that prunes the
  *    fact scan BEFORE the shuffle/join, the shape that saves the
  *    network at 100 TB when the join is selective. The exact semi
  *    join after the probe keeps the result identical (no false
  *    negatives), so the oracle is the plain semi join.
  */
object AnalyticsQueries {

  /** Exact decimal casts for money×rate arithmetic: price fits
    * (12,2), discount/tax fit (4,2), so the 3-factor product stays
    * ≤ decimal(22,6) — inside both engines' 38-digit ceiling, no
    * precision-loss rounding anywhere.
    */
  private def d12(c: Column) = c.cast("decimal(12,2)")
  private def d4(c: Column) = c.cast("decimal(4,2)")

  val defs: Map[String, QueryFn] = Map(

    // Conversion-latency distribution (wave 62): funnel_conversion
    // gives the per-user signup→purchase rows; this is the SUMMARY a
    // growth dashboard actually shows — conversion rate plus the
    // median/p90 time-to-convert. Same first-signup/first-purchase-
    // after-signup construction (two user-keyed min aggregates, one
    // keyed join); the latency percentiles run over ≤|users| rows
    // with Spark `percentile` ↔ DuckDB `quantile_cont` (the
    // anomaly_mad-proven interpolation pair), 4dp-snapped. Latencies
    // in whole milliseconds (exact integers in both engines).
    "conversion_latency" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val su = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts").as("s_ts"))
      val pu = ev.filter($"event_type" === "purchase")
        .join(su, Seq("user_id"))
        .filter($"ts" >= $"s_ts")
        .groupBy($"user_id").agg(min($"ts").as("p_ts"))
      val lat = su.join(pu, Seq("user_id"), "left")
        .select($"user_id",
          (unix_millis($"p_ts") - unix_millis($"s_ts")).as("lat_ms"))
      lat.agg(
          count(lit(1)).as("n_signup"),
          count($"lat_ms").as("n_converted"),
          rnd(expr("percentile(lat_ms, 0.5)"), 4).as("p50_ms"),
          rnd(expr("percentile(lat_ms, 0.9)"), 4).as("p90_ms"))
        .select($"n_signup", $"n_converted",
          when($"n_signup" > 0L,
            rnd($"n_converted".cast("double") /
              $"n_signup".cast("double"), 6)).as("conv_rate"),
          $"p50_ms", $"p90_ms")
    }),

    // Sequential-pattern mining, PrefixSpan-style (wave 50, Pei et
    // al. 2001 restricted to the 2- and 3-length patterns that cover
    // real funnel analysis): support of pattern a→b (→c) = number of
    // users whose time-ordered event sequence contains it as a
    // SUBSEQUENCE (gaps allowed — the sequential-pattern semantics,
    // not event_transitions' adjacency). The greedy-earliest-match
    // identities make it relational: a→b holds iff minpos(a) <
    // maxpos(b); a→b→c holds iff the earliest b AFTER the earliest a
    // exists and maxpos(c) exceeds it. ONE user-keyed window pass
    // for positions, a per-(user, type) min/max aggregate (≤|A| rows
    // per user), one |A|-wide rejoin for the "earliest b after
    // earliest a" table — every join keyed on user, all grids
    // bounded by the event-type alphabet. All-integer.
    "prefixspan_lite" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ms".asc, $"event_id".asc)
      val pos = Tables.events(s, d)
        .where($"user_id".isNotNull && $"ts".isNotNull &&
          $"event_type".isNotNull)
        .select($"user_id", $"event_id", $"event_type",
          unix_millis($"ts").as("ms"))
        .withColumn("rn", row_number().over(w))
        .select($"user_id", $"event_type", $"rn")
      val mm = pos.groupBy($"user_id", $"event_type")
        .agg(min($"rn").as("minp"), max($"rn").as("maxp"))
      val nUsers = pos.select($"user_id").distinct()
        .agg(count(lit(1)).as("n_users"))
      // support(a→b): minp(a) < maxp(b), a and b from the same user
      val p2 = mm.select($"user_id", $"event_type".as("a"), $"minp")
        .join(mm.select($"user_id", $"event_type".as("b"), $"maxp"),
          Seq("user_id"))
        .where($"minp" < $"maxp")
      val sup2 = p2.groupBy($"a", $"b").agg(count(lit(1)).as("support"))
        .select(concat($"a", lit(">"), $"b").as("pattern"),
          lit(2).as("len"), $"support")
      // earliest b strictly after the earliest a, per (user, a, b)
      val f = pos.join(
        mm.select($"user_id", $"event_type".as("a"), $"minp"),
        Seq("user_id"))
        .where($"rn" > $"minp")
        .groupBy($"user_id", $"a", $"event_type".as("b"))
        .agg(min($"rn").as("fab"))
      val sup3 = f.join(
        mm.select($"user_id", $"event_type".as("c"), $"maxp"),
        Seq("user_id"))
        .where($"maxp" > $"fab")
        .groupBy($"a", $"b", $"c").agg(count(lit(1)).as("support"))
        .select(concat($"a", lit(">"), $"b", lit(">"), $"c").as("pattern"),
          lit(3).as("len"), $"support")
      sup2.union(sup3).crossJoin(broadcast(nUsers))
        .select($"pattern", $"len", $"support",
          ($"support".cast("double") / $"n_users".cast("double"))
            .as("support_frac"))
        .orderBy($"support".desc, $"pattern")
    }),

    // TPC-H Q1-shape pricing summary: the canonical full-scan
    // aggregate benchmark. Decimal sums → deterministic doubles.
    "tpch_pricing" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= lit("1998-12-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          sum(d12($"l_extendedprice") * (d4(lit(1)) - d4($"l_discount")))
            .cast("double").as("sum_disc_price"),
          sum(d12($"l_extendedprice") * (d4(lit(1)) - d4($"l_discount"))
            * (d4(lit(1)) + d4($"l_tax")))
            .cast("double").as("sum_charge"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_extendedprice").as("avg_price"),
          davg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // TPC-H Q5-shape revenue rollup: fact⋈fact shuffle join on the
    // key, then three broadcast dimension hops region→nation→customer.
    "revenue_topn" -> ((s, d) => {
      import s.implicits._
      val rev = d12($"l_extendedprice") * (d4(lit(1)) - d4($"l_discount"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1999-01-01").cast("timestamp")),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(sum(rev).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"r_name".asc_nulls_last, $"n_name".asc_nulls_last)
    }),

    // Islands-and-gaps sessionization: per-event session ordinals via
    // lag + running sum (30-minute gap, same >= semantics as
    // stream_session's session_window). One shuffle keyed by user.
    "sessionize_gaps" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
        .withColumn("new_sess",
          when($"prev_us".isNull ||
            unix_micros($"ts") - $"prev_us" >= 1800000000L, 1).otherwise(0))
        .withColumn("sess_id", sum($"new_sess").over(wRun))
        .select($"user_id", $"event_id",
          unix_millis($"ts").as("ts_ms"), $"sess_id")
        .orderBy($"user_id", $"ts_ms", $"event_id")
    }),

    // Incremental materialized-aggregate maintenance: the existing
    // corpus's aggregate MERGES with the new batch's aggregate instead
    // of recomputing over history — count and decimal-sum are
    // mergeable states, so the merge is exact and the result is
    // bit-identical to the full recompute (which is what the oracle
    // runs). At 100 TB this turns a daily full-history scan into a
    // batch-sized one; the merge step touches |groups| rows.
    "agg_incremental" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      def part(p: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        ev.filter(p($"event_id"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum(dec($"value")).as("sv"))
      val existing = part(_ % 10 =!= 0)
      val batch = part(_ % 10 === 0)
      existing.unionByName(batch)
        .groupBy($"event_type")
        .agg(sum($"n").as("n"), sum($"sv").cast("double").as("sum_value"))
        .orderBy($"event_type".asc_nulls_last)
    }),

    // Version diff of a keyed table (the data-ops regression report):
    // one full outer join on the key classifies every row as
    // added / removed / changed, unchanged rows drop out. Exact
    // decimal compare, so double noise can't fake a change.
    "table_diff" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val v1 = o.filter($"o_orderkey" % 2 === 0)
        .select($"o_orderkey", dec($"o_totalprice").as("p1"))
      val v2 = o.filter($"o_orderkey" % 3 === 0)
        .select($"o_orderkey", (dec($"o_totalprice") +
          when($"o_orderkey" % 9 === 0, dec(lit(1))).otherwise(dec(lit(0)))).as("p2"))
      v1.join(v2, Seq("o_orderkey"), "full_outer")
        .withColumn("status",
          when($"p1".isNull, "added")
            .when($"p2".isNull, "removed")
            .when($"p1" =!= $"p2", "changed")
            .otherwise("unchanged"))
        .filter($"status" =!= "unchanged")
        .select($"o_orderkey", $"status",
          $"p1".cast("double").as("old_price"), $"p2".cast("double").as("new_price"))
        .orderBy($"o_orderkey")
    }),

    // Order-independent table fingerprint — the migration/replication
    // validator: after copying a 100 TB table, both sides compute
    // count + XOR + bounded-sum of per-row content hashes and compare
    // constant-size signatures instead of rows. XOR and sum commute,
    // so the signature is independent of partitioning and row order;
    // doubles are canonicalized through decimal(18,2) strings so both
    // engines hash identical bytes. One scan, one partial-aggregated
    // hash aggregate, three signature rows out.
    "table_checksum" -> ((s, d) => {
      import s.implicits._
      val rowStr = concat_ws("|",
        $"l_orderkey", $"l_linenumber",
        dec($"l_quantity").cast("string"),
        dec($"l_extendedprice").cast("string"),
        $"l_returnflag", $"l_linestatus")
      // first 15 hex digits of md5 → 60-bit int (fits long exactly)
      val h = conv(substring(md5(rowStr), 1, 15), 16, 10).cast("long")
      Tables.lineitem(s, d)
        .select($"l_returnflag", h.as("h"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor_sig"),
          sum(pmod($"h", lit(1000000000L))).as("sum_sig"))
        .orderBy($"l_returnflag".asc_nulls_last)
    }),

    // Explicit runtime-filter join: high-value orders' keys fold into
    // a Bloom sketch (distributed build, sketch-sized driver traffic)
    // that prunes the lineitem scan before the exact semi join — see
    // [[graft.plans.BloomFunctions]]. Output identical to the plain
    // semi join (no false negatives), which is what the oracle runs.
    "bloom_join" -> ((s, d) => {
      import s.implicits._
      // the filtered dimension feeds THREE consumers (count, bloom
      // build, semi-join build side) — materialize it once instead of
      // re-scanning orders per consumer. persist (not localCheckpoint):
      // persist keeps the lineage, so on a real cluster a lost
      // executor's blocks recompute from the orders scan, where a
      // localCheckpoint (blocks only, no lineage) would make the frame
      // unrecoverable mid-query. Blocks are reclaimed by the
      // ContextCleaner when the frame goes unreachable.
      val sel = Tables.orders(s, d)
        .filter($"o_totalprice" > 450000.0)
        .select($"o_orderkey")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // expected count from the actual selective cardinality (one
      // metadata-scale job that also materializes the cache), not a
      // guessed constant that would pin the false-positive rate to one
      // scale factor
      val cnt = sel.count()
      val expected = math.max(1000L, cnt)
      // empty-dimension guard: stat.bloomFilter over zero rows yields
      // a sketch with null internals (serialize NPEs). The bloom is
      // pure pruning ahead of an exact semi join, so the degenerate
      // prune is simply `false` — identical rows (none) either way.
      val prune =
        if (cnt == 0) lit(false)
        else {
          val bloom = lit(graft.plans.BloomFunctions.serialize(
            sel.stat.bloomFilter("o_orderkey", expected, 0.01)))
          graft.plans.BloomFunctions.register(s)
          graft.plans.BloomFunctions.mightContain(bloom, $"l_orderkey")
        }
      Tables.lineitem(s, d)
        .filter(prune)
        .join(sel, $"l_orderkey" === $"o_orderkey", "left_semi")
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n_items"), dsum($"l_extendedprice").as("revenue"))
        .orderBy($"l_orderkey")
    }),

    // MAD-based robust outlier detection — the heavy-tail-proof
    // complement of outlier_zscore: median/MAD break down at 50%
    // contamination where mean/stddev break at one bad row. Two tiny
    // per-group statistic tables (exact interpolated medians, 4dp
    // Q.rnd-snapped so both engines clip on identical thresholds —
    // winsorize's bounds pattern) BROADCAST back onto the event scan;
    // the fact table never shuffles. Threshold 4.4478 = 3σ-equivalent
    // (3 × 1.4826, the normal-consistency constant) as one literal in
    // both engines. Output is the per-group audit (n, med, mad,
    // outlier count/fraction), the shape a data-quality monitor
    // ingests.
    "anomaly_mad" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_type", $"event_id", $"value")
      val med = broadcast(ev.groupBy($"event_type")
        .agg(rnd(expr("percentile(value, 0.5)"), 4).as("med")))
      val dev = ev.join(med, Seq("event_type"))
        .withColumn("dev", abs($"value" - $"med"))
      val mad = broadcast(dev.groupBy($"event_type")
        .agg(rnd(expr("percentile(dev, 0.5)"), 4).as("mad")))
      dev.join(mad, Seq("event_type"))
        .groupBy($"event_type", $"med", $"mad")
        .agg(count(lit(1)).as("n"),
          sum(when($"dev" > lit(4.4478) * $"mad", 1L).otherwise(0L)).as("n_outliers"))
        .select($"event_type", $"n", $"med", $"mad", $"n_outliers",
          ($"n_outliers".cast("double") / $"n".cast("double")).as("outlier_frac"))
        .orderBy($"event_type")
    }),

    // Winsorization — clip a measure to its per-group [p10, p90] exact
    // percentiles, the standard robust-stats cleanup before training a
    // model on heavy-tailed data. Two passes sharing one scan shape:
    // the tiny per-group bound table (one row per returnflag) computes
    // with exact interpolated percentiles and BROADCASTS back onto the
    // fact scan — the fact table itself never shuffles for the clip.
    // Bounds are 4dp-snapped (Q.rnd) so the clip thresholds are
    // engine-identical; clipping picks one of {lo, x, hi}, all exact.
    "winsorize" -> ((s, d) => {
      import s.implicits._
      val bounds = broadcast(Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(rnd(expr("percentile(l_extendedprice, 0.1)"), 4).as("lo"),
          rnd(expr("percentile(l_extendedprice, 0.9)"), 4).as("hi")))
      Tables.lineitem(s, d)
        .join(bounds, Seq("l_returnflag"))
        .select($"l_returnflag", $"l_orderkey", $"l_linenumber",
          $"l_extendedprice",
          least(greatest($"l_extendedprice", $"lo"), $"hi").as("clipped"),
          ($"l_extendedprice" < $"lo" || $"l_extendedprice" > $"hi").as("was_clipped"))
        .orderBy($"l_returnflag", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
    }),

    // TPC-H Q7-shape volume shipping at region grain: cross-region
    // trade volume by ship year (supplier region ≠ customer region —
    // nation-pair grain isn't stably populated by the fixture's
    // 10-supplier table, region grain is at every sf). The fact table
    // joins orders on the key (shuffle); every dimension hop
    // (supplier, customer, both nation→region legs) broadcasts, so no
    // second corpus-scale shuffle exists before the aggregate.
    // Revenue is the decimal-exact Q1 idiom.
    "tpch_volume_shipping" -> ((s, d) => {
      import s.implicits._
      val rev = $"l_extendedprice".cast("decimal(12,2)") *
        (lit(1).cast("decimal(4,2)") - $"l_discount".cast("decimal(4,2)"))
      def natRegion(keyOut: String, nameOut: String) =
        broadcast(Tables.nation(s, d)
          .join(Tables.region(s, d), $"n_regionkey" === $"r_regionkey")
          .select($"n_nationkey".as(keyOut), $"r_name".as(nameOut)))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .join(natRegion("sn_key", "supp_region"), $"s_nationkey" === $"sn_key")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(natRegion("cn_key", "cust_region"), $"c_nationkey" === $"cn_key")
        .filter($"supp_region" =!= $"cust_region")
        .groupBy($"supp_region", $"cust_region",
          year($"l_shipdate").as("l_year"))
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
        .orderBy($"supp_region".asc_nulls_last, $"cust_region".asc_nulls_last, $"l_year".asc_nulls_last)
    }),

    // TPC-H Q8-shape market share: NATION_2's share of PROMO-part
    // revenue sold into the ASIA market per order year. Two decimal
    // sums ride ONE aggregate (conditional sum ≡ the filtered sum);
    // the share is a single IEEE division of the two exact totals.
    "tpch_market_share" -> ((s, d) => {
      import s.implicits._
      val rev = $"l_extendedprice".cast("decimal(12,2)") *
        (lit(1).cast("decimal(4,2)") - $"l_discount".cast("decimal(4,2)"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter($"p_type" === "PROMO")),
          $"l_partkey" === $"p_partkey")
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)
          .select($"n_nationkey".as("cn_key"), $"n_regionkey")),
          $"c_nationkey" === $"cn_key")
        .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.nation(s, d)
          .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))),
          $"s_nationkey" === $"sn_key")
        .groupBy(year($"o_orderdate").as("o_year"))
        .agg(
          sum(when($"supp_nation" === "NATION_2", rev))
            .cast("double").as("nation_rev"),
          sum(rev).cast("double").as("total_rev"))
        .select($"o_year", $"nation_rev", $"total_rev",
          rnd($"nation_rev" / $"total_rev", 6).as("mkt_share"))
        .orderBy($"o_year".asc_nulls_last)
    }),

    // 1-D earth mover's distance between event-type value
    // distributions (wave 35): the drift metric that, unlike a KS
    // sup-norm, charges for HOW FAR mass must move, not just the
    // largest CDF gap — and stays transcendental-free (sums of
    // |CDF differences| over a fixed bin grid, unlike a KL/PSI).
    // One map-side-combinable (type, bin) cell aggregate is the only
    // corpus-scale work; CDFs, the full type×bin zero-filled grid
    // (absent cells carry the running CDF forward — cramers_v grid
    // idiom), and the |types|²/2 pair join all live on a ≤|types|×
    // |bins| relation. Per-bin |ΔCDF| terms are decimal(38,6)-
    // snapped so each pair's sum is bin-order-free. NULL types form
    // '__null__'; NULL values are excluded (no bin to put them in).
    "emd_1d" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .filter($"value".isNotNull)
        .select(coalesce($"event_type", lit("__null__")).as("t"),
          floor($"value" / lit(EmdBinWidth)).cast("long").as("bin"))
      // the one corpus-scale pass, memoized: three consumers (bin
      // spine, per-type totals, grid fill) would otherwise each
      // re-execute the scan+aggregate lineage — 3 corpus scans for a
      // ≤|types|×|bins|-row relation (the bigram_lm one-pass rule;
      // the cached table is bounded, so it is never released)
      val cell = LlmQueries.memoized(s, d, "emd_cells") {
        ev.groupBy($"t", $"bin").agg(count(lit(1)).as("n"))
      }
      val bins = cell.select($"bin").distinct()
      val tot = cell.groupBy($"t").agg(sum($"n").as("nt"))
      val grid = tot.crossJoin(broadcast(bins))
        .join(cell, Seq("t", "bin"), "left")
        .withColumn("n", coalesce($"n", lit(0L)))
      val wc = Window.partitionBy($"t").orderBy($"bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cdf = grid
        .withColumn("cdf", sum($"n").over(wc).cast("double") /
          $"nt".cast("double"))
        .select($"t", $"bin", $"nt", $"cdf")
      val term = rnd(abs(col("a.cdf") - col("b.cdf")), 6)
        .cast("decimal(38,6)")
      cdf.as("a").join(cdf.as("b"),
          col("a.bin") === col("b.bin") && col("a.t") < col("b.t"))
        .groupBy(col("a.t").as("type_a"), col("b.t").as("type_b"),
          col("a.nt").as("n_a"), col("b.nt").as("n_b"))
        .agg(sum(term).cast("double").as("emd_bins"))
        .select($"type_a", $"type_b", $"n_a", $"n_b",
          rnd($"emd_bins", 6).as("emd_bins"))
        .orderBy($"type_a", $"type_b")
    }),

    // Association-rule mining, the pair stage of Apriori (Agrawal &
    // Srikant 1994 — public): baskets are orders, items are parts.
    // Scale shape: the frequent-item relation is vocabulary-bounded,
    // so it BROADCASTS back onto the item stream as the Apriori
    // candidate prune BEFORE the basket self-join (infrequent items
    // never enter the quadratic stage); the self-join shuffles once
    // on basket — both sides are the same relation, so the second
    // side reads the reused exchange — and per-basket fan-out is
    // basket-size-bounded (TPC-H orders hold ≤ ~13 distinct parts; a
    // web-scale basket source would cap basket size first, like the
    // LSH mega-bucket cap). support/confidence/lift are single IEEE
    // divisions over exact integer counts (correctly rounded,
    // cross-engine-identical — the mann_whitney rule), so the
    // rule ranking needs no snapping; the top-100 is a TakeOrdered.
    "assoc_rules" -> ((s, d) => {
      import s.implicits._
      // memoized: the distinct pair relation has three consumers
      // (basket count, item counts, the pair join input) — without
      // the cache each reference re-executes the scan+distinct
      // lineage, 3 corpus passes for one query (the emd_cells /
      // shingles rule). Corpus-scale, so Bench releases it right
      // after this query (its only consumer).
      val items = LlmQueries.memoized(s, d, "basket_items") {
        Tables.lineitem(s, d)
          .select($"l_orderkey".as("basket"), $"l_partkey".as("item"))
          .distinct()
      }
      val nB = items.agg(countDistinct($"basket").as("n_baskets"))
      val freq = items.groupBy($"item").agg(count(lit(1)).as("n_item"))
        .crossJoin(broadcast(nB))
        .filter($"n_item" * lit(AssocSupportDenom) >= $"n_baskets")
      val fi = items.join(broadcast(freq), Seq("item"))
      val pairs = fi.as("a")
        .join(fi.as("b"),
          col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"),
          col("a.n_item").as("n_a"), col("b.n_item").as("n_b"),
          col("a.n_baskets").as("n_baskets"))
        .agg(count(lit(1)).as("n_ab"))
        .filter($"n_ab" >= AssocMinPairCount)
      val rules = pairs.select(
          $"item_a".as("antecedent"), $"item_b".as("consequent"),
          $"n_a".as("n_ante"), $"n_b".as("n_cons"), $"n_ab", $"n_baskets")
        .unionAll(pairs.select(
          $"item_b".as("antecedent"), $"item_a".as("consequent"),
          $"n_b".as("n_ante"), $"n_a".as("n_cons"), $"n_ab", $"n_baskets"))
      rules.select($"antecedent", $"consequent", $"n_ante", $"n_cons", $"n_ab",
          ($"n_ab".cast("double") / $"n_baskets".cast("double")).as("support"),
          ($"n_ab".cast("double") / $"n_ante".cast("double")).as("confidence"),
          (($"n_ab" * $"n_baskets").cast("double") /
            ($"n_ante" * $"n_cons").cast("double")).as("lift"))
        .orderBy($"lift".desc, $"antecedent", $"consequent")
        .limit(100)
    }),

    // RFM customer segmentation (recency/frequency/monetary
    // quartiles — the classic retention/value segmentation): one
    // orders scan → per-customer aggregate, then three skew-free
    // exact NTILE passes over that aggregate (DistributedNtile —
    // each a bounded range shuffle, never a single-partition global
    // sort; at 100 TB the customer aggregate is still |customers|
    // rows and each pass stays range-balanced). The segment rollup
    // is a ≤64-cell aggregate; monetary rides exact decimal so the
    // quartile order key is partition-order-free.
    "rfm_segmentation" -> ((s, d) => {
      import s.implicits._
      val cust = Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(max($"o_orderdate").as("last_order"),
          count(lit(1)).as("frequency"),
          sum(dec($"o_totalprice")).as("monetary"))
        .withColumn("g", lit(1))
      val r = graft.operators.DistributedNtile.withNtile(cust, "g",
        Seq($"last_order".desc, $"o_custkey".asc), 4, "r_tile")
      val rf = graft.operators.DistributedNtile.withNtile(r, "g",
        Seq($"frequency".desc, $"o_custkey".asc), 4, "f_tile")
      val rfm = graft.operators.DistributedNtile.withNtile(rf, "g",
        Seq($"monetary".desc, $"o_custkey".asc), 4, "m_tile")
      rfm.groupBy($"r_tile", $"f_tile", $"m_tile")
        .agg(count(lit(1)).as("n_customers"),
          sum($"frequency").as("n_orders"),
          sum($"monetary").cast("double").as("revenue"))
        .orderBy($"r_tile", $"f_tile", $"m_tile")
    }),

    // Marketing attribution (wave 46): for every purchase, credit the
    // FIRST and LAST non-purchase touch inside the 7-day lookback —
    // first-touch vs last-touch, the two models every attribution
    // report contrasts. One user-keyed window shuffle computes each
    // purchase's first/last touch TIMESTAMP via conditional min/max
    // over an event-time RANGE frame (peers at the same ms excluded
    // by the −1 upper bound); the touch's type resolves through a
    // (user, ms)-keyed join + min_by/max_by on event_id — no
    // per-purchase scan, no self-cartesian. Output is the per-type
    // credit table.
    "attribution_touch" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .where($"user_id".isNotNull && $"ts".isNotNull &&
          $"event_type".isNotNull)
        .select($"user_id", $"event_id", $"event_type",
          unix_millis($"ts").as("ms"))
      val w = Window.partitionBy($"user_id").orderBy($"ms")
        .rangeBetween(-AttrWindowMs, -1L)
      val p = ev
        .withColumn("ft_ms",
          min(when($"event_type" =!= "purchase", $"ms")).over(w))
        .withColumn("lt_ms",
          max(when($"event_type" =!= "purchase", $"ms")).over(w))
        .where($"event_type" === "purchase" && $"ft_ms".isNotNull)
        .select($"user_id", $"event_id".as("p_id"), $"ft_ms", $"lt_ms")
      // fully renamed touch columns: p and touches share lineage (both
      // project ev), so p("user_id") === touches("user_id") resolves
      // both sides to the SAME attribute — a trivially-true predicate
      // that silently crosses users. Disambiguate by name, not by
      // dataframe reference.
      val touches = ev.where($"event_type" =!= "purchase")
        .select($"user_id".as("t_user"), $"ms".as("t_ms"),
          $"event_id".as("t_id"), $"event_type".as("t_type"))
      val firsts = p.join(touches,
          $"user_id" === $"t_user" && $"ft_ms" === $"t_ms")
        .groupBy($"p_id")
        .agg(min_by($"t_type", $"t_id").as("event_type"))
        .select($"event_type", lit(1L).as("f"), lit(0L).as("l"))
      val lasts = p.join(touches,
          $"user_id" === $"t_user" && $"lt_ms" === $"t_ms")
        .groupBy($"p_id")
        .agg(max_by($"t_type", $"t_id").as("event_type"))
        .select($"event_type", lit(0L).as("f"), lit(1L).as("l"))
      firsts.unionAll(lasts)
        .groupBy($"event_type")
        .agg(sum($"f").as("n_first_touch"), sum($"l").as("n_last_touch"))
        .orderBy($"event_type")
    })
  )

  /** Attribution lookback window (7 days), mirrored in the oracle. */
  private val AttrWindowMs = 7L * 86400000L

  /** Apriori frequent-item bar: an item must appear in ≥ 1/denom of
    * baskets (0.05 %) to enter the pair stage — integer cross-multiply,
    * no division. Mirrored in the oracle.
    */
  private val AssocSupportDenom = 2000L

  /** Minimum co-occurrence count for a pair to become a rule. */
  private val AssocMinPairCount = 3L

  /** Bin width (in value units) for the emd_1d histogram grid —
    * value spans ~[0, 500), so 25.0 gives ~20 populated bins.
    * Dyadic-free but exact: floor(value/25) is one IEEE divide +
    * floor, identical cross-engine. Mirrored.
    */
  private val EmdBinWidth = 25.0

  val oracles: Map[String, String] = Map(

    "conversion_latency" ->
      s"""WITH su AS (SELECT user_id, min(ts) AS s_ts FROM events
         |  WHERE event_type = 'signup' GROUP BY user_id),
         |pu AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
         |  JOIN su ON e.user_id = su.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts >= su.s_ts
         |  GROUP BY e.user_id),
         |lat AS (SELECT su.user_id,
         |    epoch_us(pu.p_ts) // 1000 - epoch_us(su.s_ts) // 1000
         |      AS lat_ms
         |  FROM su LEFT JOIN pu ON su.user_id = pu.user_id)
         |SELECT count(*) AS n_signup,
         |  count(lat_ms) AS n_converted,
         |  CASE WHEN count(*) > 0 THEN ${Q.duckRnd(
        "CAST(count(lat_ms) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)}
         |    END AS conv_rate,
         |  ${Q.duckRnd("quantile_cont(lat_ms, 0.5)", 4)} AS p50_ms,
         |  ${Q.duckRnd("quantile_cont(lat_ms, 0.9)", 4)} AS p90_ms
         |FROM lat""".stripMargin,

    // same position ranks, same greedy-earliest-match identities
    "prefixspan_lite" ->
      """WITH pos AS (SELECT user_id, event_type,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY epoch_us(ts) // 1000, event_id) AS rn
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |   AND event_type IS NOT NULL),
        |mm AS (SELECT user_id, event_type, min(rn) AS minp,
        |   max(rn) AS maxp FROM pos GROUP BY user_id, event_type),
        |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM pos),
        |s2 AS (SELECT ma.event_type || '>' || mb.event_type AS pattern,
        |   2 AS len, CAST(count(*) AS BIGINT) AS support
        |  FROM mm ma JOIN mm mb ON ma.user_id = mb.user_id
        |  WHERE ma.minp < mb.maxp
        |  GROUP BY ma.event_type, mb.event_type),
        |f AS (SELECT p.user_id, ma.event_type AS a, p.event_type AS b,
        |   min(p.rn) AS fab
        |  FROM pos p JOIN mm ma ON p.user_id = ma.user_id
        |  WHERE p.rn > ma.minp
        |  GROUP BY p.user_id, ma.event_type, p.event_type),
        |s3 AS (SELECT f.a || '>' || f.b || '>' || mc.event_type AS pattern,
        |   3 AS len, CAST(count(*) AS BIGINT) AS support
        |  FROM f JOIN mm mc ON f.user_id = mc.user_id
        |  WHERE mc.maxp > f.fab
        |  GROUP BY f.a, f.b, mc.event_type)
        |SELECT pattern, CAST(len AS INTEGER) AS len, support,
        | CAST(support AS DOUBLE) / CAST(n_users AS DOUBLE) AS support_frac
        |FROM (SELECT * FROM s2 UNION ALL SELECT * FROM s3)
        |CROSS JOIN nu
        |ORDER BY support DESC, pattern""".stripMargin,

    "tpch_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |   AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |   * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
        |   AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(l_quantity) AS DOUBLE) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(l_extendedprice) AS DOUBLE) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(l_discount) AS DOUBLE) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "revenue_topn" ->
      """SELECT r_name, n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |   AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    // epoch_us comparisons floor to Spark's µs truncation of the
    // nanosecond source timestamps (Q doc, stream_join precedent)
    "sessionize_gaps" ->
      """SELECT user_id, event_id, epoch_us(ts) // 1000 AS ts_ms, sess_id FROM (
        | SELECT user_id, event_id, ts,
        |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        | FROM (
        |  SELECT user_id, event_id, ts,
        |   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |        THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) f
        |) t ORDER BY user_id, ts_ms, event_id""".stripMargin,

    // the oracle is the FULL recompute — the merge must be invisible
    "agg_incremental" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "table_diff" ->
      """WITH v1 AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p1
        |            FROM orders WHERE o_orderkey % 2 = 0),
        |v2 AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) +
        |         (CASE WHEN o_orderkey % 9 = 0 THEN CAST(1 AS DECIMAL(18,2))
        |               ELSE CAST(0 AS DECIMAL(18,2)) END) AS p2
        |       FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT o_orderkey,
        | CASE WHEN p1 IS NULL THEN 'added'
        |      WHEN p2 IS NULL THEN 'removed'
        |      WHEN p1 <> p2 THEN 'changed'
        |      ELSE 'unchanged' END AS status,
        | CAST(p1 AS DOUBLE) AS old_price, CAST(p2 AS DOUBLE) AS new_price
        |FROM v1 FULL OUTER JOIN v2 USING (o_orderkey)
        |WHERE (CASE WHEN p1 IS NULL THEN 'added'
        |            WHEN p2 IS NULL THEN 'removed'
        |            WHEN p1 <> p2 THEN 'changed'
        |            ELSE 'unchanged' END) <> 'unchanged'
        |ORDER BY o_orderkey""".stripMargin,

    "table_checksum" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        | bit_xor(h) AS xor_sig,
        | CAST(sum(h % 1000000000) AS BIGINT) AS sum_sig
        |FROM (
        | SELECT l_returnflag,
        |  CAST(('0x' || substr(md5(concat_ws('|',
        |    l_orderkey, l_linenumber,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR),
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
        |    l_returnflag, l_linestatus)), 1, 15)) AS BIGINT) AS h
        | FROM lineitem) t
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "bloom_join" ->
      """SELECT l_orderkey, count(*) AS n_items,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0)
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin,

    "anomaly_mad" ->
      s"""WITH m AS (SELECT event_type,
         |  ${Q.duckRnd("quantile_cont(value, 0.5)", 4)} AS med
         | FROM events GROUP BY event_type),
         |d AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS dev
         |      FROM events e JOIN m USING (event_type)),
         |md AS (SELECT event_type, ${Q.duckRnd("quantile_cont(dev, 0.5)", 4)} AS mad
         |       FROM d GROUP BY event_type)
         |SELECT d.event_type, count(*) AS n, d.med, md.mad,
         | CAST(sum(CASE WHEN d.dev > 4.4478 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_outliers,
         | CAST(sum(CASE WHEN d.dev > 4.4478 * md.mad THEN 1 ELSE 0 END) AS DOUBLE)
         |   / CAST(count(*) AS DOUBLE) AS outlier_frac
         |FROM d JOIN md USING (event_type)
         |GROUP BY d.event_type, d.med, md.mad
         |ORDER BY d.event_type""".stripMargin,

    "winsorize" ->
      s"""WITH b AS (SELECT l_returnflag,
         |  ${Q.duckRnd("quantile_cont(l_extendedprice, 0.1)", 4)} AS lo,
         |  ${Q.duckRnd("quantile_cont(l_extendedprice, 0.9)", 4)} AS hi
         | FROM lineitem GROUP BY l_returnflag)
         |SELECT l.l_returnflag, l.l_orderkey, l.l_linenumber,
         | l.l_extendedprice,
         | least(greatest(l.l_extendedprice, b.lo), b.hi) AS clipped,
         | (l.l_extendedprice < b.lo OR l.l_extendedprice > b.hi) AS was_clipped
         |FROM lineitem l JOIN b USING (l_returnflag)
         |ORDER BY l.l_returnflag, l.l_orderkey, l.l_linenumber, l.l_extendedprice""".stripMargin,

    "tpch_volume_shipping" ->
      """SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
        | CAST(year(l_shipdate) AS INTEGER) AS l_year,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |   AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation sn ON s_nationkey = sn.n_nationkey
        | JOIN region sr ON sn.n_regionkey = sr.r_regionkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation cn ON c_nationkey = cn.n_nationkey
        | JOIN region cr ON cn.n_regionkey = cr.r_regionkey
        |WHERE sr.r_name <> cr.r_name
        |GROUP BY sr.r_name, cr.r_name, year(l_shipdate)
        |ORDER BY supp_region, cust_region, l_year""".stripMargin,

    "tpch_market_share" ->
      """WITH j AS (
        | SELECT year(o_orderdate) AS o_year, sn.n_name AS supp_nation,
        |  CAST(l_extendedprice AS DECIMAL(12,2))
        |   * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS rev
        | FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey),
        |a AS (SELECT CAST(o_year AS INTEGER) AS o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev END) AS DOUBLE)
        |    AS nation_rev,
        |  CAST(sum(rev) AS DOUBLE) AS total_rev
        | FROM j GROUP BY o_year)
        |SELECT o_year, nation_rev, total_rev,
        |  floor((nation_rev / total_rev) * 1000000.0 + 0.5) / 1000000.0
        |    AS mkt_share
        |FROM a ORDER BY o_year""".stripMargin,

    // same bin grid, same zero-filled CDFs, same decimal-snapped
    // |ΔCDF| terms, same pair join on the bounded relation
    "emd_1d" ->
      s"""WITH e AS (SELECT coalesce(event_type, '__null__') AS t,
         |  CAST(floor(value / $EmdBinWidth) AS BIGINT) AS bin
         | FROM events WHERE value IS NOT NULL),
         |cell AS (SELECT t, bin, count(*) AS n FROM e GROUP BY t, bin),
         |bins AS (SELECT DISTINCT bin FROM cell),
         |tot AS (SELECT t, CAST(sum(n) AS BIGINT) AS nt
         | FROM cell GROUP BY t),
         |grid AS (SELECT tot.t, tot.nt, bins.bin, coalesce(cell.n, 0) AS n
         | FROM tot CROSS JOIN bins
         | LEFT JOIN cell ON cell.t = tot.t AND cell.bin = bins.bin),
         |cdf AS (SELECT t, bin, nt,
         |  CAST(sum(n) OVER (PARTITION BY t ORDER BY bin
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |   / CAST(nt AS DOUBLE) AS cdf
         | FROM grid)
         |SELECT a.t AS type_a, b.t AS type_b, a.nt AS n_a, b.nt AS n_b,
         | ${Q.duckRnd(
             "CAST(sum(CAST(" + Q.duckRnd("abs(a.cdf - b.cdf)", 6) +
               " AS DECIMAL(38,6))) AS DOUBLE)", 6)} AS emd_bins
         |FROM cdf a JOIN cdf b ON a.bin = b.bin AND a.t < b.t
         |GROUP BY a.t, b.t, a.nt, b.nt
         |ORDER BY type_a, type_b""".stripMargin,

    // same frequent-item bar, same pair threshold, same one-division
    // IEEE arithmetic over exact integer counts
    "assoc_rules" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS basket,
         |    l_partkey AS item FROM lineitem),
         |nb AS (SELECT count(DISTINCT basket) AS n_baskets FROM items),
         |f AS (SELECT item, count(*) AS n_item FROM items, nb
         |      GROUP BY item, n_baskets
         |      HAVING count(*) * $AssocSupportDenom >= n_baskets),
         |fi AS (SELECT basket, item, n_item FROM items JOIN f USING (item)),
         |p AS (SELECT a.item AS item_a, b.item AS item_b,
         |        a.n_item AS n_a, b.n_item AS n_b, count(*) AS n_ab
         |      FROM fi a JOIN fi b
         |        ON a.basket = b.basket AND a.item < b.item
         |      GROUP BY 1, 2, 3, 4 HAVING count(*) >= $AssocMinPairCount),
         |r AS (SELECT item_a AS antecedent, item_b AS consequent,
         |        n_a AS n_ante, n_b AS n_cons, n_ab FROM p
         |      UNION ALL
         |      SELECT item_b, item_a, n_b, n_a, n_ab FROM p)
         |SELECT antecedent, consequent, n_ante, n_cons, n_ab,
         |  CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support,
         |  CAST(n_ab AS DOUBLE) / CAST(n_ante AS DOUBLE) AS confidence,
         |  CAST(n_ab * n_baskets AS DOUBLE)
         |    / CAST(n_ante * n_cons AS DOUBLE) AS lift
         |FROM r, nb
         |ORDER BY lift DESC, antecedent, consequent LIMIT 100""".stripMargin,

    // same NTILE semantics (DistributedNtile mirrors SQL NTILE
    // exactly), same desc-with-custkey-tiebreak order keys, same
    // decimal monetary
    "rfm_segmentation" ->
      """WITH cust AS (SELECT o_custkey, max(o_orderdate) AS last_order,
        |   count(*) AS frequency,
        |   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        | FROM orders GROUP BY o_custkey),
        |t AS (SELECT frequency, monetary,
        |   CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey)
        |     AS INTEGER) AS r_tile,
        |   CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey)
        |     AS INTEGER) AS f_tile,
        |   CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey)
        |     AS INTEGER) AS m_tile
        | FROM cust)
        |SELECT r_tile, f_tile, m_tile, count(*) AS n_customers,
        |  CAST(sum(frequency) AS BIGINT) AS n_orders,
        |  CAST(sum(monetary) AS DOUBLE) AS revenue
        |FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // same RANGE-frame conditional min/max, same min_by/max_by
    // tiebreak on the unique event_id
    "attribution_touch" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |    epoch_us(ts) // 1000 AS ms
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |    AND event_type IS NOT NULL),
         |pw AS (SELECT user_id, event_id, event_type, ms,
         |    min(CASE WHEN event_type <> 'purchase' THEN ms END) OVER w
         |      AS ft_ms,
         |    max(CASE WHEN event_type <> 'purchase' THEN ms END) OVER w
         |      AS lt_ms
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms
         |    RANGE BETWEEN $AttrWindowMs PRECEDING AND 1 PRECEDING)),
         |p AS (SELECT user_id, event_id AS p_id, ft_ms, lt_ms FROM pw
         |  WHERE event_type = 'purchase' AND ft_ms IS NOT NULL),
         |t AS (SELECT user_id, ms, event_id AS t_id, event_type AS t_type
         |  FROM e WHERE event_type <> 'purchase'),
         |firsts AS (SELECT min_by(t.t_type, t.t_id) AS event_type,
         |    CAST(1 AS BIGINT) AS f, CAST(0 AS BIGINT) AS l
         |  FROM p JOIN t ON p.user_id = t.user_id AND p.ft_ms = t.ms
         |  GROUP BY p.p_id),
         |lasts AS (SELECT max_by(t.t_type, t.t_id) AS event_type,
         |    CAST(0 AS BIGINT) AS f, CAST(1 AS BIGINT) AS l
         |  FROM p JOIN t ON p.user_id = t.user_id AND p.lt_ms = t.ms
         |  GROUP BY p.p_id),
         |u AS (SELECT * FROM firsts UNION ALL SELECT * FROM lasts)
         |SELECT event_type, CAST(sum(f) AS BIGINT) AS n_first_touch,
         |  CAST(sum(l) AS BIGINT) AS n_last_touch
         |FROM u GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
