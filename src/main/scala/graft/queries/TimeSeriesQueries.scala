package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Time-series / feature-engineering operators over the events stream —
  * the per-entity sequence shapes (gap repair, coverage intervals,
  * decay features, reproducible sampling) a feature pipeline runs
  * downstream of sessionization.
  *
  * Scale/perf design:
  *  - `locf_fill` and `ema_decay` are one user-keyed shuffle each; all
  *    window passes share that single partitioning (no self-joins, no
  *    second exchange).
  *  - `interval_merge` is the islands formulation over intervals: a
  *    running max-end + running group sum on one user-keyed exchange;
  *    the closing aggregate groups by (user, group), which the user
  *    partitioning already satisfies — still one shuffle total.
  *  - `sample_reservoir` is a hash-rank top-k: per-partition heaps +
  *    driver merge (TakeOrderedAndProject), never a global sort — the
  *    fixed-size-sample plan that holds at any corpus size.
  *
  * Oracle-parity notes: ema weights are dyadic (2^-k), so the
  * per-term multiply is an exponent shift (exact in IEEE), and both
  * num and den are written as the same left-associated chain both
  * engines evaluate in identical op order — the doubles are
  * bit-identical with NO rounding step. locf copies input doubles
  * verbatim; interval math is all int64.
  */
object TimeSeriesQueries {

  private val GapMs = 600000L // 10-min hold per event

  /** The interval-merge core, shared by the `interval_merge` query and
    * TimeSeriesPropertySpec (so the property test exercises THIS code,
    * not a copy): input (user_id, event_id, st), hold applied here;
    * output one row per coverage span. One user-keyed data shuffle —
    * the closing (user, span) aggregate reuses the window partitioning.
    */
  private[queries] def mergeSpans(
      df: org.apache.spark.sql.DataFrame, holdMs: Long): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("st"), col("event_id"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("en", col("st") + holdMs)
      .withColumn("prev_max_en", max(col("en")).over(wPrev))
      .withColumn("new_span",
        when(col("prev_max_en").isNull || col("st") > col("prev_max_en"), 1).otherwise(0))
      .withColumn("span_id", sum(col("new_span")).over(wRun))
      .groupBy(col("user_id"), col("span_id"))
      .agg(min(col("st")).as("cov_start"), max(col("en")).as("cov_end"),
        count(lit(1)).as("n_events"))
  }

  val defs: Map[String, QueryFn] = Map(
    // Forward fill (last observation carried forward): sensor-dropout
    // repair. Every 7th reading is nulled deterministically, then each
    // user's series re-fills from its own past — `last(ignoreNulls)`
    // over an unbounded-preceding frame, one window pass.
    "locf_fill" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("raw", when($"event_id" % 7 === 0, lit(null)).otherwise($"value"))
        .select($"user_id", $"event_id", unix_millis($"ts").as("ts_ms"), $"raw",
          last($"raw", ignoreNulls = true).over(w).as("filled"))
        .orderBy($"user_id", $"ts_ms", $"event_id")
    }),

    // Merge overlapping per-user hold intervals [ts, ts+10min) into
    // coverage spans (the classic islands problem on intervals): a new
    // span starts when an interval begins after the running max end of
    // everything before it; touching spans merge.
    "interval_merge" -> ((s, d) => {
      import s.implicits._
      mergeSpans(
        Tables.events(s, d)
          .select($"user_id", $"event_id", unix_millis($"ts").as("st")),
        GapMs)
        .orderBy($"user_id", $"cov_start")
    }),

    // Exponentially-decayed rolling average (α = 1/2, depth 8): the
    // recency-weighted feature. Weights 2^-k make every multiply an
    // IEEE exponent shift (exact), and num/den are fixed
    // left-associated sums — the output double is bit-identical across
    // engines with no rounding step, which the oracle check proves.
    // Classical additive seasonal decomposition over the hourly event
    // series (trend = centered 24-point moving average, seasonal =
    // per-hour-of-day mean of the detrended series, residual = the
    // rest) — the data-drift primitive a feature pipeline runs before
    // alerting on "volume looks wrong". Transcendental-free: every
    // statistic is a decimal-summed mean of 6dp-snapped doubles, so
    // both engines produce bit-identical components. The corpus-scale
    // aggregate happens FIRST (events → one row per hour); every
    // window then runs on the time-bounded hourly series — a relation
    // whose size depends on the time span, never the event count, so
    // the single-partition ordered window is safe at any corpus size.
    "seasonal_decompose" -> ((s, d) =>
      decomposeTable(s, d).orderBy(col("hr"))),

    // Seasonal/trend strength (wave 61; Hyndman's tsfeatures
    // formulation, Wang/Smith/Hyndman 2006): Fs = max(0, 1 −
    // Var(resid)/Var(seasonal + resid)) and Ft = max(0, 1 −
    // Var(resid)/Var(trend + resid)) over seasonal_decompose's OWN
    // output relation — the single-number summary of "is the weekly/
    // hourly structure worth modeling", composed so a regression in
    // the decomposition is a hash mismatch here too (the
    // ann_recall_eval composition principle). Variances assemble
    // from exact decimal(18,6) sums of the snapped components; at
    // ≤~9k hourly rows the n·Σx² arithmetic stays inside the exact
    // double-integer range, so the closing ratios are pinned IEEE.
    "seasonality_strength" -> ((s, d) => {
      import s.implicits._
      val dec6 = "decimal(18,6)"
      val x = decomposeTable(s, d).select(
        $"resid".cast(dec6).as("r"),
        ($"seasonal" + $"resid").cast(dec6).as("sr"),
        ($"trend" + $"resid").cast(dec6).as("tr2"))
      def mom(c: String) = Seq(
        sum(col(c)).as(s"s1_$c"),
        sum((col(c) * col(c)).cast("decimal(38,12)")).as(s"s2_$c"))
      val agg = x.agg(count(lit(1)).as("n"),
        mom("r") ++ mom("sr") ++ mom("tr2"): _*)
      val nd = $"n".cast("double")
      def varOf(c: String) =
        (nd * col(s"s2_$c").cast("double") -
          col(s"s1_$c").cast("double") * col(s"s1_$c").cast("double")) /
          (nd * nd)
      val vars = agg.select($"n".as("n_hours"),
        rnd(varOf("r"), 8).as("var_resid"),
        rnd(varOf("sr"), 8).as("var_seas_resid"),
        rnd(varOf("tr2"), 8).as("var_trend_resid"))
      vars.select($"n_hours", $"var_resid", $"var_seas_resid",
        $"var_trend_resid",
        when($"var_seas_resid" > 0.0,
          rnd(greatest(lit(0.0),
            lit(1.0) - $"var_resid" / $"var_seas_resid"), 6))
          .as("f_seasonal"),
        when($"var_trend_resid" > 0.0,
          rnd(greatest(lit(0.0),
            lit(1.0) - $"var_resid" / $"var_trend_resid"), 6))
          .as("f_trend"))
    }),

    // Hour-of-day activity profile per event type (wave 61): the
    // 24-cell diurnal fingerprint an ops dashboard renders and a
    // scheduler reads ("when is this class's peak"). One fact-table
    // aggregate to the bounded ≤|types|·24 grid, shares and the
    // peak flag on that grid (peak ties break to the earliest hour,
    // mirrored). NULL timestamps drop (no hour); NULL types form the
    // '__null__' class.
    "hour_profile" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .filter($"ts".isNotNull)
        .select(coalesce($"event_type", lit("__null__")).as("g"),
          hour($"ts").as("hod"))
      val cell = ev.groupBy($"g", $"hod").agg(count(lit(1)).as("n"))
      val tot = cell.groupBy($"g").agg(sum($"n").as("ng"))
      val w = Window.partitionBy($"g").orderBy($"n".desc, $"hod".asc)
      cell.join(broadcast(tot), Seq("g"))
        .withColumn("rk", row_number().over(w))
        .select($"g", $"hod", $"n",
          rnd($"n".cast("double") / $"ng".cast("double"), 6).as("share"),
          ($"rk" === 1).as("is_peak"))
        .orderBy($"g", $"hod")
    }),

    "ema_decay" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      def lagged(k: Int) = if (k == 0) $"value" else lag($"value", k).over(w)
      val num = (0 until 8).map(k => coalesce(lagged(k) * lit(math.pow(0.5, k)), lit(0.0)))
        .reduce(_ + _)
      val den = (0 until 8).map(k =>
          when(lagged(k).isNotNull, lit(math.pow(0.5, k))).otherwise(lit(0.0)))
        .reduce(_ + _)
      Tables.events(s, d)
        .select($"user_id", $"event_id", unix_millis($"ts").as("ts_ms"),
          // den = 0 (current value and all 7 lags NULL) must be NULL in
          // BOTH engines: Spark's non-ANSI 0-divide yields NULL while
          // DuckDB's IEEE float divide yields NaN, so the guard is
          // explicit on both sides
          when(den === 0.0, lit(null)).otherwise(num / den).as("ema"))
        .orderBy($"user_id", $"ts_ms", $"event_id")
    }),

    // Date-spine gap fill: each user's daily activity with missing days
    // zero-filled — the spine generates [first_day, last_day] per user
    // (sequence+explode: |days| rows, no cross join against a global
    // calendar) and left-joins the daily aggregate. Both inputs derive
    // from one events scan; at 100 TB the spine side is tiny (users ×
    // avg span) next to the fact aggregate.
    "gap_fill" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"user_id", date_trunc("day", $"ts").as("day"), $"value")
      val daily = ev.groupBy($"user_id", $"day")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      val spine = ev.groupBy($"user_id")
        .agg(min($"day").as("dmin"), max($"day").as("dmax"))
        .select($"user_id",
          explode(sequence($"dmin", $"dmax", expr("interval 1 day"))).as("day"))
      spine.join(daily, Seq("user_id", "day"), "left")
        .select($"user_id", unix_millis($"day").as("day_ms"),
          coalesce($"n_events", lit(0L)).as("n_events"),
          coalesce($"sum_value", lit(0.0)).as("sum_value"))
        .orderBy($"user_id", $"day_ms")
    }),

    // CUSUM changepoint detection per event_type — the "when did this
    // metric shift?" drift primitive: cumulative deviation from the
    // series mean, S_i = Σ_{j≤i}(y_j − ȳ), peaks at the changepoint.
    // The corpus-scale aggregate happens FIRST (events → one row per
    // (type, hour)); every window then runs on the time-bounded hourly
    // series (rows ∝ time span, never event count — seasonal_
    // decompose's boundedness argument, here additionally partitioned
    // by type). Transcendental-free and order-independent: hourly
    // means are 6dp-snapped decimals, prefix sums are decimal-exact,
    // and the per-row deviation cum − i·(total/cnt) is a fixed scalar
    // IEEE op sequence — no floating accumulation anywhere.
    "changepoint_cusum" -> ((s, d) => {
      import s.implicits._
      val ms = unix_millis($"ts")
      val hourly = Tables.events(s, d)
        .select($"event_type", (ms - pmod(ms, lit(3600000L))).as("hr"), $"value")
        .groupBy($"event_type", $"hr")
        .agg(rnd(davg($"value"), 6).as("y"))
      val w = Window.partitionBy($"event_type").orderBy($"hr".asc_nulls_last)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val p = Window.partitionBy($"event_type")
      val dev = hourly
        .withColumn("i", row_number().over(
          Window.partitionBy($"event_type").orderBy($"hr".asc_nulls_last)).cast("double"))
        .withColumn("cum", sum($"y".cast("decimal(18,6)")).over(w).cast("double"))
        .withColumn("total", sum($"y".cast("decimal(18,6)")).over(p).cast("double"))
        .withColumn("cnt", count(lit(1)).over(p).cast("double"))
        .withColumn("dev", rnd(abs($"cum" - $"i" * ($"total" / $"cnt")), 6))
      dev
        .withColumn("rk", row_number().over(
          Window.partitionBy($"event_type").orderBy($"dev".desc, $"hr".asc_nulls_last)))
        .withColumn("n_hours", count(lit(1)).over(p))
        .filter($"rk" === 1)
        .select($"event_type", $"n_hours", $"hr".as("cp_hr"),
          $"dev".as("cusum_stat"))
        .orderBy($"event_type".asc_nulls_last)
    }),

    // Deterministic fixed-size uniform sample: rank by a seeded hash of
    // the key and keep the k smallest — the distributed reservoir
    // (per-partition top-k heaps, driver merges k·P candidates), fully
    // reproducible across runs/engines unlike rand()-based sampling.
    // Mann-Kendall trend test over the hourly event-count series —
    // the nonparametric "is there a monotone trend" gate run before
    // trusting any slope estimate. S = Σ sign(x_j − x_i) over ordered
    // hour pairs stays integral; the variance carries the exact tie
    // correction; z is the one closing IEEE sequence. The pair join
    // is bounded by the TIME SPAN squared (≤720² for the month-long
    // fixture), never by corpus size — a multi-year deployment
    // samples pairs or coarsens buckets first (documented bound, the
    // seasonal_decompose convention).
    "trend_test" -> ((s, d) => {
      import s.implicits._
      val series = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 3600000000").as("h"))
        .agg(count(lit(1)).as("x"))
      val a = series.select($"h".as("h1"), $"x".as("x1"))
      val b = series.select($"h".as("h2"), $"x".as("x2"))
      val sAgg = a.join(b, $"h2" > $"h1")
        .agg(sum(signum($"x2" - $"x1").cast("long")).as("s_stat"))
      val ties = series.groupBy($"x").agg(count(lit(1)).as("t"))
        .agg(coalesce(sum($"t" * ($"t" - 1) * (lit(2) * $"t" + 5)), lit(0L))
          .as("tie_term"))
      val nRow = series.agg(count(lit(1)).as("n"))
      val j = sAgg.crossJoin(broadcast(ties)).crossJoin(broadcast(nRow))
      val varS = ($"n" * ($"n" - 1) * (lit(2) * $"n" + 5) - $"tie_term")
        .cast("double") / 18.0
      val z = when($"s_stat" > 0,
        ($"s_stat" - 1).cast("double") / sqrt(varS))
        .when($"s_stat" < 0, ($"s_stat" + 1).cast("double") / sqrt(varS))
        .otherwise(0.0)
      j.select($"n", $"s_stat", rnd(z, 6).as("z"))
    }),

    // Theil-Sen robust slope of the same series: the exact median of
    // all pairwise slopes — the estimator a single outlier hour
    // cannot move. Same span-bounded pair relation; the median is an
    // explicit row_number middle-pick over BoundedWindow (derived
    // identically in both engines — interpolating percentile
    // built-ins differ cross-engine), averaging the two middle
    // slopes on even counts.
    "theil_sen" -> ((s, d) => {
      import s.implicits._
      val series = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 3600000000").as("h"))
        .agg(count(lit(1)).as("x"))
      val a = series.select($"h".as("h1"), $"x".as("x1"))
      val b = series.select($"h".as("h2"), $"x".as("x2"))
      val slopes = a.join(b, $"h2" > $"h1")
        .select($"h1", $"h2",
          (($"x2" - $"x1").cast("double") /
            ($"h2" - $"h1").cast("double")).as("slope"))
      val w = graft.operators.BoundedWindow.orderBy(
        "theil_sen: month-span hourly pairs (<=720^2/2)", 1L << 20,
        $"slope", $"h1", $"h2")
      val m = slopes.agg(count(lit(1)).as("m"))
      slopes.withColumn("rn", row_number().over(w).cast("long"))
        .crossJoin(broadcast(m))
        .filter($"rn" === expr("(m + 1) DIV 2") || $"rn" === expr("m DIV 2 + 1"))
        .agg(count(lit(1)).as("n_mid"), first($"m").as("n_pairs"),
          sum($"slope").as("ssum"))
        // zero-rows-on-empty convention, matching the oracle's GROUP BY
        // m: a degenerate corpus (empty / single hour → no slope pairs)
        // emits NO row, never a global-agg all-null row
        .filter($"n_mid" > 0)
        .select($"n_pairs",
          rnd($"ssum" / $"n_mid".cast("double"), 6).as("slope_median"))
    }),

    // Autocorrelation of the hourly event-count series at lags 1-3 —
    // the seasonality/trend diagnostic read before fitting any
    // forecaster (seasonal_decompose's sibling). The series is
    // time-span-bounded (one row per hour), so the lag alignment is
    // three tiny self-joins on hour+L; moments are decimal-snapped
    // sums (order-free) and each r is one fixed division. The ACF
    // convention: deviations from the FULL-series mean, denominator
    // Σ(x-μ)² over the full series.
    "autocorr_lag" -> ((s, d) => {
      import s.implicits._
      val series = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 3600000000").as("h"))
        .agg(count(lit(1)).cast("double").as("x"))
      val mom = series.agg(
        count(lit(1)).cast("double").as("n"),
        sum($"x".cast("decimal(18,2)")).cast("double").as("sx"),
        sum(rnd($"x" * $"x", 4).cast("decimal(38,4)")).cast("double").as("sxx"))
      val withMean = series.crossJoin(broadcast(mom))
        .select($"h", $"x", ($"sx" / $"n").as("mu"),
          ($"sxx" - $"n" * (($"sx" / $"n") * ($"sx" / $"n"))).as("den"))
      def lagR(l: Int) = {
        val a = withMean
        val b = withMean.select(($"h" - l).as("h"), $"x".as("y"))
        a.join(b, Seq("h"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(rnd(($"x" - $"mu") * ($"y" - $"mu"), 6).cast("decimal(38,6)"))
              .cast("double").as("num"),
            first($"den").as("den"))
          .select(lit(l).as("lag"), $"n_pairs",
            rnd($"num" / $"den", 6).as("acf"))
      }
      lagR(1).unionAll(lagR(2)).unionAll(lagR(3)).orderBy($"lag")
    }),

    // Inter-arrival burstiness per user: coefficient of variation of
    // the gap-seconds sequence (CV≈1 Poisson, >1 bursty, <1 regular)
    // — the traffic-shape telemetry behind rate-limit and bot
    // screening. One user-keyed window shuffle for the lag; moments
    // are integer sums (gap floored to whole seconds, so Σg and Σg²
    // stay exact int64 far beyond any plausible per-user history);
    // mean/variance/cv are the same IEEE op sequence in both engines
    // (sqrt IS correctly rounded per IEEE-754, unlike log/exp — the
    // collocation_pmi transcendental rule doesn't bar it).
    "user_burstiness" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val gaps = Tables.events(s, d)
        .withColumn("us", unix_micros($"ts"))
        .withColumn("prev", lag($"us", 1).over(w))
        .filter($"prev".isNotNull)
        .select($"user_id",
          expr("(us - prev) DIV 1000000").as("g")) // exact int64 floor-seconds
      val agg = gaps.groupBy($"user_id").agg(
        count(lit(1)).as("n_gaps"),
        sum($"g").as("sg"), sum($"g" * $"g").as("sg2"))
      val mean = $"sg".cast("double") / $"n_gaps".cast("double")
      val variance = greatest(
        $"sg2".cast("double") / $"n_gaps".cast("double") - mean * mean,
        lit(0.0))
      agg.select($"user_id", $"n_gaps", mean.as("mean_gap_s"),
        when(mean === 0.0, lit(null).cast("double"))
          .otherwise(sqrt(variance) / mean).as("cv"))
        .orderBy($"user_id")
    }),

    "sample_reservoir" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", $"lang", $"source", md5($"doc_id".cast("string")).as("h"))
        .orderBy($"h", $"doc_id")
        .limit(50)
    }),

    // Kaplan–Meier survival (Kaplan & Meier 1958 — public) over
    // per-user activity spans: duration = whole minutes between a
    // user's first and last event; a user is an OBSERVED exit if
    // they ever purchased, censored otherwise. Corpus-scale work is
    // ONE user-keyed aggregate; the estimator runs on the duration
    // grid, bounded by the window's minute count (30-day fixture →
    // ≤43200 rows, declared via BoundedWindow). KM's product is
    // inherently sequential under truncated rational arithmetic, so
    // it folds over ONE collected array of grid structs inside a
    // single projection (the winnow array discipline): s' =
    // (s·(n−d)) DIV n at 10¹² scale with the multiply carried in
    // decimal — both engines replay the identical truncation chain
    // (oracle: recursive CTE over the ranked grid). Only event times
    // (d > 0) enter the product, per the KM definition; the risk set
    // counts censored users too (suffix counts off the bounded
    // running sum). Null users/timestamps carry no duration —
    // excluded, mirrored.
    "survival_km" -> ((s, d) => {
      import s.implicits._
      val users = Tables.events(s, d)
        .filter($"ts".isNotNull && $"user_id".isNotNull)
        .groupBy($"user_id")
        .agg(
          expr("(max(unix_millis(ts)) - min(unix_millis(ts))) DIV 60000")
            .as("dur"),
          max(when($"event_type" === "purchase", 1L).otherwise(0L))
            .as("obs"))
      val grid = users.groupBy($"dur")
        .agg(count(lit(1)).as("m"), sum($"obs").as("dd"))
      val nTot = grid.agg(sum($"m").as("n_tot"))
      val w = graft.operators.BoundedWindow
        .orderBy("survival_km: minute grid", 43200L, $"dur".asc)
      val risk = grid.crossJoin(broadcast(nTot))
        .withColumn("cum", sum($"m").over(w))
        .select($"dur", $"dd", ($"n_tot" - $"cum" + $"m").as("nr"))
        .filter($"dd" > 0L)
      risk
        .groupBy()
        .agg(sort_array(collect_list(struct($"dur", $"nr", $"dd"))).as("g"))
        .selectExpr(
          """inline(aggregate(g,
            |  cast(array() as
            |    array<struct<dur:bigint,nr:bigint,dd:bigint,s:bigint>>),
            |  (acc, x) -> array_append(acc, named_struct(
            |    'dur', x.dur, 'nr', x.nr, 'dd', x.dd,
            |    's', CAST((CAST(if(size(acc) = 0, 1000000000000,
            |           element_at(acc, -1).s) AS DECIMAL(38,0))
            |         * (x.nr - x.dd)) DIV x.nr AS BIGINT)))))"""
            .stripMargin.replace("\n", " "))
        .selectExpr("dur AS t_min", "nr AS n_risk", "dd AS d_events",
          "CAST(s AS DOUBLE) / 1000000000000.0 AS survival")
        .orderBy($"t_min")
    }),

    // Dynamic time warping (Sakoe & Chiba 1978 — public) between
    // event-type daily-count series — the sequence-similarity
    // operator Spark has no native analog for. DTW's DP is
    // inherently sequential, but only ACROSS rows: within a row the
    // recurrence new[j] = c[j] + min(m[j], new[j-1]) unrolls to the
    // min-plus closed form new[j] = S[j] + min_{k≤j}(m[k] − S[k−1])
    // (S = prefix cost sums, m[k] = min(prev[k], prev[k−1]); m[1] =
    // prev[1] carries the left boundary), which is pure array
    // arithmetic. So the whole DP is ONE aggregate-HOF fold over the
    // first series' elements with the previous DP row as the
    // accumulator — everything integer-exact, mirrored in DuckDB by
    // a list_reduce whose folded list wraps scalars as 1-element
    // rows so the accumulator type matches. Scale shape: one
    // map-side-combinable (type, day) cell aggregate is the only
    // corpus-scale stage; series are zero-filled on a shared day
    // spine CAPPED at DtwMaxDays from the first observed day (the
    // WinnowMaxChars rule — row width stays bounded no matter the
    // ingest window), and the pair relation is ≤|types|²/2 rows.
    // Null timestamps/types carry no day — excluded, mirrored.
    "dtw_distance" -> ((s, d) => {
      import s.implicits._
      val cells = Tables.events(s, d)
        .filter($"ts".isNotNull && $"event_type".isNotNull)
        .select($"event_type".as("t"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
        .groupBy($"t", $"day").agg(count(lit(1)).as("n"))
      val d0 = cells.agg(min($"day").as("d0"))
      val bounded = cells.crossJoin(broadcast(d0))
        .filter($"day" < $"d0" + DtwMaxDays)
      val span = bounded.groupBy($"d0").agg(max($"day").as("d1"))
      val series = bounded.groupBy($"t")
        .agg(map_from_arrays(collect_list($"day"), collect_list($"n"))
          .as("m"))
        .crossJoin(broadcast(span))
        .select($"t",
          expr("transform(sequence(d0, d1)," +
            " dd -> coalesce(element_at(m, dd), CAST(0 AS BIGINT)))")
            .as("s"))
      val pairs = series.as("a").join(series.as("b"), col("a.t") < col("b.t"))
        .select(col("a.t").as("type_a"), col("b.t").as("type_b"),
          col("a.s").as("va"), col("b.s").as("vb"))
      // prefix cost sums S for row i (cost row = |ai − vb[.]|),
      // re-inlined at each use — SQL lambdas have no let-binding;
      // the series is DtwMaxDays-bounded so the n³ row cost is flat
      def prefS(ai: String, upTo: String) =
        s"aggregate(slice(transform(vb, x -> abs($ai - x)), 1, $upTo)," +
          s" CAST(0 AS BIGINT), (acc, y) -> acc + y)"
      val row0 =
        s"transform(sequence(1, size(vb)), j -> ${prefS("element_at(va, 1)", "j")})"
      val newRow =
        s"""transform(sequence(1, size(vb)), j ->
           |  ${prefS("ai", "j")} + array_min(slice(
           |    transform(sequence(1, size(vb)), k ->
           |      IF(k = 1, element_at(prev, 1),
           |         least(element_at(prev, k), element_at(prev, k - 1)))
           |      - IF(k = 1, CAST(0 AS BIGINT), ${prefS("ai", "k - 1")})),
           |    1, j)))""".stripMargin.replace("\n", " ")
      pairs.selectExpr("type_a", "type_b", "size(va) AS n_days",
        s"""element_at(
           |  aggregate(slice(va, 2, size(va) - 1), $row0,
           |    (prev, ai) -> $newRow),
           |  size(vb)) AS dtw""".stripMargin.replace("\n", " "))
        .orderBy($"type_a", $"type_b")
    }),

    // Largest-Triangle-Three-Buckets downsampling (wave 47,
    // Steinarsson 2013) — the dashboard-grade shape-preserving
    // decimation of each type's daily-count series to ≤ LttbOut
    // points. The corpus-scale work is the one (type, day) cell
    // aggregate behind daySeries; the walk itself is a fold over the
    // bounded spine. EXACT INTEGER arithmetic throughout: the usual
    // triangle area vs the next bucket's AVERAGE point is scaled by
    // that bucket's count c, so area·2·c =
    // (ax·c − Σx)·(y_j − ay) − (ax − j)·(Σy − ay·c) stays in int64
    // (x-coordinates are day indexes ≤ DtwMaxDays; y are counts) —
    // no doubles, no rounding, bit-identical argmax cross-engine
    // with ties broken toward the earliest index by strict >.
    // Per-bucket constants (range, count, Σx closed-form, Σy slice
    // fold) are hoisted into one struct array so the inner argmax is
    // O(bucket) with no nested re-folds.
    "lttb_downsample" -> ((s, d) => {
      import s.implicits._
      val w = LttbOut - 2 // middle buckets
      val m = "(CAST(n_days AS BIGINT) - 2)"
      def lo = s"((i * $m) DIV $w + 2)"
      def hi = s"(((i + 1) * $m) DIV $w + 1)"
      def nlo = s"(((i + 1) * $m) DIV $w + 2)"
      def nhi = s"least((((i + 2) * $m) DIV $w + 1), CAST(n_days AS BIGINT))"
      val bk = "element_at(bks, CAST(i + 1 AS INT))"
      val ax = "element_at(sel, -1)"
      val ay = s"element_at(s, CAST($ax AS INT))"
      def area(j: String) =
        s"abs(($ax * $bk.c - $bk.sx) * (element_at(s, CAST($j AS INT)) - $ay)" +
          s" - ($ax - $j) * ($bk.sy - $ay * $bk.c))"
      daySeries(s, d)
        .selectExpr("t AS event_type", "size(s) AS n_days", "s")
        .selectExpr("event_type", "n_days", "s",
          s"""CASE WHEN n_days <= $LttbOut THEN CAST(array() AS
             |  ARRAY<STRUCT<lo: BIGINT, hi: BIGINT, c: BIGINT,
             |    sx: BIGINT, sy: BIGINT>>)
             |ELSE transform(sequence(0, ${w - 1}), i -> named_struct(
             |  'lo', $lo, 'hi', $hi,
             |  'c', $nhi - $nlo + 1,
             |  'sx', (($nlo + $nhi) * ($nhi - $nlo + 1)) DIV 2,
             |  'sy', aggregate(slice(s, CAST($nlo AS INT),
             |          CAST($nhi - $nlo + 1 AS INT)),
             |        CAST(0 AS BIGINT), (a2, x2) -> a2 + x2))) END
             |AS bks""".stripMargin.replace("\n", " "))
        // materialization barrier: without it CollapseProject inlines
        // the `s` (366-wide array build) and `bks` definitions into
        // EVERY reference inside the doubly-nested fold below, so each
        // triangle-area evaluation rebuilds the whole series and the
        // whole bucket-constant array — measured 68 s at the 10× sweep
        // vs seconds after the barrier. The checkpointed relation is
        // ≤|types| rows of bounded arrays.
        .localCheckpoint(eager = false)
        .selectExpr("event_type", "n_days", "s",
          s"""CASE WHEN n_days <= $LttbOut
             |THEN sequence(CAST(1 AS BIGINT), CAST(n_days AS BIGINT))
             |ELSE aggregate(sequence(0, ${w - 1}),
             |  array(CAST(1 AS BIGINT)),
             |  (sel, i) -> concat(sel, array(
             |    aggregate(sequence($bk.lo, $bk.hi),
             |      named_struct('j', CAST(0 AS BIGINT), 'a', CAST(-1 AS BIGINT)),
             |      (b, j) -> CASE WHEN ${area("j")} > b.a
             |        THEN named_struct('j', j, 'a', ${area("j")})
             |        ELSE b END).j)),
             |  sel -> concat(sel, array(CAST(n_days AS BIGINT)))) END
             |AS sel""".stripMargin.replace("\n", " "))
        .select($"event_type", $"n_days", $"s",
          posexplode($"sel").as(Seq("pos0", "idx")))
        .select($"event_type", $"n_days", ($"pos0" + 1).as("pos"), $"idx",
          element_at($"s", $"idx".cast("int")).as("y"))
        .orderBy($"event_type", $"pos")
    }),

    // SAX symbolization (wave 43, Lin et al. 2003): z-normalize each
    // type's daily-count series, PAA-compress it to a ≤10-segment
    // word, map segment means onto the 4-letter alphabet via the
    // standard N(0,1) quartile breakpoints (±0.6745 — literals, no
    // inverse-CDF at query time). The corpus-scale work is the one
    // (type, day) cell aggregate; the fold is array arithmetic on
    // the DtwMaxDays-capped spine. Integer Σx/Σx² keep μ/σ exact-
    // input; every per-segment sum is a fixed-order array fold, so
    // doubles are bit-identical cross-engine with no rounding step.
    "sax_symbolize" -> ((s, d) => {
      import s.implicits._
      // segment k of w covers 1-based [ (k·n) div w + 1, ((k+1)·n) div w ]
      def lo = s"(k * n_days) DIV w + 1"
      def hi = s"((k + 1) * n_days) DIV w"
      val mz =
        s"""CASE WHEN sigma = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
           |ELSE aggregate(slice(s, $lo, $hi - ($lo) + 1),
           |  CAST(0 AS DOUBLE),
           |  (acc, x) -> acc + (CAST(x AS DOUBLE) - mu) / sigma)
           |  / CAST($hi - ($lo) + 1 AS DOUBLE) END""".stripMargin
          .replace("\n", " ")
      daySeries(s, d)
        .selectExpr("t AS event_type", "size(s) AS n_days", "s",
          "aggregate(s, CAST(0 AS BIGINT), (acc, x) -> acc + x) AS sx",
          "aggregate(s, CAST(0 AS BIGINT), (acc, x) -> acc + x * x) AS sx2")
        .selectExpr("event_type", "n_days", "s",
          "least(10, n_days) AS w",
          "CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) AS mu",
          "sqrt(greatest(CAST(sx2 AS DOUBLE) / CAST(n_days AS DOUBLE)" +
            " - (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))" +
            " * (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))," +
            " CAST(0 AS DOUBLE))) AS sigma")
        .selectExpr("event_type", "n_days", "w AS sax_w",
          s"""array_join(transform(sequence(0, w - 1), k ->
             |  CASE WHEN $mz < -0.6745 THEN 'a'
             |       WHEN $mz < 0.0 THEN 'b'
             |       WHEN $mz < 0.6745 THEN 'c'
             |       ELSE 'd' END), '') AS sax""".stripMargin
            .replace("\n", " "))
        .orderBy($"event_type")
    }),

    // Holt's linear (double-exponential) smoothing per type (wave
    // 43): level/trend recursion folded over the train split (all
    // but the last 7 days), α=0.5 / β=0.3 literals, then a 7-day
    // holdout MAE — the classic baseline forecaster with its own
    // backtest. Fold accumulator is a (level, trend) struct; every
    // step is the same IEEE op sequence both engines (the recursion
    // re-inlines the new level where it feeds the trend — SQL
    // lambdas have no let-binding).
    "holt_forecast" -> ((s, d) => {
      import s.implicits._
      val nl = "0.5 * CAST(x AS DOUBLE) + 0.5 * (acc.l + acc.b)"
      daySeries(s, d)
        .selectExpr("t AS event_type", "size(s) AS n_days", "s")
        .filter($"n_days" >= HoltMinDays)
        .selectExpr("event_type", "n_days",
          "s", "n_days - 7 AS n_train")
        .selectExpr("event_type", "n_days",
          s"""aggregate(slice(s, 3, n_train - 2),
             |  named_struct(
             |    'l', CAST(element_at(s, 1) AS DOUBLE),
             |    'b', CAST(element_at(s, 2) AS DOUBLE)
             |       - CAST(element_at(s, 1) AS DOUBLE)),
             |  (acc, x) -> named_struct(
             |    'l', $nl,
             |    'b', 0.3 * (($nl) - acc.l) + 0.7 * acc.b)) AS hb""".stripMargin
            .replace("\n", " "),
          "s", "n_train")
        .selectExpr("event_type", "n_days", "hb.l AS l", "hb.b AS b",
          s"""aggregate(sequence(1, 7), CAST(0 AS DOUBLE), (acc, h) ->
             |  acc + abs(hb.l + CAST(h AS DOUBLE) * hb.b
             |    - CAST(element_at(s, n_train + h) AS DOUBLE)))
             |  / 7.0 AS mae""".stripMargin.replace("\n", " "))
        .select($"event_type", $"n_days", rnd($"l", 6).as("level"),
          rnd($"b", 6).as("trend"), rnd($"mae", 6).as("mae"))
        .orderBy($"event_type")
    }),

    // Holt-Winters additive triple-exponential smoothing (wave 51):
    // holt_forecast plus a period-7 seasonal component — the weekly
    // pattern every daily ops series carries. Init: level = mean of
    // week 1, trend = (mean week 2 − mean week 1)/7, seasonals =
    // week-1 deviations; fold from day 8 over the train split
    // (α=0.4, β=0.2, γ=0.3 literals; the new level re-inlines where
    // it feeds trend and seasonal — SQL lambdas have no let); 7-day
    // holdout MAE with the seasonal term rotated forward. Same spine
    // aggregate as holt; the fold is bounded-array arithmetic with
    // NO transcendental, so every double is bit-identical
    // cross-engine (snaps are display-only).
    "holt_winters" -> ((s, d) => {
      import s.implicits._
      val x = "CAST(element_at(s, CAST(t AS INT)) AS DOUBLE)"
      val idx = "(CAST((t - 1) % 7 AS INT) + 1)"
      val sOld = s"element_at(acc.s, $idx)"
      val nl = s"0.4 * ($x - $sOld) + 0.6 * (acc.l + acc.b)"
      val nb = s"0.2 * (($nl) - acc.l) + 0.8 * acc.b"
      val l0 = "CAST(aggregate(slice(s, 1, 7), CAST(0 AS BIGINT)," +
        " (a2, x2) -> a2 + x2) AS DOUBLE) / 7.0"
      val b0 = "(CAST(aggregate(slice(s, 8, 7), CAST(0 AS BIGINT)," +
        " (a2, x2) -> a2 + x2) AS DOUBLE)" +
        " - CAST(aggregate(slice(s, 1, 7), CAST(0 AS BIGINT)," +
        " (a2, x2) -> a2 + x2) AS DOUBLE)) / 49.0"
      daySeries(s, d)
        .selectExpr("t AS event_type", "size(s) AS n_days", "s")
        .filter($"n_days" >= HwMinDays)
        .selectExpr("event_type", "n_days", "s", "n_days - 7 AS n_train")
        .selectExpr("event_type", "n_days", "s", "n_train",
          s"""aggregate(
             |  sequence(CAST(8 AS BIGINT), CAST(n_train AS BIGINT)),
             |  named_struct('l', $l0, 'b', $b0,
             |    's', transform(sequence(1, 7), j ->
             |      CAST(element_at(s, CAST(j AS INT)) AS DOUBLE)
             |        - ($l0))),
             |  (acc, t) -> named_struct('l', $nl, 'b', $nb,
             |    's', transform(sequence(1, 7), j ->
             |      CASE WHEN j = $idx
             |        THEN 0.3 * ($x - ($nl)) + 0.7 * $sOld
             |        ELSE element_at(acc.s, CAST(j AS INT)) END)))
             |AS hw""".stripMargin.replace("\n", " "))
        .selectExpr("event_type", "n_days", "hw.l AS l", "hw.b AS b",
          "hw.s AS sv",
          s"""aggregate(sequence(1, 7), CAST(0 AS DOUBLE), (a2, h) ->
             |  a2 + abs(hw.l + CAST(h AS DOUBLE) * hw.b
             |    + element_at(hw.s, CAST((n_train + h - 1) % 7 AS INT) + 1)
             |    - CAST(element_at(s, CAST(n_train + h AS INT)) AS DOUBLE)))
             |  / 7.0 AS mae""".stripMargin.replace("\n", " "))
        .select(Seq($"event_type", $"n_days", rnd($"l", 6).as("level"),
          rnd($"b", 6).as("trend")) ++
          (1 to 7).map(j =>
            rnd(element_at($"sv", j), 6).as(s"s$j")) :+
          rnd($"mae", 6).as("mae"): _*)
        .orderBy($"event_type")
    }),

    // Croston's method (wave 51, Croston 1972) — the intermittent-
    // demand forecaster: separate exponential smoothing of the
    // nonzero demand size z and the inter-demand interval p, forecast
    // = z/p per period. α = 1/4 is DYADIC, so every update
    // z += (x−z)/4, p += (q−p)/4 is exact IEEE arithmetic on exact
    // inputs — the whole fold is bit-identical cross-engine with no
    // rounding anywhere (snaps are display-only). One fold over the
    // train split; series with no train demand drop out (mirrored).
    "croston_forecast" -> ((s, d) => {
      import s.implicits._
      val x = "CAST(element_at(s, CAST(t AS INT)) AS DOUBLE)"
      daySeries(s, d)
        .selectExpr("t AS event_type", "size(s) AS n_days", "s")
        .filter($"n_days" >= HoltMinDays)
        .selectExpr("event_type", "n_days", "s", "n_days - 7 AS n_train")
        .selectExpr("event_type", "n_days", "s", "n_train",
          s"""aggregate(
             |  sequence(CAST(1 AS BIGINT), CAST(n_train AS BIGINT)),
             |  named_struct('seen', false, 'z', CAST(0 AS DOUBLE),
             |    'p', CAST(0 AS DOUBLE), 'q', CAST(1 AS DOUBLE)),
             |  (acc, t) -> CASE
             |    WHEN NOT acc.seen AND $x > 0 THEN named_struct(
             |      'seen', true, 'z', $x, 'p', CAST(t AS DOUBLE),
             |      'q', CAST(1 AS DOUBLE))
             |    WHEN NOT acc.seen THEN acc
             |    WHEN $x > 0 THEN named_struct('seen', true,
             |      'z', acc.z + ($x - acc.z) / 4.0,
             |      'p', acc.p + (acc.q - acc.p) / 4.0,
             |      'q', CAST(1 AS DOUBLE))
             |    ELSE named_struct('seen', true, 'z', acc.z,
             |      'p', acc.p, 'q', acc.q + CAST(1 AS DOUBLE)) END)
             |AS cr""".stripMargin.replace("\n", " "),
          s"""aggregate(slice(s, 1, CAST(n_days - 7 AS INT)),
             |  CAST(0 AS BIGINT),
             |  (a2, x2) -> a2 + CASE WHEN x2 > 0 THEN 1 ELSE 0 END)
             |AS n_demand""".stripMargin.replace("\n", " "))
        .filter($"n_demand" > 0)
        .selectExpr("event_type", "n_days", "n_demand",
          "cr.z AS z", "cr.p AS p",
          s"""aggregate(sequence(1, 7), CAST(0 AS DOUBLE), (a2, h) ->
             |  a2 + abs(cr.z / cr.p
             |    - CAST(element_at(s, CAST(n_train + h AS INT)) AS DOUBLE)))
             |  / 7.0 AS mae""".stripMargin.replace("\n", " "))
        .select($"event_type", $"n_days", $"n_demand",
          rnd($"z", 6).as("demand_level"), rnd($"p", 6).as("interval_level"),
          rnd($"z" / $"p", 6).as("forecast"), rnd($"mae", 6).as("mae"))
        .orderBy($"event_type")
    }),

    // Tukey median polish, one row+column sweep (wave 43): robust
    // two-way decomposition of the (type × day) count matrix —
    // x = row_effect + col_effect + residual with MEDIANS, the
    // outlier-resistant alternative to seasonal_decompose's means;
    // the top-|residual| cells are the anomaly report. Cell counts
    // are integers and medians of dyadic rationals are exact in IEEE
    // (mean-of-two-middles), so every residual is bit-identical
    // cross-engine with no rounding needed — the snap is display
    // only. One (type, day) aggregate; the polish runs on the
    // bounded grid.
    "median_polish" -> ((s, d) => {
      import s.implicits._
      val g = dayGrid(s, d).withColumn("x", $"n".cast("double"))
      val rm = g.groupBy($"t").agg(median($"x").as("rm"))
      val r1 = g.join(broadcast(rm), Seq("t"))
        .withColumn("r1", $"x" - $"rm")
      val cm = r1.groupBy($"day").agg(median($"r1").as("cm"))
      r1.join(broadcast(cm), Seq("day"))
        .select($"t".as("event_type"), $"day", $"n",
          rnd($"rm", 6).as("row_med"), rnd($"cm", 6).as("col_med"),
          rnd($"r1" - $"cm", 6).as("residual"))
        .orderBy(rnd(abs($"r1" - $"cm"), 6).desc, $"event_type", $"day")
        .limit(50)
    }),

    // Theta-method forecast per event type (wave 56; Assimakopoulos
    // & Nikolopoulos 2000, in the Hyndman & Billah 2003 equivalent
    // form: SES plus half the fitted linear-trend drift) — the M3
    // benchmark the forecasting literature uses as "hard to beat",
    // completing the holt/holt_winters/croston smoothing family.
    // Same bounded day-spine substrate: one keyed aggregate builds
    // each type's zero-filled daily array; everything after is
    // per-row array arithmetic. SES level is a dyadic α=1/2 fold
    // (exact IEEE — no rounding anywhere); the LS slope over the
    // train split assembles from EXACT integer sums Σx and Σt·x via
    // the closed form (12·Σtx − 6(n+1)Σx)/(n³−n), so both engines
    // perform one identical closing division; ŷ(h) = ℓ + h·(b/2)
    // and the 7-day-holdout MAE are pinned IEEE sequences. Snaps are
    // display-only.
    "theta_forecast" -> ((s, d) => {
      import s.implicits._
      daySeries(s, d)
        .selectExpr("t AS event_type", "size(s) AS n_days", "s")
        .filter($"n_days" >= HoltMinDays)
        .selectExpr("event_type", "n_days", "s", "n_days - 7 AS n_train")
        .selectExpr("event_type", "n_days", "s", "n_train",
          "aggregate(slice(s, 2, n_train - 1)," +
            " CAST(element_at(s, 1) AS DOUBLE)," +
            " (acc, x) -> 0.5 * CAST(x AS DOUBLE) + 0.5 * acc) AS l",
          "aggregate(sequence(1, n_train), CAST(0 AS BIGINT)," +
            " (a, t) -> a + t * element_at(s, t)) AS sxt",
          "aggregate(slice(s, 1, n_train), CAST(0 AS BIGINT)," +
            " (a, x) -> a + x) AS sx")
        .selectExpr("event_type", "n_days", "s", "n_train", "l",
          "CAST(12 * sxt - 6 * (n_train + 1) * sx AS DOUBLE)" +
            " / CAST((CAST(n_train AS BIGINT) * n_train * n_train)" +
            " - n_train AS DOUBLE) AS b")
        .selectExpr("event_type", "n_days", "l", "b",
          "aggregate(sequence(1, 7), CAST(0 AS DOUBLE), (acc, h) ->" +
            " acc + abs(l + CAST(h AS DOUBLE) * (b * 0.5)" +
            " - CAST(element_at(s, n_train + h) AS DOUBLE))) / 7.0 AS mae")
        .select($"event_type", $"n_days", rnd($"l", 6).as("ses_level"),
          rnd($"b", 6).as("slope"),
          rnd($"l" + lit(1.0) * ($"b" * lit(0.5)), 6).as("forecast_1"),
          rnd($"mae", 6).as("mae"))
        .orderBy($"event_type")
    }),

    // Page–Hinkley drift detector per event type (wave 56-57; Page
    // 1954): the sequential changepoint statistic streaming monitors
    // actually run — cumulative deviation from the RUNNING mean,
    // alarming when the deviation track falls PH = max(m_t − min m)
    // below its own minimum — where changepoint_cusum tests against
    // the global mean in hindsight. One (type, day) cell aggregate
    // builds the bounded spine; the detector is a single fold over
    // the day array with a flat DOUBLE[6] accumulator
    // [t, Σx, m_t, min m, PH, argmax] — the SAME step expression is
    // generated for both engines from ONE builder ([[phStepArray]]),
    // so the IEEE sequences cannot drift. All arithmetic is
    // divisions/adds on exact integer counts — no transcendental;
    // snaps are display-only. t_alarm = 0 means the track never rose
    // above its minimum (no drift).
    "page_hinkley" -> ((s, d) => {
      import s.implicits._
      val step = phStepArray(i => s"element_at(acc, $i)",
        "CAST(x AS DOUBLE)", es => s"array(${es.mkString(", ")})")
      daySeries(s, d)
        .selectExpr("t AS event_type", "size(s) AS n_days", "s")
        .selectExpr("event_type", "n_days",
          "aggregate(s, array(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)," +
            " CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)," +
            s" CAST(0 AS DOUBLE)), (acc, x) -> $step) AS r")
        .selectExpr("event_type", "n_days",
          "element_at(r, 2) AS cum", "element_at(r, 5) AS ph",
          "element_at(r, 6) AS targ")
        .select($"event_type", $"n_days",
          rnd($"cum" / $"n_days".cast("double"), 6).as("mean_daily"),
          rnd($"ph", 6).as("ph_stat"),
          $"targ".cast("int").as("t_alarm"))
        .orderBy($"event_type")
    }),

    // Partial autocorrelation via Durbin–Levinson (wave 59; Durbin
    // 1960; Box & Jenkins' AR-order identification tool): pacf_k is
    // the correlation of x_t with x_{t−k} after removing the
    // intermediate lags — the readout that tells a forecaster the AR
    // order where autocorr_lag's raw ACF cannot. One (type, day)
    // cell aggregate builds the bounded spine; ACF lags 1..[[PacfL]]
    // are order-pinned left folds over the demeaned array, snapped
    // at 12dp into a shared r-array; the D-L recursion runs as ONE
    // fold whose step expression is generated for BOTH engines by
    // [[durbinStep]] — the recursion cannot drift, and there is no
    // unrolled Catalyst lineage to blow up (the BPE-chain lesson:
    // k chained selects would inline into a 2^k expression tree).
    // Degenerate inputs: a constant series has den = 0 and drops
    // (mirrored); |α| = 1 drives v → 0 and the next α to ±Inf —
    // the same IEEE result in both engines, passed through rnd's
    // Inf guard.
    "pacf_durbin" -> ((s, d) => {
      import s.implicits._
      val L = PacfL
      val step = durbinStep(
        el = (l, i) => s"element_at($l, CAST(($i) AS INT))",
        kE = "k",
        innerSum = term => s"(CASE WHEN k > 1 THEN" +
          s" aggregate(sequence(1, k - 1), CAST(0 AS DOUBLE)," +
          s" (a2, j) -> a2 + $term) ELSE CAST(0 AS DOUBLE) END)",
        mapSeq = (v0, body) => s"(CASE WHEN k > 1 THEN" +
          s" transform(sequence(1, k - 1), $v0 -> $body)" +
          s" ELSE slice(acc, 1, 0) END)",
        sliceAB = (l, st, len) => s"slice($l, $st, $len)",
        cat = es => s"concat(${es.mkString(", ")})",
        arr1 = e => s"array($e)")
      val folded = acfTable(s, d, L)
        .selectExpr(Seq("event_type", "n_days",
          s"array(${(1 to L).map(k => s"r_$k").mkString(", ")}) AS rr")
          : _*)
        .selectExpr("event_type", "n_days",
          s"aggregate(sequence(1, $L), array(CAST(1 AS DOUBLE))," +
            s" (acc, k) -> $step) AS dl")
      folded.select((Seq($"event_type", $"n_days") ++
        (1 to L).map(i =>
          rnd(expr(s"element_at(dl, ${L + 1 + i})"), 6).as(s"pacf_$i")))
        : _*)
        .orderBy($"event_type")
    }),

    // Ljung–Box portmanteau white-noise test (wave 60; Ljung & Box
    // 1978): Q = n(n+2)·Σ_{k≤L} r_k²/(n−k) against χ²_L — the test a
    // forecaster runs on RESIDUALS ("is there autocorrelation left
    // worth modeling") and a monitor runs on raw dailies ("is this
    // series just noise"). Rides the SAME [[acfTable]] substrate as
    // pacf_durbin (one (type, day) cell aggregate, order-pinned
    // folds, 12dp-snapped r's); the L-term sum is an explicit
    // left-associated chain on snapped inputs so both engines add in
    // the identical order, and the rejection line is the χ²₈ 0.95
    // quantile embedded once ([[Chi2L095]]).
    "ljung_box" -> ((s, d) => {
      import s.implicits._
      val L = PacfL
      val rs = acfTable(s, d, L)
      val nd = $"n_days".cast("double")
      val terms = (1 to L).map(k =>
        col(s"r_$k") * col(s"r_$k") /
          ($"n_days" - lit(k)).cast("double"))
      val qRaw = nd * (nd + lit(2.0)) * terms.reduce(_ + _)
      rs.select($"event_type", $"n_days", rnd(qRaw, 6).as("q_stat"))
        .select($"event_type", $"n_days", $"q_stat",
          ($"q_stat" > lit(Chi2L095)).as("reject_white_noise"))
        .orderBy($"event_type")
    }))

  /** pacf_durbin / ljung_box lag depth (mirrored in the oracles). */
  private val PacfL = 8

  /** χ²₈ 0.95 quantile for ljung_box's white-noise rejection at
    * df = [[PacfL]] — solved once by bisection on the closed-form
    * even-df CDF 1 − e^{−x/2}·Σ_{k≤3}(x/2)^k/k!; the literal is
    * embedded in both engines via shortest round-trip repr.
    */
  private val Chi2L095 = 15.507313055865449

  /** seasonal_decompose's hourly additive decomposition, factored so
    * seasonality_strength composes the SAME relation (hr, n, y,
    * trend, seasonal, resid — snapped columns). Mirrored by
    * [[duckDecomposeCtes]].
    */
  private def decomposeTable(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val ms = unix_millis($"ts")
    val hourly = Tables.events(s, d)
      .select((ms - pmod(ms, lit(3600000L))).as("hr"), $"value")
      .groupBy($"hr")
      .agg(count(lit(1)).as("n"), rnd(davg($"value"), 6).as("y"))
    val w = graft.operators.BoundedWindow
      .orderBy("seasonal_decompose: hourly series (time-span rows, ~9k/yr)",
        200000L, $"hr")
      .rowsBetween(-11, 12)
    val withTrend = hourly.withColumn("trend",
      sum($"y".cast("decimal(18,6)")).over(w).cast("double") /
        count($"y").over(w).cast("double"))
      .withColumn("det", rnd($"y" - $"trend", 6))
      .withColumn("hod", expr("(hr div 3600000) % 24"))
    val s_ = Window.partitionBy($"hod")
    withTrend.withColumn("seas",
      sum($"det".cast("decimal(18,6)")).over(s_).cast("double") /
        count($"det").over(s_).cast("double"))
      .select($"hr", $"n", $"y", rnd($"trend", 6).as("trend"),
        rnd($"seas", 6).as("seasonal"),
        rnd($"det" - rnd($"seas", 6), 6).as("resid"))
  }

  /** DuckDB mirror of [[decomposeTable]] — CTE body ending in `dec`. */
  private def duckDecomposeCtes: String =
    s"""h AS (SELECT epoch_ms(ts)
       |             - ((epoch_ms(ts) % 3600000 + 3600000) % 3600000) AS hr,
       |           value FROM events),
       |a AS (SELECT hr, count(*) AS n,
       |  ${Q.duckRnd(
      "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)" +
        " / CAST(count(value) AS DOUBLE)", 6)} AS y
       |  FROM h GROUP BY hr),
       |c AS (SELECT hr, n, y,
       |  CAST(sum(CAST(y AS DECIMAL(18,6))) OVER w AS DOUBLE)
       |    / CAST(count(y) OVER w AS DOUBLE) AS trend
       |  FROM a
       |  WINDOW w AS (ORDER BY hr ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)),
       |d AS (SELECT hr, n, y, trend, ${Q.duckRnd("y - trend", 6)} AS det,
       |  (hr // 3600000) % 24 AS hod FROM c),
       |e AS (SELECT hr, n, y, trend, det,
       |  CAST(sum(CAST(det AS DECIMAL(18,6))) OVER s AS DOUBLE)
       |    / CAST(count(det) OVER s AS DOUBLE) AS seas
       |  FROM d WINDOW s AS (PARTITION BY hod)),
       |dec AS (SELECT hr, n, y, ${Q.duckRnd("trend", 6)} AS trend,
       | ${Q.duckRnd("seas", 6)} AS seasonal,
       | ${Q.duckRnd(s"det - ${Q.duckRnd("seas", 6)}", 6)} AS resid
       |FROM e)""".stripMargin

  /** Shared ACF substrate for pacf_durbin and ljung_box: per type,
    * the 12dp-snapped autocorrelations r_1..r_L off the bounded day
    * spine — mean from the exact integer sum, demeaned products as
    * order-pinned left folds (both engines fold the array in index
    * order, so every double matches bit-for-bit). Constant series
    * (den = 0) drop; series shorter than L + 2 drop. Mirrored by
    * [[duckAcfCtes]].
    */
  private def acfTable(
      s: org.apache.spark.sql.SparkSession, d: String, L: Int)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val base = daySeries(s, d)
      .selectExpr("t AS event_type", "size(s) AS n_days", "s")
      .filter($"n_days" >= L + 2)
      .selectExpr("event_type", "n_days", "s",
        "CAST(aggregate(s, CAST(0 AS BIGINT), (a, x) -> a + x)" +
          " AS DOUBLE) / CAST(size(s) AS DOUBLE) AS xb")
      .selectExpr("event_type", "n_days", "s", "xb",
        "aggregate(s, CAST(0 AS DOUBLE), (a, x) ->" +
          " a + (CAST(x AS DOUBLE) - xb) * (CAST(x AS DOUBLE) - xb))" +
          " AS den")
      .filter($"den" > 0.0)
    val nums = base.selectExpr(Seq("event_type", "n_days", "xb", "den") ++
      (1 to L).map { k =>
        s"aggregate(sequence(1, n_days - $k), CAST(0 AS DOUBLE)," +
          s" (a, t) -> a + (CAST(element_at(s, t) AS DOUBLE) - xb)" +
          s" * (CAST(element_at(s, t + $k) AS DOUBLE) - xb)) AS num_$k"
      }: _*)
    nums.select((Seq($"event_type", $"n_days") ++
      (1 to L).map(k => rnd(col(s"num_$k") / $"den", 12).as(s"r_$k"))): _*)
  }

  /** DuckDB mirror of [[acfTable]] — CTE body through `rs`. */
  private def duckAcfCtes(L: Int): String = {
    val numCols = (1 to L).map { k =>
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(range(1, n_days - $k + 1), t ->
         |        (CAST(s[t] AS DOUBLE) - xb)
         |        * (CAST(s[t + $k] AS DOUBLE) - xb))),
         |      (a, x2) -> a + x2) AS num_$k""".stripMargin
    }.mkString(",\n    ")
    val rCols = (1 to L).map(k =>
      s"${Q.duckRnd(s"num_$k / den", 12)} AS r_$k").mkString(",\n  ")
    s"""base AS (SELECT t AS event_type, len(s) AS n_days, s,
       |    CAST(CAST(list_sum(s) AS BIGINT) AS DOUBLE)
       |      / CAST(len(s) AS DOUBLE) AS xb
       |  FROM series WHERE len(s) >= ${L + 2}),
       |dn AS (SELECT event_type, n_days, s, xb,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(s, x -> (CAST(x AS DOUBLE) - xb)
       |        * (CAST(x AS DOUBLE) - xb))),
       |      (a, x2) -> a + x2) AS den
       |  FROM base),
       |nm AS (SELECT event_type, n_days, xb, den,
       |    $numCols
       |  FROM dn WHERE den > 0.0),
       |rs AS (SELECT event_type, n_days,
       |  $rCols
       |  FROM nm)""".stripMargin
  }

  /** Durbin–Levinson fold step, generated once for BOTH engines so
    * the recursion's IEEE sequence is identical by construction.
    * Accumulator layout (1-based) entering step k:
    * [v, φ₁..φ_{k−1}, pacf₁..pacf_{k−1}] (length 2k−1); leaving:
    * [v·(1−α²), φ'₁..φ'_k, pacf₁..pacf_{k−1}, α]. α's text is
    * inlined at each use (SQL lambdas have no let); the inner
    * Σφ_j·r_{k−j} is an order-pinned left fold. Spark's
    * `sequence(1, 0)` DESCENDS instead of returning empty, so the
    * k = 1 legs carry explicit empty-case guards; DuckDB's
    * `range(1, 1)` is naturally empty.
    *
    * @param el    element access: (list, 1-based index expr) → text
    * @param kE    the step index k as an integer-typed expression
    * @param innerSum  body → text of the order-pinned left fold
    *                  Σ_{j=1..k−1} body(j) that is 0.0 when k = 1
    *                  (this is where Spark's descending
    *                  `sequence(1, 0)` needs its empty-case guard)
    * @param mapSeq    (lambdaVar, body) → list text mapping body over
    *                  j = 1..k−1, EMPTY when k = 1
    * @param sliceAB   (list, startIdx, len) → sublist text
    * @param cat   list concatenation
    * @param arr1  single-element list constructor
    */
  private def durbinStep(
      el: (String, String) => String,
      kE: String,
      innerSum: String => String,
      mapSeq: (String, String) => String,
      sliceAB: (String, String, String) => String,
      cat: Seq[String] => String,
      arr1: String => String): String = {
    val v = el("acc", "1")
    val sum = innerSum(
      s"${el("acc", "1 + j")} * ${el("rr", s"$kE - j")}")
    val alpha = s"((${el("rr", kE)} - $sum) / $v)"
    val phis = mapSeq("j",
      s"${el("acc", "1 + j")} - $alpha * ${el("acc", s"1 + $kE - j")}")
    val pacfs = sliceAB("acc", s"$kE + 1", s"$kE - 1")
    cat(Seq(arr1(s"$v * (1.0 - $alpha * $alpha)"), phis, arr1(alpha),
      pacfs, arr1(alpha)))
  }

  /** Page–Hinkley fold step, generated once for BOTH engines (Spark
    * `aggregate` and DuckDB `list_reduce`) so the per-day IEEE op
    * sequence is identical by construction. Accumulator layout
    * (1-based): [t, Σx, m_t, min m, PH, argmax-day].
    */
  private def phStepArray(acc: Int => String, xd: String,
      arr: Seq[String] => String): String = {
    val a1 = acc(1); val a2 = acc(2); val a3 = acc(3)
    val a4 = acc(4); val a5 = acc(5); val a6 = acc(6)
    val t = s"($a1 + 1.0)"
    val cum = s"($a2 + $xd)"
    val mht = s"($a3 + ($xd - $cum / $t))"
    val minm = s"least($a4, $mht)"
    val cand = s"($mht - $minm)"
    arr(Seq(t, cum, mht, minm, s"greatest($a5, $cand)",
      s"CASE WHEN $cand > $a5 THEN $t ELSE $a6 END"))
  }

  /** Day-spine cap for dtw_distance — series length is bounded at
    * DtwMaxDays from the first observed day regardless of the ingest
    * window, so per-pair DP cost and per-row array width are
    * constants. Mirrored in the oracle.
    */
  private val DtwMaxDays = 366L

  /** holt_forecast minimum series length: 2 seed days + ≥0 fold days
    * on the train split and a full 7-day holdout.
    */
  private val HoltMinDays = 9L

  /** lttb_downsample output size: first + last + (LttbOut−2) bucket
    * representatives. Bounded output per series regardless of the
    * spine length. Mirrored in the oracle.
    */
  private val LttbOut = 20

  /** holt_winters minimum series length: 14 init days (two full
    * seasonal periods) + a 7-day holdout.
    */
  private val HwMinDays = 21L

  /** Wave-43 substrate: dtw_distance's bounded zero-filled daily
    * series per event type, factored for reuse (dtw itself predates
    * the helper and keeps its pinned inline construction).
    */
  private def daySeries(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val bounded = dayCells(s, d)
    val span = bounded.groupBy($"d0").agg(max($"day").as("d1"))
    bounded.groupBy($"t")
      .agg(map_from_arrays(collect_list($"day"), collect_list($"n")).as("m"))
      .crossJoin(broadcast(span))
      .select($"t",
        expr("transform(sequence(d0, d1)," +
          " dd -> coalesce(element_at(m, dd), CAST(0 AS BIGINT)))").as("s"))
  }

  /** Bounded (t, day, n) cells, d0 carried for the spine. */
  private def dayCells(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val cells = Tables.events(s, d)
      .filter($"ts".isNotNull && $"event_type".isNotNull)
      .select($"event_type".as("t"),
        expr("unix_millis(ts) DIV 86400000").as("day"))
      .groupBy($"t", $"day").agg(count(lit(1)).as("n"))
    val d0 = cells.agg(min($"day").as("d0"))
    cells.crossJoin(broadcast(d0)).filter($"day" < $"d0" + DtwMaxDays)
  }

  /** Zero-filled (t, day, n) grid over the full bounded spine. */
  private def dayGrid(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val bounded = dayCells(s, d)
    val span = bounded.groupBy($"d0").agg(max($"day").as("d1"))
    val days = span.select(explode(expr("sequence(d0, d1)")).as("day"))
    val types = bounded.select($"t").distinct()
    types.crossJoin(broadcast(days))
      .join(bounded.select($"t", $"day", $"n"), Seq("t", "day"), "left")
      .withColumn("n", coalesce($"n", lit(0L)))
  }

  val oracles: Map[String, String] = Map(
    // same integral S and tie-corrected variance, same closing z
    "trend_test" ->
      """WITH s AS (SELECT epoch_us(ts) // 3600000000 AS h,
        |  CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |sa AS (SELECT CAST(sum(CAST(sign(b.x - a.x) AS BIGINT)) AS BIGINT)
        |    AS s_stat
        |  FROM s a JOIN s b ON b.h > a.h),
        |tt AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
        |    AS BIGINT) AS tie_term
        |  FROM (SELECT count(*) AS t FROM s GROUP BY x) g),
        |nn AS (SELECT count(*) AS n FROM s)
        |SELECT n, s_stat,
        | floor((CASE
        |   WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
        |     / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0)
        |   WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
        |     / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0)
        |   ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS z
        |FROM sa CROSS JOIN tt CROSS JOIN nn""".stripMargin,

    // same explicit middle-pick median (no interpolating percentile
    // built-in — they differ cross-engine)
    "theil_sen" ->
      """WITH s AS (SELECT epoch_us(ts) // 3600000000 AS h,
        |  CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |sl AS (SELECT a.h AS h1, b.h AS h2,
        |  CAST(b.x - a.x AS DOUBLE) / CAST(b.h - a.h AS DOUBLE) AS slope
        | FROM s a JOIN s b ON b.h > a.h),
        |r AS (SELECT slope,
        |  row_number() OVER (ORDER BY slope, h1, h2) AS rn FROM sl),
        |m AS (SELECT count(*) AS m FROM sl)
        |SELECT CAST(m AS BIGINT) AS n_pairs,
        | floor((sum(slope) / count(*)) * 1000000.0 + 0.5) / 1000000.0
        |   AS slope_median
        |FROM r CROSS JOIN m
        |WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
        |GROUP BY m""".stripMargin,

    // same hourly bucketing, same decimal-snapped moments, same fixed
    // division order per lag
    "autocorr_lag" -> {
      def lagCte(l: Int) =
        s"""l$l AS (SELECT CAST($l AS INTEGER) AS lag,
           |  count(*) AS n_pairs,
           |  CAST(sum(CAST(${Q.duckRnd("(a.x - a.mu) * (b.x - b.mu)", 6)}
           |    AS DECIMAL(38,6))) AS DOUBLE) AS num,
           |  max(a.den) AS den
           | FROM w a JOIN w b ON b.h = a.h + $l)""".stripMargin
      s"""WITH s AS (SELECT epoch_us(ts) // 3600000000 AS h,
         |  CAST(count(*) AS DOUBLE) AS x FROM events GROUP BY 1),
         |m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |  CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         |  CAST(sum(CAST(${Q.duckRnd("x * x", 4)} AS DECIMAL(38,4)))
         |    AS DOUBLE) AS sxx
         | FROM s),
         |w AS (SELECT h, x, sx / n AS mu,
         |  (sxx - n * ((sx / n) * (sx / n))) AS den
         | FROM s CROSS JOIN m),
         |${lagCte(1)}, ${lagCte(2)}, ${lagCte(3)}
         |SELECT lag, n_pairs, ${Q.duckRnd("num / den", 6)} AS acf
         |FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2
         |      UNION ALL SELECT * FROM l3) u
         |ORDER BY lag""".stripMargin
    },

    // same floor-seconds gaps (// on non-negative int64 ≡ Spark DIV),
    // same moment sums, same IEEE sequence for mean/var/cv
    "user_burstiness" ->
      """WITH g AS (
        | SELECT user_id, (us - prev) // 1000000 AS g FROM (
        |  SELECT user_id, epoch_us(ts) AS us,
        |   lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id) AS prev
        |  FROM events) f WHERE prev IS NOT NULL),
        |a AS (SELECT user_id, count(*) AS n_gaps,
        |  CAST(sum(g) AS BIGINT) AS sg, CAST(sum(g * g) AS BIGINT) AS sg2
        | FROM g GROUP BY user_id)
        |SELECT user_id, n_gaps,
        | CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_s,
        | CASE WHEN CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) = 0.0 THEN NULL
        |      ELSE sqrt(greatest(
        |        CAST(sg2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
        |          - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
        |            * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)), 0.0))
        |        / (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) END AS cv
        |FROM a ORDER BY user_id""".stripMargin,

    "locf_fill" ->
      """SELECT user_id, event_id, epoch_us(ts) // 1000 AS ts_ms,
        | CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS raw,
        | last_value(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events ORDER BY user_id, ts_ms, event_id""".stripMargin,

    "interval_merge" ->
      """SELECT user_id, span_id, min(st) AS cov_start, max(en) AS cov_end,
        | count(*) AS n_events
        |FROM (
        | SELECT user_id, st, en,
        |  CAST(sum(new_span) OVER (PARTITION BY user_id ORDER BY st, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS span_id
        | FROM (
        |  SELECT user_id, event_id, st, en,
        |   CASE WHEN max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |         OR st > max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |        THEN 1 ELSE 0 END AS new_span
        |  FROM (SELECT user_id, event_id, epoch_us(ts) // 1000 AS st,
        |         epoch_us(ts) // 1000 + 600000 AS en FROM events) i) f
        |) t GROUP BY user_id, span_id
        |ORDER BY user_id, cov_start""".stripMargin,

    "seasonal_decompose" ->
      s"""WITH $duckDecomposeCtes
         |SELECT hr, n, y, trend, seasonal, resid
         |FROM dec ORDER BY hr""".stripMargin,

    "seasonality_strength" ->
      s"""WITH $duckDecomposeCtes,
         |x AS (SELECT CAST(resid AS DECIMAL(18,6)) AS r,
         |    CAST(seasonal + resid AS DECIMAL(18,6)) AS sr,
         |    CAST(trend + resid AS DECIMAL(18,6)) AS tr2
         |  FROM dec),
         |agg AS (SELECT count(*) AS n,
         |    SUM(r) AS s1_r, SUM(CAST(r * r AS DECIMAL(38,12))) AS s2_r,
         |    SUM(sr) AS s1_sr,
         |    SUM(CAST(sr * sr AS DECIMAL(38,12))) AS s2_sr,
         |    SUM(tr2) AS s1_tr2,
         |    SUM(CAST(tr2 * tr2 AS DECIMAL(38,12))) AS s2_tr2
         |  FROM x),
         |vars AS (SELECT n AS n_hours,
         |    ${Q.duckRnd(
        "(CAST(n AS DOUBLE) * CAST(s2_r AS DOUBLE)" +
          " - CAST(s1_r AS DOUBLE) * CAST(s1_r AS DOUBLE))" +
          " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))", 8)} AS var_resid,
         |    ${Q.duckRnd(
        "(CAST(n AS DOUBLE) * CAST(s2_sr AS DOUBLE)" +
          " - CAST(s1_sr AS DOUBLE) * CAST(s1_sr AS DOUBLE))" +
          " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))", 8)}
         |      AS var_seas_resid,
         |    ${Q.duckRnd(
        "(CAST(n AS DOUBLE) * CAST(s2_tr2 AS DOUBLE)" +
          " - CAST(s1_tr2 AS DOUBLE) * CAST(s1_tr2 AS DOUBLE))" +
          " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))", 8)}
         |      AS var_trend_resid
         |  FROM agg)
         |SELECT n_hours, var_resid, var_seas_resid, var_trend_resid,
         |  CASE WHEN var_seas_resid > 0.0 THEN ${Q.duckRnd(
        "greatest(0.0, 1.0 - var_resid / var_seas_resid)", 6)} END
         |    AS f_seasonal,
         |  CASE WHEN var_trend_resid > 0.0 THEN ${Q.duckRnd(
        "greatest(0.0, 1.0 - var_resid / var_trend_resid)", 6)} END
         |    AS f_trend
         |FROM vars""".stripMargin,

    "hour_profile" ->
      s"""WITH ev AS (SELECT coalesce(event_type, '__null__') AS g,
         |    CAST(hour(ts) AS INTEGER) AS hod
         |  FROM events WHERE ts IS NOT NULL),
         |cell AS (SELECT g, hod, count(*) AS n FROM ev GROUP BY g, hod),
         |tot AS (SELECT g, CAST(sum(n) AS BIGINT) AS ng
         |  FROM cell GROUP BY g),
         |rk AS (SELECT g, hod, n,
         |    row_number() OVER (PARTITION BY g ORDER BY n DESC, hod) AS rk
         |  FROM cell)
         |SELECT rk.g, rk.hod, rk.n,
         |  ${Q.duckRnd("CAST(rk.n AS DOUBLE) / CAST(tot.ng AS DOUBLE)", 6)}
         |    AS share,
         |  rk.rk = 1 AS is_peak
         |FROM rk JOIN tot USING (g) ORDER BY g, hod""".stripMargin,

    "ema_decay" ->
      """SELECT user_id, event_id, ts_ms,
        | CASE WHEN den = 0.0 THEN NULL ELSE num / den END AS ema
        |FROM (
        | SELECT user_id, event_id, epoch_us(ts) // 1000 AS ts_ms,
        |  (coalesce(value * 1.0, 0.0) + coalesce(lag(value, 1) OVER w * 0.5, 0.0)
        |   + coalesce(lag(value, 2) OVER w * 0.25, 0.0)
        |   + coalesce(lag(value, 3) OVER w * 0.125, 0.0)
        |   + coalesce(lag(value, 4) OVER w * 0.0625, 0.0)
        |   + coalesce(lag(value, 5) OVER w * 0.03125, 0.0)
        |   + coalesce(lag(value, 6) OVER w * 0.015625, 0.0)
        |   + coalesce(lag(value, 7) OVER w * 0.0078125, 0.0)) AS num,
        |  (CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END
        |   + CASE WHEN lag(value, 1) OVER w IS NOT NULL THEN 0.5 ELSE 0.0 END
        |   + CASE WHEN lag(value, 2) OVER w IS NOT NULL THEN 0.25 ELSE 0.0 END
        |   + CASE WHEN lag(value, 3) OVER w IS NOT NULL THEN 0.125 ELSE 0.0 END
        |   + CASE WHEN lag(value, 4) OVER w IS NOT NULL THEN 0.0625 ELSE 0.0 END
        |   + CASE WHEN lag(value, 5) OVER w IS NOT NULL THEN 0.03125 ELSE 0.0 END
        |   + CASE WHEN lag(value, 6) OVER w IS NOT NULL THEN 0.015625 ELSE 0.0 END
        |   + CASE WHEN lag(value, 7) OVER w IS NOT NULL THEN 0.0078125 ELSE 0.0 END) AS den
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
        |ORDER BY user_id, ts_ms, event_id""".stripMargin,

    "gap_fill" ->
      """WITH ev AS (SELECT user_id, date_trunc('day', ts) AS day, value FROM events),
        |daily AS (SELECT user_id, day, count(*) AS n_events,
        |           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |          FROM ev GROUP BY user_id, day),
        |spine AS (SELECT user_id,
        |           unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS day
        |          FROM (SELECT user_id, min(day) AS dmin, max(day) AS dmax
        |                FROM ev GROUP BY user_id) t)
        |SELECT s.user_id, epoch_us(s.day) // 1000 AS day_ms,
        | coalesce(d.n_events, 0) AS n_events,
        | coalesce(d.sum_value, 0.0) AS sum_value
        |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
        |ORDER BY s.user_id, day_ms""".stripMargin,

    "sample_reservoir" ->
      """SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS h
        |FROM documents ORDER BY h, doc_id LIMIT 50""".stripMargin,

    // same 6dp hourly means, same decimal prefix sums, same scalar
    // deviation op order, same (dev desc, hr) argmax tiebreak
    "changepoint_cusum" ->
      s"""WITH h AS (SELECT event_type, epoch_ms(ts)
         |             - ((epoch_ms(ts) % 3600000 + 3600000) % 3600000) AS hr,
         |           value FROM events),
         |a AS (SELECT event_type, hr,
         |  ${Q.duckRnd(
             "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)" +
               " / CAST(count(value) AS DOUBLE)", 6)} AS y
         |  FROM h GROUP BY event_type, hr),
         |c AS (SELECT event_type, hr, y,
         |    CAST(row_number() OVER w AS DOUBLE) AS i,
         |    CAST(sum(CAST(y AS DECIMAL(18,6))) OVER w AS DOUBLE) AS cum,
         |    CAST(sum(CAST(y AS DECIMAL(18,6))) OVER p AS DOUBLE) AS total,
         |    CAST(count(*) OVER p AS DOUBLE) AS cnt
         |  FROM a WINDOW
         |    w AS (PARTITION BY event_type ORDER BY hr
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    p AS (PARTITION BY event_type)),
         |d AS (SELECT event_type, hr,
         |    ${Q.duckRnd("abs(cum - i * (total / cnt))", 6)} AS dev FROM c),
         |r AS (SELECT event_type, hr, dev,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY dev DESC, hr) AS rk,
         |    count(*) OVER (PARTITION BY event_type) AS n_hours FROM d)
         |SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours, hr AS cp_hr,
         |  dev AS cusum_stat
         |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,

    // same minute durations, same suffix risk set, same scaled-
    // integer truncation chain (recursive CTE = the engine's fold)
    "survival_km" ->
      """WITH RECURSIVE u AS (SELECT user_id,
        |    (max(epoch_us(ts) // 1000) - min(epoch_us(ts) // 1000))
        |      // 60000 AS dur,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS obs
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY user_id),
        |g AS (SELECT dur, count(*) AS m, CAST(sum(obs) AS BIGINT) AS dd
        |  FROM u GROUP BY dur),
        |nt AS (SELECT CAST(sum(m) AS BIGINT) AS n_tot FROM g),
        |r AS (SELECT dur, dd, nr, row_number() OVER (ORDER BY dur) AS rn
        |  FROM (SELECT dur, dd,
        |      n_tot - CAST(sum(m) OVER (ORDER BY dur ROWS BETWEEN
        |        UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) + m AS nr
        |    FROM g CROSS JOIN nt) x
        |  WHERE dd > 0),
        |km AS (
        |  SELECT rn, dur, nr, dd,
        |    CAST((1000000000000 * (nr - dd)) // nr AS BIGINT) AS s
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.rn, r.dur, r.nr, r.dd,
        |    CAST((CAST(km.s AS HUGEINT) * (r.nr - r.dd)) // r.nr
        |      AS BIGINT)
        |  FROM km JOIN r ON r.rn = km.rn + 1)
        |SELECT dur AS t_min, nr AS n_risk, dd AS d_events,
        |  CAST(s AS DOUBLE) / 1000000000000.0 AS survival
        |FROM km ORDER BY t_min""".stripMargin,

    // same day spine + cap, same min-plus closed-form rows, same
    // integer DP; the folded list wraps scalars as 1-element rows so
    // list_reduce's accumulator type matches (row 0 is the seed)
    "dtw_distance" -> {
      def prefS(ai: String, upTo: String) =
        "CAST(list_sum(list_slice(list_transform(vb, x -> " +
          s"abs($ai - x)), 1, $upTo)) AS BIGINT)"
      val row0 =
        s"list_transform(range(1, len(vb) + 1), j -> ${prefS("va[1]", "j")})"
      val newRow =
        s"""list_transform(range(1, len(vb) + 1), j ->
           |  ${prefS("xi[1]", "j")} + list_min(list_slice(
           |    list_transform(range(1, len(vb) + 1), k ->
           |      CASE WHEN k = 1 THEN prev[1]
           |           ELSE least(prev[k], prev[k - 1]) END
           |      - CASE WHEN k = 1 THEN CAST(0 AS BIGINT)
           |             ELSE ${prefS("xi[1]", "k - 1")} END),
           |    1, j)))""".stripMargin.replace("\n", " ")
      s"""WITH cells AS (SELECT event_type AS t,
         |    (epoch_us(ts) // 1000) // 86400000 AS day, count(*) AS n
         |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |  GROUP BY 1, 2),
         |dmin AS (SELECT min(day) AS d0 FROM cells),
         |bounded AS (SELECT t, day, n FROM cells CROSS JOIN dmin
         |  WHERE day < d0 + $DtwMaxDays),
         |span AS (SELECT d0, max(day) AS d1
         |  FROM bounded CROSS JOIN dmin GROUP BY d0),
         |days AS (SELECT unnest(range(d0, d1 + 1)) AS dd FROM span),
         |types AS (SELECT DISTINCT t FROM bounded),
         |grid AS (SELECT ty.t, d.dd, CAST(coalesce(c.n, 0) AS BIGINT) AS n
         |  FROM types ty CROSS JOIN days d
         |  LEFT JOIN bounded c ON c.t = ty.t AND c.day = d.dd),
         |series AS (SELECT t, list(n ORDER BY dd) AS s FROM grid
         |  GROUP BY t),
         |pairs AS (SELECT a.t AS type_a, b.t AS type_b,
         |    a.s AS va, b.s AS vb
         |  FROM series a JOIN series b ON a.t < b.t)
         |SELECT type_a, type_b, CAST(len(va) AS INTEGER) AS n_days,
         |  list_extract(
         |    list_reduce(
         |      list_prepend($row0,
         |        list_transform(va[2:], x -> [x])),
         |      (prev, xi) -> $newRow),
         |    len(vb)) AS dtw
         |FROM pairs ORDER BY type_a, type_b""".stripMargin
    },

    // same spine, same hoisted per-bucket integer constants, same
    // scaled-by-c integer triangle areas, same strict-> tie-break
    "lttb_downsample" -> {
      val w = LttbOut - 2
      val m = "(n_days - 2)"
      def lo = s"((i * $m) // $w + 2)"
      def hi = s"(((i + 1) * $m) // $w + 1)"
      def nlo = s"(((i + 1) * $m) // $w + 2)"
      def nhi = s"least((((i + 2) * $m) // $w + 1), n_days)"
      val bk = s"bks[CAST(xi[1] + 1 AS INTEGER)]"
      val ax = "sel[-1]"
      val ay = s"s[CAST($ax AS INTEGER)]"
      def area(j: String) =
        s"abs(($ax * $bk.c - $bk.sx) * (s[CAST($j AS INTEGER)] - $ay)" +
          s" - ($ax - $j) * ($bk.sy - $ay * $bk.c))"
      s"""WITH $duckDayCtes,
         |st AS (SELECT t AS event_type, CAST(len(s) AS BIGINT) AS n_days, s
         |  FROM series),
         |bu AS (SELECT event_type, n_days, s,
         |    CASE WHEN n_days <= $LttbOut THEN
         |      CAST([] AS STRUCT(lo BIGINT, hi BIGINT, c BIGINT,
         |        sx BIGINT, sy BIGINT)[])
         |    ELSE list_transform(range(0, $w), i -> {
         |      'lo': $lo, 'hi': $hi,
         |      'c': $nhi - $nlo + 1,
         |      'sx': (($nlo + $nhi) * ($nhi - $nlo + 1)) // 2,
         |      'sy': CAST(list_sum(list_slice(s, CAST($nlo AS INTEGER),
         |              CAST($nhi AS INTEGER))) AS BIGINT)}) END AS bks
         |  FROM st),
         |fin AS (SELECT event_type, n_days, s,
         |    CASE WHEN n_days <= $LttbOut THEN range(1, n_days + 1)
         |    ELSE list_reduce(
         |      list_prepend([CAST(1 AS BIGINT)],
         |        list_transform(range(0, $w), i -> [i])),
         |      (sel, xi) -> list_append(sel,
         |        (list_reduce(
         |          list_prepend([$bk.lo - 1, CAST(-1 AS BIGINT)],
         |            list_transform(range($bk.lo, $bk.hi + 1), j -> [j, 0])),
         |          (b, e) -> CASE WHEN ${area("e[1]")} > b[2]
         |            THEN [e[1], ${area("e[1]")}]
         |            ELSE b END))[1])) || [n_days] END AS sel
         |  FROM bu)
         |SELECT event_type, CAST(n_days AS INTEGER) AS n_days,
         |  CAST(i AS INTEGER) AS pos,
         |  CAST(sel[CAST(i AS INTEGER)] AS BIGINT) AS idx,
         |  CAST(s[CAST(sel[CAST(i AS INTEGER)] AS INTEGER)] AS BIGINT) AS y
         |FROM (SELECT event_type, n_days, s, sel,
         |    unnest(range(1, len(sel) + 1)) AS i FROM fin)
         |ORDER BY event_type, pos""".stripMargin
    },

    // same spine, same integer Σx/Σx², same fixed-order segment folds
    "sax_symbolize" -> {
      def lo = "(k * n_days) // w + 1"
      def hi = "((k + 1) * n_days) // w"
      val mz =
        s"""CASE WHEN sigma = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
           |ELSE list_sum(list_transform(list_slice(s, $lo, $hi),
           |  x -> (CAST(x AS DOUBLE) - mu) / sigma))
           |  / CAST($hi - ($lo) + 1 AS DOUBLE) END""".stripMargin
          .replace("\n", " ")
      s"""WITH $duckDayCtes,
         |st AS (SELECT t AS event_type, len(s) AS n_days, s,
         |    CAST(list_sum(s) AS BIGINT) AS sx,
         |    CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS sx2
         |  FROM series),
         |zs AS (SELECT event_type, n_days, s,
         |    least(10, n_days) AS w,
         |    CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) AS mu,
         |    sqrt(greatest(CAST(sx2 AS DOUBLE) / CAST(n_days AS DOUBLE)
         |      - (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))
         |        * (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)),
         |      CAST(0 AS DOUBLE))) AS sigma
         |  FROM st)
         |SELECT event_type, CAST(n_days AS INTEGER) AS n_days,
         |  CAST(w AS INTEGER) AS sax_w,
         |  array_to_string(list_transform(range(0, w), k ->
         |    CASE WHEN $mz < -0.6745 THEN 'a'
         |         WHEN $mz < 0.0 THEN 'b'
         |         WHEN $mz < 0.6745 THEN 'c'
         |         ELSE 'd' END), '') AS sax
         |FROM zs ORDER BY event_type""".stripMargin
    },

    // same seed, same re-inlined level inside the trend step, same
    // 7-day holdout fold
    "holt_forecast" -> {
      val nl = "0.5 * xi[1] + 0.5 * (acc[1] + acc[2])"
      s"""WITH $duckDayCtes,
         |tr AS (SELECT t AS event_type, len(s) AS n_days, s,
         |    len(s) - 7 AS n_train
         |  FROM series WHERE len(s) >= $HoltMinDays),
         |fold AS (SELECT event_type, n_days, s, n_train,
         |    list_reduce(
         |      list_prepend(
         |        [CAST(s[1] AS DOUBLE),
         |         CAST(s[2] AS DOUBLE) - CAST(s[1] AS DOUBLE)],
         |        list_transform(list_slice(s, 3, n_train),
         |          x -> [CAST(x AS DOUBLE)])),
         |      (acc, xi) -> [$nl,
         |        0.3 * (($nl) - acc[1]) + 0.7 * acc[2]]) AS hb
         |  FROM tr),
         |m AS (SELECT event_type, n_days, hb[1] AS l, hb[2] AS b,
         |    list_sum(list_transform(range(1, 8), h ->
         |      abs(hb[1] + CAST(h AS DOUBLE) * hb[2]
         |        - CAST(s[n_train + h] AS DOUBLE)))) / 7.0 AS mae
         |  FROM fold)
         |SELECT event_type, CAST(n_days AS INTEGER) AS n_days,
         |  ${Q.duckRnd("l", 6)} AS level, ${Q.duckRnd("b", 6)} AS trend,
         |  ${Q.duckRnd("mae", 6)} AS mae
         |FROM m ORDER BY event_type""".stripMargin
    },

    // same week-1/week-2 init, same re-inlined level in the trend and
    // seasonal steps, same rotated-seasonal holdout. Accumulator is a
    // FLAT DOUBLE[9] list [l, b, s1..s7] (holt_forecast's shape), NOT
    // a struct: DuckDB's list_reduce mutates a struct accumulator
    // field-by-field in place from the second application on, so a
    // field formula that references another field (the trend's
    // re-inlined level) reads the ALREADY-UPDATED value — measured as
    // a 0.26 level drift on the fixture. List accumulators evaluate
    // the whole element before writing.
    "holt_winters" -> {
      val x = "CAST(s[CAST(xi[1] AS INTEGER)] AS DOUBLE)"
      val idx = "(CAST((CAST(xi[1] AS BIGINT) - 1) % 7 AS INTEGER) + 3)"
      val sOld = s"acc[$idx]"
      val nl = s"0.4 * ($x - $sOld) + 0.6 * (acc[1] + acc[2])"
      val nb = s"0.2 * (($nl) - acc[1]) + 0.8 * acc[2]"
      val l0 = "CAST(list_sum(list_slice(s, 1, 7)) AS DOUBLE) / 7.0"
      val b0 = "(CAST(list_sum(list_slice(s, 8, 14)) AS DOUBLE)" +
        " - CAST(list_sum(list_slice(s, 1, 7)) AS DOUBLE)) / 49.0"
      s"""WITH $duckDayCtes,
         |tr AS (SELECT t AS event_type, len(s) AS n_days, s,
         |    len(s) - 7 AS n_train
         |  FROM series WHERE len(s) >= $HwMinDays),
         |fold AS (SELECT event_type, n_days, s, n_train,
         |    list_reduce(
         |      list_prepend(
         |        list_concat([$l0, $b0],
         |          list_transform(range(1, 8), j ->
         |            CAST(s[CAST(j AS INTEGER)] AS DOUBLE) - ($l0))),
         |        list_transform(range(8, n_train + 1), t ->
         |          [CAST(t AS DOUBLE)])),
         |      (acc, xi) -> list_concat([$nl, $nb],
         |        list_transform(range(3, 10), j ->
         |          CASE WHEN j = $idx
         |            THEN 0.3 * ($x - ($nl)) + 0.7 * $sOld
         |            ELSE acc[CAST(j AS INTEGER)] END))) AS hw
         |  FROM tr),
         |m AS (SELECT event_type, n_days, hw[1] AS l, hw[2] AS b,
         |    list_slice(hw, 3, 9) AS sv,
         |    list_sum(list_transform(range(1, 8), h ->
         |      abs(hw[1] + CAST(h AS DOUBLE) * hw[2]
         |        + hw[CAST((n_train + h - 1) % 7 AS INTEGER) + 3]
         |        - CAST(s[CAST(n_train + h AS INTEGER)] AS DOUBLE))))
         |      / 7.0 AS mae
         |  FROM fold)
         |SELECT event_type, CAST(n_days AS INTEGER) AS n_days,
         |  ${Q.duckRnd("l", 6)} AS level, ${Q.duckRnd("b", 6)} AS trend,
         |  ${(1 to 7).map(j =>
          Q.duckRnd(s"sv[$j]", 6) + s" AS s$j").mkString(", ")},
         |  ${Q.duckRnd("mae", 6)} AS mae
         |FROM m ORDER BY event_type""".stripMargin
    },

    // same first-demand seeding, same dyadic α=1/4 updates, same
    // z/p forecast over the 7-day holdout (the fold element carries
    // its day index in slot 1 — holt's list-wrapped trick).
    // Accumulator is a FLAT DOUBLE[4] list [seen, z, p, q] (seen as
    // 0/1), NOT a struct: the original struct accumulator returned
    // 4.275697 for view-z on the null-injected corpus (the first
    // fixture with a zero-demand train day) NON-DETERMINISTICALLY —
    // 3 of 5 repeated executions of the identical SQL on identical
    // parquet — where the isolated fold, Spark, and a plain-Python
    // Croston all give 4.269156; splitting the co-resident
    // list_transform into its own CTE did not cure it. DuckDB
    // 1.0.0's in-place struct-accumulator mutation (already
    // documented at holt_winters) is vectorization-dependent; flat
    // list accumulators evaluate the whole element before writing
    // and measured deterministic over 20 runs. n_demand also moved
    // to tr so no lambda shares the reduce's projection.
    "croston_forecast" -> {
      val x = "CAST(s[CAST(xi[1] AS INTEGER)] AS DOUBLE)"
      s"""WITH $duckDayCtes,
         |tr AS (SELECT t AS event_type, len(s) AS n_days, s,
         |    len(s) - 7 AS n_train,
         |    CAST(list_sum(list_transform(list_slice(s, 1, len(s) - 7),
         |      v -> CASE WHEN v > 0 THEN 1 ELSE 0 END)) AS BIGINT)
         |      AS n_demand
         |  FROM series WHERE len(s) >= $HoltMinDays),
         |fold AS (SELECT event_type, n_days, s, n_train, n_demand,
         |    list_reduce(
         |      list_prepend([CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
         |          CAST(0 AS DOUBLE), CAST(1 AS DOUBLE)],
         |        list_transform(range(1, n_train + 1), t ->
         |          [CAST(t AS DOUBLE)])),
         |      (acc, xi) -> CASE
         |        WHEN acc[1] = 0 AND $x > 0 THEN
         |          [CAST(1 AS DOUBLE), $x, xi[1], CAST(1 AS DOUBLE)]
         |        WHEN acc[1] = 0 THEN [acc[1], acc[2], acc[3], acc[4]]
         |        WHEN $x > 0 THEN [CAST(1 AS DOUBLE),
         |          acc[2] + ($x - acc[2]) / 4.0,
         |          acc[3] + (acc[4] - acc[3]) / 4.0, CAST(1 AS DOUBLE)]
         |        ELSE [CAST(1 AS DOUBLE), acc[2], acc[3],
         |          acc[4] + CAST(1 AS DOUBLE)] END) AS cr
         |  FROM tr)
         |SELECT event_type, CAST(n_days AS INTEGER) AS n_days, n_demand,
         |  ${Q.duckRnd("cr[2]", 6)} AS demand_level,
         |  ${Q.duckRnd("cr[3]", 6)} AS interval_level,
         |  ${Q.duckRnd("cr[2] / cr[3]", 6)} AS forecast,
         |  ${Q.duckRnd(
          "list_sum(list_transform(range(1, 8), h -> abs(cr[2] / cr[3]" +
            " - CAST(s[CAST(n_train + h AS INTEGER)] AS DOUBLE)))) / 7.0",
          6)} AS mae
         |FROM fold WHERE n_demand > 0
         |ORDER BY event_type""".stripMargin
    },

    // same zero-filled grid, same exact dyadic medians (duck median =
    // quantile_cont 0.5 = mean-of-middles, exact on dyadic doubles)
    "median_polish" ->
      s"""WITH $duckDayCtes,
         |g AS (SELECT t, dd, n, CAST(n AS DOUBLE) AS x FROM grid),
         |rm AS (SELECT t, median(x) AS rm FROM g GROUP BY t),
         |r1 AS (SELECT g.t, g.dd, g.n, g.x, rm.rm, g.x - rm.rm AS r1
         |  FROM g JOIN rm ON g.t = rm.t),
         |cm AS (SELECT dd, median(r1) AS cm FROM r1 GROUP BY dd),
         |r2 AS (SELECT r1.t, r1.dd, r1.n, r1.rm, cm.cm,
         |    r1.r1 - cm.cm AS r2
         |  FROM r1 JOIN cm ON r1.dd = cm.dd)
         |SELECT t AS event_type, dd AS day, CAST(n AS BIGINT) AS n,
         |  ${Q.duckRnd("rm", 6)} AS row_med, ${Q.duckRnd("cm", 6)} AS col_med,
         |  ${Q.duckRnd("r2", 6)} AS residual
         |FROM r2
         |ORDER BY ${Q.duckRnd("abs(r2)", 6)} DESC, event_type, day
         |LIMIT 50""".stripMargin,

    "theta_forecast" ->
      s"""WITH $duckDayCtes,
         |tr AS (SELECT t AS event_type, len(s) AS n_days, s,
         |    len(s) - 7 AS n_train
         |  FROM series WHERE len(s) >= $HoltMinDays),
         |fold AS (SELECT event_type, n_days, s, n_train,
         |    list_reduce(
         |      list_prepend(CAST(s[1] AS DOUBLE),
         |        list_transform(list_slice(s, 2, n_train),
         |          x -> CAST(x AS DOUBLE))),
         |      (acc, xi) -> 0.5 * xi + 0.5 * acc) AS l,
         |    CAST(list_sum(list_transform(range(1, n_train + 1),
         |      t -> t * s[t])) AS BIGINT) AS sxt,
         |    CAST(list_sum(list_slice(s, 1, n_train)) AS BIGINT) AS sx
         |  FROM tr),
         |sl AS (SELECT event_type, n_days, s, n_train, l,
         |    CAST(12 * sxt - 6 * (n_train + 1) * sx AS DOUBLE)
         |      / CAST((n_train * n_train * n_train) - n_train AS DOUBLE)
         |      AS b
         |  FROM fold),
         |m AS (SELECT event_type, n_days, l, b,
         |    list_sum(list_transform(range(1, 8), h ->
         |      abs(l + CAST(h AS DOUBLE) * (b * 0.5)
         |        - CAST(s[n_train + h] AS DOUBLE)))) / 7.0 AS mae
         |  FROM sl)
         |SELECT event_type, CAST(n_days AS INTEGER) AS n_days,
         |  ${Q.duckRnd("l", 6)} AS ses_level, ${Q.duckRnd("b", 6)} AS slope,
         |  ${Q.duckRnd("l + 1.0 * (b * 0.5)", 6)} AS forecast_1,
         |  ${Q.duckRnd("mae", 6)} AS mae
         |FROM m ORDER BY event_type""".stripMargin,

    "page_hinkley" -> {
      val step = phStepArray(i => s"acc[$i]", "xi[1]",
        es => s"[${es.mkString(", ")}]")
      s"""WITH $duckDayCtes,
         |base AS (SELECT t AS event_type, len(s) AS n_days, s
         |  FROM series),
         |fold AS (SELECT event_type, n_days,
         |    list_reduce(
         |      list_prepend([0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
         |        list_transform(s, x -> [CAST(x AS DOUBLE)])),
         |      (acc, xi) -> $step) AS r
         |  FROM base)
         |SELECT event_type, CAST(n_days AS INTEGER) AS n_days,
         |  ${Q.duckRnd("r[2] / CAST(n_days AS DOUBLE)", 6)} AS mean_daily,
         |  ${Q.duckRnd("r[5]", 6)} AS ph_stat,
         |  CAST(r[6] AS INTEGER) AS t_alarm
         |FROM fold ORDER BY event_type""".stripMargin
    },

    "pacf_durbin" -> {
      val L = PacfL
      val kE = "CAST(xi[1] AS BIGINT)"
      val step = durbinStep(
        el = (l, i) => s"$l[($i)]",
        kE = kE,
        innerSum = term => s"list_reduce(list_prepend(" +
          s"CAST(0 AS DOUBLE), list_transform(range(1, $kE)," +
          s" j -> $term)), (a2, x2) -> a2 + x2)",
        mapSeq = (v0, body) =>
          s"list_transform(range(1, $kE), $v0 -> $body)",
        sliceAB = (l, st, len) =>
          s"list_slice($l, $st, ($st) + ($len) - 1)",
        cat = es => es.mkString("(", " || ", ")"),
        arr1 = e => s"[$e]")
      val pacfCols = (1 to L).map(i =>
        s"${Q.duckRnd(s"dl[${L + 1 + i}]", 6)} AS pacf_$i")
        .mkString(",\n|  ")
      s"""WITH $duckDayCtes,
         |${duckAcfCtes(L)},
         |fl AS (SELECT event_type, n_days,
         |    list_reduce(list_prepend([CAST(1 AS DOUBLE)],
         |      list_transform(range(1, ${L + 1}),
         |        kk -> [CAST(kk AS DOUBLE)])),
         |      (acc, xi) -> $step) AS dl
         |  FROM (SELECT event_type, n_days,
         |      [${(1 to L).map(k => s"r_$k").mkString(", ")}] AS rr
         |    FROM rs) t0)
         |SELECT event_type, CAST(n_days AS INTEGER) AS n_days,
         |  $pacfCols
         |FROM fl ORDER BY event_type""".stripMargin
    },

    "ljung_box" -> {
      val L = PacfL
      val sumTerms = (1 to L).map(k =>
        s"r_$k * r_$k / CAST(n_days - $k AS DOUBLE)").mkString(" + ")
      val crit = s"CAST('${java.lang.Double.toString(Chi2L095)}' AS DOUBLE)"
      s"""WITH $duckDayCtes,
         |${duckAcfCtes(L)},
         |q AS (SELECT event_type, n_days,
         |    ${Q.duckRnd(
        "CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) + 2.0)" +
          s" * ($sumTerms)", 6)} AS q_stat
         |  FROM rs)
         |SELECT event_type, CAST(n_days AS INTEGER) AS n_days, q_stat,
         |  q_stat > $crit AS reject_white_noise
         |FROM q ORDER BY event_type""".stripMargin
    })

  /** The dtw oracle's bounded zero-filled series construction,
    * factored for the wave-43 oracles (cells → … → grid → series).
    * A def, not a val: the oracles map above interpolates it at
    * object-construction time, before a later-in-file val would
    * initialize.
    */
  private def duckDayCtes: String =
    s"""cells AS (SELECT event_type AS t,
       |    (epoch_us(ts) // 1000) // 86400000 AS day, count(*) AS n
       |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
       |  GROUP BY 1, 2),
       |dmin AS (SELECT min(day) AS d0 FROM cells),
       |bounded AS (SELECT t, day, n FROM cells CROSS JOIN dmin
       |  WHERE day < d0 + $DtwMaxDays),
       |span AS (SELECT d0, max(day) AS d1
       |  FROM bounded CROSS JOIN dmin GROUP BY d0),
       |days AS (SELECT unnest(range(d0, d1 + 1)) AS dd FROM span),
       |types AS (SELECT DISTINCT t FROM bounded),
       |grid AS (SELECT ty.t, d.dd, CAST(coalesce(c.n, 0) AS BIGINT) AS n
       |  FROM types ty CROSS JOIN days d
       |  LEFT JOIN bounded c ON c.t = ty.t AND c.day = d.dd),
       |series AS (SELECT t, list(n ORDER BY dd) AS s FROM grid
       |  GROUP BY t)""".stripMargin
}
