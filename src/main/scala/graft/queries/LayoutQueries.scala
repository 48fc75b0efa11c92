package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Data-layout and robustness operators (round-3 widening of
  * SURVEY.md §2): explicit skew-salted joins, melt/unpivot reshaping,
  * event-time RANGE window frames, Z-order layout keys, and the
  * modern aggregate surface (count_if / median / bool_and / bool_or).
  *
  * Scale rationale:
  *  - `join_skew_salted` is the hot-key escape hatch when AQE's
  *    runtime skew splitting can't apply (single hot key into one
  *    reducer): the salt spreads each key over `buckets` reducers at
  *    the cost of replicating the (small) dimension side. Result is
  *    IDENTICAL to the plain equi-join — the oracle checks that, and
  *    SkewJoinSpec pins the plan shape.
  *  - `zorder_layout` computes the interleaved-bit sort key that
  *    clusters a table on TWO dimensions at once: sorting 100 TB by
  *    the Z-key makes parquet min/max stats tight on BOTH x and y, so
  *    either predicate prunes row groups — a single-column sort gives
  *    pruning on one dimension only. The key is pure codegen'd bit
  *    arithmetic (no UDF).
  *  - `window_range_frame` is the event-time trailing aggregate
  *    (RANGE, not ROWS — peers at the same timestamp all join the
  *    frame, so the result is order-stable under ties).
  */
object LayoutQueries {

  private def zkey(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    graft.functions.ZOrder.zkey(x, y)

  val defs: Map[String, QueryFn] = Map(
    // Hot-key mitigation as a first-class operator: events (the big,
    // naturally skewed fact — some users are far busier than others)
    // joined to the customer dim through an explicit salt. The salted
    // plan must produce exactly the rows of the plain join.
    "join_skew_salted" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"user_id", $"value")
      val dim = Tables.customer(s, d)
        .select($"c_custkey".as("user_id"), $"c_mktsegment")
      graft.operators.SkewJoin.saltedJoin(ev, dim, "user_id", "user_id", buckets = 8)
        .groupBy(dim("c_mktsegment").as("mktsegment"))
        .agg(count(lit(1)).as("n_events"), dsum(ev("value")).as("sum_value"))
        .orderBy($"mktsegment".asc_nulls_last)
    }),

    // Melt / unpivot: wide per-flag aggregates reshaped to long form
    // (the report/export shape) via the Dataset.unpivot API.
    "unpivot_melt" -> ((s, d) => {
      import s.implicits._
      val wide = Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_price"),
          count(lit(1)).cast("double").as("n_items"))
      wide.unpivot(
        Array($"l_returnflag"),
        Array($"sum_qty", $"sum_price", $"n_items"),
        "metric", "value")
        .orderBy($"l_returnflag".asc_nulls_last, $"metric".asc_nulls_last)
    }),

    // Trailing 1-hour event-time sum per event type — RANGE frame over
    // epoch millis, so simultaneous events are frame peers and the
    // result is deterministic under timestamp ties.
    "window_range_frame" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"ms")
        .rangeBetween(-3600000L, 0L)
      Tables.events(s, d)
        .select($"event_id", $"event_type", unix_millis($"ts").as("ms"), $"value")
        .withColumn("trailing_1h", sum(dec($"value")).over(w).cast("double"))
        .drop("value")
        .orderBy($"event_id")
    }),

    // Z-order layout key over (user_id, floor(value)): the write-side
    // clustering sort of a two-dimensional layout optimization. Output
    // is the curve order itself (zkey, then id for ties).
    "zorder_layout" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"event_id",
          ($"user_id" % 65536).as("zx"),
          (floor($"value").cast("long") % 65536).as("zy"))
        .withColumn("zkey", zkey($"zx", $"zy"))
        .orderBy($"zkey".asc_nulls_last, $"event_id".asc_nulls_last)
    }),

    // Modern aggregate surface: count_if / median / bool_and /
    // bool_or. median interpolates between the two middle values on
    // even counts — same lower+(upper−lower)·frac double arithmetic in
    // both engines.
    "agg_modern" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(
          count_if($"value" > 100).as("n_high"),
          median($"value").as("med_value"),
          bool_and($"value" >= 0).as("all_nonneg"),
          bool_or($"value" > 480).as("any_extreme"))
        .orderBy($"event_type".asc_nulls_last)
    }),

    // Hive-style partition pruning end-to-end: write orders
    // partitioned by priority, read back with a partition predicate —
    // the scan must list ONLY the matching directory (PlanSpec asserts
    // the PartitionFilters + selected-partition count). At 100 TB,
    // directory-level pruning is the first and cheapest data-skipping
    // tier, ahead of parquet row-group stats and Z-order clustering.
    // The write side exercises the partitioned sink (dynamic partition
    // directories) on every invocation.
    "partition_prune" -> ((s, d) => {
      import s.implicits._
      val path = Q.scratchPath("orders_bypri", d)
      val src = Tables.orders(s, d)
      src.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
      // carry the schema explicitly: a zero-row partitioned write
      // leaves no files to infer from (and production readers carry
      // schemas anyway); partition discovery still supplies the
      // directory values on non-empty data
      s.read.schema(src.schema).parquet(path)
        .filter($"o_orderpriority" === "1-URGENT")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"))
        .orderBy($"o_orderstatus")
    }),

    // DYNAMIC partition pruning — partition_prune's runtime sibling:
    // the partition predicate is not a literal but the key set of a
    // filtered dimension, known only at execution. Spark turns the
    // broadcast build side into a pruning subquery on the partitioned
    // scan (PartitionFilters: [... dynamicpruningexpression(...)]),
    // so the fact read skips directories for types the dim filter
    // rejected — at 100 TB this is the difference between scanning 2
    // partitions and all of them, with no literal predicate anywhere.
    // PlanSpec pins the dynamicpruning expression in the plan.
    "dpp_join" -> ((s, d) => {
      import s.implicits._
      val path = Q.scratchPath("events_bytype", d)
      val srcEv = Tables.events(s, d)
      srcEv.write.mode("overwrite").partitionBy("event_type").parquet(path)
      val fact = s.read.schema(srcEv.schema).parquet(path)
      val dim = Tables.events(s, d).select($"event_type").distinct()
        .filter(length($"event_type") === 5)
      fact.join(broadcast(dim), Seq("event_type"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
        .orderBy($"event_type")
    }),

    // Compaction planning: pack each source's files (docs standing in
    // for data files, n_chars for bytes) into target-sized output
    // bins by walking sizes largest-first and cutting a new bin each
    // time the running total crosses the target — the OPTIMIZE/
    // small-file-compaction planner as a relational op. The running
    // sum is [[graft.operators.DistributedNtile.withRunningSum]]
    // (range partitioning + broadcast carry), so a dominant source
    // plans its whole file list without a single-task sort.
    "compaction_plan" -> ((s, d) => {
      import s.implicits._
      val files = Tables.documents(s, d).select($"source".as("src"),
        $"doc_id".as("file_id"), $"n_chars".as("bytes"))
      graft.operators.DistributedNtile.withRunningSum(
        files, "src", Seq($"bytes".desc, $"file_id"), $"bytes", "cum")
        .withColumn("bin", expr(s"(cum - 1) DIV $CompactTarget + 1"))
        .groupBy($"src", $"bin")
        .agg(count(lit(1)).as("n_files"), sum($"bytes").as("bin_bytes"),
          max($"bytes").as("largest"))
        .orderBy($"src".asc_nulls_last, $"bin".asc_nulls_last)
    })
  )

  /** Compaction target size (chars-as-bytes; mirrored into oracle). */
  private val CompactTarget = 4096L

  private def duckZkey(x: String, y: String): String =
    (0 until 16).map { j =>
      s"(($x >> $j) & 1) * ${1L << (2 * j)} + (($y >> $j) & 1) * ${1L << (2 * j + 1)}"
    }.mkString(" + ")

  val oracles: Map[String, String] = Map(
    // plain equi-join: the salt must be invisible in the result
    "join_skew_salted" ->
      """SELECT c.c_mktsegment AS mktsegment, count(*) AS n_events,
        | CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1 ORDER BY mktsegment""".stripMargin,

    "unpivot_melt" ->
      """WITH wide AS (
        | SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(count(*) AS DOUBLE) AS n_items
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value FROM (
        | SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
        | UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM wide
        | UNION ALL SELECT l_returnflag, 'n_items', n_items FROM wide) t
        |ORDER BY l_returnflag, metric""".stripMargin,

    "window_range_frame" ->
      """SELECT event_id, event_type, epoch_ms(ts) AS ms,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |   PARTITION BY event_type ORDER BY epoch_ms(ts)
        |   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_1h
        |FROM events ORDER BY event_id""".stripMargin,

    "zorder_layout" -> {
      s"""SELECT event_id, zx, zy, ${duckZkey("zx", "zy")} AS zkey
         |FROM (SELECT event_id, user_id % 65536 AS zx,
         |        CAST(floor(value) AS BIGINT) % 65536 AS zy
         |      FROM events) t
         |ORDER BY zkey, event_id""".stripMargin
    },

    "agg_modern" ->
      """SELECT event_type,
        | CAST(count(*) FILTER (WHERE value > 100) AS BIGINT) AS n_high,
        | median(value) AS med_value,
        | bool_and(value >= 0) AS all_nonneg,
        | bool_or(value > 480) AS any_extreme
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the partitioned copy holds exactly the source rows, so the
    // oracle filters the source table directly
    "partition_prune" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // the dynamic pruning must be invisible in the result: plain
    // filtered join semantics
    "dpp_join" ->
      """SELECT event_type, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events WHERE length(event_type) = 5
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "compaction_plan" ->
      s"""WITH r AS (SELECT source AS src, n_chars AS bytes,
         |  CAST(sum(n_chars) OVER (PARTITION BY source
         |    ORDER BY n_chars DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum
         | FROM documents)
         |SELECT src, (cum - 1) // $CompactTarget + 1 AS bin,
         | count(*) AS n_files, CAST(sum(bytes) AS BIGINT) AS bin_bytes,
         | max(bytes) AS largest
         |FROM r GROUP BY src, (cum - 1) // $CompactTarget + 1
         |ORDER BY src, bin""".stripMargin
  )
}
