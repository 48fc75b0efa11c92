package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** §2.5 window functions + §2.6 top-k retention + §2.7 set operations.
  * Window partitions are keyed on mid-cardinality columns (nation,
  * customer, supplier) so state per partition stays bounded at scale;
  * running frames are ROWS-based with a unique ordering suffix for
  * determinism.
  */
object WindowSetQueries {

  val defs: Map[String, QueryFn] = Map(
    "window_rank" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
      Tables.customer(s, d)
        .select($"c_nationkey", $"c_custkey", $"c_acctbal",
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          row_number().over(w).as("rn"))
        .filter($"rn" <= 10)
        .orderBy($"c_nationkey", $"rn")
    }),

    "window_lag" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".asc_nulls_last, $"o_orderkey")
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          ($"o_totalprice" - lag($"o_totalprice", 1).over(w)).as("delta"))
        .orderBy($"o_custkey", $"o_orderdate".asc_nulls_last, $"o_orderkey")
    }),

    // (l_orderkey, l_linenumber) is not unique, so the frame order
    // includes the summed value columns: rows that still tie are fully
    // identical in the sum input and produce the same running multiset
    // in either order — deterministic at every sf.
    "window_running_sum" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate".asc_nulls_last, $"l_orderkey", $"l_linenumber",
          $"l_partkey".asc_nulls_last, $"l_quantity".asc_nulls_last,
          $"l_extendedprice".asc_nulls_last)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          sum(dec($"l_quantity")).over(w).cast("double").as("running_qty"))
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber",
          $"running_qty".asc_nulls_last)
    }),

    // The reference's keep-newest-5-versions GC (compare_schema.py:73-89)
    // as a rank-and-filter window.
    "window_topn_retention" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderkey",
          row_number().over(w).as("version_rank"))
        .filter($"version_rank" <= 5)
        .orderBy($"o_custkey", $"version_rank")
    }),

    // distribution ranks: ntile buckets plus percent_rank/cume_dist —
    // both are single IEEE divisions of window counts, so values are
    // bit-identical across engines without rounding.
    "window_ntile" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
      Tables.customer(s, d)
        .select($"c_nationkey", $"c_custkey", $"c_acctbal",
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy($"c_nationkey", $"c_custkey")
    }),

    // frame-boundary analytics over the whole partition: first/last/
    // nth order value per customer (frame pinned to the full partition
    // — last_value under the default frame would just echo the row).
    "window_first_last" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".asc_nulls_last, $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderkey",
          first($"o_totalprice").over(w).as("first_price"),
          last($"o_totalprice").over(w).as("last_price"),
          nth_value($"o_totalprice", 2).over(w).as("second_price"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Rolling exact median over a bounded 5-row frame — the robust
    // moving-average replacement. Spark's median/percentile aggregates
    // reject bounded window frames, so the frame materializes as a
    // ≤5-element sorted list and the midpoint interpolates explicitly
    // ((lo + hi) / 2) — the SAME formula the oracle runs, sidestepping
    // engine-specific median interpolation entirely. The full sort key
    // includes the measured column, so rows tying on every key carry
    // equal values and any tie order yields the same frame multiset →
    // deterministic at every sf. The frame payload is O(frame), never
    // O(partition).
    "window_median" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate".asc_nulls_last, $"l_orderkey", $"l_linenumber",
          $"l_partkey".asc_nulls_last, $"l_quantity".asc_nulls_last,
          $"l_extendedprice".asc_nulls_last)
        .rowsBetween(-4, Window.currentRow)
      Tables.lineitem(s, d)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_extendedprice",
          array_sort(collect_list($"l_extendedprice").over(w)).as("srt"))
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_extendedprice",
          rnd((get($"srt", ((size($"srt") - 1) / 2).cast("int"))
            + get($"srt", (size($"srt") / 2).cast("int"))) / 2.0, 4).as("med5"))
        // med5 closes the ORDER BY: (l_orderkey, l_linenumber) is NOT
        // unique in lineitem, so on a null-ridden corpus two rows can
        // share every other key (extendedprice NULL on both) while
        // their medians differ — an engine-dependent row-order tie
        // the hash compare only catches when the engines happen to
        // break it differently (the agg_grouping_sets lesson: order
        // by ALL output columns, then row order IS row content)
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber",
          $"l_extendedprice".asc_nulls_last, $"med5".asc_nulls_last)
    }),

    "set_union" -> ((s, d) => {
      import s.implicits._
      val a = Tables.customer(s, d).filter($"c_mktsegment" === "AUTOMOBILE")
        .select($"c_custkey".as("key"), lit("auto").as("src"))
      val b = Tables.orders(s, d).filter($"o_totalprice" > 300000)
        .select($"o_custkey".as("key"), lit("high").as("src"))
      a.union(b).orderBy($"key", $"src")
    }),

    "set_intersect" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d).select($"l_partkey".as("partkey"))
        .intersect(Tables.part(s, d).filter($"p_size" > 25)
          .select($"p_partkey".as("partkey")))
        .orderBy($"partkey")
    }),

    "set_except" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d).select($"o_custkey".as("custkey"))
        .except(Tables.customer(s, d).filter($"c_acctbal" < 0)
          .select($"c_custkey".as("custkey")))
        .orderBy($"custkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "window_rank" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rnk, drnk, rn FROM
        | (SELECT c_nationkey, c_custkey, c_acctbal,
        |   rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |   row_number() OVER w AS rn
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)) t
        |WHERE rn <= 10 ORDER BY c_nationkey, rn""".stripMargin,

    "window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | lead(o_totalprice, 1) OVER w AS next_price,
        | o_totalprice - lag(o_totalprice, 1) OVER w AS delta
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER
        |  (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber,
        |   l_partkey, l_quantity, l_extendedprice
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin,

    "window_topn_retention" ->
      """SELECT o_custkey, o_orderkey, version_rank FROM
        | (SELECT o_custkey, o_orderkey,
        |   row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY o_orderdate DESC, o_orderkey DESC) AS version_rank
        |  FROM orders) t
        |WHERE version_rank <= 5 ORDER BY o_custkey, version_rank""".stripMargin,

    "window_ntile" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        | ntile(4) OVER w AS quartile,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,

    "window_median" ->
      s"""SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
         | ${Q.duckRnd("(srt[((len(srt)-1)//2)+1] + srt[(len(srt)//2)+1]) / 2.0", 4)} AS med5
         |FROM (
         | SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
         |  -- list_filter: Spark's collect_list SKIPS nulls, DuckDB's
         |  -- list() keeps them — drop them so both frames agree
         |  list_sort(list_filter(list(l_extendedprice) OVER w,
         |    x -> x IS NOT NULL)) AS srt
         | FROM lineitem
         | WINDOW w AS (PARTITION BY l_suppkey
         |  ORDER BY l_shipdate, l_orderkey, l_linenumber,
         |           l_partkey, l_quantity, l_extendedprice
         |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) t
         |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_extendedprice, med5""".stripMargin,

    "window_first_last" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_totalprice) OVER w AS first_price,
        | last_value(o_totalprice) OVER w AS last_price,
        | nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "set_union" ->
      """SELECT c_custkey AS key, 'auto' AS src FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |UNION ALL
        |SELECT o_custkey AS key, 'high' AS src FROM orders WHERE o_totalprice > 300000
        |ORDER BY key, src""".stripMargin,

    "set_intersect" ->
      """SELECT l_partkey AS partkey FROM lineitem
        |INTERSECT
        |SELECT p_partkey AS partkey FROM part WHERE p_size > 25
        |ORDER BY partkey""".stripMargin,

    "set_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
        |ORDER BY custkey""".stripMargin
  )
}
