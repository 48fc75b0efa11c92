package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import Q._

/** Twenty-first wave — the remaining classic TPC-H query shapes
  * (joining Q1/Q5/Q7/Q8 already in [[AnalyticsQueries]]): shipping
  * priority (Q3), returned-item customer ranking (Q10), product
  * profit by nation/year (Q9, adapted — the fixture has no partsupp
  * table, so profit is discounted revenue), large-volume orders
  * (Q18), and supplier-count part stats (Q16). These are the
  * warehouse-benchmark shapes a user of the reference's star schema
  * (`Scripts/transformation_job.py:19-34`) runs against the same
  * fact/dim layout.
  *
  * Scale/perf design — one corpus-scale shuffle each, dims broadcast:
  *  - Q3/Q10/Q18 join lineitem⋈orders on the order key (both sides
  *    shuffle-partition on the key, no replication); customer/nation
  *    are broadcast dimension hops. Q3 additionally prunes orders
  *    with a broadcast SEMI join against the filtered customer
  *    segment BEFORE the big shuffle (at extreme scale AQE would
  *    demote it to a shuffled semi join — the semantics don't
  *    change). Top-N finals are TakeOrdered, never a global sort.
  *  - Q18's "orders with total quantity > T" pre-aggregates lineitem
  *    on the SAME key the subsequent join shuffles on, so the
  *    HAVING-subquery plan reuses one partitioning end to end.
  *  - Q9/Q16 filter part FIRST and broadcast the survivors into the
  *    lineitem scan (runtime-prunable join), so the fact scan is the
  *    only full pass.
  *  - All money sums ride the decimal(12,2)/(4,2) exact-arithmetic
  *    idiom; dates surface as epoch millis (both engines floor
  *    identically); every query ends in a deterministic ORDER BY.
  */
object TpchQueries {

  /** Q18 quantity threshold (mirrored into the oracle). */
  private val BigOrderQty = 300

  /** hits_scores fixed power-iteration count — small enough that the
    * oracle stays an unrolled-CTE chain (pagerank_lite's convention).
    */
  private val HitsIters = 3

  /** Exact decimal casts for money×rate arithmetic (the
    * AnalyticsQueries idiom: product stays within 38 digits).
    */
  private def d12(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
  private def d4(c: org.apache.spark.sql.Column) = c.cast("decimal(4,2)")

  val defs: Map[String, QueryFn] = Map(
    // HITS hubs & authorities (wave 47, Kleinberg 1999) over the
    // customer→supplier bipartite graph induced by lineitem⋈orders —
    // the link-analysis dual of pagerank_lite: customers are hubs
    // (buy from many good suppliers), suppliers are authorities
    // (sold-to by many good customers). HitsIters fixed power
    // iterations; per half-iteration ONE edge-keyed join + one keyed
    // aggregate + a one-row broadcast max for the ∞-norm normalize —
    // the same per-round shape as pagerank_lite, so the same 100 TB
    // posture (no adjacency on the driver, no cross join; the edge
    // relation shuffles once per side per round on its join key).
    // Determinism: scores snap to 12dp, contributions sum as exact
    // decimal (order-free), the max-normalize divides two identically
    // derived doubles. Output is the top-20 of each role under a
    // (role, score desc, key) total order.
    "hits_scores" -> ((s, d) => {
      import s.implicits._
      // Lineage policy (pagerank_lite's): the edge relation and each
      // round's score frame are referenced 2× downstream (next
      // half-round + its ∞-norm max, plus the closing top-20s), so
      // without truncation the recompute tree DOUBLES per round. A
      // LAZY localCheckpoint collapses each to a LogicalRDD computed
      // once on the caller's action — the big lineitem⋈orders
      // distinct runs exactly once however many rounds reference it.
      val ed = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .select($"o_custkey".cast("long").as("c"),
          $"l_suppkey".cast("long").as("sp"))
        .distinct()
        .localCheckpoint(eager = false)
      var h = ed.select($"c").distinct().withColumn("h", lit(1.0))
      var a: org.apache.spark.sql.DataFrame = null
      for (_ <- 1 to HitsIters) {
        val ar = ed.join(h, "c").groupBy($"sp")
          .agg(sum($"h".cast("decimal(20,12)")).cast("double").as("ar"))
          .localCheckpoint(eager = false)
        val amax = ar.agg(max($"ar").as("am"))
        a = ar.crossJoin(broadcast(amax))
          .select($"sp", rnd($"ar" / $"am", 12).as("a"))
        val hr = ed.join(a, "sp").groupBy($"c")
          .agg(sum($"a".cast("decimal(20,12)")).cast("double").as("hr"))
          .localCheckpoint(eager = false)
        val hmax = hr.agg(max($"hr").as("hm"))
        h = hr.crossJoin(broadcast(hmax))
          .select($"c", rnd($"hr" / $"hm", 12).as("h"))
      }
      val topA = a.orderBy($"a".desc, $"sp").limit(20)
        .select(lit("authority").as("role"), $"sp".as("key"), $"a".as("score"))
      val topH = h.orderBy($"h".desc, $"c").limit(20)
        .select(lit("hub").as("role"), $"c".as("key"), $"h".as("score"))
      topA.union(topH).orderBy($"role", $"score".desc, $"key")
    }),

    // Q3: top-10 unshipped BUILDING-segment orders by outstanding
    // revenue as of the cutoff date.
    "tpch_shipping_priority" -> ((s, d) => {
      import s.implicits._
      val rev = $"l_extendedprice".cast("decimal(12,2)") *
        (lit(1).cast("decimal(4,2)") - $"l_discount".cast("decimal(4,2)"))
      val cust = Tables.customer(s, d)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val ord = Tables.orders(s, d)
        .filter($"o_orderdate" < lit("1997-06-01").cast("timestamp"))
        .join(broadcast(cust), $"o_custkey" === $"c_custkey", "left_semi")
      Tables.lineitem(s, d)
        .filter($"l_shipdate" > lit("1997-06-01").cast("timestamp"))
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey",
          unix_millis($"o_orderdate".cast("timestamp")).as("o_date_ms"), $"o_orderpriority")
        .agg(sum(rev).cast("double").as("revenue"))
        .select($"l_orderkey", $"revenue", $"o_date_ms", $"o_orderpriority")
        .orderBy($"revenue".desc, $"o_date_ms", $"l_orderkey")
        .limit(10)
    }),

    // Q10: customers who returned the most revenue in one quarter —
    // the churn-investigation ranking.
    "tpch_returned_items" -> ((s, d) => {
      import s.implicits._
      val rev = $"l_extendedprice".cast("decimal(12,2)") *
        (lit(1).cast("decimal(4,2)") - $"l_discount".cast("decimal(4,2)"))
      Tables.lineitem(s, d).filter($"l_returnflag" === "R")
        .join(Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1997-04-01").cast("timestamp")),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
        .agg(sum(rev).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    }),

    // Q9 (adapted): discounted revenue from widget parts by supplier
    // nation and order year. The fixture carries no partsupp/
    // ps_supplycost, so "profit" here is revenue — the join topology
    // and grain are Q9's.
    "tpch_product_profit" -> ((s, d) => {
      import s.implicits._
      val rev = $"l_extendedprice".cast("decimal(12,2)") *
        (lit(1).cast("decimal(4,2)") - $"l_discount".cast("decimal(4,2)"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .filter($"p_name".contains("widget")).select($"p_partkey")),
          $"l_partkey" === $"p_partkey")
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name".as("nation"), year($"o_orderdate").as("o_year"))
        .agg(sum(rev).cast("double").as("sum_profit"),
          count(lit(1)).as("n_items"))
        .orderBy($"nation".asc_nulls_last, $"o_year".desc)
    }),

    // Q18: large-volume orders — the HAVING-subquery shape. The
    // pre-aggregate and the join share the order key, so the plan
    // reuses one shuffle partitioning.
    "tpch_large_orders" -> ((s, d) => {
      import s.implicits._
      val big = Tables.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(sum(dec($"l_quantity")).as("sum_qty"))
        .filter($"sum_qty" > lit(BigOrderQty))
      Tables.orders(s, d)
        .join(big, $"o_orderkey" === $"l_orderkey")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .select($"c_custkey", $"c_name", $"o_orderkey",
          unix_millis($"o_orderdate".cast("timestamp")).as("o_date_ms"), $"o_totalprice",
          $"sum_qty".cast("double").as("sum_qty"))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100)
    }),

    // Q4: orders with at least one late line item, counted by
    // priority — the EXISTS-correlated-subquery shape, planned as a
    // semi join on the order key (no decorrelation gymnastics, no
    // fact-side duplication from a plain join).
    "tpch_order_priority" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
        .join(
        Tables.lineitem(s, d)
          .filter($"l_shipdate" > lit("1997-02-01").cast("timestamp"))
          .select($"l_orderkey"),
        $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    }),

    // Q6: the forecast-revenue-change single-scan aggregate — a
    // banded filter (date year, discount band, quantity cap) into
    // one exact decimal product sum. The canonical pushdown test:
    // every predicate reaches the parquet scan.
    "tpch_forecast_revenue" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
          $"l_quantity" < 24)
        .agg(sum(d12($"l_extendedprice") * d4($"l_discount"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Q13: the customer order-count DISTRIBUTION — left outer join so
    // zero-order customers survive, then a histogram of the counts.
    // Two aggregates chained on different keys; the first reuses the
    // join's customer-key partitioning.
    "tpch_custdist" -> ((s, d) => {
      import s.implicits._
      val perCust = Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
      perCust.groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    }),

    // Q14: promo-part revenue share per month of 1997 — conditional
    // sum over one scan-join pass, one closing division per month.
    "tpch_promo_share" -> ((s, d) => {
      import s.implicits._
      val rev = d12($"l_extendedprice") * (d4(lit(1)) - d4($"l_discount"))
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_type")),
          $"l_partkey" === $"p_partkey")
        .groupBy(month($"l_shipdate").as("mon"))
        .agg(
          sum(when($"p_type" === "PROMO", rev)).cast("double").as("promo_rev"),
          sum(rev).cast("double").as("total_rev"))
        .select($"mon", $"promo_rev", $"total_rev",
          rnd(lit(100.0) * $"promo_rev" / $"total_rev", 6).as("promo_pct"))
        .orderBy($"mon")
    }),

    // Q15: top supplier(s) by quarter revenue — the
    // aggregate-then-max-then-filter shape (the view in the spec);
    // the max is a 1-row broadcast back onto the supplier aggregate,
    // and ALL ties surface (Q15's documented semantics).
    "tpch_top_supplier" -> ((s, d) => {
      import s.implicits._
      val rev = d12($"l_extendedprice") * (d4(lit(1)) - d4($"l_discount"))
      val supRev = Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
        .groupBy($"l_suppkey")
        .agg(sum(rev).cast("decimal(22,4)").as("total_rev"))
      val mx = supRev.agg(max($"total_rev").as("mx"))
      supRev.crossJoin(broadcast(mx))
        .filter($"total_rev" === $"mx")
        .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name",
          $"total_rev".cast("double").as("total_rev"))
        .orderBy($"s_suppkey")
    }),

    // Q17: small-quantity-order revenue — line items under 20% of
    // their part's average quantity. The correlated-average shape:
    // the per-part average joins back on the SAME part key the
    // lineitem shuffle already established; the 0.2 factor is
    // dyadic-safe decimal arithmetic.
    "tpch_small_qty_revenue" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val avgQty = li.groupBy($"l_partkey".as("ap_key"))
        .agg((sum(dec($"l_quantity")).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"))
      li.join(avgQty, $"l_partkey" === $"ap_key")
        .filter($"l_quantity" < lit(0.2) * $"avg_qty")
        .agg(dsum($"l_extendedprice").as("sum_price"),
          count(lit(1)).as("n_items"))
        .select(rnd($"sum_price" / 7.0, 6).as("avg_yearly"), $"n_items")
    }),

    // Q16-shape: how many distinct suppliers actually shipped each
    // (brand, type, size) part family — excluding one brand, the
    // anti-predicate Q16 carries.
    "tpch_supplier_parts" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter($"p_brand" =!= "Brand#13")
          .select($"p_partkey", $"p_brand", $"p_type", $"p_size")),
          $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"),
          count(lit(1)).as("n_items"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
    }))

  private val Rev =
    """CAST(l_extendedprice AS DECIMAL(12,2))
      | * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))""".stripMargin

  val oracles: Map[String, String] = Map(
    // same distinct edge relation, same decimal contribution sums,
    // same 12dp max-normalize, unrolled per iteration
    "hits_scores" -> {
      val rounds = (1 to HitsIters).map { i =>
        val prevH = if (i == 1) "h0" else s"h${i - 1}"
        s"""a${i}r AS (SELECT sp,
           |  CAST(sum(CAST(h AS DECIMAL(20,12))) AS DOUBLE) AS ar
           |  FROM ed JOIN $prevH USING (c) GROUP BY sp),
           |a$i AS (SELECT sp,
           |  ${Q.duckRnd(s"ar / (SELECT max(ar) FROM a${i}r)", 12)} AS a
           |  FROM a${i}r),
           |h${i}r AS (SELECT c,
           |  CAST(sum(CAST(a AS DECIMAL(20,12))) AS DOUBLE) AS hr
           |  FROM ed JOIN a$i USING (sp) GROUP BY c),
           |h$i AS (SELECT c,
           |  ${Q.duckRnd(s"hr / (SELECT max(hr) FROM h${i}r)", 12)} AS h
           |  FROM h${i}r)""".stripMargin
      }.mkString(",\n")
      s"""WITH ed AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS c,
         |    CAST(l_suppkey AS BIGINT) AS sp
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |h0 AS (SELECT DISTINCT c, CAST(1.0 AS DOUBLE) AS h FROM ed),
         |$rounds,
         |ta AS (SELECT 'authority' AS role, sp AS key, a AS score
         |  FROM a$HitsIters ORDER BY a DESC, sp LIMIT 20),
         |th AS (SELECT 'hub' AS role, c AS key, h AS score
         |  FROM h$HitsIters ORDER BY h DESC, c LIMIT 20)
         |SELECT role, key, score
         |FROM (SELECT * FROM ta UNION ALL SELECT * FROM th)
         |ORDER BY role, score DESC, key""".stripMargin
    },

    "tpch_shipping_priority" ->
      s"""SELECT l_orderkey, CAST(sum($Rev) AS DOUBLE) AS revenue,
         | epoch_ms(o_orderdate) AS o_date_ms, o_orderpriority
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-06-01'
         |  AND l_shipdate > TIMESTAMP '1997-06-01'
         |GROUP BY l_orderkey, epoch_ms(o_orderdate), o_orderpriority
         |ORDER BY revenue DESC, o_date_ms, l_orderkey LIMIT 10""".stripMargin,

    "tpch_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(sum($Rev) AS DOUBLE) AS revenue, count(*) AS n_items
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-04-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "tpch_product_profit" ->
      s"""SELECT n_name AS nation,
         | CAST(year(o_orderdate) AS INTEGER) AS o_year,
         | CAST(sum($Rev) AS DOUBLE) AS sum_profit, count(*) AS n_items
         |FROM lineitem
         | JOIN part ON l_partkey = p_partkey
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN supplier ON l_suppkey = s_suppkey
         | JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%widget%'
         |GROUP BY n_name, year(o_orderdate)
         |ORDER BY nation, o_year DESC""".stripMargin,

    "tpch_large_orders" ->
      s"""WITH big AS (
         | SELECT l_orderkey,
         |  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
         | FROM lineitem GROUP BY l_orderkey
         | HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > $BigOrderQty)
         |SELECT c_custkey, c_name, o_orderkey,
         | epoch_ms(o_orderdate) AS o_date_ms, o_totalprice,
         | CAST(sum_qty AS DOUBLE) AS sum_qty
         |FROM orders
         | JOIN big ON o_orderkey = l_orderkey
         | JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "tpch_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > TIMESTAMP '1997-02-01')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "tpch_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "tpch_custdist" ->
      """WITH pc AS (
        | SELECT c_custkey, count(o_orderkey) AS c_count
        | FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        | GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM pc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "tpch_promo_share" ->
      s"""WITH j AS (
         | SELECT CAST(month(l_shipdate) AS INTEGER) AS mon, p_type,
         |  CAST(l_extendedprice AS DECIMAL(12,2))
         |   * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
         |   AS rev
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |   AND l_shipdate < TIMESTAMP '1998-01-01'),
         |a AS (SELECT mon,
         |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev END) AS DOUBLE)
         |    AS promo_rev,
         |  CAST(sum(rev) AS DOUBLE) AS total_rev
         | FROM j GROUP BY mon)
         |SELECT mon, promo_rev, total_rev,
         | ${Q.duckRnd("100.0 * promo_rev / total_rev", 6)} AS promo_pct
         |FROM a ORDER BY mon""".stripMargin,

    "tpch_top_supplier" ->
      """WITH sr AS (
        | SELECT l_suppkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |   AS DECIMAL(22,4)) AS total_rev
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |   AND l_shipdate < TIMESTAMP '1997-04-01'
        | GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
        |FROM sr JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM sr)
        |ORDER BY s_suppkey""".stripMargin,

    "tpch_small_qty_revenue" ->
      s"""WITH aq AS (
         | SELECT l_partkey AS ap_key,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS avg_qty
         | FROM lineitem GROUP BY l_partkey),
         |f AS (SELECT l_extendedprice FROM lineitem
         |  JOIN aq ON l_partkey = ap_key
         |  WHERE l_quantity < 0.2 * avg_qty),
         |a AS (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
         |    AS DOUBLE) AS sum_price, count(*) AS n_items FROM f)
         |SELECT ${Q.duckRnd("sum_price / 7.0", 6)} AS avg_yearly, n_items
         |FROM a""".stripMargin,

    "tpch_supplier_parts" ->
      """SELECT p_brand, p_type, p_size,
        | count(DISTINCT l_suppkey) AS supplier_cnt, count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13'
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
}
