package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Twenty-first-wave TPC-H shapes. Arbiters recompute the headline
  * invariants driver-side from the raw tables (not via SQL), and the
  * plan tests pin the scale claims: TakeOrdered top-N finals,
  * broadcast dimension hops, and the Q3 semi-join prune.
  */
class TpchSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("tpch_large_orders: every row's quantity total exceeds the threshold and tallies") {
    val rows = SparkEntry.queries("tpch_large_orders")(spark, sf)
      .select($"o_orderkey", $"sum_qty").as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    val qty = graft.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_quantity").as[(Long, Double)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    rows.foreach { case (ok, sq) =>
      assert(sq > 300.0, s"order $ok under threshold")
      assert(math.abs(qty(ok) - sq) < 1e-6, s"order $ok tally")
    }
  }

  test("tpch_shipping_priority: revenue ordering is monotone and the segment filter held") {
    val df = SparkEntry.queries("tpch_shipping_priority")(spark, sf)
    val revs = df.select($"revenue").as[Double].collect()
    assert(revs.nonEmpty && revs.length <= 10)
    assert(revs.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    // every surviving order must belong to a BUILDING-segment customer
    val keys = df.select($"l_orderkey").as[Long].collect().toSet
    val seg = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf),
        $"o_custkey" === $"c_custkey")
      .filter($"o_orderkey".isin(keys.toSeq: _*))
      .select($"c_mktsegment").as[String].collect()
    assert(seg.nonEmpty && seg.forall(_ == "BUILDING"))
  }

  test("tpch_supplier_parts: distinct-supplier count bounded by item count and true supplier pool") {
    val rows = SparkEntry.queries("tpch_supplier_parts")(spark, sf)
      .as[(String, String, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    val nSupp = graft.Tables.supplier(spark, sf).count()
    rows.foreach { case (brand, _, _, cnt, n) =>
      assert(brand != "Brand#13")
      assert(cnt <= n && cnt <= nSupp)
    }
  }

  test("top-N finals plan as TakeOrdered; dimension hops broadcast") {
    for (q <- Seq("tpch_shipping_priority", "tpch_returned_items",
        "tpch_large_orders")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(p.contains("TakeOrderedAndProject"), s"$q: ${p.take(800)}")
      assert(p.contains("BroadcastHashJoin"), s"$q: ${p.take(800)}")
    }
  }

  test("tpch_custdist: zero-order customers survive and the distribution tallies") {
    val rows = SparkEntry.queries("tpch_custdist")(spark, sf)
      .as[(Long, Long)].collect()
    assert(rows.map(_._2).sum == graft.Tables.customer(spark, sf).count(),
      "distribution must cover every customer exactly once")
    // full driver-side recompute — including customers with no orders
    // (the left-outer class; the fixture may or may not populate it)
    val perCust = graft.Tables.orders(spark, sf)
      .select($"o_custkey").as[Long].collect()
      .groupBy(identity(_)).map { case (k, v) => k -> v.size.toLong }
    val custs = graft.Tables.customer(spark, sf)
      .select($"c_custkey").as[Long].collect()
    val expect = custs.map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity(_)).map { case (k, v) => k -> v.size.toLong }
    assert(rows.toMap == expect)
  }

  test("tpch_order_priority plans the EXISTS as a semi join") {
    val p = SparkEntry.queries("tpch_order_priority")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), p.take(800))
  }

  test("tpch_top_supplier: winners carry the true maximum revenue") {
    import org.apache.spark.sql.functions._
    val sr = graft.Tables.lineitem(spark, sf)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum($"l_extendedprice".cast("decimal(12,2)") *
        (lit(1).cast("decimal(4,2)") - $"l_discount".cast("decimal(4,2)")))
        .cast("double").as("r"))
      .as[(Long, Double)].collect()
    val mx = sr.map(_._2).max
    val winners = sr.filter(_._2 == mx).map(_._1).toSet
    val got = SparkEntry.queries("tpch_top_supplier")(spark, sf)
      .as[(Long, String, Double)].collect()
    assert(got.map(_._1).toSet == winners)
    got.foreach { case (_, _, r) => assert(math.abs(r - mx) < 1e-6) }
  }

  test("tpch_forecast_revenue equals a driver-side filtered sum") {
    val li = graft.Tables.lineitem(spark, sf)
      .select($"l_shipdate".cast("string"), $"l_discount", $"l_quantity",
        $"l_extendedprice")
      .as[(String, Double, Double, Double)].collect()
    val sel = li.filter { case (dt, disc, qty, _) =>
      dt >= "1997-01-01" && dt < "1998-01-01" &&
        disc >= 0.05 && disc <= 0.07 && qty < 24
    }
    val expect = sel.map { case (_, disc, _, price) =>
      BigDecimal(price).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        BigDecimal(disc).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val r = SparkEntry.queries("tpch_forecast_revenue")(spark, sf)
      .as[(Double, Long)].collect().head
    assert(r._2 == sel.length)
    assert(math.abs(r._1 - expect) < 1e-9)
  }

  test("tpch_shipping_priority: customer prune is a broadcast semi join") {
    val p = SparkEntry.queries("tpch_shipping_priority")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), p.take(1200))
  }
}
