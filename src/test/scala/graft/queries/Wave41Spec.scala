package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-41: data profiling + drift monitoring + readability. Each
  * query is re-derived from scratch on the fixture with a separate
  * (collect-side Scala) implementation, so the distributed shapes
  * are pinned by an independent oracle in-JVM as well as by DuckDB.
  */
class Wave41Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("inclusion_deps: true FKs hold, negative control is partial") {
    val rows = SparkEntry.queries("inclusion_deps")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(5))).toSeq
    assert(rows.size == 7)
    val byChild = rows.map(r => r._1 -> r).toMap
    // the TPC-H referential constraints hold on the generated data
    for (c <- Seq("lineitem.l_orderkey", "lineitem.l_partkey",
        "lineitem.l_suppkey", "orders.o_custkey", "customer.c_nationkey")) {
      assert(byChild(c)._4, s"$c must be a valid inclusion dependency")
      assert(byChild(c)._2 == byChild(c)._3, s"$c n_child == n_hit")
    }
    // from-scratch recount of one pair via except()
    val cD = Tables.lineitem(spark, sf).select($"l_orderkey").distinct()
    val pD = Tables.orders(spark, sf).select($"o_orderkey").distinct()
    val missing = cD.except(pD.withColumnRenamed("o_orderkey", "l_orderkey"))
      .count()
    val li = byChild("lineitem.l_orderkey")
    assert(li._2 - li._3 == missing, "except() recount diverges")
    // negative control: most customers never act in the events feed
    val neg = byChild("customer.c_custkey")
    assert(!neg._4 || neg._2 == 0L,
      "the negative control unexpectedly holds with data present")
  }

  test("fd_discovery: matches a from-scratch groupBy recount per candidate") {
    val rows = SparkEntry.queries("fd_discovery")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getBoolean(6)))).toMap
    assert(rows.size == 6)
    def recount(df: org.apache.spark.sql.DataFrame, det: String, dep: String) = {
      val m = df.filter(org.apache.spark.sql.functions.col(det).isNotNull)
        .select(org.apache.spark.sql.functions.col(det).cast("string"),
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.col(dep).cast("string"),
            org.apache.spark.sql.functions.lit("__null__")))
        .as[(String, String)].collect()
        .groupBy(_._1).map { case (_, vs) => vs.map(_._2).distinct.size }
      (m.size.toLong, m.count(_ > 1).toLong)
    }
    val cases = Seq(
      ("nation", "n_nationkey", "n_name", Tables.nation(spark, sf)),
      ("orders", "o_orderkey", "o_custkey", Tables.orders(spark, sf)),
      ("documents", "doc_id", "source", Tables.documents(spark, sf)),
      ("customer", "c_nationkey", "c_mktsegment", Tables.customer(spark, sf)),
      ("events", "user_id", "event_type", Tables.events(spark, sf)),
      ("lineitem", "l_orderkey", "l_partkey", Tables.lineitem(spark, sf)))
    for ((t, det, dep, df) <- cases) {
      val (g, v) = recount(df, det, dep)
      val got = rows((t, det, dep))
      assert(got._1 == g && got._2 == v && got._3 == (v == 0L),
        s"$t.$det->$dep: got $got, expected ($g, $v, ${v == 0L})")
    }
    // the declared true keys must actually hold on the fixture
    for (k <- Seq(("nation", "n_nationkey", "n_name"),
        ("orders", "o_orderkey", "o_custkey"),
        ("documents", "doc_id", "source")))
      assert(rows(k)._3, s"$k must hold")
  }

  test("histogram_drift: matches a from-scratch driver-side recomputation") {
    def rnd(x: Double, n: Int): Double = {
      val p = math.pow(10, n); math.floor(x * p + 0.5) / p
    }
    val ev = Tables.events(spark, sf)
      .filter("ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL")
      .selectExpr("event_type", "unix_millis(ts)", "CAST(value AS DOUBLE)")
      .as[(String, Long, Double)].collect()
    assert(ev.nonEmpty)
    val ms0 = ev.map(_._2).min; val ms1 = ev.map(_._2).max
    val v0 = ev.map(_._3).min; val v1 = ev.map(_._3).max
    val mid = (ms0 + ms1) / 2
    val w = (v1 - v0) / 10.0
    def bin(v: Double): Int =
      if (w == 0.0) 0 else math.min(math.floor((v - v0) / w), 9.0).toInt
    val expected = ev.groupBy(_._1).map { case (t, es) =>
      val a = es.filter(_._2 <= mid); val b = es.filter(_._2 > mid)
      val na = a.size.toLong; val nb = b.size.toLong
      val ca = a.groupBy(e => bin(e._3)).map { case (k, v) => k -> v.size }
      val cb = b.groupBy(e => bin(e._3)).map { case (k, v) => k -> v.size }
      // same decimal(18,9) snap: scale to exact Long units
      val terms = (0 until 10).map { i =>
        val p = (ca.getOrElse(i, 0) + 1).toDouble / (na + 10).toDouble
        val q = (cb.getOrElse(i, 0) + 1).toDouble / (nb + 10).toDouble
        (math.floor(math.abs(p - q) * 1e9 + 0.5).toLong,
          math.floor(math.sqrt(p * q) * 1e9 + 0.5).toLong)
      }
      val stv = terms.map(_._1).sum / 1e9
      val sbc = terms.map(_._2).sum / 1e9
      (t, na, nb, rnd(0.5 * stv, 6),
        rnd(math.sqrt(math.max(1.0 - sbc, 0.0)), 6))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("histogram_drift")(spark, sf)
      .select("event_type", "n_a", "n_b", "tvd", "hellinger")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    got.foreach { r =>
      assert(r._4 >= 0.0 && r._4 <= 1.0 && r._5 >= 0.0 && r._5 <= 1.0)
    }
  }

  test("flesch_readability: known-value formula and corpus recount") {
    // known value: "The cat sat." -> w=3, sent=1, syl=3
    // score = 206.835 - 1.015*3 - 84.6*1 = 119.19
    val df = Seq((0L, "The cat sat.", "en", "src", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("wave41_flesch")
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val one = SparkEntry.queries("flesch_readability")(spark, dir)
      .as[(String, Long, Double, Long, Double)].head()
    assert(one == (("src", 1L, 119.19, 0L, 0.0)), s"got $one")
    // corpus recount on the fixture via an independent Scala scorer
    def syl(s: String) = "[aeiouy]+".r.findAllIn(s.toLowerCase).size
    def sent(s: String) = math.max("[.!?]+".r.findAllIn(s).size, 1)
    def words(s: String) =
      s.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").trim
        .split("\\s+").count(_.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .filter("text IS NOT NULL").select("source", "text")
      .as[(String, String)].collect()
    val expected = docs
      .map { case (src, t) => (src, words(t), sent(t), syl(t)) }
      .filter(_._2 > 0)
      .map { case (src, w, s2, y) =>
        val sc = math.floor((206.835 - 1.015 * (w.toDouble / s2) -
          84.6 * (y.toDouble / w)) * 1e4 + 0.5) / 1e4
        (src, sc)
      }
      .groupBy(_._1).map { case (src, xs) =>
        // decimal(18,6) sum: exact in scaled-Long space
        val sum6 = xs.map(x => math.round(x._2 * 1e6)).sum
        val n = xs.size.toLong
        (src, n,
          math.floor((sum6 / 1e6) / n * 1e4 + 0.5) / 1e4,
          xs.count(_._2 < 30.0).toLong)
      }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("flesch_readability")(spark, sf)
      .select("source", "n_docs", "avg_flesch", "n_difficult")
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }
}
