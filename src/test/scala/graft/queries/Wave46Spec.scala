package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Wave-46: DBSCAN roles, leakage-safe churn labels, touch
  * attribution — re-derived from scratch driver-side plus constructed
  * known-answer fixtures.
  */
class Wave46Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rnd(x: Double, k: Int) = {
    val p = math.pow(10, k); math.floor(x * p + 0.5) / p
  }

  test("dbscan_core: matches a from-scratch density walk") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        d += a(i).toDouble * b(i).toDouble
        i += 1
      }
      i = 0
      while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
      i = 0
      while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
      val nn = math.sqrt(na) * math.sqrt(nb)
      if (nn == 0) 0.0 else d / nn
    }
    val pairs = for {
      a <- vecs; b <- vecs
      if a._3 == b._3 && a._1 < b._1 &&
        rnd(cos(a._2, b._2), 6) > 0.25
    } yield (a._1, b._1)
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val core = vecs.map(_._1).filter(v => deg.getOrElse(v, 0L) >= 3L).toSet
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expected = vecs.map(_._1).sorted.map { v =>
      val n = deg.getOrElse(v, 0L)
      val role =
        if (core(v)) "core"
        else if (adj.getOrElse(v, Set.empty).exists(core)) "border"
        else "noise"
      (v, n, role)
    }.toSeq
    val got = SparkEntry.queries("dbscan_core")(spark, sf)
      .as[(Long, Long, String)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    assert(got.exists(_._3 == "core"), "fixture must have dense cores")
  }

  test("churn_labels: leakage-safe split on the fixture") {
    val ev = Tables.events(spark, sf)
      .filter("user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL")
      .selectExpr("user_id", "event_type", "unix_millis(ts)")
      .as[(Long, String, Long)].collect()
    val cutoff = ev.map(_._3).max - 7L * 86400000L
    val post = ev.filter(_._3 > cutoff).map(_._1).toSet
    val expected = ev.filter(_._3 <= cutoff).groupBy(_._1).map {
      case (u, xs) =>
        (u, xs.length.toLong,
          xs.count(_._2 == "click").toLong,
          xs.count(_._2 == "view").toLong,
          xs.count(_._2 == "purchase").toLong,
          xs.map(_._3 / 86400000L).distinct.length.toLong,
          (cutoff - xs.map(_._3).max) / 86400000L,
          !post.contains(u))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("churn_labels")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    got.foreach(r => assert(r._7 >= 0L, s"recency measured at cutoff: $r"))
  }

  test("attribution_touch: constructed known-answer + fixture recount") {
    // constructed: view -> click -> purchase inside the window, and a
    // touchless purchase that must be excluded
    val h = 3600000L
    val dir = tmpDir("wave46_attr")
    Seq(
      (1L, 0L * h, 7L, "view", 1.0, "{}"),
      (2L, 1L * h, 7L, "click", 1.0, "{}"),
      (3L, 2L * h, 7L, "purchase", 1.0, "{}"),
      (4L, 500L * h, 8L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ms", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"ms" * 1000))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("attribution_touch")(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(rows == Seq(("click", 0L, 1L), ("view", 1L, 0L)), s"got $rows")
    // fixture recount
    val ev = Tables.events(spark, sf)
      .filter("user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL")
      .selectExpr("user_id", "event_id", "event_type", "unix_millis(ts)")
      .as[(Long, Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val credits = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for ((u, xs) <- byUser; p <- xs if p._3 == "purchase") {
      val touches = xs.filter(t => t._3 != "purchase" &&
        t._4 >= p._4 - 7L * 86400000L && t._4 <= p._4 - 1L)
      if (touches.nonEmpty) {
        val ftMs = touches.map(_._4).min
        val ltMs = touches.map(_._4).max
        val ft = touches.filter(_._4 == ftMs).minBy(_._2)._3
        val lt = touches.filter(_._4 == ltMs).maxBy(_._2)._3
        val (f0, l0) = credits.getOrElse(ft, (0L, 0L))
        credits(ft) = (f0 + 1, l0)
        val (f1, l1) = credits.getOrElse(lt, (0L, 0L))
        credits(lt) = (f1, l1 + 1)
      }
    }
    val expected = credits.toSeq.map(c => (c._1, c._2._1, c._2._2))
      .sortBy(_._1)
    val got = SparkEntry.queries("attribution_touch")(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }
}
