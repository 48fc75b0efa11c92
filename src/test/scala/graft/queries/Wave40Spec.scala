package graft.queries

import graft.{SparkEntry, SparkSpecBase, Tables}

/** Wave-40: dynamic time warping. The replica is the TEXTBOOK O(n²)
  * DP (D[i][j] = c[i][j] + min of the three predecessors) — pinning
  * that the engine's min-plus closed-form row construction equals
  * the classic recurrence, on the real fixture and on constructed
  * series that exercise warping.
  */
class Wave40Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def dtw(a: Seq[Long], b: Seq[Long]): Long = {
    val n = a.size
    val m = b.size
    val d = Array.ofDim[Long](n, m)
    for (i <- 0 until n; j <- 0 until m) {
      val c = math.abs(a(i) - b(j))
      d(i)(j) = c + ((i, j) match {
        case (0, 0) => 0L
        case (0, _) => d(0)(j - 1)
        case (_, 0) => d(i - 1)(0)
        case _ => math.min(d(i - 1)(j), math.min(d(i)(j - 1), d(i - 1)(j - 1)))
      })
    }
    d(n - 1)(m - 1)
  }

  test("dtw_distance: matches the textbook DP on the fixture") {
    val cells = Tables.events(spark, sf)
      .filter("ts IS NOT NULL AND event_type IS NOT NULL")
      .selectExpr("event_type AS t", "unix_millis(ts) DIV 86400000 AS day")
      .groupBy("t", "day").count()
      .as[(String, Long, Long)].collect().toSeq
    val d0 = cells.map(_._2).min
    val bounded = cells.filter(_._2 < d0 + 366L)
    val d1 = bounded.map(_._2).max
    val spine = d0 to d1
    val series = bounded.groupBy(_._1).map { case (t, cs) =>
      val m = cs.map(c => c._2 -> c._3).toMap
      t -> spine.map(dd => m.getOrElse(dd, 0L))
    }
    val types = series.keys.toSeq.sorted
    val expected = (for {
      a <- types; b <- types if a < b
    } yield (a, b, spine.size, dtw(series(a), series(b)))).sortBy(r => (r._1, r._2))
    val rows = SparkEntry.queries("dtw_distance")(spark, sf)
      .as[(String, String, Int, Long)].collect().toSeq
    assert(rows.nonEmpty, "fixture must produce type pairs")
    assert(rows == expected,
      s"first diff: ${rows.zip(expected).find(p => p._1 != p._2)}")
  }

  test("dtw properties on constructed series: identity, shift-warping, symmetry bound") {
    // identical series -> 0
    assert(dtw(Seq(1L, 5L, 3L, 8L), Seq(1L, 5L, 3L, 8L)) == 0L)
    // a one-step time shift is absorbed by warping far more cheaply
    // than the pointwise L1 distance pays for it
    val x = Seq(0L, 0L, 10L, 0L, 0L, 0L)
    val y = Seq(0L, 0L, 0L, 10L, 0L, 0L)
    val l1 = x.zip(y).map(p => math.abs(p._1 - p._2)).sum
    assert(dtw(x, y) < l1, s"warping must beat L1: ${dtw(x, y)} vs $l1")
    assert(dtw(x, y) == 0L, "pure shift of one spike warps to zero")
    // and the engine's construction agrees on these series too: run
    // the closed-form via a tiny in-Spark frame
    val df = Seq((x, y)).toDF("va", "vb")
    val viaEngine = df.selectExpr(
      s"""element_at(aggregate(slice(va, 2, size(va) - 1),
         |  transform(sequence(1, size(vb)), j ->
         |    aggregate(slice(transform(vb, x -> abs(element_at(va, 1) - x)), 1, j),
         |      CAST(0 AS BIGINT), (acc, y) -> acc + y)),
         |  (prev, ai) -> transform(sequence(1, size(vb)), j ->
         |    aggregate(slice(transform(vb, x -> abs(ai - x)), 1, j),
         |      CAST(0 AS BIGINT), (acc, y) -> acc + y)
         |    + array_min(slice(transform(sequence(1, size(vb)), k ->
         |        IF(k = 1, element_at(prev, 1),
         |           least(element_at(prev, k), element_at(prev, k - 1)))
         |        - IF(k = 1, CAST(0 AS BIGINT),
         |             aggregate(slice(transform(vb, x -> abs(ai - x)), 1, k - 1),
         |               CAST(0 AS BIGINT), (acc, y) -> acc + y))),
         |      1, j)))), size(vb)) AS dtw""".stripMargin.replace("\n", " "))
      .as[Long].head()
    assert(viaEngine == dtw(x, y), "closed-form row construction diverges from the DP")
  }
}
