package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("cosine matches hand-computed values") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), 1.0),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), 0.0),
      (Seq(1.0f, 1.0f), Seq(1.0f, 0.0f), math.sqrt(0.5)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 0.0f), 0.0) // zero vector guarded
    ).toDF("a", "b", "want")
    val got = df.select(Similarity.cosine($"a", $"b").as("cos"), $"want").collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("shingles produce word n-grams; short docs yield empty") {
    val df = Seq(Tuple1(Seq("a", "b", "c", "d")), Tuple1(Seq("a", "b"))).toDF("w")
    val got = df.select(Similarity.shingles($"w", 3).as("sh"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty)
  }

  test("jaccard on distinct token sets") {
    val df = Seq((Seq("a", "b", "c", "a"), Seq("b", "c", "d"))).toDF("x", "y")
    val got = df.select(Similarity.jaccard($"x", $"y")).head.getDouble(0)
    assert(math.abs(got - 0.5) < 1e-12) // {b,c} / {a,b,c,d}
  }

  test("minhash: identical docs share all signatures, disjoint docs none") {
    val df = Seq(
      (1L, Seq("x y z", "y z w")),
      (2L, Seq("x y z", "y z w")),
      (3L, Seq("p q r"))
    ).toDF("id", "sh")
    val sig = df.select($"id",
      (0 until 4).map(Similarity.minhash($"sh", _)).toArray.toSeq
        .reduce(concat(_, _)).as("sig"))
      .as[(Long, String)].collect().toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("column-API band keys equal the relational LSH pipeline's") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val colApi = docs
      .select($"doc_id", Similarity.shingles(TextFunctions.tokens($"text"), 3).as("sh"))
      .filter(size($"sh") > 0)
      .select($"doc_id",
        posexplode(array((0 until 4).map(b =>
          Similarity.bandKey($"sh", 2 * b, 2)): _*)).as(Seq("band", "key")))
    val relational = graft.queries.LlmQueries.bandTable(spark, dir)
    assert(colApi.exceptAll(relational).isEmpty)
    assert(relational.exceptAll(colApi).isEmpty)
  }

  test("higher-order dot/cosine equal the codegen'd FloatVecDot path") {
    val dir = "/root/testdata/sf0.001"
    graft.plans.VecFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, dir).limit(200)
    val maxDiff = e.select(
      abs(Similarity.dot($"embedding", $"embedding")
        - graft.plans.VecFunctions.vecDot($"embedding", $"embedding")).as("d"))
      .agg(max($"d")).head.getDouble(0)
    assert(maxDiff == 0.0) // same double ops in the same order
  }

  test("approx_count_distinct stays within 10% of exact on lineitem") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val exact = li.select(countDistinct($"l_partkey")).head.getLong(0).toDouble
    val approx = li.select(approx_count_distinct($"l_partkey")).head.getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.10)
  }

  test("approx percentiles stay within rank tolerance of exact on events") {
    // percentile_approx(accuracy = 1000) guarantees rank error
    // <= n/1000 per group; verify by locating each sketch answer's
    // RANK among the group's sorted values — a value-space bound would
    // be data-dependent, rank is the contract the sketch makes.
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf).select($"event_type", $"value")
    val groups = ev.select($"event_type").distinct().as[String].collect()
    // the query self-reports per-group within-bound flags (so the
    // driver's oracle can hash-check them); every flag must hold and
    // n must equal an exact recount
    val reported = graft.SparkEntry.queries("agg_approx_percentile")(spark, sf)
      .as[(String, Long, Boolean, Boolean)].collect()
      .map { case (g, n, ok50, ok95) => g -> ((n, ok50, ok95)) }.toMap
    assert(reported.keySet == groups.toSet)
    // independent re-derivation: rerun the raw sketch here and locate
    // its answers' RANKS among the sorted group values — the same
    // bound the query computes, but via a driver-side sort instead of
    // the query's count-based window, so a bug in the query's rank
    // arithmetic cannot vacuously confirm itself
    val approx = ev
      .groupBy($"event_type")
      .agg(percentile_approx($"value", array(lit(0.5), lit(0.95)), lit(1000)).as("ps"))
      .as[(String, Seq[Double])].collect().toMap
    for (g <- groups) {
      val vals = ev.filter($"event_type" === g).select($"value")
        .as[Double].collect().sorted
      val n = vals.length
      val (nRep, ok50, ok95) = reported(g)
      assert(nRep == n && ok50 && ok95,
        s"group $g: query reported n=$nRep ok50=$ok50 ok95=$ok95 (exact n=$n)")
      for ((q, got) <- Seq(0.5, 0.95).zip(approx(g))) {
        val rank = vals.count(_ <= got).toDouble / n
        assert(math.abs(rank - q) <= math.max(0.002, 2.0 / n),
          f"group $g q=$q: sketch value $got sits at rank $rank%.4f")
      }
    }
  }
}
