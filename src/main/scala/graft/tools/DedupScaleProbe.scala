package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale diagnostic for the candidate→verify dedup pipeline: measures,
  * on a given corpus, the quantities that decide whether the exact
  * pair-verification joins (ngram_jaccard / minhash_containment) are
  * feasible — BEFORE running them. The round-14 100× sweep exhausted
  * 40+ GB of local disk inside the Σ_pairs |shingles| expansion even
  * after the round-13 shingle-id encoding shrank the per-row payload
  * to 24 bytes; this probe attributes that mass to its drivers
  * (candidate-pair count, per-doc candidate degree distribution,
  * star-vs-pairwise split, expansion row count) so the fix targets
  * the real quadratic term instead of the payload again.
  *
  * `sbt "runMain graft.tools.DedupScaleProbe [corpusDir]"` — prints
  * one JSON line; read-only (builds the memoized chain in-session,
  * releases it at exit).
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftSparkExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDocs = graft.Tables.documents(spark, dir).count()
    val dsh = graft.queries.LlmQueries.probeShingleIds(spark, dir)
    val shingleRows = dsh.count()
    val sizes = dsh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    val cand = graft.queries.LlmQueries.probePairTable(spark, dir)
    val nPairs = cand.count()
    // per-doc out-degree (doc_a side) — the distribution the
    // verification cap must bound
    val deg = cand.groupBy($"doc_a").agg(count(lit(1)).as("d"))
    val degStats = deg.agg(
      max($"d").as("max"), expr("percentile(d, 0.5)").as("p50"),
      expr("percentile(d, 0.99)").as("p99"), count(lit(1)).as("n")).head()
    // the actual verification intermediate: Σ over pairs of the
    // a-side shingle-set size (the first join's output row count);
    // the b-side co-group join is bounded by the same order
    val expansion = cand
      .join(sizes.select($"doc_id".as("doc_a"), $"n_sh"), Seq("doc_a"))
      .agg(sum($"n_sh")).head().getLong(0)
    graft.queries.LlmQueries.clearCaches(Some(spark))
    println(s"""{"metric":"dedup_scale_probe","dir":"$dir","n_docs":$nDocs,""" +
      s""""shingle_rows":$shingleRows,"candidate_pairs":$nPairs,""" +
      s""""deg_max":${degStats.getLong(0)},"deg_p50":${degStats.getDouble(1)},""" +
      s""""deg_p99":${degStats.getDouble(2)},"docs_with_candidates":${degStats.getLong(3)},""" +
      s""""expansion_rows":$expansion}""")
    spark.stop()
  }
}
