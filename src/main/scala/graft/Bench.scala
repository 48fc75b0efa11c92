package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract → BENCH_r{N}.json).
  *
  * Each query is forced with a `noop`-format write, not `count()`:
  * under count(), ColumnPruning deletes every projection expression
  * (regexps, UDFs, vector math) and EliminateSorts drops ORDER BYs, so
  * scalar-heavy queries would measure only a parquet row count. The
  * noop sink evaluates every output column of every row and discards
  * them — the closest local analog to writing results out. AQE stays
  * on (default) so skewed shuffles re-plan as they would on a cluster.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftSparkExtensions) // vec_dot + optimizer rules
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (codegen, parquet reader paths) so the first
    // measured query doesn't absorb session startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).collect()
    // A failed query records -1 (sentinel) instead of its partial
    // elapsed time, and lands in a "failed" list — a crash must not
    // silently understate the total or hide from the recorded JSON.
    //
    // Run order isolates the memoized-table family: the dedup/corpus
    // queries share seven persisted tables (shingles, signatures,
    // bands, terms, cluster labels — see LlmQueries.memoized), and in
    // a plain alphabetical sweep those cached blocks sat in storage
    // memory while UNRELATED queries ran, costing map_funcs/date_funcs/
    // dedup_anti_join a 3-7× GC-pressure regression in round 2. Now
    // every cache-free query runs first against an empty storage pool,
    // the family runs last (producers before consumers, so each
    // table's build cost lands on its natural owner), and the caches
    // are dropped as soon as the family finishes.
    val corpusFamily = Seq(
      "minhash_dedup", "minhash_est", "simhash", "simhash_neardup",
      "ngram_jaccard", "fuzzy_match", "graph_degree_dist", "dedup_incremental",
      "contamination_check",
      "tfidf_topk", "bm25_topk",
      "dedup_clusters", "dedup_stats", "dedup_keep_best")
    // A renamed query silently vanishing from this list would shrink
    // bench coverage without an error — fail loudly on drift instead.
    val drifted = corpusFamily.filterNot(SparkEntry.queries.contains)
    require(drifted.isEmpty,
      s"corpusFamily names no longer in SparkEntry.queries: ${drifted.mkString(", ")}")
    // SPARK_GRAFT_ONLY=a,b,c — optional local-iteration subset filter;
    // the driver never sets it, so driver runs always sweep everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered =
      (SparkEntry.queries.toSeq.sortBy(_._1).filterNot(q => corpusFamily.contains(q._1)) ++
        corpusFamily.flatMap(n => SparkEntry.queries.get(n).map(n -> _)))
        .filter(q => only.forall(_.contains(q._1)))
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
      }
    }
    graft.queries.LlmQueries.clearCaches(Some(spark))
    // Locale.ROOT: the default-locale f-interpolator would render
    // comma decimal separators (invalid JSON) on e.g. de_DE JVMs
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalStr = String.format(java.util.Locale.ROOT, "%.3f", Double.box(total))
    val full =
      s"""{"metric":"total","value":$totalStr,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(full)
    // The harness that records this output keeps only the LAST ~2000
    // characters of stdout, and with ~100 queries the full line above
    // is longer than that — its head (including the total) gets cut,
    // so nothing parses. Persist the full line to a file, then print a
    // compact summary line (same shape, slowest-15 queries only) that
    // fits whole inside the tail window and parses on its own.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LOCAL_LATEST.json"),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not persist full results: ${e.getMessage}") }
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(15).map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$totalStr,"unit":"sec","n_queries":${results.size},"queries":$slowest,"queries_truncated_to":"slowest 15 of ${results.size}; full map in BENCH_LOCAL_LATEST.json and the long line above","failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
