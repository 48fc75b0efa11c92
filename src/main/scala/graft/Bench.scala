package graft

import org.apache.spark.sql.SparkSession

/** Shared between [[Bench]] and [[graft.tools.ScaleSweep]]: the
  * memoized-family run order, its cache-release schedule, and the
  * band-bucket degeneracy guard. One definition, two mains — a new
  * memoized table registered here reaches both harnesses, instead of
  * a forgotten copy silently reinstating the storage-pressure
  * distortion the release lifecycle exists to prevent.
  */
object BenchShared {

  /** Queries that share the memoized/persisted table family
    * (LlmQueries.memoized), in producers-before-consumers order: run
    * them LAST (cache-free queries first against an empty storage
    * pool) so each table's build cost lands on its natural owner.
    * knn_pq joined when its codebook became a persisted model
    * artifact (pq_codebook).
    */
  val corpusFamily: Seq[String] = Seq(
    "minhash_dedup", "minhash_b_bit", "minhash_est", "simhash",
    "simhash_neardup", "simhash_recall_eval",
    "ngram_jaccard", "minhash_containment", "cross_corpus_pairs",
    "pagerank_lite", "dup_ngram_frac", "fuzzy_match",
    "graph_degree_dist", "dedup_incremental", "contamination_check",
    "boilerplate_ngrams", "lsh_recall_eval", "jaccard_band_sweep",
    "ngram_novelty",
    "tfidf_topk", "rocchio_expand", "bm25_topk", "tokenizer_apply", "token_diversity",
    "heavy_hitters", "cms_heavy_hitters", "rrf_fusion",
    "collocation_pmi", "vocab_coverage",
    "vocab_growth", "zipf_profile", "maxsim_rerank",
    // term_rows consumers run before unigram_surprise (its release
    // point); candidate_pairs consumers before dedup_clusters (same)
    "bpe_merges", "bpe_apply", "bpe_decode", "taxonomy_classify", "chi2_terms",
    "good_turing", "js_divergence", "unigram_surprise",
    "triangle_count", "kcore_peel", "bfs_hops", "jaccard_link_pred",
    // candidate_pairs consumers — must run before dedup_clusters (its
    // release point). fs_linkage and graph_modularity joined in round
    // 12: both consumed the chain from the ALPHABETICAL phase before,
    // which left the corpus-scale pair relation resident across ~100
    // unrelated queries (the h–j wall-clock wall the 354-query bench
    // surfaced — storage pressure, not per-query regressions).
    "fs_linkage", "graph_modularity", "blocking_quality",
    "dedup_clusters", "dedup_stats", "golden_record", "dedup_keep_best",
    "curate_corpus",
    "semdedup_clusters",
    // winnow_fps consumers: fingerprint stats first (cheap reader),
    // then the cross-doc match join, then the span cut (release point)
    "winnow_fingerprint", "winnow_matches", "substring_dedup_cut",
    "knn_pq", "knn_ivfpq", "knn_rerank", "kmeans_assign",
    "label_propagation", "kmeans_iterate")

  /** Cache lifecycle: each memoized table is released right after its
    * LAST consumer in [[corpusFamily]] order, so peak storage is one
    * or two live tables, not all of them accreted to end-of-run. A
    * released table a later query still wants is simply rebuilt.
    */
  val releaseAfter: Map[String, Seq[String]] = Map(
    // corpus-scale pair relation with a single consumer (eb_cells, by
    // contrast, is |sources|-bounded and stays cached)
    "assoc_rules" -> Seq("basket_items"),
    "minhash_est" -> Seq("minhash_sigs"),
    // shingle_ids feeds exactly the two exact-verification joins
    "minhash_containment" -> Seq("shingle_ids"),
    "simhash_recall_eval" -> Seq("simhash"),
    "dup_ngram_frac" -> Seq("shingles"),
    "dedup_incremental" -> Seq("bands"),
    "ngram_novelty" -> Seq("shingles_distinct"),
    "bpe_decode" -> Seq("bpe_words", "bpe_toks"),
    "unigram_surprise" -> Seq("term_rows"),
    "dedup_clusters" -> Seq("candidate_pairs"),
    "knn_rerank" -> Seq("pq_codebook"),
    "kmeans_iterate" -> Seq("ivf_cells"),
    "substring_dedup_cut" -> Seq("winnow_fps"))

  private def maxBucket(grouped: org.apache.spark.sql.DataFrame): Long =
    grouped.agg(org.apache.spark.sql.functions.max("count")).head() match {
      case r if r.isNullAt(0) => 0L // empty table
      case r => r.getLong(0)
    }

  /** Band-bucket health guard: the documented LSH/SimHash hazard is a
    * degenerate band key whose bucket holds a large corpus fraction
    * (Σ bucket² blows up the candidate self-join). Measures the
    * largest bucket while the tables are still cached, so the hazard
    * is caught at bench scale, not at 100×.
    */
  def recordBucketStats(
      spark: SparkSession, sfDir: String, tag: String,
      into: scala.collection.mutable.Map[String, Long]): Unit = tag match {
    case "bands" =>
      val b = graft.queries.LlmQueries.bandTable(spark, sfDir)
      val counts = b.groupBy("band", "key").count()
      into("lsh_max_band_bucket") = maxBucket(counts)
      // how many band keys tripped the candidatePairs mega-bucket
      // guard this run (0 = every bucket was pairwise-verified)
      into("lsh_capped_buckets") = counts
        .filter(org.apache.spark.sql.functions.col("count") >
          graft.queries.LlmQueries.LshBucketCap).count()
    case "simhash" =>
      val bands = graft.queries.LlmQueries.simhashBands(spark, sfDir)
      into("simhash_max_band_bucket") = maxBucket(bands.groupBy("band", "key").count())
    case _ => ()
  }

  /** Release `tag`'s cache after optionally recording its bucket
    * guard. Guard-rail work must never abort a sweep: probe failures
    * log and move on (NonFatal only — a VM error must still kill the
    * run), and the release runs in the finally so a failed probe
    * cannot leave the table cached.
    */
  def guardAndRelease(
      spark: SparkSession, sfDir: String, tag: String,
      into: scala.collection.mutable.Map[String, Long],
      label: String): Unit = {
    try recordBucketStats(spark, sfDir, tag, into)
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[$label] bucket guard for '$tag' failed: ${e.getMessage}")
    } finally graft.queries.LlmQueries.release(spark, sfDir, tag)
  }

  /** Drain the listener bus so queued task-end events settle before a
    * metric snapshot. A timeout (the bus's internal 10 s bound) is a
    * bookkeeping lag, never a failure — log and continue.
    */
  def drainQuiet(spark: SparkSession): Unit =
    try org.apache.spark.GraftListenerBridge.drainListenerBus(spark.sparkContext)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        System.err.println("[bench] listener-bus drain timed out; cpu/gc attribution may lag")
    }
}

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
    // Subset runs (SPARK_GRAFT_ONLY) record no gate numbers, so the
    // startup mitigations below — which exist to keep the GATE wall
    // numbers clean — are skipped for them (ADVICE r13: the
    // unconditional sync blocked dev iterations on whatever unrelated
    // dirty pages the box had).
    val isSubsetRun = sys.env.contains("SPARK_GRAFT_ONLY")
    // Writeback mitigation, part 1 (VERDICT r13 item 2): the driver's
    // own t2-then-bench sequence bypasses scripts/verify_all.sh, so
    // its Verify dump survives to this point as page-cache residency
    // (and possibly dirty pages) that taxed disk-touching queries in
    // KERNEL time two driver rounds running (r12 sys/user 1.9+, r13
    // 1.86 — e.g. jaccard_band_sweep 569.6 s sys vs 33.4 s user).
    // Verify now drops its own dump from the cache at exit (the
    // complete fix for any dump location); deleting any verify dump
    // dirs still under OUR target/ is the belt-and-braces half —
    // unlinking a file frees its page-cache pages unconditionally,
    // dirty or clean. Only known scratch output is touched, never
    // inputs. SPARK_GRAFT_KEEP_DUMPS=1 skips (e.g. a compare still
    // wants them).
    if (!isSubsetRun && !sys.env.contains("SPARK_GRAFT_KEEP_DUMPS")) {
      val target = java.nio.file.Paths.get("target")
      val stale: Seq[java.nio.file.Path] =
        if (!java.nio.file.Files.isDirectory(target)) Nil
        else {
          val s = java.nio.file.Files.list(target)
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala
              .filter(_.getFileName.toString.startsWith("verify_out"))
              .toSeq
          } finally s.close()
        }
      stale.foreach { dir =>
        try {
          val walk = java.nio.file.Files.walk(dir)
          try {
            import scala.jdk.CollectionConverters._
            walk.sorted(java.util.Comparator.reverseOrder())
              .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
          } finally walk.close()
          System.err.println(s"[bench] deleted stale verify dump: $dir")
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] could not delete $dir: ${e.getMessage}")
        }
      }
    }
    // Writeback mitigation, part 2 (VERDICT r12 item 2): a blocking
    // `sync` forces any remaining dirty-page writeback to complete
    // BEFORE the timed region — outside every per-query wall number —
    // while leaving the (clean) page cache warm, unlike a drop_caches
    // which would cool the sf parquet reads. Recorded as sync_sec so
    // the record shows how much debt was flushed. SPARK_GRAFT_NO_SYNC=1
    // skips it (A/B runs); subset runs skip it too (ADVICE r13).
    val syncSec: Double =
      if (isSubsetRun || sys.env.contains("SPARK_GRAFT_NO_SYNC")) -1.0
      else {
        val t0 = System.nanoTime()
        try {
          val p = new ProcessBuilder("sync").start()
          p.waitFor()
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] sync failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events may ship TIMESTAMP(NANOS)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftSparkExtensions) // vec_dot + optimizer rules
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.BoundedWindow.muteNoPartitionWarning()
    // Warm the JVM (codegen, parquet reader paths) so the first
    // measured query doesn't absorb session startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).collect()
    // A failed query records -1 (sentinel) instead of its partial
    // elapsed time, and lands in a "failed" list — a crash must not
    // silently understate the total or hide from the recorded JSON.
    //
    // Run order isolates the memoized-table family: the dedup/corpus
    // queries share the persisted tables (shingles, signatures,
    // bands, terms, cluster labels — see LlmQueries.memoized), and in
    // a plain alphabetical sweep those cached blocks sat in storage
    // memory while UNRELATED queries ran, costing map_funcs/date_funcs/
    // dedup_anti_join a 3-7× GC-pressure regression in round 2. Now
    // every cache-free query runs first against an empty storage pool,
    // the family runs last (producers before consumers, so each
    // table's build cost lands on its natural owner), and the caches
    // are dropped as soon as the family finishes.
    val corpusFamily = BenchShared.corpusFamily
    // A renamed query silently vanishing from this list would shrink
    // bench coverage without an error — fail loudly on drift instead.
    val drifted = corpusFamily.filterNot(SparkEntry.queries.contains)
    require(drifted.isEmpty,
      s"corpusFamily names no longer in SparkEntry.queries: ${drifted.mkString(", ")}")
    // SPARK_GRAFT_ONLY=a,b,c — optional local-iteration subset filter;
    // the driver never sets it, so driver runs always sweep everything.
    // Names that match no query fail loudly: a typo must not yield an
    // empty run printing "value":0 (the same silent-shrinkage mode the
    // corpusFamily drift guard above exists for).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { o =>
      val unknown = o.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names no such queries: ${unknown.mkString(", ")}")
    }
    val ordered =
      (SparkEntry.queries.toSeq.sortBy(_._1).filterNot(q => corpusFamily.contains(q._1)) ++
        corpusFamily.flatMap(n => SparkEntry.queries.get(n).map(n -> _)))
        .filter(q => only.forall(_.contains(q._1)))
    // Cache lifecycle + band-bucket guard: shared with ScaleSweep via
    // BenchShared (storage pressure taxes every later query with GC;
    // on a loaded machine that tax measured 3-6× on family members in
    // round 4).
    val releaseAfter = BenchShared.releaseAfter
    val bucketStats = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    // Attribution: which query paid each one-time memoized build. The
    // family keeps shifting build costs between members across code
    // changes; without this, per-query deltas are unreadable.
    val cacheBuilds = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    // Contention-immune companion metrics: executor task CPU time and
    // task JVM GC time per query, summed by a listener and snapshotted
    // around each run (the bus is drained between queries so events
    // land on the query that produced them). Wall time alone cannot
    // distinguish "this query got slower" from "the machine was busy":
    // real work moves BOTH wall and cpu; external contention moves
    // wall while cpu stays flat; GC pressure shows up in gc. Round 5's
    // unexplained same-code wall-time spikes motivated recording all
    // three.
    val cpuNsTotal = new java.util.concurrent.atomic.AtomicLong(0L)
    val gcMsTotal = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          cpuNsTotal.addAndGet(m.executorCpuTime)
          gcMsTotal.addAndGet(m.jvmGCTime)
        }
      }
    })
    val cpuSec = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val gcSec = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // Process-state instrumentation (round-12, VERDICT r11 item 1b):
    // the r11 bench of record measured bpe_apply at 168 s driver-side
    // vs 3.5 s locally — single-threaded cpu with zero gc, i.e. a
    // process-state pathology (codegen/JIT degradation in a long-lived
    // session) the wall/cpu/gc record could not attribute. Record, per
    // query: Catalyst codegen compilations (count delta of the public
    // CodegenMetrics histogram) and JIT compiler time (CompilationMXBean
    // delta, ms — rises when the JVM is still compiling, collapses to 0
    // when CodeCache is full and the JIT has shut off); at end of run:
    // CodeCache pool occupancy, so "generated code ran interpreted
    // because the cache filled" is visible in the record.
    val cgHist = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
    val jitBean = java.lang.management.ManagementFactory.getCompilationMXBean
    val jitSupported = jitBean != null && jitBean.isCompilationTimeMonitoringSupported
    val cgCompiles = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val jitMs = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    // user/sys CPU split for the WHOLE process (round-12): the gate
    // bench reproduced the r11 driver pathology locally — the same
    // queries burned 12-130× more cpu_sec post-churn with gc = 0 and
    // a healthy CodeCache, and the affected set (xml_scan's scratch
    // write, the persisted-cache dedup family, knn_rerank's codebook
    // read) all touch DISK. executorCpuTime conflates user+sys, so
    // kernel time (page-cache writeback/reclaim under a dirty cache)
    // is indistinguishable from recompute. /proc/self/stat utime/
    // stime (Linux USER_HZ=100) splits them: a post-churn run whose
    // inflation sits in sys_sec is an OS-state story, not a plan
    // regression. (-1, -1) on non-Linux.
    def procTimes(): (Long, Long) = try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/self/stat")))
      val rest = s.substring(s.lastIndexOf(')') + 2).split(" ")
      (rest(11).toLong, rest(12).toLong)
    } catch { case _: Throwable => (-1L, -1L) }
    val procUserSec = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val procSysSec = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val results = ordered.map { case (name, fn) =>
      val tagsBefore = graft.queries.LlmQueries.memoizedTags(spark)
      // drain BEFORE the snapshot, not just after the query body:
      // straggler events from the previous query's bucket-guard jobs
      // (which run after its cpu read) or from a failed query (whose
      // in-flight drain never ran) must settle into the baseline, not
      // get charged to this query. A drain timeout is a bookkeeping
      // lag, never a query failure — it only blurs attribution.
      BenchShared.drainQuiet(spark)
      val cpu0 = cpuNsTotal.get()
      val gc0 = gcMsTotal.get()
      val cg0 = cgHist.getCount
      val jit0 = if (jitSupported) jitBean.getTotalCompilationTime else 0L
      val (pu0, ps0) = procTimes()
      val t0 = System.nanoTime()
      val res = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
      }
      // flush this query's events (success OR failure) before reading
      // its deltas; runs outside the timed region so the wall number
      // stays pure query time
      BenchShared.drainQuiet(spark)
      cpuSec(name) = (cpuNsTotal.get() - cpu0) / 1e9
      gcSec(name) = (gcMsTotal.get() - gc0) / 1e3
      cgCompiles(name) = cgHist.getCount - cg0
      jitMs(name) = if (jitSupported) jitBean.getTotalCompilationTime - jit0 else -1L
      val (pu1, ps1) = procTimes()
      procUserSec(name) = if (pu0 < 0 || pu1 < 0) -1.0 else (pu1 - pu0) / 100.0
      procSysSec(name) = if (ps0 < 0 || ps1 < 0) -1.0 else (ps1 - ps0) / 100.0
      // live progress line: a multi-hour scale sweep that dies mid-run
      // (OOM, disk, wall-clock) must still leave per-query evidence in
      // the console log, not lose everything to the end-of-run record
      System.err.println(f"[bench] ${res._1}%-24s wall ${res._2}%9.2f s  " +
        f"user ${procUserSec(name)}%9.1f  sys ${procSysSec(name)}%8.1f  " +
        f"gc ${gcSec(name)}%7.1f")
      val built = graft.queries.LlmQueries.memoizedTags(spark).diff(tagsBefore)
      if (built.nonEmpty) {
        cacheBuilds(name) = built.toSeq.sorted
        System.err.println(s"[bench] $name paid cache builds: ${built.toSeq.sorted.mkString(", ")}")
      }
      releaseAfter.getOrElse(name, Nil).foreach(tag =>
        BenchShared.guardAndRelease(spark, sfDir, tag, bucketStats, "bench"))
      res
    }
    graft.queries.LlmQueries.clearCaches(Some(spark))
    bucketStats.foreach { case (k, v) =>
      System.err.println(s"[bench] bucket guard: $k = $v")
    }
    // Locale.ROOT: the default-locale f-interpolator would render
    // comma decimal separators (invalid JSON) on e.g. de_DE JVMs
    def secMapJson(m: Iterable[(String, Double)]): String = m.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")
    val qs = secMapJson(results)
    val cpuJson = secMapJson(cpuSec)
    val gcJson = secMapJson(gcSec)
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalStr = String.format(java.util.Locale.ROOT, "%.3f", Double.box(total))
    val buildsJson = cacheBuilds.map { case (q, tags) =>
      "\"" + q + "\":[" + tags.map("\"" + _ + "\"").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val bucketsJson = bucketStats.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // "total_full" (not "total"): exactly ONE metric:"total" line is
    // printed per run — the compact summary below, the one that fits
    // whole inside the recorder's ~2000-char stdout tail window — so a
    // consumer grepping for it can never double-count or pick the
    // truncated head of this long line.
    val cpuTotalStr = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(cpuSec.values.sum))
    val gcTotalStr = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(gcSec.values.sum))
    def longMapJson(m: Iterable[(String, Long)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // End-of-run JIT CodeCache occupancy (segmented pools on JDK 17):
    // a full pool (used ≈ max on the non-profiled segment) means the
    // JIT stopped compiling and hot loops run interpreted — the
    // driver-side failure mode r11's record could not see.
    val codeCacheJson = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Code Cache"))
        .map { p =>
          val u = p.getUsage
          "\"" + p.getName.replace("'", "") + "\":{\"used_mb\":" +
            (u.getUsed >> 20) + ",\"max_mb\":" + (u.getMax >> 20) + "}"
        }.mkString("{", ",", "}")
    }
    val cgJson = longMapJson(cgCompiles)
    val jitJson = longMapJson(jitMs)
    val syncFullStr = String.format(java.util.Locale.ROOT, "%.1f", Double.box(syncSec))
    val full =
      s"""{"metric":"total_full","value":$totalStr,"unit":"sec","queries":$qs,"cpu_sec":$cpuJson,"gc_sec":$gcJson,"cpu_total":$cpuTotalStr,"gc_total":$gcTotalStr,"proc_user_sec":${secMapJson(procUserSec)},"proc_sys_sec":${secMapJson(procSysSec)},"sync_sec":$syncFullStr,"failed":$failed,"cache_builds":$buildsJson,"bucket_stats":$bucketsJson,"codegen_compiles":$cgJson,"jit_ms":$jitJson,"code_cache":$codeCacheJson,"sf":"$sfDir"}"""
    // The harness that records this output keeps a ~2000-char tail of
    // the COMBINED console stream and parses the last JSON line it
    // finds there. Every round through r12 recorded `parsed: null`,
    // and r12 isolated the last failure mode: the full record above,
    // printed to stderr "for live debugging", interleaved AFTER the
    // compact stdout line in the combined pipe (stderr bypasses sbt's
    // logger; a >PIPE_BUF write can land around it), pushing the
    // parseable line out of the tail window. So the full record now
    // goes ONLY to the file — nothing larger than a one-line pointer
    // is written to either console stream after this point, and the
    // compact total line below is the absolute last thing printed.
    // A SPARK_GRAFT_ONLY subset run must not clobber the committed
    // full-sweep snapshot (round 7's ADVICE flagged exactly that
    // failure mode: a partial/contended run overwriting the clean
    // baseline of record) — subsets persist to their own file; scale
    // sweeps set SPARK_GRAFT_SNAPSHOT to route theirs likewise.
    val snapshotFile = sys.env.getOrElse("SPARK_GRAFT_SNAPSHOT",
      if (only.isDefined) "BENCH_LOCAL_SUBSET.json" else "BENCH_LOCAL_LATEST.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(snapshotFile),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not persist full results: ${e.getMessage}") }
    System.err.println(s"[bench] full per-query record -> $snapshotFile")
    val compact = BenchRecord.compactLine(results, cpuSec.values.sum,
      gcSec.values.sum, syncSec, bucketStats.toSeq, snapshotFile, sfDir)
    // Belt-and-braces for the recorder (VERDICT r13 item 1): besides
    // printing the compact line (raw, now that build.sbt passes forked
    // stdout through unprefixed), publish the SAME line to a fixed
    // committed path the judge/driver can read even if the tail parse
    // fails again. Only the default full-sweep gate run writes it —
    // a subset or snapshot-routed (scale-sweep) run must not clobber
    // the record of record with off-gate numbers.
    if (only.isEmpty && !sys.env.contains("SPARK_GRAFT_SNAPSHOT")) {
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_COMPACT.json"),
        (compact + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: java.io.IOException =>
        System.err.println(s"[bench] could not persist compact record: ${e.getMessage}") }
    }
    // stop() BEFORE the final print: Spark's shutdown chatter (if any)
    // must not land after the line the recorder needs to parse. A
    // failed stop must not lose the record either.
    try spark.stop()
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] spark.stop failed: ${e.getMessage}") }
    println(compact)
  }
}

/** The compact stdout record — the ONE line the driver's bounded tail
  * capture must be able to parse. Pure (no Spark), so BenchRecordSpec
  * can pin the two contract properties directly: it is valid JSON, and
  * at the full inventory size with worst-case query names and a capped
  * failure list it stays under the recorder's ~2000-char window.
  */
object BenchRecord {
  /** Hard budget for the compact line. The recorder keeps ~2000 chars
    * of combined tail; the line must fit together with sbt's trailing
    * "[info] " prefix and "[success] Total time ..." line (~100
    * chars), with margin for a stray short stderr line.
    */
  val MaxLen = 1800

  private def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def secMapJson(m: Iterable[(String, Double)]): String =
    m.map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")

  def compactLine(
      results: Seq[(String, Double)],
      cpuTotal: Double, gcTotal: Double, syncSec: Double,
      bucketStats: Seq[(String, Long)],
      snapshotFile: String, sfDir: String): String = {
    val total = results.map(_._2).filter(_ >= 0).sum
    val ok = results.filter(_._2 >= 0)
    val meanStr = f3(if (ok.nonEmpty) total / ok.size else 0.0)
    val (worstName, worstSec) =
      if (ok.nonEmpty) ok.maxBy(_._2) else ("none", 0.0)
    val slowest = secMapJson(ok.sortBy(-_._2).take(5))
    // An unbounded failure list could alone blow the tail window — cap
    // it (the full list is in the file record's "failed").
    val failedCompact = {
      val names = results.collect { case (k, v) if v < 0 => k }
      (names.take(8).map("\"" + _ + "\"") ++
        (if (names.size > 8) Seq("\"+" + (names.size - 8) + " more\"") else Nil))
        .mkString("[", ",", "]")
    }
    val bucketsJson = bucketStats.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"mean_sec_per_query":$meanStr,"worst_query":"$worstName","worst_sec":${f3(worstSec)},"slowest5":$slowest,"cpu_total":${f3(cpuTotal)},"gc_total":${f3(gcTotal)},"sync_sec":${String.format(java.util.Locale.ROOT, "%.1f", Double.box(syncSec))},"bucket_stats":$bucketsJson,"failed":$failedCompact,"full_record":"$snapshotFile","sf":"$sfDir"}"""
  }
}
