package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.{SparkSpecBase, Tables}

class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  test("incremental pipeline processes each file exactly once across runs") {
    val in = tmpDir("stream_in")
    val out = tmpDir("stream_out")
    val cp = tmpDir("stream_cp")

    def land(name: String): Unit =
      Files.copy(Paths.get(fixture(name)), Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)

    land("match_tiny.json")
    val schema = spark.read.option("multiLine", "true")
      .json(fixture("match_tiny.json")).schema

    IncrementalPipeline.runOnce(spark, in, schema, out, cp)
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst == 4) // teams(2) × deliveries(2), cf. FlattenSpec

    // second run with no new files: nothing reprocessed
    IncrementalPipeline.runOnce(spark, in, schema, out, cp)
    assert(spark.read.parquet(out).count() == afterFirst)

    // a new file arrives: only it is processed (same schema → same
    // row-count delta as the first file)
    Files.copy(Paths.get(fixture("match_tiny.json")),
      Paths.get(in, "match_tiny_2.json"))
    IncrementalPipeline.runOnce(spark, in, schema, out, cp)
    assert(spark.read.parquet(out).count() == afterFirst * 2)
  }

  test("foreachBatch warehouse sink is exactly-once across runs and retries") {
    val in = tmpDir("wh_in")
    val cp = tmpDir("wh_cp")
    val url = "jdbc:derby:memory:graftwhstream;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val schema = "id LONG, v STRING"
    def land(name: String, rows: Seq[(Long, String)]): Unit =
      Files.writeString(Paths.get(in, name),
        rows.map { case (i, v) => s"""{"id":$i,"v":"$v"}""" }.mkString("\n"))
    def run(): Unit = IncrementalPipeline.warehouseSink(
      spark.readStream.schema(schema).json(in), url, "events_wh", props, cp)
    def whCount(): Long = spark.read.jdbc(url, "events_wh", props).count()

    land("b1.json", Seq((1L, "a"), (2L, "b")))
    run()
    assert(whCount() == 2)
    // re-run with nothing new: checkpoint replays no committed batch
    run()
    assert(whCount() == 2)
    // new file: only its rows land
    land("b2.json", Seq((3L, "c")))
    run()
    assert(whCount() == 3)
    // a RETRIED micro-batch (crash after write, before commit) replaces
    // its own rows instead of appending a second copy
    import spark.implicits._
    val replay = Seq((3L, "c")).toDF("id", "v")
    IncrementalPipeline.upsertBatch(replay, 1L, url, "events_wh", props)
    assert(whCount() == 3)
  }

  test("parquet sink with maintenance: compaction preserves rows, cuts files, stays exactly-once") {
    val in = tmpDir("psink_in")
    val out = s"${tmpDir("psink_root")}/data"
    val cp = tmpDir("psink_cp")
    val schema = "id LONG, v STRING"
    def land(name: String, rows: Seq[(Long, String)]): Unit =
      Files.writeString(Paths.get(in, name),
        rows.map { case (i, v) => s"""{"id":$i,"v":"$v"}""" }.mkString("\n"))
    // maxFilesPerTrigger=1 → one micro-batch per file, so batch ids
    // advance and the every-2-batches hook actually fires
    def run(): Unit = IncrementalPipeline.parquetSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(in),
      out, cp, compactEvery = 2)
    def files(): Seq[java.nio.file.Path] = {
      val s = Files.walk(Paths.get(out))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
      } finally s.close()
    }

    land("b0.json", Seq((1L, "a"), (2L, "b")))
    land("b1.json", Seq((3L, "c")))
    run() // batches 0,1 — no compaction yet
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
    val filesBefore = files().size

    land("b2.json", Seq((4L, "d")))
    land("b3.json", Seq((5L, "e")))
    run() // batch 2 triggers compaction of batches 0-1, then 2,3 write
    // every row exactly once after compaction + further appends
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 4L, 5L))
    // compacted batches collapse to one file per partition dir
    val perPartition = files().groupBy(_.getParent.getFileName.toString)
    assert(perPartition("load_batch_id=0").size == 1, perPartition.toString)
    assert(perPartition("load_batch_id=1").size == 1, perPartition.toString)
    // re-run with nothing new: no batch replays, rows unchanged
    run()
    assert(spark.read.parquet(out).count() == 5)
    // a RETRIED micro-batch replaces its own partition, not appends:
    // simulate a crashed attempt of batch 3 re-running post-compaction
    // (replay the batch's ACTUAL rows — the file→batch assignment
    // order is the source's business, not the test's)
    import org.apache.spark.sql.functions.lit
    val batch3 = spark.read.parquet(out)
      .filter($"load_batch_id" === 3L).select($"id", $"v")
      .as[(Long, String)].collect().toSeq
    batch3.toDF("id", "v").withColumn("load_batch_id", lit(3L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("load_batch_id").parquet(out)
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 4L, 5L))
    assert(filesBefore >= 2) // the pre-compaction state really had piles

    // simulate a compaction that crashed BETWEEN its two renames: the
    // data dir is gone and only .compact_old remains. The next
    // maintenance batch must recover it — not let the batch write
    // recreate the dir and a later compaction delete the only copy.
    Files.move(Paths.get(out), Paths.get(out + ".compact_old"))
    land("b4.json", Seq((6L, "f")))
    land("b5.json", Seq((7L, "g")))
    run() // batch 4 fires the every-2 hook → recovery, then 4,5 write
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(!Files.exists(Paths.get(out + ".compact_old")))
  }

  test("upsertBatch only swallows the missing-table DELETE failure") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graftwhguard;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      assert(!IncrementalPipeline.tableExists(conn, "broken_wh"))
      // a table that EXISTS but lacks the batch-id column: the dedup
      // DELETE fails with a non-missing-table SQLException, which must
      // rethrow — appending past it would double-load a retried batch
      conn.createStatement().executeUpdate("CREATE TABLE broken_wh (id BIGINT)")
      assert(IncrementalPipeline.tableExists(conn, "broken_wh"))
      // getTables' name argument is a LIKE pattern: '_' matches any
      // char, so without escaping, the existing EVENTSXWH would make
      // the MISSING events_wh appear to exist — rethrowing the benign
      // first-load DELETE failure and crashing the stream's first batch
      conn.createStatement().executeUpdate("CREATE TABLE eventsxwh (id BIGINT)")
      assert(!IncrementalPipeline.tableExists(conn, "events_wh"))
    } finally conn.close()
    val batch = Seq((1L, "a")).toDF("id", "v")
    intercept[java.sql.SQLException] {
      IncrementalPipeline.upsertBatch(batch, 0L, url, "broken_wh", props)
    }
  }

  test("watermarked windowed aggregation runs as a real stream") {
    val sf = "/root/testdata/sf0.001"
    val stage = tmpDir("events_stage")
    Tables.events(spark, sf).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema

    val stream = spark.readStream.schema(schema).parquet(stage)
    val q = IncrementalPipeline.windowedCounts(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("win_counts")
      .option("checkpointLocation", tmpDir("win_cp"))
      .start()
    q.processAllAvailable()
    q.stop()

    // append mode emits only watermark-closed windows; the batch query
    // over the same data bounds them from above
    val streamed = spark.table("win_counts").count()
    val batch = IncrementalPipeline.windowedCounts(Tables.events(spark, sf)).count()
    assert(streamed > 0 && streamed <= batch)
  }

  test("stream-stream interval join emits exactly the batch join's pairs") {
    val sf = "/root/testdata/sf0.001"
    val stage = tmpDir("ssj_stage")
    Tables.events(spark, sf).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    def stream() = spark.readStream.schema(schema).parquet(stage)
    val p = stream().filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("p_id"), $"ts".as("p_ts"))
    val g = stream().filter($"event_type" === "signup")
      .select($"user_id".as("s_user"), $"event_id".as("s_id"), $"ts".as("s_ts"))
    val q = IncrementalPipeline.purchaseAttribution(p, g)
      .writeStream.outputMode("append").format("memory").queryName("attrib")
      .option("checkpointLocation", tmpDir("ssj_cp")).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attrib")
      .select($"p_id", $"s_id").as[(Long, Long)].collect().toSet
    val batch = graft.SparkEntry.queries("stream_join")(spark, sf)
      .select($"p_id", $"s_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch, s"stream-batch diff: ${(streamed -- batch).take(5)} / ${(batch -- streamed).take(5)}")
  }

  test("flatMapGroupsWithState maintains per-user profiles over a stream") {
    val sf = "/root/testdata/sf0.001"
    val stage = tmpDir("events_state_stage")
    Tables.events(spark, sf).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema

    val stream = spark.readStream.schema(schema).parquet(stage)
    val q = IncrementalPipeline.userProfiles(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("profiles")
      .option("checkpointLocation", tmpDir("prof_cp"))
      .start()
    q.processAllAvailable()
    q.stop()

    // single drain → one profile per user, counts match the batch truth
    val got = spark.table("profiles")
      .select($"user_id", $"n_events").as[(Long, Long)].collect().toMap
    val want = Tables.events(spark, sf).groupBy($"user_id")
      .count().as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("dropDuplicatesWithinWatermark dedups a stream by key") {
    val sf = "/root/testdata/sf0.001"
    val stage = tmpDir("events_dedup_stage")
    Tables.events(spark, sf).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema

    val stream = spark.readStream.schema(schema).parquet(stage)
    val q = IncrementalPipeline.dedupWithinWatermark(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation", tmpDir("dedup_cp"))
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_out")
      .select($"user_id", $"event_type").distinct().count()
    val keys = Tables.events(spark, sf)
      .select($"user_id", $"event_type").distinct().count()
    assert(got == keys)
    assert(spark.table("dedup_out").count() == keys)
  }

  test("transformWithState sessionizes a real stream, matching the batch result") {
    import org.apache.spark.sql.functions.unix_micros
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val sf = "/root/testdata/sf0.001"
    val stage = tmpDir("events_tws_stage")
    Tables.events(spark, sf).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema

    // transformWithState streaming requires the RocksDB state store
    // (the HDFS-backed default is rejected for this operator)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val stream = spark.readStream.schema(schema).parquet(stage)
        .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id", $"value")
        .as[graft.queries.StreamQueries.SessEvent]
        .groupByKey(_.user_id)
        .transformWithState(new graft.queries.StreamQueries.SessionProcessor,
          TimeMode.None(), OutputMode.Append())
      val q = stream.toDF().writeStream.outputMode("append")
        .format("memory").queryName("tws_sessions")
        .option("checkpointLocation", tmpDir("tws_cp"))
        .start()
      q.processAllAvailable()
      // SessionProcessor's documented scope: complete sessions only
      // when each key's rows arrive within one micro-batch — assert
      // this drain really was a single batch, so the equality below
      // can't silently pass a multi-batch run the processor doesn't
      // support (cross-batch needs ListState + event-time timers).
      val batches = q.recentProgress.count(_.numInputRows > 0)
      q.stop()
      assert(batches == 1, s"expected a single-batch drain, saw $batches input batches")

      val got = spark.table("tws_sessions")
        .orderBy($"user_id", $"sess_start")
        .collect().toSeq
      val want = graft.SparkEntry.queries("stream_tws")(spark, sf).collect().toSeq
      assert(got == want, s"stream (${got.size} rows) != batch (${want.size} rows)")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream_throttle: two-micro-batch stream equals the batch admission result") {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val sf = "/root/testdata/sf0.001"
    val stage = tmpDir("thr_stage")
    // split by event time so every key's batch-1 rows precede its
    // batch-2 rows — the in-order arrival the processor's cross-batch
    // contract requires. Each half lands as ONE parquet file with a
    // pinned mod-time, and maxFilesPerTrigger=1 forces one micro-batch
    // per half, so the run genuinely exercises cross-batch state.
    val ev = Tables.events(spark, sf)
    val cut = ev.selectExpr("percentile_approx(unix_micros(ts), 0.5)")
      .head().getLong(0)
    def stageOne(df: org.apache.spark.sql.DataFrame,
        name: String, mtime: Long): Unit = {
      val tmp = tmpDir(s"thr_half_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(fail(s"no part file in $tmp"))
      val dst = new java.io.File(stage, name)
      Files.copy(part.toPath, dst.toPath, StandardCopyOption.REPLACE_EXISTING)
      assert(dst.setLastModified(mtime))
    }
    stageOne(ev.filter(unix_micros(col("ts")) <= cut), "a_first.parquet", 1000000L)
    stageOne(ev.filter(unix_micros(col("ts")) > cut), "b_second.parquet", 2000000L)
    val schema = spark.read.parquet(stage).schema
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
        .select(col("user_id"),
          expr("(unix_micros(ts) DIV 600000000) * 600000").as("win_ms"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
        .as[graft.queries.StreamQueries.ThrEvent]
        .groupByKey(e => (e.user_id, e.win_ms))
        .transformWithState(new graft.queries.StreamQueries.ThrottleProcessor,
          TimeMode.None(), OutputMode.Append())
      val q = stream.toDF().writeStream.outputMode("append")
        .format("memory").queryName("thr_out")
        .option("checkpointLocation", tmpDir("thr_cp"))
        .start()
      q.processAllAvailable()
      val batches = q.recentProgress.count(_.numInputRows > 0)
      q.stop()
      assert(batches >= 2,
        s"expected a multi-batch drain to exercise cross-batch state, saw $batches")
      val got = spark.table("thr_out")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = graft.SparkEntry.queries("stream_throttle")(spark, sf)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == want,
        s"stream(${got.size}) != batch(${want.size}): " +
          s"${(got -- want).take(3)} / ${(want -- got).take(3)}")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming latest-wins CDC state equals the batch cdc_merge result") {
    val sf = "/root/testdata/sf0.001"
    val stage = tmpDir("cdc_stage")
    Tables.events(spark, sf).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val stream = spark.readStream.schema(schema).parquet(stage)
    // the SAME body as the declared stream_cdc query — streaming
    // update mode re-emits a key's latest state as batches arrive
    val q = graft.queries.StreamQueries.cdcLatestWins(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("cdc_state")
      .option("checkpointLocation", tmpDir("cdc_cp"))
      .start()
    q.processAllAvailable()
    q.stop()
    // final state per key = last update emitted; with one input batch
    // that's exactly one row per surviving key
    val got = spark.table("cdc_state")
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct($"last_us", $"last_event", $"last_value")).as("m"))
      .select($"user_id", $"m.last_us", $"m.last_event", $"m.last_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    val want = graft.SparkEntry.queries("cdc_merge")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == want,
      s"stream(${got.size}) != batch(${want.size}): ${(got -- want).take(3)} / ${(want -- got).take(3)}")
    // and the declared stream_cdc batch query equals cdc_merge too
    val declared = graft.SparkEntry.queries("stream_cdc")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(declared == want)
  }
}
