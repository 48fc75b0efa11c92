package graft

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

class PipelineSpec extends SparkSpecBase {

  private def zipOf(dir: String, zipName: String, entries: Map[String, Array[Byte]]): Unit = {
    val zout = new ZipOutputStream(new FileOutputStream(s"$dir/$zipName"))
    entries.foreach { case (name, bytes) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(bytes)
      zout.closeEntry()
    }
    zout.close()
  }

  test("end-to-end incremental pipeline: fan-out, flatten, stage, exactly-once") {
    val landing = tmpDir("pipe_landing")
    val work = tmpDir("pipe_work")
    val tiny = Files.readAllBytes(Paths.get(fixture("match_tiny.json")))
    val full = Files.readAllBytes(Paths.get(fixture("match_full.json")))

    zipOf(landing, "batch1.zip", Map("m1.json" -> tiny, "m2.json" -> full))

    val r1 = Pipeline.runOnce(spark, landing, work)
    assert(r1.newFiles == 2)
    assert(r1.stagedRows == 4 + 52) // outer-flatten counts, cf. FlattenSpec
    assert(!r1.hadDrift) // first run: no prior schema version

    // idempotence: same landing dir, nothing new
    val r2 = Pipeline.runOnce(spark, landing, work)
    assert(r2.newFiles == 0 && r2.stagedRows == 0)

    // a new archive lands: only its file processed, staging appends
    zipOf(landing, "batch2.zip", Map("m3.json" -> tiny))
    val r3 = Pipeline.runOnce(spark, landing, work)
    assert(r3.newFiles == 1)
    assert(r3.stagedRows == 56 + 4)
    assert(!r3.hadDrift) // same schema as recorded version

    // a corrupt file: staged rows exclude it, corrupt count surfaces,
    // and the file is still marked processed (not retried forever)
    zipOf(landing, "batch3.zip", Map("m4.json" -> "{ not json".getBytes("UTF-8")))
    val r4 = Pipeline.runOnce(spark, landing, work)
    assert(r4.newFiles == 1 && r4.corruptFiles == 1)
    assert(r4.stagedRows == 60) // unchanged: null row filtered from staging
    val r5 = Pipeline.runOnce(spark, landing, work)
    assert(r5.newFiles == 0) // corrupt file not reprocessed

    // same-run file_key collision (re-delivery in a second archive):
    // exactly one survives the dedupe, no double-staging, one ledger
    // row; nested entry names extract with their directories intact
    zipOf(landing, "batch4a.zip", Map("m5.json" -> tiny))
    zipOf(landing, "batch4b.zip", Map("m5.json" -> tiny, "2024/m6.json" -> tiny))
    val r6 = Pipeline.runOnce(spark, landing, work)
    assert(r6.newFiles == 2) // m5 deduped to one, plus 2024/m6
    assert(r6.stagedRows == 60 + 4 + 4)

    // genuine schema drift: a new leaf appears inside info → detected
    // (added), reported by dotted path, and staging still succeeds on
    // the explicit-schema fast path
    val drifted = new String(tiny, "UTF-8").replace(
      "\"balls_per_over\": 6,",
      "\"balls_per_over\": 6, \"forfeited_overs\": 2,")
    zipOf(landing, "batch5.zip", Map("m7.json" -> drifted.getBytes("UTF-8")))
    val r7 = Pipeline.runOnce(spark, landing, work)
    assert(r7.hadDrift)
    assert(r7.driftReport.contains("info.forfeited_overs"))
    // drift is recorded: the same shape again is no longer drift
    zipOf(landing, "batch6.zip", Map("m8.json" -> drifted.getBytes("UTF-8")))
    val r8 = Pipeline.runOnce(spark, landing, work)
    assert(!r8.hadDrift)

    // state table reflects all processed files with all flags set
    val state = spark.read.parquet(s"$work/state")
    import spark.implicits._
    val keys = state.select($"file_key").as[String].collect().sorted
    assert(keys.toSeq == Seq("2024/m6", "m1", "m2", "m3", "m4", "m5", "m7", "m8"))
    assert(state.filter(!$"loaded" || !$"transformed").count() == 0)

    // exactly-once survives a crash between staging write and ledger
    // update: deleting the ledger rows for m1/m2 (simulating the
    // crash) and re-running re-stages them into their own partitions —
    // same total, no duplicates
    val before = spark.read.parquet(s"$work/staging").count()
    val pruned = state.filter(!$"file_key".isin("m1", "m2"))
    val tmp = s"$work/state_pruned"
    pruned.write.parquet(tmp)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$work/state"))
    new java.io.File(tmp).renameTo(new java.io.File(s"$work/state"))
    val r9 = Pipeline.runOnce(spark, landing, work)
    assert(r9.newFiles == 2)
    assert(r9.stagedRows == before) // overwrote their partitions, not appended
  }

  test("drift notifier fires exactly when drift is detected, and a failing one cannot fail the run") {
    val landing = tmpDir("pipe_notify_landing")
    val work = tmpDir("pipe_notify_work")
    val tiny = Files.readAllBytes(Paths.get(fixture("match_tiny.json")))
    val sent = scala.collection.mutable.ArrayBuffer.empty[String]
    val capture: String => Unit = sent += _

    // first run records the baseline schema: no drift, no notification
    zipOf(landing, "batch1.zip", Map("m1.json" -> tiny))
    val r1 = Pipeline.runOnce(spark, landing, work, notifyDrift = capture)
    assert(!r1.hadDrift && sent.isEmpty)

    // same schema again: still silent
    zipOf(landing, "batch2.zip", Map("m2.json" -> tiny))
    val r2 = Pipeline.runOnce(spark, landing, work, notifyDrift = capture)
    assert(!r2.hadDrift && sent.isEmpty)

    // a new leaf appears: exactly one notification, carrying the report
    val drifted = new String(tiny, "UTF-8").replace(
      "\"balls_per_over\": 6,",
      "\"balls_per_over\": 6, \"forfeited_overs\": 2,")
    zipOf(landing, "batch3.zip", Map("m3.json" -> drifted.getBytes("UTF-8")))
    val r3 = Pipeline.runOnce(spark, landing, work, notifyDrift = capture)
    assert(r3.hadDrift)
    assert(sent.toSeq == Seq(r3.driftReport))
    assert(sent.head.contains("info.forfeited_overs"))

    // a throwing transport is contained: the run completes, drift is
    // still reported in the result (the notification is best-effort,
    // the pipeline is not)
    val drifted2 = new String(tiny, "UTF-8").replace(
      "\"balls_per_over\": 6,",
      "\"balls_per_over\": 6, \"reserve_umpires\": 1,")
    zipOf(landing, "batch4.zip", Map("m4.json" -> drifted2.getBytes("UTF-8")))
    val r4 = Pipeline.runOnce(spark, landing, work,
      notifyDrift = _ => throw new RuntimeException("SNS down"))
    assert(r4.hadDrift && r4.newFiles == 1)
  }

  test("S1 ingest: download (file:// URL) -> landing -> runOnce end-to-end") {
    // the reference's full story: download_and_upload_to_s3 lands the
    // archive, then the DAG fans it out — here Ingest + runOnce
    val src = tmpDir("dl_src")
    val landing = tmpDir("dl_landing")
    val work = tmpDir("dl_work")
    val tiny = Files.readAllBytes(Paths.get(fixture("match_tiny.json")))
    zipOf(src, "upstream.zip", Map("m1.json" -> tiny, "2025/m2.json" -> tiny))

    val url = Paths.get(s"$src/upstream.zip").toUri.toString
    val landed = graft.sources.Ingest.downloadToLanding(url, landing)
    assert(landed.isDefined)
    val r1 = Pipeline.runOnce(spark, landing, work)
    assert(r1.newFiles == 2 && r1.stagedRows == 8)

    // unchanged upstream: ingest is a ledger no-op, pipeline sees
    // nothing new — the end-to-end loop is idempotent
    assert(graft.sources.Ingest.downloadToLanding(url, landing).isEmpty)
    val r2 = Pipeline.runOnce(spark, landing, work)
    assert(r2.newFiles == 0)
  }

  test("work dir with URI-encodable characters still partitions staging by file") {
    // input_file_name() percent-encodes the path; the staging file_key
    // derivation must decode it or every row collapses into one
    // empty-key partition that the next run's overwrite then deletes
    val landing = tmpDir("enc_landing")
    val workRoot = tmpDir("enc_work")
    val work = s"$workRoot/with space+plus"
    Files.createDirectories(Paths.get(work))
    val tiny = Files.readAllBytes(Paths.get(fixture("match_tiny.json")))
    zipOf(landing, "b1.zip", Map("m1.json" -> tiny))
    val r1 = Pipeline.runOnce(spark, landing, work)
    assert(r1.newFiles == 1 && r1.stagedRows == 4)
    import spark.implicits._
    val keys = spark.read.parquet(s"$work/staging")
      .select($"file_key").distinct().as[String].collect()
    assert(keys.toSeq == Seq("m1")) // not "" (collapsed), not m1%20…
    // second batch must append its own partition, not overwrite m1's
    zipOf(landing, "b2.zip", Map("m2.json" -> tiny))
    val r2 = Pipeline.runOnce(spark, landing, work)
    assert(r2.stagedRows == 8)
  }

  test("same-archive key collision resolves deterministically (last entry name wins)") {
    val landing = tmpDir("tie_landing")
    val work = tmpDir("tie_work")
    val tiny = new String(
      Files.readAllBytes(Paths.get(fixture("match_tiny.json"))), "UTF-8")
    val vA = tiny.replace("Wankhede Stadium", "Venue JSON")
    val vB = tiny.replace("Wankhede Stadium", "Venue TXT")
    // one zip, two entries with the same file_key 'a'
    zipOf(landing, "b.zip", Map(
      "a.json" -> vA.getBytes("UTF-8"), "a.txt" -> vB.getBytes("UTF-8")))
    val r = Pipeline.runOnce(spark, landing, work)
    assert(r.newFiles == 1 && r.stagedRows == 4)
    import spark.implicits._
    val venues = spark.read.parquet(s"$work/staging")
      .select($"info_venue").distinct().as[String].collect()
    assert(venues.toSeq == Seq("Venue TXT")) // a.txt > a.json lexicographically
  }

  test("maintain compacts staging while preserving partitions and exactly-once") {
    val landing = tmpDir("mnt_landing")
    val work = tmpDir("mnt_work")
    val tiny = Files.readAllBytes(Paths.get(fixture("match_tiny.json")))
    // three incremental batches -> three per-file staging partitions
    (1 to 3).foreach { i =>
      zipOf(landing, s"b$i.zip", Map(s"m$i.json" -> tiny))
      Pipeline.runOnce(spark, landing, work)
    }
    val before = spark.read.parquet(s"$work/staging")
    val wantRows = before.count()
    assert(wantRows == 12)
    val (nBefore, nAfter) = Pipeline.maintain(spark, work)
    assert(nBefore >= 3 && nAfter <= nBefore)
    val after = spark.read.parquet(s"$work/staging")
    assert(after.count() == wantRows)
    // partition layout survived: pruning on file_key still plans
    import spark.implicits._
    val pruned = after.filter($"file_key" === "m2")
    pruned.collect()
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters: ["))
    assert(pruned.count() == 4)
    // exactly-once still holds post-compaction: re-delivering m2 in a
    // new archive overwrites only its partition, no duplicates
    zipOf(landing, "redeliver.zip", Map("m2.json" -> tiny))
    // force reprocessing by pruning m2 from the ledger (same surgery
    // as the crash-recovery case in the end-to-end test)
    val state = spark.read.parquet(s"$work/state")
    val prunedState = state.filter($"file_key" =!= "m2")
    prunedState.write.parquet(s"$work/state_pruned")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$work/state"))
    new java.io.File(s"$work/state_pruned").renameTo(new java.io.File(s"$work/state"))
    Pipeline.runOnce(spark, landing, work)
    assert(spark.read.parquet(s"$work/staging").count() == wantRows)
  }

  test("a batch larger than maxDriverRows fails loudly with the batching remedy") {
    // the scoped read collects new-entry NAMES to the driver; past the
    // bound the run must fail with an actionable message, not OOM
    val landing = tmpDir("cap_landing")
    val work = tmpDir("cap_work")
    val tiny = Files.readAllBytes(Paths.get(fixture("match_tiny.json")))
    zipOf(landing, "big.zip", Map("m1.json" -> tiny, "m2.json" -> tiny, "m3.json" -> tiny))
    val e = intercept[IllegalStateException] {
      Pipeline.runOnce(spark, landing, work, maxDriverRows = 2)
    }
    assert(e.getMessage.contains("maxDriverRows"))
    assert(e.getMessage.contains("batches"))
    // nothing was staged or marked processed: the failed run is clean
    // to re-run with a raised bound or a sliced landing dir
    assert(!new java.io.File(s"$work/staging").exists())
    val r = Pipeline.runOnce(spark, landing, work) // default bound: fine
    assert(r.newFiles == 3)
  }

  test("10x admission: a 300-file burst admits under the default bound; " +
      "slice-batched runs stay exactly-once when the bound forces batching") {
    // VERDICT r11 item 7: the runOnce loop's admission posture at 10×
    // the reference's daily cadence. 300 entries across 3 archives —
    // (a) the default bound admits the whole burst in one run and the
    // ledger is exactly-once; (b) with a bound the burst exceeds, the
    // run fails LOUDLY (nothing staged), and the documented remedy —
    // ingest the landing dir in slices, one runOnce per slice — lands
    // every file exactly once with no re-staging across slices.
    val tiny = Files.readAllBytes(Paths.get(fixture("match_tiny.json")))
    def burst(landing: String): Unit =
      (0 until 3).foreach { z =>
        zipOf(landing, s"burst$z.zip",
          (0 until 100).map(i => s"b$z/m$i.json" -> tiny).toMap)
      }

    // (a) single-run admission under the default bound
    val landingA = tmpDir("adm_a_landing"); val workA = tmpDir("adm_a_work")
    burst(landingA)
    val rA = Pipeline.runOnce(spark, landingA, workA)
    assert(rA.newFiles == 300, s"admitted ${rA.newFiles} of 300")
    assert(rA.stagedRows == 300L * 4)
    assert(Pipeline.runOnce(spark, landingA, workA).newFiles == 0, "not idempotent")

    // (b) bound below the burst: loud refusal, then sliced ingestion
    val landingB = tmpDir("adm_b_landing"); val workB = tmpDir("adm_b_work")
    burst(landingB)
    val e = intercept[IllegalStateException] {
      Pipeline.runOnce(spark, landingB, workB, maxDriverRows = 120)
    }
    assert(e.getMessage.contains("batches"))
    assert(!new java.io.File(s"$workB/staging").exists(), "refused run must stage nothing")
    // the remedy: one slice (archive) at a time under the same bound.
    // stagedRows is the CUMULATIVE staging count after each run, so
    // each slice must add exactly its own 100 × 4 rows.
    val sliceDir = tmpDir("adm_b_slices")
    (0 until 3).foreach { z =>
      new java.io.File(s"$sliceDir/s$z").mkdirs()
      Files.copy(Paths.get(s"$landingB/burst$z.zip"),
        Paths.get(s"$sliceDir/s$z/burst$z.zip"))
      val r = Pipeline.runOnce(spark, s"$sliceDir/s$z", workB, maxDriverRows = 120)
      assert(r.newFiles == 100, s"slice $z admitted ${r.newFiles}")
      assert(r.stagedRows == 100L * 4 * (z + 1),
        s"slice $z cumulative staging ${r.stagedRows}")
    }
    // exactly-once across slices: re-running any slice adds nothing
    assert(Pipeline.runOnce(spark, s"$sliceDir/s1", workB, maxDriverRows = 120)
      .newFiles == 0)
  }

  test("zip-slip entry names fail the run instead of writing outside the work dir") {
    val landing = tmpDir("slip_landing")
    val work = tmpDir("slip_work")
    val tiny = Files.readAllBytes(Paths.get(fixture("match_tiny.json")))
    zipOf(landing, "evil.zip", Map("../evil.json" -> tiny))
    val e = intercept[Exception] {
      Pipeline.runOnce(spark, landing, work)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("zip-slip")))
    // ../evil.json relative to work/extracted would land in work itself
    assert(!new java.io.File(s"$work/evil.json").exists())
  }
}
