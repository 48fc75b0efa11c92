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

    // state table reflects all processed files with all flags set
    val state = spark.read.parquet(s"$work/state")
    import spark.implicits._
    val keys = state.select($"file_key").as[String].collect().sorted
    assert(keys.toSeq == Seq("m1", "m2", "m3", "m4"))
    assert(state.filter(!$"loaded" || !$"transformed").count() == 0)
  }
}
