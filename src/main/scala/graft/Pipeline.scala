package graft

import graft.operators.{DriftReport, Flatten, SchemaDiff, StateMerge}
import graft.sources.{Cricsheet, Sinks, ZipIngest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's entire daily DAG (SURVEY.md §3.1: ingest → unzip
  * fan-out → identify new files → schema drift check → flatten →
  * stage → state update) as one idempotent function over a landing
  * directory. Orchestration state that the reference spreads across
  * XCom, DynamoDB and S3 head-object checks collapses into one keyed
  * state table merged relationally.
  *
  * Each stage is a distributed operator: unzip fans out per-archive,
  * new-file selection is an anti-join against the ledger, flatten is
  * the fix-point plan builder, staging is partitioned parquet. Running
  * it again with no new input is a no-op (exactly-once per file);
  * running after new zips land processes only the delta.
  */
object Pipeline {

  case class RunResult(
      newFiles: Long,
      stagedRows: Long,
      driftReport: String,
      hadDrift: Boolean,
      corruptFiles: Long = 0)

  private def loadState(spark: SparkSession, statePath: String): DataFrame = {
    val p = new java.io.File(statePath)
    if (p.exists() && p.listFiles() != null && p.listFiles().nonEmpty)
      spark.read.parquet(statePath)
    else {
      import spark.implicits._
      Seq.empty[operators.FileState].toDF()
    }
  }

  /** One incremental run.
    *
    * @param landingDir  dir of zip archives of match JSON (the S3 bucket)
    * @param workDir     scratch root: extracted files, staging, state, schema log
    */
  def runOnce(spark: SparkSession, landingDir: String, workDir: String): RunResult = {
    import spark.implicits._
    val extractedDir = s"$workDir/extracted"
    val stagingDir = s"$workDir/staging"
    val statePath = s"$workDir/state"
    val schemaPath = s"$workDir/schema_log"

    // 1. unzip fan-out (S2), idempotent per entry: anti-join against
    //    the ledger replaces the reference's per-file head_object loop
    val entries = ZipIngest.unzipEntries(spark, landingDir)
      .withColumn("file_key", regexp_replace(col("entry_name"), "\\.[^.]*$", ""))
    val state = loadState(spark, statePath)
    val newEntries = StateMerge
      .notYetPresent(entries, state.select("file_key"))
      .persist()
    val nNew = newEntries.count()

    if (nNew == 0) {
      val (had, msg) = (false, "no new files")
      return RunResult(0, 0, msg, had)
    }

    // 2. land extracted JSON (one file per match, like the json bucket)
    new java.io.File(extractedDir).mkdirs()
    newEntries.select("entry_name", "content").collectAsList().forEach { r =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(extractedDir, r.getString(0)),
        r.getAs[Array[Byte]](1))
    }

    // 3. read ONLY the new matches (the reference scopes its crawler
    //    to new prefixes the same way) — explicit schema fast path —
    //    + drift check against the last recorded schema version
    val newPaths = newEntries.select("entry_name").as[String].collect()
      .map(n => s"$extractedDir/$n").toSeq
    val allMatches = Cricsheet.readMatchFiles(spark, newPaths)
    // corrupt files degrade to null rows (PERMISSIVE) — filter them
    // out of staging and surface the count instead of failing the run
    val matches = Cricsheet.validMatches(allMatches)
    val nCorrupt = allMatches.count() - matches.count()
    val newCols = SchemaDiff.columns(matches.schema)
    val oldCols =
      if (new java.io.File(schemaPath).exists())
        spark.read.parquet(schemaPath).as[operators.ColumnMeta].collect().toSeq
      else newCols
    val diff = SchemaDiff.diffDf(oldCols.toDF(), newCols.toDF())
    val (hadDrift, driftMsg) = DriftReport.render(diff, "ipl_matches")
    newCols.toDF().write.mode("overwrite").parquet(schemaPath)

    // 4. flatten + stage (S5). Append: prior runs' staging stays.
    val flat = Flatten.flatten(matches.drop("match_file"), outer = true)
    flat.write.mode("append").parquet(stagingDir)
    val staged = spark.read.parquet(stagingDir).count()

    // 5. state update (S8): one relational merge flips all flags
    val updates = newEntries.select(col("file_key"))
      .withColumn("ingested", lit(true))
      .withColumn("crawled", lit(true))
      .withColumn("transformed", lit(true))
      .withColumn("loaded", lit(true))
    val merged = StateMerge.merge(state, updates)
    // write via temp + swap (state is input and output of this run)
    val tmp = s"$statePath.tmp"
    Sinks.stageParquet(merged, tmp)
    val stateFile = new java.io.File(statePath)
    if (stateFile.exists()) {
      val old = new java.io.File(s"$statePath.old")
      if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
      stateFile.renameTo(old)
    }
    new java.io.File(tmp).renameTo(stateFile)

    newEntries.unpersist()
    RunResult(nNew, staged, driftMsg, hadDrift, nCorrupt)
  }
}
