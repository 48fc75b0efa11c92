package graft.sources

import java.util.Properties

import org.apache.spark.sql.DataFrame

/** Sink surface (SURVEY.md §2.1 S5/S6): columnar staging and JDBC
  * warehouse load, re-expressing the reference's Parquet staging write
  * (/root/reference/airflow-setup/Scripts/transformation_job.py:45)
  * and Glue→Redshift load
  * (/root/reference/airflow-setup/Scripts/etl_glue_job.py:17-43).
  */
object Sinks {

  /** Overwrite Parquet staging — the reference's staging write, plus
    * optional partition columns (at 100 TB, partitioning by e.g.
    * ingest date is what makes downstream pruning possible; the
    * reference writes a single unpartitioned dir).
    */
  def stageParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Register as a managed table (the Glue-catalog analog: queryable
    * by name via spark.table / SQL).
    */
  def saveAsTable(df: DataFrame, name: String): Unit =
    df.write.mode("overwrite").saveAsTable(name)

  /** Bucketed managed table: pre-partitions rows by key into a fixed
    * bucket count so repeated joins/aggregations on that key plan with
    * NO shuffle on the bucketed side (verified in SinksSpec). At
    * 100 TB this is the difference between re-shuffling the fact
    * table on every query and shuffling it once at write time.
    */
  def bucketTable(df: DataFrame, name: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(name)

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files. Incremental pipelines (this one
    * included — staging partitions per file_key) accrete small files
    * that at 100 TB dominate scan cost (per-file open + footer read +
    * scheduler pressure beat row decoding).
    *
    * Partitioned directories MUST pass their partition columns: the
    * rewrite then repartitions by them and writes `partitionBy`, so
    * the directory layout (and dynamic-partition-overwrite semantics
    * downstream) is preserved — a flat rewrite of a partitioned dir
    * would silently demote partition columns to data columns.
    *
    * Crash safety: the swap is two renames with a recovery preamble —
    * if a previous run died between them (path missing, `.compact_old`
    * present) the old layout is restored before compacting, so a
    * re-run self-heals instead of failing on the missing directory.
    * Returns (filesBefore, filesAfter).
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      partitionBy: Seq[String] = Nil): (Int, Int) = {
    val dir = new java.io.File(path)
    val old = new java.io.File(path + ".compact_old")
    if (!dir.exists() && old.exists()) // crashed between the two renames
      java.nio.file.Files.move(old.toPath, dir.toPath)
    def parquetFiles(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles()).toSeq.flatten.flatMap { c =>
        if (c.isDirectory) parquetFiles(c)
        else if (c.getName.endsWith(".parquet")) Seq(c) else Nil
      }
    val before = parquetFiles(dir)
    val totalBytes = before.map(_.length()).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = path + ".compact_tmp"
    val df = spark.read.parquet(path)
    val writer =
      if (partitionBy.nonEmpty)
        // one task per partition value -> one file per partition dir
        df.repartition(partitionBy.map(org.apache.spark.sql.functions.col): _*)
          .write.partitionBy(partitionBy: _*)
      else df.repartition(nOut).write
    writer.mode("overwrite").parquet(tmp)
    if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
    java.nio.file.Files.move(dir.toPath, old.toPath)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), dir.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(old)
    (before.size, parquetFiles(dir).size)
  }

  /** JDBC warehouse load. The reference hard-codes Redshift
    * credentials in source (etl_glue_job.py:20-22 — defect §4.4);
    * here connection config is caller-supplied. `numPartitions`
    * bounds concurrent connections so a 1000-executor cluster doesn't
    * open 1000 sessions against the warehouse. Round-tripped in
    * SinksSpec against an embedded Derby database (in Spark's jars),
    * standing in for the warehouse.
    */
  def loadJdbc(
      df: DataFrame,
      url: String,
      table: String,
      props: Properties,
      numPartitions: Int = 8,
      mode: String = "append"): Unit =
    df.coalesce(numPartitions)
      .write.mode(mode)
      .option("batchsize", 10000)
      .jdbc(url, table, props)
}
