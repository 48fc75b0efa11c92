package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Zip decompress + fan-out (SURVEY.md §2.1 S2): the reference's
  * Lambda unzip (/root/reference/airflow-setup/Scripts/
  * lambda_unzip_function.py:13-22 and dags/src/lamda_function.py:19-47)
  * re-expressed as a distributed scan: `binaryFile` source over the
  * zip objects, then a per-partition `flatMap` over ZipInputStream —
  * each executor unpacks its own zips, so a directory of thousands of
  * archives fans out in parallel instead of through one Lambda.
  */
object ZipIngest {

  /** One row per zip entry: (zip_path, entry_name, content). */
  def unzipEntries(spark: SparkSession, zipDir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip")
      .load(zipDir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
        Iterator
          .continually(zin.getNextEntry)
          .takeWhile(_ != null)
          .filterNot(_.isDirectory)
          .map(e => (path, e.getName, zin.readAllBytes()))
          .toVector
      }
      .toDF("zip_path", "entry_name", "content")
  }

  /** Directory listing as a DataFrame (S7): file name + size via the
    * binaryFile source's metadata columns — column pruning keeps the
    * content out of the scan.
    */
  def listFiles(spark: SparkSession, dir: String, glob: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "[^/]+$", 0).as("file_name"),
        col("length").as("n_bytes"))
  }
}
