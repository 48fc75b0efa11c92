package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders. One parquet file per table under the sf dir
  * (see /root/repo/TESTDATA.md). All queries read through here so the
  * scan path (vectorized parquet, pushdown, pruning) is uniform.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark's reader
    * rejects outright. Read nanos as long (legacy flag) and floor to
    * microseconds (integer DIV — a double-typed division would lose
    * precision above 2^53 ns). DuckDB oracles match by flooring
    * epoch_us/epoch_ms the same way.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so the full surface is also
    * reachable through `spark.sql(...)` — the engine's SQL front end.
    */
  def registerViews(s: SparkSession, d: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(s, d) else t(s, d, n)
      df.createOrReplaceTempView(n)
    }
}
