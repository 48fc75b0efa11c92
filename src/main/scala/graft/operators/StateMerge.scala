package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-file pipeline state, mirroring the reference's DynamoDB
  * `ProcessedFiles` item shape
  * (/root/reference/airflow-setup/dags/final_DAG.py:58-73,
  *  /root/reference/airflow-setup/dags/src/lamda_function.py:40-47).
  */
case class FileState(
    file_key: String,
    ingested: Boolean,
    crawled: Boolean,
    transformed: Boolean,
    loaded: Boolean)

/** Incremental-processing state table as relational operators.
  *
  * The reference holds this state in DynamoDB and touches it with
  * per-key `get_item`/`update_item` loops (final_DAG.py:63-101,
  * 265-307) — O(files) network round-trips from the driver. The
  * Spark-first restatement is set-oriented: state lives as a keyed
  * table, updates merge in via one full-outer join, and "which files
  * are new" is one left-outer join + filter. Both joins broadcast when
  * the state is small and scale to shuffle joins when it is not —
  * nothing here is driver-side per-row.
  */
object StateMerge {

  private val flags = Seq("ingested", "crawled", "transformed", "loaded")

  /** Merge flag updates into the state table (upsert). Missing flags
    * on either side default false; an update row for an unseen key
    * inserts it. Column sets: both inputs need file_key + any subset
    * of the four flags.
    */
  def merge(state: DataFrame, updates: DataFrame): DataFrame = {
    def norm(df: DataFrame, suffix: String): DataFrame =
      flags.foldLeft(df) { (d, f) =>
        val c = if (d.columns.contains(f)) col(f) else lit(null).cast("boolean")
        d.withColumn(f + suffix, c)
      }.select(col("file_key") +: flags.map(f => col(f + suffix)): _*)
    val s = norm(state, "_s")
    val u = norm(updates, "_u")
    s.join(u, Seq("file_key"), "full_outer")
      .select(
        col("file_key") +:
          flags.map(f => coalesce(col(f + "_u"), col(f + "_s"), lit(false)).as(f)): _*)
  }

  /** Files needing processing: present in `files` (column file_key)
    * and either absent from state or ingested ∧ ¬crawled ∧
    * ¬transformed ∧ ¬loaded — the reference's selection predicate
    * (final_DAG.py:66-72: a missing DynamoDB item is also "new").
    */
  def selectNew(files: DataFrame, state: DataFrame): DataFrame =
    files
      .join(state, Seq("file_key"), "left_outer")
      .filter(
        col("ingested").isNull ||
          (col("ingested") && !col("crawled") && !col("transformed") && !col("loaded")))
      .select("file_key")

  /** Idempotent skip of already-present keys — the reference's
    * head_object existence check (lamda_function.py:31-37) as an
    * anti-join.
    */
  def notYetPresent(incoming: DataFrame, existing: DataFrame): DataFrame =
    incoming.join(existing, Seq("file_key"), "left_anti")
}
