package graft.streaming

import graft.operators.Flatten
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference pipeline's incremental daily batch (SURVEY.md §3.1),
  * re-expressed as Structured Streaming with `Trigger.AvailableNow`:
  * the file-source commit log replaces the DynamoDB `ProcessedFiles`
  * ledger (exactly-once per file comes free from the checkpoint), and
  * the flatten transform runs inside the stream. Re-running the
  * pipeline processes only files that arrived since the last run —
  * the reference's `identify_new_files` + flag updates collapse into
  * the checkpoint directory.
  */
object IncrementalPipeline {

  /** Incremental JSON→flatten→Parquet. Each call processes exactly
    * the files not yet recorded in `checkpointDir` and terminates
    * (AvailableNow). Returns the finished query for inspection.
    */
  def runOnce(
      spark: SparkSession,
      inDir: String,
      schema: StructType,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    val in = spark.readStream
      .schema(schema)
      .option("multiLine", "true") // cricsheet-style pretty-printed JSON
      .json(inDir)
    val flattened = Flatten.flatten(in)
    val q = flattened.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Watermarked tumbling-window aggregation over an event stream —
    * the streaming form of the `stream_tumbling` batch query. Late
    * rows beyond the 2h watermark are dropped from state.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Watermarked streaming dedup on (user_id, event_type) — the
    * streaming form of `stream_dedup`, with state bounded by the
    * watermark.
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-stream interval join (§2.10): purchases attributed to the
    * same user's signups within the preceding hour. Watermarks on BOTH
    * sides let Spark drop join state older than watermark + interval —
    * the state bound that makes a stream-stream join runnable forever.
    * Expects columns (p_user, p_id, p_ts) / (s_user, s_id, s_ts); the
    * batch-mode equivalent is the oracle-checked `stream_join` query.
    */
  def purchaseAttribution(purchases: DataFrame, signups: DataFrame): DataFrame =
    purchases.withWatermark("p_ts", "2 hours")
      .join(signups.withWatermark("s_ts", "2 hours"),
        expr("p_user = s_user AND s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 1 HOUR"))

  /** Idempotent per-micro-batch warehouse write: rows land tagged with
    * their batch id, and any rows a CRASHED PRIOR ATTEMPT of the same
    * batch left behind are deleted first — so a retried micro-batch
    * replaces itself instead of duplicating. Combined with the
    * checkpoint (which never re-runs a COMMITTED batch), the JDBC sink
    * is exactly-once end to end, closing the at-least-once gap plain
    * `foreachBatch` + append leaves open.
    */
  def upsertBatch(
      batch: DataFrame,
      batchId: Long,
      url: String,
      table: String,
      props: java.util.Properties): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      // quoted: Spark's JDBC writer creates the column quoted, and
      // unquoted lower-case would not resolve against it on Derby
      try st.executeUpdate(s"""DELETE FROM $table WHERE "load_batch_id" = $batchId""")
      catch {
        case e: java.sql.SQLException =>
          // Only the first-load "table does not exist" failure may be
          // swallowed. Any OTHER failure (lock timeout, permissions,
          // connectivity) must rethrow: if a crashed prior attempt's
          // rows survive an ignored DELETE error, the append below
          // would duplicate them — silently breaking exactly-once.
          // Existence is checked via connection metadata rather than
          // vendor SQLStates so the guard is driver-agnostic.
          if (tableExists(conn, table)) throw e
      } finally st.close()
    } finally conn.close()
    graft.sources.Sinks.loadJdbc(
      batch.withColumn("load_batch_id", lit(batchId)), url, table, props)
  }

  /** Does `table` exist, per JDBC connection metadata? Handles an
    * optional `schema.table` qualifier; unquoted identifiers are
    * stored upper-case by Derby (and most ANSI-folding databases), so
    * both the given and upper-cased spellings are probed.
    *
    * `getTables`' schema/table arguments are LIKE patterns — `_`
    * matches ANY character, and every warehouse table here contains
    * `_` — so a bare `rs.next()` on the probe would let a
    * similarly-named table (`eventsXwh` for `events_wh`) make a
    * MISSING table appear to exist, rethrowing the benign first-load
    * DELETE failure and crashing the stream's first batch. Escaping
    * the pattern is NOT portable (Derby declares an empty search
    * escape and treats a backslash literally), so the probe instead
    * uses the raw name as an over-matching prefilter and compares the
    * returned TABLE_NAME/TABLE_SCHEM for exact equality — correct
    * under any driver's LIKE dialect, since over-matching can only add
    * false candidates, never drop the true one.
    */
  private[streaming] def tableExists(conn: java.sql.Connection, table: String): Boolean = {
    val md = conn.getMetaData
    val (schema, name) = table.lastIndexOf('.') match {
      case -1 => (null: String, table)
      case i  => (table.substring(0, i), table.substring(i + 1))
    }
    def probe(s: String, n: String): Boolean = {
      val rs = md.getTables(null, s, n, null)
      try {
        var found = false
        while (!found && rs.next())
          found = rs.getString("TABLE_NAME") == n &&
            (s == null || rs.getString("TABLE_SCHEM") == s)
        found
      } finally rs.close()
    }
    probe(schema, name) || probe(
      if (schema == null) null else schema.toUpperCase(java.util.Locale.ROOT),
      name.toUpperCase(java.util.Locale.ROOT))
  }

  /** Stream → parquet with PERIODIC COMPACTION — the streaming
    * counterpart of `Pipeline.maintain`. A long-running (or
    * frequently re-triggered) stream accretes one small-file pile per
    * micro-batch; this sink writes each batch into its own
    * `load_batch_id=` partition via dynamic partition overwrite — a
    * RETRIED batch replaces its own partition instead of appending a
    * duplicate, so together with the checkpoint (committed batches
    * never re-run) the sink is exactly-once — and every
    * `compactEvery` batches runs `Sinks.compact` over the output
    * WITH the partition column preserved. Preserving the partition
    * dirs is what keeps compaction safe here: a crashed attempt's
    * partition stays its own partition through compaction, and the
    * retry's dynamic overwrite still replaces exactly that directory.
    * Compaction runs at the START of a batch body, when every row on
    * disk belongs to a committed batch or to a crashed attempt of the
    * CURRENT one — never mid-append.
    *
    * Unlike the built-in parquet streaming sink, foreachBatch leaves
    * no `_spark_metadata` log, so plain `spark.read.parquet(outDir)`
    * sees the compacted layout directly (the built-in sink's log
    * pins exact file names, which a compactor must not rewrite).
    * Reader caveat inherited from `Sinks.compact`: schedule readers
    * off the compaction instant or point them at a manifest layer.
    */
  def parquetSink(
      df: DataFrame,
      outDir: String,
      checkpointDir: String,
      compactEvery: Int = 0,
      targetBytes: Long = 128L * 1024 * 1024): StreamingQuery = {
    val q = df.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
          // Unconditional: Sinks.compact no-ops when nothing is
          // staged, and — critically — its recovery preamble restores
          // the `.compact_old` leftover of a compaction that crashed
          // between its two renames. A caller-side fs.exists(outDir)
          // guard here would skip that recovery and let this batch's
          // write recreate outDir, after which a later compaction's
          // cleanup would delete the only remaining copy of the
          // committed batches.
          val (before, after) =
            graft.sources.Sinks.compact(spark, outDir, targetBytes,
              partitionBy = Seq("load_batch_id"))
          org.slf4j.LoggerFactory.getLogger(getClass)
            .info(s"[stream-maintain] batch $batchId: compacted $outDir " +
              s"$before -> $after files")
        }
        batch.withColumn("load_batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("load_batch_id")
          .parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Stream → warehouse with exactly-once semantics: each available
    * micro-batch flows through [[upsertBatch]] under the checkpoint's
    * batch-id ledger. AvailableNow: processes what has arrived, then
    * terminates — the reference's daily-batch cadence.
    */
  def warehouseSink(
      df: DataFrame,
      url: String,
      table: String,
      props: java.util.Properties,
      checkpointDir: String): StreamingQuery = {
    val q = df.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        upsertBatch(batch.toDF(), batchId, url, table, props)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Per-user running profile maintained with explicit state. */
  case class UserProfile(user_id: Long, n_events: Long, total_value: Double, last_type: String)

  /** Projected event row for the stateful operator (must be public —
    * encoder-generated code can't access private classes).
    */
  case class Ev(user_id: Long, event_type: String, value: Double)

  /** Custom keyed state via flatMapGroupsWithState (§2.10 declared
    * surface): incrementally maintained per-user profiles, emitting
    * the updated profile per micro-batch. Works identically over a
    * live stream or (in tests) a bounded stream drained with the
    * memory sink. State eviction in production would add a timeout
    * (ProcessingTime/EventTime) — with a drain-once test harness the
    * extra timeout-driven batches would deadlock processAllAvailable,
    * so the operator keeps NoTimeout and leaves eviction policy to
    * the caller's watermark configuration.
    */
  def userProfiles(events: DataFrame): Dataset[UserProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserProfile, UserProfile](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[UserProfile]) =>
          val prev = state.getOption.getOrElse(UserProfile(uid, 0L, 0.0, ""))
          val updated = rows.foldLeft(prev) { (p, e) =>
            UserProfile(uid, p.n_events + 1,
              // decimal add: order-independent across micro-batches
              (BigDecimal(p.total_value) + BigDecimal(e.value)).toDouble,
              e.event_type)
          }
          state.update(updated)
          Iterator.single(updated)
      }
  }
}
