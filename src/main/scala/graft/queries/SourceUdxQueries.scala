package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => TF, WeightedMean}
import graft.sources.ZipIngest
import org.apache.spark.sql.functions._
import Q._

/** §2.1 source/sink surface (zip fan-out, file listing) and the §2.9
  * UDx surface (Scala UDF, typed Aggregator UDAF).
  */
object SourceUdxQueries {

  val defs: Map[String, QueryFn] = Map(
    // S2: build a deterministic zip from the corpus, fan its entries
    // out via binaryFile + ZipInputStream, report entry metadata.
    "unzip_fanout" -> ((s, d) => {
      import s.implicits._
      val scratch = Q.scratchPath("zip", d)
      val dir = new java.io.File(scratch)
      dir.mkdirs()
      val rows = Tables.documents(s, d)
        .filter($"doc_id" < 20)
        .select($"doc_id", $"text")
        .orderBy($"doc_id")
        .collect() // 20 rows — bounded ingestion-utility work, not a query path
      val zipFile = new java.io.File(dir, "docs.zip")
      val zout = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipFile))
      rows.foreach { r =>
        val id = r.getLong(0)
        // escape backslash + quote so the entry is valid JSON even if
        // the text carries either (the oracle mirrors both replaces);
        // a NULL text lands as the empty string — same as the
        // coalesce('') convention every text consumer applies
        val text = (if (r.isNullAt(1)) "" else r.getString(1))
          .replace("\\", "\\\\").replace("\"", "\\\"")
        val content = s"""{"doc_id":$id,"text":"$text"}"""
        zout.putNextEntry(new java.util.zip.ZipEntry(s"doc_$id.json"))
        zout.write(content.getBytes("UTF-8"))
        zout.closeEntry()
      }
      zout.close()
      ZipIngest.unzipEntries(s, scratch)
        .select($"entry_name", octet_length($"content").cast("long").as("n_bytes"))
        .orderBy($"entry_name")
    }),

    // S7: object listing with metadata (content pruned from the scan).
    "file_listing" -> ((s, d) => {
      import s.implicits._
      ZipIngest.listFiles(s, d, "*.parquet")
        .select($"file_name")
        .orderBy($"file_name")
    }),

    // Text source round-trip: one line per record (the rawest landing
    // format — logs, crawls). Write side renders "doc_id<TAB>text";
    // read side is spark.read.text (one `value` column), parsed with
    // codegen'd split/substring. Line-oriented text splits by
    // newline at any scale like CSV/JSON. Safe here because normText
    // strips control characters; a general pipeline escapes newlines
    // at landing time.
    "text_scan" -> ((s, d) => {
      import s.implicits._
      val path = Q.scratchPath("text_scan", d)
      // null text coalesces to '' (udtf_flatmap's convention): concat
      // would otherwise yield a NULL line, which the text datasource
      // write rejects — a single null-text doc must not fail the dump
      Tables.documents(s, d)
        .select(concat($"doc_id".cast("string"), lit("\t"),
          TF.normText(coalesce($"text", lit("")))).as("line"))
        .write.mode("overwrite").text(path)
      s.read.text(path)
        .select(
          substring_index($"value", "\t", 1).cast("long").as("doc_id"),
          // exactly one tab per line (normText strips control chars and
          // tabs), so "everything after the last tab" is the full text
          // with no length cap
          substring_index($"value", "\t", -1).as("norm_text"))
        .select($"doc_id", length($"norm_text").as("n_chars"))
        .orderBy($"doc_id")
    }),

    // Schema evolution on read — the engine-side answer to the
    // reference's drift problem (SURVEY §2 J3 detects drift;
    // this op INGESTS across it): two parquet batches with different
    // schemas land in one dataset dir, and a mergeSchema read unions
    // them — old rows surface the new column as NULL, no rewrite of
    // historical files. At 100 TB rewriting history per schema change
    // is a non-starter; union-on-read with per-file schemas is the
    // pattern that scales (footer-only merge cost at planning time).
    "schema_merge_scan" -> ((s, d) => {
      import s.implicits._
      val path = Q.scratchPath("evolving", d)
      val ev = Tables.events(s, d)
      ev.filter($"event_id" % 2 === 0)
        .select($"event_id", $"user_id", dec($"value").as("value"))
        .write.mode("overwrite").parquet(path)
      ev.filter($"event_id" % 2 =!= 0)
        .select($"event_id", $"user_id", dec($"value").as("value"), $"event_type")
        .write.mode("append").parquet(path)
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy(coalesce($"event_type", lit("pre_migration")).as("etype"))
        .agg(count(lit(1)).as("n"),
          sum($"value").cast("double").as("sum_value"))
        .orderBy($"etype")
    }),

    // Scala UDF example. Per-row double arithmetic is IEEE-exact, so
    // the oracle needs no rounding. (Built-ins beat UDFs — this exists
    // to declare the capability; the same expression appears as
    // codegen'd functions in agg_group.)
    "udf_scalar" -> ((s, d) => {
      import s.implicits._
      val effectivePrice = udf((ext: Double, disc: Double, tax: Double) =>
        ext * (1 - disc) * (1 + tax))
      Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_linenumber",
          effectivePrice($"l_extendedprice", $"l_discount", $"l_tax").as("eff_price"))
        .orderBy($"l_orderkey", $"l_linenumber", $"eff_price")
    }),

    // Typed flatMap UDTF — the table-function leg of the §2.9 UDF /
    // UDAF / UDTF triple: arbitrary per-row Scala logic expanding one
    // row into many (here a bounded tokenizer emitting the first 5
    // tokens with ordinals). Runs as a narrow map-partitions stage —
    // no shuffle until the presentation sort — and unlike explode it
    // can carry any imperative logic. For expansions expressible as
    // expressions, prefer doc_chunk's explode form (codegen'd).
    "udtf_flatmap" -> ((s, d) => {
      import s.implicits._
      // NULL text is filtered relationally (the typed lambda would NPE
      // on a null String — unlike Column functions, typed code sees
      // raw nulls); the oracle filters identically
      Tables.documents(s, d)
        .filter($"text".isNotNull)
        .select($"doc_id", $"text").as[(Long, String)]
        .flatMap { case (id, text) =>
          text.split(" ", -1).iterator.take(5).zipWithIndex.map {
            case (t, i) => (id, i + 1L, t)
          }
        }
        .toDF("doc_id", "idx", "tok")
        .orderBy($"doc_id", $"idx")
    }),

    // Typed Aggregator UDAF: weighted mean with exact decimal buffer.
    "udaf_agg" -> ((s, d) => {
      import s.implicits._
      val wmean = udaf(WeightedMean)
      Tables.orders(s, d)
        .select($"o_orderstatus", $"o_totalprice", ($"o_custkey" % 10 + 1).as("w"))
        .groupBy($"o_orderstatus")
        .agg(wmean($"o_totalprice", $"w").as("wmean_price"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderstatus".asc_nulls_last)
    })
  )

  val oracles: Map[String, String] = Map(
    "unzip_fanout" ->
      """SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.json' AS entry_name,
        | CAST(octet_length(encode('{"doc_id":' || CAST(doc_id AS VARCHAR) || ',"text":"' || replace(replace(coalesce(text, ''), '\', '\\'), '"', '\"') || '"}')) AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id < 20 ORDER BY entry_name""".stripMargin,

    "file_listing" ->
      """SELECT * FROM (VALUES ('customer.parquet'), ('documents.parquet'),
        | ('embeddings.parquet'), ('events.parquet'), ('lineitem.parquet'),
        | ('nation.parquet'), ('orders.parquet'), ('part.parquet'),
        | ('region.parquet'), ('supplier.parquet')) AS t(file_name)
        |ORDER BY file_name""".stripMargin,

    "text_scan" ->
      s"""SELECT doc_id, CAST(length(${
        LlmQueries.normOf("coalesce(text, '')")
      }) AS INTEGER) AS n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,

    "schema_merge_scan" ->
      """SELECT coalesce(event_type, 'pre_migration') AS etype,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        | SELECT NULL AS event_type, value FROM events WHERE event_id % 2 = 0
        | UNION ALL
        | SELECT event_type, value FROM events WHERE event_id % 2 <> 0) t
        |GROUP BY etype ORDER BY etype""".stripMargin,

    "udf_scalar" ->
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice * (1 - l_discount) * (1 + l_tax) AS eff_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, eff_price""".stripMargin,

    "udtf_flatmap" ->
      """SELECT doc_id, CAST(idx AS BIGINT) AS idx, tok FROM (
        | SELECT doc_id, generate_subscripts(toks, 1) AS idx, unnest(toks) AS tok
        | FROM (SELECT doc_id, list_slice(string_split(text, ' '), 1, 5) AS toks
        |       FROM documents WHERE text IS NOT NULL) a) b
        |ORDER BY doc_id, idx""".stripMargin,

    // the weight sum skips null-price rows too (their weight guards
    // on the price) — WeightedMean drops the whole row when the value
    // is NULL, like avg(); an unguarded sum(w) would divide by extra
    // weight on a null-bearing corpus
    "udaf_agg" ->
      """SELECT o_orderstatus,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * (o_custkey % 10 + 1)) AS DOUBLE)
        |  / CAST(sum(CASE WHEN o_totalprice IS NULL THEN NULL
        |                  ELSE o_custkey % 10 + 1 END) AS DOUBLE) AS wmean_price,
        | count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
