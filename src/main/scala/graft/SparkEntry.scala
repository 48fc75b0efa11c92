package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2); every
  * entry is hash-checked against DuckDB on the same parquet tables.
  * The three sketch queries (`agg_approx_distinct`,
  * `agg_approx_percentile`, `sketch_union`) emit engine-independent
  * exact columns plus within-contract-bound booleans, with oracles
  * asserting the exact values and literal TRUE — an affirmative
  * driver check where the raw estimate itself would be
  * non-reproducible outside Spark. `knn_ivf`/`knn_lsh` are
  * approximate vs the true top-k but deterministic given their seeded
  * centroids/planes, so they carry full value oracles.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.defs ++
      JoinStateQueries.defs ++
      WindowSetQueries.defs ++
      StreamQueries.defs ++
      LlmQueries.defs ++
      SourceUdxQueries.defs ++
      ExtraQueries.defs ++
      CorpusOpsQueries.defs ++
      LayoutQueries.defs ++
      AnalyticsQueries.defs ++
      TimeSeriesQueries.defs ++
      CurationQueries.defs ++
      EmbeddingOpsQueries.defs ++
      MlPrepQueries.defs ++
      QaQueries.defs ++
      MediaFingerprintQueries.defs ++
      StatQueries.defs ++
      TpchQueries.defs ++
      TextMatchQueries.defs ++
      ProfilingQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++
      JoinStateQueries.oracles ++
      WindowSetQueries.oracles ++
      StreamQueries.oracles ++
      LlmQueries.oracles ++
      SourceUdxQueries.oracles ++
      ExtraQueries.oracles ++
      CorpusOpsQueries.oracles ++
      LayoutQueries.oracles ++
      AnalyticsQueries.oracles ++
      TimeSeriesQueries.oracles ++
      CurationQueries.oracles ++
      EmbeddingOpsQueries.oracles ++
      MlPrepQueries.oracles ++
      QaQueries.oracles ++
      MediaFingerprintQueries.oracles ++
      StatQueries.oracles ++
      TpchQueries.oracles ++
      TextMatchQueries.oracles ++
      ProfilingQueries.oracles
}
