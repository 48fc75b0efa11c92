package graft.queries

import graft.{SparkEntry, SparkSpecBase}
import org.apache.spark.sql.functions._

/** Null-injection robustness: every declared query must execute
  * against a corpus where ~a third of every NON-KEY column is NULL
  * (keys stay intact — null keys are a data-contract violation, null
  * attributes are Tuesday). Queries may drop, null-propagate, or
  * bucket the null rows however their semantics dictate; they may
  * not throw. This is the 100 TB reality check the clean fixtures
  * cannot give: a single null-intolerant expression in a corpus-wide
  * scan kills the whole job.
  */
class NullInputSpec extends SparkSpecBase {
  import spark.implicits._

  test("every declared query survives a null-ridden corpus") {
    val src = "/root/testdata/sf0.001"
    val dir = tmpDir("null_corpus")
    def nullify(c: String, keyed: org.apache.spark.sql.Column) =
      when(keyed % 3 === 0, lit(null)).otherwise(col(c)).as(c)
    graft.Tables.all.foreach { t =>
      val df = if (t == "events") graft.Tables.events(spark, src)
        else graft.Tables.t(spark, src, t)
      val keyCol = t match {
        case "events"     => col("event_id")
        case "documents"  => col("doc_id")
        case "embeddings" => col("vec_id")
        case "region"     => col("r_regionkey")
        case "nation"     => col("n_nationkey")
        case "customer"   => col("c_custkey")
        case "supplier"   => col("s_suppkey")
        case "part"       => col("p_partkey")
        case "orders"     => col("o_orderkey")
        case "lineitem"   => col("l_orderkey")
      }
      val keyNames = Set("event_id", "doc_id", "vec_id", "r_regionkey",
        "n_nationkey", "c_custkey", "s_suppkey", "p_partkey", "o_orderkey",
        "l_orderkey", "l_linenumber", "user_id", "o_custkey", "l_partkey",
        "l_suppkey", "c_nationkey", "s_nationkey", "n_regionkey", "ts")
      val out = df.select(df.columns.map { c =>
        if (keyNames.contains(c)) col(c) else nullify(c, keyCol)
      }: _*)
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures =
      try SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try { fn(spark, dir).count(); None }
          catch {
            case e: Throwable =>
              Some(name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(140)}")
          }
      }
      // see EmptyInputSpec: clear this corpus's memoized tables so
      // session-scoped tags don't leak into the lifecycle test
      finally LlmQueries.clearCaches(Some(spark))
    assert(failures.isEmpty,
      s"${failures.size} queries crash on a null-ridden corpus:\n" +
        failures.map { case (n, m) => s"  $n: $m" }.mkString("\n"))

    // Grouping-family key uniqueness under null injection: a bare
    // coalesce(col, 'ALL') renders a DATA-null group and a TOTAL row
    // with the same label, so two rows share every ORDER BY key and
    // row order (hence the driver hash) flips between engines/runs.
    // The null-corpus oracle sweep only catches this INTERMITTENTLY
    // (it passes whenever both engines happen to break the tie the
    // same way — agg_grouping_sets hid exactly this way in round 11);
    // uniqueness of the rendered keys is the deterministic pin.
    Seq("agg_grouping_sets" -> Seq("status", "priority"),
      "agg_rollup" -> Seq("returnflag", "linestatus"),
      "agg_cube" -> Seq("returnflag", "linestatus")).foreach {
      case (q, keys) =>
        val out = SparkEntry.queries(q)(spark, dir)
        val n = out.count()
        val nk = out.select(keys.map(col): _*).distinct().count()
        assert(n == nk,
          s"$q: ${n - nk} duplicate output keys on the null corpus — " +
            "grouping() disambiguation lost; row order is now engine-dependent")
    }
  }
}
