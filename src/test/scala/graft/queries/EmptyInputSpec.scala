package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Degenerate-input robustness: every declared query must execute
  * against a ZERO-ROW corpus (all ten tables present with their real
  * schemas, no rows) without throwing — the empty partition, the
  * empty source directory, and the fresh-tenant case all reduce to
  * this. Queries are free to return zero rows (most do) or a single
  * all-null/zero aggregate row; what they may not do is crash the
  * job. Failures print per query so a regression names itself.
  */
class EmptyInputSpec extends SparkSpecBase {

  test("every declared query survives an all-empty corpus") {
    val src = "/root/testdata/sf0.001"
    val dir = tmpDir("empty_corpus")
    graft.Tables.all.foreach { t =>
      val df =
        if (t == "events") graft.Tables.events(spark, src)
        else graft.Tables.t(spark, src, t)
      df.limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures =
      try SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try { fn(spark, dir).count(); None }
          catch {
            case e: Throwable =>
              Some(name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
          }
      }
      // drop this corpus's memoized tables: tags are session-scoped,
      // and leaving them cached pollutes the release-lifecycle test
      // (and holds dead blocks) for the rest of the suite
      finally LlmQueries.clearCaches(Some(spark))
    assert(failures.isEmpty,
      s"${failures.size} queries crash on an empty corpus:\n" +
        failures.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
  }
}
