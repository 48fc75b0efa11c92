package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** BoundedLevenshteinRule: the rewrite must be visible in the
  * optimized plan (banded threshold + length guard) and must never
  * change results — the session under test carries the rule via
  * GraftSparkExtensions, so every fixture here runs through it.
  */
class OptimizerRuleSpec extends SparkSpecBase {
  import spark.implicits._

  private val pairs = Seq(
    ("kitten", "sitting"),     // distance 3
    ("flaw", "lawn"),          // distance 2
    ("abc", "abc"),            // distance 0
    ("a", "abcdefghij"),       // length gap 9 — guard refutes k<9 in O(1)
    ("", "xyz"),               // distance 3 from empty
    ("same-length", "sane-length")) // distance 1

  test("filter on levenshtein <= k rewrites to length guard + banded DP") {
    // parquet-backed input: a filter over a LocalRelation is
    // constant-folded away before the rewritten plan could show
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val df = docs.filter(levenshtein($"lang", $"source") <= 2)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("Some(2)) >= 0"), s"banded threshold form missing:\n$opt")
    assert(opt.contains("abs(") && opt.contains("length("),
      s"length guard missing:\n$opt")
  }

  test("rewrite preserves results across bounds (vs driver-side truth)") {
    def truth(k: Int): Set[(String, String)] = {
      def lev(x: String, y: String): Int = {
        val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to x.length; j <- 1 to y.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
        d(x.length)(y.length)
      }
      pairs.filter { case (x, y) => lev(x, y) <= k }.toSet
    }
    for (k <- 0 to 4) {
      // repartition defeats local-relation folding, so the collected
      // rows really flow through the rewritten banded predicate
      val got = pairs.toDF("a", "b").repartition(2)
        .filter(levenshtein($"a", $"b") <= k)
        .as[(String, String)].collect().toSet
      assert(got == truth(k), s"k=$k: $got != ${truth(k)}")
      // strict < form rewrites through the k-1 bound
      val gotLt = pairs.toDF("a", "b").repartition(2)
        .filter(levenshtein($"a", $"b") < k)
        .as[(String, String)].collect().toSet
      assert(gotLt == (if (k == 0) Set.empty else truth(k - 1)), s"< $k: $gotLt")
    }
  }

  test("null inputs drop from the filter exactly as without the rule") {
    val df = Seq(("a", Some("ab")), ("b", None), ("abc", Some("abc")))
      .toDF("a", "b").repartition(2).filter(levenshtein($"a", $"b") <= 1)
    assert(df.as[(String, String)].collect().toSet == Set(("a", "ab"), ("abc", "abc")))
  }

  test("fuzzy_match query plans through the banded rewrite") {
    val df = graft.SparkEntry.queries("fuzzy_match")(spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("Some(10)) >= 0"),
      s"fuzzy_match not rewritten:\n${opt.take(3000)}")
  }
}
