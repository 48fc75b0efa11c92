package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property guarantee for the skew-free two-phase primitives that
  * eight queries build on (ccnet_buckets, token_budget_trim,
  * auc_eval, ks_test, hist_equidepth, group_quantiles, pareto_front,
  * gini_concentration, compaction_plan): on ARBITRARY skewed grouped
  * data — including empty groups, one-row groups, heavy duplication,
  * and a group holding most rows — each primitive is row-for-row
  * equal to the plain single-partition window it replaces. The
  * equivalence is checked against Spark's own window (not a Scala
  * replay), so it pins the decomposition, not the semantics of
  * ntile/sum/max themselves.
  */
class DistributedNtilePropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // (group, value) rows with deliberate skew: group "a" dominates,
  // values collide often so order ties exercise the unique-key rule
  private val rowsGen: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 120)
    rows <- Gen.listOfN(n, for {
      g <- Gen.frequency(6 -> Gen.const("a"), 2 -> Gen.const("b"),
        1 -> Gen.oneOf("c", "d"))
      v <- Gen.choose(0L, 15L)
    } yield (g, v))
  } yield rows

  test("withNtile equals plain per-group NTILE on skewed data") {
    check(Prop.forAll(rowsGen, Gen.choose(1, 7)) { (rows, nTiles) =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id").repartition(5)
      val got = DistributedNtile
        .withNtile(df, "g", Seq(col("v"), col("id")), nTiles, "t")
        .select("g", "v", "id", "t").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      val want = df.withColumn("t",
        ntile(nTiles).over(Window.partitionBy("g").orderBy("v", "id")))
        .select("g", "v", "id", "t").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      got == want
    }, 15)
  }

  test("withRunningSum equals plain per-group running sum on skewed data") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id").repartition(5)
      val got = DistributedNtile
        .withRunningSum(df, "g", Seq(col("v"), col("id")), col("v"), "rs")
        .select("g", "id", "rs").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = df.withColumn("rs",
        sum(col("v")).over(Window.partitionBy("g").orderBy("v", "id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("g", "id", "rs").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      got == want
    }, 15)
  }

  test("withRunningMaxExcl equals plain exclusive prefix max on skewed data") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id").repartition(5)
      // order DESC on v to exercise the descending-order path
      // pareto_front uses
      val got = DistributedNtile
        .withRunningMaxExcl(df, "g", Seq(col("v").desc, col("id")), col("v"), "rm")
        .select("g", "id", "rm").collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      val want = df.withColumn("rm",
        max(col("v")).over(Window.partitionBy("g").orderBy(col("v").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)))
        .select("g", "id", "rm").collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      got == want
    }, 15)
  }
}
