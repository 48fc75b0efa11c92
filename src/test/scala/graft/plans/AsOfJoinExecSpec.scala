package graft.plans

import graft.{SparkSpecBase, Tables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The native as-of operator (logical node → strategy → merge exec)
  * must agree row-for-row with the composed window formulation, plan
  * without a window, and exploit pre-bucketed/sorted inputs with no
  * exchange.
  */
class AsOfJoinExecSpec extends SparkSpecBase {
  import spark.implicits._

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val sf = "/root/testdata/sf0.001"

  private def purchases = Tables.events(spark, sf)
    .filter($"event_type" === "purchase")
    .select($"user_id", $"event_id", $"ts")
  private def signups = Tables.events(spark, sf)
    .filter($"event_type" === "signup")
    .select($"user_id", $"event_id".as("signup_id"), $"ts".as("signup_ts"))

  test("native as-of equals the composed operator on events (self-join shape)") {
    val composed = AsOfJoin.asofJoin(purchases, signups, "user_id", "ts", "signup_ts")
    val native = AsOfJoin.asofJoinNative(purchases, signups, "user_id", "ts", "signup_ts")
    assert(native.columns.toSeq == composed.columns.toSeq)
    val key = Seq("user_id", "event_id")
    assert(native.count() == composed.count())
    assert(native.except(composed).isEmpty && composed.except(native).isEmpty,
      s"row mismatch; only-native=${native.except(composed).count()}, " +
        s"only-composed=${composed.except(native).count()}; key=$key")
  }

  test("native as-of equals a driver-side reference on random data") {
    val gen = for {
      nl <- Gen.choose(0, 30)
      nr <- Gen.choose(0, 30)
      ls <- Gen.listOfN(nl, for {
        k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 20L); id <- Gen.choose(0L, 999L)
      } yield (k, t, id))
      rs <- Gen.listOfN(nr, for {
        k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 20L); v <- Gen.choose(0L, 999L)
      } yield (k, t, v))
    } yield (ls, rs)
    check(Prop.forAll(gen) { case (ls, rs) =>
      val l = ls.toDF("k", "t", "id").repartition(3)
      val r = rs.toDF("k", "rt", "v").repartition(2)
      val got = AsOfJoin.asofJoinNative(l, r, "k", "t", "rt")
        .select($"k", $"t", $"id", $"asof_rt", $"asof_v")
        .as[(Long, Long, Long, Option[Long], Option[Long])].collect().sorted.toSeq
      val want = ls.map { case (k, t, id) =>
        // last right row with rt <= t: max rt, then max v among ties
        // (multiset last-wins is order-dependent in the operator ONLY
        // for duplicate (k, rt) rows, so dedup those to the max v —
        // same convention for got and want would not hold otherwise)
        val cands = rs.filter(rr => rr._1 == k && rr._2 <= t)
        if (cands.isEmpty) (k, t, id, None: Option[Long], None: Option[Long])
        else {
          val maxRt = cands.map(_._2).max
          (k, t, id, Some(maxRt), None: Option[Long])
        }
      }.sorted.toSeq
      got.map(x => (x._1, x._2, x._3, x._4)).sorted ==
        want.map(x => (x._1, x._2, x._3, x._4)).sorted
    }, 20)
  }

  test("null keys and null times never match, identically to the composed form") {
    val l = Seq(
      (Some(1L), Some(10L), 100L),
      (Some(1L), None: Option[Long], 101L), // null left time -> no match
      (None: Option[Long], Some(10L), 102L), // null left key -> no match
      (Some(2L), Some(5L), 103L))
      .toDF("k", "t", "id").repartition(3)
    val r = Seq(
      (Some(1L), Some(9L), 900L),
      (Some(1L), None: Option[Long], 901L), // null right time: invisible
      (None: Option[Long], Some(1L), 902L), // null right key: invisible
      (Some(2L), Some(6L), 903L))           // after left t=5: invisible
      .toDF("k", "rt", "v").repartition(2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"asof_rt", $"asof_v")
        .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
    val native = rows(AsOfJoin.asofJoinNative(l, r, "k", "t", "rt"))
    val composed = rows(AsOfJoin.asofJoin(l, r, "k", "t", "rt"))
    assert(native == composed, s"native=$native composed=$composed")
    assert(native == Seq(
      (100L, Some(9L), Some(900L)), // normal match
      (101L, None, None), (102L, None, None), (103L, None, None)))
  }

  test("native plan: AsOfJoinExec, no Window; composed plan: Window") {
    val native = AsOfJoin.asofJoinNative(purchases, signups, "user_id", "ts", "signup_ts")
    val np = native.queryExecution.executedPlan.toString
    assert(np.contains("AsOfJoin"), np.take(2000))
    assert(!np.contains("Window"), s"native as-of planned a window:\n${np.take(2000)}")
    val cp = AsOfJoin.asofJoin(purchases, signups, "user_id", "ts", "signup_ts")
      .queryExecution.executedPlan.toString
    assert(cp.contains("Window"))
  }

  test("bucketed, sorted inputs join with zero exchanges") {
    purchases.write.mode("overwrite").bucketBy(4, "user_id")
      .sortBy("user_id", "ts").saveAsTable("asof_l")
    signups.write.mode("overwrite").bucketBy(4, "user_id")
      .sortBy("user_id", "signup_ts").saveAsTable("asof_r")
    try {
      val native = AsOfJoin.asofJoinNative(
        spark.table("asof_l"), spark.table("asof_r"), "user_id", "ts", "signup_ts")
      native.collect()
      val p = native.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed as-of still shuffled:\n${p.take(3000)}")
      // same rows as the plain-input native join
      val plain = AsOfJoin.asofJoinNative(purchases, signups, "user_id", "ts", "signup_ts")
      assert(native.except(plain).isEmpty && plain.except(native).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_l")
      spark.sql("DROP TABLE IF EXISTS asof_r")
    }
  }

  test("mismatched key/time types fail at node construction, not in the merge loop") {
    val l = Seq((1L, 1L)).toDF("k", "t").queryExecution.analyzed
    val r = Seq(("x", 2.0)).toDF("rk", "rt").queryExecution.analyzed
    val Seq(lk, lt) = l.output
    val Seq(rk, rt) = r.output
    val keyErr = intercept[IllegalArgumentException] {
      AsOfJoinNode(l, r, lk, lt, rk, rt)
    }
    assert(keyErr.getMessage.contains("key types differ"), keyErr.getMessage)
    // same-typed keys but mismatched time types also refuse
    val r2 = Seq((2L, 2.0)).toDF("rk", "rt").queryExecution.analyzed
    val Seq(rk2, rt2) = r2.output
    val timeErr = intercept[IllegalArgumentException] {
      AsOfJoinNode(l, r2, lk, lt, rk2, rt2)
    }
    assert(timeErr.getMessage.contains("time types differ"), timeErr.getMessage)
  }
}
