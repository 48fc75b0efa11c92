package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("asof join picks the latest right row at or before each left time") {
    val trades = Seq(
      ("A", 10L, 100.0), ("A", 25L, 101.0), ("B", 15L, 200.0), ("B", 5L, 199.0)
    ).toDF("sym", "t", "px")
    val quotes = Seq(
      ("A", 8L, 99.5), ("A", 10L, 99.9), ("A", 20L, 100.5),
      ("B", 10L, 198.0)
    ).toDF("sym", "qt", "bid")

    val got = AsOfJoin.asofJoin(trades, quotes, "sym", "t", "qt")
      .select($"sym", $"t", $"asof_qt", $"asof_bid")
      .as[(String, Long, Option[Long], Option[Double])]
      .collect().map(r => (r._1, r._2) -> (r._3, r._4)).toMap

    assert(got(("A", 10L)) == (Some(10L), Some(99.9)))  // equal time visible
    assert(got(("A", 25L)) == (Some(20L), Some(100.5))) // latest ≤ 25
    assert(got(("B", 15L)) == (Some(10L), Some(198.0)))
    assert(got(("B", 5L))  == (None, None))             // nothing precedes
  }

  test("asof join agrees with the naive per-row subquery on events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts".as("s_ts"), $"event_id".as("s_id"))

    val got = AsOfJoin.asofJoin(purchases, signups, "user_id", "ts", "s_ts")
      .select($"event_id", $"asof_s_id")
      .as[(Long, Option[Long])].collect().toMap

    // naive: max signup ts ≤ purchase ts via join + groupBy
    val naive = purchases.as("p")
      .join(signups.as("s"),
        $"p.user_id" === $"s.user_id" && $"s.s_ts" <= $"p.ts", "left_outer")
      .groupBy($"p.event_id".as("eid"))
      .agg(max(struct($"s.s_ts", $"s.s_id")).as("m"))
      .select($"eid", $"m.s_id")
      .as[(Long, Option[Long])].collect().toMap

    assert(got == naive)
  }
}
