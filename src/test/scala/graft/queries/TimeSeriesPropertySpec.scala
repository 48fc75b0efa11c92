package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the time-series family: the operators' semantic
  * invariants on GENERATED event sequences, independent of the fixed
  * test tables the oracle gate uses.
  */
class TimeSeriesPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // (user, start_ms) interval inputs; ids assigned by index so the
  // ordering tiebreak is total
  private val eventsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 3L)
      st <- Gen.choose(0L, 5000L)
    } yield (u, st))
  } yield rows

  private val HoldMs = 300L

  /** Reference single-threaded interval merge per user. */
  private def mergeRef(rows: List[(Long, Long)]): Map[(Long, Long), (Long, Long, Long)] = {
    rows.groupBy(_._1).flatMap { case (u, rs) =>
      val sorted = rs.map(_._2).sorted
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      for (st <- sorted) {
        val en = st + HoldMs
        if (spans.nonEmpty && st <= spans.last._2)
          spans(spans.size - 1) =
            (spans.last._1, math.max(spans.last._2, en), spans.last._3 + 1)
        else spans += ((st, en, 1L))
      }
      spans.zipWithIndex.map { case ((st, en, c), i) => (u, i + 1L) -> (st, en, c) }
    }
  }

  test("interval_merge: spans are disjoint, ordered, and cover every event") {
    check(Prop.forAll(eventsGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((u, st), i) => (u, i.toLong, st) }
        .toDF("user_id", "event_id", "st")
      // the PRODUCTION merge pipeline — not a re-implementation
      val got = TimeSeriesQueries.mergeSpans(df, HoldMs)
        .select($"user_id", $"span_id", $"cov_start", $"cov_end", $"n_events")
        .as[(Long, Long, Long, Long, Long)]
        .collect()
        .map { case (u, sid, st, en, c) => (u, sid) -> (st, en, c) }
        .toMap
      val want = mergeRef(rows)
      val disjoint = got.groupBy(_._1._1).forall { case (_, spans) =>
        val sorted = spans.toSeq.sortBy(_._2._1).map(_._2)
        sorted.sliding(2).forall {
          case Seq((_, en1, _), (st2, _, _)) => st2 > en1
          case _                             => true
        }
      }
      got == want && disjoint
    }, 20)
  }

  test("seasonal_decompose: components reconstruct y; seasonal constant per hour-of-day") {
    val rows = graft.SparkEntry.queries("seasonal_decompose")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    // additive identity within the stacked 6dp rounding tolerance:
    // det = rnd(y - trend_raw), resid = rnd(det - rnd(seas)), and the
    // emitted trend is itself rounded — three ±5e-7 snaps
    rows.foreach { case (hr, n, y, trend, seas, resid) =>
      assert(n > 0)
      assert(math.abs(y - (trend + seas + resid)) < 5e-6,
        s"hr $hr: $y != $trend + $seas + $resid")
    }
    // the seasonal component is a per-hour-of-day CONSTANT by
    // construction — every row of one hod must carry the same value
    rows.groupBy { case (hr, _, _, _, _, _) => (hr / 3600000) % 24 }
      .foreach { case (hod, rs) =>
        assert(rs.map(_._5).distinct.length == 1,
          s"hod $hod has non-constant seasonal: ${rs.map(_._5).distinct.toSeq}")
      }
    // total hourly n equals the event count
    val total = graft.Tables.events(spark, "/root/testdata/sf0.001").count()
    assert(rows.map(_._2).sum == total)
  }

  test("ema_decay: weights renormalize (constant series → that constant)") {
    // for a constant series the decayed average must return the
    // constant exactly at every position — the den renormalization is
    // what makes short histories unbiased
    val rows = (0 until 20).map(i => (1L, i.toLong, 7.25)).toDF("user_id", "event_id", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"event_id")
    def lagged(k: Int) = if (k == 0) $"v" else lag($"v", k).over(w)
    val num = (0 until 8).map(k => coalesce(lagged(k) * lit(math.pow(0.5, k)), lit(0.0)))
      .reduce(_ + _)
    val den = (0 until 8).map(k =>
        when(lagged(k).isNotNull, lit(math.pow(0.5, k))).otherwise(lit(0.0)))
      .reduce(_ + _)
    val out = rows.select((num / den).as("ema")).as[Double].collect()
    assert(out.forall(_ == 7.25), out.mkString(","))
  }
}
