package graft

import org.apache.spark.sql.functions._

/** Regression guard for the fixture-encoding hazard: `events.ts` has
  * shipped as TIMESTAMP(NANOS) (read as long via the legacy flag),
  * plain timestamp[us] (TIMESTAMP_NTZ), and could ship as session-tz
  * TimestampType — a driver-side testdata regeneration swapped
  * encodings between rounds and silently broke all 37 events-based
  * queries for a full round. The loader must normalize every encoding
  * to the same session-tz TimestampType with identical epoch values.
  */
class TablesSpec extends SparkSpecBase {
  import spark.implicits._

  private val epochUs = Seq(1700000000000000L, 1700000123456789L)

  private def writeAndLoad(dir: String)(write: String => Unit): Seq[Long] = {
    write(dir)
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"loader must normalize to TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros($"ts")).as[Long].collect().sorted.toSeq
  }

  test("events loader normalizes nanos-long, NTZ, and LTZ encodings identically") {
    val root = java.nio.file.Files.createTempDirectory("tables_spec").toString
    // nanos-as-long: a raw long column named ts (what the legacy flag
    // yields for TIMESTAMP(NANOS)); loader floors nanos -> micros
    val fromNanos = writeAndLoad(s"$root/nanos") { d =>
      epochUs.map(us => Tuple1(us * 1000 + 999)) // sub-us residue must floor away
        .toDF("ts").write.parquet(s"$d/events.parquet")
    }
    // TIMESTAMP_NTZ (timestamp[us] without timezone — the current
    // fixture encoding)
    val fromNtz = writeAndLoad(s"$root/ntz") { d =>
      epochUs.map(Tuple1(_)).toDF("us")
        .select(timestamp_micros($"us").cast("timestamp_ntz").as("ts"))
        .write.parquet(s"$d/events.parquet")
    }
    // session-tz TimestampType (pass-through)
    val fromLtz = writeAndLoad(s"$root/ltz") { d =>
      epochUs.map(Tuple1(_)).toDF("us")
        .select(timestamp_micros($"us").as("ts"))
        .write.parquet(s"$d/events.parquet")
    }
    assert(fromNanos == epochUs.sorted, s"nanos path: $fromNanos")
    assert(fromNtz == epochUs.sorted, s"ntz path: $fromNtz")
    assert(fromLtz == epochUs.sorted, s"ltz path: $fromLtz")
  }
}
