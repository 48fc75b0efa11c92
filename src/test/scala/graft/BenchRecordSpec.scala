package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the compact stdout record's two contract properties (the
  * driver keeps ~2000 chars of console tail and parses the last JSON
  * line in it — every round through r12 recorded `parsed: null`
  * because some line broke one of these):
  *
  *  1. it is valid JSON (checked with Spark's bundled Jackson — the
  *     same family of parser the recorder uses), and
  *  2. at the FULL current inventory size, with worst-case inputs
  *     (the longest real query names slowest, a mass failure, large
  *     values), it stays under [[BenchRecord.MaxLen]] — so growth of
  *     the inventory or of a field can never silently push the line
  *     back out of the tail window.
  */
class BenchRecordSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parse(s: String): com.fasterxml.jackson.databind.JsonNode = {
    val n = mapper.readTree(s)
    assert(n != null && n.isObject, s"not a JSON object: ${s.take(200)}")
    n
  }

  private def worstCaseResults(): Seq[(String, Double)] = {
    // real inventory, worst-case values: the 5 longest names get the
    // largest times (they land in slowest5 verbatim), 20 queries fail
    // (only 8 + a count survive into the compact line), everything
    // else carries a 4-digit-seconds value
    val names = SparkEntry.queries.keys.toSeq.sortBy(n => (-n.length, n))
    names.zipWithIndex.map { case (n, i) =>
      if (i < 5) n -> (9999.999 - i)
      else if (i < 25) n -> -1.0
      else n -> 1234.567
    }
  }

  test("compact line parses as JSON and carries the gate arithmetic") {
    val line = BenchRecord.compactLine(
      Seq("agg_count" -> 1.5, "join_inner" -> 3.25, "bad_query" -> -1.0),
      cpuTotal = 4.0, gcTotal = 0.5, syncSec = 1.2,
      bucketStats = Seq("lsh_max_band_bucket" -> 12L),
      snapshotFile = "BENCH_LOCAL_LATEST.json", sfDir = "/tmp/sf")
    val n = parse(line)
    assert(n.get("metric").asText == "total")
    assert(math.abs(n.get("value").asDouble - 4.75) < 1e-9)
    assert(n.get("n_queries").asInt == 3)
    assert(n.get("worst_query").asText == "join_inner")
    assert(math.abs(n.get("mean_sec_per_query").asDouble - 2.375) < 1e-9)
    assert(n.get("failed").size == 1)
    assert(n.get("slowest5").size == 2)
    assert(n.get("bucket_stats").get("lsh_max_band_bucket").asLong == 12L)
  }

  test("compact line stays under the tail window at the full inventory, worst case") {
    val line = BenchRecord.compactLine(
      worstCaseResults(), cpuTotal = 99999.999, gcTotal = 9999.999,
      syncSec = 999.9,
      bucketStats = Seq("simhash_max_band_bucket" -> 999999L,
        "lsh_max_band_bucket" -> 999999L, "lsh_capped_buckets" -> 999999L),
      snapshotFile = "BENCH_LOCAL_LATEST.json",
      sfDir = "/root/testdata/sf0.1")
    parse(line)
    assert(line.length <= BenchRecord.MaxLen,
      s"compact line ${line.length} chars > ${BenchRecord.MaxLen}: it " +
        "would risk truncation in the recorder's tail capture")
    assert(!line.contains("\n"))
  }

  test("a mass failure caps the compact failed list at 8 + a count") {
    val results = (1 to 50).map(i => f"query_$i%02d" -> -1.0) :+ ("ok_one" -> 1.0)
    val line = BenchRecord.compactLine(results, 1.0, 0.0, -1.0, Nil,
      "BENCH_LOCAL_SUBSET.json", "/tmp/sf")
    val n = parse(line)
    assert(n.get("failed").size == 9)
    assert(n.get("failed").get(8).asText == "+42 more")
    assert(n.get("n_queries").asInt == 51)
  }
}
