package graft.queries

import graft.{SparkEntry, SparkSpecBase}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StructType}

/** SURVEY §1.2: an object with data-dependent keys
  * (info.players.<TeamName>) must be readable BOTH ways — as
  * MAP<STRING, …> under an explicit schema (the map_json_scan query's
  * path) and as the wide StructType schema inference produces. This
  * spec drives both reads over the SAME scratch JSON and pins that
  * the per-key rollup agrees, so neither path can silently decay.
  */
class MapJsonScanSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("explicit MAP schema and inferred wide-struct read agree on the rollup") {
    // the query itself writes the scratch file and returns the
    // map-path rollup
    val viaMap = SparkEntry.queries("map_json_scan")(spark, sf)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(viaMap.nonEmpty, "map-path rollup is empty")
    val path = Q.scratchPath("map_json_scan", sf)

    // inference on the same file: by_type arrives as a wide struct
    // with one field per key observed anywhere in the corpus
    val inferred = spark.read.json(path)
    val byType = inferred.schema("by_type").dataType
    assert(byType.isInstanceOf[StructType],
      s"inference should widen data-dependent keys to a struct, got $byType")
    val fields = byType.asInstanceOf[StructType].fieldNames.toSeq
    assert(fields.size >= 2, s"expected several data-dependent keys, got $fields")

    // flatten the wide struct back to (event_type, n) rows; absent
    // keys are NULL fields and must not count
    val viaStruct = inferred
      .select($"user_id", stack(
        (lit(fields.size) +: fields.flatMap(f =>
          Seq(lit(f), col(s"by_type.`$f`")))): _*)
        .as(Seq("event_type", "n")))
      .filter($"n".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_users"), sum($"n").as("n_events"))
      .as[(String, Long, Long)].collect().sortBy(_._1)

    assert(viaStruct.toSeq == viaMap.toSeq,
      s"struct path ${viaStruct.toSeq} != map path ${viaMap.toSeq}")
  }

  test("explicit MAP schema read returns real MapType rows") {
    SparkEntry.queries("map_json_scan")(spark, sf).collect() // ensure scratch exists
    val path = Q.scratchPath("map_json_scan", sf)
    val df = spark.read
      .schema("user_id BIGINT, by_type MAP<STRING, BIGINT>").json(path)
    assert(df.schema("by_type").dataType.isInstanceOf[MapType])
    val row = df.filter(size($"by_type") >= 2).head()
    val m = row.getMap[String, Long](row.fieldIndex("by_type"))
    assert(m.nonEmpty && m.keys.forall(_.nonEmpty))
  }
}
