package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FlattenSpec extends SparkSpecBase {
  import spark.implicits._

  test("flatten expands structs to parent_child columns") {
    val df = Seq((1L, (2.5, "x"))).toDF("id", "s")
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSeq == Seq("id", "s__1", "s__2"))
    assert(flat.collect().head.toSeq == Seq(1L, 2.5, "x"))
  }

  test("flatten explodes arrays one row per element") {
    val df = Seq((1L, Seq("a", "b", "c"))).toDF("id", "arr")
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSeq == Seq("id", "arr"))
    assert(flat.count() == 3)
  }

  test("flatten reaches fix-point on deep nesting (struct in array in struct)") {
    val df = Seq((1L, ("top", Seq((10, ("deep", 99)))))).toDF("id", "outer")
    val flat = Flatten.flatten(df)
    assert(Flatten.nestedColumns(flat).isEmpty)
    assert(flat.count() == 1)
  }

  test("plain explode drops rows with empty arrays; outer keeps them") {
    val df = Seq((1L, Seq("a")), (2L, Seq.empty[String])).toDF("id", "arr")
    assert(Flatten.flatten(df).count() == 1)
    val outer = Flatten.flatten(df, outer = true)
    assert(outer.count() == 2)
    assert(outer.filter($"id" === 2 && $"arr".isNull).count() == 1)
  }

  test("name collisions get a fresh suffix instead of shadowing") {
    val df = Seq((1, 5, 7)).toDF("a_b", "x", "y")
      .withColumn("a", struct($"x".as("b")))
      .select($"a_b", $"a")
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSeq == Seq("a_b", "a_b_1"))
    assert(flat.collect().head.toSeq == Seq(1, 5))
  }

  test("maps flatten to key/value rows") {
    val df = Seq((1L, Map("k1" -> 10, "k2" -> 20))).toDF("id", "m")
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSeq == Seq("id", "m_key", "m_value"))
    assert(flat.count() == 2)
  }

  test("cricsheet match_tiny: sibling-array cross product, expected columns") {
    val df = spark.read.option("multiLine", "true").json(fixture("match_tiny.json"))
    val flat = Flatten.flatten(df)
    // arrays multiply: teams(2) × innings(1) × overs(1) × deliveries(2)
    assert(flat.count() == 4)
    val cols = flat.columns.toSet
    assert(cols.contains("info_city"))
    assert(cols.contains("innings_overs_deliveries_runs_total"))
    // each delivery appears twice (teams explosion): (4+1) × 2
    assert(flat.agg(sum($"innings_overs_deliveries_runs_total")).head.getLong(0) == 10L)
  }

  test("cricsheet match_full: reference explode semantics vs outer") {
    val df = spark.read.option("multiLine", "true").json(fixture("match_full.json"))
    // plain explode: only the wicket-bearing delivery survives the
    // wickets explosion; dates(2) × teams(2) × fielders(2) = 8
    assert(Flatten.flatten(df).count() == 8)
    // outer explode: dates(2) × teams(2) × (11 wicketless + 1×2 fielders)
    assert(Flatten.flatten(df, outer = true).count() == 52)
  }

  test("empty input directory yields empty output (reference guard path)") {
    val dir = tmpDir("flatten_empty")
    val schema = StructType(Seq(StructField("a", StructType(Seq(StructField("b", LongType))))))
    val df = spark.read.schema(schema).option("multiLine", "true").json(dir)
    val flat = Flatten.flatten(df)
    assert(flat.isEmpty)
    assert(Flatten.nestedColumns(flat).isEmpty)
  }
}
