package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.types._

class SchemaDiffSpec extends SparkSpecBase {

  private val old = StructType(Seq(
    StructField("a", LongType),
    StructField("b", StringType),
    StructField("c", DoubleType)))

  private val neu = StructType(Seq(
    StructField("a", LongType),      // unchanged
    StructField("b", IntegerType),   // retyped
    StructField("d", StringType)))   // added (c dropped)

  test("classifies added / dropped / retyped / unchanged exactly") {
    val got = SchemaDiff.diff(spark, old, neu)
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    assert(got == Map("a" -> "unchanged", "b" -> "retyped", "c" -> "dropped", "d" -> "added"))
  }

  test("diff against self is all unchanged") {
    val got = SchemaDiff.diff(spark, old, old).collect()
    assert(got.forall(_.getString(1) == "unchanged"))
    assert(got.length == 3)
  }

  test("old/new types carried through for report formatting") {
    val rows = SchemaDiff.diff(spark, old, neu).collect()
      .map(r => r.getString(0) -> (Option(r.getString(2)), Option(r.getString(3))))
      .toMap
    assert(rows("b") == (Some("string"), Some("int")))
    assert(rows("c") == (Some("double"), None))
    assert(rows("d") == (None, Some("string")))
  }

  // the composed version-maintenance pass: drifted table notifies its
  // classified changes and keeps every version; clean table notifies
  // nothing and prunes exactly the versions past the top-5
  test("schema_log_gc: drift notifies, clean table prunes past top-5") {
    val rows = graft.SparkEntry.queries("schema_log_gc")(
      graft.SparkTestSession.spark, "/root/testdata/sf0.001").collect()
    val byTbl = rows.groupBy(_.getString(0))
    val ord = byTbl("orders").map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(ord.toSet == Set(
      ("notify", "o_comment", "added"),
      ("notify", "o_orderpriority", "dropped"),
      ("notify", "o_totalprice", "retyped")), ord.mkString(", "))
    val reg = byTbl("region").map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(reg.toSet == Set(
      ("gc", "1", "pruned"), ("gc", "2", "pruned"), ("gc", "3", "pruned")),
      reg.mkString(", "))
  }
}
