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
}
