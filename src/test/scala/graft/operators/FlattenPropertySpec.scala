package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests (SURVEY.md §5.3): flatten terminates on arbitrary
  * nested schemas and leaves no nested types. Schemas are checked
  * structurally (no data needed — flatten is a plan builder driven
  * only by the schema). Uses ScalaCheck's own runner (no
  * scalatestplus bridge in the dependency set).
  */
class FlattenPropertySpec extends SparkSpecBase {

  private val atomicGen: Gen[DataType] =
    Gen.oneOf(LongType, StringType, DoubleType, BooleanType, IntegerType)

  private def dataTypeGen(depth: Int): Gen[DataType] =
    if (depth <= 0) atomicGen
    else Gen.frequency(
      3 -> atomicGen,
      2 -> Gen.lzy(structGen(depth - 1).map(s => s: DataType)),
      2 -> Gen.lzy(dataTypeGen(depth - 1).map(ArrayType(_, containsNull = true))),
      1 -> Gen.lzy(dataTypeGen(depth - 1).map(MapType(StringType, _))))

  private def structGen(depth: Int): Gen[StructType] =
    for {
      n <- Gen.choose(1, 4)
      names <- Gen.listOfN(n, Gen.identifier.map(_.take(6))).map(_.distinct)
      types <- Gen.listOfN(names.size, dataTypeGen(depth))
    } yield StructType(names.zip(types).map { case (nm, t) => StructField(nm, t) })

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("flatten terminates and removes all nested types, names stay unique") {
    check(Prop.forAll(structGen(3)) { schema =>
      val df = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      val flat = Flatten.flatten(df)
      Flatten.nestedColumns(flat).isEmpty &&
        flat.columns.distinct.length == flat.columns.length
    }, 30)
  }

  test("flatten of an already-flat schema is identity") {
    check(Prop.forAll(structGen(0)) { schema =>
      val df = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      Flatten.flatten(df).schema == df.schema
    }, 20)
  }
}
