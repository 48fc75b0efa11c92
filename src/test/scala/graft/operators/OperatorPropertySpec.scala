package graft.operators

import graft.SparkSpecBase
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the state/schema operators (SURVEY.md §5.3):
  * schema_diff partitions column sets exactly; anti-join ∘ union is
  * idempotent for the dedup path.
  */
class OperatorPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val colsGen: Gen[Map[String, String]] = for {
    n <- Gen.choose(0, 8)
    names <- Gen.listOfN(n, Gen.alphaLowerStr.map(s => "c" + s.take(5))).map(_.distinct)
    types <- Gen.listOfN(names.size, Gen.oneOf("bigint", "string", "double"))
  } yield names.zip(types).toMap

  test("schema_diff partitions into added/dropped/retyped/unchanged exactly") {
    check(Prop.forAll(colsGen, colsGen) { (oldC, newC) =>
      val diff = SchemaDiff.diffDf(
        oldC.toSeq.map { case (n, t) => ColumnMeta(n, t) }.toDF(),
        newC.toSeq.map { case (n, t) => ColumnMeta(n, t) }.toDF())
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val names = oldC.keySet ++ newC.keySet
      diff.keySet == names && names.forall { n =>
        val want =
          if (!oldC.contains(n)) "added"
          else if (!newC.contains(n)) "dropped"
          else if (oldC(n) != newC(n)) "retyped"
          else "unchanged"
        diff(n) == want
      }
    }, 25)
  }

  test("dedup (anti-join then union) is idempotent") {
    val keysGen = Gen.listOf(Gen.choose(0, 30).map(i => s"f$i")).map(_.distinct)
    check(Prop.forAll(keysGen, keysGen) { (existing, incoming) =>
      val e = existing.toDF("file_key")
      val i = incoming.toDF("file_key")
      val once = StateMerge.notYetPresent(i, e).union(e)
      val twice = StateMerge.notYetPresent(i, once).union(once)
      once.as[String].collect().sorted.toSeq == twice.as[String].collect().sorted.toSeq
    }, 20)
  }
}
