package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistributedNtile must equal Spark's own ntile() for every group
  * size / bucket-count combination — including the skewed fixture
  * (one group holding ~90% of rows) that motivates it, and the
  * cnt < n edge where buckets go empty.
  */
class DistributedNtileSpec extends SparkSpecBase {
  import spark.implicits._

  private def check(rows: Seq[(String, Long)], n: Int): Unit = {
    val df = rows.toDF("g", "v").repartition(7) // scatter input
    val got = DistributedNtile
      .withNtile(df, "g", Seq($"v".desc, $"g"), n, "t")
      .select($"g", $"v", $"t")
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"g")
    val want = df.withColumn("t", ntile(n).over(w)).select($"g", $"v", $"t")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"n=$n mismatch: got=${got.orderBy($"g", $"v").collect().toSeq}" +
        s" want=${want.orderBy($"g", $"v").collect().toSeq}")
  }

  test("matches ntile() on a 90%-dominant group, ties in the minority") {
    val dominant = (1L to 900L).map(v => ("en", v))
    val minority = (1L to 40L).map(v => ("de", v % 7)) ++
      (1L to 13L).map(v => ("fr", v))
    for (n <- Seq(1, 3, 4)) check(dominant ++ minority, n)
  }

  test("cnt < n leaves trailing buckets empty without dividing by zero") {
    check(Seq(("a", 1L), ("a", 2L), ("b", 9L)), 5)
  }

  test("exact bucket boundaries at cnt % n != 0") {
    // 7 rows / 3 buckets -> sizes 3,2,2 with the extra row in bucket 1
    val rows = (1L to 7L).map(v => ("g", v))
    check(rows, 3)
    val sizes = DistributedNtile
      .withNtile(rows.toDF("g", "v"), "g", Seq($"v".desc), 3, "t")
      .groupBy($"t").count().as[(Int, Long)].collect().toMap
    assert(sizes == Map(1 -> 3L, 2 -> 2L, 3 -> 2L), sizes.toString)
  }
}
