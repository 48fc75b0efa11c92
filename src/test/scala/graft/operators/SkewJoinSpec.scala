package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("salted join equals the plain inner join") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf).select($"o_orderkey", $"o_orderpriority")
    val plain = li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), dec("l_quantity").cast("double").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = SkewJoin.saltedJoin(li, o, "l_orderkey", "o_orderkey", 8)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), dec("l_quantity").cast("double").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("salt actually spreads a hot key over buckets") {
    val hot = Seq.fill(1000)(1L).toDF("k")
    val dim = Seq((1L, "x")).toDF("dk", "v")
    val joined = SkewJoin.saltedJoin(hot, dim, "k", "dk", 8)
    assert(joined.count() == 1000)
    // the salted big side occupies multiple buckets
    val buckets = hot.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .select($"_salt").distinct().count()
    assert(buckets > 1)
  }

  private def dec(c: String) = sum(col(c).cast("decimal(18,2)"))
}
