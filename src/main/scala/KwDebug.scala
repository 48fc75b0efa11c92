import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object KwDebug {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftSparkExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val d = "/root/testdata/sf0.1"
    val ev = graft.Tables.events(s, d)
      .filter($"value".isNotNull)
      .select(coalesce($"event_type", lit("__null__")).as("g"), $"value")
    val pv = ev.groupBy($"value").agg(count(lit(1)).as("n")).withColumn("one", lit(1))
    val run = graft.operators.DistributedNtile.withRunningSum(pv, "one", Seq($"value".asc), $"n", "cum")
    val ranked = run.select($"value",
      (lit(2L) * ($"cum" - $"n") + $"n" + lit(1L)).as("r2"),
      ($"n".cast("decimal(12,0)") * $"n".cast("decimal(12,0)") * $"n".cast("decimal(12,0)") - $"n").cast("decimal(38,0)").as("t3"))
    val rg = ev.groupBy($"g", $"value").agg(count(lit(1)).as("ng"))
      .join(ranked.select($"value", $"r2"), Seq("value"))
      .groupBy($"g").agg(sum($"ng").as("n_g"),
        sum($"ng".cast("decimal(18,0)") * $"r2".cast("decimal(19,0)")).as("r2_g"))
    rg.show(10, false)
    val term = (floor($"r2_g".cast("double") * $"r2_g".cast("double") /
      (lit(4.0) * $"n_g".cast("double")) * 1e6 + 0.5) / 1e6).cast("decimal(38,6)")
    rg.select($"g", $"r2_g".cast("double").as("rd"), term.as("term")).show(10, false)
    rg.agg(sum(term).cast("double").as("sum_s")).show(false)
    s.stop()
  }
}
