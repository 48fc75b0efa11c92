package graft.tools

import org.apache.spark.sql.SparkSession

/** Executed-plan skeleton dump for named queries — the audit loop
  * behind PLANS.md: run each query on a small sf dir, then print only
  * the plan lines that matter for the scale review (exchanges, joins,
  * aggregates, windows, scans), so broadcast-vs-shuffle decisions and
  * exchange counts are readable at a glance.
  *
  * `sbt "runMain graft.tools.PlanDump [sfDir] q1 q2 ..."` — with no
  * query names, dumps every declared query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"no such queries: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events may ship TIMESTAMP(NANOS)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftSparkExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("Exchange", "Broadcast", "HashAggregate", "Window",
      "Scan parquet", "Join", "TakeOrdered", "Sort ", "InMemoryTableScan")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.collect() // execute so AQE finalizes the plan
      println(s"==== $n ====")
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => interesting.exists(l.contains))
        .take(30).foreach(println)
    }
    spark.stop()
  }
}
