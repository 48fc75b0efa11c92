package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Regenerates the raw material for PLANS.md:
  * `sbt "runMain graft.tools.PlanDump [sfDir] [query ...]"` prints the
  * formatted executed plan of each named query (default: the headline
  * set) after execution, so AQE/codegen decisions are final.
  */
object PlanDump {
  private val headline = Seq(
    "agg_group", "join_inner", "join_range", "minhash_dedup",
    "knn_bruteforce", "window_running_sum", "sort_desc")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else headline
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftSparkExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      println(s"===== $n")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
