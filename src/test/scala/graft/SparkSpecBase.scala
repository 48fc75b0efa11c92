package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events may ship TIMESTAMP(NANOS)
      .config("spark.ui.enabled", "false")
      // the production wiring for the engine's Catalyst extensions —
      // the whole suite runs through it (SqlSurfaceSpec asserts the
      // injected functions resolve from bare SQL)
      .withExtensions(new graft.plans.GraftSparkExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.operators.BoundedWindow.muteNoPartitionWarning()
    s
  }
}

abstract class SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
