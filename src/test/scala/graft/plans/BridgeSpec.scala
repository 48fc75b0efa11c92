package graft.plans

import graft.SparkSpecBase

/** Pins every internal-Spark-API coupling point in one suite, so a
  * Spark minor upgrade that moves any of them fails HERE, loudly, not
  * as a silent behavior change inside an operator:
  *
  *  - `GraftOfRowsBridge` (Dataset.ofRows for the custom as-of-join
  *    logical node),
  *  - `GraftStateBridge` (lazy StateStoreCoordinator touch for
  *    batch-mode transformWithState),
  *  - `GraftListenerBridge` (LiveListenerBus drain for the bench's
  *    per-query CPU/GC attribution),
  *  - the catalyst `BloomFilterMightContain` construction behind
  *    `BloomFunctions.mightContain`.
  *
  * Each coupling also has a behavioral spec elsewhere; this suite is
  * the one-read answer to "did the Spark upgrade break a bridge?".
  */
class BridgeSpec extends SparkSpecBase {

  test("Dataset.ofRows bridge resolves and wraps a logical plan") {
    val df = spark.range(3).toDF("id")
    val wrapped = org.apache.spark.sql.GraftOfRowsBridge
      .ofRows(spark, df.queryExecution.logical)
    assert(wrapped.count() == 3)
  }

  test("StateStoreCoordinator bridge touch succeeds on a batch session") {
    org.apache.spark.sql.GraftStateBridge.ensureStateStoreCoordinator(spark)
  }

  test("listener-bus drain bridge delivers queued events before returning") {
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        seen.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.range(100).repartition(4).selectExpr("sum(id)").collect()
      org.apache.spark.GraftListenerBridge.drainListenerBus(spark.sparkContext)
      assert(seen.get() > 0, "no task-end events delivered after drain")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("catalyst BloomFilterMightContain construction still evaluates") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = spark.range(100).toDF("id")
    val bloom = lit(BloomFunctions.serialize(ids.stat.bloomFilter("id", 100, 0.01)))
    BloomFunctions.register(spark)
    val hit = ids.filter(BloomFunctions.mightContain(bloom, $"id")).count()
    assert(hit == 100) // Bloom filters have no false negatives
  }
}
