package org.apache.spark.sql

/** graft extension bridge: batch-mode `transformWithState` needs the
  * driver-side StateStoreCoordinator RPC endpoint, which Spark only
  * registers lazily via the `private[sql]`
  * `StreamingQueryManager.stateStoreCoordinator` (a streaming query
  * start touches it; a pure-batch session never does, and the state
  * store load then fails with RpcEndpointNotFoundException). The one
  * needed touch lives in this package. No Spark internals are
  * reimplemented or copied here.
  */
object GraftStateBridge {
  def ensureStateStoreCoordinator(spark: SparkSession): Unit =
    spark.asInstanceOf[classic.SparkSession].streams.stateStoreCoordinator
}
