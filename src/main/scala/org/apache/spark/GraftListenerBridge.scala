package org.apache.spark

/** graft extension bridge: the bench attributes executor task CPU /
  * GC time to individual queries by snapshotting a SparkListener
  * counter around each run. Task-end events are delivered to
  * listeners ASYNCHRONOUSLY, so an accurate snapshot needs the
  * `private[spark]` `LiveListenerBus.waitUntilEmpty` drain between
  * queries — the one needed call lives in this package. No Spark
  * internals are reimplemented or copied here. BridgeSpec pins that
  * this accessor still resolves against the shipped Spark version.
  */
object GraftListenerBridge {
  /** Block until all queued listener events have been delivered
    * (bounded by the bus's internal 10 s timeout).
    */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
