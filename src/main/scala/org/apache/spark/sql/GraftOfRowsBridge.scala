package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** graft extension bridge. `Dataset.ofRows` — the constructor that
  * turns a LogicalPlan into a DataFrame — is `private[sql]`, so the
  * one call the engine needs (wrapping its custom
  * [[graft.plans.AsOfJoinNode]] logical operator) lives in this
  * package. No Spark internals are reimplemented or copied here; this
  * is the documented extension-library pattern for surfacing a custom
  * logical plan behind a typed public API.
  */
object GraftOfRowsBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
