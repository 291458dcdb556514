package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal access bridge: build a DataFrame from a custom LogicalPlan.
  * `Dataset.ofRows` is private[sql]; this is the standard extension-library
  * door (one forwarding call, nothing else lives in this package).
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): Dataset[org.apache.spark.sql.Row] =
    Dataset.ofRows(spark, plan)
}
