package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the sql package: lets the graft library wrap a custom
  * LogicalPlan as a DataFrame (Dataset.ofRows is private[sql]). The
  * standard mechanism for third-party plan extensions.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
