package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge into the `private[sql]` Dataset constructor so graft's custom
  * logical operators (plans.TopKPerGroupPlan) can be wrapped back into a
  * public DataFrame — the standard extension-library shim; nothing else
  * may live in this package. */
object PlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
