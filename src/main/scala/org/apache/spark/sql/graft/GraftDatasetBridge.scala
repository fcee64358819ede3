package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into the package-private Dataset factory: building a DataFrame
  * from a custom LogicalPlan node (graft.plans.FulfillmentNode) requires
  * Dataset.ofRows, which is private[sql]. Lives under org.apache.spark.sql
  * for access; contains no logic.
  */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
