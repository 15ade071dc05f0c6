package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessor for `Dataset.ofRows`, which is private[sql]: graft
  * rewrites analyzed plans (remote-table lookup joins) and needs to
  * wrap the result back into a DataFrame. Lives under
  * org.apache.spark.sql.* solely for package visibility — the standard
  * pattern for Spark extensions that manipulate plans directly. */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
