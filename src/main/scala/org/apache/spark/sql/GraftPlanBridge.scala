package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge for constructing a DataFrame from a custom logical plan —
  * `Dataset.ofRows` is private[sql], which is the supported seam for
  * libraries that add their own plan nodes (same approach as delta/iceberg
  * connectors). Lives in the org.apache.spark.sql package for access; no
  * Spark internals are modified. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
