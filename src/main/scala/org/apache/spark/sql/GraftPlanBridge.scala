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

  /** Column ⇄ Expression seam (private[sql] in Spark) — lets the engine's
    * custom codegen expressions compose as ordinary `Column`s without
    * requiring function registration at every call site. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
