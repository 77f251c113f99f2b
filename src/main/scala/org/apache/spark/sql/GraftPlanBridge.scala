package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the package-private Dataset factory, for building a
  * DataFrame from a custom LogicalPlan (same pattern libraries like
  * Qbeast/graphframes use). */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ⇄ Expression bridges for building plans around custom
    * Catalyst expressions without going through the SQL registry. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Bridge to the optimizer's floating-point canonicalizer (-0.0 → 0.0,
    * canonical NaN, recursively through struct/array/map), so custom
    * operators can group floating-point keys with the same equality
    * semantics Aggregate/Window get from the NormalizeFloatingNumbers
    * rule. Returns the expression unchanged when its type needs none. */
  def normalizeFloats(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
