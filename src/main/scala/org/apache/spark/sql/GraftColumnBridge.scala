package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression converters — Spark 4
  * removed the public `new Column(expr)` constructor, and custom Catalyst
  * expressions (graft.functions.PolyHashExpr) still need to surface as
  * user-facing Columns.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Bridge to `private[sql] Dataset.ofRows` — a custom logical plan
    * (graft.plans.AsOfJoinNode) needs to surface as a DataFrame. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
