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

  /** Bridge to `private[sql] internalCreateDataFrame(..., isStreaming)` —
    * a V1 streaming `Source.getBatch` (graft.sources.GraftStreamSource)
    * must return a STREAMING DataFrame (MicroBatchExecution asserts
    * isStreaming), and the only constructor for one is private[sql]. */
  def streamingDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** The inverse direction: a streaming micro-batch's rows re-wrapped as
    * a BATCH DataFrame — `Sink.addBatch`'s frame is flagged streaming
    * and refuses `.write`, but its physical rows are an ordinary RDD
    * (graft.sources.GraftSink hands them to the manifest commit). */
  def batchDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
