package graft

import graft.functions.{CosineSimExpr, PolyHashExpr, ShingleHashExpr}
import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions for SQL use.
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)  // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  *   spark.sql("SELECT poly_hash(text), cosine_sim(a, b) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("poly_hash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[PolyHashExpr].getName, "poly_hash"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          PolyHashExpr(exprs.head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSimExpr].getName, "cosine_sim"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          CosineSimExpr(exprs.head, exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_hashes"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[ShingleHashExpr].getName, "shingle_hashes"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          ShingleHashExpr(exprs.head, 3)))
  }
}

object GraftExtensions {
  /** Register on an ALREADY-RUNNING session (builder extensions are
    * silently ignored once a session is active in the JVM). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHashExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimExpr(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", exprs => ShingleHashExpr(exprs.head, 3), "built-in")
  }
}
