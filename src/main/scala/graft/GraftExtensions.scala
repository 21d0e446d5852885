package graft

import graft.functions.PolyHashExpr
import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions for SQL use.
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)  // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  *   spark.sql("SELECT poly_hash(text) FROM docs")
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
  }
}

object GraftExtensions {
  /** Register on an ALREADY-RUNNING session (builder extensions are
    * silently ignored once a session is active in the JVM). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHashExpr(exprs.head), "built-in")
}
