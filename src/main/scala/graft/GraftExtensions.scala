package graft

import graft.functions.{CosineSimExpr, NormalizeExpr, PolyHashExpr, ShingleHashExpr}
import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions for SQL use, plus the latest-per-key optimizer
  * rewrite (window row_number=1 → max_by aggregate,
  * [[graft.plans.LatestPerKeyRule]]).
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
  import GraftExtensions.{buildCosine, buildNormalize, buildShingle}

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.LatestPerKeyRule)
    e.injectOptimizerRule(_ => graft.plans.HammingJoinRule)
    // analyzer-native `UPDATE graft.t SET ... WHERE ...` → the
    // match-proportional merge-on-read commit (TableManifest.updateWhere)
    e.injectPostHocResolutionRule(_ => graft.sources.GraftUpdateRule)
    // analyzer-native `MERGE INTO graft.t ... UPDATE SET * / INSERT *`
    e.injectPostHocResolutionRule(_ => graft.sources.GraftMergeRule)
    // analyzer-native DELETE for predicates beyond the Filter vocabulary
    e.injectPostHocResolutionRule(_ => graft.sources.GraftDeleteRule)
    // ALTER COLUMN ... SET NOT NULL (CheckAnalysis would refuse it on
    // any nullable-reported v2 column before the catalog is reached)
    e.injectPostHocResolutionRule(_ => graft.sources.GraftSetNotNullRule)
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
        buildCosine))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_hashes"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[ShingleHashExpr].getName, "shingle_hashes"),
        buildShingle))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("normalize_text"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[NormalizeExpr].getName, "normalize_text"),
        buildNormalize))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

  /** cosine_sim(a, b) — arity-checked at resolution. */
  private[graft] val buildCosine: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"cosine_sim expects 2 arguments, got ${exprs.length}")
    CosineSimExpr(exprs.head, exprs(1))
  }

  /** shingle_hashes(text[, n]) — n must be an integer literal (default 3). */
  private[graft] val buildShingle: Seq[Expression] => Expression = { exprs =>
    require(exprs.nonEmpty && exprs.length <= 2,
      s"shingle_hashes expects 1 or 2 arguments, got ${exprs.length}")
    val n = exprs.lift(1) match {
      case None => 3
      case Some(Literal(v: Int, org.apache.spark.sql.types.IntegerType)) => v
      case Some(other) => throw new IllegalArgumentException(
        s"shingle_hashes n must be an integer literal, got $other")
    }
    ShingleHashExpr(exprs.head, n)
  }

  /** normalize_text(text, 'nfc'|'nfkc'|'nfd'|'strip_accents') — the form
    * must be a string literal. */
  private[graft] val buildNormalize: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"normalize_text expects 2 arguments, got ${exprs.length}")
    val form = exprs(1) match {
      case Literal(v, org.apache.spark.sql.types.StringType) if v != null =>
        v.toString
      case other => throw new IllegalArgumentException(
        s"normalize_text form must be a string literal, got $other")
    }
    NormalizeExpr(exprs.head, form)
  }

  /** Register on an ALREADY-RUNNING session (builder extensions are
    * silently ignored once a session is active in the JVM). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHashExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", buildCosine, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", buildShingle, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_text", buildNormalize, "built-in")
  }
}
