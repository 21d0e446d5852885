package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode text normalization — the first
  * step of any multilingual corpus pipeline (canonicalize before hashing,
  * deduping, or tokenizing, or byte-identical texts in different
  * composition forms count as distinct).
  *
  * Forms: `nfc` / `nfkc` / `nfd` (java.text.Normalizer, the JDK's
  * implementation of UAX #15 — the same standard DuckDB's
  * `nfc_normalize` implements, so results are oracle-comparable) and
  * `strip_accents` (NFD then drop non-spacing marks — DuckDB
  * `strip_accents` semantics).
  *
  * Spark has no built-in for this; the usual fallback is a Scala UDF,
  * which breaks whole-stage codegen. This expression stays codegen'd
  * (one static call per row) like the other graft natives.
  */
case class NormalizeExpr(child: Expression, form: String) extends UnaryExpression {
  require(NormalizeExpr.Forms.contains(form),
    s"unknown normalization form '$form' (expected ${NormalizeExpr.Forms.mkString("/")})")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NormalizeExpr.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.NormalizeExpr.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)
}

object NormalizeExpr {
  final val Forms = Set("nfc", "nfkc", "nfd", "strip_accents")

  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val out = form match {
      case "nfc"  => Normalizer.normalize(str, Normalizer.Form.NFC)
      case "nfkc" => Normalizer.normalize(str, Normalizer.Form.NFKC)
      case "nfd"  => Normalizer.normalize(str, Normalizer.Form.NFD)
      case "strip_accents" =>
        val d = Normalizer.normalize(str, Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(d.length)
        var i = 0
        while (i < d.length) {
          val cp = d.codePointAt(i)
          if (Character.getType(cp) != Character.NON_SPACING_MARK)
            sb.appendCodePoint(cp)
          i += Character.charCount(cp)
        }
        sb.toString
    }
    UTF8String.fromString(out)
  }

  def apply(c: Column, form: String): Column =
    GraftColumnBridge.column(NormalizeExpr(GraftColumnBridge.expression(c), form))
}
