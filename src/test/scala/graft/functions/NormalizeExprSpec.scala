package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormalizeExprSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private def norm(s: String, form: String): String =
    Seq(s).toDF("t")
      .select(NormalizeExpr(col("t"), form))
      .collect()(0).getString(0)

  test("nfc composes combining marks; nfd decomposes them") {
    assert(norm("ó", "nfc") == "ó")          // o + acute -> ó
    assert(norm("ó", "nfd") == "ó")
    assert(norm("abc plain", "nfc") == "abc plain")
  }

  test("nfkc folds compatibility characters") {
    assert(norm("\ufb01le", "nfkc") == "file")    // fi ligature
    assert(norm("\u2460", "nfkc") == "1")         // circled one
  }

  test("strip_accents removes marks in both composed and decomposed input") {
    assert(norm("áéñ", "strip_accents") == "aen")
    assert(norm("áé", "strip_accents") == "ae")
    assert(norm("no accents 123", "strip_accents") == "no accents 123")
  }

  test("supplementary-plane codepoints survive untouched") {
    val emoji = new String(Character.toChars(0x1F600))
    assert(norm(s"x${emoji}y", "strip_accents") == s"x${emoji}y")
  }

  test("unknown form is rejected at construction") {
    intercept[IllegalArgumentException] {
      Seq("x").toDF("t").select(NormalizeExpr(col("t"), "nfz")).collect()
    }
  }

  test("registered as normalize_text for SQL use") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT normalize_text('ó', 'nfc') AS n")
      .collect()(0).getString(0)
    assert(got == "ó")
  }
}
