package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused Unicode-tokenizing signature must equal the composed chain
  * `MinHashSigExpr(Text.normalizeForDedup(text))` EXACTLY — the fusion
  * is an evaluation-shape change, never a semantic one. End-to-end
  * equality is checked on the decorated real corpus (the registry's own
  * hard-text fixture) plus a hand-built adversarial set; the scanner ≡
  * Java-regex tokenization itself is property-checked over arbitrary
  * strings in [[graft.UnicodeTokenizeProps]]. */
class UnicodeMinHashSigExprSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def diffCount(df: org.apache.spark.sql.DataFrame,
      textCol: String): Long =
    df.select(
        UnicodeMinHashSigExpr(col(textCol), 64, 3).as("fused"),
        MinHashSigExpr(Text.normalizeForDedup(col(textCol)), 64, 3)
          .as("composed"))
      .filter(not(col("fused") === col("composed")))
      .count()

  test("fused ≡ composed on the decorated real corpus") {
    val docs = Tables.documents(spark, sf)
      .withColumn("t", expr(Text.DecoratedTextSql))
    assert(diffCount(docs, "t") == 0)
  }

  test("fused ≡ composed on adversarial Unicode text (supplementary code" +
    " points, Nl/No digits, titlecase, combining marks, all whitespace)") {
    val texts = Seq(
      "«Gráft»—the END…  x42! ", // the fixture's own decorations
      "中文 日本語 한국어 tokens",
      "é combining acute splits the mark off",
      "ⅠⅡ ½ ٣٤ numbers Nl No Nd", // Ⅰ Ⅱ ½ ٣٤
      "𝐀𝐁 math Lu 😀 emoji", // 𝐀𝐁 😀
      "ǅungla titlecase Lt ẞ sharp",
      "tabs\tand\nnewlines thin　ideographic",
      "", " ", "—…«»", "a", "1", "𝟘𝟙𝟚 mathematical digits",
      "MiXeD CaSe DİACRİTİCS İstanbul")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    assert(diffCount(df, "t") == 0)
  }
}
