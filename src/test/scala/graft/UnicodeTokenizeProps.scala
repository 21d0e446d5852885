package graft

import java.util.regex.Pattern

import org.scalacheck.{Gen, Prop, Properties}

/** The fused tokenizer's scanner must match what Spark's
  * `filter(split(lower(c), "[^\p{L}\p{N}]+"), len > 0)` computes —
  * checked here at the pure level against the ACTUAL Java regex on the
  * same lowered input (UTF8String.toLowerCase, the call `lower()`
  * compiles to), over arbitrary strings plus a generator biased toward
  * the characters where a category predicate could diverge from the
  * regex class (Nl/No numbers, titlecase letters, combining marks,
  * supplementary planes, exotic whitespace). */
object UnicodeTokenizeProps extends Properties("graft.unicodeTokenize") {

  private val splitter = Pattern.compile("[^\\p{L}\\p{N}]+")

  private def viaRegex(lowered: String): Seq[String] =
    splitter.split(lowered, -1).toSeq.filter(_.nonEmpty)

  private def viaScanner(lowered: String): Seq[String] =
    graft.functions.UnicodeMinHashSigExpr.tokenize(lowered).toSeq

  private def lowered(s: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)
      .toLowerCase.toString

  property("scanner ≡ regex split on arbitrary strings") =
    Prop.forAll { (s: String) =>
      val l = lowered(s)
      viaScanner(l) == viaRegex(l)
    }

  private val spicy: Gen[String] = {
    val interesting = Gen.oneOf(
      "a", "Z", "é", "Ω", "ß", "ǅ", "ᾮ", "İ",
      "7", "٣", "Ⅻ", "½", "〡", "𝟘",
      "中", "日", "한", "😀", "𝐀",
      "é", // combining acute
      " ", " ", " ", "　", "\t", "\n",
      "—", "«", "»", "…", "!", ",", "_", "-", "​")
    Gen.listOf(interesting).map(_.mkString)
  }

  property("scanner ≡ regex split on category-adversarial text") =
    Prop.forAll(spicy) { s =>
      val l = lowered(s)
      viaScanner(l) == viaRegex(l)
    }
}
