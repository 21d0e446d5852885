package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShingleHashExprSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("native shingle hashes equal the HOF formulation on real documents") {
    val docs = Tables.documents(spark, sf)
    val diff = docs.select(
        Text.shingleHashes(col("text")).as("native"),
        Text.shingleHashesHof(col("text")).as("hof"))
      .filter(not(col("native") === col("hof")))
      .count()
    assert(diff === 0, s"$diff documents differ between native and HOF shingles")
  }

  test("edge cases: short text, empty tokens, multi-space runs") {
    val df = Seq("", "a", "a b", "a b c", "a  b c", " a b c ", "a b c a b c")
      .toDF("text")
    val rows = df.select(
        col("text"),
        Text.shingleHashes(col("text")).as("native"),
        Text.shingleHashesHof(col("text")).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"mismatch for input '${r.getString(0)}'")
    }
    // "a b c" has exactly one shingle; duplicated phrase dedupes
    val one = rows.find(_.getString(0) == "a b c").get.getSeq[Long](1)
    assert(one.length == 1)
    // 4 shingles, but "a b c" repeats → 3 distinct
    val dup = rows.find(_.getString(0) == "a b c a b c").get.getSeq[Long](1)
    assert(dup.length == 3)
  }
}
