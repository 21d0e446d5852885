package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DigestSinkSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session
  import s.implicits._

  private def df = s.range(10000).select(col("id"),
    (col("id") % 7).cast("double").as("v"),
    concat(lit("u"), col("id") % 100).as("tag"))

  test("commit aggregates task messages: count exact, digest partition-invariant") {
    df.repartition(8).write.format("graft-digest")
      .option("id", "a").mode("append").save()
    df.repartition(3).write.format("graft-digest")
      .option("id", "b").mode("append").save()
    val a = DigestSink.committed.get("a")
    val b = DigestSink.committed.get("b")
    assert(a._1 == 10000L && b._1 == 10000L)
    // XOR fold: same rows through different partitionings, same digest
    assert(a._2 == b._2)
  }

  test("overwrite mode rides the no-op truncate") {
    df.write.format("graft-digest").option("id", "ow").mode("overwrite").save()
    assert(DigestSink.committed.get("ow")._1 == 10000L)
  }

  test("different data yields a different digest") {
    df.limit(9999).write.format("graft-digest")
      .option("id", "c").mode("append").save()
    val a = DigestSink.committed.get("a")
    val c = DigestSink.committed.get("c")
    assert(c._1 == 9999L)
    assert(a._2 != c._2)
  }
}
