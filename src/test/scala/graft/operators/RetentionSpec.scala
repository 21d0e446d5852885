package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetentionSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session
  import s.implicits._

  test("expiry drops only partitions past the horizon, metadata-only") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_retention").toString
    (1 to 100).map(i => (i.toLong, s"2024-01-${"%02d".format(i % 10 + 1)}"))
      .toDF("id", "d")
      .write.partitionBy("d").mode("overwrite").parquet(path)

    val before = s.read.parquet(path)
    assert(before.count() == 100)

    val dropped = Retention.expirePartitionsBefore(s, path, "d", "2024-01-05")
    assert(dropped == Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))

    val after = s.read.parquet(path)
    assert(after.select(col("d")).distinct().count() == 6)
    assert(after.filter(col("d") < "2024-01-05").count() == 0)
    // surviving rows untouched
    assert(after.count() == before.filter(col("d") >= "2024-01-05").count())

    // idempotent: second run drops nothing
    assert(Retention.expirePartitionsBefore(s, path, "d", "2024-01-05").isEmpty)
    // missing table: no-op, no crash
    assert(Retention.expirePartitionsBefore(s, path + "_nope", "d", "x").isEmpty)
  }
}
