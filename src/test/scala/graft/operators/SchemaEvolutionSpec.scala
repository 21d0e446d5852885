package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Schema evolution on read: historical parquet drops with differing
  * columns merge into one frame (new columns null-padded for old files) —
  * what a year of evolving 100 TB ingest looks like on disk.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  test("mergeSchema unions evolving drops, null-padding missing columns") {
    val dir = Files.createTempDirectory("evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 9.5), (4L, "d", 8.0)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    val rows = merged.orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2))))
      .toSeq
    assert(rows == Seq(
      (1L, "a", None), (2L, "b", None),
      (3L, "c", Some(9.5)), (4L, "d", Some(8.0))))
    // old files must not fail the scan when the new column is projected
    assert(merged.filter(col("score").isNull).count() == 2)
  }
}
