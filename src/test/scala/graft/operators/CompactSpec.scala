package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  test("compaction reduces file count, preserves data, sorts within files") {
    val in = "/tmp/graft_compact_in"
    val out = "/tmp/graft_compact_out"
    // 64 tiny files
    (1 to 2048).map(i => (i.toLong, (i * 37 % 97).toLong, s"row$i"))
      .toDF("id", "key", "payload")
      .repartition(64)
      .write.mode("overwrite").parquet(in)

    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def parquetFiles(d: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(d))
        .filter(_.getPath.getName.endsWith(".parquet"))
    assert(parquetFiles(in).length == 64)

    // target = half the measured input → 2 output files
    val total = parquetFiles(in).map(_.getLen).sum
    val compacted = Compact.compact(spark, in, out,
      targetBytes = total / 2 + 1, sortCols = Seq("key", "id"))

    assert(parquetFiles(out).length == 2)
    // content identical
    val a = spark.read.parquet(in).collect().map(_.toString).sorted
    val b = compacted.collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // sorted within each output file → min/max pruning works again
    val unsortedWithin = spark.read.parquet(out)
      .withColumn("f", input_file_name())
      .withColumn("ord", monotonically_increasing_id())
      .withColumn("prev", lag(struct($"key", $"id"), 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy($"f").orderBy($"ord")))
      .filter($"prev".isNotNull &&
        struct($"key", $"id") < $"prev")
      .count()
    assert(unsortedWithin == 0, "rows must be sorted within each file")
  }
}
