package graft.operators

import graft.Tables
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Date-partitioned layout is the warehouse's primary index: a predicate
  * on the partition column must prune directories at planning time (read
  * only the matching partition's files), not filter rows after a full
  * scan. This locks that in — the 100 TB contract behind "partition by
  * ingest date".
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = graft.SparkSpec.session

  test("a dt predicate prunes the partitioned scan to matching files only") {
    val path = s"/tmp/graft_prune_${spark.sparkContext.applicationId}"
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("dt", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("dt").parquet(path)

    val all = spark.read.parquet(path)
    val nPartitions = all.select(col("dt")).distinct().count()
    assert(nPartitions > 5, s"need a multi-partition layout, got $nPartitions")

    val pruned = all.filter(col("dt") === "2024-01-05")
    assert(pruned.count() > 0)

    val plan = pruned.queryExecution.executedPlan
    val scans = (plan +: plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan })
      .flatMap(_.collect { case f: FileSourceScanExec => f })
    assert(scans.nonEmpty, s"expected a FileSourceScanExec:\n$plan")
    val scan = scans.head
    assert(scan.metadata("PartitionFilters").contains("dt"),
      s"partition filter must reach the scan: ${scan.metadata("PartitionFilters")}")
    // planning-time pruning: the scan only lists the one matching partition
    assert(scan.metrics("numFiles").value <= nPartitions / 2,
      s"scan read ${scan.metrics("numFiles").value} files across " +
        s"$nPartitions partitions — pruning did not happen")
  }
}
