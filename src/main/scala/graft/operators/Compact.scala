package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction: rewrite a parquet directory into ~`targetBytes`
  * files, optionally sorted within files on a key for row-group pruning.
  *
  * Small files are the death of 100 TB scans (one task + one open per
  * file, tiny row groups defeat min/max pruning). Compaction sizes output
  * by measured input bytes, not file count, so it's layout-stable as data
  * grows; `sortWithinPartitions` restores the pruning the original layout
  * had (cf. the reference's index analog, SURVEY §2.1 S4).
  */
object Compact {

  /** Number of output files for ~`targetBytes` per file. Lists the
    * directory RECURSIVELY (partitioned layouts keep data in key=…
    * subdirectories) on the filesystem the path itself resolves to (NOT
    * fs.defaultFS — dir may be on s3a/file while default is hdfs). */
  def plannedFiles(spark: SparkSession, dir: String, targetBytes: Long): Int = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var totalBytes = 0L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) totalBytes += f.getLen
    }
    math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
  }

  /** Rewrite `inDir` → `outDir` with ~`targetBytes` files, sorted within
    * each file by `sortCols` when given. Returns the compacted frame. */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Nil): DataFrame = {
    val df = spark.read.parquet(inDir)
    val n = plannedFiles(spark, inDir, targetBytes)
    val sized = df.repartition(n)
    val laid =
      if (sortCols.nonEmpty)
        sized.sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      else sized
    laid.write.mode(SaveMode.Overwrite).parquet(outDir)
    spark.read.parquet(outDir)
  }
}
