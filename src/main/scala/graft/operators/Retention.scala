package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Data-retention enforcement as a PARTITION-level operation.
  *
  * At 100 TB, "delete rows older than N days" must never be a table
  * rewrite: on a date-partitioned layout (`.partitionBy("d")`) expiry is
  * a metadata operation — list the `d=...` directories, drop the ones
  * past the horizon, touch nothing else. Cost is O(partitions), zero
  * data read, zero data written; readers prune to live partitions by
  * construction. (A table partitioned on anything else pays a full
  * rewrite for retention — that layout/ops coupling is the design point
  * this operator makes explicit.)
  */
object Retention {

  /** Delete `partitionCol=<value>` directories whose value sorts strictly
    * below `cutoff` (ISO date strings sort correctly). Returns the
    * dropped partition values. */
  def expirePartitionsBefore(
      spark: SparkSession,
      tablePath: String,
      partitionCol: String,
      cutoff: String): Seq[String] = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val prefix = s"$partitionCol="
    val expired = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith(prefix))
      .map(p => (p, p.getName.stripPrefix(prefix)))
      .filter { case (_, v) => v < cutoff }
    // retention is an enforcement op: a failed delete must fail LOUDLY,
    // never be reported as expired while the files remain on disk
    val failed = expired.filterNot { case (p, _) => fs.delete(p, true) }
    require(failed.isEmpty,
      s"retention failed to delete: ${failed.map(_._2).sorted.mkString(", ")}")
    expired.map(_._2).sorted
  }
}
