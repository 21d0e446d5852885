package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Snapshot manifest for the persisted indexes — the missing atomicity
  * layer under compaction. Versioned layout:
  *
  *   path/manifest/v<N>     zero-byte committed-version markers
  *   path/codes_v<N>        the version's payload (batch-partitioned)
  *   path/tombstones_v<N>   the version's append-only delete log
  *
  * The CURRENT version is the highest committed marker; a commit is one
  * filesystem rename of a marker file into `manifest/`, which readers
  * either see or don't — never a half-state. Compaction writes the new
  * version's payload COMPLETELY, then commits: a reader that resolved
  * the old version keeps a fully intact directory under it for as long
  * as it needs (the old files are never deleted by compact), which is
  * exactly the guarantee the pre-manifest swap-in-place lacked. Old
  * versions are reclaimed explicitly by [[VectorIndex.vacuum]] — the
  * Iceberg/Delta expire-snapshots contract, kept deliberately minimal.
  *
  * Tombstones are version-scoped and append-only WITHIN a version:
  * concurrent readers of the current version observe some prefix of the
  * delete log, the same monotone guarantee appends already had.
  *
  * Legacy layout (no `manifest/` dir — indexes written before this
  * layer) resolves to the unversioned `codes`/`tombstones` names, and
  * compact falls back to the old swap there.
  *
  * Concurrency contract: READERS are isolated (any resolved version
  * stays intact until an explicit vacuum), but MUTATORS (build, append,
  * deleteIds, compact, vacuum) assume a single writer per index path —
  * the standard one-committer contract of table formats at this layer
  * (Iceberg/Delta serialize committers via a catalog/log; this minimal
  * manifest has no lock service, so the orchestration layer owns the
  * serialization, as the pipelines here do by construction). Compact
  * does carry forward tombstones that land in the old version's log
  * while it rewrites (see [[VectorIndex.compact]]), so the one
  * delete-vs-compact race a single logical writer can still hit through
  * async delete ingestion is closed.
  */
private[operators] object IndexManifest {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All committed versions, ascending; empty = legacy layout. */
  def committedVersions(spark: SparkSession, path: String): Seq[Long] = {
    val dir = new Path(s"$path/manifest")
    val f = fs(spark, path)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") => n.stripPrefix("v").toLong }
      .sorted.toSeq
  }

  /** Highest committed version; None = legacy (pre-manifest) layout. */
  def currentVersion(spark: SparkSession, path: String): Option[Long] =
    committedVersions(spark, path).lastOption

  def codesDir(spark: SparkSession, path: String): String =
    currentVersion(spark, path)
      .map(v => s"$path/codes_v$v").getOrElse(s"$path/codes")

  def tombstonesDir(spark: SparkSession, path: String): String =
    currentVersion(spark, path)
      .map(v => s"$path/tombstones_v$v").getOrElse(s"$path/tombstones")

  /** Version a fresh build() must write and then commit: 0 on a virgin
    * path, current+1 when a manifest already exists (a REBUILD).
    * Re-committing version 0 over a compacted index (current ≥ 1) would
    * be silently ignored by [[currentVersion]]'s max rule — readers
    * would keep serving the old payload while build() had already
    * overwritten the unversioned geometry artifacts, reinterpreting live
    * codes under the new geometry. Building into the NEXT version makes
    * rebuild an atomic switch instead. */
  def nextBuildVersion(spark: SparkSession, path: String): Long =
    currentVersion(spark, path).map(_ + 1).getOrElse(0L)

  /** Atomically commit `version`: the marker appears via one rename. */
  def commit(spark: SparkSession, path: String, version: Long): Unit = {
    val f = fs(spark, path)
    f.mkdirs(new Path(s"$path/manifest"))
    val tmp = new Path(s"$path/manifest/.v${version}_tmp")
    f.create(tmp, true).close()
    f.rename(tmp, new Path(s"$path/manifest/v$version"))
  }

  /** Reclaim version dirs older than the `keep` most recent committed
    * versions (markers, payloads, and delete logs). Never touches the
    * current version; no-op on legacy layouts. */
  def vacuum(spark: SparkSession, path: String, keep: Int): Unit = {
    require(keep >= 1)
    val f = fs(spark, path)
    currentVersion(spark, path).foreach { cur =>
      val dir = new Path(s"$path/manifest")
      val vs = f.listStatus(dir).map(_.getPath.getName)
        .collect { case n if n.startsWith("v") => n.stripPrefix("v").toLong }
        .sorted
      vs.dropRight(keep).filter(_ < cur).foreach { v =>
        f.delete(new Path(s"$path/codes_v$v"), true)
        f.delete(new Path(s"$path/tombstones_v$v"), true)
        f.delete(new Path(s"$path/manifest/v$v"), false)
      }
    }
  }
}
