package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for the binary-quantization ANN index — the faiss-style
  * index lifecycle (build → save → load → search → append) on Spark-native
  * storage, the similarity-search analog of [[graft.ml.ModelRegistry]]'s
  * model persistence:
  *
  *  - the fitted artifact is the per-dim threshold row (the part that must
  *    NOT be refit on append — codes are only comparable under one
  *    threshold vector), stored as a 1-row parquet;
  *  - codes are the searchable payload (8 B/vector), stored partitioned
  *    and appendable;
  *  - `appendBinary` encodes new vectors with the SAVED thresholds — how a
  *    production index absorbs a new corpus drop without invalidating the
  *    standing codes.
  *
  * Scale note: save/load of the artifact moves one row; the codes table
  * is 32× smaller than its float source, and append is a narrow encode +
  * parquet append — no touch of existing index files.
  */
object VectorIndex {

  // ---- batch-partitioned codes: the exactly-once append mechanism ---------
  // Codes live under `codes/__batch=<id>/` (-1 = the build, so the
  // 0-based foreachBatch ids can never collide with it). An append
  // that carries a batch id writes its partition with DYNAMIC partition
  // overwrite, so a replayed batch (Structured Streaming foreachBatch is
  // at-least-once) replaces ITS OWN partition instead of double-appending
  // — pass the foreachBatch batchId and ingest is exactly-once. Appends
  // without an id allocate the next free partition (plain at-least-once,
  // fine for one-shot batch adds — do not mix unkeyed appends with keyed
  // streaming on one index: the keys share the partition space). Loaders
  // drop the partition column, so nothing downstream sees the layout.

  private[operators] def nextBatchId(spark: SparkSession, codes: String): Long = {
    val p = new org.apache.hadoop.fs.Path(codes)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("__batch=") =>
        n.stripPrefix("__batch=").toLong }
    if (ids.isEmpty) 0L else math.max(ids.max + 1L, 0L)
  }

  /** Returns the `__batch` partition id the drop landed in (kinds with
    * per-batch side artifacts — the search index's stats rows — key them
    * by it). */
  private[operators] def writeCodes(codes: DataFrame, path: String,
      batchId: Option[Long]): Long = {
    val spark = codes.sparkSession
    val dir = IndexManifest.codesDir(spark, path)
    val batch = batchId.getOrElse(nextBatchId(spark, dir))
    codes.withColumn("__batch", lit(batch))
      .write.partitionBy("__batch")
      .mode(if (batchId.isDefined) "overwrite" else "append")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(dir)
    // appends COMMIT like every other mutation: the new version's
    // watermark covers the batch just written, so loadCodesAt(current)
    // always equals the live view and earlier pins never see the drop.
    // (A replayed keyed batch re-commits — an extra audit row, same
    // view.) Legacy layouts stay versionless.
    if (IndexManifest.currentVersion(spark, path).isDefined) {
      var committed = false
      while (!committed)
        committed = IndexManifest.tryCommit(spark, path,
          IndexManifest.nextMutationVersion(spark, path),
          nextBatchId(spark, dir) - 1L)
    }
    batch
  }

  /** Commit a freshly-built payload version, retrying past version-number
    * races (an async delete committing between [[IndexManifest
    * .nextBuildVersion]] and the marker): the already-written payload and
    * geometry dirs are RENAMED to the new number — builds are
    * self-contained, so a rename is a complete retry. Returns the version
    * actually committed. Build watermark is -1: only the `__batch=-1`
    * build partition is visible to readers pinned at this version. */
  private[operators] def commitBuild(spark: SparkSession, path: String,
      first: Long, artifacts: Seq[String]): Long = {
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var v = first
    while (!IndexManifest.tryCommit(spark, path, v, watermark = -1L)) {
      val nv = IndexManifest.nextBuildVersion(spark, path)
      f.rename(new org.apache.hadoop.fs.Path(s"$path/codes_v$v"),
        new org.apache.hadoop.fs.Path(s"$path/codes_v$nv"))
      artifacts.foreach(a =>
        f.rename(new org.apache.hadoop.fs.Path(s"$path/${a}_v$v"),
          new org.apache.hadoop.fs.Path(s"$path/${a}_v$nv")))
      v = nv
    }
    v
  }

  /** Build from raw vectors and persist: fits thresholds, packs codes,
    * writes `path/thresholds` (1 row) + `path/codes` (partition
    * `__batch=-1`). */
  def buildBinary(emb: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    // materialize the 1-row fit once: the artifact write and the codes
    // write are separate jobs, and the fit is a corpus-wide per-dim order
    // statistic that would otherwise execute for each
    val thr = BinaryQuant.fitThresholds(emb, vecCol).localCheckpoint(true)
    // rebuild = NEXT manifest version (never a silently-ignored
    // re-commit of v0 over a compacted index); geometry writes under the
    // NEW version's name and the commit marker lands last, so a crash
    // mid-build leaves the previous version — payload, mask, AND
    // thresholds — exactly as it was
    val v = IndexManifest.nextBuildVersion(emb.sparkSession, path)
    thr.write.mode("overwrite").parquet(s"$path/thresholds_v$v")
    BinaryQuant.withCode(emb, vecCol, thr)
      .select(col(idCol).cast("long").as("vec_id"), col("code"))
      .withColumn("__batch", lit(-1L))
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$path/codes_v$v")
    commitBuild(emb.sparkSession, path, v, Seq("thresholds"))
  }

  /** Encode NEW vectors under the saved thresholds and append their codes
    * — never refits (refitting would silently shift bit meanings under
    * every code already in the index). Pass the streaming `batchId` for
    * replay-safe (exactly-once) ingest; without it the append is plain
    * at-least-once. */
  def appendBinary(emb: DataFrame, idCol: String, vecCol: String,
      path: String, batchId: Option[Long] = None): Unit = {
    val thr = emb.sparkSession.read.parquet(
      IndexManifest.artifactDirAt(emb.sparkSession, path, "thresholds"))
    writeCodes(
      BinaryQuant.withCode(emb, vecCol, thr)
        .select(col(idCol).cast("long").as("vec_id"), col("code")),
      path, batchId)
  }

  // ---- delete + compaction (shared by all index kinds) ---------------------
  // faiss remove_ids, Spark-native: deletes are (vec_id) TOMBSTONES —
  // metadata segments, never a rewrite of the standing codes files — and
  // search masks them with a broadcast anti-join (tombstones are tiny
  // relative to the corpus by construction; a delete-heavy index should
  // compact). Each deleteIds call COMMITS its own manifest version whose
  // segment holds exactly the ids it removed, so (a) a delete becomes
  // visible atomically with its marker, and (b) a reader pinned to an
  // earlier version NEVER sees it — delete-immutable snapshots, the part
  // of VERSION AS OF the old mutate-current-log design could not give.
  // `compact` folds the pending segments in: codes are rewritten minus
  // the masked ids into the NEXT version under an optimistic commit loop
  // (a delete committing mid-rewrite steals the version number, compact
  // re-snapshots and re-folds — nothing is ever lost or half-applied).
  // Readers pinned to any superseded version keep fully intact files
  // until an explicit `vacuum`, the Iceberg/Delta expire-snapshots
  // contract kept minimal. (Pre-manifest legacy layouts still get the
  // old swap-in-place and the unversioned append-only log.)

  /** Tombstone ids out of the index at `path` (any kind — the layout is
    * shared): writes one delete segment and commits it as the next
    * manifest version. O(deleted) bytes; retries version-number races
    * with concurrent committers. */
  def deleteIds(ids: DataFrame, idCol: String, path: String): Unit = {
    val spark = ids.sparkSession
    val dedup = ids.select(col(idCol).cast("long").as("vec_id")).distinct()
    IndexManifest.currentVersion(spark, path) match {
      case None => // legacy layout: the unversioned append-only log
        dedup.write.mode("append").parquet(s"$path/tombstones")
      case Some(_) =>
        // the segment is written ONCE to a hidden temp dir and RENAMED to
        // its version number per attempt (renamed back on a lost commit
        // race): an uncommitted segment never sits at a number another
        // mutation might commit, so no reader transiently sees a delete
        // that has not committed yet. A segment numbered above every
        // marker is invisible anyway (segmentVersionsAt bounds at the
        // read version), so rename-before-commit exposes nothing early.
        val fsys = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val tmp = new org.apache.hadoop.fs.Path(
          s"$path/.tombstones_pending_${java.util.UUID.randomUUID}")
        dedup.write.mode("overwrite").parquet(tmp.toString)
        var committed = false
        var blockedAt = -1L
        var blockedTries = 0
        while (!committed) {
          // STRICTLY cur+1 — the marker number is the CAS that makes
          // concurrent mutations visible to each other (compact's
          // re-fold loop depends on stealing/losing this exact number);
          // orphan-skipping applies only to mutations with no
          // read-modify-write (appends, fresh builds)
          val cur = IndexManifest.currentVersion(spark, path).get
          val d = cur + 1
          val seg = new org.apache.hadoop.fs.Path(s"$path/tombstones_v$d")
          // rename refuses an existing dst: a racing delete at the same
          // number makes us spin until its marker lands, then retry at
          // d+1. BOUNDED: if the blocking dir's marker never lands it is
          // a crashed delete's orphan — fail with the recovery action
          // instead of spinning forever (deleting it ourselves could
          // race an in-flight partner about to commit that number).
          if (IndexManifest.renameExclusive(fsys, tmp, seg)) {
            blockedAt = -1L; blockedTries = 0
            // the pinned watermark is whatever the payload holds right
            // now, so a pin at d also freezes the append frontier
            val wm = nextBatchId(spark,
              IndexManifest.codesDir(spark, path)) - 1L
            committed = IndexManifest.tryCommit(spark, path, d, wm)
            if (!committed) fsys.rename(seg, tmp) // take it back, retry
          } else {
            if (blockedAt == d) blockedTries += 1
            else { blockedAt = d; blockedTries = 1 }
            if (blockedTries > 100)
              throw new IllegalStateException(
                s"delete segment $seg blocks version $d with no marker " +
                  "arriving: a crashed deleteIds likely left it orphaned " +
                  "— verify no delete is in flight, remove the directory, " +
                  "and retry")
            Thread.sleep(20)
          }
        }
    }
  }

  /** Tombstone set masking the CURRENT version: the union of its
    * pending delete segments, distinct; empty when none apply. */
  def loadTombstones(spark: SparkSession, path: String): DataFrame =
    IndexManifest.currentVersion(spark, path) match {
      case Some(cur) => tombstonesAt(spark, path, cur)
      case None =>
        val t = new org.apache.hadoop.fs.Path(s"$path/tombstones")
        val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(t)) spark.read.parquet(t.toString).distinct()
        else spark.range(0).select(col("id").as("vec_id"))
    }

  /** Mask `codes` against the tombstone set — the search-path filter.
    * Broadcast anti-join: the codes scan never shuffles. */
  private[operators] def minusTombstones(spark: SparkSession, path: String,
      codes: DataFrame): DataFrame =
    codes.join(broadcast(loadTombstones(spark, path)), Seq("vec_id"),
      "left_anti")

  /** Union of `version`'s pending delete segments from a resolution
    * snapshot — no extra listing RPCs. */
  private[operators] def segTombstones(spark: SparkSession, path: String,
      r: IndexManifest.Resolved, version: Long): DataFrame = {
    val segs = r.segmentsAt(version).map(d => s"$path/tombstones_v$d")
    if (segs.isEmpty) spark.range(0).select(col("id").as("vec_id"))
    else spark.read.schema("vec_id LONG").parquet(segs: _*).distinct()
  }

  /** Current live codes (schema'd) from ONE resolution snapshot — the
    * serving-path core shared by every index kind's search: two listing
    * RPCs total instead of one per helper question. Legacy layouts fall
    * back to the unversioned read. */
  private[operators] def liveCodesResolved(spark: SparkSession, path: String,
      r: IndexManifest.Resolved, schema: String): DataFrame =
    r.current match {
      case Some(cur) =>
        val p = r.payloadAt(cur)
        require(p.isDefined, s"no resolvable payload at $path")
        spark.read.schema(schema).parquet(s"$path/codes_v${p.get}")
          .drop("__batch")
          .join(broadcast(segTombstones(spark, path, r, cur)),
            Seq("vec_id"), "left_anti")
      case None =>
        minusTombstones(spark, path,
          spark.read.schema(schema)
            .parquet(IndexManifest.codesDir(spark, path)).drop("__batch"))
    }

  /** Geometry artifact dir from a resolution snapshot (current-version
    * bound unless `version` given). */
  private[operators] def artifactDirResolved(r: IndexManifest.Resolved,
      path: String, name: String, version: Option[Long] = None): String = {
    val bound = version.orElse(r.current)
    bound.flatMap(v => r.artifactVersionAt(name, v))
      .map(w => s"$path/${name}_v$w").getOrElse(s"$path/$name")
  }

  // ---- time travel ---------------------------------------------------------
  // The manifest gives every reader snapshot isolation; these expose it
  // as an API — the Iceberg/Delta "VERSION AS OF" read, kept minimal.
  // A version resolves COMPOSITELY (see IndexManifest): the newest
  // payload at-or-below it, minus the delete segments committed after
  // that payload up to it, restricted to `__batch` partitions at-or-below
  // its watermark. Every mutation commits its own version, so a pinned
  // view is IMMUTABLE: later deletes land in higher segments, later
  // appends in higher batch partitions, later rebuilds in higher payload
  // and geometry versions — only vacuum can take a pinned view away.

  /** All committed versions still resolvable, ascending. */
  def versions(spark: SparkSession, path: String): Seq[Long] =
    IndexManifest.committedVersions(spark, path)

  private[operators] def tombstonesAt(spark: SparkSession, path: String,
      version: Long): DataFrame = {
    val segs = IndexManifest.segmentVersionsAt(spark, path, version)
      .map(d => s"$path/tombstones_v$d")
    if (segs.isEmpty) spark.range(0).select(col("id").as("vec_id"))
    else spark.read.schema("vec_id LONG").parquet(segs: _*).distinct()
  }

  /** The live payload AS OF a retained `version` — works for every index
    * kind on the shared layout (the schema is whatever the kind
    * persists). Immutable once `version` is superseded; fails fast when
    * the version was never committed or its payload was vacuumed away. */
  def loadCodesAt(spark: SparkSession, path: String,
      version: Long): DataFrame = {
    require(IndexManifest.committedVersions(spark, path).contains(version),
      s"version $version was never committed at $path")
    val p = IndexManifest.payloadVersionAt(spark, path, version)
    require(p.isDefined,
      s"version $version of $path has been vacuumed — raise vacuum(keep)")
    val wm = IndexManifest.watermarkAt(spark, path, version)
    spark.read.parquet(s"$path/codes_v${p.get}")
      .filter(col("__batch") <= wm).drop("__batch")
      .join(broadcast(tombstonesAt(spark, path, version)), Seq("vec_id"),
        "left_anti")
  }

  /** [[searchBinary]] pinned to a retained historical `version` — what
    * the index answered as of that snapshot. Same plan shape; only the
    * codes/tombstone directories differ. */
  def searchBinaryAt(spark: SparkSession, path: String, version: Long,
      vectors: DataFrame, idCol: String, vecCol: String,
      queryIds: DataFrame => DataFrame, k: Int, rerankWidth: Int,
      onePass: Boolean = false): DataFrame = {
    val src = vectors.select(col(idCol).as("vec_id"), col(vecCol))
    val coded = loadCodesAt(spark, path, version).join(src, "vec_id")
    if (onePass)
      BinaryQuant.hammingRerankTopKPartitioned(coded, "vec_id", vecCol,
        queryIds(coded), k, rerankWidth)
    else
      BinaryQuant.hammingRerankTopK(coded, "vec_id", vecCol,
        queryIds(coded), k, rerankWidth)
  }

  /** One row PER RETAINED VERSION (ascending): the audit view a
    * retention policy or an incident review reads — which snapshots
    * exist, how big, how many live rows each still serves. Filesystem +
    * metadata aggregates only, like [[describe]]. */
  def history(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = IndexManifest.currentVersion(spark, path).getOrElse(-1L)
    val rows = IndexManifest.committedVersions(spark, path).map { v =>
      val p = IndexManifest.payloadVersionAt(spark, path, v)
      if (p.isEmpty) // vacuumed: marker retained, payload gone
        s"SELECT ${v}L AS version, ${v == cur} AS is_current, " +
          "false AS readable, CAST(NULL AS BIGINT) AS live_items, " +
          "CAST(NULL AS BIGINT) AS pending_tombstones, " +
          "CAST(NULL AS BIGINT) AS payload_bytes"
      else {
        // Try: a zero-row version has no footers to infer a schema from
        val live = scala.util.Try(loadCodesAt(spark, path, v)
          .select(col("vec_id")).distinct().count()).getOrElse(0L)
        val tombs = tombstonesAt(spark, path, v).count()
        val bytes = fs.getContentSummary(
          new Path(s"$path/codes_v${p.get}")).getLength
        s"SELECT ${v}L AS version, ${v == cur} AS is_current, " +
          s"true AS readable, ${live}L AS live_items, " +
          s"${tombs}L AS pending_tombstones, ${bytes}L AS payload_bytes"
      }
    }
    rows.map(spark.sql).reduce(_ unionByName _)
  }

  /** Rewrite the live codes minus the pending delete segments into the
    * next manifest version and commit it atomically under an OPTIMISTIC
    * loop: if a concurrent delete steals the version number, compact
    * re-snapshots (now including that delete) and re-folds — a removal
    * can be folded or left pending for the next compact, never lost.
    * Existing files are never modified OR deleted — a reader that
    * resolved any previous version mid-compact keeps complete
    * directories until [[vacuum]]; batch partitioning is preserved so
    * post-compaction appends keep their replay safety. No-op (beyond a
    * listing) when nothing is tombstoned. Legacy (pre-manifest) indexes
    * keep the old swap-in-place. */
  def compact(spark: SparkSession, path: String): Unit =
    compactWithHook(spark, path, () => ())

  /** [[compact]] with a seam between the tombstone snapshot and the
    * commit — test-only, to inject the delete-during-rewrite race the
    * optimistic loop folds in. The hook fires on the FIRST attempt only
    * (a per-attempt hook would chase its own tail). */
  private[operators] def compactWithHook(spark: SparkSession, path: String,
      afterSnapshot: () => Unit): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    IndexManifest.currentVersion(spark, path) match {
      case Some(_) =>
        var hookPending = true
        var committed = false
        // the rewrite lands in a HIDDEN temp dir and is renamed to its
        // payload name only AFTER the marker commits: until the rename, a
        // reader at the new version resolves the OLD payload minus the
        // folded segments — the identical live view — so there is no
        // window where a racing delete's own ids go unmasked (writing
        // codes_v<target> first would create one if a delete stole the
        // number mid-rewrite). A crash between commit and rename leaves
        // that composite view permanently correct, just uncompacted.
        val tmp = new org.apache.hadoop.fs.Path(s"$path/.codes_compacting")
        while (!committed) {
          val cur = IndexManifest.currentVersion(spark, path).get
          if (IndexManifest.segmentVersionsAt(spark, path, cur).isEmpty)
            return // nothing pending to fold
          val snapshot = tombstonesAt(spark, path, cur).localCheckpoint(true)
          if (hookPending) { hookPending = false; afterSnapshot() }
          // STRICTLY cur+1: losing this marker to a concurrent delete is
          // exactly how compact learns its snapshot went stale — a
          // skipped-ahead number would commit the stale fold silently.
          // An orphan codes dir parked at the target by a crashed
          // predecessor is uncommitted garbage nothing resolves
          // (payloadVersionAt filters by markers): clear it so the
          // post-commit rename cannot collide into it.
          val target = cur + 1
          val orphan = new org.apache.hadoop.fs.Path(s"$path/codes_v$target")
          if (!IndexManifest.committedVersions(spark, path).contains(target)
              && fs.exists(orphan))
            fs.delete(orphan, true)
          val dir = IndexManifest.codesDir(spark, path)
          spark.read.parquet(dir)
            .join(broadcast(snapshot), Seq("vec_id"), "left_anti")
            .write.partitionBy("__batch").mode("overwrite")
            .parquet(tmp.toString)
          val wm = nextBatchId(spark, tmp.toString) - 1L
          committed = IndexManifest.tryCommit(spark, path, target, wm)
          if (committed)
            fs.rename(tmp, new org.apache.hadoop.fs.Path(s"$path/codes_v$target"))
          // a delete took the number: re-fold with a fresh snapshot (the
          // overwrite mode reuses the temp dir)
        }
      case None => // legacy layout: the old swap
        val tomb = new org.apache.hadoop.fs.Path(s"$path/tombstones")
        if (!fs.exists(tomb)) return
        val tmp = new org.apache.hadoop.fs.Path(s"$path/codes_compacting")
        minusTombstones(spark, path, spark.read.parquet(s"$path/codes"))
          .write.partitionBy("__batch").mode("overwrite").parquet(tmp.toString)
        val live = new org.apache.hadoop.fs.Path(s"$path/codes")
        fs.delete(live, true)
        fs.rename(tmp, live)
        fs.delete(tomb, true)
    }
  }

  /** Reclaim index versions older than the `keep` most recent — the
    * explicit GC that pairs with snapshot-safe [[compact]]. `retainMs > 0`
    * additionally refuses to reclaim versions committed inside the
    * horizon (the Delta RETAIN rule): a long-running reader pinned to a
    * recent version cannot have its files deleted mid-query. */
  def vacuum(spark: SparkSession, path: String, keep: Int = 1,
      retainMs: Long = 0L): Unit =
    IndexManifest.vacuum(spark, path, keep, retainMs = retainMs)

  /** One-row ops view of any index at `path` (the layout is shared, so
    * this works for all five kinds): current manifest version, number of
    * retained versions, live/raw row counts, batch partitions, pending
    * tombstones, and payload bytes — what a retention/compaction policy
    * reads before deciding to compact or vacuum. Filesystem +
    * metadata-sized aggregates only; never scans payload values. */
  def describe(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val version = IndexManifest.currentVersion(spark, path)
    val manifestDir = new Path(s"$path/manifest")
    val nVersions =
      if (fs.exists(manifestDir))
        fs.listStatus(manifestDir).count(_.getPath.getName.startsWith("v"))
      else 0
    val codesDir = new Path(IndexManifest.codesDir(spark, path))
    val batches = fs.listStatus(codesDir).filter(_.isDirectory)
      .count(_.getPath.getName.startsWith("__batch="))
    val bytes = fs.getContentSummary(codesDir).getLength
    // a zero-row build writes no parquet footers — schema inference
    // fails, but the honest answer is simply an empty index
    val rawIds = scala.util.Try(
        spark.read.parquet(codesDir.toString).select(col("vec_id")))
      .getOrElse(spark.range(0).select(col("id").as("vec_id")))
    val raw = rawIds.distinct().count()
    val tombs = loadTombstones(spark, path).count()
    val live = raw - rawIds.distinct()
      .join(broadcast(loadTombstones(spark, path)), Seq("vec_id"), "left_semi")
      .count()
    spark.sql(
      s"""SELECT ${version.getOrElse(-1L)}L AS version,
         |  $nVersions AS retained_versions,
         |  ${live}L AS live_items, ${raw}L AS raw_items,
         |  $batches AS batch_partitions,
         |  ${tombs}L AS pending_tombstones,
         |  ${bytes}L AS payload_bytes""".stripMargin)
  }

  /** One-call retention policy — what a scheduled maintenance task runs
    * against every index path: compact when pending tombstones exceed
    * `maxTombstoneRatio` of live items (or when any exist and live is
    * zero), then vacuum to the `keepVersions` most recent. Decisions
    * read [[describe]] (filesystem + metadata aggregates only); returns
    * a one-row report of what was done so the task can log it. */
  def maintain(spark: SparkSession, path: String,
      maxTombstoneRatio: Double = 0.1, keepVersions: Int = 2): DataFrame = {
    require(maxTombstoneRatio >= 0 && keepVersions >= 1)
    val d = describe(spark, path).head()
    val live = d.getAs[Long]("live_items")
    val tombs = d.getAs[Long]("pending_tombstones")
    val doCompact =
      tombs > 0 && (live == 0 || tombs.toDouble / live > maxTombstoneRatio)
    if (doCompact) compact(spark, path)
    val before = IndexManifest.committedVersions(spark, path).length
    vacuum(spark, path, keepVersions)
    val after = IndexManifest.committedVersions(spark, path).length
    spark.sql(
      s"""SELECT $doCompact AS compacted, ${tombs}L AS folded_tombstones,
         |  ${before - after} AS vacuumed_versions,
         |  ${IndexManifest.currentVersion(spark, path).getOrElse(-1L)}L
         |    AS current_version""".stripMargin)
  }

  // ---- sign-LSH lifecycle --------------------------------------------------
  // The multi-probe serving seam: repeatedly searching with
  // Knn.multiProbeSearch re-hashes the WHOLE corpus's bucket keys per
  // query batch (a full corpus scan each time). This index pins the
  // (vec_id, bucket) table once — 16 B/vector — on the shared
  // manifest/tombstone layout; the plane count is the never-refit
  // artifact (buckets are only comparable under one plane family, so it
  // travels in meta and appends reuse it). Searches then cost probe-key
  // broadcast + bucket equi-join + candidates-only vector loads.

  /** Hash the corpus once (planes derived from count via
    * [[Knn.planesFor]]) and persist keys + plane count. Rebuild commits
    * the NEXT version, as everywhere. */
  def buildSignLsh(emb: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val spark = emb.sparkSession
    val n = emb.count()
    val planes = if (n == 0) 4 else Knn.planesFor(n)
    val v = IndexManifest.nextBuildVersion(spark, path)
    // geometry lands under the NEW version's name BEFORE the marker, so
    // a crash mid-rebuild leaves the previous version snapshot-complete
    spark.sql(s"SELECT $planes AS planes")
      .write.mode("overwrite").parquet(s"$path/meta_v$v")
    emb.select(col(idCol).cast("long").as("vec_id"),
        graft.functions.SignBucketExpr(col(vecCol), planes).as("bucket"))
      .withColumn("__batch", lit(-1L))
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$path/codes_v$v")
    commitBuild(spark, path, v, Seq("meta"))
  }

  /** Hash NEW vectors under the SAVED plane count and append — never
    * refits. Keyed appends are exactly-once under replay. */
  def appendSignLsh(emb: DataFrame, idCol: String, vecCol: String,
      path: String, batchId: Option[Long] = None): Unit = {
    val planes = emb.sparkSession.read.parquet(
        IndexManifest.artifactDirAt(emb.sparkSession, path, "meta"))
      .head().getAs[Int]("planes")
    writeCodes(
      emb.select(col(idCol).cast("long").as("vec_id"),
        graft.functions.SignBucketExpr(col(vecCol), planes).as("bucket")),
      path, batchId)
  }

  /** Live bucket keys (vec_id, bucket), tombstones masked. */
  def loadSignLshKeys(spark: SparkSession, path: String): DataFrame =
    liveCodesResolved(spark, path, IndexManifest.resolve(spark, path),
      "vec_id LONG, bucket LONG, __batch LONG")

  /** Multi-probe search over the SAVED keys: the probe sequence derives
    * from the saved plane count, candidates meet the pinned bucket
    * table, and only candidates load vectors from `vectors` (joined by
    * id). Identical results to [[Knn.multiProbeSearch]] over the same
    * corpus — the persistence-losslessness proof is the shared oracle. */
  def searchSignLsh(spark: SparkSession, path: String, vectors: DataFrame,
      idCol: String, vecCol: String, queries: DataFrame, k: Int,
      probes: Int): DataFrame = {
    val r = IndexManifest.resolve(spark, path)
    val planes = spark.read
      .parquet(artifactDirResolved(r, path, "meta"))
      .head().getAs[Int]("planes")
    val keys = liveCodesResolved(spark, path, r,
      "vec_id LONG, bucket LONG, __batch LONG")
    val cand = broadcast(
        Knn.multiProbeKeys(queries, idCol, vecCol, planes, probes))
      .join(keys,
        col("__pk") === col("bucket") && col("__qid") =!= col("vec_id"))
      .select(col("__qid"), col("vec_id").as("__cid"))
    Knn.multiProbeRerank(cand, vectors, queries, idCol, vecCol, k)
  }

  /** [[searchSignLsh]] pinned to a retained historical `version`: the
    * probe keys derive from the PINNED plane count (geometry resolves
    * through the manifest at the pinned version — a later rebuild's
    * plane family can never decode a pinned key table) and candidates
    * meet the pinned composite view. The proof that geometry versioning
    * matters: bucket keys are only comparable under one plane family. */
  def searchSignLshAt(spark: SparkSession, path: String, version: Long,
      vectors: DataFrame, idCol: String, vecCol: String, queries: DataFrame,
      k: Int, probes: Int): DataFrame = {
    val planes = spark.read.parquet(
        IndexManifest.artifactDirAt(spark, path, "meta", Some(version)))
      .head().getAs[Int]("planes")
    val keys = loadCodesAt(spark, path, version)
      .select(col("vec_id"), col("bucket"))
    val cand = broadcast(
        Knn.multiProbeKeys(queries, idCol, vecCol, planes, probes))
      .join(keys,
        col("__pk") === col("bucket") && col("__qid") =!= col("vec_id"))
      .select(col("__qid"), col("vec_id").as("__cid"))
    Knn.multiProbeRerank(cand, vectors, queries, idCol, vecCol, k)
  }

  // ---- SQ8 lifecycle -------------------------------------------------------
  // Same faiss-shaped contract as the other quantizers: the per-dim
  // [min,max] fit is the artifact that must NOT be refit on append
  // (codes are only comparable under one range), codes are the
  // searchable payload on the shared manifest-versioned layout — so
  // deleteIds/compact/vacuum run on an SQ8 index unchanged.

  /** Fit the SQ8 range on `emb`, encode it, persist `path/sqfit` (1 row)
    * + manifest-versioned codes. */
  def buildSq8(emb: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val fit = SQ.fitMinMax(emb, vecCol).localCheckpoint(true)
    val v = IndexManifest.nextBuildVersion(emb.sparkSession, path)
    fit.write.mode("overwrite").parquet(s"$path/sqfit_v$v")
    SQ.withCodes(emb, vecCol, fit)
      .select(col(idCol).cast("long").as("vec_id"), col("qcode"))
      .withColumn("__batch", lit(-1L))
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$path/codes_v$v")
    commitBuild(emb.sparkSession, path, v, Seq("sqfit"))
  }

  /** Encode NEW vectors under the SAVED range and append — never refits.
    * Keyed appends are exactly-once under replay, as everywhere. */
  def appendSq8(emb: DataFrame, idCol: String, vecCol: String,
      path: String, batchId: Option[Long] = None): Unit = {
    val fit = emb.sparkSession.read.parquet(
      IndexManifest.artifactDirAt(emb.sparkSession, path, "sqfit"))
    writeCodes(
      SQ.withCodes(emb, vecCol, fit)
        .select(col(idCol).cast("long").as("vec_id"), col("qcode")),
      path, batchId)
  }

  /** Live SQ8 codes: (vec_id, qcode), tombstones masked. Explicit schema
    * keeps an empty index (zero-row build, or a compact that folded every
    * row away — a footerless dir) readable, like the other kinds. */
  def loadSq8Codes(spark: SparkSession, path: String): DataFrame =
    liveCodesResolved(spark, path, IndexManifest.resolve(spark, path),
      "vec_id LONG, qcode ARRAY<INT>, __batch LONG")

  /** Search a SAVED SQ8 index: queries encode under the saved fit, then
    * the exact-integer symmetric-distance top-k over the live codes —
    * identical results to searching the in-memory build. */
  def searchSq8(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val r = IndexManifest.resolve(spark, path)
    val fit = spark.read.parquet(artifactDirResolved(r, path, "sqfit"))
    SQ.searchTopK(
      liveCodesResolved(spark, path, r,
        "vec_id LONG, qcode ARRAY<INT>, __batch LONG"),
      "vec_id", "qcode",
      SQ.withCodes(queries, vecCol, fit)
        .select(col(idCol).as("vec_id"), col("qcode")),
      k)
  }

  /** [[searchSq8]] pinned to a retained `version`: queries encode under
    * the PINNED fit (a rebuild's new range would shift every code's
    * meaning under the pinned table) against the pinned composite view. */
  def searchSq8At(spark: SparkSession, path: String, version: Long,
      queries: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val fit = spark.read.parquet(
      IndexManifest.artifactDirAt(spark, path, "sqfit", Some(version)))
    SQ.searchTopK(
      loadCodesAt(spark, path, version).select(col("vec_id"), col("qcode")),
      "vec_id", "qcode",
      SQ.withCodes(queries, vecCol, fit)
        .select(col(idCol).as("vec_id"), col("qcode")),
      k)
  }

  /** Codes table of a saved index: (vec_id, code). Explicit schema keeps
    * an empty index readable (no footers to infer from). */
  def loadBinaryCodes(spark: SparkSession, path: String): DataFrame =
    spark.read.schema("vec_id LONG, code LONG, __batch LONG")
      .parquet(IndexManifest.codesDir(spark, path)).drop("__batch")

  /** Saved threshold artifact: the 1-row `__thr` frame `withCode` takes. */
  def loadBinaryThresholds(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(
      IndexManifest.artifactDirAt(spark, path, "thresholds"))

  /** Search a SAVED index: coarse Hamming over the loaded codes, rerank
    * against the vector source (joined by id — only candidates load
    * vectors). Result is identical to searching the in-memory build.
    * `onePass = true` runs the coarse stage as the single
    * partition-local pass ([[BinaryQuant.coarseHammingTopR]], no pair
    * materialization — the scale path, spec-equal to the declarative
    * form). */
  def searchBinary(spark: SparkSession, path: String, vectors: DataFrame,
      idCol: String, vecCol: String, queryIds: DataFrame => DataFrame,
      k: Int, rerankWidth: Int, onePass: Boolean = false): DataFrame = {
    val src = vectors.select(col(idCol).as("vec_id"), col(vecCol))
    val coded = liveCodesResolved(spark, path,
        IndexManifest.resolve(spark, path),
        "vec_id LONG, code LONG, __batch LONG")
      .join(src, "vec_id")
    if (onePass)
      BinaryQuant.hammingRerankTopKPartitioned(coded, "vec_id", vecCol,
        queryIds(coded), k, rerankWidth)
    else
      BinaryQuant.hammingRerankTopK(coded, "vec_id", vecCol,
        queryIds(coded), k, rerankWidth)
  }

  /** FILTERED ANN over a saved binary index: [[searchBinary]] with the
    * candidate corpus restricted to an `allowed` id set — the
    * metadata-predicated search every serving stack needs ("nearest
    * neighbors among label = 3 / lang = 'de' / date > X docs"). The
    * filter applies BEFORE the coarse stage (pre-filtering): the top-k
    * is exact among allowed vectors, where post-filtering a fixed-width
    * unfiltered candidate list would silently lose recall as the filter
    * gets selective (a 1% filter leaves ~0.3 of 32 candidates). Queries
    * are selected from the UNFILTERED live index — the query point need
    * not satisfy its own predicate. Scale: the semi-join moves 8 B ids
    * (Spark broadcasts a small allowed set on its own); the filter
    * composes with tombstones because it restricts the already-masked
    * live view. `allowed` must carry an `idCol` column; any metadata
    * predicate reduces to it via a select. */
  def searchBinaryFiltered(spark: SparkSession, path: String,
      vectors: DataFrame, idCol: String, vecCol: String,
      queryIds: DataFrame => DataFrame, k: Int, rerankWidth: Int,
      allowed: DataFrame, onePass: Boolean = false): DataFrame = {
    val src = vectors.select(col(idCol).as("vec_id"), col(vecCol))
    val coded = liveCodesResolved(spark, path,
        IndexManifest.resolve(spark, path),
        "vec_id LONG, code LONG, __batch LONG")
      .join(src, "vec_id")
    val corpus = coded.join(
      allowed.select(col(idCol).cast("long").as("vec_id")),
      Seq("vec_id"), "left_semi")
    if (onePass)
      BinaryQuant.hammingRerankTopKPartitioned(corpus, "vec_id", vecCol,
        queryIds(coded), k, rerankWidth)
    else
      BinaryQuant.hammingRerankTopK(corpus, "vec_id", vecCol,
        queryIds(coded), k, rerankWidth)
  }

  // ---- IVF-PQ lifecycle ----------------------------------------------------
  // Same faiss-shaped contract as the binary index, with a three-part
  // quantizer artifact: coarse centroids + residual sub-codebooks are the
  // parts that must NOT be refit on append (codes are only comparable
  // under one quantizer — faiss train() vs add()); the coded lists are the
  // searchable payload. All three persist as parquet; search runs
  // [[PQ.ivfPqProbeSearch]] over the loaded frames, so a saved-and-loaded
  // index returns exactly what the in-memory build returns.

  /** Train on `emb` (lists from `listCol`), encode it, persist
    * `path/{centroids,codebooks,codes,meta}`. Pass `residCodebook` (e.g.
    * the per-subspace k-means fit) to persist a production-quantizer
    * index — search and append read the saved codebooks and never care
    * how they were fit, so the whole lifecycle works unchanged. */
  def buildIvfPq(emb: DataFrame, idCol: String, vecCol: String,
      listCol: String, path: String, subspaces: Int, subDim: Int,
      residCodebook: Option[DataFrame => DataFrame] = None): Unit = {
    val (cents, rcw, codes) =
      PQ.ivfPqTrain(emb, idCol, vecCol, listCol, subspaces, subDim,
        residCodebook)
    val v = IndexManifest.nextBuildVersion(emb.sparkSession, path)
    // geometry travels with the index: search/append must never guess it
    // — and it lands under the NEW version's names BEFORE the commit
    // marker, so no reader can resolve a committed version whose
    // quantizer is missing or (worse) a rebuild's replacement
    cents.write.mode("overwrite").parquet(s"$path/centroids_v$v")
    rcw.write.mode("overwrite").parquet(s"$path/codebooks_v$v")
    emb.sparkSession.sql(s"SELECT $subspaces AS subspaces, $subDim AS sub_dim")
      .write.mode("overwrite").parquet(s"$path/meta_v$v")
    codes.select(col("vec_id").cast("long"), col("__list").cast("long"),
        col("s").cast("int"), col("code").cast("long"))
      .withColumn("__batch", lit(-1L))
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$path/codes_v$v")
    commitBuild(emb.sparkSession, path, v,
      Seq("centroids", "codebooks", "meta"))
  }

  /** Append NEW vectors under the SAVED quantizer: each is assigned to
    * its nearest saved centroid, its residual encoded with the saved
    * sub-codebooks, and only `path/codes` grows — centroids and codebooks
    * are read, never rewritten.
    *
    * Replay safety: pass the Structured Streaming `batchId` and the
    * append writes its own `__batch` partition with dynamic overwrite --
    * a foreachBatch retry (at-least-once) REPLACES the partition instead
    * of double-appending, making streaming ingest exactly-once
    * (spec-locked in IvfPqIndexSpec). Without a batchId the append
    * allocates the next free partition and is plain at-least-once. */
  def appendIvfPq(emb: DataFrame, idCol: String, vecCol: String,
      path: String, batchId: Option[Long] = None): Unit = {
    val spark = emb.sparkSession
    val meta = spark.read.parquet(
      IndexManifest.artifactDirAt(spark, path, "meta")).head()
    val (subspaces, subDim) =
      (meta.getAs[Int]("subspaces"), meta.getAs[Int]("sub_dim"))
    val cents = loadIvfPqCentroids(spark, path)
    val rcw = loadIvfPqCodebooks(spark, path)
    // materialize once: encode consumes `assigned` AND the __list
    // re-attach joins it again — without a cut the nearest-centroid
    // crossJoin + min_by would execute twice per append (drop-sized, so
    // the checkpoint is cheap; same discipline as ivfPqTrain's artifacts)
    val assigned = PQ.assignNearestList(emb, idCol, vecCol, cents)
      .localCheckpoint(true)
    writeCodes(
      PQ.encode(assigned, "vec_id", "__r", "__list", subspaces, subDim,
          Some(rcw))
        .join(assigned.select(col("vec_id"), col("__list")), Seq("vec_id"))
        .select(col("vec_id").cast("long"), col("__list").cast("long"),
          col("s").cast("int"), col("code").cast("long")),
      path, batchId)
  }

  def loadIvfPqCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(
      IndexManifest.artifactDirAt(spark, path, "centroids"))
  def loadIvfPqCodebooks(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(
      IndexManifest.artifactDirAt(spark, path, "codebooks"))
  def loadIvfPqCodes(spark: SparkSession, path: String): DataFrame =
    spark.read.schema("vec_id LONG, __list LONG, s INT, code LONG, __batch LONG")
      .parquet(IndexManifest.codesDir(spark, path)).drop("__batch")

  /** ADC search over a SAVED index: probe the loaded centroids, LUT from
    * the loaded codebooks, scan the loaded codes — identical results to
    * searching the in-memory build (the q_ivfpq_persist hash proof). */
  def searchIvfPq(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val r = IndexManifest.resolve(spark, path)
    val meta = spark.read
      .parquet(artifactDirResolved(r, path, "meta")).head()
    PQ.ivfPqProbeSearch(
      spark.read.parquet(artifactDirResolved(r, path, "centroids")),
      spark.read.parquet(artifactDirResolved(r, path, "codebooks")),
      liveCodesResolved(spark, path, r,
        "vec_id LONG, __list LONG, s INT, code LONG, __batch LONG"),
      queries, idCol, vecCol, k, nProbe,
      meta.getAs[Int]("subspaces"), meta.getAs[Int]("sub_dim"))
  }

  /** [[searchIvfPq]] pinned to a retained `version`: the whole quantizer
    * (centroids, sub-codebooks, meta) resolves at the pin — codes are
    * only decodable under the quantizer that produced them, so a pinned
    * ADC scan under a rebuild's artifacts would be silently wrong. */
  def searchIvfPqAt(spark: SparkSession, path: String, version: Long,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int): DataFrame = {
    def at(name: String) = spark.read.parquet(
      IndexManifest.artifactDirAt(spark, path, name, Some(version)))
    val meta = at("meta").head()
    PQ.ivfPqProbeSearch(
      at("centroids"), at("codebooks"),
      loadCodesAt(spark, path, version)
        .select(col("vec_id"), col("__list"), col("s"), col("code")),
      queries, idCol, vecCol, k, nProbe,
      meta.getAs[Int]("subspaces"), meta.getAs[Int]("sub_dim"))
  }
}
