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

  private[operators] def writeCodes(codes: DataFrame, path: String,
      batchId: Option[Long]): Unit = {
    val dir = IndexManifest.codesDir(codes.sparkSession, path)
    val batch = batchId.getOrElse(nextBatchId(codes.sparkSession, dir))
    codes.withColumn("__batch", lit(batch))
      .write.partitionBy("__batch")
      .mode(if (batchId.isDefined) "overwrite" else "append")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(dir)
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
    // re-commit of v0 over a compacted index); the commit marker lands
    // last so a crash mid-build leaves the previous version current
    val v = IndexManifest.nextBuildVersion(emb.sparkSession, path)
    thr.write.mode("overwrite").parquet(s"$path/thresholds")
    BinaryQuant.withCode(emb, vecCol, thr)
      .select(col(idCol).cast("long").as("vec_id"), col("code"))
      .withColumn("__batch", lit(-1L))
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$path/codes_v$v")
    IndexManifest.commit(emb.sparkSession, path, v)
  }

  /** Encode NEW vectors under the saved thresholds and append their codes
    * — never refits (refitting would silently shift bit meanings under
    * every code already in the index). Pass the streaming `batchId` for
    * replay-safe (exactly-once) ingest; without it the append is plain
    * at-least-once. */
  def appendBinary(emb: DataFrame, idCol: String, vecCol: String,
      path: String, batchId: Option[Long] = None): Unit = {
    val thr = emb.sparkSession.read.parquet(s"$path/thresholds")
    writeCodes(
      BinaryQuant.withCode(emb, vecCol, thr)
        .select(col(idCol).cast("long").as("vec_id"), col("code")),
      path, batchId)
  }

  // ---- delete + compaction (shared by both index kinds) --------------------
  // faiss remove_ids, Spark-native: deletes are (vec_id) TOMBSTONES —
  // append-only metadata, never a rewrite of the standing codes files —
  // and search masks them with a broadcast anti-join (tombstones are tiny
  // relative to the corpus by construction; a delete-heavy index should
  // compact). `compact` folds the tombstones in: codes are rewritten
  // minus deleted ids into the NEXT manifest version and committed with
  // one atomic marker rename (IndexManifest) — concurrent readers pinned
  // to the old version keep fully intact files until an explicit
  // `vacuum` reclaims them, the Iceberg/Delta expire-snapshots contract
  // kept minimal. (Pre-manifest legacy layouts still get the old
  // swap-in-place.)

  /** Tombstone ids out of the index at `path` (binary or IVF-PQ — the
    * layout is shared). Append-only; O(deleted) bytes. */
  def deleteIds(ids: DataFrame, idCol: String, path: String): Unit =
    ids.select(col(idCol).cast("long").as("vec_id")).distinct()
      .write.mode("append")
      .parquet(IndexManifest.tombstonesDir(ids.sparkSession, path))

  /** Current tombstone set: (vec_id), distinct; empty frame when none
    * have been written yet. */
  def loadTombstones(spark: SparkSession, path: String): DataFrame = {
    val t = new org.apache.hadoop.fs.Path(
      IndexManifest.tombstonesDir(spark, path))
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

  // ---- time travel ---------------------------------------------------------
  // The manifest already gives every reader snapshot isolation; these
  // expose it as an API — the Iceberg/Delta "VERSION AS OF" read, kept
  // minimal. A version's live view is its codes minus its OWN tombstone
  // log; once a version is superseded (compact or rebuild), that log is
  // frozen, so the view is stable until vacuum reclaims the files.
  // Version boundaries are builds and compactions — deletes mutate the
  // CURRENT version's log in place (monotone, same as appends), so "as
  // of version v" means "what a reader pinned to v serves now", not a
  // point-in-time before v's deletes.

  /** All committed versions still resolvable, ascending. */
  def versions(spark: SparkSession, path: String): Seq[Long] =
    IndexManifest.committedVersions(spark, path)

  private def tombstonesAt(spark: SparkSession, path: String,
      version: Long): DataFrame = {
    val t = new org.apache.hadoop.fs.Path(s"$path/tombstones_v$version")
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(t)) spark.read.parquet(t.toString).distinct()
    else spark.range(0).select(col("id").as("vec_id"))
  }

  /** The live payload AS OF a retained `version` (codes minus that
    * version's tombstones) — works for every index kind on the shared
    * layout (the schema is whatever the kind persists). Fails fast when
    * the version was never committed or its payload was vacuumed away. */
  def loadCodesAt(spark: SparkSession, path: String,
      version: Long): DataFrame = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/codes_v$version")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(IndexManifest.committedVersions(spark, path).contains(version),
      s"version $version was never committed at $path")
    require(fs.exists(dir),
      s"version $version of $path has been vacuumed — raise vacuum(keep)")
    spark.read.parquet(dir.toString).drop("__batch")
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
      val dir = new Path(s"$path/codes_v$v")
      if (!fs.exists(dir)) // vacuumed: marker retained, payload gone
        s"SELECT ${v}L AS version, ${v == cur} AS is_current, " +
          "false AS readable, CAST(NULL AS BIGINT) AS live_items, " +
          "CAST(NULL AS BIGINT) AS pending_tombstones, " +
          "CAST(NULL AS BIGINT) AS payload_bytes"
      else {
        // Try: a zero-row version has no footers to infer a schema from
        val live = scala.util.Try(loadCodesAt(spark, path, v)
          .select(col("vec_id")).distinct().count()).getOrElse(0L)
        val tombs = tombstonesAt(spark, path, v).count()
        val bytes = fs.getContentSummary(dir).getLength
        s"SELECT ${v}L AS version, ${v == cur} AS is_current, " +
          s"true AS readable, ${live}L AS live_items, " +
          s"${tombs}L AS pending_tombstones, ${bytes}L AS payload_bytes"
      }
    }
    rows.map(spark.sql).reduce(_ unionByName _)
  }

  /** Rewrite the live codes minus tombstones into the next manifest
    * version and commit it atomically; the new version's tombstone log
    * starts with only the deletes (if any) that arrived after the
    * compaction snapshot — late deletes are carried forward, not lost. Existing files are never modified OR deleted
    * — a reader that resolved the previous version mid-compact keeps a
    * complete directory until [[vacuum]]; batch partitioning is
    * preserved so post-compaction appends keep their replay safety.
    * No-op (beyond a read) when nothing is tombstoned. Legacy
    * (pre-manifest) indexes keep the old swap-in-place. */
  def compact(spark: SparkSession, path: String): Unit =
    compactWithHook(spark, path, () => ())

  /** [[compact]] with a seam between the tombstone snapshot and the
    * commit — test-only, to inject the delete-during-rewrite race the
    * carry-forward below closes. */
  private[operators] def compactWithHook(spark: SparkSession, path: String,
      afterSnapshot: () => Unit): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tomb = new org.apache.hadoop.fs.Path(
      IndexManifest.tombstonesDir(spark, path))
    if (!fs.exists(tomb)) return
    IndexManifest.currentVersion(spark, path) match {
      case Some(v) =>
        // pin the tombstone SNAPSHOT the rewrite folds in: deleteIds
        // appends to the old version's log, so a delete ingested while
        // the rewrite runs (async delete feed under one logical writer)
        // would otherwise be dropped when the new version starts with an
        // empty log — a silently lost removal
        val snapshot = loadTombstones(spark, path).localCheckpoint(true)
        afterSnapshot()
        spark.read.parquet(IndexManifest.codesDir(spark, path))
          .join(broadcast(snapshot), Seq("vec_id"), "left_anti")
          .write.partitionBy("__batch").mode("overwrite")
          .parquet(s"$path/codes_v${v + 1}")
        IndexManifest.commit(spark, path, v + 1)
        // carry forward any delete that landed after the snapshot: the
        // old log minus the folded set moves into the new version's log
        val late = spark.read.parquet(tomb.toString).distinct()
          .join(broadcast(snapshot), Seq("vec_id"), "left_anti")
        if (!late.isEmpty)
          late.write.mode("append")
            .parquet(IndexManifest.tombstonesDir(spark, path))
      case None => // legacy layout: the old swap
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
    * explicit GC that pairs with snapshot-safe [[compact]]. */
  def vacuum(spark: SparkSession, path: String, keep: Int = 1): Unit =
    IndexManifest.vacuum(spark, path, keep)

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
    emb.select(col(idCol).cast("long").as("vec_id"),
        graft.functions.SignBucketExpr(col(vecCol), planes).as("bucket"))
      .withColumn("__batch", lit(-1L))
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$path/codes_v$v")
    spark.sql(s"SELECT $planes AS planes")
      .write.mode("overwrite").parquet(s"$path/meta")
    IndexManifest.commit(spark, path, v)
  }

  /** Hash NEW vectors under the SAVED plane count and append — never
    * refits. Keyed appends are exactly-once under replay. */
  def appendSignLsh(emb: DataFrame, idCol: String, vecCol: String,
      path: String, batchId: Option[Long] = None): Unit = {
    val planes = emb.sparkSession.read.parquet(s"$path/meta")
      .head().getAs[Int]("planes")
    writeCodes(
      emb.select(col(idCol).cast("long").as("vec_id"),
        graft.functions.SignBucketExpr(col(vecCol), planes).as("bucket")),
      path, batchId)
  }

  /** Live bucket keys (vec_id, bucket), tombstones masked. */
  def loadSignLshKeys(spark: SparkSession, path: String): DataFrame =
    minusTombstones(spark, path,
      spark.read.schema("vec_id LONG, bucket LONG, __batch LONG")
        .parquet(IndexManifest.codesDir(spark, path))
        .drop("__batch"))

  /** Multi-probe search over the SAVED keys: the probe sequence derives
    * from the saved plane count, candidates meet the pinned bucket
    * table, and only candidates load vectors from `vectors` (joined by
    * id). Identical results to [[Knn.multiProbeSearch]] over the same
    * corpus — the persistence-losslessness proof is the shared oracle. */
  def searchSignLsh(spark: SparkSession, path: String, vectors: DataFrame,
      idCol: String, vecCol: String, queries: DataFrame, k: Int,
      probes: Int): DataFrame = {
    val planes = spark.read.parquet(s"$path/meta").head().getAs[Int]("planes")
    val cand = broadcast(
        Knn.multiProbeKeys(queries, idCol, vecCol, planes, probes))
      .join(loadSignLshKeys(spark, path),
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
    fit.write.mode("overwrite").parquet(s"$path/sqfit")
    SQ.withCodes(emb, vecCol, fit)
      .select(col(idCol).cast("long").as("vec_id"), col("qcode"))
      .withColumn("__batch", lit(-1L))
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$path/codes_v$v")
    IndexManifest.commit(emb.sparkSession, path, v)
  }

  /** Encode NEW vectors under the SAVED range and append — never refits.
    * Keyed appends are exactly-once under replay, as everywhere. */
  def appendSq8(emb: DataFrame, idCol: String, vecCol: String,
      path: String, batchId: Option[Long] = None): Unit = {
    val fit = emb.sparkSession.read.parquet(s"$path/sqfit")
    writeCodes(
      SQ.withCodes(emb, vecCol, fit)
        .select(col(idCol).cast("long").as("vec_id"), col("qcode")),
      path, batchId)
  }

  /** Live SQ8 codes: (vec_id, qcode), tombstones masked. Explicit schema
    * keeps an empty index (zero-row build, or a compact that folded every
    * row away — a footerless dir) readable, like the other kinds. */
  def loadSq8Codes(spark: SparkSession, path: String): DataFrame =
    minusTombstones(spark, path,
      spark.read.schema("vec_id LONG, qcode ARRAY<INT>, __batch LONG")
        .parquet(IndexManifest.codesDir(spark, path))
        .drop("__batch"))

  /** Search a SAVED SQ8 index: queries encode under the saved fit, then
    * the exact-integer symmetric-distance top-k over the live codes —
    * identical results to searching the in-memory build. */
  def searchSq8(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val fit = spark.read.parquet(s"$path/sqfit")
    SQ.searchTopK(loadSq8Codes(spark, path), "vec_id", "qcode",
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
    spark.read.parquet(s"$path/thresholds")

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
    val coded = minusTombstones(spark, path, loadBinaryCodes(spark, path))
      .join(src, "vec_id")
    if (onePass)
      BinaryQuant.hammingRerankTopKPartitioned(coded, "vec_id", vecCol,
        queryIds(coded), k, rerankWidth)
    else
      BinaryQuant.hammingRerankTopK(coded, "vec_id", vecCol,
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
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    rcw.write.mode("overwrite").parquet(s"$path/codebooks")
    // geometry travels with the index: search/append must never guess it
    // — and it lands BEFORE the commit marker, so no reader can resolve
    // a committed version whose meta is still missing
    emb.sparkSession.sql(s"SELECT $subspaces AS subspaces, $subDim AS sub_dim")
      .write.mode("overwrite").parquet(s"$path/meta")
    codes.select(col("vec_id").cast("long"), col("__list").cast("long"),
        col("s").cast("int"), col("code").cast("long"))
      .withColumn("__batch", lit(-1L))
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$path/codes_v$v")
    IndexManifest.commit(emb.sparkSession, path, v)
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
    val meta = spark.read.parquet(s"$path/meta").head()
    val (subspaces, subDim) =
      (meta.getAs[Int]("subspaces"), meta.getAs[Int]("sub_dim"))
    val cents = spark.read.parquet(s"$path/centroids")
    val rcw = spark.read.parquet(s"$path/codebooks")
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
    spark.read.parquet(s"$path/centroids")
  def loadIvfPqCodebooks(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/codebooks")
  def loadIvfPqCodes(spark: SparkSession, path: String): DataFrame =
    spark.read.schema("vec_id LONG, __list LONG, s INT, code LONG, __batch LONG")
      .parquet(IndexManifest.codesDir(spark, path)).drop("__batch")

  /** ADC search over a SAVED index: probe the loaded centroids, LUT from
    * the loaded codebooks, scan the loaded codes — identical results to
    * searching the in-memory build (the q_ivfpq_persist hash proof). */
  def searchIvfPq(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta").head()
    PQ.ivfPqProbeSearch(
      loadIvfPqCentroids(spark, path),
      loadIvfPqCodebooks(spark, path),
      minusTombstones(spark, path, loadIvfPqCodes(spark, path)),
      queries, idCol, vecCol, k, nProbe,
      meta.getAs[Int]("subspaces"), meta.getAs[Int]("sub_dim"))
  }
}
