package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted TEXT-SEARCH index — the retrieval family's production seam,
  * the way [[HammingIndex]]/[[MinHashIndex]] are the dedup family's: BM25
  * serving stops re-tokenizing the standing corpus per query batch. The
  * searchable payload is the POSTINGS table — one row per (doc, token)
  * with its term frequency, the DOC LENGTH denormalized onto every row,
  * and its positions, plus one reserved-token row per doc — persisted on
  * the SAME storage contract as every index here (manifest-versioned
  * batch-partitioned payload keyed by `vec_id`, versioned delete
  * segments), so [[VectorIndex.deleteIds]], [[VectorIndex.compact]],
  * [[VectorIndex.vacuum]], and the VERSION AS OF readers run on a search
  * index unchanged.
  *
  * Corpus statistics (N docs, Σ doc length) are what BM25 needs beyond
  * the query terms' postings, and re-aggregating them from per-doc rows
  * at probe time — exact, but O(corpus docs) per query batch — is a
  * serving scale-killer at 10 B docs. Instead the index persists a
  * per-batch STATS artifact (`stats_v<P>`, one 24-byte row per `__batch`
  * partition of payload P, written at build and maintained by each
  * append under the same dynamic-partition-overwrite replay key as the
  * codes), and a probe reads corpus stats as
  *
  *   Σ stats rows  −  (count, Σdl) of the PENDING-DELETED docs,
  *
  * where the correction aggregates the reserved doc-length rows
  * semi-joined to the pending tombstone set — O(drop), not O(corpus):
  * the tombstone set is small by contract (maintain() compacts past 10%)
  * and the doc-length rows are token-pruned (the reserved token sorts
  * first; `build`/`append` sort within partitions by token so row groups
  * prune). Deletes therefore still shift df, N, and Σdl the moment they
  * commit — no stale-statistics window — which is exactly what the
  * oracle's post-delete hash proves. Whenever the CURRENT payload has no
  * stats artifact (an index persisted before this artifact existed, or a
  * payload produced by the kind-agnostic [[VectorIndex.compact]]),
  * probes FALL BACK to the exact live-row aggregate — correctness never
  * depends on the artifact — and [[refreshStats]] / [[maintain]] restore
  * the O(1) path.
  *
  * Scale: the probe reads postings FILTERED to the query terms (a pushed
  * parquet predicate over token-sorted row groups) plus one stats read
  * of O(#batches) rows; scoring is the same integer-ppm BM25 arithmetic
  * the from-scratch scorer uses, so a probe is hash-identical to
  * recomputing over the live documents. Appends tokenize only the drop
  * (exactly-once under a streaming batchId, as everywhere). Indexes
  * persisted before doc-length denormalization must be rebuilt (their
  * files lack the `dl` column, as pre-positional ones lack `pos`).
  */
object SearchIndex {

  /** Reserved token key for per-doc length rows: the NUL character —
    * the Unicode tokenizer can never emit it (NUL is neither letter nor
    * digit, so it is always a separator), and it sorts before every real
    * token, clustering the reserved rows in the leading row groups. */
  val DlToken = "\u0000"

  private val PostingSchema =
    "vec_id LONG, token STRING, tf LONG, dl LONG, pos ARRAY<INT>"
  private val PostingSchemaB = PostingSchema + ", __batch LONG"
  private val StatsSchema = "n_docs LONG, sum_dl LONG, __batch LONG"
  private val TstatsSchema =
    "token STRING, df LONG, max_tf LONG, min_dl LONG, __batch LONG"

  private def postingsOf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // Unicode tokenization (graft.functions.Text.unicodeTokens):
    // lowercase + split on non-letter/digit runs — production-true on
    // real web text (punctuation, tabs, Unicode whitespace, mixed case),
    // mirrored exactly by the DuckDB oracles via unicodeTokensSql
    val toks = docs.select(col(idCol).cast("long").as("vec_id"),
      graft.functions.Text.unicodeTokens(col(textCol)).as("__toks"))
    // positional postings (1-based, sorted): tf rides along; positions
    // cost ~one int per token occurrence — the standard positional-index
    // trade, what phrase queries pay for. The doc length rides on EVERY
    // posting row (8 B) so scoring never joins a per-doc table: the
    // probe's only reads are the query terms' own postings.
    val tf = toks
      .select(col("vec_id"), size(col("__toks")).cast("long").as("dl"),
        posexplode(col("__toks")).as(Seq("__i", "token")))
      .groupBy(col("vec_id"), col("token"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"),
        sort_array(collect_list(col("__i") + 1)).as("pos"))
      .select(col("vec_id"), col("token"), col("tf"), col("dl"), col("pos"))
    val dl = toks.select(col("vec_id"), lit(DlToken).as("token"),
      size(col("__toks")).cast("long").as("tf"),
      size(col("__toks")).cast("long").as("dl"),
      array().cast("array<int>").as("pos"))
    tf.unionByName(dl).sortWithinPartitions(col("token"))
  }

  /** Per-batch corpus-stats rows of `postings` (already batch-stamped):
    * (n_docs, Σdl) per `__batch`, from the reserved rows. */
  private def batchStatsOf(postings: DataFrame): DataFrame =
    postings.filter(col("token") === DlToken)
      .groupBy(col("__batch"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tf")).as("sum_dl"))

  /** Per-(token, batch) TERM-stats rows of `postings` (already
    * batch-stamped), excluding the reserved rows: document frequency,
    * max term frequency, min doc length — the inputs of [[bm25Pruned]]'s
    * per-term score upper bounds. O(vocab × batches) rows (vs the
    * postings' per-(token, doc)); token-sorted within partitions so a
    * probe's read is a pushed-predicate row-group scan. */
  private def termStatsOf(postings: DataFrame): DataFrame =
    postings.filter(col("token") =!= DlToken)
      .groupBy(col("token"), col("__batch"))
      .agg(count(lit(1)).as("df"), max(col("tf")).as("max_tf"),
        min(col("dl")).as("min_dl"))
      .select(col("token"), col("df"), col("max_tf"), col("min_dl"),
        col("__batch"))
      .sortWithinPartitions(col("token"))

  /** Tokenize + persist the standing corpus (build partition
    * `__batch=-1`) plus its stats artifact. Rebuild into an existing
    * index commits the NEXT manifest version, like every build here. */
  def build(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val spark = docs.sparkSession
    val v = IndexManifest.nextBuildVersion(spark, path)
    postingsOf(docs, idCol, textCol)
      .withColumn("__batch", lit(-1L))
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$path/codes_v$v")
    // stats from the payload just written (a token-pruned read-back, not
    // a second tokenization), landing BEFORE the commit marker like every
    // geometry artifact — a crash mid-build leaves the previous version
    // payload+stats complete
    val payload =
      spark.read.schema(PostingSchemaB).parquet(s"$path/codes_v$v")
    batchStatsOf(payload)
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$path/stats_v$v")
    termStatsOf(payload)
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$path/tstats_v$v")
    VectorIndex.commitBuild(spark, path, v, Seq("stats", "tstats"))
  }

  /** Tokenize NEW docs only, append their postings, and upsert the
    * batch's stats row. Pass the streaming `batchId` for exactly-once
    * replay — the stats row is keyed by the same `__batch` partition as
    * the codes, so a replay replaces both instead of double-counting.
    * The stats row lands AFTER the codes commit: a concurrent
    * current-version reader in that window sees the batch's postings
    * with pre-batch corpus stats (the same read-what's-on-disk window
    * any current read has for a mid-flight append); keyed replay repairs
    * a crash between the two writes, and pinned readers ([[bm25At]])
    * never observe the window — their stats are watermark-bounded. */
  def append(docs: DataFrame, idCol: String, textCol: String, path: String,
      batchId: Option[Long] = None): Unit = {
    val spark = docs.sparkSession
    val batch = VectorIndex.writeCodes(postingsOf(docs, idCol, textCol),
      path, batchId)
    def batchRows = spark.read.schema(PostingSchemaB)
      .parquet(IndexManifest.codesDir(spark, path))
      .filter(col("__batch") === batch)
    currentArtifactDir(spark, path, "stats").foreach { statsDir =>
      batchStatsOf(batchRows)
        .write.partitionBy("__batch").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(statsDir)
    }
    currentArtifactDir(spark, path, "tstats").foreach { tsDir =>
      termStatsOf(batchRows)
        .write.partitionBy("__batch").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(tsDir)
    }
  }

  /** The `name` artifact dir of the CURRENT payload, when it exists —
    * stats artifacts are payload-exact (batch rows describe that
    * payload's partitions), so resolution is an exact version match,
    * never [[IndexManifest.artifactDirAt]]'s newest-at-or-below rule: a
    * compacted payload must NOT inherit the pre-compact artifact. */
  private def currentArtifactDir(spark: SparkSession, path: String,
      name: String): Option[String] = {
    val dir = for {
      v <- IndexManifest.currentVersion(spark, path)
      p <- IndexManifest.payloadVersionAt(spark, path, v)
    } yield s"$path/${name}_v$p"
    dir.filter { d =>
      val hp = new org.apache.hadoop.fs.Path(d)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
    }
  }

  /** MERGE shard indexes into one — the consolidation step of every
    * sharded indexing pipeline (per-partition indexes built in parallel,
    * one serving index published): each source's LIVE view (tombstones
    * applied, current version) unions into a fresh build-shaped payload
    * at `dst`, with both stats artifacts recomputed and ONE atomic
    * commit — `dst` serves its previous version until the marker lands,
    * and a crash mid-merge leaves it untouched. Doc-id spaces must be
    * disjoint (checked with one token-pruned aggregate over the reserved
    * doc-length rows, never the full postings). The merged index is a
    * normal index: append/delete/compact/time-travel all apply. Scale:
    * the merge moves each source's live postings exactly once (a read +
    * a partitioned write, no shuffle — postings re-sort within
    * partitions by token for row-group pruning), and sources stay
    * readable throughout. */
  def merge(spark: SparkSession, sources: Seq[String], dst: String): Unit = {
    require(sources.nonEmpty)
    val lives = sources.map(load(spark, _))
    val perSource = lives.map(
      _.filter(col("token") === DlToken).count())
    val union = lives.reduce(_ unionByName _)
    val mergedDocs =
      union.filter(col("token") === DlToken)
        .select(col("vec_id")).distinct().count()
    require(mergedDocs == perSource.sum,
      s"doc-id spaces overlap: ${perSource.sum} source docs, " +
        s"$mergedDocs distinct ids — merge requires disjoint shards")
    val v = IndexManifest.nextBuildVersion(spark, dst)
    union.sortWithinPartitions(col("token"))
      .withColumn("__batch", lit(-1L))
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$dst/codes_v$v")
    val payload =
      spark.read.schema(PostingSchemaB).parquet(s"$dst/codes_v$v")
    batchStatsOf(payload)
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$dst/stats_v$v")
    termStatsOf(payload)
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$dst/tstats_v$v")
    VectorIndex.commitBuild(spark, dst, v, Seq("stats", "tstats"))
  }

  /** Incrementally maintain this index from a [[TableManifest]] change
    * feed — the composition that keeps a serving index in step with its
    * source table WITHOUT rebuilding: inserts append (tokenizing only
    * the drop), deletes tombstone, and the whole step costs O(changes)
    * on the append-feed path. The one subtlety is REWRITES (a
    * replacement feed emits delete + insert for the same id): a
    * tombstone masks its id across later appends by design, so when the
    * insert set intersects the pending tombstones the sync folds them
    * ([[VectorIndex.compact]]) before appending — detected with one
    * O(changes) semi-join, paid only when a rewrite actually happened
    * (never on the append-only fast path). Deletes apply before inserts,
    * so a rewritten doc's old postings die and its new ones live. */
  def syncFromTable(spark: SparkSession, tablePath: String,
      indexPath: String, fromVersion: Long, toVersion: Long,
      idCol: String, textCol: String): Unit = {
    val feed = TableManifest
      .readChanges(spark, tablePath, fromVersion, toVersion)
    val dels = feed.filter(col("_change_type") === "delete")
      .select(col(idCol)).distinct().localCheckpoint(true)
    val ins = feed.filter(col("_change_type") === "insert")
      .select(col(idCol), col(textCol)).localCheckpoint(true)
    if (!dels.isEmpty) VectorIndex.deleteIds(dels, idCol, indexPath)
    if (!ins.isEmpty) {
      val pending = IndexManifest.currentVersion(spark, indexPath)
        .map(v => VectorIndex.tombstonesAt(spark, indexPath, v))
      val readded = pending.exists(t =>
        !ins.select(col(idCol).cast("long").as("vec_id"))
          .join(broadcast(t), Seq("vec_id"), "left_semi").isEmpty)
      if (readded) {
        VectorIndex.compact(spark, indexPath)
        refreshStats(spark, indexPath) // compacted payload: new artifacts
      }
      append(ins, idCol, textCol, indexPath)
    }
  }

  /** Recompute the stats artifact for the CURRENT payload from its raw
    * batch rows — the repair after a kind-agnostic [[VectorIndex
    * .compact]] produced a payload without one (probes stay exact via
    * the fallback; this restores the O(1)-stats path). One token-pruned
    * pass; no-op on legacy layouts. */
  def refreshStats(spark: SparkSession, path: String): Unit =
    for {
      v <- IndexManifest.currentVersion(spark, path)
      p <- IndexManifest.payloadVersionAt(spark, path, v)
    } {
      val payload =
        spark.read.schema(PostingSchemaB).parquet(s"$path/codes_v$p")
      batchStatsOf(payload)
        .write.partitionBy("__batch").mode("overwrite")
        .parquet(s"$path/stats_v$p")
      termStatsOf(payload)
        .write.partitionBy("__batch").mode("overwrite")
        .parquet(s"$path/tstats_v$p")
    }

  /** [[VectorIndex.maintain]] + stats repair: compaction writes a new
    * payload (no stats artifact yet — probes fall back to the exact live
    * aggregate), so a search index's maintenance recomputes it. */
  def maintain(spark: SparkSession, path: String,
      maxTombstoneRatio: Double = 0.1, keepVersions: Int = 2): DataFrame = {
    val report =
      VectorIndex.maintain(spark, path, maxTombstoneRatio, keepVersions)
    if (report.head().getAs[Boolean]("compacted")) refreshStats(spark, path)
    report
  }

  /** Live postings (vec_id, token, tf, dl, pos) including the reserved
    * doc-length rows, tombstones masked. Explicit schema keeps an empty
    * index readable, as with the other text indexes. */
  def load(spark: SparkSession, path: String): DataFrame = {
    val r = IndexManifest.resolve(spark, path)
    r.current match {
      case Some(cur) => liveResolved(spark, path, r, cur, bounded = false)
      case None => // legacy (pre-manifest) layout
        VectorIndex.minusTombstones(spark, path,
          spark.read.schema(PostingSchemaB)
            .parquet(IndexManifest.codesDir(spark, path))
            .drop("__batch"))
    }
  }

  /** Live postings AS OF a retained `version` — [[VectorIndex
    * .loadCodesAt]]'s composite resolution (payload ≤ v, batches ≤ its
    * watermark, minus its pending delete segments) with the posting
    * schema, so zero-row historical payloads stay readable. */
  def loadAt(spark: SparkSession, path: String, version: Long): DataFrame = {
    val r = IndexManifest.resolve(spark, path)
    require(r.committed.contains(version),
      s"version $version was never committed at $path")
    liveResolved(spark, path, r, version, bounded = true)
  }

  /** The composite view's postings from ONE resolution snapshot (all
    * probe entry points resolve once — [[IndexManifest.resolve]] — so a
    * probe costs two listing RPCs, not a dozen). `bounded` applies the
    * version's append watermark (pinned reads); the current-version live
    * read deliberately does not, matching every live reader here. */
  private def liveResolved(spark: SparkSession, path: String,
      r: IndexManifest.Resolved, version: Long, bounded: Boolean): DataFrame = {
    val p = r.payloadAt(version)
    require(p.isDefined,
      s"version $version of $path has been vacuumed — raise vacuum(keep)")
    val base = spark.read.schema(PostingSchemaB)
      .parquet(s"$path/codes_v${p.get}")
    val wmF =
      if (bounded)
        base.filter(col("__batch") <=
          IndexManifest.watermarkAt(spark, path, version))
      else base
    wmF.drop("__batch")
      .join(broadcast(segTombstones(spark, path, r, version)),
        Seq("vec_id"), "left_anti")
  }

  private def segTombstones(spark: SparkSession, path: String,
      r: IndexManifest.Resolved, version: Long): DataFrame = {
    val segs = r.segmentsAt(version).map(d => s"$path/tombstones_v$d")
    if (segs.isEmpty) spark.range(0).select(col("id").as("vec_id"))
    else spark.read.schema("vec_id LONG").parquet(segs: _*).distinct()
  }

  /** [[bm25]] pinned to a retained historical `version` — what the index
    * ranked as of that snapshot, IMMUTABLE under later deletes, appends,
    * and rebuilds (the composite-manifest guarantee). Corpus stats
    * resolve the pinned payload's stats artifact restricted to the pin's
    * watermark, corrected by the pin's own pending-delete segments —
    * same O(drop) probe cost as the live path, same exact-live-aggregate
    * fallback when the artifact is absent. */
  def bm25At(spark: SparkSession, path: String, version: Long,
      terms: Seq[String], k: Int): DataFrame = {
    require(!terms.contains(DlToken))
    val r = IndexManifest.resolve(spark, path)
    require(r.committed.contains(version),
      s"version $version was never committed at $path")
    val live = liveResolved(spark, path, r, version, bounded = true)
    scorePostings(live, statsResolved(spark, path, r, version, live),
      terms, k)
  }

  /** 1-row (n_docs, sum_dl) of the view AS OF `version` from the shared
    * resolution snapshot: the payload's stats rows at-or-below the
    * watermark, minus the pending-deleted docs; exact live aggregate
    * when no artifact exists for that payload. */
  private def statsResolved(spark: SparkSession, path: String,
      r: IndexManifest.Resolved, version: Long, live: DataFrame): DataFrame = {
    def liveExact = live.filter(col("token") === DlToken)
      .agg(count(lit(1)).as("n_docs"), sum(col("tf")).as("sum_dl"))
    // completeness guard (the trustedTstats rule, applied to scoring
    // stats too): writeCodes commits the append's version BEFORE the
    // batch's stats row lands, so a crash in between leaves a committed
    // batch whose postings are live but absent from the artifact —
    // trusting it would silently undercount N and Σdl forever. Both
    // artifacts are `__batch`-partitioned, so the check is two shallow
    // dir listings, no row read.
    def batchDirsOf(dir: String): Option[Set[Long]] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else Some(fs.listStatus(p).map(_.getPath.getName)
        .collect { case n if n.startsWith("__batch=") =>
          n.stripPrefix("__batch=").toLong }.toSet)
    }
    r.payloadAt(version)
      .filter(pv => r.disk.getOrElse("stats", Nil).contains(pv))
      .filter { pv =>
        val wm = IndexManifest.watermarkAt(spark, path, version)
        (batchDirsOf(s"$path/codes_v$pv"), batchDirsOf(s"$path/stats_v$pv"))
          match {
          case (Some(pb), Some(sb)) => pb.filter(_ <= wm).subsetOf(sb)
          case _ => false
        }
      } match {
      case None => liveExact
      case Some(pv) =>
        val wm = IndexManifest.watermarkAt(spark, path, version)
        val base = spark.read.schema(StatsSchema).parquet(s"$path/stats_v$pv")
          .filter(col("__batch") <= wm)
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("sum_dl")).as("sum_dl"))
        if (r.segmentsAt(version).isEmpty) base
        else {
          val deleted = spark.read.schema(PostingSchemaB)
            .parquet(s"$path/codes_v$pv")
            .filter(col("token") === DlToken && col("__batch") <= wm)
            .join(broadcast(segTombstones(spark, path, r, version)),
              Seq("vec_id"), "left_semi")
            .agg(count(lit(1)).as("__dn"),
              coalesce(sum(col("tf")), lit(0L)).as("__ddl"))
          base.crossJoin(broadcast(deleted))
            .select((col("n_docs") - col("__dn")).as("n_docs"),
              (col("sum_dl") - col("__ddl")).as("sum_dl"))
        }
    }
  }

  /** Boolean retrieval over the live index: documents containing ALL of
    * `must`, at least one of `should` (ignored when empty), and NONE of
    * `mustNot` — ranked by the BM25 score of the positive terms (must ++
    * should). Pure postings algebra: the conjunctive gate is an n_terms
    * count over the must-postings (no per-term join chain), the
    * exclusion a broadcast anti-join on the mustNot postings' doc ids —
    * per-term work stays that term's posting list, never the corpus. */
  def booleanSearch(spark: SparkSession, path: String, must: Seq[String],
      should: Seq[String], mustNot: Seq[String], k: Int): DataFrame = {
    require(must.nonEmpty || should.nonEmpty)
    require(!(must ++ should ++ mustNot).contains(DlToken))
    val r = IndexManifest.resolve(spark, path)
    val live = r.current match {
      case Some(cur) => liveResolved(spark, path, r, cur, bounded = false)
      case None => load(spark, path)
    }
    val positive = (must ++ should).distinct
    // candidate gate: docs matching every `must` term (count over the
    // must postings — one row per (doc, term), so n = #must means all)
    val gated =
      if (must.isEmpty) live.filter(col("token").isin(positive: _*))
        .select(col("vec_id")).distinct()
      else live.filter(col("token").isin(must.distinct: _*))
        .groupBy(col("vec_id")).agg(count(lit(1)).as("__nm"))
        .filter(col("__nm") === must.distinct.size)
        .select(col("vec_id"))
    val excluded =
      if (mustNot.isEmpty) spark.range(0).select(col("id").as("vec_id"))
      else live.filter(col("token").isin(mustNot.distinct: _*))
        .select(col("vec_id")).distinct()
    val candidates = gated.join(broadcast(excluded), Seq("vec_id"),
      "left_anti")
    val corpus = r.current match {
      case Some(cur) => statsResolved(spark, path, r, cur, live)
      case None =>
        live.filter(col("token") === DlToken)
          .agg(count(lit(1)).as("n_docs"), sum(col("tf")).as("sum_dl"))
    }
    scorePostings(live, corpus, positive, k, Some(candidates))
  }

  /** Faceted search: the distribution of a metadata column over the
    * documents matching ALL of `must` — the result-page sidebar ("1,204
    * in German, 310 in French…"). The match set comes from the index
    * (the conjunctive postings gate, [[booleanSearch]]'s), the facet
    * values from the caller's metadata table: Spark-first, the metadata
    * JOIN is the natural plan — the match set moves as 8 B ids and the
    * facet aggregate is map-side-combinable, so duplicating metadata
    * into the index (Lucene doc values) buys nothing a semi-join does
    * not. Returns (facet, n_docs) for the top `k` facet values by
    * matching-doc count (ties toward the smaller facet value). */
  def facetCounts(spark: SparkSession, path: String, must: Seq[String],
      meta: DataFrame, idCol: String, facetCol: String,
      k: Int): DataFrame = {
    require(must.nonEmpty && !must.contains(DlToken))
    val live = load(spark, path)
    val matched = live.filter(col("token").isin(must.distinct: _*))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("__nm"))
      .filter(col("__nm") === must.distinct.size)
      .select(col("vec_id"))
    meta.select(col(idCol).cast("long").as("vec_id"),
        col(facetCol).as("facet"))
      .join(matched, Seq("vec_id"), "left_semi")
      .groupBy(col("facet")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("facet"))
      .limit(k)
  }

  /** Term completion: the live vocabulary under `prefix`, ranked by
    * document frequency — the search-box autocomplete surface, served
    * entirely from the postings index. The prefix is a pushed
    * StringStartsWith over token-sorted row groups (build/append sort
    * within partitions by token), so the scan reads the prefix's own
    * token range, never the corpus. Returns (token, df, n_occurrences)
    * ranked (df desc, token), top `k`. */
  def completeTerm(spark: SparkSession, path: String, prefix: String,
      k: Int): DataFrame = {
    require(prefix.nonEmpty && !prefix.startsWith(DlToken))
    load(spark, path)
      .filter(col("token").startsWith(prefix))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("n_occurrences"))
      .orderBy(col("df").desc, col("token"))
      .limit(k)
  }

  /** Exact-phrase occurrence counts over the live index: (doc_id,
    * n_matches > 0) for every doc containing `terms` as CONSECUTIVE
    * tokens, multiplicity = number of starting positions. Serves from
    * positional postings only — the document text is never read: the
    * first term's positions seed the candidates and each later term
    * joins on (doc, position + offset), so per-term work is that term's
    * posting list, never the corpus. (Indexes persisted before
    * positional postings read `pos` as null and must be rebuilt for
    * phrase queries; BM25 is unaffected.) */
  def phrase(spark: SparkSession, path: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && !terms.contains(DlToken))
    val live = load(spark, path)
    def positionsOf(t: String, as: String): DataFrame =
      live.filter(col("token") === t)
        .select(col("vec_id"), explode(col("pos")).as(as))
    var cur = positionsOf(terms.head, "__start")
    terms.zipWithIndex.drop(1).foreach { case (t, offset) =>
      cur = cur.join(positionsOf(t, "__pn"), Seq("vec_id"))
        .filter(col("__pn") === col("__start") + offset)
        .drop("__pn")
    }
    cur.groupBy(col("vec_id").as("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Ordered PROXIMITY ("sloppy" phrase) over the live index: documents
    * where `terms` occur in order with each adjacent pair at most
    * `1 + slop` positions apart (slop = 0 degenerates to [[phrase]]'s
    * exact adjacency). Multiplicity = number of qualifying position
    * tuples — the same chain-join plan as [[phrase]] with a bounded gap
    * RANGE on each hop instead of a fixed offset, so per-term work is
    * still that term's posting list: each hop is an equi-join on the doc
    * id with the gap window as a residual filter, never a
    * position-cross-product. */
  def phraseNear(spark: SparkSession, path: String, terms: Seq[String],
      slop: Int): DataFrame = {
    require(terms.size >= 2 && slop >= 0 && !terms.contains(DlToken))
    val live = load(spark, path)
    def positionsOf(t: String, as: String): DataFrame =
      live.filter(col("token") === t)
        .select(col("vec_id"), explode(col("pos")).as(as))
    var cur = positionsOf(terms.head, "__p")
    terms.drop(1).foreach { t =>
      cur = cur.join(positionsOf(t, "__pn"), Seq("vec_id"))
        .filter(col("__pn") - col("__p") >= 1 &&
          col("__pn") - col("__p") <= 1 + slop)
        .drop("__p").withColumnRenamed("__pn", "__p")
    }
    cur.groupBy(col("vec_id").as("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Snippet localization: for every live document containing ALL of
    * `terms` (any order), the MINIMAL position window covering one
    * occurrence of each — what a result page highlights. Returns
    * (doc_id, win_start, win_end, win_len), ties broken toward the
    * earliest window. Served from positional postings only; the chain
    * join carries a running (lo, hi) envelope per combination and a
    * single min_by picks the tightest, so per-term work is that term's
    * posting list and per-doc work is the product of ITS OWN tiny
    * position lists (the same per-doc bound any posting-based
    * highlighter pays), never anything corpus-sized. */
  def snippetWindow(spark: SparkSession, path: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size &&
      !terms.contains(DlToken))
    val live = load(spark, path)
    def positionsOf(t: String, as: String): DataFrame =
      live.filter(col("token") === t)
        .select(col("vec_id"), explode(col("pos")).as(as))
    var cur = positionsOf(terms.head, "__p")
      .select(col("vec_id"), col("__p").as("__lo"), col("__p").as("__hi"))
    terms.drop(1).foreach { t =>
      cur = cur.join(positionsOf(t, "__pn"), Seq("vec_id"))
        .select(col("vec_id"), least(col("__lo"), col("__pn")).as("__lo"),
          greatest(col("__hi"), col("__pn")).as("__hi"))
    }
    cur.groupBy(col("vec_id").as("doc_id"))
      .agg(min_by(struct(col("__lo"), col("__hi")),
        struct(col("__hi") - col("__lo"), col("__lo"))).as("__w"))
      .select(col("doc_id"), col("__w.__lo").as("win_start"),
        col("__w.__hi").as("win_end"),
        (col("__w.__hi") - col("__w.__lo") + 1).as("win_len"))
  }

  /** BM25 top-`k` over the live index for `terms` — identical integer-ppm
    * arithmetic (k1=1.2, b=0.75, log-free Robertson idf) to the
    * from-scratch scorer, so serving from the index is hash-equal to
    * recomputing over the live documents. Returns (doc_id, score_ppm,
    * n_terms) ranked (score desc, doc_id). */
  def bm25(spark: SparkSession, path: String, terms: Seq[String],
      k: Int): DataFrame = {
    require(!terms.contains(DlToken))
    val r = IndexManifest.resolve(spark, path)
    r.current match {
      case Some(cur) =>
        val live = liveResolved(spark, path, r, cur, bounded = false)
        scorePostings(live, statsResolved(spark, path, r, cur, live),
          terms, k)
      case None => // legacy: exact aggregate over the live rows
        val live = load(spark, path)
        scorePostings(live,
          live.filter(col("token") === DlToken)
            .agg(count(lit(1)).as("n_docs"), sum(col("tf")).as("sum_dl")),
          terms, k)
    }
  }

  /** MaxScore-pruned BM25 top-`k` — EXACTLY [[bm25]]'s result (same
    * integer-ppm arithmetic, same tie-breaking; the oracle hash proves
    * it), computed without pushing every matching document through the
    * scoring aggregate. The serving problem it solves: a query mixing a
    * rare term with common ones ("dup AND the AND data") matches nearly
    * the whole corpus through its common terms, and full scoring
    * aggregates one row per (matching doc, term) — at 10 B docs that is
    * a corpus-sized shuffle for every such query, though the top-k is
    * decided almost entirely by the rare term. MaxScore (Turtle &
    * Flood 1995) bounds each term's best possible contribution and
    * proves most of those rows can never matter.
    *
    * The per-term bound comes from the `tstats` artifact (one
    * (df, max tf, min dl) row per token × batch — O(vocab) rows, not
    * O(postings)): contrib_ppm is monotone increasing in tf, decreasing
    * in dl and df (integer division preserves monotonicity: A div B with
    * A, B > 0 is nondecreasing when the real ratio is), so
    *
    *   UB(t) = idf_ppm(max(1, Σdf − P)) · tf_ppm(max tf, min dl) div 1e6
    *
    * with P = pending-tombstone count (each pending delete removes at
    * most one doc from any term's df, so Σdf − P is a true df lower
    * bound and idf, decreasing in df, stays an upper bound; max tf /
    * min dl only shrink/grow under deletes, so they stay valid) and the
    * exact live (N, Σdl) from the stats artifact. Then:
    *
    *  1. seed: fully score the docs of the highest-UB term t1 (its
    *     postings are small — high UB means high idf means rare) and
    *     take θ = the k-th best of those true final scores;
    *  2. partition: order terms by UB ascending; the longest prefix with
    *     Σ UB < θ (strict) is NON-ESSENTIAL — a doc containing only
    *     those terms scores ≤ Σ UB < θ while ≥ k docs score ≥ θ, so it
    *     can never enter the top-k regardless of tie-breaking;
    *  3. score exactly (corpus-global df, as always) ONLY the docs
    *     containing at least one essential term.
    *
    * Scale: scored-row volume drops from Σ|postings(t)| to
    * |candidates| × |terms| — the common terms' postings still stream
    * through the token-pruned scan for the candidate semi-join and the
    * df count, but they no longer fan into the per-doc aggregate or its
    * shuffle. Falls back to the unpruned path (identical result, the
    * exactness never depends on the artifact) when the artifact is
    * missing or incomplete (a crash between an append's codes and
    * artifact writes — detected by comparing the artifact's batch set
    * against the payload's partitions), when fewer than k docs contain
    * t1, or when every term ends up essential. */
  def bm25Pruned(spark: SparkSession, path: String, terms: Seq[String],
      k: Int): DataFrame = {
    require(k >= 1 && terms.nonEmpty && !terms.contains(DlToken))
    val r = IndexManifest.resolve(spark, path)
    if (r.current.isEmpty) return bm25(spark, path, terms, k)
    val cur = r.current.get
    val live = liveResolved(spark, path, r, cur, bounded = false)
    val corpus = statsResolved(spark, path, r, cur, live)
    def unpruned = scorePostings(live, corpus, terms, k)
    val qts = terms.distinct
    if (qts.size < 2) return unpruned
    val bOpt = termUpperBoundsResolved(spark, path, r, cur, corpus, qts)
    if (bOpt.isEmpty) return unpruned
    val bounds = bOpt.get
    val ub = qts.map(t => t -> bounds.ub.getOrElse(t, 0L))
    if (ub.forall(_._2 == 0L)) return unpruned // no term in the corpus
    // with no pending deletes the artifact's per-token df sums are EXACT
    // document frequencies — the scoring jobs then skip the count
    // aggregate over every query term's full postings (at serving scale
    // the common terms' postings are corpus-sized; the artifact rows are
    // O(#batches) per token)
    val dfExact =
      if (bounds.pending > 0L) None
      else Some(bounds.tstats.filter(col("token").isin(qts: _*))
        .groupBy(col("token")).agg(sum(col("df")).as("df")))
    val t1 = ub.maxBy { case (t, u) => (u, t) }._1
    val seed = scorePostings(live, corpus, terms, k,
      Some(live.filter(col("token") === t1).select(col("vec_id"))),
      dfExact)
      .collect()
    if (seed.length < k) return unpruned // no k-th score to bound with
    val theta = seed.last.getLong(1)
    val nonEssential = nonEssentialTerms(ub, theta)
    if (nonEssential.isEmpty) return unpruned
    val essential = qts.filterNot(nonEssential.contains)
    if (essential == Seq(t1)) {
      // the common case (one rare term decides the query): the seed IS
      // the exact answer — candidates = t1's own docs = the set the seed
      // already scored in full — so re-running the identical job would
      // double serving cost for nothing
      import scala.jdk.CollectionConverters._
      return spark.createDataFrame(seed.toList.asJava, seed.head.schema)
        .orderBy(col("score_ppm").desc, col("doc_id"))
    }
    val candidates = live.filter(col("token").isin(essential: _*))
      .select(col("vec_id")).distinct()
    scorePostings(live, corpus, terms, k, Some(candidates), dfExact)
  }

  /** [[bm25Pruned]]'s per-term contribution upper bounds from the
    * `tstats` artifact, or None when pruning must be disabled: artifact
    * missing for the current payload (legacy index, kind-agnostic
    * compact), or artifact incomplete (a crash between an append's codes
    * and artifact writes — detected by comparing the artifact's batch
    * set against the payload's partition dirs: pruning, unlike scoring,
    * TRUSTS the artifact, and a missing batch would read as UB = 0 for
    * that batch's new tokens). Test entry point — the serving path
    * shares the resolution snapshot via [[termUpperBoundsResolved]]. */
  private[graft] def termUpperBounds(spark: SparkSession, path: String,
      qts: Seq[String]): Option[Map[String, Long]] = {
    val r = IndexManifest.resolve(spark, path)
    r.current.flatMap { cur =>
      val live = liveResolved(spark, path, r, cur, bounded = false)
      termUpperBoundsResolved(spark, path, r, cur,
        statsResolved(spark, path, r, cur, live), qts).map(_.ub)
    }
  }

  /** What the pruning path needs from the artifact in one read: the
    * per-term bounds, the pending-tombstone count (0 ⇒ the artifact's df
    * sums are exact), and the artifact frame itself for reuse. */
  private case class TermBounds(ub: Map[String, Long], pending: Long,
      tstats: DataFrame)

  /** The `tstats` artifact of the CURRENT payload when it can be
    * TRUSTED for pruning: present for this exact payload AND covering
    * every payload batch (the completeness guard over the documented
    * crash-between-writes window — scoring never needs this, pruning
    * does). */
  private def trustedTstats(spark: SparkSession, path: String,
      r: IndexManifest.Resolved, cur: Long): Option[DataFrame] = {
    val pvOpt = r.payloadAt(cur)
      .filter(pv => r.disk.getOrElse("tstats", Nil).contains(pv))
    if (pvOpt.isEmpty) return None
    val pv = pvOpt.get
    val codesP = new org.apache.hadoop.fs.Path(s"$path/codes_v$pv")
    val fs = codesP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val payloadBatches = fs.listStatus(codesP).map(_.getPath.getName)
      .collect { case n if n.startsWith("__batch=") =>
        n.stripPrefix("__batch=").toLong }.toSet
    val tstats = spark.read.schema(TstatsSchema)
      .parquet(s"$path/tstats_v$pv")
    val artifactBatches = tstats.select(col("__batch")).distinct()
      .collect().map(_.getLong(0)).toSet
    if (payloadBatches != artifactBatches) None else Some(tstats)
  }

  private def termUpperBoundsResolved(spark: SparkSession, path: String,
      r: IndexManifest.Resolved, cur: Long, corpus: DataFrame,
      qts: Seq[String]): Option[TermBounds] = {
    val tsOpt = trustedTstats(spark, path, r, cur)
    if (tsOpt.isEmpty) return None
    val tstats = tsOpt.get
    val cRow = corpus.head()
    if (cRow.isNullAt(0) || cRow.isNullAt(1)) return None
    val (n, s) = (cRow.getLong(0), cRow.getLong(1))
    if (n <= 0L || s <= 0L) return None
    // each pending delete removes at most one doc from any term's df, so
    // Σ artifact df − |pending| is a true df lower bound — and idf,
    // decreasing in df, stays an upper bound; max_tf / min_dl only
    // shrink / grow under deletes, so they stay valid bound inputs
    val pending = segTombstones(spark, path, r, cur).count()
    // the bound is computed in DOUBLE, not the scorer's Long arithmetic:
    // the Long form (44·tf·s·10⁶ / …) overflows once Σdl reaches ~1e12
    // (the 10B-doc corpus this module targets) and a wrapped-negative
    // bound would silently prune REAL top-k docs. An upper bound only
    // has to stay ≥ the true value, so double + a 1e-9 relative
    // inflation + ceil dominates double rounding error, and the scorer's
    // floor-division score is ≤ the true rational it approximates —
    // UB ≥ score holds at every corpus size; non-finite/overflow and
    // negative results clamp to the safe side (MaxValue / 0).
    def ubPpm(df: Long, tf: Long, dl: Long): Long = {
      val idf = (2.0 * n - 2.0 * df + 1.0) / (2.0 * df + 1.0)
      val tfSat = 44.0 * tf * s /
        (20.0 * tf * s + 6.0 * s + 18.0 * dl * n)
      val ub = idf * tfSat * 1000000.0 * (1.0 + 1e-9) + 1.0
      if (!java.lang.Double.isFinite(ub) || ub >= Long.MaxValue.toDouble)
        Long.MaxValue
      else math.max(0L, math.ceil(ub).toLong)
    }
    Some(TermBounds(
      tstats.filter(col("token").isin(qts: _*))
        .groupBy(col("token"))
        .agg(sum(col("df")).as("df"), max(col("max_tf")).as("mtf"),
          min(col("min_dl")).as("mdl"))
        .collect()
        .map(r0 => r0.getString(0) ->
          ubPpm(math.max(1L, r0.getLong(1) - pending),
            r0.getLong(2), math.max(1L, r0.getLong(3))))
        .toMap,
      pending, tstats))
  }

  /** The MaxScore partition, pure: the longest ascending-UB prefix whose
    * cumulative bound stays STRICTLY under `theta` (strictness is what
    * makes exclusion tie-safe: an excluded doc scores ≤ cum < θ while
    * ≥ k docs score ≥ θ, so it is outside the top-k under any
    * tie-breaking). Never the full term set: θ is an actual document
    * score, so Σ all UB ≥ θ stops the prefix before the last term. */
  private[graft] def nonEssentialTerms(ub: Seq[(String, Long)],
      theta: Long): List[String] =
    ub.sortBy { case (t, u) => (u, t) }
      .foldLeft((0L, false, List.empty[String])) {
        case ((cum, stopped, acc), (t, u)) =>
          if (!stopped && cum + u < theta) (cum + u, false, t :: acc)
          else (cum, true, acc) // prefix is contiguous: first miss ends it
      }._3

  /** Weighted sparse retrieval — the learned-sparse (SPLADE/uniCOIL)
    * serving shape: the query is a (token, weight) vector, the document
    * representation is its postings' term frequencies, and the score is
    * the sparse dot product Σ weight·tf — integer-exact, no corpus
    * statistics involved (the model, not the corpus, decides term
    * importance; this operator serves whatever impacts live in the
    * index — tf today, learned impacts under the same plan). Per-term
    * work is that term's posting list; weights broadcast. Returns
    * (doc_id, score_ppm, n_terms) ranked (score desc, doc_id), top k. */
  def sparseDot(spark: SparkSession, path: String, query: Seq[(String, Long)],
      k: Int): DataFrame = {
    require(query.nonEmpty && query.forall(_._1 != DlToken) &&
      query.map(_._1).distinct.size == query.size)
    sparseScore(load(spark, path), query, k)
  }

  /** [[sparseDot]] under MaxScore pruning — EXACTLY the same result (the
    * oracle hash proves it), with per-term upper bounds that are even
    * simpler than BM25's: UB(t) = weight(t) · max tf(t) from the tstats
    * artifact, valid under pending deletes with NO correction (deletes
    * only shrink a term's max tf). The same seed/partition logic as
    * [[bm25Pruned]]: θ from fully scoring the top-bound term's docs, the
    * ascending-UB prefix strictly under θ is non-essential, only docs
    * with an essential term are scored. Falls back to the unpruned plan
    * whenever the bounds cannot be trusted. */
  def sparseDotPruned(spark: SparkSession, path: String,
      query: Seq[(String, Long)], k: Int): DataFrame = {
    require(k >= 1 && query.nonEmpty && query.forall(_._1 != DlToken) &&
      query.map(_._1).distinct.size == query.size)
    require(query.forall(_._2 >= 0L),
      "negative weights break the upper-bound argument")
    val r = IndexManifest.resolve(spark, path)
    val live = r.current match {
      case Some(cur) => liveResolved(spark, path, r, cur, bounded = false)
      case None => load(spark, path)
    }
    def unpruned = sparseScore(live, query, k)
    if (query.size < 2 || r.current.isEmpty) return unpruned
    val tsOpt = trustedTstats(spark, path, r, r.current.get)
    if (tsOpt.isEmpty) return unpruned
    val weights = query.toMap
    val maxTf = tsOpt.get
      .filter(col("token").isin(query.map(_._1): _*))
      .groupBy(col("token")).agg(max(col("max_tf")).as("mtf"))
      .collect().map(r0 => r0.getString(0) -> r0.getLong(1)).toMap
    val ub = query.map { case (t, w) =>
      t -> (w * maxTf.getOrElse(t, 0L))
    }
    if (ub.forall(_._2 == 0L)) return unpruned
    val t1 = ub.maxBy { case (t, u) => (u, t) }._1
    val seed = sparseScore(live, query, k,
      Some(live.filter(col("token") === t1).select(col("vec_id"))))
      .collect()
    if (seed.length < k) return unpruned
    val theta = seed.last.getLong(1)
    val nonEssential = nonEssentialTerms(ub, theta)
    if (nonEssential.isEmpty) return unpruned
    val essential = query.map(_._1).filterNot(nonEssential.contains)
    if (essential == Seq(t1)) {
      import scala.jdk.CollectionConverters._
      return spark.createDataFrame(seed.toList.asJava, seed.head.schema)
        .orderBy(col("score_ppm").desc, col("doc_id"))
    }
    val candidates = live.filter(col("token").isin(essential: _*))
      .select(col("vec_id")).distinct()
    sparseScore(live, query, k, Some(candidates))
  }

  private def sparseScore(live: DataFrame, query: Seq[(String, Long)],
      k: Int, candidates: Option[DataFrame] = None): DataFrame = {
    val spark = live.sparkSession
    import spark.implicits._
    val q = broadcast(query.toDF("token", "__w"))
    val tfAll = live.filter(col("token").isin(query.map(_._1): _*))
    val tf = candidates.fold(tfAll)(c =>
      tfAll.join(broadcast(c), Seq("vec_id"), "left_semi"))
    tf.join(q, Seq("token"))
      .groupBy(col("vec_id").as("doc_id"))
      .agg(sum(col("__w") * col("tf")).as("score_ppm"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(k)
  }

  /** The same scorer straight from a documents frame, no persistence —
    * what a pipeline without a standing index pays per query batch (the
    * Stress `searchindex` comparison), and the proof body shared with
    * the index path. */
  def bm25FromDocs(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(!terms.contains(DlToken))
    val postings = postingsOf(docs, idCol, textCol)
    val corpus = postings.filter(col("token") === DlToken)
      .agg(count(lit(1)).as("n_docs"), sum(col("tf")).as("sum_dl"))
    scorePostings(postings, corpus, terms, k)
  }

  /** BATCHED BM25 serving — the production shape: a whole query set
    * (query_id, token rows) scored against the live index in ONE pass.
    * Per-term work is that term's posting list regardless of how many
    * queries share it (the query table joins the postings once,
    * broadcast); corpus stats come from the stats artifact, so batch
    * cost is the requested terms' postings plus O(#batches) rows.
    * Returns (query_id, doc_id, score_ppm, n_terms, rank ≤ k), rank by
    * (score desc, doc_id) within each query. */
  def bm25Batch(spark: SparkSession, path: String, queries: DataFrame,
      queryIdCol: String, termCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val r = IndexManifest.resolve(spark, path)
    val live = r.current match {
      case Some(cur) => liveResolved(spark, path, r, cur, bounded = false)
      case None => load(spark, path)
    }
    // the reserved token is filtered, not required-away: query tokens
    // arrive as DATA here, and a NUL row would otherwise join every
    // doc-length row as a bogus corpus-wide term
    val q = queries.select(col(queryIdCol).cast("long").as("query_id"),
        col(termCol).as("token"))
      .filter(col("token") =!= DlToken).distinct()
    val corpus = r.current match {
      case Some(cur) => statsResolved(spark, path, r, cur, live)
      case None =>
        live.filter(col("token") === DlToken)
          .agg(count(lit(1)).as("n_docs"), sum(col("tf")).as("sum_dl"))
    }
    // postings for any requested term, read once; df is per TOKEN (not
    // per query), so it aggregates before the query join fans out
    val tf = live.join(broadcast(q.select(col("token")).distinct()), "token")
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(q), Seq("token"))
      .join(broadcast(df), Seq("token"))
      .crossJoin(broadcast(corpus))
      .withColumn("idf_ppm",
        expr("(2*n_docs - 2*df + 1) * 1000000L div (2*df + 1)"))
      .withColumn("tf_ppm",
        expr("44*tf*sum_dl * 1000000L div (20*tf*sum_dl + 6*sum_dl + 18*dl*n_docs)"))
      .withColumn("contrib_ppm", expr("idf_ppm * tf_ppm div 1000000L"))
      .groupBy(col("query_id"), col("vec_id").as("doc_id"))
      .agg(sum(col("contrib_ppm")).as("score_ppm"),
        count(lit(1)).as("n_terms"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** `candidates`: optional (vec_id) gate applied AFTER document
    * frequencies — boolean retrieval restricts which docs score, never
    * what df means (df stays corpus-global, as BM25 defines it). */
  private def scorePostings(live: DataFrame, corpus: DataFrame,
      terms: Seq[String], k: Int,
      candidates: Option[DataFrame] = None,
      dfOverride: Option[DataFrame] = None): DataFrame = {
    val tfAll = live.filter(col("token").isin(terms: _*))
    // dfOverride: exact per-token document frequencies a caller already
    // has (the artifact path when no deletes pend) — skips the count
    // aggregate over every query term's full postings
    val df = dfOverride.getOrElse(
      tfAll.groupBy(col("token")).agg(count(lit(1)).as("df")))
    val tf = candidates.fold(tfAll)(c =>
      tfAll.join(broadcast(c), Seq("vec_id"), "left_semi"))
    tf.join(broadcast(df), Seq("token"))
      .crossJoin(broadcast(corpus))
      .withColumn("idf_ppm",
        expr("(2*n_docs - 2*df + 1) * 1000000L div (2*df + 1)"))
      .withColumn("tf_ppm",
        expr("44*tf*sum_dl * 1000000L div (20*tf*sum_dl + 6*sum_dl + 18*dl*n_docs)"))
      .withColumn("contrib_ppm", expr("idf_ppm * tf_ppm div 1000000L"))
      .groupBy(col("vec_id").as("doc_id"))
      .agg(sum(col("contrib_ppm")).as("score_ppm"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(k)
  }
}
