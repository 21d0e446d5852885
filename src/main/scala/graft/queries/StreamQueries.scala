package graft.queries

import graft.Q
import graft.multimodal.Media
import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming + multimodal entries. Nearly all are DuckDB-hash-gated
  * despite running the Structured Streaming engine or typed mapPartitions
  * pipelines: streaming queries are phrased so their final state equals a
  * batch aggregate (complete-mode rollups, batching-invariant per-item
  * verdicts), and the media stub's determinism makes the multimodal
  * pipeline — resize kernel, frame offsets, perceptual hashes — exactly
  * replayable in SQL. Only codec-dependent feature rollups stay
  * rows-only, with specs asserting their semantics.
  */
object StreamQueries {

  /** events.parquet's `ts` has shipped as both INT64 TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across driver data generations (mirrors
    * graft.Tables.events). readStream needs the schema up front, so probe
    * the physical type with a batch schema read (footer-only, no data
    * scan), then normalize `ts` to session-local TIMESTAMP either way. */
  private def rawEventSchema(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def eventStream(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physical = s.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    graft.Tables.normalizeEventTs(
      s.readStream.schema(rawEventSchema(physical))
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Shared oracle CTE: the dHash construction over `documents` — covering
    * dims (w=max(8,⌊√n⌋), h=⌈n/w⌉), the 9×8 nearest-neighbor resize kernel
    * (same arithmetic q_media_resize proves), horizontal-gradient sign
    * bits packed as two non-negative 32-bit halves. Ends with CTE `h`
    * (media_id, lo, hi); consumers add their own pair/cluster logic.
    *
    * ENCODING ASSUMPTION: the Scala path reads UTF-8 BYTES
    * (octet_length, bytes-as-pixels) while this mirror indexes
    * CHARACTERS (strlen, text[i], unicode()) — the two agree only while
    * the corpus is pure ASCII, which the driver's documents.parquet is.
    * A multi-byte corpus would need byte-oriented DuckDB expressions
    * (encode()/blob indexing) on this side. */
  private val phashCte: String =
    """m AS (
      |  SELECT doc_id AS media_id, text, strlen(text) AS n,
      |    greatest(8, CAST(floor(sqrt(strlen(text))) AS BIGINT)) AS w
      |  FROM documents),
      |m2 AS (SELECT media_id, text, n, w, (n + w - 1) // w AS h FROM m),
      |px AS (
      |  SELECT media_id,
      |    list_transform(range(72), p ->
      |      CASE WHEN (p // 9) * h // 8 * w + (p % 9) * w // 9 < n
      |           THEN unicode(text[CAST((p // 9) * h // 8 * w
      |                  + (p % 9) * w // 9 AS INTEGER) + 1])
      |           ELSE 0 END) AS pxs
      |  FROM m2),
      |h AS (
      |  SELECT media_id,
      |    list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(32), i ->
      |        CASE WHEN pxs[(i // 8) * 9 + (i % 8) + 1]
      |                  > pxs[(i // 8) * 9 + (i % 8) + 2]
      |             THEN (1::BIGINT << i) ELSE 0::BIGINT END)),
      |      (a, x) -> a + x) AS lo,
      |    list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(32), i ->
      |        CASE WHEN pxs[((i + 32) // 8) * 9 + ((i + 32) % 8) + 1]
      |                  > pxs[((i + 32) // 8) * 9 + ((i + 32) % 8) + 2]
      |             THEN (1::BIGINT << i) ELSE 0::BIGINT END)),
      |      (a, x) -> a + x) AS hi
      |  FROM px)""".stripMargin

  /** Shared oracle CTE: the Haitsma–Kalker audio fingerprint over the
    * `documents` audio modality (doc_id % 3 = 1) — 17 evenly-spaced
    * 32-byte windows, 5 six-byte sub-band energies each, bit(t,f) =
    * sign of the time×band energy double difference, packed as two
    * non-negative 32-bit halves. Mirrors [[graft.multimodal.Media
    * .audioFingerprint]] exactly (same ASCII-corpus assumption as
    * [[phashCte]]). Ends with CTE `afp` (media_id, lo, hi). */
  private val audioFpCte: String =
    """am AS (
      |  SELECT doc_id AS media_id, text, strlen(text) AS n
      |  FROM documents WHERE doc_id % 3 = 1 AND strlen(text) >= 32),
      |ap AS (SELECT media_id, text, n,
      |         greatest(1, (n - 32) // 16) AS hop FROM am),
      |ae AS (SELECT media_id,
      |         list_transform(range(17), t ->
      |           list_transform(range(5), f ->
      |             list_reduce(list_prepend(0::BIGINT,
      |               list_transform(range(6), k ->
      |                 unicode(text[CAST(least(t * hop, n - 32)
      |                   + f * 6 + k AS INTEGER) + 1])::BIGINT)),
      |               (a, x) -> a + x))) AS en
      |       FROM ap),
      |afp AS (
      |  SELECT media_id,
      |    list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(32), j ->
      |        CASE WHEN (en[j // 4 + 2][j % 4 + 1] - en[j // 4 + 2][j % 4 + 2])
      |                - (en[j // 4 + 1][j % 4 + 1] - en[j // 4 + 1][j % 4 + 2]) > 0
      |             THEN (1::BIGINT << j) ELSE 0::BIGINT END)),
      |      (a, x) -> a + x) AS lo,
      |    list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(32), j ->
      |        CASE WHEN (en[j // 4 + 10][j % 4 + 1] - en[j // 4 + 10][j % 4 + 2])
      |                - (en[j // 4 + 9][j % 4 + 1] - en[j // 4 + 9][j % 4 + 2]) > 0
      |             THEN (1::BIGINT << j) ELSE 0::BIGINT END)),
      |      (a, x) -> a + x) AS hi
      |  FROM ae)""".stripMargin

  /** State-store partition count is fixed at stream START from
    * spark.sql.shuffle.partitions; for these registry queries the state is
    * tiny (hundreds of windows/ids from one static file) so 32 partitions
    * is pure per-batch provider overhead — scope the stream to `n` and
    * restore. Default 8 (the ~100k-key dedup/session/join states); pass 2
    * for the few-hundred-key window rollups, where per-partition provider
    * setup dominates (measured 1.21 → 0.81 s on the hourly rollup; the
    * map-side partial aggregation stays input-parallel either way).
    * Production sizes this to state volume, not core count. */
  private def withStreamPartitions[T](s: org.apache.spark.sql.SparkSession,
      n: Int = 8)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Scope the RocksDB state-store provider to one streaming run. The
    * default HDFS-backed provider keeps every state row on the JVM heap —
    * fine for these registry inputs, memory-bound at 100 TB-scale state
    * (billions of dedup keys / open sessions / join buffers). RocksDB
    * keeps state off-heap with incremental snapshot checkpointing, so the
    * heavy stateful queries run it as their default; provider choice never
    * changes results (StreamingIngestSpec proves multi-batch equivalence),
    * which the unchanged oracles of the queries below re-verify each round. */
  private def withRocksDb[T](s: org.apache.spark.sql.SparkSession)(
      body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => s.conf.set(key, p)
      case None => s.conf.unset(key)
    }
  }

  val all: Seq[Q] = Seq(

    // ---- §7.5: hourly rollups through the real streaming engine ---------
    Q("q_stream_hourly_rollup",
      (s, dir) => {
        // FileStreamSource needs a directory: eventStream globs the sf dir
        // to the events file only.
        val stream = eventStream(s, dir)
        val name = s"rollup_${System.nanoTime()}"
        // state = (hour, type) pairs — a few hundred rows: 2 partitions
        withStreamPartitions(s, 2) {
          val q = StreamingIngest.hourlyRollups(stream)
            .writeStream.outputMode("complete")
            .format("memory").queryName(name).start()
          try q.processAllAvailable() finally q.stop()
        }
        // Complete-mode rollup of a static source ≡ the batch aggregate, so
        // a plain GROUP BY oracle proves the streaming engine's state
        // handling end-to-end (same pattern as q_stream_dedup). Hour
        // boundaries emitted as epoch seconds: portable across engines'
        // timestamp precisions (events.parquet is TIMESTAMP(NANOS)).
        s.table(name)
          .select(unix_timestamp(col("hour_start")).as("hour_ep"),
            col("event_type"), col("n"), col("sum_value"), col("max_value"))
          .orderBy(col("hour_ep"), col("event_type"))
      },
      Some("""SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_ep,
             |  event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             |  max(value) AS max_value
             |FROM events GROUP BY 1, 2 ORDER BY hour_ep, event_type""".stripMargin)),

    // ---- streaming exact dedup: two copies of the stream unioned, then
    //      dropDuplicates keyed by event_id. State is keyed by id only
    //      (no event-time key → no eviction → exactness; production
    //      bounds state with dropDuplicatesWithinWatermark). The oracle
    //      aggregates the ORIGINAL table — a hash match proves every
    //      duplicate was removed by the streaming engine. --------------
    Q("q_stream_dedup",
      (s, dir) => {
        def src = eventStream(s, dir)
        val deduped = src.unionByName(src)
          .withWatermark("ts", "2 hours")
          .dropDuplicates("event_id")
        val name = s"dedup_${System.nanoTime()}"
        withStreamPartitions(s) {
          val q = deduped
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,6)")).as("__sv"))
            .writeStream.outputMode("complete")
            .format("memory").queryName(name).start()
          try q.processAllAvailable() finally q.stop()
        }
        s.table(name)
          .select(col("event_type"), col("n"),
            col("__sv").cast("double").as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type
             |ORDER BY event_type NULLS FIRST""".stripMargin)),

    // ---- streaming dedup with BOUNDED state: the production variant ------
    // q_stream_dedup keys state by id alone (exact but unbounded);
    // dropDuplicatesWithinWatermark is the Spark-4 bounded-state form —
    // state entries are EVICTED once the watermark passes their event
    // time + delay, so state size tracks the dedup window, not history.
    // Both copies of every event arrive in the same micro-batch (well
    // inside the 2h window), so the output is exactly the distinct set
    // and the batch oracle hash-checks the engine end-to-end; rows are
    // sunk in append mode (dedup emits immediately) and aggregated as a
    // batch afterwards — the chained-stateful-op restriction at work.
    Q("q_stream_dedup_watermark",
      (s, dir) => {
        def src = eventStream(s, dir)
        val deduped = src.unionByName(src)
          .withWatermark("ts", "2 hours")
          .dropDuplicatesWithinWatermark("event_id")
        val name = s"dedupw_${System.nanoTime()}"
        withRocksDb(s) { withStreamPartitions(s) {
          val q = deduped
            .select(col("event_id"), col("event_type"), col("value"))
            .writeStream.outputMode("append")
            .format("memory").queryName(name).start()
          try q.processAllAvailable() finally q.stop()
        } }
        s.table(name)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("event_id")).as("n_ids"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  count(DISTINCT event_id) AS n_ids,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type
             |ORDER BY event_type NULLS FIRST""".stripMargin)),

    // ---- streaming append into a manifest table ---------------------------
    // The log-table ingest shape: each micro-batch appends its rows as a
    // keyed `__batch` partition of a TableManifest table (one atomic
    // watermarked marker per batch — foreachBatch is at-least-once, the
    // batchId key makes the landed table exactly-once). After the stream
    // drains, the table must equal the batch input row-for-row; every
    // intermediate batch remains a retained VERSION AS OF.
    Q("q_stream_table_append",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_stream_tbl").toString
        val stream = eventStream(s, dir)
        val q = stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              batchId: Long) =>
            val proj = batch.select(col("event_id"), col("user_id"),
              col("ts"), col("value"))
            // zero-row snapshot seeds the payload (CREATE TABLE); the
            // batches themselves land as appends
            if (TableManifest.versions(s, path).isEmpty)
              TableManifest.commitSnapshot(proj.limit(0), path)
            TableManifest.append(proj, path, batchId = Some(batchId))
            ()
        }.start()
        try q.processAllAvailable() finally q.stop()
        TableManifest.read(s, path)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, ts, value
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- the manifest table AS a stream (readStream.format("graft")) ------
    // The inverse of q_stream_table_append: the table is the SOURCE.
    // graft.sources.GraftStreamSource serves committed versions as
    // micro-batch offsets — first batch is the starting snapshot, each
    // later batch is the change feed between consecutive versions (the
    // O(changed batches) readChanges scan, never a table rescan) — so ANY
    // downstream becomes a table follower with no library imports. Two
    // appends land while the stream runs; the drained sink must equal
    // the full table exactly once (count ≡ distinct ≡ the batch oracle).
    Q("q_graft_stream_source",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_stream_src").toString
        val e = graft.Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        TableManifest.commitSnapshot(e.filter(col("event_id") % 3 === 0), path)
        val name = s"gsrcq_${System.nanoTime()}"
        val q = s.readStream.format("graft").load(path)
          .writeStream.format("memory").queryName(name).start()
        try {
          q.processAllAvailable() // the v0 starting snapshot
          TableManifest.append(e.filter(col("event_id") % 3 === 1), path)
          q.processAllAvailable() // follow: one CDF batch
          TableManifest.append(e.filter(col("event_id") % 3 === 2), path)
          q.processAllAvailable() // follow: the next CDF batch
        } finally q.stop()
        s.table(name)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("event_id")).as("n_ids"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  count(DISTINCT event_id) AS n_ids,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type
             |ORDER BY event_type NULLS FIRST""".stripMargin)),

    // ---- the change feed AS a stream (changeFeed mode) --------------------
    // readStream.format("graft") with option("changeFeed"): MoR deletes
    // PROPAGATE to the stream as _change_type='delete' rows instead of
    // being dropped — the CDC-consumer contract. A delete and an append
    // land mid-stream; the drained sink, aggregated per change type,
    // must replay in SQL: inserts = snapshot + appended rows, deletes =
    // exactly the rows the predicate masked at delete time.
    Q("q_graft_stream_cdc",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_stream_cdc").toString
        val e = graft.Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"))
        TableManifest.commitSnapshot(e.filter(col("event_id") % 2 === 0),
          path)
        val name = s"gcdc_${System.nanoTime()}"
        val q = s.readStream.format("graft")
          .option("changeFeed", "true").load(path)
          .writeStream.format("memory").queryName(name).start()
        try {
          q.processAllAvailable() // snapshot batch (all inserts)
          TableManifest.deleteWhere(s, path, "user_id % 10 = 3")
          TableManifest.append(e.filter(col("event_id") % 2 === 1), path)
          q.processAllAvailable() // delete feed + append feed
        } finally q.stop()
        s.table(name)
          .groupBy(col("_change_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("event_id")).as("n_ids"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"))
          .orderBy(col("_change_type"))
      },
      Some("""WITH snap AS (
             |  SELECT * FROM events WHERE event_id % 2 = 0),
             |feed AS (
             |  SELECT 'insert' AS ct, event_id, value FROM snap
             |  UNION ALL
             |  SELECT 'delete', event_id, value FROM snap
             |  WHERE user_id % 10 = 3
             |  UNION ALL
             |  SELECT 'insert', event_id, value FROM events
             |  WHERE event_id % 2 = 1)
             |SELECT ct AS _change_type, count(*) AS n,
             |  count(DISTINCT event_id) AS n_ids,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM feed GROUP BY ct ORDER BY ct""".stripMargin)),

    // ---- writeStream.format("graft"): the manifest table as a SINK --------
    // q_stream_table_append's foreachBatch shape as the one-liner public
    // surface: every micro-batch lands as a keyed __batch append (one
    // atomic watermarked marker per batch — at-least-once delivery made
    // exactly-once on disk by batchId replay-overwrite), and the landed
    // table must equal the batch input row-for-row. GraftStreamSourceSpec
    // drives the restart/replay and Complete-mode halves.
    Q("q_graft_stream_sink",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_stream_sink").toString
        val q = eventStream(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .writeStream.format("graft").option("path", path)
          .option("checkpointLocation", java.nio.file.Files
            .createTempDirectory("graft_stream_sink_ck").toString)
          .start()
        try q.processAllAvailable() finally q.stop()
        TableManifest.read(s, path)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, ts, value
             |FROM events ORDER BY event_id""".stripMargin)),

    // Update-mode sink + mergeKeys: each micro-batch emission UPSERTS
    // per key through the match-proportional MoR merge (equality
    // tombstone + replacement batch, one marker per batch — never a
    // snapshot rewrite), so a streaming aggregate maintains a served
    // table whose final state equals the plain batch aggregate. The
    // grouped per-user stats stream over events, hashed against DuckDB.
    Q("q_graft_stream_update",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_stream_upd").toString
        val q = eventStream(s, dir)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).as("sum_value"))
          .writeStream.format("graft").outputMode("update")
          .option("path", path).option("mergeKeys", "user_id")
          // in-band maintenance on: the sink folds its own MoR chain
          // every few batches (the 24/7-stream contract) — the served
          // content must be byte-identical with or without it
          .option("maintainEvery", "4")
          .option("maintainMaxDeletes", "4")
          .option("checkpointLocation", java.nio.file.Files
            .createTempDirectory("graft_stream_upd_ck").toString)
          .start()
        try q.processAllAvailable() finally q.stop()
        TableManifest.read(s, path)
          .select(col("user_id"), col("n"),
            col("sum_value").cast("double").as("sum_value"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM events GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // ---- streaming incremental view maintenance ----------------------------
    // The full loop: each micro-batch appends to the manifest table
    // (exactly-once under the batchId key) and IncrementalAgg
    // .maintainTable folds the batch's change feed into a STATE table on
    // its own manifest — state and its __asof progress marker move in
    // one atomic snapshot commit, and a replayed batch's feed is EMPTY
    // by the version-watermark arithmetic (the keyed append does not
    // advance the watermark), so maintenance is exactly-once with no
    // dedup bookkeeping. The final maintained state must equal the plain
    // batch aggregate over everything streamed.
    Q("q_stream_ivm",
      (s, dir) => {
        import graft.operators.{IncrementalAgg, TableManifest}
        val base = java.nio.file.Files
          .createTempDirectory("graft_stream_ivm").toString
        val (tPath, stPath) = (s"$base/table", s"$base/state")
        val stream = eventStream(s, dir)
        val q = stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              batchId: Long) =>
            val proj = batch.select(col("event_id"), col("event_type"),
              col("value"))
            if (TableManifest.versions(s, tPath).isEmpty)
              TableManifest.commitSnapshot(proj.limit(0), tPath)
            TableManifest.append(proj, tPath, batchId = Some(batchId))
            IncrementalAgg.maintainTable(s, tPath, stPath,
              Seq("event_type"), "value")
            ()
        }.start()
        try q.processAllAvailable() finally q.stop()
        TableManifest.read(s, stPath)
          .select(col("event_type"), col("n"),
            col("sum_v").cast("double").as("sum_v"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_v
             |FROM events GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ---- streaming CDF-driven index sync -----------------------------------
    // The index-maintenance capstone: each micro-batch lands in the
    // manifest table (exactly-once under the batchId key) and
    // SearchIndex.syncFromTable folds that batch's change feed into the
    // standing index — the index follows the stream without a rebuild,
    // and a replayed batch's feed is EMPTY by the same version
    // arithmetic that makes q_stream_ivm exactly-once. The final index
    // must rank exactly what a from-scratch build over everything
    // streamed would (the documents table, replayed by the oracle).
    Q("q_stream_index_sync",
      (s, dir) => {
        import graft.operators.{SearchIndex, TableManifest}
        val base = java.nio.file.Files
          .createTempDirectory("graft_stream_isync").toString
        val (tPath, iPath) = (s"$base/table", s"$base/index")
        val docs = graft.Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        // seed: an empty table + an index over it, BEFORE the stream
        // (the zero-row payload is footerless — reads need the schema)
        TableManifest.commitSnapshot(docs.limit(0), tPath)
        SearchIndex.build(
          TableManifest.read(s, tPath, Some(docs.schema)),
          "doc_id", "text", iPath)
        var lastV = TableManifest.versions(s, tPath).last
        val srcDir = java.nio.file.Files
          .createTempDirectory("graft_stream_isync_src").toString
        docs.coalesce(1).write.mode("append").parquet(srcDir)
        val schema = docs.schema
        withStreamPartitions(s) {
          val q = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(srcDir)
            .writeStream.foreachBatch {
              (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  batchId: Long) =>
                TableManifest.append(
                  batch.select(col("doc_id"), col("text")), tPath,
                  batchId = Some(batchId))
                val v = TableManifest.versions(s, tPath).last
                SearchIndex.syncFromTable(s, tPath, iPath, lastV, v,
                  "doc_id", "text")
                lastV = v
                ()
            }.start()
          try q.processAllAvailable() finally q.stop()
        }
        SearchIndex.bm25(s, iPath, SearchQueries.QueryTerms, 20)
          .orderBy(col("score_ppm").desc, col("doc_id"))
      },
      Some(s"""WITH ${SearchQueries.bm25CtesFor("documents")}
              |SELECT doc_id, score_ppm, n_terms
              |FROM bm ORDER BY score_ppm DESC, doc_id LIMIT 20""".stripMargin)),

    // ---- merge-on-read streaming upsert -----------------------------------
    // The SCALE shape of the keyed upsert sink. q_stream_foreach_upsert
    // is copy-on-write: each micro-batch commits a full merged snapshot
    // — bounded-size tables, instant reads, but O(table) write per
    // batch, which at 1 B keys is a per-batch table rewrite (the same
    // cost class as the BM25 O(corpus) stats scan was). This variant is
    // merge-on-read: each batch APPENDS its per-key latest rows
    // (O(batch) write, exactly-once under the batchId key) and the READ
    // resolves latest-per-key across batches; compactBatches folds the
    // accumulated log back into one snapshot whenever read amplification
    // warrants — and folding must change NOTHING, which is what the
    // second output stage hashes. CoW and MoR are both real strategies
    // (Delta/Hudi ship exactly this pair); the sink picks by write- vs
    // read-amplification, and both are now oracle-locked.
    Q("q_stream_upsert_mor",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_stream_mor").toString
        val stream = eventStream(s, dir)
        val q = stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              batchId: Long) =>
            val upd = batch
              .groupBy(col("user_id"))
              .agg(max_by(
                struct(col("event_id"), col("ts"), col("value")),
                struct(col("ts"), col("event_id"))).as("__r"))
              .select(col("user_id"), col("__r.event_id").as("last_event_id"),
                col("__r.ts").as("__ts"), col("__r.value").as("last_value"))
            if (TableManifest.versions(s, path).isEmpty)
              TableManifest.commitSnapshot(upd.limit(0), path)
            TableManifest.append(upd, path, batchId = Some(batchId))
            ()
        }.start()
        try q.processAllAvailable() finally q.stop()
        // merge-on-read resolve: latest per key across the batch log
        def resolve() = TableManifest.readLatest(s, path,
            keyCols = Seq("user_id"),
            orderCols = Seq("__ts", "last_event_id"))
          .select(col("user_id"), col("last_event_id"),
            col("__ts").as("last_ts"), col("last_value"))
        val mor = resolve().withColumn("stage", lit("mor"))
        graft.operators.TableManifest.compactBatches(s, path)
        val folded = resolve().withColumn("stage", lit("folded"))
        mor.unionByName(folded)
          .select(col("stage"), col("user_id"), col("last_event_id"),
            col("last_ts"), col("last_value"))
          .orderBy(col("stage"), col("user_id"))
      },
      Some("""WITH latest AS (
             |  SELECT user_id, event_id AS last_event_id, ts AS last_ts,
             |         value AS last_value
             |  FROM (SELECT user_id, event_id, ts, value,
             |          row_number() OVER (PARTITION BY user_id
             |            ORDER BY ts DESC, event_id DESC) AS rn
             |        FROM events) t
             |  WHERE rn = 1)
             |SELECT 'folded' AS stage, * FROM latest
             |UNION ALL
             |SELECT 'mor', * FROM latest
             |ORDER BY stage, user_id""".stripMargin)),

    // ---- foreachBatch streaming upsert: the production sink pattern ------
    // Streams land in warehouses via foreachBatch + MERGE: each
    // micro-batch collapses to its latest row per key (max_by — partials
    // only), upserts into the keyed snapshot table, and the merged
    // snapshot commits through operators.TableManifest — one atomic
    // marker per batch, so readers resolve either the previous complete
    // snapshot or the new one (the old hand-rolled delete-then-rename had
    // a window where the table did not exist), every batch's snapshot is
    // a retained VERSION AS OF until vacuum, and the commit protocol is
    // THE SAME one the six index kinds use. After the stream drains, the
    // snapshot must equal the batch latest-per-key over the whole input —
    // the oracle proves the merge loop loses nothing across batches.
    Q("q_stream_foreach_upsert",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = s"/tmp/graft_stream_upsert_${math.abs(dir.hashCode)}_" +
          s.sparkContext.applicationId
        val stream = eventStream(s, dir)
        val q = stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              batchId: Long) =>
            val upd = batch
              .groupBy(col("user_id"))
              .agg(max_by(
                struct(col("event_id"), col("ts"), col("value")),
                struct(col("ts"), col("event_id"))).as("__r"))
              .select(col("user_id"), col("__r.event_id").as("last_event_id"),
                col("__r.ts").as("__ts"), col("__r.value").as("last_value"))
            val merged =
              if (TableManifest.versions(s, path).nonEmpty) {
                val base = TableManifest.read(s, path)
                // re-resolve latest across base + update (ts tiebreak id)
                base.unionByName(upd)
                  .groupBy(col("user_id"))
                  .agg(max_by(
                    struct(col("last_event_id"), col("__ts"), col("last_value")),
                    struct(col("__ts"), col("last_event_id"))).as("__r"))
                  .select(col("user_id"),
                    col("__r.last_event_id").as("last_event_id"),
                    col("__r.__ts").as("__ts"),
                    col("__r.last_value").as("last_value"))
              } else upd
            TableManifest.commitSnapshot(merged, path)
            ()
        }.start()
        try q.processAllAvailable() finally q.stop()
        TableManifest.read(s, path)
          .select(col("user_id"), col("last_event_id"),
            col("__ts").as("last_ts"), col("last_value"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, event_id AS last_event_id, ts AS last_ts,
             |       value AS last_value
             |FROM (SELECT user_id, event_id, ts, value,
             |        row_number() OVER (PARTITION BY user_id
             |          ORDER BY ts DESC, event_id DESC) AS rn
             |      FROM events) t
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ---- sliding-window rollups through the streaming engine ------------
    // 1h windows every 15min: each event lands in exactly 4 overlapping
    // windows (epoch-aligned slide). The oracle regenerates the 4 window
    // starts per event arithmetically — floor-to-15min minus k·15min —
    // so the engine's overlapping-window assignment is hash-checked, not
    // just the aggregate. avg is decimal-exact sum / count (order-free).
    Q("q_stream_sliding",
      (s, dir) => {
        val stream = eventStream(s, dir)
        val name = s"slide_${System.nanoTime()}"
        withStreamPartitions(s) {
          val q = StreamingIngest.slidingRollups(stream)
            .writeStream.outputMode("complete")
            .format("memory").queryName(name).start()
          try q.processAllAvailable() finally q.stop()
        }
        s.table(name)
          .select(unix_timestamp(col("w_start")).as("w_start_ep"),
            unix_timestamp(col("w_end")).as("w_end_ep"),
            col("event_type"), col("n"), col("avg_value"))
          .orderBy(col("w_start_ep"), col("event_type"))
      },
      Some("""WITH w AS (
             |  SELECT epoch_us(ts) AS ts_us, event_type, value FROM events),
             |e AS (
             |  SELECT event_type, value,
             |    (ts_us // 900000000) * 900000000 - k * 900000000 AS s_us
             |  FROM w CROSS JOIN range(4) t(k))
             |SELECT s_us // 1000000 AS w_start_ep,
             |       (s_us + 3600000000) // 1000000 AS w_end_ep,
             |       event_type, count(*) AS n,
             |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value
             |FROM e GROUP BY 1, 2, 3
             |ORDER BY w_start_ep, event_type""".stripMargin)),

    // ---- stream-stream join: view → click attribution within 10 min -----
    // Both sides are real streams with watermarks and a time-range join
    // condition — the configuration where the engine keeps BOUNDED state
    // (each side retained only watermark + range; unbounded otherwise).
    // Append-mode output of a static source ≡ the batch range join, so
    // the oracle hash-checks the stream-stream matching end to end.
    Q("q_stream_stream_join",
      (s, dir) => {
        def src = eventStream(s, dir)
        val views = src.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ts").as("view_ts"))
          .withWatermark("view_ts", "2 hours")
        val clicks = src.filter(col("event_type") === "click")
          .select(col("user_id").as("__cu"), col("event_id").as("click_id"),
            col("ts").as("click_ts"))
          .withWatermark("click_ts", "2 hours")
        val name = s"ssj_${System.nanoTime()}"
        withRocksDb(s) { withStreamPartitions(s) {
          val q = views.join(clicks,
              col("user_id") === col("__cu") &&
                col("click_ts") >= col("view_ts") &&
                col("click_ts") <= col("view_ts") + expr("INTERVAL 10 MINUTES"))
            .select(col("user_id"), col("view_id"), col("click_id"),
              unix_micros(col("view_ts")).as("view_us"),
              unix_micros(col("click_ts")).as("click_us"))
            .writeStream.outputMode("append")
            .format("memory").queryName(name).start()
          try q.processAllAvailable() finally q.stop()
        } }
        s.table(name).orderBy(col("user_id"), col("view_id"), col("click_id"))
      },
      Some("""SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
             |       epoch_us(v.ts) AS view_us, epoch_us(c.ts) AS click_us
             |FROM events v JOIN events c
             |  ON v.user_id = c.user_id
             | AND v.event_type = 'view' AND c.event_type = 'click'
             | AND epoch_us(c.ts) >= epoch_us(v.ts)
             | AND epoch_us(c.ts) <= epoch_us(v.ts) + 600000000
             |ORDER BY v.user_id, view_id, click_id""".stripMargin)),

    // ---- stream-static enrichment join ----------------------------------
    // The streaming side joins a STATIC dimension (customer) inside the
    // micro-batch plan — Spark re-plans the static side per batch as a
    // broadcast hash join, the standard enrichment shape (fact stream
    // never shuffles to join). Complete-mode agg over the enriched stream
    // ≡ the batch join+aggregate, so the oracle hash-checks the whole
    // stream-static path.
    Q("q_stream_enrich",
      (s, dir) => {
        val stream = eventStream(s, dir)
        val dim = graft.Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"))
        val name = s"enrich_${System.nanoTime()}"
        withStreamPartitions(s) {
          val q = stream
            .join(dim, col("user_id") === col("c_custkey"))
            .groupBy(col("c_mktsegment"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,6)")).as("__sv"),
              max(col("user_id")).as("max_user"))
            .writeStream.outputMode("complete")
            .format("memory").queryName(name).start()
          try q.processAllAvailable() finally q.stop()
        }
        s.table(name)
          .select(col("c_mktsegment"), col("n"), col("max_user"),
            col("__sv").cast("double").as("sum_value"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  max(user_id) AS max_user,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---- streaming session windows, batch-equivalence oracle ------------
    // Complete-mode session_window over a static source ≡ batch gap-
    // sessionization, so the engine's session MERGE state machine (open,
    // extend, merge-adjacent) is hash-checked against the plain window
    // formulation DuckDB runs. Spark merges two sessions iff the next
    // event starts strictly before last_ts + gap, so the oracle breaks on
    // diff >= gap. Boundaries emitted as epoch MICROS (both engines
    // truncate the file's nanos identically); sum is decimal-exact so the
    // result is arrival-order independent.
    Q("q_stream_sessions",
      (s, dir) => {
        val stream = eventStream(s, dir)
        val name = s"sess_${System.nanoTime()}"
        withRocksDb(s) { withStreamPartitions(s) {
          val q = StreamingIngest.sessionRollups(stream)
            .writeStream.outputMode("complete")
            .format("memory").queryName(name).start()
          try q.processAllAvailable() finally q.stop()
        } }
        s.table(name)
          .select(col("user_id"),
            unix_micros(col("s_start")).as("s_start_us"),
            unix_micros(col("s_end")).as("s_end_us"),
            col("n"), col("sum_value"))
          .orderBy(col("user_id"), col("s_start_us"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
             |g AS (
             |  SELECT user_id, ts_us, value,
             |    CASE WHEN lag(ts_us) OVER w IS NULL
             |           OR ts_us - lag(ts_us) OVER w >= 1800000000
             |         THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
             |s AS (
             |  SELECT user_id, ts_us, value,
             |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
             |  FROM g)
             |SELECT user_id, min(ts_us) AS s_start_us,
             |       max(ts_us) + 1800000000 AS s_end_us,
             |       count(*) AS n,
             |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM s GROUP BY user_id, sess
             |ORDER BY user_id, s_start_us""".stripMargin)),

    // ---- custom-state streaming: flatMapGroupsWithState transitions -----
    // statusTransitions keeps ONE LastSeen record per user in the state
    // store and emits a row whenever a key's event_type changes between
    // consecutive events. A static source arrives as a single micro-batch
    // (and the group iterator is ts-sorted inside the function), so the
    // append-mode output ≡ the batch lag() formulation — the oracle
    // hash-checks the custom state machine end to end. at_epoch is
    // getTime/1000 = floor-to-seconds, ≡ DuckDB epoch_us // 1000000.
    Q("q_stream_transitions",
      (s, dir) => {
        import s.implicits._
        val stream = eventStream(s, dir)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[StreamingIngest.Event]
        val name = s"trans_${System.nanoTime()}"
        withStreamPartitions(s) {
          val q = StreamingIngest.statusTransitions(stream)
            .writeStream.outputMode("append")
            .format("memory").queryName(name).start()
          try q.processAllAvailable() finally q.stop()
        }
        s.table(name)
          .orderBy(col("user_id"), col("at_epoch"), col("from_type"),
            col("to_type"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
             |  FROM events),
             |t AS (
             |  SELECT user_id,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts_us, event_id) AS from_type,
             |    event_type AS to_type,
             |    CAST(ts_us // 1000000 AS BIGINT) AS at_epoch
             |  FROM e)
             |SELECT user_id, from_type, to_type, at_epoch
             |FROM t WHERE from_type IS NOT NULL AND from_type <> to_type
             |ORDER BY user_id, at_epoch, from_type, to_type""".stripMargin)),

    // ---- Spark 4 transformWithState: per-key running totals --------------
    // The StatefulProcessor/ValueState API (RocksDB-backed) driven end to
    // end: per-user running count + integer-cent sum, Update-mode
    // emissions. The memory sink holds one row per (key × batch); totals
    // are monotone, so max() per key is the final state however the
    // source got micro-batched — and equals the batch GROUP BY, which is
    // the oracle.
    Q("q_stream_running_totals",
      (s, dir) => {
        import s.implicits._
        val stream = eventStream(s, dir)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[StreamingIngest.Event]
        val name = s"totals_${System.nanoTime()}"
        withRocksDb(s) { withStreamPartitions(s) {
          val q = StreamingIngest.runningTotals(stream)
            .writeStream.outputMode("update")
            .format("memory").queryName(name).start()
          try q.processAllAvailable() finally q.stop()
        } }
        s.table(name)
          .groupBy(col("user_id"))
          .agg(max(col("n_events")).as("n_events"),
            max(col("sum_cents")).as("sum_cents"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_cents
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- multimodal: binary column → partition-local feature extraction -
    // The decode STUB is deterministic (byte-nibble histogram over the
    // UTF-8 payload), so even this "decoded features" rollup is
    // oracle-checkable: DuckDB recomputes the histogram bin with a
    // per-char fold. A real codec swap makes the features opaque again —
    // but the hash match here proves the mapPartitions batch path emits
    // exactly the per-row features the decode contract promises.
    Q("q_media_features",
      (s, dir) => {
        import s.implicits._
        val docs = graft.Tables.documents(s, dir)
        val media = Media.synthesize(docs, "doc_id", "text").as[Media.MediaRow]
        Media.extractFeatures(media, framesPerItem = 4)
          .groupBy(col("kind"))
          .agg(
            count(lit(1)).as("n_items"),
            sum(col("n_bytes")).as("total_bytes"),
            sum(col("frames_sampled")).as("total_frames"),
            sum(element_at(col("histogram"), 8)).as("hist_bin7_total"))
          .orderBy(col("kind"))
      },
      Some("""SELECT
             |  CASE WHEN doc_id % 3 = 0 THEN 'image'
             |       WHEN doc_id % 3 = 1 THEN 'audio'
             |       ELSE 'video' END AS kind,
             |  count(*) AS n_items,
             |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
             |  CAST(sum(CASE WHEN strlen(text) < 16 THEN 0 ELSE
             |    len(list_distinct(list_transform(range(4),
             |      i -> least(i * greatest(1, (strlen(text) - 16) // 3),
             |                 strlen(text) - 16))))
             |  END) AS BIGINT) AS total_frames,
             |  CAST(sum(len(list_filter(range(strlen(text)),
             |    i -> unicode(text[i+1]) // 16 = 7))) AS BIGINT)
             |    AS hist_bin7_total
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- multimodal metadata, oracle-checked: the deterministic parts of
    //      the media pipeline (byte sizes from the UTF-8 payload, frame-
    //      sample counts from the offset formula) hash-match DuckDB;
    //      codec-dependent outputs stay in the rows-only query above -----
    Q("q_media_meta",
      (s, dir) => {
        import s.implicits._
        val media = Media.synthesize(
          graft.Tables.documents(s, dir), "doc_id", "text").as[Media.MediaRow]
        Media.extractFeatures(media, framesPerItem = 4)
          .select(col("media_id"), col("kind"), col("n_bytes"),
            col("frames_sampled").cast("long").as("frames_sampled"))
          .orderBy(col("media_id"))
      },
      Some("""SELECT doc_id AS media_id,
             |  CASE WHEN doc_id % 3 = 0 THEN 'image'
             |       WHEN doc_id % 3 = 1 THEN 'audio'
             |       ELSE 'video' END AS kind,
             |  strlen(text) AS n_bytes,
             |  CASE WHEN strlen(text) < 16 THEN 0 ELSE
             |    len(list_distinct(list_transform(range(4),
             |      i -> least(i * greatest(1, (strlen(text) - 16) // 3),
             |                 strlen(text) - 16))))
             |  END AS frames_sampled
             |FROM documents ORDER BY media_id""".stripMargin)),

    // ---- multimodal frame table: per-frame rows with portable hashes ----
    // The frame-sampling plumbing exploded to one row per sampled frame —
    // the shape a video/audio pipeline feeds to per-frame embedding or
    // dedup. The 16-byte "frame grab" stands in for a decoder; offsets
    // and frame BYTES are deterministic (UTF-8 payload), so the whole
    // table — offsets, indices, and a portable hash of each frame's
    // bytes — is oracle-checked, proving the typed mapPartitions path
    // emits exactly the rows the offset formula promises. Scale: flatMap,
    // no shuffle, 4 fixed-width rows per item.
    Q("q_media_frames",
      (s, dir) => {
        import s.implicits._
        val media = Media.synthesize(
          graft.Tables.documents(s, dir), "doc_id", "text").as[Media.MediaRow]
        Media.frameRows(media, framesPerItem = 4)
          .select(col("media_id"),
            col("frame_idx").cast("long").as("frame_idx"),
            col("byte_offset"),
            graft.functions.Text.polyHash(decode(col("frame"), "UTF-8"))
              .as("frame_hash"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some(s"""WITH m AS (
              |  SELECT doc_id AS media_id, text, strlen(text) AS n
              |  FROM documents WHERE strlen(text) >= 16),
              |p AS (SELECT media_id, text, n,
              |        greatest(1, (n - 16) // 3) AS step FROM m),
              |f AS (SELECT DISTINCT media_id, text,
              |        least(u.i * step, n - 16) AS off
              |      FROM p CROSS JOIN LATERAL
              |        (SELECT unnest(range(4)) AS i) u),
              |r AS (SELECT media_id, off,
              |        row_number() OVER (PARTITION BY media_id
              |                           ORDER BY off) - 1 AS frame_idx,
              |        substring(text, CAST(off + 1 AS INTEGER), 16) AS frame_s
              |      FROM f)
              |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
              |       off AS byte_offset,
              |       ${graft.functions.Text.polyHashSql("frame_s")} AS frame_hash
              |FROM r ORDER BY media_id, frame_idx""".stripMargin)),

    // ---- multimodal scene-cut detection over the frame table -------------
    // The video-segmentation step: a CUT is a consecutive-frame pair
    // whose content hashes differ (the stub's 16-byte grabs stand in for
    // perceptual frame hashes; a real decoder changes the hash source,
    // not the shape). Per-media window ordered by frame_idx — frames per
    // item are BOUNDED (sampling rate), so the window is constant-width
    // and parallel across items, never a corpus-wide sort. Cut counts
    // and the first cut position are hash-checked via the same portable
    // frame-hash construction q_media_frames proves.
    Q("q_media_scenes",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val media = Media.synthesize(
          graft.Tables.documents(s, dir), "doc_id", "text").as[Media.MediaRow]
        val frames = Media.frameRows(media, framesPerItem = 4)
          .select(col("media_id"),
            col("frame_idx").cast("long").as("frame_idx"),
            graft.functions.Text.polyHash(decode(col("frame"), "UTF-8"))
              .as("frame_hash"))
        val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
        val isCut = col("__prev").isNotNull && col("__prev") =!= col("frame_hash")
        frames.withColumn("__prev", lag(col("frame_hash"), 1).over(w))
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_frames"),
            sum(when(isCut, 1L).otherwise(0L)).as("n_cuts"),
            min(when(isCut, col("frame_idx"))).as("first_cut_idx"))
          .orderBy(col("media_id"))
      },
      Some(s"""WITH m AS (
              |  SELECT doc_id AS media_id, text, strlen(text) AS n
              |  FROM documents WHERE strlen(text) >= 16),
              |p AS (SELECT media_id, text, n,
              |        greatest(1, (n - 16) // 3) AS step FROM m),
              |f AS (SELECT DISTINCT media_id, text,
              |        least(u.i * step, n - 16) AS off
              |      FROM p CROSS JOIN LATERAL
              |        (SELECT unnest(range(4)) AS i) u),
              |r AS (SELECT media_id, off,
              |        row_number() OVER (PARTITION BY media_id
              |                           ORDER BY off) - 1 AS frame_idx,
              |        substring(text, CAST(off + 1 AS INTEGER), 16) AS frame_s
              |      FROM f),
              |h AS (SELECT media_id, frame_idx,
              |        ${graft.functions.Text.polyHashSql("frame_s")} AS fh
              |      FROM r),
              |c AS (SELECT media_id, frame_idx, fh,
              |        lag(fh) OVER (PARTITION BY media_id
              |                      ORDER BY frame_idx) AS prev
              |      FROM h)
              |SELECT media_id, count(*) AS n_frames,
              |  CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> fh
              |                THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
              |  min(CASE WHEN prev IS NOT NULL AND prev <> fh
              |           THEN frame_idx END) AS first_cut_idx
              |FROM c GROUP BY media_id ORDER BY media_id""".stripMargin)),

    // ---- multimodal resize: 8×8 nearest-neighbor thumbnails -------------
    // The thumbnailing step, oracle-checked end to end: the DuckDB mirror
    // replays the SAME nearest-neighbor index arithmetic (src_y = y·h÷8,
    // src_x = x·w÷8 over the row-major bytes-as-pixels stub, 0 past the
    // payload end) and folds the identical checksum, so the kernel —
    // not just row counts — hash-matches. A real codec swap changes the
    // pixel source only; kernel, schema, and plan shape stay. Scale:
    // partition-local map, payloads never shuffle, output is 64 bytes +
    // two longs per item.
    Q("q_media_resize",
      (s, dir) => {
        import s.implicits._
        val media = Media.synthesize(
          graft.Tables.documents(s, dir), "doc_id", "text").as[Media.MediaRow]
        Media.resize(media, tw = 8, th = 8)
          .select(col("media_id"), col("kind"),
            col("out_w").cast("long").as("out_w"),
            col("out_h").cast("long").as("out_h"),
            col("px_sum"), col("px_checksum"))
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (
             |  SELECT doc_id AS media_id,
             |    CASE WHEN doc_id % 3 = 0 THEN 'image'
             |         WHEN doc_id % 3 = 1 THEN 'audio'
             |         ELSE 'video' END AS kind,
             |    text, strlen(text) AS n,
             |    doc_id % 640 + 16 AS w, doc_id % 480 + 16 AS h
             |  FROM documents),
             |px AS (
             |  SELECT media_id, kind,
             |    list_transform(range(64), p ->
             |      CASE WHEN (p // 8) * h // 8 * w + (p % 8) * w // 8 < n
             |           THEN unicode(text[CAST((p // 8) * h // 8 * w
             |                  + (p % 8) * w // 8 AS INTEGER) + 1])
             |           ELSE 0 END) AS pxs
             |  FROM m)
             |SELECT media_id, kind,
             |  CAST(8 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
             |  CAST(list_reduce(list_prepend(0::BIGINT, pxs),
             |    (a, x) -> a + x) AS BIGINT) AS px_sum,
             |  CAST(list_reduce(list_prepend(0::BIGINT, pxs),
             |    (a, x) -> (a * 31 + x) % 1000000007) AS BIGINT)
             |    AS px_checksum
             |FROM px ORDER BY media_id""".stripMargin)),

    // ---- multimodal near-dedup: perceptual hash + banded Hamming join ---
    // Image dedup the way production pipelines run it: a 64-bit dHash
    // (9×8 nearest-neighbor thumb → horizontal-gradient sign bits, the
    // standard perceptual hash) per item, then near-duplicate pairs via
    // the banded Hamming join with the band width DERIVED from count(*)
    // (MinHashLSH.bandBitsFor — no hand-picked config to go quadratic at
    // another scale); recall is exactly 1.0 at any derived width (exact
    // pigeonhole or sub-radius multi-index probes), so the banded output
    // stays bit-identical to the quadratic self-join the oracle runs,
    // with no banding mirror needed. Dims derive from the payload
    // (synthesizeCovering) so the raster covers the content; a real codec
    // swap changes the pixel source, not the hash or the join. Scale:
    // payloads never shuffle — 2 longs per item feed the band join.
    Q("q_media_phash_dedup",
      (s, dir) => {
        import s.implicits._
        val media = Media.synthesizeCovering(
          graft.Tables.documents(s, dir), "doc_id", "text").as[Media.MediaRow]
        graft.operators.MinHashLSH.hammingBandPairs(
            // materialize the 2-longs-per-item hash table once: the banded
            // self-join consumes it on both sides, and without the cut the
            // resize+hash pass runs twice
            Media.dHash(media).toDF().localCheckpoint(true),
            "media_id", "ph_hi", "ph_lo",
            maxHamming = 12)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH $phashCte
             |SELECT a.media_id AS id_a, b.media_id AS id_b,
             |  CAST(bit_count(xor(a.hi, b.hi))
             |     + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
             |FROM h a JOIN h b ON a.media_id < b.media_id
             |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 12
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- same dedup, multi-index probe config forced ---------------------
    // q_media_phash_dedup with bandBits pinned to 8 (bands=8 ≤ tau=12),
    // which forces the sub-radius probe path (s=1, 9-key enumeration per
    // band) that the derived width only selects at larger corpora — so
    // the multi-index machinery itself sits under the driver's hash gate
    // at every SF, not just under ScalaCheck. Recall-1.0 means the oracle
    // is the SAME quadratic self-join; matching hashes across the two
    // configs is the invariance proof, driver-checked.
    Q("q_media_phash_dedup_mih",
      (s, dir) => {
        import s.implicits._
        val media = Media.synthesizeCovering(
          graft.Tables.documents(s, dir), "doc_id", "text").as[Media.MediaRow]
        graft.operators.MinHashLSH.hammingBandPairs(
            Media.dHash(media).toDF().localCheckpoint(true),
            "media_id", "ph_hi", "ph_lo",
            maxHamming = 12, bandBits = 8)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH $phashCte
             |SELECT a.media_id AS id_a, b.media_id AS id_b,
             |  CAST(bit_count(xor(a.hi, b.hi))
             |     + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
             |FROM h a JOIN h b ON a.media_id < b.media_id
             |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 12
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- the SAME dedup as NAIVE SQL, banded by the OPTIMIZER ----------
    // The user writes the textbook quadratic Hamming self-join; the
    // injected Catalyst rule (plans.HammingJoinRule) rewrites it into
    // the banded multi-index equi-join at plan time — no operator call,
    // no banding in the query text. Exactness is the same pigeonhole
    // argument as hammingBandPairs (plus a first-band guard preserving
    // row multiplicity, since no Distinct is inserted), so the oracle is
    // the IDENTICAL naive SQL run by DuckDB. HammingJoinRuleSpec locks
    // the plan shape (no NestedLoop); this entry hash-gates the rewrite
    // end to end at both SFs.
    Q("q_hamming_rewrite",
      (s, dir) => {
        import s.implicits._
        if (!s.experimental.extraOptimizations
            .contains(graft.plans.HammingJoinRule))
          s.experimental.extraOptimizations =
            s.experimental.extraOptimizations :+ graft.plans.HammingJoinRule
        val media = Media.synthesizeCovering(
          graft.Tables.documents(s, dir), "doc_id", "text").as[Media.MediaRow]
        Media.dHash(media).toDF().localCheckpoint(true)
          .createOrReplaceTempView("hamming_rewrite_h")
        s.sql(
          """SELECT a.media_id AS id_a, b.media_id AS id_b,
            |  CAST(bit_count(a.ph_hi ^ b.ph_hi)
            |     + bit_count(a.ph_lo ^ b.ph_lo) AS BIGINT) AS hamming
            |FROM hamming_rewrite_h a JOIN hamming_rewrite_h b
            |  ON a.media_id < b.media_id
            | AND bit_count(a.ph_hi ^ b.ph_hi)
            |   + bit_count(a.ph_lo ^ b.ph_lo) <= 12
            |ORDER BY id_a, id_b""".stripMargin)
      },
      Some(s"""WITH $phashCte
             |SELECT a.media_id AS id_a, b.media_id AS id_b,
             |  CAST(bit_count(xor(a.hi, b.hi))
             |     + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
             |FROM h a JOIN h b ON a.media_id < b.media_id
             |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 12
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- video-clip dedup: per-frame dHash sequence + banded frame join --
    // The temporal sibling of q_media_phash_dedup: each clip explodes to
    // its sampled frames (q_media_frames' plumbing), every FRAME gets its
    // own 64-bit dHash (the 16-byte grab as an 8×2 covering raster — the
    // same w=max(8,⌊√n⌋) rule the item-level hash uses, constant here
    // since frames are fixed-width), frame hashes meet in the banded
    // Hamming join under a composite (clip, frame) id, and clip pairs
    // emerge by aggregating matching frame pairs with a min-matching-
    // frames threshold — a pair of clips is a dup when ≥2 distinct frame
    // alignments agree, which tolerates per-frame noise no single-hash
    // scheme can. Composite ids decompose exactly (frame_idx < 4 ≪ 16),
    // and ma<mb falls out of id_a<id_b once same-clip pairs are dropped.
    // The oracle replays frame offsets, the 9×8-from-8×2 resize kernel,
    // the gradient bits, and the pair aggregation as chained CTEs — the
    // whole temporal stack is hash-gated. Scale: frames are 4 fixed-width
    // rows per clip; the join shuffles 2 longs per frame; payloads never
    // move; the threshold aggregation groups pair rows, never clips².
    Q("q_media_clip_dedup",
      (s, dir) => {
        import s.implicits._
        val media = Media.synthesizeCovering(
          graft.Tables.documents(s, dir), "doc_id", "text").as[Media.MediaRow]
        val frames = Media.frameRows(media, framesPerItem = 4)
        val frameMedia = frames.select(
            (col("media_id") * 16 + col("frame_idx")).as("media_id"),
            lit("video").as("kind"),
            col("frame").as("bytes"),
            lit(8).as("width"), lit(2).as("height"),
            lit(16000).as("sample_rate"))
          .as[Media.MediaRow]
        val fh = Media.dHash(frameMedia).toDF().localCheckpoint(true)
        graft.operators.MinHashLSH.hammingBandPairs(
            fh, "media_id", "ph_hi", "ph_lo", maxHamming = 6)
          .select(
            expr("id_a div 16").as("ma"), pmod(col("id_a"), lit(16L)).as("fa"),
            expr("id_b div 16").as("mb"), pmod(col("id_b"), lit(16L)).as("fb"),
            col("hamming"))
          .filter(col("ma") =!= col("mb"))
          .groupBy(col("ma").as("id_a"), col("mb").as("id_b"))
          .agg(
            countDistinct(col("fa") * 16 + col("fb")).as("n_frame_matches"),
            min(col("hamming")).as("min_hamming"))
          .filter(col("n_frame_matches") >= 2)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH m AS (
             |  SELECT doc_id AS media_id, text, strlen(text) AS n
             |  FROM documents WHERE strlen(text) >= 16),
             |p AS (SELECT media_id, text, n,
             |        greatest(1, (n - 16) // 3) AS step FROM m),
             |f AS (SELECT DISTINCT media_id, text,
             |        least(u.i * step, n - 16) AS off
             |      FROM p CROSS JOIN LATERAL
             |        (SELECT unnest(range(4)) AS i) u),
             |r AS (SELECT media_id, off,
             |        row_number() OVER (PARTITION BY media_id
             |                           ORDER BY off) - 1 AS frame_idx,
             |        substring(text, CAST(off + 1 AS INTEGER), 16) AS frame_s
             |      FROM f),
             |px AS (
             |  SELECT media_id, frame_idx,
             |    list_transform(range(72), pp ->
             |      unicode(frame_s[CAST((pp // 9) * 2 // 8 * 8
             |                         + (pp % 9) * 8 // 9 AS INTEGER) + 1])) AS pxs
             |  FROM r),
             |h AS (
             |  SELECT media_id, frame_idx,
             |    list_reduce(list_prepend(0::BIGINT,
             |      list_transform(range(32), i ->
             |        CASE WHEN pxs[(i // 8) * 9 + (i % 8) + 1]
             |                  > pxs[(i // 8) * 9 + (i % 8) + 2]
             |             THEN (1::BIGINT << i) ELSE 0::BIGINT END)),
             |      (a, x) -> a + x) AS lo,
             |    list_reduce(list_prepend(0::BIGINT,
             |      list_transform(range(32), i ->
             |        CASE WHEN pxs[((i + 32) // 8) * 9 + ((i + 32) % 8) + 1]
             |                  > pxs[((i + 32) // 8) * 9 + ((i + 32) % 8) + 2]
             |             THEN (1::BIGINT << i) ELSE 0::BIGINT END)),
             |      (a, x) -> a + x) AS hi
             |  FROM px)
             |SELECT a.media_id AS id_a, b.media_id AS id_b,
             |  CAST(count(DISTINCT a.frame_idx * 16 + b.frame_idx) AS BIGINT)
             |    AS n_frame_matches,
             |  min(CAST(bit_count(xor(a.hi, b.hi))
             |         + bit_count(xor(a.lo, b.lo)) AS BIGINT)) AS min_hamming
             |FROM h a JOIN h b
             |  ON a.media_id < b.media_id
             | AND bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 6
             |GROUP BY a.media_id, b.media_id
             |HAVING count(DISTINCT a.frame_idx * 16 + b.frame_idx) >= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- audio fingerprint: Haitsma–Kalker robust hash, oracle-gated ----
    // The audio-modality fingerprint itself under the driver's hash gate:
    // per-item 64-bit robust hash from windowed sub-band energy double
    // differences (Haitsma & Kalker, ISMIR 2002 — the published scheme;
    // bytes stand in for PCM samples, the windowing/energy/difference
    // pipeline is the real algorithm). The double difference cancels
    // uniform gain, the audio analog of dHash's brightness invariance.
    // Scale: narrow typed flatMap, no shuffle, 2 longs per item out.
    Q("q_media_audio_fp",
      (s, dir) => {
        import s.implicits._
        val media = Media.synthesizeCovering(
          graft.Tables.documents(s, dir), "doc_id", "text").as[Media.MediaRow]
        Media.audioFingerprint(media.filter(col("kind") === "audio"))
          .toDF()
          .orderBy(col("media_id"))
      },
      Some(s"""WITH $audioFpCte
             |SELECT media_id, hi AS fp_hi, lo AS fp_lo
             |FROM afp ORDER BY media_id""".stripMargin)),

    // ---- audio near-dedup over the fingerprints -------------------------
    // The dedup step: banded Hamming join over the audio fingerprints —
    // identical machinery to the image path (band width derived from
    // count(*), sub-radius probes when wide), same recall-1.0 guarantee,
    // so the oracle is again the quadratic self-join with no banding
    // mirror. tau=8 is the MEASURED operating point (Stress audiofpq,
    // SCALE.md): against the corpus's own shingle-Jaccard truth,
    // precision is .95/.62/.18/.02 at tau 4/8/12/16 while recall stays
    // FLAT at .60 across all four - insert/delete edits SHIFT the
    // energy windows, so no radius recovers them (the audio analog of
    // the phash family's translation variance) and widening tau only
    // buys false positives. At sf0.01 the audio third contains no true
    // near-dup pairs (measured), so the correct result here is empty;
    // the sf0.1 sweep exercises the nonzero case. Completes the modality set: dHash (image), frame-sequence
    // clip dedup (video), Haitsma–Kalker (audio), all three feeding one
    // Hamming-join operator.
    Q("q_media_audio_dedup",
      (s, dir) => {
        import s.implicits._
        val media = Media.synthesizeCovering(
          graft.Tables.documents(s, dir), "doc_id", "text").as[Media.MediaRow]
        val fp = Media.audioFingerprint(media.filter(col("kind") === "audio"))
          .toDF().localCheckpoint(true)
        graft.operators.MinHashLSH.hammingBandPairs(
            fp, "media_id", "fp_hi", "fp_lo", maxHamming = 8)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH $audioFpCte
             |SELECT a.media_id AS id_a, b.media_id AS id_b,
             |  CAST(bit_count(xor(a.hi, b.hi))
             |     + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
             |FROM afp a JOIN afp b ON a.media_id < b.media_id
             |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 8
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- persisted dedup index: the standing hash table as an artifact --
    // The production form of ingest-time dedup (operators.HammingIndex):
    // the standing corpus's perceptual hashes persist ONCE as a 20 B/item
    // index (same storage contract as the vector indexes — shared
    // tombstone/compact machinery, batch-partitioned exactly-once
    // appends), and each drop probes it instead of re-hashing the corpus.
    // The oracle replays the full lifecycle: build → GDPR-delete some
    // standing ids → probe drop 1 → append its clean items → compact
    // (folds the deletes; must change nothing observable — it sits inside
    // the hash) → delete some of the just-appended survivors → probe
    // drop 2 against standing∪survivors. Two verdict stages, one hash.
    Q("q_dedup_index",
      (s, dir) => {
        import s.implicits._
        val path = java.nio.file.Files
          .createTempDirectory("graft_hidx").toString
        val docs = graft.Tables.documents(s, dir)
        def phOf(pred: org.apache.spark.sql.Column) = Media.dHash(
          Media.synthesizeCovering(docs.filter(pred), "doc_id", "text")
            .as[Media.MediaRow]).toDF()
        graft.operators.HammingIndex.build(
          phOf(col("doc_id") < 250), "media_id", "ph_hi", "ph_lo", path)
        // GDPR-style removal from the standing index (tombstones)
        graft.operators.VectorIndex.deleteIds(
          docs.filter(col("doc_id") < 250 && col("doc_id") % 11 === 0),
          "doc_id", path)
        val drop1 = phOf(col("doc_id") >= 250 && col("doc_id") < 400)
          .localCheckpoint(true)
        // checkpoint BEFORE mutating the index: verdicts are lazy plans
        val v1 = graft.operators.HammingIndex.verdicts(
            drop1, "media_id", "ph_hi", "ph_lo", path, maxHamming = 12)
          .localCheckpoint(true)
        val survIds = v1.filter(col("n_dup_matches") === 0)
          .select(col("doc_id").as("__sid"))
        graft.operators.HammingIndex.append(
          drop1.join(survIds, col("media_id") === col("__sid"))
            .select(col("media_id"), col("ph_hi"), col("ph_lo")),
          "media_id", "ph_hi", "ph_lo", path)
        graft.operators.VectorIndex.compact(s, path)
        graft.operators.VectorIndex.deleteIds(
          survIds.filter(col("__sid") % 13 === 0), "__sid", path)
        val v2 = graft.operators.HammingIndex.verdicts(
          phOf(col("doc_id") >= 400), "media_id", "ph_hi", "ph_lo", path,
          maxHamming = 12)
        v1.withColumn("stage", lit("drop1"))
          .unionByName(v2.withColumn("stage", lit("drop2")))
          .orderBy(col("stage"), col("doc_id"))
      },
      Some(s"""WITH $phashCte,
             |stand AS (SELECT * FROM h
             |          WHERE media_id < 250 AND media_id % 11 <> 0),
             |d1 AS (SELECT * FROM h WHERE media_id >= 250 AND media_id < 400),
             |v1 AS (SELECT p.media_id AS doc_id,
             |         CAST(count(r.media_id) AS BIGINT) AS n_dup_matches
             |       FROM d1 p LEFT JOIN stand r
             |         ON bit_count(xor(p.hi, r.hi))
             |          + bit_count(xor(p.lo, r.lo)) <= 12
             |       GROUP BY p.media_id),
             |surv AS (SELECT h.* FROM h JOIN v1 ON h.media_id = v1.doc_id
             |         WHERE v1.n_dup_matches = 0 AND h.media_id % 13 <> 0),
             |live2 AS (SELECT * FROM stand UNION ALL SELECT * FROM surv),
             |d2 AS (SELECT * FROM h WHERE media_id >= 400),
             |v2 AS (SELECT p.media_id AS doc_id,
             |         CAST(count(r.media_id) AS BIGINT) AS n_dup_matches
             |       FROM d2 p LEFT JOIN live2 r
             |         ON bit_count(xor(p.hi, r.hi))
             |          + bit_count(xor(p.lo, r.lo)) <= 12
             |       GROUP BY p.media_id)
             |SELECT 'drop1' AS stage, * FROM v1
             |UNION ALL
             |SELECT 'drop2' AS stage, * FROM v2
             |ORDER BY stage, doc_id""".stripMargin)),

    // ---- ingest-time audio dedup: stream drops vs the standing corpus ---
    // The audio sibling of q_stream_phash_dedup: incoming audio items are
    // Haitsma–Kalker-fingerprinted per micro-batch and band-joined
    // against the STANDING corpus's fingerprint table via the asymmetric
    // probe-vs-reference join (drops never pairwise-join each other,
    // only the index). Verdicts depend on the fixed standing set only ⇒
    // batching-invariant, and the batch oracle gates the streamed path.
    // Same scale shape as the image variant: 2 longs per standing item.
    Q("q_stream_audio_dedup",
      (s, dir) => {
        import s.implicits._
        val schema = s.read.parquet(s"$dir/documents.parquet").schema
        val sink = java.nio.file.Files
          .createTempDirectory("graft_stream_audiofp").toString
        withStreamPartitions(s) {
          val q = s.readStream.schema(schema)
            .option("pathGlobFilter", "documents.parquet").parquet(dir)
            .writeStream.foreachBatch {
              (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  _: Long) =>
                val ss = batch.sparkSession
                import ss.implicits._
                def fpOf(df: org.apache.spark.sql.DataFrame) =
                  Media.audioFingerprint(
                    Media.synthesizeCovering(df, "doc_id", "text")
                      .as[Media.MediaRow]
                      .filter(col("kind") === "audio")).toDF()
                val standingFp = fpOf(
                  graft.Tables.documents(ss, dir).filter(col("doc_id") < 250))
                val batchFp = fpOf(batch.filter(col("doc_id") >= 250))
                val matches = graft.operators.MinHashLSH.hammingBandJoin(
                    batchFp, standingFp, "media_id", "fp_hi", "fp_lo",
                    maxHamming = 8)
                  .groupBy(col("id_p"))
                  .agg(count(lit(1)).as("__nm"))
                batchFp.select(col("media_id").as("doc_id"))
                  .join(matches, col("doc_id") === col("id_p"), "left")
                  .select(col("doc_id"),
                    coalesce(col("__nm"), lit(0L)).as("n_dup_matches"))
                  .write.mode("append").parquet(sink)
                ()
            }.start()
          try q.processAllAvailable() finally q.stop()
        }
        s.read.parquet(sink).orderBy(col("doc_id"))
      },
      Some(s"""WITH $audioFpCte
             |SELECT p.media_id AS doc_id,
             |       CAST(count(r.media_id) AS BIGINT) AS n_dup_matches
             |FROM (SELECT * FROM afp WHERE media_id >= 250) p
             |LEFT JOIN (SELECT * FROM afp WHERE media_id < 250) r
             |  ON bit_count(xor(p.hi, r.hi)) + bit_count(xor(p.lo, r.lo)) <= 8
             |GROUP BY p.media_id ORDER BY doc_id""".stripMargin)),

    // ---- multimodal dedup clusters: phash pairs → connected components --
    // The step after pair generation: union-find over the perceptual-hash
    // pair graph (near-dup similarity is only locally transitive), one
    // cluster row per clustered media item with its size — what a keeper
    // policy consumes. Same distributed min-label propagation as
    // q_dedup_clusters (operators.Components); the oracle re-derives the
    // pairs from the phash CTE and closes them with a recursive CTE, so
    // the hash match proves the fixpoint over perceptual edges.
    Q("q_media_phash_clusters",
      (s, dir) => {
        import s.implicits._
        val media = Media.synthesizeCovering(
          graft.Tables.documents(s, dir), "doc_id", "text").as[Media.MediaRow]
        val edges = graft.operators.MinHashLSH.hammingBandPairs(
            // materialize the 2-longs-per-item hash table once: the banded
            // self-join consumes it on both sides, and without the cut the
            // resize+hash pass runs twice
            Media.dHash(media).toDF().localCheckpoint(true),
            "media_id", "ph_hi", "ph_lo",
            maxHamming = 12)
          .select(col("id_a"), col("id_b"))
        val comps = graft.operators.Components
          .connectedComponents(edges, "id_a", "id_b")
        val sizes = comps.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("cluster_size"))
        // no broadcast() hint: sizes is cluster-count-sized — corpus-order
        // at 100 TB, not dimension-order. AQE broadcasts when it fits.
        comps.join(sizes, Seq("cluster_id"))
          .select(col("id").as("media_id"), col("cluster_id"), col("cluster_size"))
          .orderBy(col("media_id"))
      },
      Some(s"""WITH RECURSIVE $phashCte,
             |pairs AS (
             |  SELECT a.media_id AS id_a, b.media_id AS id_b
             |  FROM h a JOIN h b ON a.media_id < b.media_id
             |  WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 12),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |reach AS (
             |  SELECT src AS id, src AS r FROM edges
             |  UNION
             |  SELECT e.src AS id, rc.r FROM edges e JOIN reach rc ON rc.id = e.dst),
             |lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
             |SELECT id AS media_id, cluster_id,
             |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
             |FROM lab ORDER BY media_id""".stripMargin)),

    // ---- media cluster canonicalization: keep the richest item ----------
    // The keeper policy over the phash clusters (q_cluster_keep_best's
    // media analog): within each perceptual-dup cluster keep the item
    // with the LARGEST payload (the richest encode — the media stand-in
    // for text quality), ties to the smallest id. One max_by hash
    // aggregate over the clustered subset; emits per-item rows a drop
    // pass consumes directly.
    Q("q_media_keep_best",
      (s, dir) => {
        import s.implicits._
        val docs = graft.Tables.documents(s, dir)
        val media = Media.synthesizeCovering(docs, "doc_id", "text")
          .as[Media.MediaRow]
        val edges = graft.operators.MinHashLSH.hammingBandPairs(
            Media.dHash(media).toDF().localCheckpoint(true),
            "media_id", "ph_hi", "ph_lo", maxHamming = 12)
          .select(col("id_a"), col("id_b"))
        val comps = graft.operators.Components
          .connectedComponents(edges, "id_a", "id_b")
        val sized = comps.join(
          docs.select(col("doc_id").as("id"),
            octet_length(col("text")).cast("long").as("__nb")),
          "id")
        val keepers = sized.groupBy(col("cluster_id"))
          .agg(max_by(col("id"), struct(col("__nb"), -col("id")))
            .as("keeper_id"))
        // no broadcast() hint: keepers is cluster-count-sized — corpus-
        // order at 100 TB, not dimension-order. AQE broadcasts when it fits.
        sized.join(keepers, Seq("cluster_id"))
          .select(col("id").as("media_id"), col("cluster_id"), col("keeper_id"))
          .orderBy(col("media_id"))
      },
      Some(s"""WITH RECURSIVE $phashCte,
             |pairs AS (
             |  SELECT a.media_id AS id_a, b.media_id AS id_b
             |  FROM h a JOIN h b ON a.media_id < b.media_id
             |  WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 12),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |reach AS (
             |  SELECT src AS id, src AS r FROM edges
             |  UNION
             |  SELECT e.src AS id, rc.r FROM edges e JOIN reach rc ON rc.id = e.dst),
             |lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
             |keep AS (
             |  SELECT cluster_id, id AS keeper_id FROM (
             |    SELECT lab.cluster_id, lab.id,
             |           row_number() OVER (PARTITION BY lab.cluster_id
             |             ORDER BY strlen(d.text) DESC, lab.id) AS rn
             |    FROM lab JOIN documents d ON d.doc_id = lab.id) t
             |  WHERE rn = 1)
             |SELECT lab.id AS media_id, lab.cluster_id, keep.keeper_id
             |FROM lab JOIN keep ON lab.cluster_id = keep.cluster_id
             |ORDER BY media_id""".stripMargin)),

    // ---- ingest-time media dedup: stream drops vs the PINNED index ------
    // The image-modality sibling of q_stream_decontam: the standing
    // corpus's perceptual hashes persist ONCE as a HammingIndex (round 7
    // — the "production pins the banded table" seam closed), and each
    // micro-batch probes the saved artifact via the asymmetric
    // probe-vs-reference band join (new items never pairwise-join each
    // other, only the index). Each item's verdict depends on the fixed
    // standing index only, so output is batching-invariant and the batch
    // oracle gates the streamed path. Scale: 20 B/item index read per
    // batch, never a corpus re-hash.
    Q("q_stream_phash_dedup",
      (s, dir) => {
        import s.implicits._
        val schema = s.read.parquet(s"$dir/documents.parquet").schema
        val sink = java.nio.file.Files
          .createTempDirectory("graft_stream_phash").toString
        val idxPath = java.nio.file.Files
          .createTempDirectory("graft_stream_phash_idx").toString
        graft.operators.HammingIndex.build(
          Media.dHash(
            Media.synthesizeCovering(
                graft.Tables.documents(s, dir).filter(col("doc_id") < 250),
                "doc_id", "text")
              .as[Media.MediaRow]).toDF(),
          "media_id", "ph_hi", "ph_lo", idxPath)
        withStreamPartitions(s) {
          val q = s.readStream.schema(schema)
            .option("pathGlobFilter", "documents.parquet").parquet(dir)
            .writeStream.foreachBatch {
              (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  _: Long) =>
                val ss = batch.sparkSession
                import ss.implicits._
                val batchPh = Media.dHash(
                  Media.synthesizeCovering(
                      batch.filter(col("doc_id") >= 250), "doc_id", "text")
                    .as[Media.MediaRow]).toDF()
                graft.operators.HammingIndex.verdicts(
                    batchPh, "media_id", "ph_hi", "ph_lo", idxPath,
                    maxHamming = 12)
                  .write.mode("append").parquet(sink)
                ()
            }.start()
          try q.processAllAvailable() finally q.stop()
        }
        s.read.parquet(sink).orderBy(col("doc_id"))
      },
      Some(s"""WITH $phashCte
             |SELECT p.media_id AS doc_id,
             |       CAST(count(r.media_id) AS BIGINT) AS n_dup_matches
             |FROM (SELECT * FROM h WHERE media_id >= 250) p
             |LEFT JOIN (SELECT * FROM h WHERE media_id < 250) r
             |  ON bit_count(xor(p.hi, r.hi)) + bit_count(xor(p.lo, r.lo)) <= 12
             |GROUP BY p.media_id ORDER BY doc_id""".stripMargin)),

    // ---- ingest-time text dedup: stream drops vs the pinned sig index ---
    // Completes the streaming dedup matrix (text here, image
    // q_stream_phash_dedup, audio q_stream_audio_dedup): the standing
    // corpus's minhash signatures persist ONCE (operators.MinHashIndex),
    // and each micro-batch of document drops probes the saved artifact —
    // banded bucket join, Jaccard estimate on candidates only, per-doc
    // verdict rows. Verdicts depend on the fixed standing index only ⇒
    // batching-invariant, batch oracle gates the streamed path. Scale:
    // the corpus text never re-shingles; per batch, only the drop hashes.
    Q("q_stream_minhash_dedup",
      (s, dir) => {
        val schema = s.read.parquet(s"$dir/documents.parquet").schema
        val sink = java.nio.file.Files
          .createTempDirectory("graft_stream_mh").toString
        val idxPath = java.nio.file.Files
          .createTempDirectory("graft_stream_mh_idx").toString
        graft.operators.MinHashIndex.build(
          graft.Tables.documents(s, dir).filter(col("doc_id") < 250),
          "doc_id", "text", idxPath)
        withStreamPartitions(s) {
          val q = s.readStream.schema(schema)
            .option("pathGlobFilter", "documents.parquet").parquet(dir)
            .writeStream.foreachBatch {
              (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  _: Long) =>
                graft.operators.MinHashIndex.verdicts(
                    batch.filter(col("doc_id") >= 250), "doc_id", "text",
                    idxPath)
                  .write.mode("append").parquet(sink)
                ()
            }.start()
          try q.processAllAvailable() finally q.stop()
        }
        s.read.parquet(sink).orderBy(col("doc_id"))
      },
      Some(s"""WITH sig AS (
              |  SELECT doc_id, ${graft.functions.Text.minhashSigSql("text", 64)} AS sig
              |  FROM documents),
              |stand AS (SELECT * FROM sig WHERE doc_id < 250),
              |d AS (SELECT * FROM sig WHERE doc_id >= 250),
              |bs AS (SELECT doc_id, i AS band,
              |         md5(array_to_string(sig[i*4+1 : i*4+4], ',')) AS bkey
              |       FROM stand, range(16) t(i)),
              |bd AS (SELECT doc_id, i AS band,
              |         md5(array_to_string(sig[i*4+1 : i*4+4], ',')) AS bkey
              |       FROM d, range(16) t(i)),
              |c AS (SELECT DISTINCT a.doc_id AS id_p, b.doc_id AS id_r
              |      FROM bd a JOIN bs b ON a.band = b.band AND a.bkey = b.bkey),
              |m AS (SELECT id_p, id_r FROM c
              |      JOIN sig sa ON c.id_p = sa.doc_id
              |      JOIN sig sb ON c.id_r = sb.doc_id
              |      WHERE len(list_filter(range(64),
              |        i -> sa.sig[i+1] = sb.sig[i+1])) * 15625 >= 500000)
              |SELECT d.doc_id,
              |       CAST(count(m.id_r) AS BIGINT) AS n_dup_matches
              |FROM d LEFT JOIN m ON m.id_p = d.doc_id
              |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)),

    // ---- ingest-time decontamination: the streaming scrub ---------------
    // q_decontaminate runs the n-gram eval-overlap scrub as a BATCH pass;
    // a production pipeline scrubs at INGEST so contaminated documents
    // never land in the training corpus. Same shape as the streaming
    // index append: readStream over document drops → foreachBatch runs
    // the SHARED scrub core (StreamingIngest.decontamScrub — one code
    // path with the batch entry) against the broadcast eval-set hashes
    // and appends verdicts to the sink. Each doc arrives in exactly one
    // batch and the scrub is per-doc, so output is batching-invariant and
    // the BATCH oracle gates the streaming engine end-to-end. Scale: the
    // eval side is fixed and KB-sized (rebuilt per batch here for
    // session-safety; production pins it once); per-batch work is linear
    // in the drop's shingles, and state is zero — the scrub is stateless,
    // unlike the dedup/session queries above.
    Q("q_stream_decontam",
      (s, dir) => {
        // footer-only schema probe, as eventStream does for events.ts
        val schema = s.read.parquet(s"$dir/documents.parquet").schema
        val sink = java.nio.file.Files
          .createTempDirectory("graft_stream_decontam").toString
        withStreamPartitions(s) {
          val q = s.readStream.schema(schema)
            .option("pathGlobFilter", "documents.parquet").parquet(dir)
            .writeStream.foreachBatch {
              (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  _: Long) =>
                val docs = graft.Tables.documents(batch.sparkSession, dir)
                val evalH = docs.filter(col("doc_id") < 20)
                  .select(explode(graft.functions.Text
                    .shingleHashes(col("text"))).as("h"))
                StreamingIngest.decontamScrub(
                    batch.filter(col("doc_id") >= 20), evalH)
                  .write.mode("append").parquet(sink)
                ()
            }.start()
          try q.processAllAvailable() finally q.stop()
        }
        s.read.parquet(sink).orderBy(col("doc_id"))
      },
      Some(CurationQueries.decontamOracleSql)),

    // ---- streaming ANN search: query stream vs the persisted index ------
    // The serving-side complement of the streaming index APPEND
    // (IvfPqIndexSpec): queries arrive as a stream and each micro-batch
    // is answered from the SAVED IVF-PQ index — build once, readStream
    // the query vectors, foreachBatch runs searchIvfPq over the loaded
    // artifacts and appends results. Search is stateless per query, so
    // output is batching-invariant and q_ivfpq_search's own oracle gates
    // the streamed path end to end (same index, same queries, same k).
    // Scale: per batch, centroids/codebooks/LUT broadcast; only probed
    // code lists scan — the index never reloads into memory between
    // batches beyond parquet reads production would cache.
    Q("q_stream_ann_search",
      (s, dir) => {
        val emb = graft.Tables.embeddings(s, dir)
        val idxPath = java.nio.file.Files
          .createTempDirectory("graft_stream_ann_idx").toString
        graft.operators.VectorIndex.buildIvfPq(
          emb, "vec_id", "embedding", "label", idxPath, 8, 8)
        val qSrc = java.nio.file.Files
          .createTempDirectory("graft_stream_ann_q").toString
        emb.filter(col("vec_id") < 5)
          .coalesce(1).write.mode("append").parquet(qSrc)
        val sink = java.nio.file.Files
          .createTempDirectory("graft_stream_ann_out").toString
        val schema = s.read.parquet(s"$dir/embeddings.parquet").schema
        withStreamPartitions(s) {
          val q = s.readStream.schema(schema).parquet(qSrc)
            .writeStream.foreachBatch {
              (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  _: Long) =>
                graft.operators.VectorIndex.searchIvfPq(
                    batch.sparkSession, idxPath, batch,
                    "vec_id", "embedding", k = 5, nProbe = 2)
                  .write.mode("append").parquet(sink)
                ()
            }.start()
          try q.processAllAvailable() finally q.stop()
        }
        s.read.parquet(sink).orderBy(col("query_id"), col("rank"))
      },
      Some(PQQueries.ivfPqStreamOracle)),

    // ---- streaming search-index ingest → live BM25 serving ---------------
    // The search index fed the way production feeds it: the standing
    // corpus builds once, a document STREAM appends postings per
    // micro-batch through the keyed exactly-once path (foreachBatch
    // batchId → partition overwrite under replay), and serving reads the
    // live index afterwards. The oracle scores the FULL corpus from
    // scratch — hash equality proves streamed ingest left the index
    // exactly equal to a batch build, including the df/N statistics the
    // late docs shift. Batching-invariant by the same argument as every
    // keyed append here.
    Q("q_stream_search_ingest",
      (s, dir) => {
        val docs = graft.Tables.documents(s, dir)
        val idxPath = java.nio.file.Files
          .createTempDirectory("graft_stream_sidx").toString
        graft.operators.SearchIndex.build(
          docs.filter(col("doc_id") < 250), "doc_id", "text", idxPath)
        val srcDir = java.nio.file.Files
          .createTempDirectory("graft_stream_sidx_src").toString
        docs.filter(col("doc_id") >= 250)
          .coalesce(1).write.mode("append").parquet(srcDir)
        val schema = s.read.parquet(s"$dir/documents.parquet").schema
        withStreamPartitions(s) {
          val q = s.readStream.schema(schema).parquet(srcDir)
            .writeStream.foreachBatch {
              (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  batchId: Long) =>
                graft.operators.SearchIndex.append(
                  batch, "doc_id", "text", idxPath, batchId = Some(batchId))
                ()
            }.start()
          try q.processAllAvailable() finally q.stop()
        }
        graft.operators.SearchIndex
          .bm25(s, idxPath, SearchQueries.QueryTerms, 20)
          .orderBy(col("score_ppm").desc, col("doc_id"))
      },
      Some(s"""WITH ${SearchQueries.bm25CtesFor("documents")}
              |SELECT doc_id, score_ppm, n_terms
              |FROM bm ORDER BY score_ppm DESC, doc_id LIMIT 20""".stripMargin)),

    // ---- CONTINUOUS dedup clustering: streamed drops fold into the ------
    // standing assignment — round 8's pieces composed end to end: per
    // micro-batch (maxFilesPerTrigger=1 forces several), the drop's
    // near-dup edges against everything ingested so far fold in via
    // Components.incrementalComponents, and the assignment state
    // advances as per-batch parquet versions (disk state, the pattern
    // every stream here uses). The oracle is the full transitive
    // closure over ALL pairs — the same SQL as q_dedup_clusters — so
    // the hash proves the STREAMED fold-chain is indistinguishable from
    // re-clustering the whole corpus, across arbitrary batch splits.
    // Scale note: edges here are exact-Jaccard for oracle exactness
    // (re-shingles the corpus per batch at fixture size); production
    // swaps in the MinHashIndex probe for candidate edges — the
    // clustering fold is the part this query gates.
    Q("q_stream_incremental_clusters",
      (s, dir) => {
        val docs = graft.Tables.documents(s, dir)
        val standingDocs = docs.filter(col("doc_id") < 350)
        val stateDir = java.nio.file.Files
          .createTempDirectory("graft_stream_cc_state").toString
        graft.operators.Components.connectedComponents(
            graft.operators.MinHashLSH.jaccardPairs(
                standingDocs, "doc_id", "text", minJaccardPpm = 500000L)
              .select(col("id_a"), col("id_b")),
            "id_a", "id_b")
          .write.parquet(s"$stateDir/v_init")
        val corpusDir = java.nio.file.Files
          .createTempDirectory("graft_stream_cc_corpus").toString
        standingDocs.write.mode("append").parquet(corpusDir)
        val srcDir = java.nio.file.Files
          .createTempDirectory("graft_stream_cc_src").toString
        // two files → two micro-batches: the fold must chain across them
        docs.filter(col("doc_id") >= 350 && col("doc_id") < 425)
          .coalesce(1).write.mode("append").parquet(srcDir)
        docs.filter(col("doc_id") >= 425)
          .coalesce(1).write.mode("append").parquet(srcDir)
        val schema = s.read.parquet(s"$dir/documents.parquet").schema
        @volatile var stateVersion = "v_init"
        withStreamPartitions(s) {
          val q = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(srcDir)
            .writeStream.foreachBatch {
              (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  batchId: Long) =>
                val bs = batch.sparkSession
                val b = batch.localCheckpoint(true)
                val soFar = bs.read.parquet(corpusDir)
                val union = soFar.unionByName(b)
                // asymmetric probe (round 15): only the BATCH docs'
                // shingles probe the union — Σ df_batch·df work per fold
                // instead of re-paying the standing corpus's full
                // self-join (Σ df²) every micro-batch, and the
                // endpoint-filter semis/distinct disappear because every
                // emitted pair touches the batch by construction.
                // Output proven identical to the filtered self-join
                // (operator doc; q_stream_incremental_clusters
                // hash-green at both SFs).
                val touching = graft.operators.MinHashLSH
                  .jaccardPairsTouching(union, "doc_id", "text",
                    b.select(col("doc_id")), minJaccardPpm = 500000L)
                  .select(col("id_a"), col("id_b"))
                graft.operators.Components.incrementalComponents(
                    bs.read.parquet(s"$stateDir/$stateVersion"), touching)
                  .write.parquet(s"$stateDir/v$batchId")
                stateVersion = s"v$batchId"
                b.write.mode("append").parquet(corpusDir)
                ()
            }.start()
          try q.processAllAvailable() finally q.stop()
        }
        val comps = s.read.parquet(s"$stateDir/$stateVersion")
        val sizes = comps.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("cluster_size"))
        comps.join(broadcast(sizes), Seq("cluster_id"))
          .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"))
          .orderBy(col("doc_id"))
      },
      Some(DedupQueries.dedupClustersOracle))
  )
}
