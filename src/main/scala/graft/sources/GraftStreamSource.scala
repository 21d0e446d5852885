package graft.sources

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{StringType, StructType}

import graft.operators.TableManifest

/** `spark.readStream.format("graft").load(path)` — a graft table AS A
  * STREAM: every committed version becomes a micro-batch offset, and
  * each batch serves exactly the rows that version added, read from the
  * change data feed ([[TableManifest.readChanges]] — the `__batch`
  * partition dirs between the two watermarks, O(changed batches) at any
  * table size, never a table rescan). The library-level "the index
  * follows the table" machinery (`SearchIndex.syncFromTable`,
  * `IncrementalAgg`) becomes a one-liner for ANY downstream:
  *
  *   spark.readStream.format("graft").load(path)
  *     .writeStream.foreachBatch(...).start()
  *
  * Semantics:
  *  - FIRST batch = the full table at the stream's starting version (the
  *    Delta "initial snapshot, then follow" shape); pass
  *    `option("startingVersion", v)` to begin following AFTER version v
  *    (no snapshot — pure tail), e.g. `startingVersion = current` for
  *    new-data-only.
  *  - Later batches = the CDF between consecutive committed versions,
  *    filtered to inserts. MoR deletes and snapshot replacements are
  *    content changes, not appends: the default insert feed drops their
  *    delete rows (the append-stream contract); pass
  *    `option("changeFeed", "true")` to receive full CDF rows with the
  *    `_change_type` column instead.
  *  - Offsets are COMMITTED VERSIONS, so restart replay is exact: a
  *    checkpointed (start, end] window re-reads the identical version
  *    range (immutable once committed — the manifest contract), giving
  *    exactly-once delivery across restarts as long as the replay window
  *    is inside the vacuum retention horizon (the RETAIN rule).
  *
  * Scale shape: getOffset is one manifest listing RPC; each micro-batch
  * builds its scan from the window's batch dirs only. A stream that
  * falls behind pays the versions it skipped, never the table.
  */
class GraftStreamSource(spark: SparkSession, path: String,
    startingVersion: Option[Long], changeFeed: Boolean,
    declaredSchema: StructType) extends Source {

  override def schema: StructType = declaredSchema

  private def versionOf(o: V1Offset): Long = o match {
    case GraftVersionOffset(v) => v
    // after a restart the engine hands back the checkpointed JSON
    case other                 => other.json.trim.toLong
  }

  override def getOffset: Option[V1Offset] = {
    if (!TableManifest.exists(spark, path)) return None
    val v = TableManifest.versions(spark, path).last
    // nothing to serve yet when tailing from at-or-past the current version
    if (startingVersion.exists(_ >= v)) None
    else Some(GraftVersionOffset(v))
  }

  /** The declared schema minus the feed's own `_change_type` — passed
    * into every manifest read so a window whose batches have MIXED
    * schemas (evolution mid-history) reads deterministically under the
    * stream's contract (absent columns null-pad) instead of whatever
    * one footer happens to say. */
  private val baseSchema: StructType =
    StructType(declaredSchema.fields.filterNot(_.name == "_change_type"))

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endV = versionOf(end)
    val from = start.map(versionOf).orElse(startingVersion)
    val batch: DataFrame = from match {
      case None =>
        // initial snapshot: the whole table at the stream's first offset
        val snap = TableManifest.readAt(spark, path, endV, Some(baseSchema))
        if (changeFeed) snap.withColumn("_change_type", lit("insert"))
        else snap
      case Some(fromV) if fromV == endV =>
        val empty = TableManifest.readAt(spark, path, endV, Some(baseSchema))
          .filter(lit(false))
        if (changeFeed) empty.withColumn("_change_type", lit("insert"))
        else empty
      case Some(fromV) =>
        val feed = TableManifest.readChanges(spark, path, fromV, endV,
          Some(baseSchema))
        if (changeFeed) feed
        else feed.filter(col("_change_type") === "insert")
          .drop("_change_type")
    }
    // serve EXACTLY the declared schema, whatever the batch's own shape:
    // a column the stream declared but this window lacks (the stream
    // started with mergeSchema over evolved history, or an append
    // evolved the table mid-stream) null-pads — the manifest's evolved-
    // read contract; columns added AFTER stream start stay invisible
    // until a restart re-declares
    val have = batch.columns.toSet
    val aligned = batch.select(
      declaredSchema.fields.toIndexedSeq.map { f =>
        if (have(f.name)) col(s"`${f.name}`")
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    GraftColumnBridge.streamingDataFrame(spark,
      aligned.queryExecution.toRdd, declaredSchema)
  }

  override def commit(end: V1Offset): Unit = ()

  override def stop(): Unit = ()
}

/** A committed manifest version as a streaming offset. */
case class GraftVersionOffset(version: Long) extends V1Offset {
  override def json: String = version.toString
}

/** `writeStream.format("graft")` — the manifest table as a streaming
  * SINK, completing the loop the spec-level machinery already proved
  * (q_stream_table_append's foreachBatch shape, now a one-liner):
  *
  *   df.writeStream.format("graft")
  *     .option("path", p).option("checkpointLocation", ck).start()
  *
  * Output modes map onto the two manifest commit shapes:
  *  - Append  → [[TableManifest.append]] under the micro-batch's
  *    batchId key: foreachBatch-style at-least-once delivery becomes
  *    exactly-once on disk (a replayed batch overwrites its own
  *    `__batch` partition; one folded by compaction no-ops against the
  *    carried watermark).
  *  - Complete → [[TableManifest.commitSnapshot]] per batch — each
  *    emission REPLACES the table (the aggregate-refresh shape); a
  *    replay rewrites identical content, idempotent by construction.
  *  - Update + `option("mergeKeys", "k1,k2")` → [[TableManifest
  *    .mergeWhere]] per batch: each emission UPSERTS by key through the
  *    match-proportional MoR merge (equality tombstone + replacement
  *    batch, one marker) — the streaming upsert that previously needed
  *    Append + readLatest. Replay is content-idempotent (a micro-batch
  *    replays only before newer batches commit, and re-merging the
  *    same deterministic emission reproduces the same content); Update
  *    WITHOUT mergeKeys is refused with the guidance.
  *
  * A fresh path is seeded with a zero-row schema snapshot so the first
  * micro-batch lands as a NORMAL keyed append (replayable), not a
  * snapshot.
  *
  * IN-BAND MAINTENANCE — `option("maintainEvery", n)`: every n-th
  * micro-batch runs [[TableManifest.maintain]] on the sink's own table
  * (fold thresholds via `maintainMaxBatches`/`maintainMaxDeletes`,
  * defaults 16/8). Without it, a 24/7 Update-mode stream accrues one
  * MoR tombstone + replacement batch per micro-batch — an unbounded
  * chain that degrades every read of the served table (~0.1 s/segment
  * measured) until an operator intervenes; with it the chain is
  * bounded by construction (the GraftStreamSourceSpec maintenance arm
  * measures both curves). `option("vacuumRetain", millis)` additionally
  * lets maintenance expire old versions past the retention horizon
  * (keep = 2); WITHOUT it maintenance never vacuums — downstream
  * `readStream`/CDF consumers replay version windows, and silently
  * reclaiming them would break exactly the consumers this sink feeds.
  * Maintenance runs between commits on the single writer thread, so the
  * fold's single-maintenance-actor contract holds by construction.
  *
  * Writer contract (inherited from [[TableManifest.append]] verbatim):
  * keyed batchIds share ONE keyspace per table — run one Append-mode
  * stream per table (two streams would replay-overwrite each other's
  * partitions); concurrent foreachBatch/unkeyed writers compose safely. */
private[sources] class GraftSink(spark: SparkSession, path: String,
    complete: Boolean, mergeKeys: Seq[String] = Nil,
    maintainEvery: Int = 0, maintainMaxBatches: Int = 16,
    maintainMaxDeletes: Int = 8, vacuumRetain: Option[Long] = None)
    extends org.apache.spark.sql.execution.streaming.Sink {

  private var batchesSinceMaintain = 0

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the engine's frame is flagged streaming and refuses .write; its
    // rows are an ordinary batch RDD — re-wrap (the V1-sink idiom)
    val batch = GraftColumnBridge.batchDataFrame(spark,
      data.queryExecution.toRdd, data.schema)
    if (complete) {
      TableManifest.commitSnapshot(batch, path)
    } else if (mergeKeys.nonEmpty) {
      // Update mode: each emission is a per-key UPSERT through the
      // match-proportional MoR merge (equality tombstone + replacement
      // batch, one marker) — matched keys take the emitted row
      // (SET *), new keys insert. Keys match NULL-SAFELY (<=>), unlike
      // SQL MERGE's 3VL equality: a streaming aggregate with a
      // nullable grouping column emits a NULL-key row every
      // micro-batch, and under === that row would re-INSERT each time
      // instead of replacing — the served table would accumulate
      // duplicate NULL-key rows and diverge from the batch aggregate
      // this sink promises. Replay is CONTENT-idempotent: a
      // micro-batch replays only before any newer batch commits
      // (checkpoint semantics), and re-merging the same deterministic
      // emission reproduces the same table content (one extra version,
      // the foreachBatch-merge guidance table formats document).
      if (!TableManifest.exists(spark, path))
        TableManifest.createEmpty(spark, path, batch.schema)
      TableManifest.mergeWhere(spark, path, batch, mergeKeys,
        matched = Seq(TableManifest.MergeMatched("update", None)),
        inserts = Seq(TableManifest.MergeInsert(None)),
        nullSafeKeys = true)
      ()
    } else {
      if (!TableManifest.exists(spark, path))
        TableManifest.createEmpty(spark, path, batch.schema)
      TableManifest.append(batch, path, batchId = Some(batchId))
    }
    if (maintainEvery > 0) {
      batchesSinceMaintain += 1
      if (batchesSinceMaintain >= maintainEvery) {
        batchesSinceMaintain = 0
        // fold the MoR chain / append log when over threshold; expire
        // versions ONLY when the operator declared a retention horizon
        // (vacuumRetain) — see the class scaladoc
        TableManifest.maintain(spark, path,
          maxBatches = maintainMaxBatches,
          maxDeletes = maintainMaxDeletes,
          keepVersions = if (vacuumRetain.isDefined) 2 else Int.MaxValue,
          retainMs = vacuumRetain.getOrElse(0L)).collect()
        ()
      }
    }
    ()
  }

  override def toString: String = s"GraftSink[$path]"
}

/** The [[org.apache.spark.sql.sources.StreamSourceProvider]] half of the
  * connector — mixed into [[GraftTableSource]]'s registration so
  * `readStream.format("graft")` resolves through the same short name. */
trait GraftStreamSourceProvider
    extends org.apache.spark.sql.sources.StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider {
  import GraftTableSource._

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    import org.apache.spark.sql.streaming.OutputMode
    val mergeKeys = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("mergeKeys") =>
        v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }.getOrElse(Nil)
    require(outputMode != OutputMode.Update() || mergeKeys.nonEmpty,
      "graft sink Update mode needs option(\"mergeKeys\", \"k1,k2\") — " +
        "each emission then UPSERTS per key through the MoR merge " +
        "(equality tombstone + replacement batch); without keys use " +
        "Append (keyed exactly-once appends) or Complete (snapshot " +
        "replacement per batch)")
    require(partitionColumns.isEmpty,
      "graft tables manage their own layout (__batch partitions, " +
        "OPTIMIZE/CLUSTER BY) — partitionBy on the stream writer would " +
        "be silently ignored, so it is refused")
    import scala.jdk.CollectionConverters._
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      parameters.asJava)
    def intOpt(name: String, dflt: Int): Int =
      Option(opts.get(name)).map(v => v.toIntOption.getOrElse(
        throw new IllegalArgumentException(
          s"graft sink option $name must be an integer, got '$v'")))
        .getOrElse(dflt)
    val retain = Option(opts.get("vacuumRetain")).map(v =>
      v.toLongOption.filter(_ > 0L).getOrElse(
        throw new IllegalArgumentException(
          s"graft sink option vacuumRetain must be a positive " +
            s"retention horizon in milliseconds, got '$v'")))
    new GraftSink(sqlContext.sparkSession, pathOf(opts),
      complete = outputMode == OutputMode.Complete(),
      mergeKeys =
        if (outputMode == OutputMode.Update()) mergeKeys else Nil,
      maintainEvery = intOpt("maintainEvery", 0),
      maintainMaxBatches = intOpt("maintainMaxBatches", 16),
      maintainMaxDeletes = intOpt("maintainMaxDeletes", 8),
      vacuumRetain = retain)
  }

  private def changeFeedOf(parameters: Map[String, String]): Boolean =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("changeFeed") => v.toBoolean
    }.getOrElse(false)

  /** `startingVersion` as a version NUMBER or a NAMED TAG — the same
    * resolution every other version-addressed surface gives (the
    * consumer checkpoint can be the vacuum-protected operator ref). */
  private def startingOf(parameters: Map[String, String],
      path: String): Option[Long] =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("startingVersion") =>
        v.toLongOption
          .orElse(graft.operators.TableManifest.tagVersion(
            org.apache.spark.sql.SparkSession.active, path, v))
          .getOrElse(throw new IllegalArgumentException(
            s"startingVersion '$v' is neither a committed version " +
              s"number nor a tag of $path"))
    }

  private def streamSchema(spark: SparkSession,
      parameters: Map[String, String],
      user: Option[StructType]): StructType = {
    import scala.jdk.CollectionConverters._
    val base = user.getOrElse {
      val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        parameters.asJava)
      // option("mergeSchema"): the stream declares the UNION of the
      // table's batch schemas — evolved history null-pads per batch
      GraftTableSource.tableSchema(spark, pathOf(opts), None,
        mergeSchema = GraftTableSource.mergeOf(opts))
    }
    if (changeFeedOf(parameters) && !base.fieldNames.contains("_change_type"))
      base.add("_change_type", StringType, nullable = false)
    else base
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft", streamSchema(sqlContext.sparkSession, parameters, schema))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    import scala.jdk.CollectionConverters._
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      parameters.asJava)
    new GraftStreamSource(sqlContext.sparkSession, pathOf(opts),
      startingOf(parameters, pathOf(opts)), changeFeedOf(parameters),
      streamSchema(sqlContext.sparkSession, parameters, schema))
  }
}
