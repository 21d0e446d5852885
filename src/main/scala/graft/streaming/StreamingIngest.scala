package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming variant of the ingest/rollup path (SURVEY.md §7.5 —
  * the BASELINE "structured streams" north star; the reference itself is
  * strictly @daily batch, dags/db_pipeline_dag.py:56).
  *
  * Scale notes: watermark + tumbling-window aggregation is incremental
  * state (partial aggregates per window×key), shuffled once by group key;
  * `flatMapGroupsWithState` keeps one tiny record per key. Both scale
  * horizontally with executors; state lives in the state store, not the
  * driver.
  */
object StreamingIngest {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Streaming scan over a directory of parquet/csv drops. */
  def readEventStream(spark: SparkSession, dir: String,
      format: String = "parquet"): DataFrame =
    spark.readStream.schema(eventSchema).format(format).load(dir)

  /** Hourly per-type rollups with a 2-hour watermark (append-mode safe).
    * The sum is decimal-exact so the result is independent of row
    * arrival / aggregation order — required for replayable pipelines and
    * for batch-equivalence checks (q_stream_hourly_rollup's oracle). */
  def hourlyRollups(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
        max(col("value")).as("max_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"), col("max_value"))

  /** Sliding-window rollups (1h windows every 15min): each event lands in
    * 4 overlapping windows; state is still one partial aggregate per
    * (window × type). */
  def slidingRollups(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(18,6)")).cast("double") / count(lit(1)))
          .as("avg_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("avg_value"))

  /** Per-user session windows (30-min inactivity gap) — the streaming
    * analog of the batch gap-sessionization query (q_sessionize): state is
    * one open session per key, merged/closed by the engine as events and
    * the watermark advance. */
  def sessionRollups(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n"), col("sum_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class Transition(user_id: Long, from_type: String,
      to_type: String, at_epoch: Long)
  final case class LastSeen(event_type: String, epoch: Long)

  /** Per-key status-transition detection via flatMapGroupsWithState — the
    * stateful analog of the reference's status tracking (X5 family). Emits
    * a record each time a key's event_type changes between consecutive
    * events (within a micro-batch, events are processed in ts order). */
  def statusTransitions(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, batch: Iterator[Event], state: GroupState[LastSeen]) => {
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          var last = state.getOption
          sorted.foreach { e =>
            val ep = e.ts.getTime / 1000
            last.foreach { l =>
              if (l.event_type != e.event_type)
                out += Transition(uid, l.event_type, e.event_type, ep)
            }
            last = Some(LastSeen(e.event_type, ep))
          }
          last.foreach(state.update)
          out.iterator
        })
  }

  final case class RunningTotal(user_id: Long, n_events: Long, sum_cents: Long)

  /** Per-key running totals via the Spark 4 `transformWithState` API
    * (StatefulProcessor + typed ValueState, RocksDB-backed): the
    * arbitrary-state successor to flatMapGroupsWithState. Emits the
    * updated totals for every key seen in a batch (Update semantics), so
    * the latest row per key is the true running count/sum regardless of
    * how the input was micro-batched. Integer-cent sums — exact and
    * batching-invariant. Scale: one row of state per key in the RocksDB
    * store, one shuffle per batch on the key. */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, RunningTotal] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[RunningTotal] = {
      var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { e =>
        n += 1
        cents += math.floor(e.value * 100).toLong
      }
      totals.update((n, cents))
      Iterator.single(RunningTotal(key, n, cents))
    }
  }

  def runningTotals(events: Dataset[Event]): Dataset[RunningTotal] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** N-gram decontamination scrub over one batch of training documents:
    * per-doc distinct-shingle counts and how many hit the eval set. The
    * shared core of the BATCH scrub (q_decontaminate) and the INGEST-TIME
    * scrub (q_stream_decontam's foreachBatch) — one code path, so the two
    * can never drift. `evalHashes` is the eval corpus's distinct shingle
    * hashes as (h) — benchmark sets are KBs, so it broadcasts; the
    * training side is one explode + one hash aggregate, and the text
    * itself never shuffles (only (doc_id, hash) pairs cross the wire).
    * Output: (doc_id, n_shingles, n_contaminated, contam_ppm). */
  def decontamScrub(train: DataFrame, evalHashes: DataFrame): DataFrame =
    train
      .select(col("doc_id"),
        explode(graft.functions.Text.shingleHashes(col("text"))).as("h"))
      .join(broadcast(evalHashes.select(col("h")).distinct()
        .withColumn("__hit", lit(1L))), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contam_ppm",
        expr("n_contaminated * 1000000L div n_shingles"))

  /** Streaming upsert sink: maintain "latest row per key" as a parquet
    * state table via foreachBatch — the merge-into pattern on plain files.
    * Each micro-batch unions the incoming rows with the current state and
    * re-deduplicates with the single-pass max_by aggregate; the new state
    * is written to a fresh directory and swapped in via two renames with
    * a `__old` fallback: a crash between the renames leaves the previous
    * state recoverable at `__old` (checked on the next batch's read), so
    * no committed state is ever lost. (A transactional table format —
    * Delta/Iceberg — is the production answer; this is the plain-files
    * contract.)
    *
    * Scale: work per batch is O(|state| + |batch|) with one shuffle (the
    * max_by aggregate); at 100 TB the state table would be partitioned by
    * key range so the merge touches only affected partitions.
    */
  def upsertLatest(
      events: DataFrame,
      stateDir: String,
      checkpointDir: String,
      key: String,
      ordCols: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions.col
    events.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val cur = new org.apache.hadoop.fs.Path(stateDir)
        val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val old = new org.apache.hadoop.fs.Path(stateDir + "__old")
        val next = new org.apache.hadoop.fs.Path(stateDir + "__next")
        // recover from a crash that happened between the two swap renames
        if (!fs.exists(cur) && fs.exists(old)) fs.rename(old, cur)
        val base = if (fs.exists(cur)) spark.read.parquet(stateDir) else batch.limit(0)
        val merged = graft.operators.LatestPerKey.maxBy(
          base.unionByName(batch), key, ordCols.map(col))
        merged.write.mode("overwrite").parquet(next.toString)
        if (fs.exists(old)) fs.delete(old, true)
        if (fs.exists(cur)) fs.rename(cur, old)
        fs.rename(next, cur)
        fs.delete(old, true)
        ()
      }
      .start()
  }
}
