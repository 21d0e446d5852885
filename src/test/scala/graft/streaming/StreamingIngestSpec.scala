package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private def writeBatch(dir: String): Unit = {
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:10:00"), 1L, "click", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 00:20:00"), 1L, "click", 2.0),
      (3L, Timestamp.valueOf("2024-01-01 00:30:00"), 1L, "error", 3.0),
      (4L, Timestamp.valueOf("2024-01-01 01:15:00"), 2L, "view", 4.0),
      (5L, Timestamp.valueOf("2024-01-01 01:45:00"), 1L, "click", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  test("upsertLatest maintains latest-per-key parquet state across batches") {
    val src = Files.createTempDirectory("upsert_src").toString
    val state = Files.createTempDirectory("upsert_state").toString + "/state"
    val ckpt = Files.createTempDirectory("upsert_ckpt").toString
    writeBatch(src)
    val q = StreamingIngest.upsertLatest(
      StreamingIngest.readEventStream(spark, src),
      state, ckpt, "user_id", Seq("ts", "event_id"))
    try {
      q.processAllAvailable()
      val s1 = spark.read.parquet(state)
        .select("user_id", "event_id").orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(s1 == Seq((1L, 5L), (2L, 4L)))

      // second drop: newer row for user 1, first row for user 3
      Seq(
        (6L, Timestamp.valueOf("2024-01-01 02:00:00"), 1L, "view", 6.0),
        (7L, Timestamp.valueOf("2024-01-01 02:01:00"), 3L, "click", 7.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      val s2 = spark.read.parquet(state)
        .select("user_id", "event_id").orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(s2 == Seq((1L, 6L), (2L, 4L), (3L, 7L)))
    } finally q.stop()
  }

  test("transformWithState running totals accumulate across micro-batches") {
    val src = Files.createTempDirectory("twstate_src").toString
    writeBatch(src)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = StreamingIngest.runningTotals(
        StreamingIngest.readEventStream(spark, src).as[StreamingIngest.Event])
      .writeStream.outputMode("update")
      .format("memory").queryName("tw_totals").start()
    try {
      q.processAllAvailable()
      def totals() = spark.table("tw_totals")
        .groupBy("user_id").agg(max("n_events").as("n"), max("sum_cents").as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      // batch 1: user 1 has events 1,2,3,5 (100+200+300+500 cents), user 2 has 4
      assert(totals() == Seq((1L, 4L, 1100L), (2L, 1L, 400L)))

      // batch 2 must ADD onto RocksDB state, not restart from zero
      Seq(
        (6L, Timestamp.valueOf("2024-01-01 02:00:00"), 1L, "view", 6.0),
        (7L, Timestamp.valueOf("2024-01-01 02:01:00"), 3L, "click", 7.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      assert(totals() == Seq((1L, 5L, 1700L), (2L, 1L, 400L), (3L, 1L, 700L)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("dropDuplicatesWithinWatermark keeps dedup state across batches under RocksDB") {
    val src = Files.createTempDirectory("rdb_dedup_src").toString
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "click", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(src)
    // conf restore wraps EVERYTHING after the set — a failure in start()
    // must not leak the provider into the shared session
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingIngest.readEventStream(spark, src)
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("event_id")
        .select("event_id")
        .writeStream.outputMode("append")
        .format("memory").queryName("rdb_dedup").start()
      try {
        q.processAllAvailable()
        def ids() = spark.table("rdb_dedup")
          .collect().map(_.getLong(0)).toSeq.sorted
        assert(ids() == Seq(1L, 2L))

        // batch 2 re-sends id 1 (inside the watermark window) plus a new
        // id 3: the duplicate must be dropped by state the RocksDB
        // provider carried over from batch 1, and only the new id emitted.
        Seq(
          (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", 1.0),
          (3L, Timestamp.valueOf("2024-01-01 10:10:00"), 2L, "view", 3.0))
          .toDF("event_id", "ts", "user_id", "event_type", "value")
          .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        assert(ids() == Seq(1L, 2L, 3L),
          "duplicate id 1 must be suppressed by cross-batch RocksDB state")
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("append-mode windows finalize on watermark advance; late rows drop") {
    val src = Files.createTempDirectory("wm_src").toString
    def drop(rows: (Long, String, Long, String, Double)*): Unit =
      rows.map { case (id, ts, u, t, v) => (id, Timestamp.valueOf(ts), u, t, v) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)

    // batch 1: two events inside hour 10:00
    drop((1L, "2024-01-01 10:05:00", 1L, "view", 1.0),
      (2L, "2024-01-01 10:10:00", 1L, "view", 2.0))
    val name = "wm_rollup"
    val q = StreamingIngest.hourlyRollups(
        StreamingIngest.readEventStream(spark, src))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      def rows() = spark.table(name)
        .select(col("hour_start").cast("string"), col("n"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sorted
      // watermark (10:10 − 2h) has not passed the window end → no output
      assert(rows().isEmpty, "open window must not emit in append mode")

      // batch 2: an event at 14:30 pushes the watermark to 12:30 > 11:00,
      // so the hour-10 window FINALIZES and emits exactly once
      drop((3L, "2024-01-01 14:30:00", 1L, "view", 4.0))
      q.processAllAvailable()
      assert(rows() == Seq(("2024-01-01 10:00:00", 2L, 3.0)))

      // batch 3: a late row back inside hour 10 — below the watermark —
      // is DROPPED: the finalized window's result never changes
      drop((4L, "2024-01-01 10:20:00", 1L, "view", 100.0))
      q.processAllAvailable()
      assert(rows() == Seq(("2024-01-01 10:00:00", 2L, 3.0)),
        "late data below the watermark must not re-open the window")

      // the 14:00 window is still open (watermark never passed 15:00)
      assert(!rows().exists(_._1.startsWith("2024-01-01 14")))
    } finally q.stop()
  }

  test("session windows split on the 30-minute inactivity gap") {
    val dir = Files.createTempDirectory("stream_sess").toString
    writeBatch(dir)
    val q = StreamingIngest.sessionRollups(
        StreamingIngest.readEventStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_test").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sess_test")
        .orderBy("user_id", "s_start")
        .select("user_id", "n", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      // user 1: events 00:10/00:20/00:30 chain into one session (≤30m
      // gaps), 01:45 opens a second; user 2: single event session.
      assert(rows == Seq((1L, 3L, 6.0), (1L, 1L, 5.0), (2L, 1L, 4.0)))
    } finally q.stop()
  }

  test("hourly rollups aggregate a streamed batch (memory sink)") {
    val dir = Files.createTempDirectory("stream_src").toString
    writeBatch(dir)
    val rollup = StreamingIngest.hourlyRollups(
      StreamingIngest.readEventStream(spark, dir))
    val q = rollup.writeStream.outputMode("complete")
      .format("memory").queryName("rollup_test").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("rollup_test")
        .orderBy("hour_start", "event_type")
        .select("event_type", "n", "sum_value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq(
        ("click", 2L, 3.0), ("error", 1L, 3.0),  // hour 00
        ("click", 1L, 5.0), ("view", 1L, 4.0)))  // hour 01
    } finally q.stop()
  }

  test("sliding rollups place each event in 4 overlapping windows") {
    val dir = Files.createTempDirectory("stream_src3").toString
    Seq((1L, Timestamp.valueOf("2024-01-01 02:30:00"), 1L, "click", 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(dir)
    val q = StreamingIngest.slidingRollups(
        StreamingIngest.readEventStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("slide_test").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("slide_test")
        .orderBy("w_start").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(3)))
      // 1h window / 15min slide → 02:30 event lands in windows starting
      // 01:45, 02:00, 02:15, 02:30
      assert(rows.map(_._1).toSeq == Seq(
        "2024-01-01 01:45:00.0", "2024-01-01 02:00:00.0",
        "2024-01-01 02:15:00.0", "2024-01-01 02:30:00.0"))
      assert(rows.forall(_._2 == 1L))
    } finally q.stop()
  }

  test("statusTransitions emits per-user type changes and keeps state") {
    val dir = Files.createTempDirectory("stream_src2").toString
    writeBatch(dir)
    val events = StreamingIngest.readEventStream(spark, dir)
      .as[StreamingIngest.Event]
    val q = StreamingIngest.statusTransitions(events)
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_test").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("trans_test")
        .orderBy("at_epoch")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      // user 1: click->error at 00:30, error->click at 01:45
      assert(rows == Seq((1L, "click", "error"), (1L, "error", "click")))

      // second batch arrives: state (last=click) persists across batches
      Seq((6L, Timestamp.valueOf("2024-01-01 02:00:00"), 1L, "purchase", 6.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val rows2 = spark.table("trans_test").orderBy("at_epoch")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      assert(rows2.last == (1L, "click", "purchase"))
    } finally q.stop()
  }
}
