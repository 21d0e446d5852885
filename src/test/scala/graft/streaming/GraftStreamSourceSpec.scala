package graft.streaming

import graft.SparkSpec
import graft.operators.TableManifest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftStreamSourceSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def tmp(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_stream_$tag").toString

  private def seed(from: Long, until: Long): DataFrame =
    s.range(from, until).select(col("id"), (col("id") % 7).as("k"))

  test("initial snapshot then follow: appends arrive exactly once, and a" +
    " stream that fell behind catches up in one batch") {
    val p = tmp("follow")
    TableManifest.commitSnapshot(seed(0, 100), p)
    val q = s.readStream.format("graft").load(p)
      .writeStream.format("memory").queryName("gss_follow")
      .option("checkpointLocation", tmp("follow_ck")).start()
    try {
      q.processAllAvailable()
      assert(s.table("gss_follow").count() == 100) // the v0 snapshot
      TableManifest.append(seed(100, 150), p)
      q.processAllAvailable()
      assert(s.table("gss_follow").count() == 150)
      // two commits between polls: one catch-up batch, no duplicates
      TableManifest.append(seed(150, 180), p)
      TableManifest.append(seed(180, 200), p)
      q.processAllAvailable()
      val got = s.table("gss_follow")
      assert(got.count() == 200)
      assert(got.select(col("id")).distinct().count() == 200)
      assert(got.agg(sum(col("id"))).head().getLong(0) ==
        (0L until 200L).sum)
    } finally q.stop()
  }

  test("restart from the checkpoint resumes at the committed offset:" +
    " pre-restart rows never replay, post-restart appends arrive") {
    val p = tmp("restart")
    val ck = tmp("restart_ck")
    TableManifest.commitSnapshot(seed(0, 60), p)
    // an idempotent batch-keyed collector (the memory sink refuses
    // checkpoint recovery): a replayed batchId overwrites itself, so the
    // union is exactly-once by construction — the TableManifest.append
    // keyed-replay contract in miniature
    val batches = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]
    def start() = s.readStream.format("graft").load(p)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (df: DataFrame, id: Long) =>
        batches.put(id, df.select(col("id")).collect().map(_.getLong(0)).toSeq)
        ()
      }.start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      val ids1 = { import scala.jdk.CollectionConverters._
        batches.values.asScala.flatten.toSeq }
      assert(ids1.length == 60 && ids1.distinct.length == 60)
    } finally q1.stop()
    // appends while the stream is DOWN, then restart from the checkpoint
    TableManifest.append(seed(60, 90), p)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val ids = { import scala.jdk.CollectionConverters._
        batches.values.asScala.flatten.toSeq }
      // the restarted query served exactly the missed window: union is
      // the full table, nothing from before the checkpoint replayed
      assert(ids.length == 90 && ids.distinct.length == 90)
      assert(ids.sum == (0L until 90L).sum)
    } finally q2.stop()
  }

  test("startingVersion tails new data only; changeFeed surfaces MoR" +
    " deletes as _change_type rows") {
    val p = tmp("tail")
    val v0 = TableManifest.commitSnapshot(seed(0, 40), p)
    val q = s.readStream.format("graft")
      .option("startingVersion", v0.toString)
      .option("changeFeed", "true").load(p)
      .writeStream.format("memory").queryName("gss_tail")
      .option("checkpointLocation", tmp("tail_ck")).start()
    try {
      q.processAllAvailable()
      assert(s.table("gss_tail").count() == 0) // no snapshot when tailing
      TableManifest.append(seed(40, 50), p)
      TableManifest.deleteWhere(s, p, "id < 5")
      q.processAllAvailable()
      val got = s.table("gss_tail")
      assert(got.filter(col("_change_type") === "insert").count() == 10)
      val dels = got.filter(col("_change_type") === "delete")
      assert(dels.count() == 5)
      assert(dels.agg(max(col("id"))).head().getLong(0) == 4L)
    } finally q.stop()
  }

  test("changeFeed surfaces a MoR UPDATE as delete(old) + insert(new);" +
    " the default feed carries only the replacement rows") {
    val p = tmp("updfeed")
    val v0 = TableManifest.commitSnapshot(seed(0, 30), p)
    val cdc = s.readStream.format("graft")
      .option("startingVersion", v0.toString)
      .option("changeFeed", "true").load(p)
      .writeStream.format("memory").queryName("gss_updcdc")
      .option("checkpointLocation", tmp("updcdc_ck")).start()
    val ins = s.readStream.format("graft")
      .option("startingVersion", v0.toString).load(p)
      .writeStream.format("memory").queryName("gss_updins")
      .option("checkpointLocation", tmp("updins_ck")).start()
    try {
      cdc.processAllAvailable(); ins.processAllAvailable()
      TableManifest.updateWhere(s, p, "id < 10", Seq("k" -> "k + 100"))
      cdc.processAllAvailable(); ins.processAllAvailable()
      val feed = s.table("gss_updcdc")
      val dels = feed.filter(col("_change_type") === "delete")
      val inss = feed.filter(col("_change_type") === "insert")
      assert(dels.count() == 10 &&
        dels.agg(max(col("k"))).head().getLong(0) < 100,
        "the feed's delete rows must carry the PRE-update values")
      assert(inss.count() == 10 &&
        inss.agg(min(col("k"))).head().getLong(0) >= 100,
        "the feed's insert rows must carry the POST-update values")
      // default insert-only stream: just the 10 replacement rows
      val plain = s.table("gss_updins")
      assert(plain.count() == 10 &&
        plain.agg(min(col("k"))).head().getLong(0) >= 100)
    } finally { cdc.stop(); ins.stop() }
  }

  test("changeFeed surfaces a MoR MERGE as delete(old) + insert(" +
    "post-images and fresh rows) — the streaming consumer follows the " +
    "equality-tombstone commit exactly") {
    val p = tmp("mrgfeed")
    val v0 = TableManifest.commitSnapshot(seed(0, 30), p)
    val q = s.readStream.format("graft")
      .option("startingVersion", v0.toString)
      .option("changeFeed", "true").load(p)
      .writeStream.format("memory").queryName("gss_mrgcdc")
      .option("checkpointLocation", tmp("mrgcdc_ck")).start()
    try {
      q.processAllAvailable()
      // matched keys 0..4 update (k += 100), keys 1000..1002 insert
      TableManifest.mergeWhere(s, p,
        s.range(5).select(col("id"), lit(0L).as("k"))
          .unionByName(s.range(1000, 1003)
            .select(col("id"), lit(9L).as("k"))),
        keyCols = Seq("id"),
        matched = Seq(TableManifest.MergeMatched("update", None,
          Some(Seq("k" -> "__t.k + 100")))),
        inserts = Seq(TableManifest.MergeInsert(None)))
      q.processAllAvailable()
      val feed = s.table("gss_mrgcdc")
      val dels = feed.filter(col("_change_type") === "delete")
      val inss = feed.filter(col("_change_type") === "insert")
      assert(dels.count() == 5 &&
        dels.agg(max(col("k"))).head().getLong(0) < 100,
        "delete rows must carry the PRE-merge images of the acted keys")
      assert(inss.count() == 8, s"post-images + inserts: ${inss.count()}")
      assert(inss.filter(col("id") < 100).count() == 5 &&
        inss.filter(col("id") < 100)
          .agg(min(col("k"))).head().getLong(0) >= 100)
      assert(inss.filter(col("id") >= 1000).count() == 3)
    } finally q.stop()
  }

  test("startingVersion accepts a named TAG — the vacuum-protected " +
    "consumer checkpoint — and timestamp-addressed CDF reader windows " +
    "resolve via marker commit times") {
    val p = tmp("tagstart")
    TableManifest.commitSnapshot(seed(0, 20), p)
    TableManifest.tag(s, p, "ckpt")
    val q = s.readStream.format("graft")
      .option("startingVersion", "ckpt").load(p)
      .writeStream.format("memory").queryName("gss_tagstart")
      .option("checkpointLocation", tmp("tagstart_ck")).start()
    try {
      q.processAllAvailable()
      assert(s.table("gss_tagstart").count() == 0, "tail from the tag")
      TableManifest.append(seed(20, 25), p)
      q.processAllAvailable()
      assert(s.table("gss_tagstart").count() == 5)
    } finally q.stop()
    // batch CDF reader: startingTimestamp between two commits serves
    // exactly the later window
    Thread.sleep(1200)
    val mid = java.sql.Timestamp.from(java.time.Instant.now())
    Thread.sleep(1200)
    TableManifest.append(seed(25, 31), p)
    val feed = s.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", mid.toString).load(p)
    assert(feed.count() == 6 &&
      feed.filter(col("_change_type") === "insert").count() == 6,
      "the timestamp-addressed window must carry only the later append")
  }

  test("Update-mode sink with mergeKeys: per-key upserts through the " +
    "MoR merge — the final table equals the batch aggregate") {
    val src = tmp("updsink_src")
    val dst = tmp("updsink_dst")
    TableManifest.commitSnapshot(seed(0, 21), src)
    val q = s.readStream.format("graft").load(src)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("sid"))
      .writeStream.format("graft").outputMode("update")
      .option("mergeKeys", "k")
      .option("checkpointLocation", tmp("updsink_ck"))
      .start(dst)
    try {
      q.processAllAvailable()
      TableManifest.append(seed(21, 40), src)
      q.processAllAvailable()
      val got = TableManifest.read(s, dst)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      val want = (0L until 40L).groupBy(_ % 7).toSeq.map { case (k, ids) =>
        (k, ids.size.toLong, ids.sum) }.sortBy(_._1)
      assert(got == want, s"update-mode upsert state: $got")
      // the sink committed MoR merges, not snapshot rewrites: exactly
      // one data_v payload dir (the seed), everything else batches
      val hp = new org.apache.hadoop.fs.Path(dst)
      val dirs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .listStatus(hp).map(_.getPath.getName)
        .count(_.startsWith("data_v"))
      assert(dirs == 1, s"update-mode sink must stay MoR: $dirs payloads")
    } finally q.stop()
    // Update without mergeKeys keeps the guidance refusal
    intercept[Exception] {
      s.readStream.format("graft").load(src)
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .writeStream.format("graft").outputMode("update")
        .option("checkpointLocation", tmp("updsink_ck2"))
        .start(tmp("updsink_dst2"))
    }
  }

  test("a mid-stream compaction emits nothing (content no-op) and the " +
    "stream keeps following appends across the new payload") {
    val p = tmp("compactfollow")
    TableManifest.commitSnapshot(seed(0, 50), p)
    val q = s.readStream.format("graft").load(p)
      .writeStream.format("memory").queryName("gss_compact")
      .option("checkpointLocation", tmp("compact_ck")).start()
    try {
      q.processAllAvailable()
      assert(s.table("gss_compact").count() == 50)
      TableManifest.append(seed(50, 60), p)
      TableManifest.deleteWhere(s, p, "id < 5")
      TableManifest.compactBatches(s, p) // fold: rows unchanged as a set
      q.processAllAvailable()
      val got = s.table("gss_compact")
      // the insert-only feed saw the 10 appended rows once; the fold
      // added nothing (its diff vs the pre-fold state is empty)
      assert(got.count() == 60,
        s"fold must not re-emit or duplicate rows: ${got.count()}")
      assert(got.select(col("id")).distinct().count() == 60)
      // and the stream keeps following appends into the NEW payload
      TableManifest.append(seed(60, 70), p)
      q.processAllAvailable()
      assert(s.table("gss_compact").count() == 70)
    } finally q.stop()
  }

  test("sink: append mode lands micro-batches as keyed manifest appends," +
    " exactly-once through a checkpoint restart") {
    val src = tmp("sink_src")
    val dst = tmp("sink_dst")
    val ck = tmp("sink_ck")
    TableManifest.commitSnapshot(seed(0, 50), src)
    def start() = s.readStream.format("graft").load(src)
      .writeStream.format("graft").option("path", dst)
      .option("checkpointLocation", ck).start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(TableManifest.read(s, dst).count() == 50)
    } finally q1.stop()
    TableManifest.append(seed(50, 80), src)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = TableManifest.read(s, dst)
      assert(got.count() == 80)
      assert(got.select(col("id")).distinct().count() == 80)
    } finally q2.stop()
    // table -> stream -> table round trip is content-identical
    assert(TableManifest.read(s, dst)
      .exceptAll(TableManifest.read(s, src)).isEmpty)
  }

  test("sink: CHECK constraints gate streaming micro-batches — a " +
    "violating batch fails the query with nothing committed, a clean " +
    "restart after the fix drains") {
    import graft.operators.TableManifest.TableConstraint
    val src = tmp("ksink_src")
    val dst = tmp("ksink_dst")
    TableManifest.commitSnapshot(seed(0, 30), src)
    TableManifest.commitSnapshot(seed(0, 0), dst) // empty target
    TableManifest.setConstraints(s, dst, Seq(
      TableConstraint("id_small", "id < 100", true, false, "VALID")))
    // clean data drains through the constrained sink
    val q1 = s.readStream.format("graft").load(src)
      .writeStream.format("graft").option("path", dst)
      .option("checkpointLocation", tmp("ksink_ck1")).start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(TableManifest.read(s, dst).count() == 30)
    // a violating append arrives upstream: the micro-batch FAILS and
    // commits nothing downstream (enforcement sits in the append
    // funnel the sink lands through)
    TableManifest.append(seed(500, 510), src)
    val q2 = s.readStream.format("graft").load(src)
      .writeStream.format("graft").option("path", dst)
      .option("checkpointLocation", tmp("ksink_ck2")).start()
    val failed =
      try { q2.processAllAvailable(); false }
      catch { case scala.util.control.NonFatal(_) => true }
      finally q2.stop()
    assert(failed, "a violating micro-batch must fail the query")
    assert(TableManifest.read(s, dst)
      .filter(col("id") >= 100).count() == 0,
      "nothing from the violating batch may land")
  }

  test("sink: complete mode replaces the table with each emission — the" +
    " aggregate-refresh shape, served back by any reader") {
    val src = tmp("csink_src")
    val dst = tmp("csink_dst")
    TableManifest.commitSnapshot(seed(0, 40), src)
    val q = s.readStream.format("graft").load(src)
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("graft").option("path", dst)
      .option("checkpointLocation", tmp("csink_ck")).start()
    try {
      q.processAllAvailable()
      TableManifest.append(seed(40, 100), src)
      q.processAllAvailable()
      val agg = TableManifest.read(s, dst)
      assert(agg.agg(sum(col("n"))).head().getLong(0) == 100L)
      // the standing table is the LATEST aggregate, not an append log
      assert(agg.count() == 7)
    } finally q.stop()
    // update mode has no manifest commit shape
    intercept[Exception] {
      s.readStream.format("graft").load(src)
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .writeStream.outputMode("update")
        .format("graft").option("path", tmp("usink"))
        .option("checkpointLocation", tmp("usink_ck")).start()
    }
  }

  test("schema evolution: a mergeSchema stream declares the union and" +
    " null-pads old history; a mid-stream evolved append cannot kill a" +
    " running stream (new columns stay invisible until restart)") {
    val p = tmp("evolve")
    TableManifest.commitSnapshot(seed(0, 20), p) // (id, k)
    TableManifest.append(
      s.range(20, 30).select(col("id"), (col("id") % 7).as("k"),
        concat(lit("t"), col("id").cast("string")).as("tag")), p)
    // union-declared stream: old rows null-pad tag
    val q = s.readStream.format("graft")
      .option("mergeSchema", "true").load(p)
      .writeStream.format("memory").queryName("gss_ev")
      .option("checkpointLocation", tmp("ev_ck")).start()
    try {
      q.processAllAvailable()
      val got = s.table("gss_ev")
      assert(got.columns.toSeq == Seq("id", "k", "tag"))
      assert(got.count() == 30)
      assert(got.filter(col("tag").isNull).count() == 20)
      // an append that evolves FURTHER mid-stream serves the declared
      // columns; the extra column is invisible, the stream stays alive
      TableManifest.append(
        s.range(30, 35).select(col("id"), (col("id") % 7).as("k"),
          concat(lit("t"), col("id").cast("string")).as("tag"),
          lit(1.5).as("extra")), p)
      q.processAllAvailable()
      assert(s.table("gss_ev").count() == 35)
      assert(s.table("gss_ev").filter(col("tag") === "t32").count() == 1)
    } finally q.stop()
  }

  test("the default insert feed drops delete rows (append-stream" +
    " contract) and keeps serving later appends") {
    val p = tmp("ins")
    TableManifest.commitSnapshot(seed(0, 30), p)
    val q = s.readStream.format("graft").load(p)
      .writeStream.format("memory").queryName("gss_ins")
      .option("checkpointLocation", tmp("ins_ck")).start()
    try {
      q.processAllAvailable()
      TableManifest.deleteWhere(s, p, "id >= 20")
      TableManifest.append(seed(30, 35), p)
      q.processAllAvailable()
      // 30 snapshot + 5 appended; the 10 deletes never enter the feed
      assert(s.table("gss_ins").count() == 35)
    } finally q.stop()
  }

  test("Update-mode sink: a NULL-valued merge key is one more group — " +
    "it REPLACES its previous emission (null-safe upsert) instead of " +
    "re-inserting every micro-batch") {
    val src = tmp("nullkey_src")
    val dst = tmp("nullkey_dst")
    // nullable grouping column: ids divisible by 5 fall in the NULL group
    def rows(from: Long, until: Long): DataFrame =
      s.range(from, until).select(col("id"),
        when(col("id") % 5 === 0, lit(null).cast("long"))
          .otherwise(col("id") % 3).as("k"))
    TableManifest.commitSnapshot(rows(0, 20), src)
    val q = s.readStream.format("graft").load(src)
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .writeStream.format("graft").outputMode("update")
      .option("mergeKeys", "k")
      .option("checkpointLocation", tmp("nullkey_ck"))
      .start(dst)
    try {
      q.processAllAvailable()
      TableManifest.append(rows(20, 40), src)
      q.processAllAvailable()
      TableManifest.append(rows(40, 60), src)
      q.processAllAvailable()
      val got = TableManifest.read(s, dst).collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          r.getLong(1))).sortBy(_._1).toSeq
      val want = (0L until 60L)
        .groupBy(i => if (i % 5 == 0) -1L else i % 3)
        .toSeq.map { case (k, is) => (k, is.size.toLong) }.sortBy(_._1)
      assert(got == want,
        s"the NULL-key group must upsert, not accumulate: $got vs $want")
    } finally q.stop()
  }

  test("sink in-band maintenance: maintainEvery folds the Update-mode " +
    "MoR chain and vacuumRetain bounds the version count — an " +
    "unattended stream no longer degrades its own table") {
    def mkSrc(tag: String): String = {
      val p = tmp(s"maint_src_$tag")
      TableManifest.commitSnapshot(seed(0, 21), p)
      p
    }
    def drive(src: String, dst: String,
        opts: Seq[(String, String)]): Unit = {
      var w = s.readStream.format("graft").load(src)
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .writeStream.format("graft").outputMode("update")
        .option("mergeKeys", "k")
        .option("checkpointLocation", tmp(s"maint_ck_${dst.hashCode}"))
      opts.foreach { case (k2, v2) => w = w.option(k2, v2) }
      val q = w.start(dst)
      try {
        q.processAllAvailable()
        (1 to 24).foreach { i =>
          TableManifest.append(seed(20L + i, 21L + i), src)
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    val (un, mt) = (tmp("maint_un"), tmp("maint_mt"))
    drive(mkSrc("un"), un, Nil)
    drive(mkSrc("mt"), mt, Seq("maintainEvery" -> "8",
      "maintainMaxBatches" -> "6", "maintainMaxDeletes" -> "4",
      "vacuumRetain" -> "1"))
    // identical served content either way (the batch aggregate)
    def state(p: String) = TableManifest.read(s, p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val want = (0L until 45L).groupBy(_ % 7).toSeq
      .map { case (k, is) => (k, is.size.toLong) }.sortBy(_._1)
    assert(state(un) == want && state(mt) == want)
    // the unmaintained sink accrued one MoR segment per matched batch;
    // the maintained one folded its chain and expired old versions
    assert(TableManifest.pendingDeletes(s, un) >= 15,
      s"unmaintained chain: ${TableManifest.pendingDeletes(s, un)}")
    assert(TableManifest.pendingDeletes(s, mt) <= 8,
      s"maintained chain must stay bounded: " +
        s"${TableManifest.pendingDeletes(s, mt)}")
    assert(TableManifest.versions(s, mt).size <
      TableManifest.versions(s, un).size / 2,
      s"vacuumRetain must bound versions: ${TableManifest.versions(s, mt)
        .size} vs ${TableManifest.versions(s, un).size}")
  }

  test("crash between a completed in-band fold and the offset commit: " +
    "restart replays the micro-batch exactly-once — no lost upsert, " +
    "no double-apply, the fold never corrupts the replay") {
    // the kill window task: addBatch (merge + maintainEvery fold) ran
    // to completion, the engine died BEFORE writing commits/<N>. The
    // checkpoint then holds offsets/<N> without commits/<N>, which is
    // exactly the state deleting the newest commit file reproduces —
    // restart re-executes batch N against the same immutable version
    // window, and the sink's content-idempotent merge plus the fold's
    // content-neutrality must leave the served table EXACTLY the batch
    // aggregate (the no-crash content), not a double-applied one.
    val src = tmp("crash_src")
    val dst = tmp("crash_dst")
    val ck = tmp("crash_ck")
    // the per-JVM HDFSMetadataLog cache still remembers the commit
    // record this test deletes (a REAL crash loses the JVM and the
    // cache with it) — disable it so the restart sees the disk truth
    s.conf.set("spark.sql.streaming.metadataCache.enabled", "false")
    TableManifest.commitSnapshot(seed(0, 21), src)
    def start() = s.readStream.format("graft").load(src)
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .writeStream.format("graft").outputMode("update")
      .option("mergeKeys", "k")
      .option("maintainEvery", "2")
      .option("maintainMaxBatches", "2")
      .option("maintainMaxDeletes", "2")
      .option("checkpointLocation", ck)
      .start(dst)
    val q1 = start()
    try {
      q1.processAllAvailable()
      (1 to 6).foreach { i =>
        TableManifest.append(seed(20L + i, 21L + i), src)
        q1.processAllAvailable()
      }
    } finally q1.stop()
    def state() = TableManifest.read(s, dst).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val beforeCrash = state()
    // rewind: drop the newest commit record (maintainEvery=2 means the
    // replayed batch is one whose addBatch ran an in-band fold for at
    // least one of the rewound runs)
    val ckDir = new java.io.File(s"$ck/commits")
    val newest = ckDir.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(newest.delete(), s"could not rewind $newest")
    // the local filesystem's checksum sidecar goes with it (a real
    // crash never wrote either)
    new java.io.File(ckDir, s".${newest.getName}.crc").delete()
    val q2 = start()
    try {
      q2.processAllAvailable() // replays the rewound micro-batch
      assert(state() == beforeCrash,
        "replaying the crashed micro-batch must reproduce the exact " +
          s"pre-crash content: ${state()} vs $beforeCrash")
      // and the stream keeps going: new appends land exactly once
      TableManifest.append(seed(27, 30), src)
      q2.processAllAvailable()
    } finally {
      q2.stop()
      s.conf.unset("spark.sql.streaming.metadataCache.enabled")
    }
    val want = (0L until 30L).groupBy(_ % 7).toSeq
      .map { case (k, is) => (k, is.size.toLong) }.sortBy(_._1)
    assert(state() == want,
      s"post-recovery content diverged: ${state()} vs $want")
    // the replay added at most a merge commit and one maintenance
    // fold — the MoR chain stays bounded (no runaway double-fold)
    assert(TableManifest.pendingDeletes(s, dst) <= 4,
      s"chain after recovery: ${TableManifest.pendingDeletes(s, dst)}")
  }
}
