package graft.sources

import graft.SparkSpec
import graft.operators.TableManifest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftTableSourceSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def tmp(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_src_$tag").toString

  /** id, k = id % 97 (null every 10th row), payload = "v<id>" */
  private def seed(from: Long, until: Long): DataFrame =
    s.range(from, until).select(col("id"),
      when(col("id") % 10 === 0, lit(null))
        .otherwise(col("id") % 97).as("k"),
      concat(lit("v"), col("id").cast("string")).as("payload"))

  private def files(df: DataFrame): Long = {
    df.queryExecution.toRdd.count() // materialize the adaptive plan
    val plan = df.queryExecution.executedPlan
    (plan +: plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan })
      .flatMap(_.collect { case f: FileSourceScanExec => f })
      .map(_.metrics("numFiles").value).sum
  }

  test("DataFrame write/read roundtrip: overwrite bootstraps, append adds") {
    val p = tmp("rt")
    seed(0, 1000).write.format("graft").mode("overwrite").save(p)
    seed(1000, 1200).write.format("graft").mode("append").save(p)
    val back = s.read.format("graft").load(p)
    assert(back.count() == 1200)
    assert(back.agg(sum(col("id"))).head().getLong(0) ==
      (0L until 1200L).sum)
    // and the connector read equals the library read exactly
    assert(back.exceptAll(TableManifest.read(s, p)).isEmpty)
  }

  test("append alignment: by-name when names match, by-position only on" +
    " fully disjoint names, ERROR on equal-arity partial overlap") {
    val p = tmp("align")
    seed(0, 10).write.format("graft").mode("overwrite").save(p)
    // reordered same-name columns realign by NAME
    seed(10, 12).select("payload", "k", "id")
      .write.format("graft").mode("append").save(p)
    assert(s.read.format("graft").load(p)
      .filter(col("payload") === "v11" && col("id") === 11).count() == 1)
    // fully disjoint names (the INSERT ... VALUES col1..colN shape)
    // realign by POSITION
    seed(12, 13).toDF("col1", "col2", "col3")
      .write.format("graft").mode("append").save(p)
    assert(s.read.format("graft").load(p)
      .filter(col("payload") === "v12" && col("id") === 12).count() == 1)
    // equal arity + PARTIAL overlap is ambiguous: refuse, never coerce —
    // positional would cross-load the renamed column silently
    val partial = seed(13, 14)
      .withColumnRenamed("payload", "renamed_payload")
    val e = intercept[Exception](
      partial.write.format("graft").mode("append").save(p))
    assert(e.getMessage.contains("ambiguous") ||
      Option(e.getCause).exists(_.getMessage.contains("ambiguous")))
    assert(s.read.format("graft").load(p).count() == 13,
      "the refused append must not have landed")
  }

  test("append alignment is case-insensitive like Spark analysis: names" +
    " differing only by case realign by NAME, never by position") {
    // pre-fix: ('ID','PAYLOAD','K') had an EMPTY case-sensitive overlap
    // with ('id','k','payload'), was classified fully-disjoint, and
    // realigned by POSITION — cross-loading payload into k
    val p = tmp("alignci")
    seed(0, 10).write.format("graft").mode("overwrite").save(p)
    seed(10, 11).select(col("payload").as("PAYLOAD"), col("id").as("ID"),
        col("k").as("K"))
      .write.format("graft").mode("append").save(p)
    assert(s.read.format("graft").load(p)
      .filter(col("payload") === "v10" && col("id") === 10).count() == 1,
      "case-divergent names must realign by name")
    // under spark.sql.caseSensitive=true the same shape has NO common
    // names and equal arity → positional (the INSERT ... VALUES rule)
    s.conf.set("spark.sql.caseSensitive", "true")
    try {
      seed(11, 12).select(col("id").as("ID"), col("k").as("K"),
          col("payload").as("PAYLOAD"))
        .write.format("graft").mode("append").save(p)
      assert(s.read.format("graft").load(p)
        .filter(col("payload") === "v11" && col("id") === 11).count() == 1)
    } finally s.conf.set("spark.sql.caseSensitive", "false")
  }

  test("parseSet: escaped and doubled quotes inside literals do not" +
    " split the SET clause") {
    assert(GraftProcedures.parseSet("""v = 'it\'s, fine', k = 2""") ==
      Seq("v" -> """'it\'s, fine'""", "k" -> "2"))
    assert(GraftProcedures.parseSet("v = 'it''s, fine'") ==
      Seq("v" -> "'it''s, fine'"))
    assert(GraftProcedures.parseSet(
      """v = concat(v, '\\', ','), `w,x` = greatest(a, b)""") ==
      Seq("v" -> """concat(v, '\\', ',')""", "w,x" -> "greatest(a, b)"))
  }

  test("SQL DELETE on a timestamp column masks the same rows under ANY" +
    " session time zone (epoch-micros literal rendering)") {
    val p = tmp("tsdel")
    TableManifest.commitSnapshot(
      s.range(48).select(col("id"),
        to_timestamp(lit("2026-01-01 00:00:00"))
          .plus(expr(s"make_interval(0,0,0,0, CAST(id AS INT), 0, 0)"))
          .as("ts")), p)
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    val prevTz = s.conf.get("spark.sql.session.timeZone")
    try {
      // session TZ deliberately different from the JVM default: the old
      // toString rendering shifted which rows the tombstone masked
      val jvmTz = java.util.TimeZone.getDefault.getID
      s.conf.set("spark.sql.session.timeZone",
        if (jvmTz == "Pacific/Kiritimati") "Etc/GMT+12"
        else "Pacific/Kiritimati")
      val cutMicros = s.read.format("graft").load(p)
        .filter(col("id") === 24)
        .select(unix_micros(col("ts"))).head().getLong(0)
      s.sql(s"DELETE FROM graft.`$p` " +
        s"WHERE ts >= timestamp_micros(${cutMicros}L)")
      val left = s.read.format("graft").load(p)
      assert(left.count() == 24,
        "exactly the first 24 hourly rows must survive")
      assert(left.agg(max(col("id"))).head().getLong(0) == 23)
    } finally s.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("pushdown is exact: filtered connector reads equal read-then-filter," +
    " including null semantics, and the plan shows the pushed filters") {
    val p = tmp("push")
    seed(0, 2000).write.format("graft").mode("overwrite").save(p)
    val preds = Seq(
      col("k") === 5,
      col("k").isNull,
      !(col("k") === 5), // null k rows must NOT match (SQL three-valued)
      col("payload").startsWith("v19") && col("id") >= 100,
      col("k").isin(1L, 2L, 3L) || col("id") < 7)
    preds.foreach { pred =>
      val got = s.read.format("graft").load(p).filter(pred)
        .select(col("id"), col("k"))
      val want = TableManifest.read(s, p).filter(pred)
        .select(col("id"), col("k"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"pushdown changed results for $pred")
    }
    val planned = s.read.format("graft").load(p)
      .filter(col("k") === 5).queryExecution.executedPlan.toString
    assert(planned.contains("PushedFilters") || planned.contains("pushed="),
      s"pushed filters not visible in plan:\n$planned")
  }

  test("range predicates route through the zone-map path and prune the" +
    " inner scan's files") {
    val p = tmp("zone")
    // 8 id-disjoint batches of 1000, zone-mapped on id
    TableManifest.commitSnapshot(seed(0, 1000), p)
    (1 to 7).foreach(b => TableManifest.append(seed(b * 1000L, b * 1000L + 1000L), p))
    TableManifest.refreshZoneMaps(s, p, Seq("id"))
    val q = s.read.format("graft").load(p)
      .filter(col("id") >= 3100 && col("id") <= 3200)
    assert(q.count() == 101)
    assert(GraftTableSource.lastPruning.get().startsWith("zone-range:id"),
      s"route was ${GraftTableSource.lastPruning.get()}")
    // the pruned inner plan reads ~1/8th of the files the full read does
    val all = files(GraftTableSource.plan(s, p, None, None, Nil, None))
    val pruned = files(GraftTableSource.plan(s, p, None, None,
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("id", 3100L),
        org.apache.spark.sql.sources.LessThanOrEqual("id", 3200L)),
      None))
    assert(pruned * 4 <= all, s"zone pruning ineffective: $pruned vs $all")
  }

  test("point predicates route through the Bloom path once filters exist") {
    val p = tmp("bloom")
    TableManifest.commitSnapshot(seed(0, 1000), p)
    (1 to 3).foreach(b => TableManifest.append(seed(b * 1000L, b * 1000L + 1000L), p))
    TableManifest.refreshBloomFilters(s, p, Seq("id", "payload"),
      expectedPerBatch = 1000L)
    val got = s.read.format("graft").load(p).filter(col("id") === 2345L)
    assert(got.count() == 1)
    assert(GraftTableSource.lastPruning.get() == "bloom-point:id")
    val str = s.read.format("graft").load(p)
      .filter(col("payload") === "v1717").select(col("id"))
    assert(str.head().getLong(0) == 1717L)
    assert(GraftTableSource.lastPruning.get() == "bloom-point:payload")
  }

  test("planning-time statistics come from metadata: exact rowCount from" +
    " the zone-stats artifact, payload bytes as sizeInBytes, and a small" +
    " graft table broadcasts without hints on the v1 surface") {
    val p = tmp("stats")
    TableManifest.commitSnapshot(seed(0, 5000), p)
    TableManifest.refreshZoneMaps(s, p, Seq("id"))
    // the v2 scan reports exact metadata stats (consumed once Spark's
    // V1ScanWrapper forwards SupportsReportStatistics — see connector doc)
    val scan = new GraftScanBuilder(p, None, None,
      TableManifest.read(s, p).schema).build()
      .asInstanceOf[GraftScan]
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong == 5000L)
    assert(st.sizeInBytes().getAsLong ==
      TableManifest.payloadBytes(s, p).get)
    // the v1 relation feeds LogicalRelation stats TODAY: joining the
    // small graft table against a big frame must pick a broadcast join
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW gts_dim USING graft OPTIONS (path '$p')")
    val joined = s.range(500000).toDF("id")
      .join(s.table("gts_dim"), "id")
    val phys = joined.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"small graft table did not broadcast:\n$phys")
    assert(joined.count() == 5000)
  }

  test("SQL surface: CREATE TABLE USING graft, INSERT INTO appends by" +
    " position with coercion, INSERT OVERWRITE replaces") {
    val p = tmp("sql")
    seed(0, 100).write.format("graft").mode("overwrite").save(p)
    s.sql("DROP TABLE IF EXISTS gts_sql")
    s.sql(s"CREATE TABLE gts_sql USING graft OPTIONS (path '$p')")
    try {
      assert(s.sql("SELECT count(*) FROM gts_sql").head().getLong(0) == 100)
      s.sql("INSERT INTO gts_sql VALUES (1000, 13, 'v1000'), (1001, NULL, 'v1001')")
      assert(s.sql("SELECT count(*) FROM gts_sql").head().getLong(0) == 102)
      assert(s.sql("SELECT k FROM gts_sql WHERE id = 1000").head().getLong(0) == 13L)
      s.sql("INSERT OVERWRITE gts_sql SELECT id, id % 5, 'w' FROM range(10)")
      assert(s.sql("SELECT count(*), sum(id) FROM gts_sql").head()
        .getLong(0) == 10)
    } finally s.sql("DROP TABLE IF EXISTS gts_sql")
  }

  test("CREATE TEMPORARY VIEW USING graft serves the v1 relation with" +
    " handled pushdown") {
    val p = tmp("view")
    seed(0, 3000).write.format("graft").mode("overwrite").save(p)
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW gts_v USING graft OPTIONS (path '$p')")
    val out = s.sql(
      "SELECT k, count(*) AS n FROM gts_v WHERE id >= 100 AND id < 200 GROUP BY k")
    val want = TableManifest.read(s, p)
      .filter(col("id") >= 100 && col("id") < 200)
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    assert(out.exceptAll(want).isEmpty && want.exceptAll(out).isEmpty)
    val planned = out.queryExecution.executedPlan.toString
    assert(planned.contains("PushedFilters"),
      s"v1 relation pushdown not visible:\n$planned")
  }

  test("versionAsOf serves the pinned state; the plain read serves the" +
    " current one") {
    val p = tmp("tt")
    val v0 = TableManifest.commitSnapshot(seed(0, 500), p)
    TableManifest.append(seed(500, 800), p)
    val pinned = s.read.format("graft")
      .option("versionAsOf", v0.toString).load(p)
    assert(pinned.count() == 500)
    assert(s.read.format("graft").load(p).count() == 800)
  }

  test("option(mergeSchema) serves evolved tables as the union schema" +
    " with null-padded history — through load(), temp views, and the" +
    " pruned read paths") {
    val p = tmp("evolve")
    TableManifest.commitSnapshot(
      s.range(100).select(col("id"), (col("id") % 5).as("k")), p)
    // the append EVOLVED the schema: a new column the snapshot lacks
    TableManifest.append(
      s.range(100, 150).select(col("id"), (col("id") % 5).as("k"),
        concat(lit("t"), col("id").cast("string")).as("tag")), p)
    val merged = s.read.format("graft")
      .option("mergeSchema", "true").load(p)
    assert(merged.columns.toSeq == Seq("id", "k", "tag"))
    assert(merged.count() == 150)
    assert(merged.filter(col("tag").isNull).count() == 100) // null-padded
    assert(merged.filter(col("tag") === "t120").select(col("id"))
      .head().getLong(0) == 120L)
    // the evolved column filters exactly through the pushdown path too
    val viaView = {
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW gts_ev USING graft " +
        s"OPTIONS (path '$p', mergeSchema 'true')")
      s.sql("SELECT count(*) AS n FROM gts_ev WHERE tag IS NULL")
        .head().getLong(0)
    }
    assert(viaView == 100)
  }

  test("save modes: default ErrorIfExists refuses an existing table," +
    " Ignore no-ops, positional-drift appends realign by name") {
    val p = tmp("modes")
    seed(0, 50).write.format("graft").mode("overwrite").save(p)
    intercept[Exception] {
      seed(0, 10).write.format("graft").save(p) // default = ErrorIfExists
    }
    seed(0, 10).write.format("graft").mode("ignore").save(p)
    assert(s.read.format("graft").load(p).count() == 50)
    // same column SET, different order: must land in the right columns
    seed(50, 60).select(col("payload"), col("k"), col("id"))
      .write.format("graft").mode("append").save(p)
    val back = s.read.format("graft").load(p)
    assert(back.count() == 60)
    assert(back.filter(col("id") === 55L).select(col("payload"))
      .head().getString(0) == "v55")
  }
}
