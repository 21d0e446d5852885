package graft.sources

import graft.SparkSpec
import graft.operators.TableManifest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftCatalogSpec extends AnyFunSuite {
  private lazy val s = {
    val session = SparkSpec.session
    session.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    session
  }

  private def tmp(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_cat_$tag").toString

  test("paths are identifiers: SELECT and INSERT INTO through the" +
    " catalog, existence resolved against the manifest alone") {
    val p = tmp("sel")
    TableManifest.commitSnapshot(
      s.range(100).select(col("id"), (col("id") % 5).as("k")), p)
    assert(s.sql(s"SELECT count(*) AS n FROM graft.`$p`")
      .head().getLong(0) == 100)
    s.sql(s"INSERT INTO graft.`$p` VALUES (1000, 0), (1001, 1)")
    assert(s.sql(s"SELECT count(*) AS n FROM graft.`$p`")
      .head().getLong(0) == 102)
    assert(s.sql(s"SELECT k FROM graft.`$p` WHERE id = 1001")
      .head().getLong(0) == 1L)
    // a path with no manifest is NoSuchTable, not an empty table
    intercept[Exception](s.sql(s"SELECT * FROM graft.`${tmp("none")}`")
      .collect())
  }

  test("native VERSION AS OF syntax serves pinned states; a vacuumed or" +
    " uncommitted version is refused with the retained list") {
    val p = tmp("tt")
    val v0 = TableManifest.commitSnapshot(
      s.range(50).select(col("id"), (col("id") % 5).as("k")), p)
    TableManifest.append(
      s.range(50, 80).select(col("id"), (col("id") % 5).as("k")), p)
    assert(s.sql(s"SELECT count(*) AS n FROM graft.`$p` VERSION AS OF $v0")
      .head().getLong(0) == 50)
    assert(s.sql(s"SELECT count(*) AS n FROM graft.`$p`")
      .head().getLong(0) == 80)
    val e = intercept[Exception](
      s.sql(s"SELECT * FROM graft.`$p` VERSION AS OF 999").collect())
    assert(e.getMessage.contains("never committed") ||
      e.getMessage.contains("999"))
  }

  test("TIMESTAMP AS OF resolves to the newest commit at-or-before the" +
    " instant (marker mtimes); pre-table instants are refused") {
    val p = tmp("ts")
    TableManifest.commitSnapshot(
      s.range(30).select(col("id"), (col("id") % 5).as("k")), p)
    Thread.sleep(1200)
    val between = java.sql.Timestamp.from(java.time.Instant.now())
    Thread.sleep(1200)
    TableManifest.append(
      s.range(30, 50).select(col("id"), (col("id") % 5).as("k")), p)
    assert(s.sql(s"SELECT count(*) FROM graft.`$p` " +
      s"TIMESTAMP AS OF '$between'").head().getLong(0) == 30)
    // after the append, "now" sees everything
    val now = java.sql.Timestamp.from(java.time.Instant.now())
    assert(s.sql(s"SELECT count(*) FROM graft.`$p` " +
      s"TIMESTAMP AS OF '$now'").head().getLong(0) == 50)
    // an instant before the table existed points at VERSION AS OF
    val e = intercept[Exception](s.sql(s"SELECT * FROM graft.`$p` " +
      "TIMESTAMP AS OF '2001-01-01 00:00:00'").collect())
    assert(e.getMessage.contains("VERSION AS OF"))
  }

  test("SQL DELETE FROM lands as ONE MoR predicate tombstone, never a" +
    " rewrite; unrenderable predicates are refused at analysis") {
    val p = tmp("del")
    TableManifest.commitSnapshot(
      s.range(100).select(col("id"), (col("id") % 5).as("k"),
        concat(lit("s"), col("id").cast("string")).as("tag")), p)
    s.sql(s"DELETE FROM graft.`$p` WHERE k = 3 AND id >= 50")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0) == 90)
    assert(TableManifest.pendingDeletes(s, p) == 1) // a segment, not CoW
    // string literals round-trip through the predicate-SQL rendering
    s.sql(s"DELETE FROM graft.`$p` WHERE tag = 's7'")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0) == 89)
    // predicates BEYOND the DSv2 Filter vocabulary work too: the
    // analyzer rule renders the full expression into the tombstone
    // (this exact modulo shape used to refuse under pushdown-only)
    s.sql(s"DELETE FROM graft.`$p` WHERE id % 7 = 0 AND id < 20")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0) ==
      87, "modulo predicates must delete exactly (0 and 14; 7 was gone)")
    // unrenderable predicates (non-deterministic, subqueries) refuse —
    // never under- or over-delete
    intercept[Exception](
      s.sql(s"DELETE FROM graft.`$p` WHERE rand() < 0.5"))
    intercept[Exception](s.sql(s"DELETE FROM graft.`$p` WHERE id IN " +
      s"(SELECT id FROM graft.`$p` WHERE k = 1)"))
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0) == 87)
  }

  test("CALL graft.update: SQL UPDATE as one MoR commit — assignments " +
    "see the pre-update row, no-match commits nothing") {
    val p = tmp("upd")
    TableManifest.commitSnapshot(
      s.range(100).select(col("id"), (col("id") % 5).as("k"),
        lit(0L).as("hits")), p)
    val r = s.sql(s"CALL graft.update(path => '$p', " +
      "set => 'hits = hits + id, k = k * 10', " +
      "where => 'k = 3')").head()
    assert(r.getLong(1) == 20, s"rows_updated: ${r.getLong(1)}")
    assert(TableManifest.pendingDeletes(s, p) == 1) // a tombstone, not CoW
    val updated = s.sql(
      s"SELECT count(*) FROM graft.`$p` WHERE k = 30 AND hits = id")
      .head().getLong(0)
    assert(updated == 20)
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 100, "UPDATE must never change the row count")
    // top-level commas inside function calls stay inside the assignment
    s.sql(s"CALL graft.update(path => '$p', " +
      "set => 'hits = greatest(hits, 7)', where => 'k = 0')")
    assert(s.sql(s"SELECT min(hits) FROM graft.`$p` WHERE k = 0")
      .head().getLong(0) == 7)
    // no-match: same version back, zero rows
    val vBefore = TableManifest.versions(s, p).last
    val noop = s.sql(s"CALL graft.update(path => '$p', " +
      "set => 'hits = -1', where => 'k = 999')").head()
    assert(noop.getLong(0) == vBefore && noop.getLong(1) == 0L)
  }

  test("plain SQL UPDATE ... SET ... WHERE: analyzer-native, one MoR " +
    "commit, refuses subqueries, nondeterminism, and pinned reads") {
    val p = tmp("squpd")
    TableManifest.commitSnapshot(
      s.range(100).select(col("id"), (col("id") % 5).as("k"),
        lit(0L).as("hits")), p)
    // assignments see the PRE-update row; untouched columns carry over
    val r = s.sql(
      s"UPDATE graft.`$p` SET hits = hits + id, k = k * 10 WHERE k = 3")
      .head()
    assert(r.getLong(1) == 20, s"rows_updated: ${r.getLong(1)}")
    assert(TableManifest.pendingDeletes(s, p) == 1,
      "SQL UPDATE must be the MoR tombstone commit, not a table rewrite")
    assert(s.sql(
      s"SELECT count(*) FROM graft.`$p` WHERE k = 30 AND hits = id")
      .head().getLong(0) == 20)
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 100, "UPDATE must never change the row count")
    // expressions that cannot render to exact re-parseable SQL refuse
    // at analysis — the DELETE path's discipline
    intercept[Exception](s.sql(s"UPDATE graft.`$p` SET hits = rand()"))
    intercept[Exception](s.sql(s"UPDATE graft.`$p` SET hits = " +
      s"(SELECT max(hits) FROM graft.`$p`)"))
    assert(s.sql(s"SELECT sum(hits) FROM graft.`$p` WHERE k <> 30")
      .head().getLong(0) == 0L, "refused updates must not land")
    // no-match UPDATE: zero rows, version unchanged
    val vBefore = TableManifest.versions(s, p).last
    val noop =
      s.sql(s"UPDATE graft.`$p` SET hits = -1 WHERE k = 999").head()
    assert(noop.getLong(0) == vBefore && noop.getLong(1) == 0L)
  }

  test("SQL UPDATE/DELETE with timestamp-literal predicates mask the " +
    "same rows under ANY session time zone (timestamp_micros rendering)") {
    val p = tmp("tzdml")
    TableManifest.commitSnapshot(
      s.range(48).select(col("id"),
        to_timestamp(lit("2026-01-01 00:00:00"))
          .plus(expr("make_interval(0,0,0,0, CAST(id AS INT), 0, 0)"))
          .as("ts"), lit(0L).as("hits")), p)
    val prevTz = s.conf.get("spark.sql.session.timeZone")
    try {
      // writer zone ≠ reader zone: the tombstone predicate is re-parsed
      // at EVERY read, so a wall-clock literal rendering would shift
      // which rows it masks after the flip
      s.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
      // +14 zone: this wall-clock literal is 2026-01-01 12:00 UTC, so
      // exactly ids 0..11 (ts built under the spec session's UTC) match
      s.sql(s"UPDATE graft.`$p` SET hits = 1 " +
        "WHERE ts < TIMESTAMP '2026-01-02 02:00:00'")
      s.sql(s"DELETE FROM graft.`$p` " +
        "WHERE ts >= TIMESTAMP '2026-01-02 00:00:00' AND id % 2 = 0")
      val before =
        s.sql(s"SELECT id, hits FROM graft.`$p` ORDER BY id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
      s.conf.set("spark.sql.session.timeZone", "Etc/GMT+12")
      val after =
        s.sql(s"SELECT id, hits FROM graft.`$p` ORDER BY id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(before == after,
        "masked/updated rows shifted with the session time zone")
      assert(after.count(_._2 == 1L) == 11,
        "the writer-zone UPDATE matched ids 0..11; the DELETE then " +
          s"removed id 10 — 11 updated survivors: $after")
    } finally s.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("evolved tables through the catalog: late-added columns are " +
    "SQL-visible (null-padded) and updatable, pre-compaction") {
    val p = tmp("evosql")
    TableManifest.commitSnapshot(s.range(5).select(col("id")), p)
    import org.apache.spark.sql.types._
    TableManifest.append( // evolved append carries a NEW column
      s.range(5, 7).select(col("id"),
        concat(lit("t"), col("id").cast("string")).as("tag")), p)
    // the catalog serves the MERGED schema: both columns, legacy rows
    // null-padded — previously the late column was silently absent
    assert(s.sql(s"SELECT * FROM graft.`$p`").columns.toSeq ==
      Seq("id", "tag"))
    assert(s.sql(s"SELECT count(*) FROM graft.`$p` WHERE tag IS NULL")
      .head().getLong(0) == 5)
    // SQL UPDATE on the late-added column reaches the legacy batches
    val r = s.sql(s"UPDATE graft.`$p` " +
      "SET tag = coalesce(tag, 'pad') WHERE id <= 5").head()
    assert(r.getLong(1) == 6, s"rows_updated: ${r.getLong(1)}")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p` WHERE tag = 'pad'")
      .head().getLong(0) == 5)
    // and SQL DELETE predicates on it work too
    s.sql(s"DELETE FROM graft.`$p` WHERE tag = 't5'")
    assert(s.sql(s"SELECT id FROM graft.`$p` ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L, 6L))
  }

  test("DDL surface: CTAS, INSERT OVERWRITE, REPLACE TABLE, and " +
    "TRUNCATE all land as manifest commits; empties stay readable") {
    val p = tmp("ddl")
    s.sql(s"CREATE TABLE graft.`$p` AS " +
      "SELECT id, id % 5 AS k FROM range(100)")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 100)
    s.sql(s"INSERT OVERWRITE graft.`$p` " +
      "SELECT id, id % 3 AS k FROM range(10)")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 10, "INSERT OVERWRITE must replace, not append")
    val preReplace = TableManifest.versions(s, p).last
    s.sql(s"REPLACE TABLE graft.`$p` AS SELECT id FROM range(5)")
    assert(s.sql(s"SELECT * FROM graft.`$p`").columns.toSeq == Seq("id")
      && s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0) == 5,
      "REPLACE TABLE must swap both schema and contents")
    // staging catalog: REPLACE is the next version of the SAME manifest —
    // history is PRESERVED, the pre-replace pin keeps serving its old
    // schema and contents until vacuum (the Delta semantics, not the
    // non-staging drop+create that restarts the version chain)
    assert(TableManifest.versions(s, p).contains(preReplace),
      "REPLACE must preserve the version history")
    val pinned = s.sql(
      s"SELECT count(*) FROM graft.`$p` VERSION AS OF $preReplace")
    assert(pinned.head().getLong(0) == 10,
      "the pre-replace pin must keep serving the replaced contents")
    s.sql(s"TRUNCATE TABLE graft.`$p`")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 0, "a truncated table must stay a readable empty table")
    s.sql(s"INSERT INTO graft.`$p` VALUES (42)")
    assert(s.sql(s"SELECT id FROM graft.`$p`").head().getLong(0) == 42)
  }

  test("ALTER TABLE ADD COLUMN(S): one zero-row widening commit — new " +
    "columns null-pad legacy rows, pre-ALTER pins keep the narrow " +
    "schema, and duplicate/NOT NULL/positioned adds are refused") {
    val p = tmp("alter")
    s.sql(s"CREATE TABLE graft.`$p` (id BIGINT, k BIGINT)")
    s.sql(s"INSERT INTO graft.`$p` SELECT id, id % 5 AS k FROM range(50)")
    val preAlter = TableManifest.versions(s, p).last
    s.sql(s"ALTER TABLE graft.`$p` ADD COLUMNS " +
      "(score DOUBLE, tag STRING)")
    // visible immediately, null over every pre-ALTER row
    val row = s.sql(s"SELECT count(*) AS n, count(score) AS ns, " +
      s"count(tag) AS nt FROM graft.`$p`").head()
    assert(row.getLong(0) == 50 && row.getLong(1) == 0 &&
      row.getLong(2) == 0)
    // the widened schema is the INSERT target now
    s.sql(s"INSERT INTO graft.`$p` VALUES (1000, 0, 0.5, 'new')")
    // and DML reaches the evolved column on legacy rows
    s.sql(s"UPDATE graft.`$p` SET score = CAST(id AS DOUBLE) / 10, " +
      "tag = 'legacy' WHERE id % 10 = 0 AND id < 100")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p` " +
      "WHERE tag = 'legacy' AND score = CAST(id AS DOUBLE) / 10")
      .head().getLong(0) == 5)
    // time travel: the pre-ALTER pin still serves the NARROW schema
    assert(s.sql(s"SELECT * FROM graft.`$p` VERSION AS OF $preAlter")
      .columns.toSeq == Seq("id", "k"))
    // refusals: duplicate (case-insensitive), NOT NULL, positions
    intercept[Exception](
      s.sql(s"ALTER TABLE graft.`$p` ADD COLUMNS (SCORE DOUBLE)"))
    intercept[Exception](s.sql(
      s"ALTER TABLE graft.`$p` ADD COLUMNS (req STRING NOT NULL)"))
    intercept[Exception](s.sql(
      s"ALTER TABLE graft.`$p` ADD COLUMNS (head2 STRING FIRST)"))
    // nothing above committed: schema and contents unchanged
    assert(s.sql(s"SELECT * FROM graft.`$p`").columns.toSeq ==
      Seq("id", "k", "score", "tag"))
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 51)
  }

  test("ALTER TABLE RENAME/DROP COLUMN: metadata-only mapping commits — " +
    "old parquet resolves under the new name, pins keep era names, " +
    "DML reaches renamed columns, compaction folds the mapping away") {
    val p = tmp("rename")
    s.sql(s"CREATE TABLE graft.`$p` (id BIGINT, v BIGINT, junk STRING)")
    s.sql(s"INSERT INTO graft.`$p` " +
      "SELECT id, id * 10 AS v, 'x' AS junk FROM range(20)")
    val preRename = TableManifest.versions(s, p).last
    // RENAME: no rewrite — the payload keeps its physical 'v' bytes
    s.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN v TO score")
    assert(s.sql(s"SELECT * FROM graft.`$p`").columns.toSeq ==
      Seq("id", "score", "junk"))
    assert(s.sql(s"SELECT sum(score) FROM graft.`$p`").head().getLong(0)
      == (0 until 20).map(_ * 10).sum,
      "pre-rename rows must resolve under the new name")
    // pinned pre-rename era serves the OLD name
    assert(s.sql(s"SELECT * FROM graft.`$p` VERSION AS OF $preRename")
      .columns.toSeq == Seq("id", "v", "junk"))
    // writes after the rename land under the new name and read back
    s.sql(s"INSERT INTO graft.`$p` VALUES (100, 999, 'y')")
    assert(s.sql(s"SELECT score FROM graft.`$p` WHERE id = 100")
      .head().getLong(0) == 999)
    // DML on the renamed column reaches OLD-name batches: the stored
    // tombstone predicate is physical-tolerant (coalesce over eras)
    val upd = s.sql(
      s"UPDATE graft.`$p` SET score = score + 1 WHERE score < 50").head()
    assert(upd.getLong(1) == 5, s"rows_updated: ${upd.getLong(1)}")
    assert(s.sql(s"SELECT sum(score) FROM graft.`$p` WHERE id < 5")
      .head().getLong(0) == 1 + 11 + 21 + 31 + 41)
    s.sql(s"DELETE FROM graft.`$p` WHERE score = 41")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 20)
    // MERGE on the renamed key column: the equality tombstone must hit
    // old-name batches through the mapping too
    import s.implicits._
    Seq((31L, 7L)).toDF("score", "delta")
      .createOrReplaceTempView("ren_mrg")
    s.sql(
      s"""MERGE INTO graft.`$p` AS t USING ren_mrg AS s
         |ON t.score = s.score
         |WHEN MATCHED THEN UPDATE SET score = t.score + s.delta"""
        .stripMargin)
    assert(s.sql(s"SELECT score FROM graft.`$p` WHERE id = 3")
      .head().getLong(0) == 38)
    // refusals: rename onto a live or historical physical name, rename
    // of a constraint-referenced column, chained re-add of an era name
    intercept[Exception](
      s.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN junk TO v"))
    intercept[Exception](
      s.sql(s"ALTER TABLE graft.`$p` ADD COLUMNS (v BIGINT)"))
    s.sql(s"ALTER TABLE graft.`$p` ADD CONSTRAINT chk CHECK (id >= 0)")
    intercept[Exception](
      s.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN id TO ident"))
    s.sql(s"ALTER TABLE graft.`$p` DROP CONSTRAINT chk")
    // DROP COLUMN: disappears from reads/DDL, era pins still serve it
    s.sql(s"ALTER TABLE graft.`$p` DROP COLUMN junk")
    assert(s.sql(s"SELECT * FROM graft.`$p`").columns.toSeq ==
      Seq("id", "score"))
    assert(s.sql(s"SELECT * FROM graft.`$p` VERSION AS OF $preRename")
      .columns.toSeq == Seq("id", "v", "junk"))
    intercept[Exception](
      s.sql(s"ALTER TABLE graft.`$p` ADD COLUMNS (junk STRING)"))
    // compaction rewrites physically under logical names and clears the
    // mapping; chained rename becomes possible again
    s.sql(s"CALL graft.maintain(path => '$p', max_batches => 1)")
    assert(TableManifest.columnMapOf(s, p).isEmpty,
      "a fold must clear the live column mapping")
    assert(s.sql(s"SELECT sum(score) FROM graft.`$p`").head().getLong(0)
      == (Seq(1L, 11L, 21L, 38L) ++ (5 until 20).map(_ * 10L)
        :+ 999L).sum, s"post-fold content drift")
    s.sql(s"ALTER TABLE graft.`$p` ADD COLUMNS (junk STRING)")
    assert(s.sql(s"SELECT * FROM graft.`$p`").columns.toSeq ==
      Seq("id", "score", "junk"))
  }

  test("atomic CTAS/RTAS through the staging catalog: a failed CTAS " +
    "leaves NO table, a failed RTAS leaves the old contents serving") {
    val p = tmp("actas") + "/t"
    // CTAS whose query fails mid-execution: abortStagedChanges erases
    // the staged payload — no manifest, no table, not even a half one
    intercept[Exception](s.sql(s"CREATE TABLE graft.`$p` AS " +
      "SELECT assert_true(id < 5) AS chk, id FROM range(10)"))
    assert(!TableManifest.exists(s, p),
      "a failed CTAS must not leave a table behind")
    intercept[Exception](
      s.sql(s"SELECT * FROM graft.`$p`").collect())
    // now a good CTAS, then an RTAS that fails: the table must keep
    // serving its pre-replace contents (never dropped, never truncated)
    s.sql(s"CREATE TABLE graft.`$p` AS SELECT id, id % 5 AS k " +
      "FROM range(100)")
    val vs0 = TableManifest.versions(s, p)
    intercept[Exception](s.sql(s"REPLACE TABLE graft.`$p` AS " +
      "SELECT assert_true(id < 5) AS chk, id FROM range(10)"))
    assert(TableManifest.versions(s, p) == vs0,
      "a failed RTAS must not commit any version")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 100, "a failed RTAS must leave the old contents serving")
    // CTAS into an existing table refused at analysis/exec, table intact
    intercept[Exception](s.sql(s"CREATE TABLE graft.`$p` AS " +
      "SELECT id FROM range(3)"))
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 100)
    // CREATE OR REPLACE is the upsert of DDL: replaces atomically,
    // preserving the version chain
    s.sql(s"CREATE OR REPLACE TABLE graft.`$p` AS " +
      "SELECT id, id * 2 AS dbl FROM range(7)")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 7)
    assert(TableManifest.versions(s, p).toSet.intersect(vs0.toSet)
      == vs0.toSet, "CREATE OR REPLACE must preserve history")
  }

  test("CHECK constraints: created inline or via ALTER, enforced on " +
    "INSERT, UPDATE post-image, and direct appends; DROP lifts them; " +
    "ADD validates existing data") {
    val p = tmp("chk")
    s.sql(s"CREATE TABLE graft.`$p` (id BIGINT, v DOUBLE, " +
      "CONSTRAINT v_nonneg CHECK (v >= 0))")
    s.sql(s"INSERT INTO graft.`$p` VALUES (1, 0.5), (2, CAST(NULL AS " +
      "DOUBLE))") // NULL satisfies (SQL standard)
    // violating INSERT: refused, nothing lands
    intercept[Exception](
      s.sql(s"INSERT INTO graft.`$p` VALUES (3, -1.0)"))
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 2)
    // violating direct-API append: the STORAGE layer enforces too
    intercept[Exception](TableManifest.append(
      s.range(1).select(col("id"), lit(-5.0).as("v")), p))
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 2)
    // UPDATE post-image is gated: a SET writing a violating value fails
    // before anything commits
    intercept[Exception](
      s.sql(s"UPDATE graft.`$p` SET v = v - 10 WHERE id = 1"))
    assert(s.sql(s"SELECT v FROM graft.`$p` WHERE id = 1")
      .head().getDouble(0) == 0.5)
    // a conforming UPDATE passes
    s.sql(s"UPDATE graft.`$p` SET v = v + 1 WHERE id = 1")
    assert(s.sql(s"SELECT v FROM graft.`$p` WHERE id = 1")
      .head().getDouble(0) == 1.5)
    // ADD CONSTRAINT validates EXISTING data: id 2 has NULL v (passes),
    // but an id bound the data violates is refused with nothing stored
    intercept[Exception](s.sql(
      s"ALTER TABLE graft.`$p` ADD CONSTRAINT id_small CHECK (id < 2)"))
    s.sql(s"ALTER TABLE graft.`$p` ADD CONSTRAINT id_pos CHECK (id > 0)")
    intercept[Exception](
      s.sql(s"INSERT INTO graft.`$p` VALUES (0, 1.0)"))
    // DROP lifts enforcement; dropping a missing name needs IF EXISTS
    s.sql(s"ALTER TABLE graft.`$p` DROP CONSTRAINT id_pos")
    s.sql(s"INSERT INTO graft.`$p` VALUES (0, 1.0)")
    intercept[Exception](
      s.sql(s"ALTER TABLE graft.`$p` DROP CONSTRAINT nope"))
    s.sql(s"ALTER TABLE graft.`$p` DROP CONSTRAINT IF EXISTS nope")
    // v_nonneg still live through all of it
    intercept[Exception](
      s.sql(s"INSERT INTO graft.`$p` VALUES (9, -0.1)"))
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 3)
  }

  test("CHECK constraints × staged DDL: REPLACE TABLE swaps the " +
    "constraint set with the definition; RTAS clears it; CALL " +
    "graft.constraints serves the live and pinned sets") {
    val p = tmp("chkdl") + "/t"
    s.sql(s"CREATE TABLE graft.`$p` (id BIGINT, " +
      "CONSTRAINT pos CHECK (id >= 0))")
    s.sql(s"INSERT INTO graft.`$p` VALUES (1)")
    intercept[Exception](s.sql(s"INSERT INTO graft.`$p` VALUES (-1)"))
    // REPLACE TABLE with a DIFFERENT constraint: the staged definition's
    // set replaces the old one in the same DDL
    s.sql(s"REPLACE TABLE graft.`$p` (id BIGINT, " +
      "CONSTRAINT big CHECK (id > 100))")
    s.sql(s"INSERT INTO graft.`$p` VALUES (500)")
    intercept[Exception](s.sql(s"INSERT INTO graft.`$p` VALUES (1)"))
    val live = s.sql(s"CALL graft.constraints(path => '$p')").collect()
    assert(live.map(_.getString(0)).toSeq == Seq("big") &&
      live.head.getBoolean(2), "the live set must be exactly {big}")
    // RTAS carries no constraint syntax: the replace CLEARS the set
    // (SQL REPLACE semantics — the new definition is the whole truth)
    s.sql(s"REPLACE TABLE graft.`$p` AS SELECT id FROM range(3)")
    s.sql(s"INSERT INTO graft.`$p` VALUES (-1)")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 4)
    assert(s.sql(s"CALL graft.constraints(path => '$p')").collect()
      .isEmpty)
  }

  test("REPLACE definition + data flip under ONE marker: the constraint " +
    "artifact rides the snapshot version itself") {
    val p = tmp("chkatom") + "/t"
    s.sql(s"CREATE TABLE graft.`$p` (id BIGINT, " +
      "CONSTRAINT pos CHECK (id >= 0))")
    // CREATE with an inline constraint is one version: the seed snapshot
    // and its constraint artifact share the marker (no window where the
    // table exists unconstrained)
    assert(TableManifest.versions(s, p) == Seq(0L),
      "CREATE TABLE ... CHECK must be ONE atomic commit")
    assert(TableManifest.constraintsOf(s, p).map(_.name) == Seq("pos"))
    s.sql(s"INSERT INTO graft.`$p` VALUES (7)")
    // REPLACE with a different constraint: again exactly one new version,
    // kind=snapshot, whose own constraints_v artifact carries the set
    val before = TableManifest.versions(s, p).last
    s.sql(s"REPLACE TABLE graft.`$p` (id BIGINT, " +
      "CONSTRAINT neg CHECK (id < 0))")
    val vs = TableManifest.versions(s, p)
    assert(vs.last == before + 1,
      s"REPLACE + constraint swap must be ONE commit, got versions $vs")
    assert(TableManifest.history(s, p)
      .filter(col("version") === vs.last).head().getString(5)
      == "snapshot")
    assert(TableManifest.constraintsOf(s, p).map(_.name) == Seq("neg"))
    // the pinned pre-replace era still serves ITS definitions
    assert(TableManifest.constraintsOf(s, p, Some(before))
      .map(_.name) == Seq("pos"))
    // RTAS clearing a non-empty set: also one commit (empty artifact)
    s.sql(s"REPLACE TABLE graft.`$p` AS SELECT id FROM range(3)")
    assert(TableManifest.versions(s, p).last == vs.last + 1)
    assert(TableManifest.constraintsOf(s, p).isEmpty)
  }

  test("constraint DDL read-modify-write is optimistic: a competing " +
    "constraints commit refuses the stale set; interleaved appends " +
    "do not") {
    import graft.operators.TableManifest.TableConstraint
    val p = tmp("chkrace")
    TableManifest.commitSnapshot(
      s.range(10).select(col("id"), (col("id") % 5).as("k")), p)
    val v0 = TableManifest.versions(s, p).last
    val base = TableManifest.constraintsOf(s, p, Some(v0))
    // a COMPETING constraint DDL lands after the read
    TableManifest.setConstraints(s, p,
      Seq(TableConstraint("other", "k >= 0", true, false, "VALID")))
    // the stale full-set write (computed against v0) must refuse —
    // committing it would silently drop 'other'
    intercept[java.util.ConcurrentModificationException](
      TableManifest.setConstraints(s, p,
        base :+ TableConstraint("mine", "id >= 0", true, false, "VALID"),
        Some(v0)))
    assert(TableManifest.constraintsOf(s, p).map(_.name) == Seq("other"))
    // interleaved APPENDS are harmless: the guarded write still lands
    val v1 = TableManifest.versions(s, p).last
    val cur = TableManifest.constraintsOf(s, p, Some(v1))
    TableManifest.append(
      s.range(10, 20).select(col("id"), (col("id") % 5).as("k")), p)
    TableManifest.setConstraints(s, p,
      cur :+ TableConstraint("mine", "id >= 0", true, false, "VALID"),
      Some(v1))
    assert(TableManifest.constraintsOf(s, p).map(_.name).sorted ==
      Seq("mine", "other"))
    // and the catalog route retries transparently end to end
    s.sql(s"ALTER TABLE graft.`$p` ADD CONSTRAINT third CHECK (k < 99)")
    assert(TableManifest.constraintsOf(s, p).map(_.name).sorted ==
      Seq("mine", "other", "third"))
  }

  test("tags and restore: VERSION AS OF '<name>' resolves the pin, " +
    "vacuum never reclaims a tagged version, restore moves the table " +
    "back without rewriting history") {
    val p = tmp("tags")
    TableManifest.commitSnapshot(
      s.range(100).select(col("id"), (col("id") % 5).as("k")), p)
    val r = s.sql(s"CALL graft.tag(path => '$p', name => 'baseline')")
      .head()
    val vBase = r.getLong(1)
    // churn: delete + two replacement snapshots push versions well past
    s.sql(s"DELETE FROM graft.`$p` WHERE k = 0")
    TableManifest.commitSnapshot(
      s.range(7).select(col("id"), lit(9L).as("k")), p)
    TableManifest.commitSnapshot(
      s.range(3).select(col("id"), lit(8L).as("k")), p)
    // the tag reads by NAME, serving the pre-churn content
    assert(s.sql(
      s"SELECT count(*) FROM graft.`$p` VERSION AS OF 'baseline'")
      .head().getLong(0) == 100)
    // and the history audit names the pin on its version's row
    assert(s.sql(s"CALL graft.history(path => '$p')").collect()
      .filter(_.getLong(0) == vBase).map(_.getString(6)).toSeq ==
      Seq("baseline"))
    // the DataFrame reader resolves tags too — same axis as SQL
    assert(s.read.format("graft").option("versionAsOf", "baseline")
      .load(p).count() == 100)
    intercept[Exception](s.read.format("graft")
      .option("versionAsOf", "ghost").load(p).count())
    // vacuum with keep=1 would normally reclaim vBase — the tag pins it
    s.sql(s"CALL graft.vacuum(path => '$p', keep => 1)")
    assert(TableManifest.versions(s, p).contains(vBase),
      "vacuum must never reclaim a tagged version")
    assert(s.sql(
      s"SELECT count(*) FROM graft.`$p` VERSION AS OF 'baseline'")
      .head().getLong(0) == 100)
    // restore by tag: a FORWARD commit serving the old content;
    // history keeps the in-between versions that survived vacuum
    val rr = s.sql(
      s"CALL graft.restore(path => '$p', to => 'baseline')").head()
    assert(rr.getLong(1) == vBase)
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 100)
    assert(rr.getLong(0) > TableManifest.versions(s, p).init.last ||
      TableManifest.versions(s, p).last == rr.getLong(0),
      "restore must be the newest version, not a history rewrite")
    // unknown refs fail with the tag list; untag releases the pin
    intercept[Exception](s.sql(
      s"SELECT * FROM graft.`$p` VERSION AS OF 'nope'").collect())
    assert(s.sql(s"CALL graft.untag(path => '$p', name => 'baseline')")
      .head().getBoolean(0))
    s.sql(s"CALL graft.vacuum(path => '$p', keep => 1)")
    assert(!TableManifest.versions(s, p).contains(vBase),
      "after untag the version is reclaimable again")
    // the restored CONTENT survives — it lives at the new head
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 100)
    // restoring an EVOLVED-era version carries its late-added columns
    // (the merged schema, not whichever footer parquet sampled)
    val p2 = tmp("tagevo")
    TableManifest.commitSnapshot(
      s.range(5).select(col("id")), p2)
    TableManifest.append(
      s.range(5, 8).select(col("id"), (col("id") * 2).as("extra")), p2)
    val vEvo = TableManifest.tag(s, p2, "evo")
    TableManifest.commitSnapshot(
      s.range(2).select(lit("z").as("other")), p2)
    TableManifest.restore(s, p2, vEvo)
    val restored = s.sql(s"SELECT * FROM graft.`$p2`")
    assert(restored.columns.toSeq == Seq("id", "extra") &&
      restored.count() == 8 &&
      restored.where(col("extra").isNotNull).count() == 3)
  }

  test("plain SQL MERGE INTO ... UPDATE SET * / INSERT *: exact merge " +
    "semantics, cardinality violation and custom clauses refused") {
    val p = tmp("sqmrg")
    TableManifest.commitSnapshot(
      s.range(10).select(col("id"), (col("id") * 10).as("v")), p)
    s.range(5, 15).select(col("id"), (col("id") * 100).as("v"))
      .createOrReplaceTempView("mrg_src")
    val r = s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mrg_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
    assert(r.getLong(1) == 5 && r.getLong(2) == 5,
      s"matched/inserted: ${r.getLong(1)}/${r.getLong(2)}")
    val got = s.sql(s"SELECT id, v FROM graft.`$p` ORDER BY id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val want = (0L to 4L).map(i => i -> i * 10) ++
      (5L to 14L).map(i => i -> i * 100)
    assert(got == want, s"merged state: $got")
    // duplicate source keys = the SQL cardinality violation: refused
    // BEFORE anything commits
    s.sql("SELECT * FROM mrg_src UNION ALL SELECT 7, 777")
      .createOrReplaceTempView("mrg_dup")
    val vBefore = TableManifest.versions(s, p).last
    intercept[Exception](s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mrg_dup AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(TableManifest.versions(s, p).last == vBefore,
      "a refused merge must not commit")
    // a non-equi ON stays outside the translation: refuse at analysis
    // (explicit assignments are first-class now — own test below)
    intercept[Exception](s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mrg_src AS s ON t.id >= s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    // WHEN NOT MATCHED BY SOURCE THEN DELETE: sync-to-source — the
    // unmatched target rows (ids 0..4) drop, everything else is the
    // source's values
    s.range(8, 12).select(col("id"), (col("id") * 1000).as("v"))
      .createOrReplaceTempView("mrg_sync")
    val r2 = s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mrg_sync AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin).head()
    val synced = s.sql(s"SELECT id, v FROM graft.`$p` ORDER BY id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(synced == (8L to 11L).map(i => i -> i * 1000),
      s"sync-to-source must leave exactly the source: $synced")
    assert(r2.getLong(1) == 4 && r2.getLong(2) == 0)
    // WHEN MATCHED THEN DELETE alone: key-list deletion (the GDPR
    // by-id-list shape) — table currently holds ids 8..11
    s.range(9, 11).select(col("id"), lit(0L).as("v"))
      .createOrReplaceTempView("mrg_del")
    val r3 = s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mrg_del AS s ON t.id = s.id
         |WHEN MATCHED THEN DELETE""".stripMargin).head()
    assert(r3.getLong(1) == 2 && r3.getLong(2) == 0,
      s"matched-delete counts: ${r3.getLong(1)}/${r3.getLong(2)}")
    assert(s.sql(s"SELECT id FROM graft.`$p` ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(8L, 11L))
    // WHEN NOT MATCHED THEN INSERT * alone: insert-if-absent — the
    // matched source row (id 8) must NOT overwrite the target's value
    s.range(7, 9).select(col("id"), lit(-5L).as("v"))
      .createOrReplaceTempView("mrg_ins")
    val r4 = s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mrg_ins AS s ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
    assert(r4.getLong(1) == 1 && r4.getLong(2) == 1)
    val after = s.sql(s"SELECT id, v FROM graft.`$p` ORDER BY id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(after == Seq(7L -> -5L, 8L -> 8000L, 11L -> 11000L),
      s"insert-if-absent must keep the matched target row: $after")
    import s.implicits._
    // CONDITIONAL clauses, first-match-wins: id 7's source value loses
    // the s.v > t.v test (-10 > -5 is false) so the unconditional
    // DELETE takes it; id 8's wins and updates
    Seq((7L, -10L), (8L, 99999L)).toDF("id", "v")
      .createOrReplaceTempView("mrg_cond")
    val r5 = s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mrg_cond AS s ON t.id = s.id
         |WHEN MATCHED AND s.v > t.v THEN UPDATE SET *
         |WHEN MATCHED THEN DELETE""".stripMargin).head()
    assert(r5.getLong(1) == 2)
    assert(s.sql(s"SELECT id, v FROM graft.`$p` ORDER BY id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq(8L -> 99999L, 11L -> 11000L),
      "first-match-wins: losing the update condition falls to DELETE")
    // conditional INSERT gates which unmatched source rows land
    Seq((11L, 1L), (20L, 5L), (21L, -1L)).toDF("id", "v")
      .createOrReplaceTempView("mrg_condins")
    s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mrg_condins AS s
         |ON t.id = s.id
         |WHEN NOT MATCHED AND s.v > 0 THEN INSERT *""".stripMargin)
    assert(s.sql(s"SELECT id FROM graft.`$p` ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(8L, 11L, 20L),
      "only the condition-passing unmatched source row inserts")
    // conditional NOT MATCHED BY SOURCE prunes just the accepting rows
    s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mrg_cond AS s ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE AND v < 100 THEN DELETE"""
        .stripMargin)
    assert(s.sql(s"SELECT id FROM graft.`$p` ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(8L, 11L),
      "the conditional by-source delete must drop only v < 100 rows")
  }

  test("struct column rename: a DELETE by FIELD PATH on the new name " +
    "masks old-name batches (container substitution in the tombstone)") {
    val p = tmp("structren")
    import s.implicits._
    TableManifest.commitSnapshot(
      s.range(10).selectExpr("id",
        "named_struct('x', id * 2, 'y', id + 100) AS point"), p)
    s.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN point TO loc")
    // the stored predicate references loc.x; the physical bytes live
    // under point.x in every pre-rename file — the container
    // substitution (coalesce over era names, field path re-attached)
    // must mask them
    s.sql(s"DELETE FROM graft.`$p` WHERE loc.x >= 10")
    val got = s.sql(s"SELECT id, loc.y FROM graft.`$p` ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == (0L until 5L).map(i => (i, i + 100)),
      s"struct-field delete through the rename mapping: $got")
    // UPDATE through the renamed struct column's field too
    val upd = s.sql(s"UPDATE graft.`$p` " +
      "SET id = id + 1000 WHERE loc.y = 102").head()
    assert(upd.getLong(1) == 1)
    assert(s.sql(s"SELECT count(*) FROM graft.`$p` WHERE id = 1002")
      .head().getLong(0) == 1)
    // DROP COLUMN loc refused while its tombstones are pending (the
    // head-of-path guard), allowed after a fold
    intercept[Exception](
      s.sql(s"ALTER TABLE graft.`$p` DROP COLUMN loc"))
    s.sql(s"CALL graft.maintain(path => '$p', max_batches => 1, " +
      "max_deletes => 1)")
    s.sql(s"ALTER TABLE graft.`$p` DROP COLUMN loc")
    assert(s.sql(s"SELECT * FROM graft.`$p`").columns.toSeq == Seq("id"))
  }

  test("NOT NULL constraints: column DDL, SET/DROP NOT NULL, the " +
    "absence rule on narrow appends, and abort-without-commit") {
    val p = tmp("notnull")
    s.sql(s"CREATE TABLE graft.`$p` (id BIGINT NOT NULL, v DOUBLE)")
    s.sql(s"INSERT INTO graft.`$p` VALUES (1, 0.5), (2, NULL)")
    def n = s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
    // a NULL in the pinned column aborts the write, nothing commits
    val vBefore = TableManifest.versions(s, p).last
    intercept[Exception](
      s.sql(s"INSERT INTO graft.`$p` VALUES (NULL, 1.0)"))
    assert(TableManifest.versions(s, p).last == vBefore && n == 2,
      "a violating append must abort without committing")
    // direct-API appends are gated too; a NARROW frame omitting the
    // NOT NULL column refuses outright (every row would land NULL)
    import s.implicits._
    intercept[Exception](TableManifest.append(Seq(0.25).toDF("v"), p))
    assert(n == 2)
    // SET NOT NULL refuses while rows hold NULL; a MoR backfill fixes it
    intercept[Exception](
      s.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN v SET NOT NULL"))
    s.sql(s"UPDATE graft.`$p` SET v = 0.0 WHERE v IS NULL")
    s.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN v SET NOT NULL")
    intercept[Exception](
      s.sql(s"INSERT INTO graft.`$p` VALUES (3, NULL)"))
    // DROP NOT NULL lifts exactly that constraint
    s.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN v DROP NOT NULL")
    s.sql(s"INSERT INTO graft.`$p` VALUES (3, NULL)")
    assert(n == 3)
    val kinds = s.sql(s"CALL graft.constraints(path => '$p')").collect()
      .map(r => (r.getString(0), r.getString(5))).toSet
    assert(kinds == Set(("id_not_null", "notnull:id")), s"defs: $kinds")
    // renaming a NOT-NULL-pinned column is refused until the
    // constraint is dropped (its stored predicate names the column)
    intercept[Exception](
      s.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN id TO ident"))
    // plain REPLACE TABLE with a NOT NULL column list re-registers the
    // constraint (user-authored columns — unlike RTAS's query-derived
    // schema) atomically with the replacement
    s.sql(s"REPLACE TABLE graft.`$p` (id BIGINT NOT NULL, v DOUBLE)")
    intercept[Exception](
      s.sql(s"INSERT INTO graft.`$p` VALUES (NULL, 1.0)"))
    s.sql(s"INSERT INTO graft.`$p` VALUES (9, 1.0)")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
      == 1)
    // several NULL-KEYED source rows are a legal multi-insert, not a
    // MERGE cardinality violation (null keys never match)
    s.sql("SELECT CAST(NULL AS BIGINT) AS id, 2.0 AS v " +
      "UNION ALL SELECT CAST(NULL AS BIGINT), 3.0")
      .createOrReplaceTempView("nn_nullsrc")
    intercept[Exception] { // NOT NULL still gates the inserts though
      s.sql(s"""MERGE INTO graft.`$p` AS t USING nn_nullsrc AS s
        ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT *""")
    }
    s.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN id DROP NOT NULL")
    s.sql(s"""MERGE INTO graft.`$p` AS t USING nn_nullsrc AS s
      ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT *""")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p` WHERE id IS NULL")
      .head().getLong(0) == 2,
      "null-keyed source rows must both insert")
  }

  test("MoR MERGE: explicit assignments over both pre-images, NMBS " +
    "UPDATE, key-group rewrite, match-proportional shape, refusals") {
    val p = tmp("mormrg")
    TableManifest.commitSnapshot(
      s.range(10).select(col("id"), (col("id") * 10).as("v")), p)
    import s.implicits._
    Seq((2L, 5L), (3L, 7L), (20L, 4L)).toDF("id", "v")
      .createOrReplaceTempView("mm_src")
    def payloadDirs: Int = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .listStatus(hp)
        .count(_.getPath.getName.startsWith("data_v"))
    }
    val dirsBefore = payloadDirs
    val vPre = TableManifest.versions(s, p).last
    // explicit assignments reading BOTH pre-images, a conditional
    // DELETE, an NMBS UPDATE (the SCD close-out), an expression INSERT
    val r = s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mm_src AS s ON t.id = s.id
         |WHEN MATCHED AND t.id = 2 THEN UPDATE SET v = t.v + s.v
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v * 2)
         |WHEN NOT MATCHED BY SOURCE AND t.id >= 8
         |  THEN UPDATE SET v = -t.v""".stripMargin).head()
    assert(r.getLong(1) == 2 && r.getLong(2) == 1,
      s"matched/inserted: ${r.getLong(1)}/${r.getLong(2)}")
    val got = s.sql(s"SELECT id, v FROM graft.`$p` ORDER BY id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val want = Seq(0L -> 0L, 1L -> 10L, 2L -> 25L, /* 3 deleted */
      4L -> 40L, 5L -> 50L, 6L -> 60L, 7L -> 70L,
      8L -> -80L, 9L -> -90L, 20L -> 8L)
    assert(got == want, s"merged state: $got")
    // THE structural claim: no copy-on-write — the payload dir count is
    // unchanged (a CoW rewrite commits a fresh data_v), the commit is
    // kind=merge, and the tombstone is an equality segment
    assert(payloadDirs == dirsBefore,
      "MoR MERGE must not rewrite the payload (no new data_v dir)")
    val vM = TableManifest.versions(s, p).last
    assert(TableManifest.history(s, p)
      .filter(col("version") === vM).head().getString(5) == "merge")
    val hp = new org.apache.hadoop.fs.Path(s"$p/eqdeletes_v$vM")
    assert(hp.getFileSystem(s.sparkContext.hadoopConfiguration)
      .exists(hp), "the merge tombstone is an equality key file")
    // the pre-merge pin is immutable under the merge
    assert(s.read.format("graft").option("versionAsOf", vPre).load(p)
      .orderBy("id").collect().map(x =>
        (x.getLong(0), x.getLong(1))).toSeq ==
      (0L to 9L).map(i => i -> i * 10))
    // CDF renders the merge as delete(old acted rows) + insert(new)
    val cdf = TableManifest.readChanges(s, p, vPre, vM)
      .collect().map(x => (x.getString(2), x.getLong(0), x.getLong(1)))
      .sortBy(x => (x._1, x._2))
    assert(cdf.filter(_._1 == "delete").map(c => (c._2, c._3)).toSeq ==
      Seq(2L -> 20L, 3L -> 30L, 8L -> 80L, 9L -> 90L), s"cdf: ${cdf.toSeq}")
    assert(cdf.filter(_._1 == "insert").map(c => (c._2, c._3)).toSeq ==
      Seq(2L -> 25L, 8L -> -80L, 9L -> -90L, 20L -> 8L))
    // maintain folds the equality tombstone + replacement batch away;
    // the live content must not move
    TableManifest.maintain(s, p, maxDeletes = 1)
    assert(s.sql(s"SELECT id, v FROM graft.`$p` ORDER BY id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq == want,
      "folding the merge must not change the live table")
    // refusals: subquery and non-deterministic assignments, NMBS
    // reading the source, NOT MATCHED reading the target
    intercept[Exception](s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mm_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET
         |  v = (SELECT max(id) FROM mm_src)""".stripMargin))
    intercept[Exception](s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mm_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = CAST(rand() * 10 AS BIGINT)"""
        .stripMargin))
    intercept[Exception](s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mm_src AS s ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = s.v"""
        .stripMargin))
    intercept[Exception](s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mm_src AS s ON t.id = s.id
         |WHEN NOT MATCHED AND t.v > 0 THEN INSERT *""".stripMargin))
  }

  test("MoR MERGE key-group rewrite on a NON-UNIQUE key: per-row clause " +
    "conditions stay exact under key-level masking, null keys NMBS-safe") {
    val p = tmp("mormrggrp")
    import s.implicits._
    // key k is non-unique; one group (k=1) will split per-row across
    // update/delete/no-clause — the silent row must survive unchanged
    // even though the whole group is tombstoned and rewritten
    TableManifest.commitSnapshot(
      Seq((1L, "a", 1L), (1L, "b", 5L), (1L, "c", 9L),
        (2L, "d", 5L), (3L, "e", 5L),
        (-1L, "n1", 5L), (-1L, "n2", 7L)).toDF("k", "tag", "v")
        .withColumn("k", when(col("k") < 0, lit(null).cast("long"))
          .otherwise(col("k"))), p)
    Seq((1L, 100L), (2L, 200L)).toDF("k", "delta")
      .createOrReplaceTempView("mg_src")
    val r = s.sql(
      s"""MERGE INTO graft.`$p` AS t USING mg_src AS s ON t.k = s.k
         |WHEN MATCHED AND t.v < 3 THEN UPDATE SET v = t.v + s.delta
         |WHEN MATCHED AND t.v > 8 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND t.v = 7 THEN DELETE"""
        .stripMargin).head()
    // matched rows: all three k=1 rows + the k=2 row = 4 (multiplicity)
    assert(r.getLong(1) == 4, s"matched: ${r.getLong(1)}")
    val got = s.sql(s"SELECT tag, v FROM graft.`$p` ORDER BY tag")
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    // a: 1+100 updated; b: pass-through (group rewrite); c: deleted;
    // d: pass-through (k=2 group acted? no clause accepted v=5 — no row
    // of the group acted, group untouched); e: untouched (k=3 not in
    // source... wait k=3 IS not matched -> NMBS with v=5: no clause);
    // n1 kept; n2: null-key NMBS v=7 deleted via the null-safe tombstone
    assert(got == Seq("a" -> 101L, "b" -> 5L, "d" -> 5L, "e" -> 5L,
      "n1" -> 5L), s"state: $got")
  }

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns widen the " +
    "table nullable, legacy rows read NULL, pins keep the narrow " +
    "schema, explicit assignments may target the new column") {
    val p = tmp("mrgevo")
    TableManifest.commitSnapshot(
      s.range(5).select(col("id"), (col("id") * 10).as("v")), p)
    val pre = TableManifest.versions(s, p).last
    import s.implicits._
    Seq((3L, 7L, "x"), (100L, 1L, "y")).toDF("id", "v", "tag")
      .createOrReplaceTempView("me_src")
    // star actions: the new source column rides SET * / INSERT *
    val r = s.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$p` AS t
         |USING me_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
    assert(r.getLong(1) == 1 && r.getLong(2) == 1)
    val got = s.sql(s"SELECT id, v, tag FROM graft.`$p` ORDER BY id")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        Option(x.getString(2)).getOrElse("-"))).toSeq
    assert(got == Seq((0L, 0L, "-"), (1L, 10L, "-"), (2L, 20L, "-"),
      (3L, 7L, "x"), (4L, 40L, "-"), (100L, 1L, "y")), s"evolved: $got")
    // the pre-merge pin keeps the NARROW schema
    assert(s.sql(s"SELECT * FROM graft.`$p` VERSION AS OF $pre")
      .columns.toSeq == Seq("id", "v"))
    // WITHOUT the keyword, an extra source column stays refused by the
    // star contract (it cannot land anywhere)
    Seq((4L, 2L, 9L)).toDF("id", "v", "extra")
      .createOrReplaceTempView("me_src2")
    intercept[Exception](s.sql(
      s"""MERGE INTO graft.`$p` AS t USING me_src2 AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET extra = s.extra""".stripMargin))
    // EXPLICIT assignment to a brand-new column under the keyword
    val r2 = s.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$p` AS t
         |USING me_src2 AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET extra = s.extra + 1"""
        .stripMargin).head()
    assert(r2.getLong(1) == 1)
    assert(s.sql(s"SELECT extra FROM graft.`$p` WHERE id = 4")
      .head().getLong(0) == 10)
    assert(s.sql(
      s"SELECT count(*) FROM graft.`$p` WHERE extra IS NULL")
      .head().getLong(0) == 5)
  }

  test("MERGE WITH SCHEMA EVOLUTION is ATOMIC with the merge: a refused " +
    "or failed merge leaves NO widening behind; a committed one widens " +
    "and merges under one marker") {
    val p = tmp("mrgevo_atomic")
    TableManifest.commitSnapshot(
      s.range(5).select(col("id"), (col("id") * 10).as("v")), p)
    val pre = TableManifest.versions(s, p).last
    import s.implicits._
    def cols = s.sql(s"SELECT * FROM graft.`$p`").columns.toSeq
    // 1. duplicate source keys: the cardinality refusal fires with
    //    nothing committed — previously the widening append had
    //    already landed by then, leaving the source-only column added
    //    by a MERGE that never happened
    Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("id", "v", "tag")
      .createOrReplaceTempView("mea_dup")
    intercept[Exception](s.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$p` AS t
         |USING mea_dup AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(cols == Seq("id", "v") &&
      TableManifest.versions(s, p).last == pre,
      "a refused merge must not widen the schema")
    // 2. a CHECK-constraint failure mid-merge: same guarantee
    s.sql(s"ALTER TABLE graft.`$p` ADD CONSTRAINT v_pos CHECK (v >= 0)")
    val preC = TableManifest.versions(s, p).last
    Seq((1L, -5L, "x")).toDF("id", "v", "tag")
      .createOrReplaceTempView("mea_bad")
    intercept[Exception](s.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$p` AS t
         |USING mea_bad AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
    assert(cols == Seq("id", "v") &&
      TableManifest.versions(s, p).last == preC,
      "a constraint-failed merge must not widen the schema")
    // 3. the committed merge widens and merges in ONE version
    Seq((1L, 7L, "x")).toDF("id", "v", "tag")
      .createOrReplaceTempView("mea_ok")
    val r = s.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$p` AS t
         |USING mea_ok AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin).head()
    assert(r.getLong(1) == 1)
    assert(TableManifest.versions(s, p).last == preC + 1,
      "widening + merge must be ONE commit, not two")
    assert(cols == Seq("id", "v", "tag"))
    assert(s.sql(s"SELECT tag FROM graft.`$p` WHERE id = 1")
      .head().getString(0) == "x")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p` WHERE tag IS NULL")
      .head().getLong(0) == 4)
  }

  test("ALTER COLUMN TYPE: safe widenings are METADATA-ONLY (no payload " +
    "rewrite) — old batches read wide, DML crosses eras, wide values " +
    "land, pins serve the era type, narrowing keeps the refusal") {
    import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType,
      LongType}
    val p = tmp("widen")
    TableManifest.commitSnapshot(
      s.range(10).select(col("id").cast("int").as("id"),
        (col("id") * 10).cast("float").as("v")), p)
    val pre = TableManifest.versions(s, p).last
    def payloads: Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .listStatus(hp).count(_.getPath.getName.startsWith("data_v"))
        .toLong
    }
    val before = payloads
    s.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN id TYPE BIGINT")
    s.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN v TYPE DOUBLE")
    assert(payloads == before, "widening must not rewrite the payload")
    val sch = s.sql(s"SELECT * FROM graft.`$p`").schema
    assert(sch("id").dataType == LongType && sch("v").dataType == DoubleType)
    // a value past INT range lands through the widened column
    val wide = Int.MaxValue.toLong + 42L
    s.sql(s"INSERT INTO graft.`$p` VALUES ($wide, 1.5)")
    // MoR UPDATE and DELETE cross the era boundary (old int batches +
    // the new bigint batch under one logical column)
    s.sql(s"UPDATE graft.`$p` SET v = v + 1 WHERE id = 2")
    s.sql(s"DELETE FROM graft.`$p` WHERE id = 3")
    val got = s.sql(s"SELECT id, v FROM graft.`$p` ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = ((0L until 10L).filter(_ != 3L)
      .map(i => (i, if (i == 2L) 21.0 else i * 10.0)) :+ (wide, 1.5))
    assert(got == want, s"widened state: $got")
    // the pre-widen pin serves the ERA types
    val pinned = s.sql(s"SELECT * FROM graft.`$p` VERSION AS OF $pre")
    assert(pinned.schema("id").dataType == IntegerType &&
      pinned.schema("v").dataType == FloatType,
      s"pin must keep the era schema: ${pinned.schema}")
    assert(pinned.count() == 10)
    // narrowing / lossy changes keep the rewrite refusal
    intercept[Exception](
      s.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN id TYPE INT"))
    intercept[Exception](
      s.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN v TYPE FLOAT"))
    // compaction folds everything to the wide types physically and
    // clears the mapping; content is unchanged
    TableManifest.compactBatches(s, p)
    assert(TableManifest.columnMapOf(s, p).isEmpty,
      "a fold writes logical names/types and clears the mapping")
    val got2 = s.sql(s"SELECT id, v FROM graft.`$p` ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got2 == want, s"post-fold state: $got2")
  }

  test("CALL graft.optimize after a widening clears the live column " +
    "mapping like a fold does: the clustered payload carries LOGICAL " +
    "names at head types, so explicit-schema reads (SQL MERGE's pinned " +
    "schema, VERSION AS OF) never hit a parquet type mismatch") {
    val p = tmp("optclear")
    TableManifest.commitSnapshot(
      s.range(20).select(col("id").cast("int").as("id"),
        (col("id") % 5).cast("double").as("v")), p)
    s.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN id TYPE BIGINT")
    assert(TableManifest.columnMapOf(s, p).nonEmpty)
    s.sql(s"CALL graft.optimize(path => '$p', files => 2, " +
      "cluster_by => 'id')")
    assert(TableManifest.columnMapOf(s, p).isEmpty,
      "optimize rewrites the payload under logical names — a live " +
        "mapping would make physicalReadSchema request the old name " +
        "under its OLD era type against the new payload")
    // the reads that used to fail: MERGE passes the pinned target
    // schema explicitly; a schema'd read requests id as BIGINT
    s.sql(s"MERGE INTO graft.`$p` t USING (SELECT CAST(3 AS BIGINT) " +
      "AS id, 99.0 AS v) s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET v = s.v")
    val got = s.sql(s"SELECT v FROM graft.`$p` WHERE id = 3")
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(99.0), s"post-optimize merge: $got")
  }

  test("PARTITIONED BY transforms translate to clustering advice: " +
    "days(ts) and bucket(n, c) map to their source column, unknown " +
    "transforms keep the honest refusal") {
    val p = tmp("ddl_days")
    s.sql(s"CREATE TABLE graft.`$p` (ts TIMESTAMP, k BIGINT) " +
      "PARTITIONED BY (days(ts))")
    assert(TableManifest.layoutHint(s, p) == Seq("ts"))
    val p2 = tmp("ddl_bucket")
    s.sql(s"CREATE TABLE graft.`$p2` (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(16, id))")
    assert(TableManifest.layoutHint(s, p2) == Seq("id"))
    val p3 = tmp("ddl_truncate")
    val e = intercept[Exception](
      s.sql(s"CREATE TABLE graft.`$p3` (name STRING, v DOUBLE) " +
        "PARTITIONED BY (truncate(4, name))"))
    assert(e.getMessage.contains("clustered layout") ||
      Option(e.getCause).exists(_.getMessage.contains("clustered layout")),
      s"unknown transform must refuse with guidance: ${e.getMessage}")
  }

  test("nested-field widening: ALTER COLUMN m.cnt TYPE BIGINT is " +
    "metadata-only via the container era; nested narrowing and " +
    "missing fields refuse") {
    val p = tmp("nestwide")
    TableManifest.commitSnapshot(
      s.range(10).select(col("id"),
        struct(col("id").cast("int").as("cnt"),
          lit("x").as("tag")).as("m")), p)
    s.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN m.cnt TYPE BIGINT")
    val sch = s.sql(s"SELECT * FROM graft.`$p`").schema("m").dataType
    assert(sch.catalogString == "struct<cnt:bigint,tag:string>", s"$sch")
    s.sql(s"INSERT INTO graft.`$p` VALUES (77, " +
      "named_struct('cnt', CAST(4294967338 AS BIGINT), 'tag', 'w'))")
    val mx = s.sql(s"SELECT max(m.cnt) FROM graft.`$p`")
      .head().getLong(0)
    assert(mx == 4294967338L)
    intercept[Exception](
      s.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN m.cnt TYPE INT"))
    intercept[Exception](
      s.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN m.nope TYPE BIGINT"))
  }

  test("era machinery COMPOSES and holds COLD: widen then rename then " +
    "DML; pinned era schemas come from the layout (visible-batch footer " +
    "union), not schema-cache warmth") {
    import org.apache.spark.sql.types.IntegerType
    val p = tmp("eras")
    TableManifest.commitSnapshot(
      s.range(6).select(col("id").cast("int").as("id"),
        (col("id") * 10).cast("double").as("v")), p)
    val v0 = TableManifest.versions(s, p).last
    s.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN id TYPE BIGINT")
    s.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN id TO ident")
    val wide = Int.MaxValue.toLong + 5L
    s.sql(s"INSERT INTO graft.`$p` VALUES ($wide, 1.5)")
    s.sql(s"UPDATE graft.`$p` SET v = v + 1 WHERE ident = 2")
    s.sql(s"DELETE FROM graft.`$p` WHERE ident = 4")
    // drop every memoized schema: era resolution must not depend on a
    // tableSchema() call having happened before the DDL in this session
    GraftTableSource.invalidateSchema(p)
    val pin0 = s.sql(s"SELECT * FROM graft.`$p` VERSION AS OF $v0")
    assert(pin0.columns.toSeq == Seq("id", "v"),
      s"cold pre-DDL pin must serve the era NAMES: ${pin0.columns.toSeq}")
    assert(pin0.schema("id").dataType == IntegerType,
      s"cold pre-DDL pin must serve the era TYPE: ${pin0.schema}")
    assert(pin0.count() == 6)
    val cur = s.sql(s"SELECT ident, v FROM graft.`$p` ORDER BY ident")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = (0L until 6L).filter(_ != 4L)
      .map(i => (i, if (i == 2L) 21.0 else i * 10.0)) :+ (wide, 1.5)
    assert(cur == want, s"widen+rename+DML state: $cur")
  }

  test("CALL procedures: the maintenance runbook is plain SQL —" +
    " optimize clusters, history audits, maintain folds, vacuum expires") {
    val p = tmp("proc")
    TableManifest.commitSnapshot(
      s.range(10000).select((col("id") * 7919 % 10000).as("id"),
        (col("id") % 5).as("k")), p)
    (1 to 3).foreach(i => TableManifest.append(
      s.range(i * 10000L, i * 10000L + 10000L)
        .select((col("id") * 7919 % 10000 + i * 10000L).as("id"),
          (col("id") % 5).as("k")), p))
    // optimize: one clustered snapshot commit, rows unchanged
    val before = s.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0)
    val v = s.sql(
      s"CALL graft.optimize(path => '$p', cluster_by => 'id', " +
        "files => 4, stats_cols => 'id')").head().getLong(0)
    assert(TableManifest.versions(s, p).contains(v))
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`")
      .head().getLong(0) == before)
    // history: one row per retained version, exactly one current
    val hist = s.sql(s"CALL graft.history(path => '$p')").collect()
    assert(hist.length == TableManifest.versions(s, p).length)
    assert(hist.count(_.getBoolean(1)) == 1)
    // maintain reports; vacuum's DRY RUN predicts without deleting,
    // then the real run reclaims exactly the prediction
    val rep = s.sql(s"CALL graft.maintain(path => '$p', " +
      "max_batches => 2, stats_cols => 'id')").head()
    assert(rep.getInt(0) >= 0)
    val vsBefore = TableManifest.versions(s, p)
    val dry = s.sql(s"CALL graft.vacuum(path => '$p', keep => 1, " +
      "dry_run => true)").head()
    assert(dry.getBoolean(2), "dry_run flag echoes")
    assert(TableManifest.versions(s, p) == vsBefore,
      "a dry run must delete NOTHING")
    val predicted = dry.getString(0)
    val real = s.sql(s"CALL graft.vacuum(path => '$p', keep => 1)")
      .head()
    assert(real.getString(0) == predicted,
      s"the real vacuum must reclaim the dry run's prediction: " +
        s"${real.getString(0)} vs $predicted")
    assert(real.getString(1).split(",").length <= 2)
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`")
      .head().getLong(0) == before)
  }

  test("CALL graft.detail: the one-row operational summary tracks " +
    "mutations, tombstones, constraints, mappings, and tags") {
    val p = tmp("detail")
    s.sql(s"CREATE TABLE graft.`$p` (id BIGINT, v BIGINT, " +
      "CONSTRAINT pos CHECK (id >= 0))")
    s.sql(s"INSERT INTO graft.`$p` SELECT id, id * 2 AS v FROM range(10)")
    s.sql(s"DELETE FROM graft.`$p` WHERE id = 3")
    s.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN v TO w")
    s.sql(s"CALL graft.tag(path => '$p', name => 'base')")
    val d = s.sql(s"CALL graft.detail(path => '$p')").head()
    assert(d.getLong(0) == TableManifest.versions(s, p).last)
    assert(d.getLong(1) > 0L, "payload bytes")
    assert(d.getInt(2) >= 2, s"batch dirs: ${d.getInt(2)}")
    assert(d.getInt(3) == 1, "one pending tombstone")
    assert(d.getInt(4) == 1, "one constraint")
    assert(d.getInt(5) == 1, "one live column mapping")
    assert(d.getString(6).startsWith("base="), d.getString(6))
    assert(d.getInt(7) == TableManifest.versions(s, p).size)
    assert(d.getString(9) == "rename", "commit store name surfaced")
    // CALL graft.checkpoint writes the marker-log checkpoint at the
    // head and reads stay exact through it
    val ck = s.sql(s"CALL graft.checkpoint(path => '$p')").head()
    assert(ck.getLong(0) == TableManifest.versions(s, p).last)
    // the detail row now reports the checkpoint head
    val d2 = s.sql(s"CALL graft.detail(path => '$p')").head()
    assert(!d2.isNullAt(8) && d2.getLong(8) == ck.getLong(0),
      "checkpoint_head surfaced after CALL graft.checkpoint")
    val hp = new org.apache.hadoop.fs.Path(s"$p/manifest")
    assert(hp.getFileSystem(s.sparkContext.hadoopConfiguration)
      .listStatus(hp).exists(_.getPath.getName
        .startsWith("ckpt_v")), "checkpoint file on disk")
    assert(s.sql(s"SELECT count(*) FROM graft.`$p`")
      .head().getLong(0) == 9)
  }

  test("CREATE TABLE seeds a zero-row schema snapshot; the first INSERT" +
    " is a keyed append; DROP TABLE removes the path") {
    val p = tmp("ddl") + "/t1"
    s.sql(s"CREATE TABLE graft.`$p` (id BIGINT, v DOUBLE)")
    assert(TableManifest.exists(s, p))
    assert(s.sql(s"SELECT count(*) AS n FROM graft.`$p`")
      .head().getLong(0) == 0)
    s.sql(s"INSERT INTO graft.`$p` VALUES (1, 1.5), (2, 2.5)")
    assert(s.sql(s"SELECT CAST(sum(v) AS DOUBLE) FROM graft.`$p`")
      .head().getDouble(0) == 4.0)
    // CREATE over an existing table refuses
    intercept[Exception](s.sql(s"CREATE TABLE graft.`$p` (id BIGINT)"))
    s.sql(s"DROP TABLE graft.`$p`")
    assert(!TableManifest.exists(s, p))
  }
}
