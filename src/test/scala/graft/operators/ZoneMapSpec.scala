package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Zone maps on [[TableManifest]]: per-batch min/max stats prune batch
  * partitions at PLANNING time, results stay identical to the unpruned
  * filtered read, and every degraded state (no artifact, a batch with no
  * stats row, fractional bounds, all-null batches, keyed replay) is
  * conservative — never a dropped matching row. */
class ZoneMapSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def rows(lo: Long, hi: Long): DataFrame = {
    import s.implicits._
    (lo to hi).map(i => (i, s"p$i")).toDF("id", "payload")
  }

  /** One execution → (rows, files selected by the planned scan). The
    * numFiles metric is driven by the scan's LAZY partition listing, so
    * it is only valid after the first execution of a plan — re-collecting
    * resets it without re-listing; hence rows and files come from the
    * same single run. */
  private def execAndFiles(df: DataFrame): (Array[org.apache.spark.sql.Row], Long) = {
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = (plan +: plan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan })
      .flatMap(_.collect { case f: FileSourceScanExec => f })
    assert(scans.nonEmpty, s"no file scan in plan:\n$plan")
    (rows, scans.map(_.metrics("numFiles").value).sum)
  }

  test("bloom point lookup prunes scattered batches zone maps cannot") {
    import s.implicits._
    val path = Files.createTempDirectory("bloom_pt").toString
    // ids scattered by residue: every batch spans [0, 3000) — zone maps
    // prove nothing for a point probe; blooms pin each id to its batch
    def residue(r: Long) = (0L until 3000L).filter(_ % 3 == r)
      .map(i => (i, s"p$i")).toDF("id", "payload")
    TableManifest.commitSnapshot(residue(0L), path)
    TableManifest.append(residue(1L), path)
    TableManifest.append(residue(2L), path)
    TableManifest.refreshBloomFilters(s, path, Seq("id"),
      expectedPerBatch = 2000L)
    // all probed ids share residue 1 → exactly one batch survives
    val (prRows, prFiles) = execAndFiles(
      TableManifest.readPoint(s, path, "id", Seq(7L, 301L, 2026L)))
    val (fuRows, fuFiles) = execAndFiles(TableManifest.read(s, path)
      .filter(col("id").isin(7L, 301L, 2026L)))
    assert(prRows.map(_.toSeq).toSet == fuRows.map(_.toSeq).toSet &&
      prRows.length == 3)
    assert(prFiles < fuFiles,
      s"bloom pruning must touch fewer files: $prFiles vs $fuFiles")
    // zone maps CANNOT prune this layout (all batches span the range)
    TableManifest.refreshZoneMaps(s, path, Seq("id"))
    val (_, zmFiles) = execAndFiles(
      TableManifest.readRange(s, path, Seq(("id", 2026L, 2026L))))
    assert(zmFiles == fuFiles,
      "zone maps must be useless on the scattered layout — " +
        "that contrast is the reason blooms exist")
    // absent values → provably-empty read, not a scan
    assert(TableManifest.readPoint(s, path, "id",
      Seq(999999L)).count() == 0)
    // an appended batch the artifact does not cover is read
    // conservatively — never skipped
    TableManifest.append(Seq((4026L, "new")).toDF("id", "payload"), path)
    assert(TableManifest.readPoint(s, path, "id", Seq(4026L)).count() == 1,
      "a bloom-uncovered batch must be read, not proven away")
    // no artifact at all → the plain filtered read
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val pv = graft.operators.IndexManifest
      .payloadVersionAt(s, path, TableManifest.versions(s, path).last,
        "data").get
    f.delete(new org.apache.hadoop.fs.Path(s"$path/bloomstats_v$pv"), true)
    val (nRows, nFiles) = execAndFiles(
      TableManifest.readPoint(s, path, "id", Seq(7L, 301L, 2026L)))
    val (fu2Rows, fu2Files) = execAndFiles(TableManifest.read(s, path)
      .filter(col("id").isin(7L, 301L, 2026L)))
    assert(nRows.map(_.toSeq).toSet == fu2Rows.map(_.toSeq).toSet &&
      nFiles == fu2Files, "no artifact → the plain filtered read")
  }

  test("appendBloomFilters keeps point probes pruned as the log grows") {
    import s.implicits._
    val path = Files.createTempDirectory("bloom_append").toString
    TableManifest.commitSnapshot(
      (0L until 1000L).map(i => (i, s"p$i")).toDF("id", "payload"), path)
    TableManifest.refreshBloomFilters(s, path, Seq("id"),
      expectedPerBatch = 2000L)
    // an append maintained by the batch-level upsert (keyed replay too)
    val b = 0L
    TableManifest.append(
      (5000L until 5100L).map(i => (i, s"p$i")).toDF("id", "payload"),
      path, batchId = Some(b))
    TableManifest.appendBloomFilters(s, path, b, Seq("id"), 2000L)
    TableManifest.append(
      (5000L until 5100L).map(i => (i, s"p$i")).toDF("id", "payload"),
      path, batchId = Some(b)) // replay
    TableManifest.appendBloomFilters(s, path, b, Seq("id"), 2000L)
    // probing an appended id prunes to ITS batch (snapshot not read)
    val (rows1, files1) = execAndFiles(
      TableManifest.readPoint(s, path, "id", Seq(5042L)))
    assert(rows1.length == 1, "replayed bloom rows must stay exact")
    val (_, filesAll) = execAndFiles(TableManifest.read(s, path)
      .filter(col("id") === 5042L))
    assert(files1 < filesAll,
      s"the covered append must prune: $files1 vs $filesAll")
    // probing a snapshot id skips the appended batch
    assert(TableManifest.readPoint(s, path, "id", Seq(7L)).count() == 1)
  }

  test("metadata-only count: exact from stats, exact on fallback") {
    val path = Files.createTempDirectory("zm_count").toString
    TableManifest.commitSnapshot(rows(0L, 99L), path)
    TableManifest.refreshZoneMaps(s, path, Seq("id"))
    assert(TableManifest.countRows(s, path) == 100L)
    // keyed replay must not double the batch's count
    TableManifest.append(rows(200L, 249L), path, batchId = Some(0L))
    TableManifest.appendZoneMaps(s, path, 0L, Seq("id"))
    TableManifest.append(rows(200L, 249L), path, batchId = Some(0L))
    TableManifest.appendZoneMaps(s, path, 0L, Seq("id"))
    assert(TableManifest.countRows(s, path) == 150L)
    // an uncovered batch forces the scan — never a silent undercount
    TableManifest.append(rows(300L, 309L), path)
    assert(TableManifest.countRows(s, path) == 160L)
    // the metadata path really is metadata-only: corrupt every data file
    // of the covered layout and the count must still answer
    TableManifest.refreshZoneMaps(s, path, Seq("id"))
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val pv = graft.operators.IndexManifest
      .payloadVersionAt(s, path, TableManifest.versions(s, path).last,
        "data").get
    val dataDir = new org.apache.hadoop.fs.Path(s"$path/data_v$pv")
    val iter = f.listFiles(dataDir, true)
    var moved = 0
    while (iter.hasNext) {
      val st = iter.next()
      if (st.getPath.getName.endsWith(".parquet")) {
        f.rename(st.getPath, new org.apache.hadoop.fs.Path(
          st.getPath.getParent, st.getPath.getName + ".hidden"))
        moved += 1
      }
    }
    assert(moved > 0)
    assert(TableManifest.countRows(s, path) == 160L,
      "a covered count must never open a data file")
  }

  test("range read prunes disjoint batches at planning time, rows identical") {
    val path = Files.createTempDirectory("zm_prune").toString
    TableManifest.commitSnapshot(rows(0L, 99L), path)
    TableManifest.refreshZoneMaps(s, path, Seq("id"))
    TableManifest.append(rows(1000L, 1099L), path, batchId = Some(0L))
    TableManifest.appendZoneMaps(s, path, 0L, Seq("id"))
    TableManifest.append(rows(2000L, 2099L), path, batchId = Some(1L))
    TableManifest.appendZoneMaps(s, path, 1L, Seq("id"))

    val (prunedRows, prunedFiles) = execAndFiles(
      TableManifest.readRange(s, path, Seq(("id", 1010L, 1020L))))
    val (fullRows, fullFiles) = execAndFiles(TableManifest.read(s, path)
      .filter(col("id") >= 1010L && col("id") <= 1020L))
    assert(prunedRows.map(_.getLong(0)).sorted.toSeq ==
      fullRows.map(_.getLong(0)).sorted.toSeq)
    assert(prunedFiles < fullFiles,
      s"zone map did not prune: $prunedFiles vs $fullFiles files")
  }

  test("no stats artifact → conservative full read, same rows") {
    val path = Files.createTempDirectory("zm_nostats").toString
    TableManifest.commitSnapshot(rows(0L, 49L), path)
    TableManifest.append(rows(500L, 549L), path)
    val r = TableManifest.readRange(s, path, Seq(("id", 500L, 510L)))
    assert(r.count() == 11)
  }

  test("a batch with no stats row is always read") {
    val path = Files.createTempDirectory("zm_partial").toString
    TableManifest.commitSnapshot(rows(0L, 49L), path)
    TableManifest.refreshZoneMaps(s, path, Seq("id"))
    // append WITHOUT appendZoneMaps: its rows must still be served
    TableManifest.append(rows(500L, 549L), path, batchId = Some(0L))
    val r = TableManifest.readRange(s, path, Seq(("id", 500L, 510L)))
    assert(r.count() == 11,
      "rows in a stats-less batch were dropped by pruning")
  }

  test("fractional column bounds are floor/ceil-widened, never over-prune") {
    import s.implicits._
    val path = Files.createTempDirectory("zm_frac").toString
    val d = Seq((1L, 10.4), (2L, 19.6)).toDF("id", "score")
    TableManifest.commitSnapshot(d, path)
    TableManifest.refreshZoneMaps(s, path, Seq("score"))
    // 10.4 floors to 10 and 19.6 ceils to 20: a probe at the widened edge
    // must keep the batch (edge values could exist below/above the long)
    assert(TableManifest.readRange(s, path, Seq(("score", 20L, 25L)))
      .count() == 0)
    assert(TableManifest.readRange(s, path, Seq(("score", 10L, 11L)))
      .count() == 1)
  }

  test("all-null batch is pruned; conjunctive ranges prune on either column") {
    import s.implicits._
    val path = Files.createTempDirectory("zm_null").toString
    TableManifest.commitSnapshot(
      Seq((1L, Some(5L)), (2L, Some(7L))).toDF("id", "x"), path)
    TableManifest.refreshZoneMaps(s, path, Seq("id", "x"))
    TableManifest.append(
      Seq((10L, None: Option[Long])).toDF("id", "x"), path, batchId = Some(0L))
    TableManifest.appendZoneMaps(s, path, 0L, Seq("id", "x"))
    // x is all-null in batch 0 → that batch can never match an x-range
    val (rRows, rFiles) = execAndFiles(
      TableManifest.readRange(s, path, Seq(("x", 0L, 100L))).select("id"))
    assert(rRows.map(_.getLong(0)).toSet == Set(1L, 2L))
    val (_, allFiles) = execAndFiles(TableManifest.read(s, path))
    assert(rFiles < allFiles)
    // conjunction: an id-range matching only batch 0 + an x-range that
    // batch 0 cannot satisfy → empty, with both batches prunable
    assert(TableManifest.readRange(s, path,
      Seq(("id", 10L, 10L), ("x", 0L, 100L))).count() == 0)
  }

  test("keyed replay overwrites the batch's stats row — no double counting") {
    val path = Files.createTempDirectory("zm_replay").toString
    TableManifest.commitSnapshot(rows(0L, 9L), path)
    TableManifest.refreshZoneMaps(s, path, Seq("id"))
    TableManifest.append(rows(100L, 109L), path, batchId = Some(0L))
    TableManifest.appendZoneMaps(s, path, 0L, Seq("id"))
    TableManifest.append(rows(200L, 209L), path, batchId = Some(0L)) // replay
    TableManifest.appendZoneMaps(s, path, 0L, Seq("id"))
    // after replay the batch holds 200..209: a probe at the OLD range must
    // return nothing (and may prune), a probe at the new range everything
    assert(TableManifest.readRange(s, path, Seq(("id", 100L, 109L)))
      .count() == 0)
    assert(TableManifest.readRange(s, path, Seq(("id", 200L, 209L)))
      .count() == 10)
  }
}
