package graft

import graft.operators.{IncrementalAgg, SearchIndex, TableManifest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The round-9 table layer as ONE runnable main — the lakehouse loop a
  * production deployment runs per ingest cycle, composed entirely from
  * the library's operators:
  *
  *   snapshot → appends (exactly-once keyed) → DELETE WHERE →
  *   maintain (fold + zone maps + Blooms + retention) →
  *   change feed → incremental view maintenance (never a re-aggregate)
  *   → CDF-driven search-index sync (never a rebuild) →
  *   pruned serving probes (range / point / metadata count / BM25)
  *
  * Every stage prints its report; the final stage cross-checks the
  * maintained view and the synced index against from-scratch
  * recomputation — the pipeline fails loudly if any incremental path
  * diverged.
  *
  * Usage: graft.LakehousePipeline <sfDir> <workDir>
  */
object LakehousePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val work = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_lake").toString
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("lakehouse-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = run(spark, sfDir, work)
    println(counts.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", s""","work":"$work"}"""))
    spark.stop()
  }

  /** The pipeline body — every `require` is a loud cross-check, so a
    * normal return means all incremental paths verified. Returns the
    * stage counts. */
  def run(spark: SparkSession, sfDir: String,
      work: String): Seq[(String, Long)] = {
    val (tPath, sPath, iPath) =
      (s"$work/docs", s"$work/view", s"$work/index")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))

    // stage 1: land the corpus — a snapshot plus keyed append drops
    val v0 = TableManifest.commitSnapshot(
      docs.filter(col("doc_id") % 3 === 0), tPath)
    val v1 = TableManifest.append(docs.filter(col("doc_id") % 3 === 1),
      tPath, batchId = Some(0L))
    TableManifest.append(docs.filter(col("doc_id") % 3 === 1), tPath,
      batchId = Some(0L)) // an at-least-once replay: must not double
    val v2 = TableManifest.append(docs.filter(col("doc_id") % 3 === 2),
      tPath, batchId = Some(1L))
    val rowsLanded = TableManifest.read(spark, tPath).count()
    println(s"[lake] landed versions $v0/$v1/$v2, rows=$rowsLanded")

    // stage 2: the standing consumers initialize ONCE
    SearchIndex.build(TableManifest.read(spark, tPath), "doc_id", "text",
      iPath)
    IncrementalAgg.maintainTable(spark, tPath, sPath, Seq("source"),
      "n_chars")
    println(s"[lake] index + view initialized")

    // stage 3: a mutation cycle — GDPR-style erasure plus a fresh drop
    val vDel = TableManifest.deleteWhere(spark, tPath,
      "doc_id % 17 = 0")
    val vNew = TableManifest.append(
      docs.filter(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L), tPath)
    println(s"[lake] mutated: delete@$vDel, drop@$vNew")

    // stage 4: incremental consumers fold ONLY the changes
    val feedRows = TableManifest
      .readChanges(spark, tPath, v2, vNew).count()
    IncrementalAgg.maintainTable(spark, tPath, sPath, Seq("source"),
      "n_chars")
    SearchIndex.syncFromTable(spark, tPath, iPath, v2, vNew, "doc_id",
      "text")
    println(s"[lake] folded $feedRows change rows into view + index")

    // stage 5: maintenance policy — fold the log, refresh pruning
    // artifacts, expire old versions
    val report = TableManifest.maintain(spark, tPath, maxBatches = 1,
      keepVersions = 2, statsCols = Seq("doc_id"),
      bloomCols = Seq("doc_id", "source"), expectedPerBatch = 1000000L)
      .head()
    println(s"[lake] maintain: $report")

    // stage 6: pruned serving probes on the maintained table
    val maxId = TableManifest.read(spark, tPath)
      .agg(max(col("doc_id"))).head().getLong(0)
    val nRange = TableManifest.readRange(spark, tPath,
      Seq(("doc_id", 0L, maxId / 4))).count()
    val nPoint = TableManifest.readPointString(spark, tPath, "source",
      Seq("src1")).count()
    val nMeta = TableManifest.countRows(spark, tPath)
    val top = SearchIndex.bm25Pruned(spark, iPath,
      Seq("dup", "batch", "scan"), 5).count()
    println(s"[lake] probes: range=$nRange point=$nPoint meta=$nMeta " +
      s"bm25=$top")

    // stage 7: the incremental paths must equal recomputation — loudly
    val viewNow = TableManifest.read(spark, sPath).drop("__asof")
    val recomputed = IncrementalAgg.initialize(
      TableManifest.read(spark, tPath), Seq("source"), "n_chars")
    require(viewNow.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(viewNow).isEmpty,
      "maintained view diverged from recomputation")
    val freshIdx = s"$work/index_fresh"
    SearchIndex.build(TableManifest.read(spark, tPath), "doc_id", "text",
      freshIdx)
    val served = SearchIndex.bm25(spark, iPath, Seq("dup", "batch"), 20)
      .collect().toSeq
    val fresh = SearchIndex.bm25(spark, freshIdx, Seq("dup", "batch"), 20)
      .collect().toSeq
    require(served == fresh, "synced index diverged from a fresh build")
    require(nMeta == TableManifest.read(spark, tPath).count(),
      "metadata count diverged from the scan")
    println("[lake] incremental view = recompute, synced index = fresh " +
      "build - pipeline verified")
    Seq("rows_landed" -> rowsLanded,
      "change_rows_folded" -> feedRows, "rows_final" -> nMeta,
      "range_probe" -> nRange, "point_probe" -> nPoint,
      "bm25_top" -> top)
  }
}
