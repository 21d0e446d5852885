package graft.telemetry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's 3-table database (db.py:76-134: `telemetry`,
  * `user_query_log`, `predictions` + six indexes) as a parquet-backed
  * warehouse directory.
  *
  * Spark-first translation of the DDL surface:
  *  - CREATE TABLE IF NOT EXISTS → idempotent `init()` writing an empty
  *    schema'd parquet directory per table;
  *  - SERIAL PRIMARY KEY → a monotonic surrogate id assigned at insert
  *    (offset past the current max; unique and increasing, not dense —
  *    the same contract a sequence gives under rollbacks);
  *  - DEFAULT CURRENT_TIMESTAMP → `ts_epoch` imputed at insert time;
  *  - the six indexes → physical layout: telemetry partitions by
  *    machineid and sorts by timestamp_epoch within files (Ingest.
  *    writeParquet), log/prediction tables are time-ordered appends
  *    pruned by parquet min/max on ts_epoch. No index maintenance cost.
  *
  * At 100 TB each insert is an append of new files (no rewrite); the
  * count verification (database_and_model_tools.py:117-125) is a
  * metadata-only parquet row-count scan per table.
  */
final class Warehouse(spark: SparkSession, rootDir: String) {

  import Warehouse._

  private def dir(table: String) = s"$rootDir/$table"

  /** CREATE TABLE IF NOT EXISTS ×3 (db.py:76-124). Idempotent.
    *
    * The two append-log tables commit through [[graft.operators
    * .TableManifest]] — every insert is one atomic versioned marker, and
    * the tables gain VERSION AS OF reads and vacuum, the same
    * audit/rollback story the reference gets from transactional Postgres
    * (db.py:74). `telemetry` keeps its machineid-partitioned,
    * time-sorted physical layout (that layout IS its index — S4), so its
    * bulk inserts stay on [[Ingest.writeParquet]]. */
  def init(): Unit = {
    val tPath = new org.apache.hadoop.fs.Path(dir("telemetry"))
    val fs = tPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tPath))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        TelemetrySchema.canonicalSchema)
        .write.parquet(dir("telemetry"))
    Seq("user_query_log" -> queryLogSchema,
        "predictions" -> predictionsSchema)
      .foreach { case (t, schema) =>
        if (graft.operators.TableManifest.versions(spark, dir(t)).isEmpty) {
          // MIGRATE a legacy (pre-manifest) layout: plain parquet files
          // at the table root become the seed snapshot — an empty seed
          // over existing rows would silently shadow them. The seed read
          // is built from the EXPLICIT root-level file list (never the
          // directory): a crashed earlier migration can leave an
          // uncommitted data_v0/pending subdir under the root, and a
          // directory read would either fail on the non-key=value child
          // or double-count the orphan's rows — the retry stays immune
          // by construction. Legacy files stay in place, unread
          // afterwards (table() resolves the manifest).
          val root = new org.apache.hadoop.fs.Path(dir(t))
          val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val legacyFiles =
            if (!fs.exists(root)) Array.empty[String]
            else fs.listStatus(root)
              .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
              .map(_.getPath.toString)
          val seed =
            if (legacyFiles.nonEmpty)
              spark.read.schema(schema).parquet(legacyFiles.toIndexedSeq: _*)
            else spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          graft.operators.TableManifest.commitSnapshot(seed, dir(t))
        }
      }
  }

  def table(name: String): DataFrame = name match {
    case "telemetry" => spark.read.parquet(dir(name))
    case "user_query_log" =>
      graft.operators.TableManifest.read(spark, dir(name), Some(queryLogSchema))
    case "predictions" =>
      graft.operators.TableManifest.read(spark, dir(name), Some(predictionsSchema))
  }

  /** S2: bulk telemetry insert — machineid-partitioned, time-sorted. */
  def insertTelemetry(cleaned: DataFrame): Unit =
    Ingest.writeParquet(cleaned, dir("telemetry"))

  /** S6 (db.py:155-169): append user query-log rows. Missing columns are
    * null-padded; `ts_epoch` defaults to now; ids continue past the
    * current max. */
  def insertQueryLog(rows: DataFrame): Unit =
    appendWithId("user_query_log", rows, queryLogSchema)

  /** S7 (db.py:171-185): append prediction rows, JSON-encoding
    * `featureCols` into the `features` column (X7). */
  def insertPredictions(rows: DataFrame, featureCols: Seq[String]): Unit = {
    val encoded = new TelemetryQueries(table("telemetry"))
      .encodePrediction(rows, featureCols)
    appendWithId("predictions", encoded, predictionsSchema)
  }

  /** SINGLE-WRITER, like the reference's one ETL process: the
    * read-max-then-append id assignment is not atomic, so two concurrent
    * inserts into the same table could both read the same max and emit
    * overlapping id ranges. The ids are unique and increasing per writer
    * (monotonically_increasing_id strides ~2^33 between partitions — gaps,
    * never collisions, within one insert), which matches what a database
    * sequence guarantees to a single session; multi-writer deployments
    * must serialize inserts per table externally (e.g. the scheduler's
    * one-DAG-run-at-a-time policy, Orchestration). */
  private def appendWithId(t: String, rows: DataFrame, schema: StructType): Unit = {
    val offset = table(t).agg(coalesce(max(col("id")), lit(0L))).head().getLong(0)
    val padded = schema.fields.foldLeft(rows) { (d, f) =>
      if (d.columns.contains(f.name)) d
      else if (f.name == "id")
        d.withColumn("id", monotonically_increasing_id() + lit(offset + 1L))
      else if (f.name == "ts_epoch")
        d.withColumn("ts_epoch", unix_timestamp(current_timestamp()))
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    graft.operators.TableManifest.append(
      padded.select(
        schema.fields.toIndexedSeq.map(f => col(f.name).cast(f.dataType)): _*),
      dir(t))
    ()
  }

  /** verify_database_setup (database_and_model_tools.py:117-125):
    * per-table row counts, in declaration order. */
  def verifySetup(): Seq[(String, Long)] =
    Seq("telemetry", "user_query_log", "predictions")
      .map(t => t -> table(t).count())
}

object Warehouse {

  /** db.py:105-114. */
  val queryLogSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("role", StringType),
    StructField("query", StringType),
    StructField("intent", StringType),
    StructField("confidence", DoubleType),
    StructField("machine_id", StringType),
    StructField("target_time_epoch", LongType),
    StructField("ts_epoch", LongType)))

  /** db.py:116-124. */
  val predictionsSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("machine_id", StringType),
    StructField("intent", StringType),
    StructField("numerical_answer", DoubleType),
    StructField("features", StringType),
    StructField("ts_epoch", LongType)))
}
