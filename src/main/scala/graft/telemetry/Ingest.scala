package graft.telemetry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV → cleaned canonical telemetry frame — the reference ingest path
  * (DataIngestor, database_and_model_tools.py:37-97) re-expressed as one
  * declarative plan: schema'd scan → rename → null-pad → impute → derive.
  *
  * All narrow ops: at 100 TB this is a single scan pipelined in one stage,
  * no shuffle. The write partitions by machineid so every downstream
  * per-machine query (the whole accessor surface) prunes partitions instead
  * of scanning the fact table; within files, rows are sorted by
  * timestamp_epoch for min/max pruning on time ranges (the Spark analog of
  * the reference's composite index, db.py:134).
  */
object Ingest {
  import TelemetrySchema._

  /** S1: header CSV with explicit schema (no production inference) and
    * non-zero-padded `M/d/yyyy H:mm` timestamp parse (X3). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(csvSchema)
      .csv(path)

  /** S1, fault-tolerant variant: PERMISSIVE parse that quarantines
    * malformed lines into `_corrupt_record` instead of failing the job —
    * at 100 TB a handful of bad lines must never kill a multi-hour ingest.
    * Returns (clean rows, quarantined raw lines). The shared scan is
    * cached (Spark requires materialization before `_corrupt_record` can
    * be filtered); callers that keep a session alive after consuming both
    * sides should `unpersist` either returned frame. */
  def readCsvRobust(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val withCorrupt = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(csvSchema.add("_corrupt_record", "string"))
      .csv(path)
      .cache() // corrupt-record column requires materialization before filter
    (withCorrupt.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      withCorrupt.filter(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record").as("raw_line")))
  }

  /** P1/P3/P5/P2: rename via mapping (fallback lowercase), null-pad missing
    * required columns, impute defaults. */
  def normalize(raw: DataFrame): DataFrame = {
    val renamed = raw.select(raw.columns.toIndexedSeq.map(c =>
      col(s"`$c`").as(columnMapping.getOrElse(c, c.toLowerCase))): _*)
    val padded = requiredColumns.foldLeft(renamed)((d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null)))
    padded
      .na.fill(fillDefaultsNumeric)
      .na.fill(fillDefaultsString)
  }

  /** X3/X4: parse the timestamp string and (re)derive the time parts the
    * reference precomputes in its CSV. `weekday` = Monday=0, matching the
    * pandas `dt.dayofweek` convention of the source data — NOT Spark's
    * Sunday=1 `dayofweek` (SURVEY.md §7.4). */
  def derive(df: DataFrame): DataFrame = {
    val ts = to_timestamp(col("timestamp"), "M/d/yyyy H:mm")
    df.withColumn("timestamp", ts)
      .withColumn("timestamp_epoch",
        coalesce(col("timestamp_epoch"), unix_timestamp(col("timestamp"))))
      .withColumn("hour", coalesce(col("hour"), hour(col("timestamp"))))
      .withColumn("dayofweek", coalesce(col("dayofweek"), weekday(col("timestamp"))))
      .withColumn("month", coalesce(col("month"), month(col("timestamp"))))
      .withColumn("status_encoded",
        coalesce(col("status_encoded"),
          statusCodes.foldLeft(lit(null).cast("int")) { case (acc, (label, code)) =>
            when(col("status") === label, code).otherwise(acc)
          }))
  }

  /** Full pipeline (setup_complete_database analog). */
  def ingestCsv(spark: SparkSession, path: String): DataFrame =
    derive(normalize(readCsv(spark, path)))

  /** S2 sink: partition by machine, sort within files by time — the layout
    * that replaces the reference's 6 secondary indexes (S4). */
  def writeParquet(df: DataFrame, outDir: String): Unit =
    df.repartition(col("machineid"))
      .sortWithinPartitions("machineid", "timestamp_epoch")
      .write.mode("overwrite")
      .partitionBy("machineid")
      .parquet(outDir)

  /** S2 JDBC parity variant — the reference's paged batch insert
    * (database_and_model_tools.py:75-97, `execute_values` with
    * `page_size=1000`) as Spark's JDBC sink: `batchsize` is the page-size
    * analog. Each task opens its own connection and writes its partition
    * in batches, so ingest parallelism = partition count; at scale bound
    * it with `numPartitions`/`repartition(k)` so the database's connection
    * and write limits, not Spark, set the ceiling. */
  def writeJdbc(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000, numPartitions: Option[Int] = None,
      columnTypes: Option[String] = None,
      properties: java.util.Properties = new java.util.Properties): Unit = {
    val bounded = numPartitions.fold(df)(df.repartition(_))
    val w = bounded.write.mode("append")
      .option("batchsize", batchSize.toString)
    // e.g. "machineid VARCHAR(50), status VARCHAR(50)" — mirrors the
    // reference DDL's explicit widths (db.py:81-102); without it some
    // dialects (Derby) create CLOBs, which can't serve pushed-down
    // string predicates
    columnTypes.fold(w)(t => w.option("createTableColumnTypes", t))
      .jdbc(url, table, properties)
  }

  /** JDBC read-back for verification (row-count parity, S9). */
  def readJdbc(spark: SparkSession, url: String, table: String,
      properties: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, properties)
}
