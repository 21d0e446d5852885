package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata star schema (TESTDATA.md / FIXTURES.md §4).
  *
  * All loaders are plain parquet scans — Catalyst pushes filters and column
  * pruning into the scan, so callers should NOT pre-select columns here.
  *
  * `events.ts` has appeared in two physical encodings across driver data
  * generations: INT64 TIMESTAMP(NANOS) (which Spark refuses to read as a
  * timestamp — we read it as nanosecond longs via
  * `spark.sql.legacy.parquet.nanosAsLong` and truncate to microseconds,
  * matching DuckDB's micro-precision read of the same file) and plain
  * TIMESTAMP(MICROS) (read as-is). We branch on the decoded Spark type so
  * either generation loads identically.
  */
object Tables {
  private def p(spark: SparkSession, dir: String, t: String): DataFrame =
    spark.read.parquet(s"$dir/$t.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(p(spark, dir, "events"))
  }

  /** Normalize a raw events `ts` (either physical generation — long nanos
    * read under nanosAsLong, or TIMESTAMP(MICROS) decoded as
    * TIMESTAMP_NTZ) to session-local TIMESTAMP. NTZ→LTZ is
    * value-preserving under the UTC session timezone; the single branch
    * here is shared by the batch loader and the streaming source
    * (StreamQueries) so a third encoding generation is a one-place fix. */
  private[graft] def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }

  def lineitem(spark: SparkSession, dir: String): DataFrame  = p(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = p(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = p(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = p(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = p(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = p(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = p(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "embeddings")
}
