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
    val raw = p(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        // TIMESTAMP(MICROS) decodes as TIMESTAMP_NTZ; cast to session-local
        // TIMESTAMP (UTC session) so downstream expressions see the same
        // type either way — value-preserving under a UTC session timezone.
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
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
