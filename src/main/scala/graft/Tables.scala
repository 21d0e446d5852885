package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata star schema (TESTDATA.md / FIXTURES.md §4).
  *
  * All loaders are plain parquet scans — Catalyst pushes filters and column
  * pruning into the scan, so callers should NOT pre-select columns here.
  *
  * `events.ts` is physically INT64 TIMESTAMP(NANOS), which Spark refuses to
  * read as a timestamp; we read it as nanosecond longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds,
  * which is exactly what DuckDB (micro-precision timestamps) does on the
  * same file — required for oracle parity.
  */
object Tables {
  private def p(spark: SparkSession, dir: String, t: String): DataFrame =
    spark.read.parquet(s"$dir/$t.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    p(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
