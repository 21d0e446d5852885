package graft.telemetry

import graft.operators.LatestPerKey
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's 18-accessor query API (db.py:187-475) over a canonical
  * telemetry frame — every accessor one declarative plan, with the
  * reference's client-side post-processing (Python sort/slice/refilter,
  * db.py:249-250 et al.) pushed into the engine (SURVEY.md §4's
  * anti-patterns, fixed).
  *
  * One parametrized latest-per-machine implementation covers the nine
  * DISTINCT ON accessors (W1–W9); `orderBy(...).limit(k)` becomes
  * TakeOrderedAndProject (engine-side top-k, no driver collect).
  */
final class TelemetryQueries(telemetry: DataFrame) {

  private val latestOrdNames = Seq("timestamp_epoch", "operatinghours")
  private val latestOrd = latestOrdNames.map(col)

  /** db.py:187-194 — latest n rows for one machine. */
  def latestData(machineId: String, limit: Int): DataFrame =
    telemetry.filter(col("machineid") === machineId)
      .orderBy(col("timestamp_epoch").desc)
      .limit(limit)

  /** db.py:196-202 — ascending time-range scan for one machine. */
  def dataInRange(machineId: String, loEpoch: Long, hiEpoch: Long): DataFrame =
    telemetry.filter(col("machineid") === machineId &&
        col("timestamp_epoch").between(loEpoch, hiEpoch))
      .orderBy(col("timestamp_epoch"))

  /** db.py:204-207 — distinct machine ids, ordered. */
  def machines(): DataFrame =
    telemetry.select(col("machineid")).distinct().orderBy(col("machineid"))

  /** db.py:209-222 — per-machine stats: count, epoch span, 3 sensor means. */
  def machineStats(machineId: String): DataFrame =
    telemetry.filter(col("machineid") === machineId).agg(
      count(lit(1)).as("record_count"),
      min(col("timestamp_epoch")).as("first_epoch"),
      max(col("timestamp_epoch")).as("last_epoch"),
      avg(col("enginetemperature")).as("avg_temperature"),
      avg(col("fuelconsumption")).as("avg_fuel"),
      avg(col("vibrationlevel")).as("avg_vibration"))

  /** db.py:224-233 — dataset-wide summary. */
  def summary(): DataFrame =
    telemetry.agg(
      count(lit(1)).as("total_records"),
      countDistinct(col("machineid")).as("machine_count"),
      min(col("timestamp_epoch")).as("first_epoch"),
      max(col("timestamp_epoch")).as("last_epoch"))

  /** W1–W9 core (db.py:235-301, 390-475): latest row per machine, then
    * top-k on `metric`. `bounds` reproduces the humidity sanity filter
    * (db.py:417-419); ascending sort is NULLS LAST like the reference's
    * `float('inf')` idiom (db.py:430). */
  def latestPerMachineTopK(
      metric: String,
      k: Int,
      ascending: Boolean = false,
      bounds: Option[(Double, Double)] = None): DataFrame = {
    val base = telemetry.filter(col(metric).isNotNull)
    val bounded = bounds.fold(base) { case (lo, hi) =>
      base.filter(col(metric) > lo && col(metric) <= hi)
    }
    // pre-project so max_by's struct (and thus the scan) stays narrow
    val narrow = bounded.select(
      (Seq("machineid", metric, "status") ++ latestOrdNames)
        .distinct.map(col): _*)
    val latest = LatestPerKey.maxBy(narrow, "machineid", latestOrd)
      .select(col("machineid"), col(metric), col("status"),
        col("timestamp_epoch"))
    val ord = if (ascending) col(metric).asc_nulls_last else col(metric).desc
    latest.orderBy(ord, col("machineid")).limit(k)
  }

  def highestTemperature(k: Int): DataFrame =
    latestPerMachineTopK("enginetemperature", k)
  def highestHumidity(k: Int): DataFrame = latestPerMachineTopK("humidity", k)
  def highestVibration(k: Int): DataFrame =
    latestPerMachineTopK("vibrationlevel", k)
  def highestFuel(k: Int): DataFrame = latestPerMachineTopK("fuelconsumption", k)
  def lowestTemperature(k: Int): DataFrame =
    latestPerMachineTopK("enginetemperature", k, ascending = true)
  def lowestHumidity(k: Int): DataFrame =
    latestPerMachineTopK("humidity", k, ascending = true, bounds = Some((0.0, 100.0)))
  def lowestVibration(k: Int): DataFrame =
    latestPerMachineTopK("vibrationlevel", k, ascending = true)
  def lowestFuel(k: Int): DataFrame =
    latestPerMachineTopK("fuelconsumption", k, ascending = true)

  /** W5 (db.py:303-366) — latest status per machine, optional
    * case-insensitive substring filter; the reference's redundant
    * client-side refilter (db.py:347-359) is folded into this predicate. */
  def machinesByStatus(statusFilter: Option[String]): DataFrame = {
    val base = telemetry.filter(col("machineid").isNotNull)
    val filtered = statusFilter.fold(base)(f =>
      base.filter(lower(col("status")).contains(f.toLowerCase)))
    val narrow = filtered.select(
      (Seq("machineid", "status", "enginetemperature", "fuelconsumption",
        "vibrationlevel", "humidity") ++ latestOrdNames)
        .distinct.map(col): _*)
    LatestPerKey.maxBy(narrow, "machineid", latestOrd)
      .select(col("machineid"), col("status"), col("enginetemperature"),
        col("fuelconsumption"), col("vibrationlevel"), col("humidity"),
        col("timestamp_epoch"))
      .orderBy(col("machineid"))
  }

  /** db.py:368-387 — cross-machine comparison aggregate. */
  def machineComparison(): DataFrame =
    telemetry.filter(col("machineid").isNotNull)
      .groupBy(col("machineid"))
      .agg(
        count(lit(1)).as("record_count"),
        avg(col("enginetemperature")).as("avg_temperature"),
        max(col("enginetemperature")).as("max_temperature"),
        avg(col("fuelconsumption")).as("avg_fuel"),
        max(col("fuelconsumption")).as("max_fuel"),
        avg(col("vibrationlevel")).as("avg_vibration"),
        max(col("vibrationlevel")).as("max_vibration"),
        avg(col("humidity")).as("avg_humidity"),
        max(col("humidity")).as("max_humidity"),
        max(col("timestamp_epoch")).as("last_seen_epoch"))
      .orderBy(col("avg_temperature").desc)

  /** S7/X7 (db.py:171-185) — predictions row with JSON-encoded features. */
  def encodePrediction(df: DataFrame, featureCols: Seq[String]): DataFrame =
    df.withColumn("features",
      to_json(struct(featureCols.map(col): _*)))
}
