package graft.telemetry

import org.apache.spark.sql.types._

/** Canonical telemetry schema — the reference's DDL at db.py:81-102 and the
  * ingest column contract at database_and_model_tools.py:21-35.
  */
object TelemetrySchema {

  /** CSV source schema (header order of machine_data_cleaned.csv:1).
    * Types follow the authoritative DDL, not pandas inference. */
  val csvSchema: StructType = StructType(Seq(
    StructField("MachineID", StringType),
    StructField("Type", StringType),
    StructField("Location", StringType),
    StructField("Timestamp", StringType), // parsed M/d/yyyy H:mm in Ingest
    StructField("EngineTemperature", DoubleType),
    StructField("FuelConsumption", DoubleType),
    StructField("VibrationLevel", DoubleType),
    StructField("Humidity", DoubleType),
    StructField("Pressure", DoubleType),
    StructField("PowerOutput", DoubleType),
    StructField("OperatingHours", DoubleType),
    StructField("Status", StringType),
    StructField("Status_encoded", IntegerType),
    StructField("Timestamp_epoch", LongType),
    StructField("hour", IntegerType),
    StructField("dayofweek", IntegerType),
    StructField("month", IntegerType)))

  /** CamelCase → canonical lowercase (database_and_model_tools.py:27-35);
    * columns not in the map fall back to `.toLowerCase`. */
  val columnMapping: Map[String, String] = Map(
    "MachineID" -> "machineid",
    "Type" -> "type",
    "Location" -> "location",
    "Timestamp" -> "timestamp",
    "EngineTemperature" -> "enginetemperature",
    "FuelConsumption" -> "fuelconsumption",
    "VibrationLevel" -> "vibrationlevel",
    "Humidity" -> "humidity",
    "Pressure" -> "pressure",
    "PowerOutput" -> "poweroutput",
    "OperatingHours" -> "operatinghours",
    "Status" -> "status")

  /** The 17 canonical columns every ingested frame must carry; absent ones
    * are null-padded (database_and_model_tools.py:21-26, :79). */
  val requiredColumns: Seq[String] = Seq(
    "machineid", "type", "location", "timestamp",
    "enginetemperature", "fuelconsumption", "vibrationlevel", "humidity",
    "pressure", "poweroutput", "operatinghours", "status",
    "status_encoded", "timestamp_epoch", "hour", "dayofweek", "month")

  /** Imputation defaults (database_and_model_tools.py:60-69). */
  val fillDefaultsNumeric: Map[String, Double] = Map(
    "enginetemperature" -> 75.0,
    "fuelconsumption" -> 10.0,
    "vibrationlevel" -> 3.0,
    "humidity" -> 65.0,
    "pressure" -> 950.0,
    "poweroutput" -> 200.0,
    "operatinghours" -> 0.0)

  val fillDefaultsString: Map[String, String] = Map("status" -> "Unknown")

  /** Status label → code (alphabetical label-encoding observed in the data:
    * Active=0, Fault=1, Idle=2, Maintenance=3). */
  val statusCodes: Seq[(String, Int)] =
    Seq("Active" -> 0, "Fault" -> 1, "Idle" -> 2, "Maintenance" -> 3)

  /** Canonical post-ingest schema — the telemetry DDL (db.py:81-102) with
    * the timestamp parsed. This is the schema `Warehouse.init` declares
    * and `Ingest.ingestCsv` produces. */
  val canonicalSchema: StructType = StructType(Seq(
    StructField("machineid", StringType),
    StructField("type", StringType),
    StructField("location", StringType),
    StructField("timestamp", TimestampType),
    StructField("enginetemperature", DoubleType),
    StructField("fuelconsumption", DoubleType),
    StructField("vibrationlevel", DoubleType),
    StructField("humidity", DoubleType),
    StructField("pressure", DoubleType),
    StructField("poweroutput", DoubleType),
    StructField("operatinghours", DoubleType),
    StructField("status", StringType),
    StructField("status_encoded", IntegerType),
    StructField("timestamp_epoch", LongType),
    StructField("hour", IntegerType),
    StructField("dayofweek", IntegerType),
    StructField("month", IntegerType)))

  /** Fixed ML feature order — load-bearing
    * (database_and_model_tools.py:214-218). */
  val featureOrder: Seq[String] = Seq(
    "fuelconsumption", "vibrationlevel", "humidity", "pressure",
    "poweroutput", "operatinghours", "timestamp_epoch", "hour",
    "dayofweek", "month")
}
