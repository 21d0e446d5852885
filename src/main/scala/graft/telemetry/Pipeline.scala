package graft.telemetry

import graft.ml.Scaler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's 3-task daily pipeline (dags/db_pipeline_dag.py:52-77) as
  * a sequential main: ingest CSV → write partitioned parquet → verify row
  * counts → fit scaler → validate a smoke vector (O1/M7).
  *
  * Usage: graft.telemetry.Pipeline <telemetry.csv> <outDir>
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val Array(csvPath, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("telemetry-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // task 1: init + ingest (DatabaseInitializer.setup_complete_database):
    // all THREE tables of db.py:76-124, then count-verified like
    // verify_database_setup (database_and_model_tools.py:117-125)
    val wh = new Warehouse(spark, outDir)
    wh.init()
    // O2: each task carries the reference DAG's 1-retry policy
    Orchestration.withRetry(retries = 1, delayMillis = 1000L,
      onRetry = (n, e) => println(s"[pipeline] ingest retry $n: ${e.getMessage}")) {
      val cleaned = Ingest.ingestCsv(spark, csvPath)
      wh.insertTelemetry(cleaned)
    }
    val telemetry = wh.table("telemetry")
    val n = telemetry.count()
    println(s"[pipeline] telemetry rows ingested: $n")
    require(n > 0, "ingest produced no rows")

    // exercise the query-log and prediction insert paths (S6/S7): log one
    // query per machine, then persist a per-machine mean-temperature
    // "prediction" with its JSON-encoded feature snapshot (X7)
    wh.insertQueryLog(telemetry
      .groupBy(col("machineid"))
      .agg(max(col("timestamp_epoch")).as("target_time_epoch"))
      .select(col("machineid").as("machine_id"), col("target_time_epoch"))
      .withColumn("role", lit("operator"))
      .withColumn("query", concat(lit("latest status for "), col("machine_id")))
      .withColumn("intent", lit("status"))
      .withColumn("confidence", lit(1.0)))
    wh.insertPredictions(
      telemetry.groupBy(col("machineid").as("machine_id"))
        .agg(avg(col("enginetemperature")).as("numerical_answer"),
          avg(col("fuelconsumption")).as("fuelconsumption"),
          avg(col("vibrationlevel")).as("vibrationlevel"))
        .withColumn("intent", lit("avg_temperature")),
      featureCols = Seq("fuelconsumption", "vibrationlevel"))
    val counts = wh.verifySetup()
    counts.foreach { case (t, c) => println(s"[pipeline] $t: $c rows") }
    require(counts.forall(_._2 > 0), "a warehouse table is empty after setup")

    // task 2 analog: normalize feature naming = canonical lowercase columns
    val feats = TelemetrySchema.featureOrder
    require(feats.forall(telemetry.columns.contains),
      "feature columns missing after ingest")

    // task 3: scaler smoke validation (ScalerTester)
    val stats = Scaler.fit(
      telemetry.select(feats.map(c => col(c).cast("double")): _*), feats)
    val smoke = feats.map {
      case "fuelconsumption" => 10.5
      case "vibrationlevel" => 4.0
      case "humidity" => 68.0
      case "pressure" => 1000.0
      case "poweroutput" => 185.0
      case "operatinghours" => 120.0
      case "timestamp_epoch" => 1.7566848e9
      case "hour" => 12.0
      case "dayofweek" => 2.0
      case "month" => 9.0
    }
    val scaled = Scaler.transformVector(smoke, feats.map(stats))
    println(s"[pipeline] scaled smoke vector: ${scaled.map(v => f"$v%.4f").mkString(", ")}")
    require(scaled.forall(v => !v.isNaN && !v.isInfinite),
      "scaler produced non-finite values (zero-variance clamp failed?)")

    // verification queries over the ingested table (verify_database_setup)
    val q = new TelemetryQueries(telemetry)
    println(s"[pipeline] machines: ${q.machines().count()}")
    q.summary().show(truncate = false)
    q.highestTemperature(5).show(truncate = false)
    spark.stop()
    println("[pipeline] OK")
  }
}
