package graft.telemetry

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.time.{LocalDateTime, ZoneOffset}
import scala.util.Random

/** SURVEY §5.2 e2e: a reference-shaped corpus (10 machines × 720 hourly
  * rows, Sept 2025 — the real CSV's shape) through ingest → parquet →
  * the full accessor surface.
  */
class EndToEndSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private val statuses = Seq("Active", "Fault", "Idle", "Maintenance")

  private lazy val telemetryDir: String = {
    val rng = new Random(42)
    val sb = new StringBuilder(
      "MachineID,Type,Location,Timestamp,EngineTemperature,FuelConsumption," +
        "VibrationLevel,Humidity,Pressure,PowerOutput,OperatingHours,Status," +
        "Status_encoded,Timestamp_epoch,hour,dayofweek,month\n")
    val base = LocalDateTime.of(2025, 9, 1, 0, 0)
    for (m <- 1 to 10; h <- 0 until 720) {
      val t = base.plusHours(h)
      val st = statuses(rng.nextInt(4))
      val ep = t.toEpochSecond(ZoneOffset.UTC)
      val temp = if (rng.nextDouble() < 0.02) "" else f"${75 + rng.nextDouble() * 30}%.1f"
      val hum = f"${40 + rng.nextDouble() * 65}%.1f" // some > 100
      sb.append(s"M${"%03d".format(m)},Truck,Site A," +
        s"${t.getMonthValue}/${t.getDayOfMonth}/${t.getYear} ${t.getHour}:00," +
        s"$temp,${f"${10 + rng.nextDouble() * 10}%.1f"},${f"${2 + rng.nextDouble() * 6}%.1f"}," +
        s"$hum,${f"${950 + rng.nextDouble() * 150}%.1f"},${f"${100 + rng.nextDouble() * 140}%.1f"}," +
        s"${h + 1},$st,${statuses.indexOf(st)},$ep,${t.getHour}," +
        s"${t.getDayOfWeek.getValue - 1},${t.getMonthValue}\n")
    }
    val csv = Files.createTempFile("telemetry_e2e", ".csv")
    Files.writeString(csv, sb.toString)
    val out = Files.createTempDirectory("telemetry_e2e_parquet").toString
    Ingest.writeParquet(Ingest.ingestCsv(spark, csv.toString), out)
    out
  }

  private lazy val q = new TelemetryQueries(spark.read.parquet(telemetryDir))

  test("ingest preserves the full 7200-row corpus with partitioned layout") {
    val df = spark.read.parquet(telemetryDir)
    assert(df.count() == 7200)
    assert(df.select("machineid").distinct().count() == 10)
    // fillna left no nulls in imputed columns
    assert(df.filter(df("enginetemperature").isNull).count() == 0)
  }

  test("summary matches corpus shape") {
    val r = q.summary().head()
    assert(r.getAs[Long]("total_records") == 7200)
    assert(r.getAs[Long]("machine_count") == 10)
  }

  test("every latest-per-machine accessor returns one row per machine") {
    Seq(q.highestTemperature(10), q.lowestTemperature(10),
      q.highestHumidity(10), q.highestVibration(10), q.highestFuel(10),
      q.lowestVibration(10), q.lowestFuel(10)).foreach { df =>
      val ms = df.select("machineid").as[String].collect()
      assert(ms.length == ms.distinct.length)
      assert(ms.length == 10)
    }
  }

  test("latest row per machine is epoch 720 of that machine") {
    val rows = q.machinesByStatus(None)
      .select("machineid", "timestamp_epoch").collect()
    val maxEp = spark.read.parquet(telemetryDir)
      .groupBy("machineid").max("timestamp_epoch")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == maxEp(r.getString(0))))
  }

  test("lowestHumidity bounds exclude out-of-range readings") {
    val hums = q.lowestHumidity(10).select("humidity").as[Double].collect()
    assert(hums.forall(h => h > 0 && h <= 100))
  }

  test("machineid filter prunes partitions at the scan (layout-as-index)") {
    val df = spark.read.parquet(telemetryDir)
      .filter($"machineid" === "M001")
    val scan = df.queryExecution.executedPlan.toString
    // partitionBy layout → the predicate becomes a PartitionFilter, so
    // only M001's directory is read — the engine-side replacement for the
    // reference's machineid index.
    assert(scan.contains("PartitionFilters") &&
      scan.contains("machineid"), s"expected partition pruning:\n$scan")
    assert(df.count() == 720)
  }

  test("range scan returns a machine's contiguous window in order") {
    val base = LocalDateTime.of(2025, 9, 1, 0, 0).toEpochSecond(ZoneOffset.UTC)
    val rows = q.dataInRange("M003", base + 10 * 3600, base + 20 * 3600)
      .select("timestamp_epoch").as[Long].collect()
    assert(rows.length == 11)
    assert(rows.sameElements(rows.sorted))
  }

  test("3-table warehouse: init, ingest, log+prediction inserts, count-verify") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft_wh").toString
    val wh = new Warehouse(spark, root)
    wh.init()
    wh.init() // CREATE TABLE IF NOT EXISTS: second init is a no-op
    assert(wh.verifySetup() ==
      Seq("telemetry" -> 0L, "user_query_log" -> 0L, "predictions" -> 0L))

    wh.insertTelemetry(spark.read.parquet(telemetryDir))
    val latest = new TelemetryQueries(wh.table("telemetry")).machinesByStatus(None)
    wh.insertQueryLog(latest
      .select(col("machineid").as("machine_id"),
        col("timestamp_epoch").as("target_time_epoch"))
      .withColumn("role", lit("operator"))
      .withColumn("query", lit("status?"))
      .withColumn("intent", lit("status"))
      .withColumn("confidence", lit(0.9)))
    wh.insertPredictions(latest
      .select(col("machineid").as("machine_id"),
        col("enginetemperature").as("numerical_answer"),
        col("fuelconsumption"), col("vibrationlevel"))
      .withColumn("intent", lit("temperature")),
      featureCols = Seq("fuelconsumption", "vibrationlevel"))

    val counts = wh.verifySetup().toMap
    assert(counts("telemetry") == 7200)
    assert(counts("user_query_log") == 10)
    assert(counts("predictions") == 10)

    // SERIAL analog: ids unique; defaults imputed; features JSON readable
    val preds = wh.table("predictions")
    assert(preds.select("id").distinct().count() == 10)
    assert(preds.filter(col("ts_epoch").isNull).count() == 0)
    val feat = preds.select(
      get_json_object(col("features"), "$.fuelconsumption").cast("double"))
      .as[Double].collect()
    assert(feat.length == 10 && feat.forall(v => v >= 10.0 && v <= 20.0))

    // appends continue the id sequence past the current max
    wh.insertQueryLog(Seq(("operator", "again")).toDF("role", "query"))
    val ids = wh.table("user_query_log").select("id").as[Long].collect()
    assert(ids.length == 11 && ids.distinct.length == 11)
  }

  test("model persistence round-trip: saved and reloaded model scores equal") {
    import org.apache.spark.sql.functions._
    val feats = Seq("fuelconsumption", "vibrationlevel", "humidity", "pressure")
    val df = spark.read.parquet(telemetryDir)
      .filter(col("enginetemperature").isNotNull)
    val model = graft.ml.Models.fitRegressor(
      df, feats, "enginetemperature", maxIter = 5)
    val dir = Files.createTempDirectory("graft_model").toString + "/gbt"
    model.write.overwrite().save(dir)
    val reloaded = org.apache.spark.ml.PipelineModel.load(dir)
    val a = graft.ml.Models.score(model, df, feats)
      .select("machineid", "timestamp_epoch", "prediction")
      .orderBy("machineid", "timestamp_epoch")
      .collect().map(_.getDouble(2))
    val b = graft.ml.Models.score(reloaded, df, feats)
      .select("machineid", "timestamp_epoch", "prediction")
      .orderBy("machineid", "timestamp_epoch")
      .collect().map(_.getDouble(2))
    assert(a.length == 7200)
    assert(a.sameElements(b), "reloaded model must score bit-identically")
  }
  test("warehouse init migrates a legacy (pre-manifest) layout without data loss") {
    // a warehouse written by the pre-TableManifest code: plain parquet
    // rows at the table root, no manifest/. init() must seed the
    // manifest snapshot FROM those rows — an empty seed would silently
    // shadow every pre-upgrade row
    val root = Files.createTempDirectory("wh_migrate").toString
    val legacyRows = Seq(
      (1L, "user", "q1", "intent_a", 0.9, "M001", 100L, 1000L),
      (2L, "user", "q2", "intent_b", 0.8, "M002", 200L, 2000L))
      .toDF(Warehouse.queryLogSchema.fields.map(_.name).toIndexedSeq: _*)
    legacyRows.write.parquet(s"$root/user_query_log")
    val wh = new Warehouse(spark, root)
    wh.init()
    assert(wh.table("user_query_log").count() == 2,
      "legacy rows must survive the manifest migration")
    // and the migrated table keeps working: append continues past max id
    wh.insertQueryLog(Seq(("user", "q3", "intent_c", 0.7))
      .toDF("role", "query", "intent", "confidence"))
    val after = wh.table("user_query_log")
    assert(after.count() == 3)
    assert(after.agg(org.apache.spark.sql.functions.max("id"))
      .head().getLong(0) == 3L)
    // idempotent: a second init neither duplicates nor resets
    wh.init()
    assert(wh.table("user_query_log").count() == 3)
  }
}
