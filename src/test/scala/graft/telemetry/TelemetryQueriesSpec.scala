package graft.telemetry

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class TelemetryQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  /** (machineid, temperature, humidity, status, epoch, operatinghours) */
  private lazy val telemetry = Seq(
    ("M001", 80.0, 50.0, "Active", 100L, 1.0),
    ("M001", 95.0, 55.0, "Fault", 300L, 3.0),  // latest M001
    ("M001", 85.0, 52.0, "Idle", 200L, 2.0),
    ("M002", 70.0, 45.0, "Active", 300L, 3.0), // latest M002
    ("M002", 99.0, 101.0, "Fault", 100L, 1.0), // high temp but stale
    ("M003", 60.0, 0.0, "Maintenance", 300L, 9.0)) // humidity at bound
    .toDF("machineid", "enginetemperature", "humidity", "status",
      "timestamp_epoch", "operatinghours")
    .withColumn("fuelconsumption", $"enginetemperature" / 10)
    .withColumn("vibrationlevel", $"enginetemperature" / 20)

  private lazy val q = new TelemetryQueries(telemetry)

  test("highestTemperature uses the LATEST row per machine, not the max") {
    val rows = q.highestTemperature(3)
      .select("machineid", "enginetemperature")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // M002's 99.0 is stale — its latest is 70.0
    assert(rows == Seq(("M001", 95.0), ("M002", 70.0), ("M003", 60.0)))
  }

  test("lowestHumidity applies the (0, 100] bounds filter") {
    val rows = q.lowestHumidity(5)
      .select("machineid", "humidity")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // M003's humidity 0.0 excluded (must be > 0); M002's latest 45.0 kept
    assert(rows == Seq(("M002", 45.0), ("M001", 55.0)))
  }

  test("machinesByStatus: filter precedes the latest-per-machine dedup") {
    // Reference semantics (db.py:318): WHERE status ILIKE sits INSIDE the
    // DISTINCT ON query — each machine's latest row AMONG matching rows.
    // M001's latest row overall is Fault; M002 matches via its stale Fault
    // row at epoch 100 (its latest-overall Active row is filtered first).
    val rows = q.machinesByStatus(Some("FAU"))
      .select("machineid", "timestamp_epoch")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("M001", 300L), ("M002", 100L)))
  }

  test("summary counts machines and epoch span") {
    val r = q.summary().head()
    assert(r.getAs[Long]("total_records") == 6)
    assert(r.getAs[Long]("machine_count") == 3)
    assert(r.getAs[Long]("first_epoch") == 100L)
    assert(r.getAs[Long]("last_epoch") == 300L)
  }

  test("latestData returns newest-first limited rows for one machine") {
    val rows = q.latestData("M001", 2)
      .select("timestamp_epoch").as[Long].collect().toSeq
    assert(rows == Seq(300L, 200L))
  }

  test("machineComparison orders by avg temperature descending") {
    val rows = q.machineComparison()
      .select("machineid").as[String].collect().toSeq
    // avg temps: M001 86.67, M002 84.5, M003 60
    assert(rows == Seq("M001", "M002", "M003"))
  }
}
