package graft.telemetry

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class IngestSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session

  /** Mini fixture per FIXTURES.md §1: CamelCase header, nulls in
    * fillna-covered columns, humidity > 100, duplicate epoch per machine. */
  private val csv =
    """MachineID,Type,Location,Timestamp,EngineTemperature,FuelConsumption,VibrationLevel,Humidity,Pressure,PowerOutput,OperatingHours,Status,Status_encoded,Timestamp_epoch,hour,dayofweek,month
      |M001,Truck,Site A,9/1/2025 0:00,80.5,12.1,3.5,55.0,1000.0,120.0,1,Active,0,1756684800,0,0,9
      |M001,Truck,Site A,9/1/2025 1:00,,,,102.1,,,2,Fault,1,1756688400,1,0,9
      |M002,Loader,Site B,9/1/2025 0:00,70.0,9.0,2.0,45.0,950.5,110.0,1,,,1756684800,0,0,9
      |M002,Loader,Site B,9/1/2025 0:00,71.0,9.5,2.1,46.0,951.0,111.0,2,Idle,2,1756684800,0,0,9
      |M003,Excavator,Site D,9/2/2025 13:30,90.0,20.0,7.7,60.0,1100.0,200.0,5,Maintenance,3,,,,
      |""".stripMargin

  private lazy val df = {
    val f = Files.createTempFile("telemetry", ".csv")
    Files.writeString(f, csv)
    Ingest.ingestCsv(spark, f.toString).cache()
  }

  test("canonical lowercase schema with all 17 required columns") {
    assert(TelemetrySchema.requiredColumns.forall(df.columns.contains))
    assert(df.columns.forall(c => c == c.toLowerCase))
    assert(df.count() == 5)
  }

  test("fillna defaults applied per reference (row 2 nulls)") {
    val r = df.filter(df("machineid") === "M001" && df("hour") === 1).head()
    assert(r.getAs[Double]("enginetemperature") == 75.0)
    assert(r.getAs[Double]("fuelconsumption") == 10.0)
    assert(r.getAs[Double]("vibrationlevel") == 3.0)
    assert(r.getAs[Double]("pressure") == 950.0)
    assert(r.getAs[Double]("poweroutput") == 200.0)
    assert(r.getAs[Double]("humidity") == 102.1) // present values untouched
  }

  test("missing status → 'Unknown', status_encoded derived when absent") {
    val r = df.filter(df("machineid") === "M002" && df("operatinghours") === 1.0).head()
    assert(r.getAs[String]("status") == "Unknown")
    val m3 = df.filter(df("machineid") === "M003").head()
    assert(m3.getAs[Int]("status_encoded") == 3) // Maintenance
  }

  test("timestamp parse M/d/yyyy H:mm and derived time parts (Monday=0)") {
    val m3 = df.filter(df("machineid") === "M003").head()
    // 2025-09-02 13:30 UTC — a Tuesday → weekday 1 (pandas convention)
    assert(m3.getAs[Long]("timestamp_epoch") == 1756819800L)
    assert(m3.getAs[Int]("hour") == 13)
    assert(m3.getAs[Int]("dayofweek") == 1)
    assert(m3.getAs[Int]("month") == 9)
  }

  test("precomputed epoch/hour columns are preserved, not recomputed") {
    val r = df.filter(df("machineid") === "M001" && df("hour") === 0).head()
    assert(r.getAs[Long]("timestamp_epoch") == 1756684800L)
  }

  test("robust read quarantines malformed lines instead of failing") {
    val bad = csv +
      """M004,Crane,Site E,9/3/2025 2:00,not_a_number,xxx,yyy,1,2,3,oops,Bad,zz,eee,a,b,c
        |""".stripMargin
    val f = Files.createTempFile("telemetry_bad", ".csv")
    Files.writeString(f, bad)
    val (clean, quarantined) = Ingest.readCsvRobust(spark, f.toString)
    assert(clean.count() == 5, "the 5 well-formed rows survive")
    val q = quarantined.collect().map(_.getString(0))
    assert(q.length == 1 && q.head.startsWith("M004,Crane"),
      "the malformed line lands in quarantine verbatim")
  }
}
