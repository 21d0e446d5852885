package graft.telemetry

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S2 JDBC parity variant (database_and_model_tools.py:75-97): the paged
  * batch insert against a real embedded JDBC database (Derby, in-memory)
  * — write with batchsize=1000, read back, verify counts and values
  * round-trip (the S9 verification applied to the JDBC path).
  */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val cleaned = {
    val csv =
      """MachineID,Type,Location,Timestamp,EngineTemperature,FuelConsumption,VibrationLevel,Humidity,Pressure,PowerOutput,OperatingHours,Status,Status_encoded,Timestamp_epoch,hour,dayofweek,month
        |M001,Truck,Site A,9/1/2025 0:00,80.1,12.0,3.1,60.0,1000.0,150.0,1,Active,0,1756684800,0,0,9
        |M001,Truck,Site A,9/1/2025 1:00,81.5,12.5,3.3,61.0,1001.0,151.0,2,Active,0,1756688400,1,0,9
        |M002,Truck,Site B,9/1/2025 0:00,,13.0,4.0,62.0,1002.0,152.0,1,Fault,1,1756684800,0,0,9
        |M002,Truck,Site B,9/1/2025 1:00,79.0,13.5,4.2,63.0,1003.0,153.0,2,Idle,2,1756688400,1,0,9
        |""".stripMargin
    val f = Files.createTempFile("jdbc_sink", ".csv")
    Files.writeString(f, csv)
    Ingest.ingestCsv(spark, f.toString)
  }

  // db.py:81-102's explicit VARCHAR widths for the string columns
  private val ddlTypes =
    "machineid VARCHAR(50), type VARCHAR(100), location VARCHAR(100), " +
      "status VARCHAR(50)"

  test("batched JDBC insert round-trips rows and values") {
    Ingest.writeJdbc(cleaned, url, "telemetry_jdbc", batchSize = 1000,
      numPartitions = Some(2), columnTypes = Some(ddlTypes))
    val back = Ingest.readJdbc(spark, url, "telemetry_jdbc")
    assert(back.count() == 4)
    // values survive the sink (imputation happened before the write)
    val m2 = back.filter($"machineid" === "M002")
      .orderBy($"timestamp_epoch")
      .select("enginetemperature", "status", "timestamp_epoch")
      .collect()
    assert(m2.length == 2)
    assert(m2(0).getDouble(0) == 75.0) // fillna default for the empty cell
    assert(m2(0).getString(1) == "Fault")
    assert(m2(1).getLong(2) == 1756688400L)
  }

  test("append mode accumulates batches (the reference's repeated ingest)") {
    Ingest.writeJdbc(cleaned, url, "telemetry_jdbc_append")
    Ingest.writeJdbc(cleaned, url, "telemetry_jdbc_append")
    assert(Ingest.readJdbc(spark, url, "telemetry_jdbc_append").count() == 8)
  }
}
