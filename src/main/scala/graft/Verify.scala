package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run CONCURRENTLY (default 6 workers, SPARK_GRAFT_VERIFY_PAR to
  * override) so the full ~190-query registry fits inside the driver's
  * wall-clock budget — rounds 2/3 showed the driver truncating a
  * sequential run partway (98 then 113 of the registry recorded, the
  * remainder never compared). Each worker owns a `spark.newSession()`
  * clone: same SparkContext and warehouse, but an isolated SQLConf +
  * catalog, so queries that scope session settings (streaming shuffle
  * partitions, state-store provider, legacy parquet flags) or register
  * memory-sink tables cannot interfere across threads. The oracle-SQL
  * dump is written FIRST so a budget kill mid-dump still leaves every
  * already-written query comparable.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd+ args: dump only the named queries (dev re-verify of a
    // changed query without re-running the whole registry)
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "6").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    // Pre-delete this run's output dirs: a query that fails (or never
    // runs before the timeout) must leave a MISSING dir — which the
    // comparator reports — never a stale previous-run result it would
    // silently re-compare as green.
    // Recursive, null-safe delete: the stale path may be a plain file
    // (listFiles() == null) or hold nested dirs (a crashed run's
    // _temporary tree) that a flat two-level delete would silently skip.
    def deleteRec(f: java.io.File): Unit = {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRec)
      f.delete()
    }
    names.foreach { name =>
      val d = new java.io.File(s"$outDir/$name")
      if (d.exists()) deleteRec(d)
    }
    val pool = Executors.newFixedThreadPool(par)
    val t0 = System.nanoTime()
    names.foreach { name =>
      pool.submit(new Runnable {
        def run(): Unit = try {
          val session = spark.newSession()
          SparkEntry.queries(name)(session, sfDir)
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          val dt = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[verify] $name done at $dt%.1f s")
        } catch {
          case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      })
    }
    pool.shutdown()
    if (!pool.awaitTermination(4, TimeUnit.HOURS))
      System.err.println(
        "[verify] TIMEOUT: worker pool did not drain in 4h — dump truncated")
    spark.stop()
  }
}
