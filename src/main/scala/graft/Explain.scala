package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan inspection: prints `explain("formatted")` for the named
  * registry queries (default: the Bench headline set). Used to check that
  * filters/projections reach the parquet scan (PushedFilters/ReadSchema),
  * small sides broadcast, and codegen spans stay wide.
  *
  * Usage: graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Bench.headline
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    names.filter(qs.contains).foreach { name =>
      println(s"\n================ $name ================")
      try qs(name)(spark, sfDir).explain("formatted")
      catch { case e: Throwable =>
        println(s"explain failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
