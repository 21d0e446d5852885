package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage/task-count profiler: the bench's wins are mostly
  * action-count reductions (each job on this box costs ~130 ms of driver
  * floor), so the first diagnostic for any slow query is "how many jobs
  * does one invocation run, and how many stages/tasks does each carry".
  * Runs each named registry query twice (first run absorbs JIT/codegen
  * warm-up, second is the steady state the bench medians see) and prints
  * jobs/stages/tasks/seconds for both.
  *
  * Usage: graft.Profile [sfDir] [queryName ...]   (default: headline set)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Bench.headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })

    spark.range(1000000L).selectExpr("sum(id)").collect()

    val qs = SparkEntry.queries
    println(f"${"query"}%-28s ${"run"}%3s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"sec"}%8s")
    names.filter(qs.contains).foreach { name =>
      (1 to 2).foreach { run =>
        // listener events are async: a short settle drains the previous
        // run's tail before zeroing (exact enough for count diagnostics)
        Thread.sleep(300)
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        try {
          qs(name)(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300)
          println(f"$name%-28s $run%3d ${jobs.get}%5d ${stages.get}%6d ${tasks.get}%6d $dt%8.3f")
        } catch {
          case e: Throwable =>
            println(f"$name%-28s $run%3d FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
