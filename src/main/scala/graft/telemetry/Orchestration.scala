package graft.telemetry

/** O2 (dags/db_pipeline_dag.py:45-58): the reference DAG's task policy —
  * 1 retry with a fixed delay, daily schedule, no catchup — as a
  * scheduler-agnostic utility. The engine deliberately does NOT embed a
  * scheduler (SURVEY §2.10: Airflow/cron owns WHEN; this library owns
  * WHAT); `withRetry` is the per-task policy a driver main wraps its
  * stages in, and [[nextDailyRunEpoch]] is the no-catchup schedule
  * arithmetic a thin cron shim needs.
  */
object Orchestration {

  /** Run `task`, retrying up to `retries` times after `delayMillis` —
    * the reference's `retries=1, retry_delay=60s` policy is the default.
    * Rethrows the last failure once attempts are exhausted.
    *
    * Only non-fatal failures are retried: VM errors (OutOfMemoryError et
    * al.) propagate immediately rather than sleeping through a doomed
    * driver, and a task-thrown InterruptedException re-asserts the
    * interrupt flag and propagates so shutdown isn't delayed. */
  def withRetry[T](retries: Int = 1, delayMillis: Long = 60000L,
      onRetry: (Int, Throwable) => Unit = (_, _) => ())(task: => T): T = {
    var attempt = 0
    while (true) {
      try return task
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw e
        case scala.util.control.NonFatal(e) if attempt < retries =>
          attempt += 1
          onRetry(attempt, e)
          Thread.sleep(delayMillis)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Next `@daily` fire time at/after `nowEpoch`, with no catchup: always
    * the NEXT midnight UTC — missed intervals are skipped, never
    * backfilled (catchup=False, dags/db_pipeline_dag.py:57). */
  def nextDailyRunEpoch(nowEpoch: Long): Long = {
    val day = 86400L
    (nowEpoch / day + 1) * day
  }
}
