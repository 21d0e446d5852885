package graft.telemetry

import org.scalatest.funsuite.AnyFunSuite

class OrchestrationSpec extends AnyFunSuite {

  test("withRetry retries once then succeeds (the reference's policy)") {
    var calls = 0
    var retried = 0
    val out = Orchestration.withRetry(retries = 1, delayMillis = 1L,
      onRetry = (_, _) => retried += 1) {
      calls += 1
      if (calls == 1) sys.error("transient")
      "ok"
    }
    assert(out == "ok" && calls == 2 && retried == 1)
  }

  test("withRetry rethrows after attempts are exhausted") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Orchestration.withRetry(retries = 1, delayMillis = 1L) {
        calls += 1
        sys.error("permanent")
      }
    }
    assert(e.getMessage == "permanent" && calls == 2)
  }

  test("daily schedule fires at the next midnight, skipping missed runs") {
    // 2025-09-01 13:45:00 UTC -> 2025-09-02 00:00:00 UTC
    assert(Orchestration.nextDailyRunEpoch(1756734300L) == 1756771200L)
    // exactly at midnight -> the NEXT midnight (no double fire)
    assert(Orchestration.nextDailyRunEpoch(1756771200L) == 1756857600L)
    // a week of missed intervals is skipped, not backfilled
    assert(Orchestration.nextDailyRunEpoch(1756734300L + 7 * 86400L) ==
      1756771200L + 7 * 86400L)
  }
}
