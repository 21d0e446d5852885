package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SyntheticSourceSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def load(rows: Long, parts: Int) =
    s.read.format("graft-synthetic")
      .option("rows", rows.toString)
      .option("partitions", parts.toString)
      .load()

  test("generates the documented deterministic formulas") {
    val rows = load(1000, 4).orderBy(col("event_id")).collect()
    assert(rows.length == 1000)
    val r7 = rows(7)
    assert(r7.getLong(0) == 7L)
    assert(r7.getLong(1) == 1704067207L)
    assert(r7.getLong(2) == 7L)
    assert(r7.getString(3) == "type2")
    assert(r7.getLong(4) == (7L * 2654435761L) % 1000000L)
  }

  test("event_id range predicates prune input partitions at planning time") {
    val df = load(10000, 10).filter(col("event_id") < 2500)
    assert(df.count() == 2500)
    // 10 partitions of 1000 ids; [0, 2500) overlaps only 3 of them
    assert(SyntheticSource.lastPlannedPartitions.get() == 3)
    // unfiltered scan plans all 10
    assert(load(10000, 10).count() == 10000)
    assert(SyntheticSource.lastPlannedPartitions.get() == 10)
  }

  test("pruned filters stay residual: results never depend on source pruning") {
    // a predicate the source does NOT understand combined with one it does
    val df = load(10000, 10)
      .filter(col("event_id") >= 9000 && col("user_id") % 7 === 0)
    val expect = (9000L until 10000L).count(id => (id % 1000) % 7 == 0)
    assert(df.count() == expect)
    assert(SyntheticSource.lastPlannedPartitions.get() == 1)
  }

  test("Long.MaxValue bounds never wrap into false pruning") {
    import org.apache.spark.sql.functions.col
    val df = load(1000, 4).filter(col("event_id") <= Long.MaxValue)
    assert(df.count() == 1000)
    val eq = load(1000, 4).filter(col("event_id") === Long.MaxValue)
    assert(eq.count() == 0) // genuinely out of range, but no crash/wrap
  }

  test("projection pruning reaches the source: only required columns generate") {
    val n = load(5000, 5).select(col("event_type")).distinct().count()
    assert(n == 5)
    assert(SyntheticSource.lastReadColumns.get() == "event_type")
  }
}
