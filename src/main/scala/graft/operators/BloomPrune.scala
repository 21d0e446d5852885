package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning: build a Bloom filter over the build side's
  * join keys, pre-filter the probe side BEFORE its shuffle, then run the
  * exact join to eliminate the filter's false positives.
  *
  * Why it matters at 100 TB: a semi join whose probe side is mostly
  * non-matching still shuffles every probe row to find that out. The
  * Bloom pre-filter drops non-matching rows at the scan (no shuffle,
  * no exchange of the discarded rows) at the cost of a broadcast whose
  * size depends only on |build keys| and the false-positive rate —
  * ~1.2 GB for 10^9 keys at 1% fpp, independent of probe size. The
  * final exact join then touches only the surviving (matching ∪ false
  * positive) fraction.
  *
  * `BloomFilter.putLong/mightContainLong` hash with a fixed algorithm
  * (Guava-style murmur), so the filter is deterministic: same keys →
  * same filter → same survivors. The exact join makes the RESULT
  * independent of fpp either way — which is what the oracle (a plain
  * semi join) verifies.
  *
  * Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects the same
  * shape automatically under AQE when stats justify it; this operator is
  * the explicit form for when the planner can't see the selectivity
  * (e.g. the build side is a computed key set, as in dedup blocklists).
  *
  * The membership probe is a deterministic Scala UDF — there is no
  * public Catalyst expression over a driver-built `BloomFilter`, and the
  * probe runs scan-side before any exchange, so it never sits on the
  * shuffle's critical path.
  */
object BloomPrune {

  /** Exact left-semi join of `probe` against `build`'s keys, Bloom-pruned.
    *
    * @param probe         large side, filtered before its shuffle
    * @param probeKey      long-typed join key column on `probe`
    * @param build         side whose keys define membership
    * @param buildKey      long-typed join key column on `build`
    * @param expectedKeys  sizing hint for the filter
    * @param fpp           false-positive probability (result-neutral) */
  def semiJoin(
      probe: DataFrame,
      probeKey: String,
      build: DataFrame,
      buildKey: String,
      expectedKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    val bloom: BloomFilter =
      build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    probe
      .filter(mightContain(col(probeKey)))
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
        Seq(probeKey), "left_semi")
  }
}
