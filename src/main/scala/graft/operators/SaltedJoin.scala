package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigating equi-join: the classic key-salting rewrite for a
  * shuffle join whose probe side has hot keys (a handful of users own a
  * large fraction of events) and whose build side is too large — or too
  * dynamic — to broadcast.
  *
  * The build side is replicated across `salts` copies (each row emitted
  * once per salt value); the probe side tags every row with a
  * deterministic salt in [0, salts). Joining on (key, salt) then spreads
  * a hot key's probe rows over `salts` reducer partitions instead of
  * funnelling them into one straggler task — the join result is
  * IDENTICAL to the unsalted join, only the partitioning changes.
  *
  * Cost model: build side shuffles ×salts (choose salts ≈ the straggler
  * factor, not hundreds), probe side shuffles once. Spark's AQE
  * skew-join handles the same problem reactively when statistics expose
  * it; this operator is the explicit form for pipelines that know their
  * skew ahead of time (and for sort-merge joins AQE won't split, e.g.
  * under a required output partitioning).
  */
object SaltedJoin {

  /** Inner-join `probe` with `dim` on `keys`, salting `dim` ×`salts`.
    *
    * @param probeSalt deterministic long column over probe rows (e.g. a
    *   multiplicative hash of a unique id) — uniform mod `salts`; MUST
    *   NOT be derived from the join key alone or hot keys stay unsplit.
    */
  def join(probe: DataFrame, dim: DataFrame, keys: Seq[String],
      probeSalt: Column, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val dimS = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val probeS = probe.withColumn("__salt",
      pmod(probeSalt, lit(salts.toLong)).cast("int"))
    probeS.join(dimS, keys :+ "__salt").drop("__salt")
  }
}
