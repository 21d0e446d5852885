package graft.operators

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches => Theta, UpdateSketch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable Datasketches aggregates beyond Spark's built-in HLL family:
  * KLL quantile sketches (the persist-daily / union-at-query-time pattern
  * for percentiles — no rescan of history) and Theta sketches (distinct
  * sets supporting INTERSECTION, which HLL cannot do — audience overlap).
  *
  * Scale shape, both kinds: one partial sketch per (key, input partition)
  * built imperatively in `mapPartitions` (the documented per-partition
  * imperative escape hatch — a sketch update loop has no Expression
  * form), so only KB-scale sketch bytes ever cross the shuffle, never raw
  * values; then one `mapGroups` merge per key. The serialized form IS the
  * mergeable form: persist the per-day bytes, union any date range later.
  *
  * Estimates are engine-specific (KLL compaction is randomized, Theta
  * retention depends on hash order), so correctness claims are the
  * library's published GUARANTEES — rank error for KLL, set-cardinality
  * confidence bounds for Theta — asserted against exact values, the same
  * discipline as q_approx_sketches / q_heavy_hitters / q_hll_mergeable.
  */
object Sketches {

  // ---------------------------------------------------------------- KLL --

  /** One KLL(k) doubles sketch per (non-null key, partition). Input cols
    * are cast to (string key, double value); null values are skipped. */
  def kllPartials(df: DataFrame, keyCol: String, valCol: String,
      k: Int = 200): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    df.select(col(keyCol).cast("string").as("k"),
        col(valCol).cast("double").as("v"))
      .where(col("k").isNotNull && col("v").isNotNull)
      .as[(String, Double)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, KllDoublesSketch]
        it.foreach { case (key, v) =>
          m.getOrElseUpdate(key, KllDoublesSketch.newHeapInstance(k)).update(v)
        }
        m.iterator.map { case (key, sk) => (key, sk.toByteArray) }
      }
      .toDF(keyCol, "kll")
  }

  /** Merge KLL partials down to one sketch per key (map-side partials
    * already collapsed per partition, so this shuffles sketch bytes only). */
  def kllMergeByKey(partials: DataFrame, keyCol: String,
      k: Int = 200): DataFrame = {
    val sp = partials.sparkSession
    import sp.implicits._
    partials.select(col(keyCol).cast("string"), col("kll"))
      .as[(String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val acc = KllDoublesSketch.newHeapInstance(k)
        it.foreach { case (_, b) => acc.merge(kllFromBytes(b)) }
        (key, acc.toByteArray)
      }
      .toDF(keyCol, "kll")
  }

  def kllFromBytes(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(b))

  // -------------------------------------------------------------- Theta --

  /** One Theta sketch per (non-null key, partition) over a LONG item
    * column — the distinct-set form that supports union AND intersection. */
  def thetaPartials(df: DataFrame, keyCol: String, itemCol: String,
      lgK: Int = 12): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    df.select(col(keyCol).cast("string").as("k"),
        col(itemCol).cast("long").as("v"))
      .where(col("k").isNotNull && col("v").isNotNull)
      .as[(String, Long)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, UpdateSketch]
        it.foreach { case (key, v) =>
          m.getOrElseUpdate(key,
            UpdateSketch.builder().setLogNominalEntries(lgK).build()).update(v)
        }
        m.iterator.map { case (key, sk) =>
          (key, sk.compact(true, null).toByteArray)
        }
      }
      .toDF(keyCol, "theta")
  }

  /** Union Theta partials down to one compact sketch per key. */
  def thetaMergeByKey(partials: DataFrame, keyCol: String,
      lgK: Int = 12): DataFrame = {
    val sp = partials.sparkSession
    import sp.implicits._
    partials.select(col(keyCol).cast("string"), col("theta"))
      .as[(String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
        it.foreach { case (_, b) => u.union(thetaFromBytes(b)) }
        (key, u.getResult.toByteArray)
      }
      .toDF(keyCol, "theta")
  }

  def thetaFromBytes(b: Array[Byte]): CompactSketch =
    Theta.heapifyCompactSketch(Memory.wrap(b))

  /** |A ∩ B| sketch from two serialized Theta sketches. */
  def thetaIntersect(a: Array[Byte], b: Array[Byte]): CompactSketch =
    SetOperation.builder().buildIntersection()
      .intersect(thetaFromBytes(a), thetaFromBytes(b))
}
