package graft.queries

import graft.{Q, Tables}
import graft.operators.{BloomPrune, Merge, SaltedJoin}
import org.apache.spark.sql.functions._

/** Warehouse-maintenance data operations: batch merge/upsert and explicit
  * skew-salted joins. Both oracle-checked against the semantically-plain
  * SQL form — the operators change the PLAN (partitioning, straggler
  * behavior), never the result.
  */
object DataOpsQueries {

  val all: Seq[Q] = Seq(

    // ---- batch MERGE / SCD1 upsert ---------------------------------------
    // A change set (every 7th order re-priced +100.00) folded into the
    // snapshot via Merge.upsert (left-anti + union: one key shuffle per
    // side, no in-place rewrite). The oracle is the per-row CASE form —
    // same result, different plan; money compared as exact integer cents.
    Q("q_merge_upsert",
      (s, dir) => {
        val base = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .withColumn("was_updated", lit(false))
        val updates = base.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 100.0)
          .withColumn("was_updated", lit(true))
        Merge.upsert(base, updates, Seq("o_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"),
            floor(col("o_totalprice") * 100).cast("long").as("price_cents"),
            col("was_updated"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  CAST(floor((CASE WHEN o_orderkey % 7 = 0
             |              THEN o_totalprice + 100.0
             |              ELSE o_totalprice END) * 100) AS BIGINT) AS price_cents,
             |  o_orderkey % 7 = 0 AS was_updated
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- skew-salted fact-dim join ---------------------------------------
    // events (hot users own outsized row counts) joined to a per-user dim
    // through SaltedJoin: the dim replicates ×16, each event picks a salt
    // from a multiplicative hash of its unique event_id, and a hot user's
    // rows spread over 16 reducer partitions instead of one straggler.
    // The oracle is the plain unsalted join — identical result by
    // construction, which is exactly what the hash compare proves.
    Q("q_skew_salted_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val dim = ev.groupBy(col("user_id")).agg(count(lit(1)).as("u_events"))
        SaltedJoin.join(
            ev.select(col("user_id"), col("event_type"), col("event_id")),
            dim, Seq("user_id"),
            probeSalt = col("event_id") * 2654435761L, salts = 16)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"), sum(col("u_events")).as("sum_u_events"))
          .orderBy(col("event_type"))
      },
      Some("""WITH dim AS (
             |  SELECT user_id, count(*) AS u_events FROM events GROUP BY user_id)
             |SELECT event_type, count(*) AS n_rows,
             |       CAST(sum(u_events) AS BIGINT) AS sum_u_events
             |FROM events e JOIN dim USING (user_id)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- Bloom-pruned semi join ------------------------------------------
    // lineitem restricted to high-value orders via BloomPrune: the
    // build-side key set becomes a broadcast Bloom filter that drops
    // non-matching lineitem rows AT THE SCAN, before any exchange; the
    // exact semi join then only touches survivors. The oracle is the
    // plain IN-subquery semi join — the Bloom filter is result-neutral
    // (false positives are re-checked, false negatives impossible),
    // which is precisely what the hash compare proves.
    Q("q_bloom_join",
      (s, dir) => {
        val highValue = Tables.orders(s, dir)
          .filter(col("o_totalprice") > 400000.0)
        BloomPrune.semiJoin(
            Tables.lineitem(s, dir), "l_orderkey",
            highValue, "o_orderkey", expectedKeys = 4096)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            sum(floor(col("l_quantity") * 100)).as("qty_cents"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n_rows,
             |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
             |    AS qty_cents
             |FROM lineitem
             |WHERE l_orderkey IN (
             |  SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )
}
