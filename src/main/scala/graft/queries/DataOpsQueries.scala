package graft.queries

import graft.{Q, Tables}
import graft.operators.{Merge, SaltedJoin}
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
             |GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
