package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Event-sequence analytics: sequential funnels and cohort retention —
  * the standard product-analytics operators over an event stream.
  */
object FunnelQueries {

  val all: Seq[Q] = Seq(

    // ---- 3-step sequential funnel: view → click → purchase --------------
    // Stage timestamps are STRICTLY sequential: stage n is the first
    // matching event AFTER stage n−1 (not the global min), so a user who
    // purchased before ever clicking does not convert. Three narrow
    // aggregates joined on user_id; at scale each is one shuffle on the
    // same key, and AQE coalesces the joins.
    Q("q_funnel_3step",
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
        val t1 = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val t2 = e.filter(col("event_type") === "click").join(t1, "user_id")
          .filter(col("ts") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val t3 = e.filter(col("event_type") === "purchase").join(t2, "user_id")
          .filter(col("ts") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        t1.join(t2.select(col("user_id"), col("t2")), Seq("user_id"), "left")
          .join(t3.select(col("user_id"), col("t3")), Seq("user_id"), "left")
          .agg(
            count(lit(1)).as("n_stage1"),
            count(col("t2")).as("n_stage2"),
            count(col("t3")).as("n_stage3"))
      },
      Some("""WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
             |            WHERE event_type = 'view' GROUP BY user_id),
             |t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
             |       JOIN t1 ON e.user_id = t1.user_id
             |       WHERE e.event_type = 'click' AND e.ts > t1.t1
             |       GROUP BY e.user_id),
             |t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
             |       JOIN t2 ON e.user_id = t2.user_id
             |       WHERE e.event_type = 'purchase' AND e.ts > t2.t2
             |       GROUP BY e.user_id)
             |SELECT count(*) AS n_stage1, count(t2.t2) AS n_stage2,
             |       count(t3.t3) AS n_stage3
             |FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
             |        LEFT JOIN t3 ON t1.user_id = t3.user_id""".stripMargin)),

    // ---- weekly cohort retention -----------------------------------------
    // Cohort = week of a user's first event; cell (cohort, k) counts users
    // active k weeks after their cohort week. One distinct + one join +
    // one aggregate — each shuffles on user_id / (cohort, k) only.
    Q("q_cohort_retention",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), date_trunc("WEEK", col("ts")).cast("date").as("wk"))
        val cohort = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
        e.distinct().join(cohort, "user_id")
          .withColumn("week_k",
            (datediff(col("wk"), col("cohort_wk")) / 7).cast("long"))
          .groupBy(col("cohort_wk"), col("week_k"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          // ISO string: DATE round-trips as datetime.date via pyarrow but
          // datetime64 via DuckDB — a string is dtype-identical everywhere
          .select(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_wk"),
            col("week_k"), col("n_active"))
          .orderBy(col("cohort_wk"), col("week_k"))
      },
      Some("""WITH w AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
             |cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM w GROUP BY user_id)
             |SELECT strftime(cohort.cohort_wk, '%Y-%m-%d') AS cohort_wk,
             |       date_diff('day', cohort.cohort_wk, wk) // 7 AS week_k,
             |       count(DISTINCT w.user_id) AS n_active
             |FROM w JOIN cohort ON w.user_id = cohort.user_id
             |GROUP BY 1, 2 ORDER BY cohort_wk, week_k""".stripMargin)),

    // ---- last-touch attribution --------------------------------------------
    // Which channel gets credit for each purchase: the user's most recent
    // PRIOR non-purchase event (forward-fill over the user's timeline —
    // the ignore-nulls last_value idiom); purchases with no prior touch
    // attribute to 'direct'. Scale: one window partitioned by user_id
    // (per-task state = one carried value), then a 5-row aggregate.
    Q("q_attribution_last_touch",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, dir)
          .withColumn("__touch",
            last(when(col("event_type") =!= "purchase", col("event_type")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("__touch"), lit("direct")).as("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(floor(col("value") * 100).cast("long")).as("sum_cents"))
          .orderBy(col("channel"))
      },
      Some("""WITH t AS (
             |  SELECT user_id, event_type, value,
             |    last_value(CASE WHEN event_type <> 'purchase'
             |                    THEN event_type END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS touch
             |  FROM events)
             |SELECT coalesce(touch, 'direct') AS channel,
             |  count(*) AS n_purchases,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_cents
             |FROM t WHERE event_type = 'purchase'
             |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
