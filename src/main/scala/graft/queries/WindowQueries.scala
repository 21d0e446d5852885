package graft.queries

import graft.{Q, Tables}
import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic-window suite, CUBE, array functions, time-series gap-fill with
  * forward fill, and a broadcast range join — the time-series/analytics
  * surface a telemetry engine needs beyond the reference's single
  * latest-per-group window (SURVEY §2.5).
  */
object WindowQueries {

  val all: Seq[Q] = Seq(

    // ---- full analytic-window function suite ----------------------------
    // Deterministic: (ts, event_id) is a unique ordering per user.
    Q("q_window_suite",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(s, dir).select(
          col("event_id"),
          lag("value", 1).over(w).as("prev_value"),
          lead("value", 1).over(w).as("next_value"),
          first("value").over(w).as("first_val"),
          last("value").over(wAll).as("last_val"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("prank"),
          cume_dist().over(w).as("cdist"),
          nth_value(col("value"), 3).over(wAll).as("third_val"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |  lag(value) OVER w AS prev_value,
             |  lead(value) OVER w AS next_value,
             |  first_value(value) OVER w AS first_val,
             |  last_value(value) OVER wa AS last_val,
             |  ntile(4) OVER w AS quartile,
             |  percent_rank() OVER w AS prank,
             |  cume_dist() OVER w AS cdist,
             |  nth_value(value, 3) OVER wa AS third_val
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
             |  wa AS (PARTITION BY user_id ORDER BY ts, event_id
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY event_id""".stripMargin)),

    // ---- CUBE over (event_type, weekday) with grouping bits -------------
    Q("q_cube_agg",
      (s, dir) => Tables.events(s, dir)
        .withColumn("wd", expr("weekday(ts)"))
        .cube(col("event_type"), col("wd"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
          grouping(col("event_type")).cast("int").as("gb_type"),
          grouping(col("wd")).cast("int").as("gb_wd"))
        .orderBy(col("gb_type"), col("gb_wd"),
          col("event_type").asc_nulls_first, col("wd").asc_nulls_first),
      Some("""SELECT event_type, wd, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             |  CAST(grouping(event_type) AS INT) AS gb_type,
             |  CAST(grouping(wd) AS INT) AS gb_wd
             |FROM (SELECT event_type, isodow(ts) - 1 AS wd, value FROM events) t
             |GROUP BY CUBE (event_type, wd)
             |ORDER BY gb_type, gb_wd, event_type NULLS FIRST, wd NULLS FIRST""".stripMargin)),

    // ---- array function suite over grouped collections ------------------
    Q("q_array_funcs",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(array_sort(collect_set(col("event_type"))).as("types"))
        .select(
          col("user_id"),
          size(col("types")).cast("long").as("n_types"),
          array_contains(col("types"), "purchase").as("has_purchase"),
          array_join(col("types"), "|").as("types_str"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |  len(list(DISTINCT event_type)) AS n_types,
             |  list_contains(list(DISTINCT event_type), 'purchase') AS has_purchase,
             |  array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types_str
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- hourly resample + forward fill (gap filling) -------------------
    // Grid = per-user hourly sequence between first and last event; hours
    // with no events carry the previous hour's value forward. Sums are
    // decimal-exact so the filled value is aggregation-order independent.
    Q("q_gapfill_ffill",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val bounds = ev.groupBy(col("user_id")).agg(
          date_trunc("HOUR", min(col("ts"))).as("lo"),
          date_trunc("HOUR", max(col("ts"))).as("hi"))
        val grid = bounds.select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
        val hourly = ev.groupBy(col("user_id"), date_trunc("HOUR", col("ts")).as("h"))
          .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))
        val wFf = Window.partitionBy(col("user_id")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("user_id", "h"), "left")
          .select(col("user_id"), col("h"),
            last(col("v"), ignoreNulls = true).over(wFf).as("v_ff"),
            col("v").isNull.as("is_gap"))
          .orderBy(col("user_id"), col("h"))
      },
      Some("""WITH b AS (SELECT user_id, date_trunc('hour', min(ts)) AS lo,
             |                  date_trunc('hour', max(ts)) AS hi
             |           FROM events GROUP BY user_id),
             |grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 hour)) AS h FROM b),
             |hourly AS (SELECT user_id, date_trunc('hour', ts) AS h,
             |                  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
             |           FROM events GROUP BY 1, 2)
             |SELECT g.user_id, g.h,
             |  last_value(hr.v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.h
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff,
             |  hr.v IS NULL AS is_gap
             |FROM grid g LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h
             |ORDER BY g.user_id, g.h""".stripMargin)),

    // ---- broadcast range (band) join ------------------------------------
    // Non-equi join of the fact table against a tiny banding dimension;
    // the bands side is broadcast so the fact table never shuffles —
    // the scale-correct plan for interval lookups (BroadcastNestedLoop
    // over 10 rows, not an N×M shuffle).
    Q("q_range_band_join",
      (s, dir) => {
        val bands = broadcast(s.range(0, 10).select(
          col("id").as("band_id"),
          (col("id") * 50.0).as("lo"),
          ((col("id") + 1) * 50.0).as("hi")))
        Tables.events(s, dir)
          .join(bands, col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy(col("band_id"), col("lo"), col("hi"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("band_id"))
      },
      Some("""WITH bands AS (SELECT range AS band_id, range * 50.0 AS lo,
             |                      (range + 1) * 50.0 AS hi FROM range(0, 10))
             |SELECT band_id, lo, hi, count(*) AS n,
             |       count(DISTINCT user_id) AS n_users
             |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
             |GROUP BY band_id, lo, hi ORDER BY band_id""".stripMargin)),

    // ---- top-k per group via bounded-buffer typed Aggregator ------------
    // Single ObjectHashAggregate with map-side partials (≤2k candidates
    // per group per partition cross the shuffle) — no global sort, unlike
    // the ROW_NUMBER window the oracle uses.
    Q("q_topk_per_group",
      (s, dir) => TopK.perGroup(
          Tables.events(s, dir), Seq("user_id"), "value", "event_id", k = 3)
        .withColumnsRenamed(Map("value" -> "top_value", "id" -> "top_event_id"))
        .orderBy(col("user_id"), col("rank")),
      Some("""SELECT user_id, CAST(rn AS INT) AS rank, value AS top_value,
             |       event_id AS top_event_id
             |FROM (SELECT user_id, value, event_id,
             |        row_number() OVER (PARTITION BY user_id
             |                           ORDER BY value DESC, event_id) AS rn
             |      FROM events) t
             |WHERE rn <= 3 ORDER BY user_id, rank""".stripMargin)),

    // ---- time-RANGE frame: 1-hour trailing moving aggregate -------------
    // RANGE (not ROWS): the frame is [t−1h, t] in event time, so peers at
    // equal timestamps aggregate identically regardless of row order —
    // deterministic without a tiebreaker. Spark orders by epoch micros,
    // DuckDB by the timestamp itself; bounds are inclusive in both.
    Q("q_moving_time_window",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600000000L, 0L)
        Tables.events(s, dir).select(
            col("event_id"),
            count(lit(1)).over(w).as("n_1h"),
            sum(col("value").cast("decimal(18,6)")).over(w)
              .cast("double").as("sum_1h"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |  count(*) OVER w AS n_1h,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts
             |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // ---- full outer join with unmatched sides on both ends --------------
    Q("q_full_outer_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val o = Tables.orders(s, dir)
          .filter(col("o_orderstatus") === "F")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "both")
              .when(col("c_custkey").isNotNull, "customer_only")
              .otherwise("orders_only").as("side_state"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .groupBy(col("side_state"))
          .agg(count(lit(1)).as("n_keys"), sum(col("n_orders")).as("total_orders"))
          .orderBy(col("side_state"))
      },
      Some("""WITH c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
             |o AS (SELECT o_custkey, count(*) AS n_orders FROM orders
             |      WHERE o_orderstatus = 'F' GROUP BY o_custkey)
             |SELECT CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'both'
             |            WHEN c_custkey IS NOT NULL THEN 'customer_only'
             |            ELSE 'orders_only' END AS side_state,
             |       count(*) AS n_keys,
             |       CAST(sum(coalesce(n_orders, 0)) AS BIGINT) AS total_orders
             |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
             |GROUP BY side_state ORDER BY side_state""".stripMargin))
  )
}
