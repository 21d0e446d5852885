package graft.queries

import graft.{Q, Tables}
import graft.operators.{AsOfJoin, LatestPerKey}
import org.apache.spark.sql.functions._

/** Join family. The reference never joins its three tables (SURVEY.md §2.8);
  * these are the natural joins implied by its schema, phrased over testdata,
  * plus the time-series-idiomatic as-of join.
  *
  * Scale notes: dimension sides (customer, part) are broadcast explicitly —
  * at 100 TB the fact side (orders/lineitem/events) never shuffles for these
  * joins; aggregation happens with map-side partials after the broadcast
  * hash join. The as-of join is the union+window formulation (one shuffle,
  * see [[graft.operators.AsOfJoin]]).
  */
object JoinQueries {

  val all: Seq[Q] = Seq(

    // ---- broadcast equi-join + grouped aggregate ------------------------
    Q("q_join_orders_customer",
      (s, dir) => Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("revenue"))
        .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---- broadcast join, filtered dim, decimal-exact revenue ------------
    Q("q_join_lineitem_part",
      (s, dir) => Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter(col("p_size") <= 10)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(5,3)")))
            .cast("double").as("revenue"))
        .orderBy(col("p_brand")),
      Some("""SELECT p_brand, count(*) AS n_items,
             |       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
             |                (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(5,3)))) AS DOUBLE) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_size <= 10
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // ---- left-semi join (EXISTS) ----------------------------------------
    Q("q_semi_join",
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_totalprice") > 300000)
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- left-anti join (NOT EXISTS) ------------------------------------
    Q("q_anti_join",
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- as-of join with tolerance: latest click within 1h before each
    //      error (match outside the tolerance → nulled, row kept) ---------
    Q("q_asof_tolerance",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val err = e.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clk = LatestPerKey.maxBy(
          e.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id"))
            .withColumn("__k", concat_ws("|", col("user_id"), unix_micros(col("ts")))),
          "__k", Seq(col("event_id"))).drop("__k")
        val joined = AsOfJoin.backward(err, clk, "user_id", "ts", "ts",
          Seq("event_id", "ts"))
        val inTol = col("asof_ts").isNotNull &&
          col("asof_ts") >= col("ts") - expr("INTERVAL 1 HOUR")
        joined.select(
            col("event_id"), col("user_id"), col("ts"),
            when(inTol, col("asof_event_id")).otherwise(lit(null)).as("click_id"),
            when(inTol, col("asof_ts")).otherwise(lit(null)).as("click_ts"))
          .orderBy(col("event_id"))
      },
      Some("""WITH err AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
             |clk AS (
             |  SELECT user_id, ts, event_id FROM (
             |    SELECT user_id, ts, event_id,
             |           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
             |    FROM events WHERE event_type = 'click') t WHERE rn = 1)
             |SELECT e.event_id, e.user_id, e.ts,
             |       CASE WHEN c.ts >= e.ts - INTERVAL 1 HOUR THEN c.event_id END AS click_id,
             |       CASE WHEN c.ts >= e.ts - INTERVAL 1 HOUR THEN c.ts END AS click_ts
             |FROM err e ASOF LEFT JOIN clk c
             |  ON e.user_id = c.user_id AND c.ts <= e.ts
             |ORDER BY e.event_id""".stripMargin)),

    // ---- backward as-of join: latest click at/before each error ---------
    Q("q_asof_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val err = e.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        // dedupe right side per (user_id, ts) for deterministic ties
        val clk = LatestPerKey.maxBy(
          e.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id"), col("value"))
            .withColumn("__k", concat_ws("|", col("user_id"), unix_micros(col("ts")))),
          "__k", Seq(col("event_id"))).drop("__k")
        AsOfJoin.backward(err, clk, "user_id", "ts", "ts",
            Seq("event_id", "ts", "value"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof_event_id").as("click_id"),
            col("asof_ts").as("click_ts"),
            col("asof_value").as("click_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH err AS (
             |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'error'),
             |clk AS (
             |  SELECT user_id, ts, event_id, value FROM (
             |    SELECT user_id, ts, event_id, value,
             |           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
             |    FROM events WHERE event_type = 'click') t WHERE rn = 1)
             |SELECT e.event_id, e.user_id, e.ts,
             |       c.event_id AS click_id, c.ts AS click_ts, c.value AS click_value
             |FROM err e ASOF LEFT JOIN clk c
             |  ON e.user_id = c.user_id AND c.ts <= e.ts
             |ORDER BY e.event_id""".stripMargin)),

    // ---- backward as-of join through the CUSTOM PHYSICAL OPERATOR --------
    // Same semantics and oracle as q_asof_join, executed by
    // plans.AsOfMergeJoinExec — the custom logical-node → strategy →
    // SparkPlan pipeline: EnsureRequirements plans the key-clustered
    // exchanges and (key, time) sorts the operator DECLARES, then the
    // exec runs one forward merge pass per partition, O(|L| + |R|).
    // Hash-matching DuckDB's native ASOF JOIN proves the whole custom
    // pipeline end to end in the driver gate, not just in specs.
    Q("q_asof_physical",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val err = e.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val clk = LatestPerKey.maxBy(
          e.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id"), col("value"))
            .withColumn("__k", concat_ws("|", col("user_id"), unix_micros(col("ts")))),
          "__k", Seq(col("event_id"))).drop("__k")
          .select(col("user_id").as("c_uid"), col("ts").as("click_ts"),
            col("event_id").as("click_id"), col("value").as("click_value"))
        graft.plans.PhysicalAsOf.backward(
            err, clk, "user_id", "ts", "c_uid", "click_ts")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("click_id"), col("click_ts"), col("click_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH err AS (
             |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'error'),
             |clk AS (
             |  SELECT user_id, ts, event_id, value FROM (
             |    SELECT user_id, ts, event_id, value,
             |           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
             |    FROM events WHERE event_type = 'click') t WHERE rn = 1)
             |SELECT e.event_id, e.user_id, e.ts,
             |       c.event_id AS click_id, c.ts AS click_ts, c.value AS click_value
             |FROM err e ASOF LEFT JOIN clk c
             |  ON e.user_id = c.user_id AND c.ts <= e.ts
             |ORDER BY e.event_id""".stripMargin)),

    // ---- forward as-of through the custom physical operator --------------
    // q_asof_forward's semantics via AsOfMergeJoinExec's peek-ahead merge
    // (the matched right head can serve several left rows, so it is
    // peeked, never consumed). Same DuckDB ASOF >= oracle.
    Q("q_asof_physical_fwd",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val err = e.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clk = LatestPerKey.maxBy(
          e.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id"))
            .withColumn("__k", concat_ws("|", col("user_id"), unix_micros(col("ts")))),
          "__k", Seq(col("event_id"))).drop("__k")
          .select(col("user_id").as("c_uid"), col("ts").as("next_click_ts"),
            col("event_id").as("next_click_id"))
        graft.plans.PhysicalAsOf.forward(
            err, clk, "user_id", "ts", "c_uid", "next_click_ts")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("next_click_id"), col("next_click_ts"))
          .orderBy(col("event_id"))
      },
      Some("""WITH err AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
             |clk AS (
             |  SELECT user_id, ts, event_id FROM (
             |    SELECT user_id, ts, event_id,
             |           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
             |    FROM events WHERE event_type = 'click') t WHERE rn = 1)
             |SELECT e.event_id, e.user_id, e.ts,
             |       c.event_id AS next_click_id, c.ts AS next_click_ts
             |FROM err e ASOF LEFT JOIN clk c
             |  ON e.user_id = c.user_id AND e.ts <= c.ts
             |ORDER BY e.event_id""".stripMargin)),

    // ---- forward as-of join: earliest click at/after each error ---------
    Q("q_asof_forward",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val err = e.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clk = LatestPerKey.maxBy(
          e.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id"))
            .withColumn("__k", concat_ws("|", col("user_id"), unix_micros(col("ts")))),
          "__k", Seq(col("event_id"))).drop("__k")
        AsOfJoin.forward(err, clk, "user_id", "ts", "ts", Seq("event_id", "ts"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof_event_id").as("next_click_id"),
            col("asof_ts").as("next_click_ts"))
          .orderBy(col("event_id"))
      },
      Some("""WITH err AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
             |clk AS (
             |  SELECT user_id, ts, event_id FROM (
             |    SELECT user_id, ts, event_id,
             |           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
             |    FROM events WHERE event_type = 'click') t WHERE rn = 1)
             |SELECT e.event_id, e.user_id, e.ts,
             |       c.event_id AS next_click_id, c.ts AS next_click_ts
             |FROM err e ASOF LEFT JOIN clk c
             |  ON e.user_id = c.user_id AND e.ts <= c.ts
             |ORDER BY e.event_id""".stripMargin)),

    // ---- keyless interval join via range binning -------------------------
    // "How many lineitems shipped (corpus-wide) during each high-value
    // order's 7-day promo window?" — a point-in-interval join with NO
    // equi-key, which Spark would otherwise plan as
    // BroadcastNestedLoopJoin: O(points × intervals) comparisons, the
    // classic range-join scale killer. RangeJoin.pointInInterval
    // discretizes time into 7-day bins (intervals explode to ≤2 bins,
    // each point hits exactly one) so the plan is an EQUI-join on the bin
    // plus an exact [lo, hi) re-check — work is Σ_bin points·intervals
    // per bin, linear for bounded bin occupancy. PlanShapeSpec asserts no
    // nested-loop/cartesian node survives. Day arithmetic is all-integer
    // (epoch div 86400), so the plain theta-join oracle hash-matches.
    Q("q_range_join_binned",
      (s, dir) => {
        val points = Tables.lineitem(s, dir)
          .select(expr("unix_timestamp(l_shipdate) div 86400L").as("ship_day"),
            col("l_quantity"))
        val promos = Tables.orders(s, dir)
          .filter(col("o_totalprice") > 450000.0)
          .select(col("o_orderkey"),
            expr("unix_timestamp(o_orderdate) div 86400L").as("lo"))
          .withColumn("hi", col("lo") + 7L)
        val shipped = graft.operators.RangeJoin.pointInInterval(
            points, promos, "ship_day", "lo", "hi", binWidth = 7L)
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_shipped"),
            sum(floor(col("l_quantity") * 100)).cast("long").as("qty_cents"))
        promos.join(shipped, Seq("o_orderkey"), "left")
          .select(col("o_orderkey"), col("lo").as("promo_day"),
            coalesce(col("n_shipped"), lit(0L)).as("n_shipped"),
            coalesce(col("qty_cents"), lit(0L)).as("qty_cents"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH promo AS (
             |  SELECT o_orderkey,
             |         CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS lo
             |  FROM orders WHERE o_totalprice > 450000.0),
             |pts AS (
             |  SELECT CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400
             |           AS ship_day,
             |         l_quantity
             |  FROM lineitem),
             |hits AS (
             |  SELECT p.o_orderkey, count(*) AS n_shipped,
             |         CAST(sum(CAST(floor(l.l_quantity * 100) AS BIGINT))
             |           AS BIGINT) AS qty_cents
             |  FROM promo p JOIN pts l
             |    ON l.ship_day >= p.lo AND l.ship_day < p.lo + 7
             |  GROUP BY p.o_orderkey)
             |SELECT p.o_orderkey, p.lo AS promo_day,
             |       coalesce(h.n_shipped, 0) AS n_shipped,
             |       coalesce(h.qty_cents, 0) AS qty_cents
             |FROM promo p LEFT JOIN hits h USING (o_orderkey)
             |ORDER BY p.o_orderkey""".stripMargin)),

    // ---- keyless interval-OVERLAP join via range binning ------------------
    // "Which urgent-order activity windows overlap each high-value promo
    // window?" — intervals on BOTH sides, the case where a naive bin join
    // emits a pair once per shared bin. RangeJoin.intervalOverlap emits
    // each pair only in the bin holding max(lo, lo) — the intersection's
    // first point — so the equi-join is exactly-once with NO distinct
    // stage (spatial tilers call this reference-point dedup). Work stays
    // Σ_bin left·right per bin; all-integer day arithmetic keeps the
    // plain theta-join oracle hash-exact, and the summed overlap LENGTH
    // (not just counts) would expose any duplicate emission loudly.
    Q("q_interval_overlap",
      (s, dir) => {
        val day = (c: String) => expr(s"unix_timestamp($c) div 86400L")
        val promos = Tables.orders(s, dir)
          .filter(col("o_totalprice") > 450000.0)
          .select(col("o_orderkey").as("promo_key"),
            day("o_orderdate").as("p_lo"))
          .withColumn("p_hi", col("p_lo") + 7L)
        val urgents = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("urgent_key"),
            day("o_orderdate").as("u_lo"))
          .withColumn("u_hi", col("u_lo") + 3L)
        graft.operators.RangeJoin.intervalOverlap(
            promos, urgents, "p_lo", "p_hi", "u_lo", "u_hi", binWidth = 7L)
          .groupBy(col("promo_key"), col("p_lo"))
          .agg(count(lit(1)).as("n_overlaps"),
            sum(least(col("p_hi"), col("u_hi")) -
              greatest(col("p_lo"), col("u_lo"))).as("overlap_days"))
          .orderBy(col("promo_key"))
      },
      Some("""WITH promo AS (
             |  SELECT o_orderkey AS promo_key,
             |         CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400
             |           AS p_lo
             |  FROM orders WHERE o_totalprice > 450000.0),
             |p2 AS (SELECT promo_key, p_lo, p_lo + 7 AS p_hi FROM promo),
             |urg AS (
             |  SELECT o_orderkey AS urgent_key,
             |         CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400
             |           AS u_lo
             |  FROM orders WHERE o_orderpriority = '1-URGENT'),
             |u2 AS (SELECT urgent_key, u_lo, u_lo + 3 AS u_hi FROM urg)
             |SELECT promo_key, p_lo, count(*) AS n_overlaps,
             |       CAST(sum(least(p_hi, u_hi) - greatest(p_lo, u_lo))
             |            AS BIGINT) AS overlap_days
             |FROM p2 JOIN u2 ON p_lo < u_hi AND u_lo < p_hi
             |GROUP BY 1, 2 ORDER BY promo_key""".stripMargin))
  )
}
