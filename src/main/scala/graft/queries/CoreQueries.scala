package graft.queries

import graft.{Q, Tables}
import graft.operators.LatestPerKey
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity relational operators (SURVEY.md §2.2–§2.7), phrased over
  * the driver testdata per FIXTURES.md §4: the telemetry latest-per-machine
  * family runs as "latest events row per user_id", grouped stats over
  * events/lineitem, ILIKE over part, time functions over events.ts.
  *
  * Determinism rules (SURVEY.md §7.4): every query ends in a total ORDER BY
  * with a unique tiebreaker; float aggregates go through exact DECIMAL sums
  * and back to double (bit-identical across engines); epoch extraction
  * truncates to seconds on both sides.
  */
object CoreQueries {

  /** Exact decimal-summed mean, emitted as double: deterministic across
    * engines regardless of aggregation order. */
  private def decAvg(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double") / count(lit(1))

  private def decSum(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double")

  val all: Seq[Q] = Seq(

    // ---- §2.5 W1/T3: latest row per key, top-k by metric (desc) ----------
    Q("q_latest_per_user_top",
      (s, dir) => {
        // project BEFORE the dedup: max_by packs its struct from all
        // non-key columns, so pre-selection is what keeps the parquet scan
        // pruned to these 5 columns.
        val e = Tables.events(s, dir).filter(col("value").isNotNull)
          .select(col("user_id"), col("event_type"), col("value"), col("ts"),
            col("event_id"))
        LatestPerKey.maxBy(e, "user_id", Seq(col("ts"), col("event_id")))
          .select(col("user_id"), col("event_type"), col("value"), col("ts"))
          .orderBy(col("value").desc, col("user_id"))
          .limit(5)
      },
      Some("""SELECT user_id, event_type, value, ts FROM (
             |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events WHERE value IS NOT NULL) t
             |WHERE rn = 1 ORDER BY value DESC, user_id LIMIT 5""".stripMargin)),

    // ---- §2.5 W6: latest row per key, bottom-k (asc, nulls last) ---------
    Q("q_latest_per_user_low",
      (s, dir) => {
        val e = Tables.events(s, dir).filter(col("value").isNotNull)
        LatestPerKey.window(e, "user_id", Seq(col("ts"), col("event_id")))
          .select(col("user_id"), col("event_type"), col("value"), col("ts"))
          .orderBy(col("value").asc_nulls_last, col("user_id"))
          .limit(5)
      },
      Some("""SELECT user_id, event_type, value, ts FROM (
             |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events WHERE value IS NOT NULL) t
             |WHERE rn = 1 ORDER BY value ASC NULLS LAST, user_id LIMIT 5""".stripMargin)),

    // ---- §2.5 W7 + §2.3 F5: bounded-domain filter then latest per key ----
    Q("q_latest_per_user_bounded",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .filter(col("value") > 0 && col("value") <= 100)
          .select(col("user_id"), col("event_type"), col("value"), col("ts"),
            col("event_id"))
        LatestPerKey.maxBy(e, "user_id", Seq(col("ts"), col("event_id")))
          .select(col("user_id"), col("event_type"), col("value"))
          .orderBy(col("value").asc, col("user_id"))
          .limit(10)
      },
      Some("""SELECT user_id, event_type, value FROM (
             |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events WHERE value > 0 AND value <= 100) t
             |WHERE rn = 1 ORDER BY value ASC, user_id LIMIT 10""".stripMargin)),

    // ---- §2.5 W5 + §2.3 F4: ILIKE-filtered latest-per-key listing --------
    Q("q_latest_per_user_typefilter",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .filter(lower(col("event_type")).contains("err"))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), col("ts"))
        LatestPerKey.maxBy(e, "user_id", Seq(col("ts"), col("event_id")))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), col("ts"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, event_id, event_type, value, ts FROM (
             |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events WHERE lower(event_type) LIKE '%err%') t
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ---- §2.6 T1 + §2.3 F1/F2: latest-n for one key in a time range ------
    Q("q_user_recent_n",
      (s, dir) => Tables.events(s, dir)
        .filter(col("user_id") === 42 &&
          col("ts").between(lit("2024-01-05 00:00:00").cast("timestamp"),
                            lit("2024-01-25 00:00:00").cast("timestamp")))
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(20),
      Some("""SELECT event_id, ts, event_type, value FROM events
             |WHERE user_id = 42 AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-25 00:00:00'
             |ORDER BY ts DESC, event_id DESC LIMIT 20""".stripMargin)),

    // ---- §2.6 T2: ascending range scan for one key -----------------------
    Q("q_user_range_scan",
      (s, dir) => Tables.events(s, dir)
        .filter(col("user_id") === 7 &&
          col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp"))
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .orderBy(col("ts").asc, col("event_id").asc),
      Some("""SELECT event_id, ts, event_type, value FROM events
             |WHERE user_id = 7 AND ts >= TIMESTAMP '2024-01-10 00:00:00'
             |ORDER BY ts ASC, event_id ASC""".stripMargin)),

    // ---- §2.4 A1: scalar COUNT(*) ---------------------------------------
    Q("q_count_star",
      (s, dir) => Tables.lineitem(s, dir).agg(count(lit(1)).as("cnt")),
      Some("SELECT count(*) AS cnt FROM lineitem")),

    // ---- §2.4 A2: scalar MIN/MAX on the epoch ---------------------------
    Q("q_minmax_epoch",
      (s, dir) => Tables.events(s, dir).agg(
        min(unix_timestamp(col("ts"))).as("min_ep"),
        max(unix_timestamp(col("ts"))).as("max_ep"),
        count(lit(1)).as("n")),
      Some("""SELECT min(CAST(floor(epoch(ts)) AS BIGINT)) AS min_ep,
             |       max(CAST(floor(epoch(ts)) AS BIGINT)) AS max_ep,
             |       count(*) AS n FROM events""".stripMargin)),

    // ---- §2.4 A3: filtered scalar AVG ×3 --------------------------------
    Q("q_avg_filtered",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .agg(
          decAvg(col("l_quantity")).as("avg_qty"),
          decAvg(col("l_extendedprice")).as("avg_price"),
          decAvg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("n")),
      Some("""SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_qty,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_price,
             |       CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_disc,
             |       count(*) AS n
             |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin)),

    // ---- §2.4 A4: COUNT(DISTINCT key) -----------------------------------
    Q("q_count_distinct_users",
      (s, dir) => Tables.events(s, dir).agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_rows")),
      Some("SELECT count(DISTINCT user_id) AS n_users, count(*) AS n_rows FROM events")),

    // ---- §2.4 A5: grouped multi-aggregate + post-agg sort ----------------
    Q("q_user_stats",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("record_count"),
          decAvg(col("value")).as("avg_value"),
          max(col("value")).as("max_value"),
          min(col("value")).as("min_value"),
          max(unix_timestamp(col("ts"))).as("last_ep"))
        .orderBy(col("avg_value").desc, col("user_id")),
      Some("""SELECT user_id, count(*) AS record_count,
             |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_value,
             |       max(value) AS max_value, min(value) AS min_value,
             |       max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_ep
             |FROM events GROUP BY user_id
             |ORDER BY avg_value DESC, user_id""".stripMargin)),

    // ---- §2.4 A6: DISTINCT keys, ordered --------------------------------
    Q("q_distinct_users",
      (s, dir) => Tables.events(s, dir)
        .select(col("user_id")).distinct().orderBy(col("user_id")),
      Some("SELECT DISTINCT user_id FROM events ORDER BY user_id")),

    // ---- §2.3 F4: case-insensitive substring match ----------------------
    Q("q_ilike_part",
      (s, dir) => Tables.part(s, dir)
        .filter(col("p_type").ilike("%and%"))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, p_name, p_type FROM part
             |WHERE p_type ILIKE '%and%' ORDER BY p_partkey""".stripMargin)),

    // ---- §2.2 P2: null imputation (na.fill) -----------------------------
    Q("q_fillna",
      (s, dir) => Tables.events(s, dir)
        .withColumn("v", when(col("value") > 450, lit(null)).otherwise(col("value")))
        .withColumn("etype",
          when(col("event_type") === "error", lit(null)).otherwise(col("event_type")))
        .na.fill(Map("v" -> 0.0, "etype" -> "unknown"))
        .select(col("event_id"), col("v"), col("etype"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |       COALESCE(CASE WHEN value > 450 THEN NULL ELSE value END, 0.0) AS v,
             |       COALESCE(CASE WHEN event_type = 'error' THEN NULL ELSE event_type END, 'unknown') AS etype
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- §2.2 P1/P3/P4/P5: rename, lowercase, aliasing, null padding ----
    Q("q_rename_project",
      (s, dir) => Tables.events(s, dir)
        .select(
          col("event_id").as("id"),
          col("event_type").as("etype"),
          col("value").as("metric"),
          lit(null).cast("double").as("missing_col"))
        .orderBy(col("id")),
      Some("""SELECT event_id AS id, event_type AS etype, value AS metric,
             |       CAST(NULL AS DOUBLE) AS missing_col
             |FROM events ORDER BY id""".stripMargin)),

    // ---- §2.7 X2/X4: epoch + calendar parts (Monday=0 weekday) ----------
    Q("q_time_parts",
      (s, dir) => Tables.events(s, dir)
        .select(
          col("event_id"),
          unix_timestamp(col("ts")).as("ep"),
          hour(col("ts")).as("h"),
          weekday(col("ts")).as("wd"),
          month(col("ts")).as("m"),
          year(col("ts")).as("y"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             |       CAST(hour(ts) AS INT) AS h, CAST(isodow(ts)-1 AS INT) AS wd,
             |       CAST(month(ts) AS INT) AS m, CAST(year(ts) AS INT) AS y
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- §2.7 X5: label ↔ code mapping (CASE WHEN chain) ----------------
    Q("q_status_mapping",
      (s, dir) => Tables.events(s, dir)
        .withColumn("code",
          when(col("event_type") === "click", 0)
            .when(col("event_type") === "error", 1)
            .when(col("event_type") === "purchase", 2)
            .when(col("event_type") === "signup", 3)
            .when(col("event_type") === "view", 4)
            .otherwise(-1))
        .groupBy(col("event_type"), col("code"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("code")),
      Some("""SELECT event_type,
             |       CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
             |            WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
             |            WHEN 'view' THEN 4 ELSE -1 END AS code,
             |       count(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY code""".stripMargin)),

    // ---- §2.7 X7 / §2.1 S7: JSON encode of a struct ---------------------
    Q("q_json_encode",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          to_json(struct(col("event_type"), col("props"))).as("j"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |       to_json(struct_pack(event_type := event_type, props := props))::VARCHAR AS j
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- JSONB read-back: get_json_object -------------------------------
    Q("q_json_extract",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- skew-safe salted aggregation (result ≡ plain GROUP BY) ---------
    Q("q_salted_group_agg",
      (s, dir) => graft.operators.SaltedAgg.countSumMinMax(
          Tables.events(s, dir), "user_id", col("event_id"), col("value"),
          salt = 16)
        .orderBy(col("user_id")),
      Some("""SELECT user_id, count(*) AS n,
             |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
             |       min(value) AS min_v, max(value) AS max_v
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- ordered statistics: exact interpolated percentiles + corr ------
    Q("q_percentile_stats",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"),
          expr("percentile(value, 0.99)").as("p99"),
          floor(corr(col("value"), col("user_id")) * 1e6).cast("long").as("corr_ppm"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |       quantile_cont(value, 0.5) AS p50,
             |       quantile_cont(value, 0.9) AS p90,
             |       quantile_cont(value, 0.99) AS p99,
             |       CAST(floor(corr(value, user_id) * 1e6) AS BIGINT) AS corr_ppm
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- §2.7 X8: numeric coercion with null default (coalesce) ---------
    Q("q_coalesce_default",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          coalesce(get_json_object(col("props"), "$.missing").cast("double"),
            lit(0.0)).as("conf"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |       COALESCE(CAST(json_extract_string(props, '$.missing') AS DOUBLE), 0.0) AS conf
             |FROM events ORDER BY event_id""".stripMargin))
  )
}
