package graft.queries

import graft.{Q, Tables}
import graft.operators.Knn
import org.apache.spark.sql.functions._

/** Time-series similarity search (cf. "Time Series Similarity Search for
  * Streaming Data in Distributed Systems", EDBT 2019 — PAPERS.md): each
  * user's behavior becomes a dense 24-dim hourly-activity profile, and the
  * nearest neighbor by cosine is found over the profiles.
  *
  * Profiles are exact: per-hour integer-ppm sums / counts, missing hours
  * 0.0 — deterministic doubles in both engines. The pairwise search uses
  * the fused native cosine; at corpus scale the same query drops into
  * [[Knn.nnWithinBucket]] with an LSH/cluster bucket instead of the
  * all-pairs join.
  */
object TimeSeriesQueries {

  private val hours = 0 until 24

  /** Exact 24-dim hourly-activity profile per user (integer-ppm sums /
    * counts, missing hours 0.0 — deterministic doubles in both engines). */
  private def profiles(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), hour(col("ts")).as("h"),
        floor(col("value") * 1e6).cast("long").as("sv"))
    val aggCols =
      hours.map(h => sum(when(col("h") === h, col("sv")).otherwise(0L))
        .as(s"s$h")) ++
      hours.map(h => sum(when(col("h") === h, 1L).otherwise(0L))
        .as(s"n$h"))
    e.groupBy(col("user_id"))
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col("user_id"),
        array(hours.map(h =>
          when(col(s"n$h") > 0,
            col(s"s$h").cast("double") / col(s"n$h") / 1e6)
            .otherwise(lit(0.0))): _*).as("profile"))
  }

  /** DuckDB CTEs producing the same `prof(user_id, profile)` relation. */
  private val profCtes: String = {
    val sCols = hours.map(h =>
      s"sum(CASE WHEN h = $h THEN sv ELSE 0 END) AS s$h").mkString(", ")
    val nCols = hours.map(h =>
      s"sum(CASE WHEN h = $h THEN 1 ELSE 0 END) AS n$h").mkString(", ")
    val profElems = hours.map(h =>
      s"CASE WHEN n$h > 0 THEN CAST(s$h AS DOUBLE) / n$h / 1e6 ELSE 0.0 END")
      .mkString(", ")
    s"""e AS (SELECT user_id, hour(ts) AS h,
       |        CAST(floor(value * 1e6) AS BIGINT) AS sv FROM events),
       |agg AS (SELECT user_id, $sCols, $nCols FROM e GROUP BY user_id),
       |prof AS (SELECT user_id, [$profElems] AS profile FROM agg)""".stripMargin
  }

  val all: Seq[Q] = Seq(

    Q("q_ts_profile_nn",
      (s, dir) => {
        val prof = profiles(s, dir)
        val pairs = prof.as("a").join(prof.as("b"),
            col("a.user_id") =!= col("b.user_id"))
          .select(col("a.user_id").as("user_id"),
            col("b.user_id").as("__nid"),
            Knn.cosine(col("a.profile"), col("b.profile")).as("__sim"))
        pairs.groupBy(col("user_id"))
          .agg(max_by(
            struct(col("__nid"), floor(col("__sim") * 1e6).cast("long").as("__sp")),
            struct(col("__sim"), negate(col("__nid")))).as("__r"))
          .select(col("user_id"), col("__r.__nid").as("nn_user"),
            col("__r.__sp").as("sim_ppm"))
          .orderBy(col("user_id"))
      },
      Some {
        s"""WITH $profCtes,
           |pairs AS (
           |  SELECT a.user_id, b.user_id AS nid,
           |    list_reduce(list_prepend(0::DOUBLE,
           |        list_transform(range(24),
           |          i -> a.profile[i+1] * b.profile[i+1])),
           |      (acc, v) -> acc + v)
           |    / (sqrt(list_reduce(list_prepend(0::DOUBLE,
           |          list_transform(a.profile, v -> v * v)), (acc, v) -> acc + v))
           |     * sqrt(list_reduce(list_prepend(0::DOUBLE,
           |          list_transform(b.profile, v -> v * v)), (acc, v) -> acc + v))) AS sim
           |  FROM prof a JOIN prof b ON a.user_id <> b.user_id)
           |SELECT user_id, nid AS nn_user,
           |       CAST(floor(sim * 1e6) AS BIGINT) AS sim_ppm
           |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
           |              ORDER BY sim DESC, nid) AS rn FROM pairs) t
           |WHERE rn = 1 ORDER BY user_id""".stripMargin
      }),

    // ---- the same search through the ANN scale path ---------------------
    // Profiles drop into Knn.nnWithinBucket behind a sign-LSH bucket with
    // a corpus-derived plane count — the shape the header comment promises
    // for corpus scale. The oracle re-derives the count from count(*) and
    // computes the hyperplane weights in SQL (both pure integer
    // arithmetic + one IEEE division), so it hash-checks at any profile
    // count, not just the driver's 150-user corpus.
    Q("q_ts_profile_nn_lsh",
      (s, dir) => {
        val prof = profiles(s, dir)
        val planes = Knn.planesFor(prof.count(), targetBucket = 8)
        val bucketed = prof.withColumn("bucket",
          Knn.signBucket(col("profile"), dim = 24, planes))
        Knn.nnWithinBucket(bucketed, "user_id", "profile", "bucket")
          .select(col("vec_id").as("user_id"), col("bucket"),
            col("nn_id").as("nn_user"), col("nn_sim_ppm").as("sim_ppm"))
          .orderBy(col("user_id"))
      },
      Some {
        s"""WITH $profCtes,
           |${SimilarityQueries.planesCte("prof")},
           |bk AS (SELECT user_id, profile,
           |         CAST(${SimilarityQueries.dynBucketSql("profile",
                castDouble = false)} AS BIGINT) AS bucket FROM prof, np),
           |pairs AS (
           |  SELECT a.user_id, a.bucket, b.user_id AS nid,
           |    list_reduce(list_prepend(0::DOUBLE,
           |        list_transform(range(24),
           |          i -> a.profile[i+1] * b.profile[i+1])),
           |      (acc, v) -> acc + v)
           |    / (sqrt(list_reduce(list_prepend(0::DOUBLE,
           |          list_transform(a.profile, v -> v * v)), (acc, v) -> acc + v))
           |     * sqrt(list_reduce(list_prepend(0::DOUBLE,
           |          list_transform(b.profile, v -> v * v)), (acc, v) -> acc + v))) AS sim
           |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.user_id <> b.user_id)
           |SELECT user_id, bucket, nid AS nn_user,
           |       CAST(floor(sim * 1e6) AS BIGINT) AS sim_ppm
           |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
           |              ORDER BY sim DESC, nid) AS rn FROM pairs) t
           |WHERE rn = 1
           |ORDER BY user_id""".stripMargin
      }),

    // ---- resample + linear interpolation over hourly gaps ---------------
    // Per-user hourly averages are resampled onto the user's full hour
    // grid (sequence+explode — linear in output rows, no driver loop) and
    // gaps are filled by linear interpolation between the bracketing known
    // points: prev/next via last/first IGNORE NULLS windows. Every filled
    // value is a deterministic elementwise double expression (decimal-exact
    // avg, then pv + (nv-pv)·frac with the identical op tree in DuckDB),
    // so the whole series hash-matches. Scale: one shuffle to the
    // (user, hour) aggregate, one window per direction — all key-partition
    // parallel; the grid never materializes on the driver.
    Q("q_ts_interpolate",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val known = Tables.events(s, dir)
          .groupBy(col("user_id"),
            expr("(unix_timestamp(ts) div 3600) * 3600").as("hour_ep"))
          .agg((sum(col("value").cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("v"))
        val grid = known.groupBy(col("user_id"))
          .agg(min(col("hour_ep")).as("h0"), max(col("hour_ep")).as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"), lit(3600L))).as("hour_ep"))
        val wPrev = Window.partitionBy(col("user_id")).orderBy(col("hour_ep"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wNext = Window.partitionBy(col("user_id")).orderBy(col("hour_ep"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val knownHour = when(col("v").isNotNull, col("hour_ep"))
        grid.join(known, Seq("user_id", "hour_ep"), "left")
          .select(col("user_id"), col("hour_ep"), col("v"),
            last(col("v"), ignoreNulls = true).over(wPrev).as("pv"),
            last(knownHour, ignoreNulls = true).over(wPrev).as("ph"),
            first(col("v"), ignoreNulls = true).over(wNext).as("nv"),
            first(knownHour, ignoreNulls = true).over(wNext).as("nh"))
          .select(col("user_id"), col("hour_ep"),
            when(col("v").isNotNull, col("v"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                ((col("hour_ep") - col("ph")).cast("double") /
                  (col("nh") - col("ph")).cast("double"))).as("filled"),
            when(col("v").isNull, 1).otherwise(0).cast("int").as("is_interp"))
          .orderBy(col("user_id"), col("hour_ep"))
      },
      Some("""WITH known AS (
             |  SELECT user_id,
             |    (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hour_ep,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS v
             |  FROM events GROUP BY 1, 2),
             |grid AS (
             |  SELECT user_id,
             |    unnest(generate_series(min(hour_ep), max(hour_ep), 3600)) AS hour_ep
             |  FROM known GROUP BY user_id),
             |j AS (
             |  SELECT g.user_id, g.hour_ep, k.v
             |  FROM grid g LEFT JOIN known k
             |    ON g.user_id = k.user_id AND g.hour_ep = k.hour_ep),
             |w AS (
             |  SELECT user_id, hour_ep, v,
             |    last_value(v IGNORE NULLS) OVER wp AS pv,
             |    last_value(CASE WHEN v IS NOT NULL THEN hour_ep END IGNORE NULLS)
             |      OVER wp AS ph,
             |    first_value(v IGNORE NULLS) OVER wn AS nv,
             |    first_value(CASE WHEN v IS NOT NULL THEN hour_ep END IGNORE NULLS)
             |      OVER wn AS nh
             |  FROM j
             |  WINDOW wp AS (PARTITION BY user_id ORDER BY hour_ep
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  wn AS (PARTITION BY user_id ORDER BY hour_ep
             |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, hour_ep,
             |  CASE WHEN v IS NOT NULL THEN v
             |       ELSE pv + (nv - pv) * (CAST(hour_ep - ph AS DOUBLE)
             |                              / CAST(nh - ph AS DOUBLE)) END AS filled,
             |  CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_interp
             |FROM w ORDER BY user_id, hour_ep""".stripMargin)),

    // ---- CUSUM changepoint detection ---------------------------------------
    // Where each event type's value level shifts: the classic CUSUM
    // statistic D_t = |n·cumsum_t − t·total| (the cumulative deviation
    // from the series mean, scaled by n to stay integral) peaks at the
    // most likely changepoint. Reports, per type, the peak position and
    // scaled deviation with a first-peak tie rule. Scale: one prefix-sum
    // window partitioned by type (parallel across types; a type that
    // outgrows a partition takes the bucket-stitched rank of
    // q_shard_assign), then a single max_by hash aggregate — the series
    // itself never leaves its partition.
    Q("q_cusum_changepoint",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
          .select(col("event_type"), col("ts"), col("event_id"),
            floor(col("value") * 100).cast("long").as("cents"))
        val wOrd = Window.partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val wAll = wOrd.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        ev.withColumn("rn", row_number().over(wOrd).cast("long"))
          .withColumn("cs", sum(col("cents")).over(wOrd))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("tot", sum(col("cents")).over(wAll))
          .withColumn("dev", abs(col("n") * col("cs") - col("rn") * col("tot")))
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n_events"),
            max_by(col("rn"), struct(col("dev"), -col("rn"))).as("peak_pos"),
            max(col("dev")).as("peak_dev"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (
             |  SELECT event_type, ts, event_id,
             |         CAST(floor(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |w AS (
             |  SELECT event_type,
             |    CAST(row_number() OVER (PARTITION BY event_type
             |      ORDER BY ts, event_id) AS BIGINT) AS rn,
             |    CAST(sum(cents) OVER (PARTITION BY event_type
             |      ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND CURRENT ROW) AS BIGINT) AS cs,
             |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             |    CAST(sum(cents) OVER (PARTITION BY event_type)
             |         AS BIGINT) AS tot
             |  FROM e),
             |d AS (SELECT event_type, rn, n, abs(n * cs - rn * tot) AS dev
             |      FROM w)
             |SELECT event_type, n AS n_events, rn AS peak_pos,
             |       CAST(dev AS BIGINT) AS peak_dev
             |FROM d
             |QUALIFY row_number() OVER (PARTITION BY event_type
             |                           ORDER BY dev DESC, rn) = 1
             |ORDER BY event_type""".stripMargin)),

    // ---- seasonal baseline profile + residual anomalies --------------------
    // The forecasting-prep primitive: a (event_type × hour-of-day)
    // seasonal profile — the naive seasonal baseline — and, per cell, how
    // many observations sit above their own cell's mean (the residual
    // side of anomaly triage; z-score against the GLOBAL mean lives in
    // q_anomaly_zscore, this is the seasonality-adjusted counterpart).
    // Scale: one hash aggregate to ≤ types×24 rows, broadcast back to a
    // second scan for the above-mean counts — the profile moves, the
    // events never shuffle. avg is the decimal-exact sum / count idiom
    // (order-free); the above-mean comparison multiplies through by the
    // cell count so BOTH sides compare integers (no division rounding).
    Q("q_seasonal_baseline",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type"), hour(col("ts")).as("h"),
            col("value").cast("decimal(18,6)").as("v"))
        val prof = ev.groupBy(col("event_type"), col("h"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("__sv"))
        ev.join(broadcast(prof), Seq("event_type", "h"))
          .groupBy(col("event_type"), col("h"))
          .agg(max(col("n")).as("n"),
            (max(col("__sv")).cast("double") / max(col("n"))).as("avg_value"),
            sum(when(col("v") * col("n") > col("__sv"), 1L).otherwise(0L))
              .as("n_above_mean"))
          .orderBy(col("event_type"), col("h"))
      },
      Some("""WITH e AS (
             |  SELECT event_type, CAST(hour(ts) AS INT) AS h,
             |         CAST(value AS DECIMAL(18,6)) AS v
             |  FROM events),
             |p AS (
             |  SELECT event_type, h, count(*) AS n, sum(v) AS sv
             |  FROM e GROUP BY 1, 2)
             |SELECT e.event_type, e.h, CAST(max(p.n) AS BIGINT) AS n,
             |  CAST(max(sv) AS DOUBLE) / max(p.n) AS avg_value,
             |  CAST(sum(CASE WHEN e.v * p.n > p.sv THEN 1 ELSE 0 END)
             |       AS BIGINT) AS n_above_mean
             |FROM e JOIN p USING (event_type, h)
             |GROUP BY 1, 2 ORDER BY event_type, h""".stripMargin)),

    // ---- OHLC downsampling (per-key hourly bars) --------------------------
    // The metrics/finance resample shape: per (user, hour) emit open (first
    // value by time), high, low, close (last value by time), count. The
    // engine side is ONE hash aggregate — min_by/max_by on (ts, event_id)
    // are algebraic partials, so no window, no per-key sort, map-side
    // combine at 100 TB; the window formulation the oracle uses is exactly
    // what this plan avoids. (ts, event_id) is a total order, so
    // first/last are deterministic under any arrival order.
    Q("q_ohlc_downsample",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"),
            unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ep"),
            col("ts"), col("event_id"), col("value"))
        ev.groupBy(col("user_id"), col("hour_ep"))
          .agg(
            min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
            count(lit(1)).as("n"))
          .orderBy(col("user_id"), col("hour_ep"))
      },
      Some("""WITH e AS (
             |  SELECT user_id,
             |    CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
             |      AS hour_ep,
             |    ts, event_id, value
             |  FROM events),
             |r AS (
             |  SELECT user_id, hour_ep, value,
             |    row_number() OVER (PARTITION BY user_id, hour_ep
             |                       ORDER BY ts, event_id) AS rf,
             |    row_number() OVER (PARTITION BY user_id, hour_ep
             |                       ORDER BY ts DESC, event_id DESC) AS rl
             |  FROM e)
             |SELECT user_id, hour_ep,
             |  max(CASE WHEN rf = 1 THEN value END) AS open,
             |  max(value) AS high, min(value) AS low,
             |  max(CASE WHEN rl = 1 THEN value END) AS close,
             |  count(*) AS n
             |FROM r GROUP BY 1, 2 ORDER BY user_id, hour_ep""".stripMargin))
  )
}
