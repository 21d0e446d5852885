package graft.queries

import graft.{Q, Tables}
import graft.ml.{DetIsolationForest, IsolationForest}
import org.apache.spark.sql.functions._

/** ML-adjacent operators. The standardization/anomaly queries use
  * decimal-exact sums → double arithmetic with an op tree written
  * identically on both engines, so even variance/z-scores compare exactly.
  * Isolation forest has no SQL equivalent → rows-only check + unit tests.
  */
object MLQueries {

  // shared fragment: per-event_type stats with exact decimal sums
  private val statsSql =
    """SELECT event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_d,
      |       CAST(sum(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE) AS ssq_d
      |FROM events GROUP BY event_type""".stripMargin

  private val zSql =
    "(value - (sum_d / n)) / sqrt(ssq_d / n - (sum_d / n) * (sum_d / n))"

  val all: Seq[Q] = Seq(

    // ---- M2: standard scaling as z-score per group (population std) -----
    Q("q_zscore_events",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val stats = e.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_d"),
          sum((col("value") * col("value")).cast("decimal(38,10)"))
            .cast("double").as("ssq_d"))
        e.join(broadcast(stats), "event_type")
          .withColumn("__mean", col("sum_d") / col("n"))
          .withColumn("__z", (col("value") - col("__mean")) /
            sqrt(col("ssq_d") / col("n") - col("__mean") * col("__mean")))
          .select(col("event_id"), col("event_type"),
            floor(col("__z") * 1e6).cast("long").as("z_ppm"))
          .orderBy(col("event_id"))
      },
      Some(s"""WITH stats AS ($statsSql)
              |SELECT event_id, events.event_type,
              |       CAST(floor($zSql * 1e6) AS BIGINT) AS z_ppm
              |FROM events JOIN stats ON events.event_type = stats.event_type
              |ORDER BY event_id""".stripMargin)),

    // ---- M5-lite: |z| > 3 anomaly flagging ------------------------------
    Q("q_anomaly_zscore",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val stats = e.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_d"),
          sum((col("value") * col("value")).cast("decimal(38,10)"))
            .cast("double").as("ssq_d"))
        e.join(broadcast(stats), "event_type")
          .withColumn("__mean", col("sum_d") / col("n"))
          .withColumn("__z", (col("value") - col("__mean")) /
            sqrt(col("ssq_d") / col("n") - col("__mean") * col("__mean")))
          .filter(abs(col("__z")) > 3)
          .select(col("event_id"), col("event_type"), col("value"),
            floor(col("__z") * 1e6).cast("long").as("z_ppm"))
          .orderBy(col("event_id"))
      },
      Some(s"""WITH stats AS ($statsSql)
              |SELECT event_id, events.event_type, value,
              |       CAST(floor($zSql * 1e6) AS BIGINT) AS z_ppm
              |FROM events JOIN stats ON events.event_type = stats.event_type
              |WHERE abs($zSql) > 3
              |ORDER BY event_id""".stripMargin)),

    // ---- M5: isolation forest (custom, no SQL equivalent → rows-only) ---
    Q("q_iforest_top_anomalies",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("h", hour(col("ts")).cast("double"))
          .withColumn("wd", weekday(col("ts")).cast("double"))
        val feats = Seq("value", "h", "wd")
        val model = IsolationForest.fit(e, feats, nTrees = 50, seed = 42L)
        IsolationForest.scoreAll(s, e, feats, model)
          .select(col("event_id"), col("value"),
            floor(col("anomaly_score") * 1e6).cast("long").as("score_ppm"))
          .orderBy(col("score_ppm").desc, col("event_id"))
          .limit(100)
      },
      None),

    // ---- M5 det: hash-split isolation forest, fully oracled -------------
    // Same anomaly semantics (shallow isolation + sparse leaves = low
    // score), but every split is a pure function of (tree, depth, node) +
    // global feature ranges, so the ENTIRE forest walk is replayed by the
    // DuckDB mirror — the hash-checkable sibling of the spec-tested
    // classic forest above. Integer-exact scoring end to end (the leaf
    // adjustment is the rational surrogate documented in
    // DetIsolationForest's scaladoc — no transcendental ln to desync
    // engines). Scale: nTrees-way explode + maxDepth codegen projections;
    // occupancy tables ≤ nTrees·2^maxDepth rows, broadcast; corpus never
    // shuffles.
    Q("q_iforest_det",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("h", hour(col("ts")).cast("double"))
          .withColumn("wd", weekday(col("ts")).cast("double"))
          .select(col("event_id"), col("value"), col("h"), col("wd"))
        DetIsolationForest.score(e, idCols = Seq("event_id", "value"),
            featCols = Seq("value", "h", "wd"))
          .orderBy(col("iso_score"), col("event_id"))
          .limit(100)
      },
      Some(DetIsolationForest.oracleSql("events",
        idCols = Seq("event_id", "value"),
        featSql = Seq("value", "hour(ts)", "isodow(ts) - 1")))),

    // ---- deterministic 80/20 train/test split ---------------------------
    // The scale-correct analog of the reference's sklearn split
    // (database_and_model_tools train path, n=5760 ≙ 80%): assignment is a
    // pure function of the row key — reproducible across runs, engines,
    // partitionings, and re-ingests, with no RNG state to coordinate.
    Q("q_train_test_split",
      (s, dir) => Tables.events(s, dir)
        .withColumn("split",
          when(pmod(col("event_id") * 2654435761L, lit(100)) < 80, "train")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .orderBy(col("split")),
      Some("""SELECT CASE WHEN (event_id * 2654435761) % 100 < 80
             |            THEN 'train' ELSE 'test' END AS split,
             |       count(*) AS n, count(DISTINCT user_id) AS n_users,
             |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY split ORDER BY split""".stripMargin)),

    // ---- smoothed target encoding (categorical feature engineering) ------
    // The classic high-cardinality categorical encoder: replace each
    // category with a shrunk mean of the target, enc = (Σy + prior·m) /
    // (n + m) — low-count categories pull toward the global prior
    // (m = 50 virtual rows). All integer-cent arithmetic. Scale: one hash
    // aggregate to category cardinality + a broadcast scalar; the encoder
    // table then broadcast-joins back onto any scoring scan.
    Q("q_target_encode",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("__c", floor(col("value") * 100).cast("long"))
        val prior = ev.agg(expr("sum(__c) div count(1)").as("__p"))
        ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("__c")).as("sum_cents"))
          .crossJoin(broadcast(prior))
          .select(col("event_type"), col("n"), col("sum_cents"),
            col("__p").as("prior_cents"),
            expr("(sum_cents + __p * 50L) div (n + 50L)").as("enc_cents"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (
             |  SELECT event_type,
             |         CAST(floor(value * 100) AS BIGINT) AS c FROM events),
             |p AS (SELECT CAST(sum(c) AS BIGINT) // count(*) AS p FROM e)
             |SELECT event_type, count(*) AS n,
             |  CAST(sum(c) AS BIGINT) AS sum_cents,
             |  p.p AS prior_cents,
             |  (CAST(sum(c) AS BIGINT) + p.p * 50) // (count(*) + 50)
             |    AS enc_cents
             |FROM e, p GROUP BY event_type, p.p
             |ORDER BY event_type""".stripMargin)),

    // ---- distributed OLS via normal equations, exact integer solve -------
    // Linear regression y = β₁·hour + β₂·weekday + β₀ (cents) the way a
    // 100 TB fit actually runs: ONE scan accumulates the 9 second-moment
    // sums (map-side combinable longs — X is 3-wide, so XᵀX is 9
    // numbers regardless of row count), then Cramer's rule solves the
    // 3×3 system in 128-bit integer arithmetic (decimal(38,0) ↔
    // HUGEINT). No float ever appears, so the fit is bit-identical on
    // any engine or cluster size — unlike gradient descent or float
    // Cholesky. Determinant reported as a string (exceeds int64; the
    // comparator would float-ize a 128-bit value). β in ppm via
    // sign·(|det_i|·1e6 div |det|) — truncation-toward-zero decomposed
    // explicitly because Spark `div` truncates while DuckDB `//` floors,
    // and they only agree on non-negatives.
    Q("q_linreg_normal",
      (s, dir) => {
        Tables.events(s, dir)
          .selectExpr("CAST(hour(ts) AS LONG) AS x1",
            "CAST(weekday(ts) AS LONG) AS x2",
            "CAST(floor(value * 100) AS LONG) AS y")
          .selectExpr("count(1) AS n", "sum(x1) AS s1", "sum(x2) AS s2",
            "sum(x1*x1) AS s11", "sum(x2*x2) AS s22", "sum(x1*x2) AS s12",
            "sum(y) AS sy", "sum(x1*y) AS s1y", "sum(x2*y) AS s2y")
          .selectExpr("n",
            "CAST(s1 AS DECIMAL(38,0)) AS s1", "CAST(s2 AS DECIMAL(38,0)) AS s2",
            "CAST(s11 AS DECIMAL(38,0)) AS s11", "CAST(s22 AS DECIMAL(38,0)) AS s22",
            "CAST(s12 AS DECIMAL(38,0)) AS s12", "CAST(sy AS DECIMAL(38,0)) AS sy",
            "CAST(s1y AS DECIMAL(38,0)) AS s1y", "CAST(s2y AS DECIMAL(38,0)) AS s2y",
            "CAST(n AS DECIMAL(38,0)) AS nd")
          .selectExpr("n",
            "s11*(s22*nd - s2*s2) - s12*(s12*nd - s2*s1) + s1*(s12*s2 - s22*s1) AS det",
            "s1y*(s22*nd - s2*s2) - s12*(s2y*nd - s2*sy) + s1*(s2y*s2 - s22*sy) AS det1",
            "s11*(s2y*nd - sy*s2) - s1y*(s12*nd - s2*s1) + s1*(s12*sy - s2y*s1) AS det2",
            "s11*(s22*sy - s2*s2y) - s12*(s12*sy - s1*s2y) + s1y*(s12*s2 - s22*s1) AS det0")
          .selectExpr("n", "CAST(det AS STRING) AS det_str",
            "CAST(sign(det1)*sign(det) AS BIGINT) * CAST((abs(det1)*1000000) div abs(det) AS BIGINT) AS beta1_ppm",
            "CAST(sign(det2)*sign(det) AS BIGINT) * CAST((abs(det2)*1000000) div abs(det) AS BIGINT) AS beta2_ppm",
            "CAST(sign(det0)*sign(det) AS BIGINT) * CAST((abs(det0)*1000000) div abs(det) AS BIGINT) AS beta0_ppm")
      },
      Some("""WITH e AS (
             |  SELECT CAST(hour(ts) AS BIGINT) AS x1,
             |         CAST(isodow(ts) - 1 AS BIGINT) AS x2,
             |         CAST(floor(value * 100) AS BIGINT) AS y FROM events),
             |m AS (
             |  SELECT count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
             |         sum(x1*x1) AS s11, sum(x2*x2) AS s22, sum(x1*x2) AS s12,
             |         sum(y) AS sy, sum(x1*y) AS s1y, sum(x2*y) AS s2y
             |  FROM e),
             |d AS (
             |  SELECT CAST(n AS BIGINT) AS n, CAST(n AS HUGEINT) AS nd,
             |    CAST(s1 AS HUGEINT) AS s1, CAST(s2 AS HUGEINT) AS s2,
             |    CAST(s11 AS HUGEINT) AS s11, CAST(s22 AS HUGEINT) AS s22,
             |    CAST(s12 AS HUGEINT) AS s12, CAST(sy AS HUGEINT) AS sy,
             |    CAST(s1y AS HUGEINT) AS s1y, CAST(s2y AS HUGEINT) AS s2y
             |  FROM m),
             |dets AS (
             |  SELECT n,
             |    s11*(s22*nd - s2*s2) - s12*(s12*nd - s2*s1) + s1*(s12*s2 - s22*s1) AS det,
             |    s1y*(s22*nd - s2*s2) - s12*(s2y*nd - s2*sy) + s1*(s2y*s2 - s22*sy) AS det1,
             |    s11*(s2y*nd - sy*s2) - s1y*(s12*nd - s2*s1) + s1*(s12*sy - s2y*s1) AS det2,
             |    s11*(s22*sy - s2*s2y) - s12*(s12*sy - s1*s2y) + s1y*(s12*s2 - s22*s1) AS det0
             |  FROM d)
             |SELECT n, CAST(det AS VARCHAR) AS det_str,
             |  CAST(sign(det1)*sign(det) AS BIGINT)
             |    * CAST((abs(det1)*1000000) // abs(det) AS BIGINT) AS beta1_ppm,
             |  CAST(sign(det2)*sign(det) AS BIGINT)
             |    * CAST((abs(det2)*1000000) // abs(det) AS BIGINT) AS beta2_ppm,
             |  CAST(sign(det0)*sign(det) AS BIGINT)
             |    * CAST((abs(det0)*1000000) // abs(det) AS BIGINT) AS beta0_ppm
             |FROM dets""".stripMargin)),

    // ---- winsorization (outlier clipping at exact rank percentiles) ------
    // Feature prep for outlier-sensitive models: per event_type, clip
    // `value` to its [p5, p95] band. Thresholds come from EXACT ranks
    // (row_number at ⌊5n/100⌋ / ⌊95n/100⌋+1) so both engines agree
    // bit-for-bit — percentile_cont/approx interpolate differently
    // across engines. Scale: the rank window sorts within each type
    // (parallel across types); at 100 TB the thresholds would come from
    // an approx-quantile sketch instead — the clip/aggregate shape
    // (broadcast thresholds, one scan) is identical.
    Q("q_winsorize",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
          .withColumn("__c", floor(col("value") * 100).cast("long"))
        val wRn = Window.partitionBy(col("event_type"))
          .orderBy(col("__c"), col("event_id"))
        val wN = Window.partitionBy(col("event_type"))
        val ranked = ev
          .withColumn("__rn", row_number().over(wRn).cast("long"))
          .withColumn("__n", count(lit(1)).over(wN))
        val lo = ranked
          .filter(col("__rn") === greatest(expr("__n * 5 div 100"), lit(1L)))
          .select(col("event_type"), col("__c").as("lo_cents"))
        val hi = ranked
          .filter(col("__rn") === least(expr("__n * 95 div 100 + 1"), col("__n")))
          .select(col("event_type"), col("__c").as("hi_cents"))
        ev.join(broadcast(lo), Seq("event_type"))
          .join(broadcast(hi), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(first(col("lo_cents")).as("lo_cents"),
            first(col("hi_cents")).as("hi_cents"),
            sum((col("__c") < col("lo_cents")).cast("long")).as("n_clipped_lo"),
            sum((col("__c") > col("hi_cents")).cast("long")).as("n_clipped_hi"),
            sum(least(greatest(col("__c"), col("lo_cents")), col("hi_cents")))
              .as("sum_winsorized_cents"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (
             |  SELECT event_type, event_id,
             |         CAST(floor(value * 100) AS BIGINT) AS c FROM events),
             |r AS (
             |  SELECT event_type, c,
             |    row_number() OVER (PARTITION BY event_type
             |                       ORDER BY c, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM e),
             |lo AS (SELECT event_type, c AS lo_cents FROM r
             |       WHERE rn = greatest(n * 5 // 100, 1)),
             |hi AS (SELECT event_type, c AS hi_cents FROM r
             |       WHERE rn = least(n * 95 // 100 + 1, n))
             |SELECT e.event_type, min(lo_cents) AS lo_cents,
             |  min(hi_cents) AS hi_cents,
             |  CAST(sum(CASE WHEN c < lo_cents THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_clipped_lo,
             |  CAST(sum(CASE WHEN c > hi_cents THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_clipped_hi,
             |  CAST(sum(least(greatest(c, lo_cents), hi_cents)) AS BIGINT)
             |    AS sum_winsorized_cents
             |FROM e JOIN lo USING (event_type) JOIN hi USING (event_type)
             |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)),

    // ---- leakage-free grouped cross-validation folds ----------------------
    // K-fold assignment hashed on user_id, not event_id: every event of a
    // user lands in the same fold BY CONSTRUCTION, so no user's behavior
    // leaks from train into validation — the grouped-CV discipline
    // sklearn's GroupKFold enforces, as a pure stateless map (no RNG, no
    // shuffle, reproducible on any engine). The per-fold distinct-user
    // counts are the check: they sum to the global distinct count iff no
    // user straddles folds.
    Q("q_group_kfold",
      (s, dir) => Tables.events(s, dir)
        .withColumn("fold", pmod(col("user_id") * 2654435761L, lit(5L)))
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(floor(col("value") * 100).cast("long")).as("sum_cents"))
        .orderBy(col("fold")),
      Some("""SELECT (user_id * 2654435761) % 5 AS fold, count(*) AS n_events,
             |  count(DISTINCT user_id) AS n_users,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_cents
             |FROM events GROUP BY fold ORDER BY fold""".stripMargin)),

    // ---- feature-drift detection (total variation distance) --------------
    // Model-monitoring drift check between the first and second half of
    // the time range: per event_type, histogram `value` into 10
    // fixed-width buckets per period, compare the two share vectors by
    // total variation distance TVD = Σ|p_A − p_B| / 2, in exact integer
    // ppm. (PSI is the textbook statistic but needs ln(), which is not
    // bit-portable across engines; TVD ranks drift identically for
    // monitoring thresholds.) Scale: two hash aggregates to
    // (type × period × 10) rows plus a tiny self-join — the events table
    // is scanned once and shuffles only count rows.
    Q("q_drift_tvd",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("__ep", unix_timestamp(col("ts")))
        val rng = ev.agg(min(col("__ep")).as("__mn"), max(col("__ep")).as("__mx"))
        // materialize the tiny histogram (≤ types×2×10 rows): the A/B
        // branches below would otherwise each recompute it — 4 full
        // event scans where one suffices
        val hist = ev.crossJoin(broadcast(rng))
          .withColumn("period",
            when(col("__ep") * 2 <= col("__mn") + col("__mx"), "A").otherwise("B"))
          .withColumn("bucket", least(floor(col("value") / 50).cast("long"), lit(9L)))
          .groupBy(col("event_type"), col("period"), col("bucket"))
          .agg(count(lit(1)).as("__c"))
          .localCheckpoint(true)
        val tot = hist.groupBy(col("event_type"), col("period"))
          .agg(sum(col("__c")).as("__t"))
        val sh = hist.join(tot, Seq("event_type", "period"))
          .withColumn("__p", expr("__c * 1000000L div __t"))
        val a = sh.filter(col("period") === "A")
          .select(col("event_type"), col("bucket"), col("__p").as("__pa"))
        val b = sh.filter(col("period") === "B")
          .select(col("event_type"), col("bucket"), col("__p").as("__pb"))
        a.join(b, Seq("event_type", "bucket"), "full_outer")
          .groupBy(col("event_type"))
          .agg(sum(abs(coalesce(col("__pa"), lit(0L))
            - coalesce(col("__pb"), lit(0L)))).as("__sd"),
            count(lit(1)).as("n_buckets"))
          .select(col("event_type"), expr("__sd div 2").as("tvd_ppm"),
            col("n_buckets"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (
             |  SELECT event_type, value,
             |         CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events),
             |r AS (SELECT min(ep) AS mn, max(ep) AS mx FROM e),
             |h AS (
             |  SELECT event_type,
             |    CASE WHEN ep * 2 <= mn + mx THEN 'A' ELSE 'B' END AS period,
             |    least(CAST(floor(value / 50) AS BIGINT), 9) AS bucket,
             |    count(*) AS c
             |  FROM e, r GROUP BY 1, 2, 3),
             |t AS (SELECT event_type, period, CAST(sum(c) AS BIGINT) AS t
             |      FROM h GROUP BY 1, 2),
             |s AS (SELECT h.event_type, h.period, h.bucket,
             |             h.c * 1000000 // t.t AS p
             |      FROM h JOIN t USING (event_type, period)),
             |j AS (
             |  SELECT coalesce(a.event_type, b.event_type) AS event_type,
             |         coalesce(a.p, 0) AS pa, coalesce(b.p, 0) AS pb
             |  FROM (SELECT * FROM s WHERE period = 'A') a
             |  FULL OUTER JOIN (SELECT * FROM s WHERE period = 'B') b
             |    ON a.event_type = b.event_type AND a.bucket = b.bucket)
             |SELECT event_type,
             |       CAST(sum(abs(pa - pb)) AS BIGINT) // 2 AS tvd_ppm,
             |       count(*) AS n_buckets
             |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
