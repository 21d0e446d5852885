package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed model-evaluation and distribution-comparison statistics.
  *
  * Both queries use the same scale shape: the raw table collapses to one
  * row PER DISTINCT SCORE via a map-side-combinable hash aggregate (the
  * only full-data scan), and the order-dependent part — a prefix sum —
  * runs as an unpartitioned window over that distinct-score table, whose
  * size is bounded by score cardinality, not corpus rows (6.4k distinct
  * cent-values against 10M events; a calibrated model emits a few
  * thousand distinct scores against billions of examples). All arithmetic
  * is integer — counts, cross-multiplied cumulative counts, and a single
  * final ppm division — so Spark and DuckDB agree bit-for-bit. At
  * extreme scale the products `cum·N` approach 2⁶³ around 3·10⁹ rows per
  * side; past that, bucket scores first (the statistics degrade
  * gracefully to their histogram forms, same plan).
  */
object EvalQueries {

  val all: Seq[Q] = Seq(

    // ---- rank-sum AUC (Mann–Whitney) ---------------------------------------
    // AUC of `n_chars` as a score predicting lang = 'en', tie-aware:
    // AUC = Σ_s npos(s)·(cumneg_below(s) + nneg(s)/2) / (P·N), computed
    // ×2 to stay integral. This is THE distributed AUC: no global sort
    // of examples, no pair enumeration — one hash agg to distinct
    // scores, one tiny prefix-sum window, one row out.
    Q("q_auc_rank",
      (s, dir) => {
        val g = Tables.documents(s, dir)
          .select(col("n_chars").as("score"),
            when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
          .groupBy(col("score"))
          .agg(sum(col("pos")).as("np"), sum(lit(1L) - col("pos")).as("nn"))
        val w = Window.orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, -1)
        g.withColumn("cb", coalesce(sum(col("nn")).over(w), lit(0L)))
          .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
            sum(col("np") * (lit(2L) * col("cb") + col("nn"))).as("u2"))
          .select(col("n_pos"), col("n_neg"),
            expr("u2 * 1000000L div (2L * n_pos * n_neg)").as("auc_ppm"))
      },
      Some("""WITH g AS (
             |  SELECT n_chars AS score,
             |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             |              AS BIGINT) AS np,
             |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
             |              AS BIGINT) AS nn
             |  FROM documents GROUP BY 1),
             |c AS (
             |  SELECT np, nn,
             |         CAST(coalesce(sum(nn) OVER (ORDER BY score
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |           0) AS BIGINT) AS cb
             |  FROM g)
             |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
             |       CAST(sum(nn) AS BIGINT) AS n_neg,
             |       CAST(sum(np * (2 * cb + nn)) * 1000000 //
             |            (2 * sum(np) * sum(nn)) AS BIGINT) AS auc_ppm
             |FROM c""".stripMargin)),

    // ---- Kolmogorov–Smirnov two-sample drift -------------------------------
    // KS statistic between the first and second time-half of `events.value`
    // (same A/B split as q_drift_tvd, but distribution-free: the max CDF
    // gap over the EXACT empirical CDFs, not a fixed histogram).
    // D = max_s |cumA(s)·nB − cumB(s)·nA| / (nA·nB), kept integral by
    // cross-multiplying; reported in ppm.
    Q("q_ks_drift",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("__ep", unix_timestamp(col("ts")))
        val rng = ev.agg(min(col("__ep")).as("__mn"), max(col("__ep")).as("__mx"))
        // materialize the tiny distinct-score table: the totals branch and
        // the prefix-sum branch below would otherwise each rescan events
        val g = ev.crossJoin(broadcast(rng))
          .select(floor(col("value") * 100).cast("long").as("score"),
            when(col("__ep") * 2 <= col("__mn") + col("__mx"), 1L)
              .otherwise(0L).as("ina"))
          .groupBy(col("score"))
          .agg(sum(col("ina")).as("ca"), sum(lit(1L) - col("ina")).as("cb"))
          .localCheckpoint(true)
        val tot = g.agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
        val w = Window.orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        g.withColumn("cuma", sum(col("ca")).over(w))
          .withColumn("cumb", sum(col("cb")).over(w))
          .crossJoin(broadcast(tot))
          .agg(first(col("ta")).as("n_a"), first(col("tb")).as("n_b"),
            max(abs(col("cuma") * col("tb") - col("cumb") * col("ta")))
              .as("d_num"))
          .select(col("n_a"), col("n_b"),
            expr("d_num * 1000000L div (n_a * n_b)").as("ks_ppm"))
      },
      Some("""WITH e AS (
             |  SELECT CAST(floor(value * 100) AS BIGINT) AS score,
             |         CAST(floor(epoch(ts)) AS BIGINT) AS ep
             |  FROM events),
             |r AS (SELECT min(ep) AS mn, max(ep) AS mx FROM e),
             |g AS (
             |  SELECT score,
             |         CAST(sum(CASE WHEN ep * 2 <= mn + mx THEN 1 ELSE 0 END)
             |              AS BIGINT) AS ca,
             |         CAST(sum(CASE WHEN ep * 2 <= mn + mx THEN 0 ELSE 1 END)
             |              AS BIGINT) AS cb
             |  FROM e, r GROUP BY score),
             |t AS (SELECT CAST(sum(ca) AS BIGINT) AS ta,
             |             CAST(sum(cb) AS BIGINT) AS tb FROM g),
             |c AS (
             |  SELECT ca, cb,
             |    CAST(sum(ca) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
             |    CAST(sum(cb) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb
             |  FROM g)
             |SELECT t.ta AS n_a, t.tb AS n_b,
             |       CAST(max(abs(cuma * t.tb - cumb * t.ta)) * 1000000 //
             |            (t.ta * t.tb) AS BIGINT) AS ks_ppm
             |FROM c, t GROUP BY t.ta, t.tb""".stripMargin)),

    // ---- average precision (PR-curve area) ---------------------------------
    // AP = Σ_s npos(s)·precision(s) / P over DISTINCT scores descending,
    // where precision(s) = cumpos(s)·10⁶ div cum(s) at threshold ≥ s.
    // Same distinct-score collapse as q_auc_rank; precision terms are
    // floored per distinct score (identically on both engines), so the
    // statistic is bit-exact. Complements ROC-AUC: AP is the metric that
    // stays informative under the extreme class imbalance of web-scale
    // quality filtering (positives ≪ negatives).
    Q("q_avg_precision",
      (s, dir) => {
        val g = Tables.documents(s, dir)
          .select(col("n_chars").as("score"),
            when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
          .groupBy(col("score"))
          .agg(sum(col("pos")).as("np"), count(lit(1)).as("nt"))
        val w = Window.orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        g.withColumn("cp", sum(col("np")).over(w))
          .withColumn("ct", sum(col("nt")).over(w))
          .withColumn("prec_ppm", expr("cp * 1000000L div ct"))
          .agg(sum(col("np")).as("n_pos"),
            sum(col("np") * col("prec_ppm")).as("wsum"))
          .select(col("n_pos"),
            expr("wsum div n_pos").as("ap_ppm"))
      },
      Some("""WITH g AS (
             |  SELECT n_chars AS score,
             |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             |              AS BIGINT) AS np,
             |         count(*) AS nt
             |  FROM documents GROUP BY 1),
             |c AS (
             |  SELECT np,
             |         CAST(sum(np) OVER (ORDER BY score DESC ROWS BETWEEN
             |           UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp,
             |         CAST(sum(nt) OVER (ORDER BY score DESC ROWS BETWEEN
             |           UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ct
             |  FROM g),
             |p AS (SELECT np, cp * 1000000 // ct AS prec_ppm FROM c)
             |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
             |       CAST(sum(np * prec_ppm) // sum(np) AS BIGINT) AS ap_ppm
             |FROM p""".stripMargin)),

    // ---- calibration table (reliability diagram) ---------------------------
    // Decile-bucket a pseudo-probability (clipped length score) and
    // compare mean predicted vs observed positive rate per bucket — the
    // tabular form of a reliability diagram, with everything in integer
    // ppm. Scale: one narrow projection + one 10-key hash aggregate;
    // nothing order-dependent.
    Q("q_calibration_bins",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(
            expr("least(n_chars, 2000L) * 1000000L div 2000").as("pred_ppm"),
            when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
          .withColumn("bin", least(expr("pred_ppm div 100000L"), lit(9L)))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            expr("sum(pred_ppm) div count(1)").as("mean_pred_ppm"),
            expr("sum(pos) * 1000000L div count(1)").as("actual_ppm"))
          .orderBy(col("bin"))
      },
      Some("""WITH d AS (
             |  SELECT least(n_chars, 2000) * 1000000 // 2000 AS pred_ppm,
             |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
             |  FROM documents)
             |SELECT least(pred_ppm // 100000, 9) AS bin,
             |       count(*) AS n,
             |       CAST(sum(pred_ppm) // count(*) AS BIGINT) AS mean_pred_ppm,
             |       CAST(sum(pos) * 1000000 // count(*) AS BIGINT) AS actual_ppm
             |FROM d GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Gini coefficient of revenue concentration -------------------------
    // How concentrated order revenue is across customers, from the sorted
    // formula Gini = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) in exact integer
    // ppm (x = per-customer revenue in cents, ranks ascending with
    // deterministic custkey tie-break). Scale: the global rank is
    // BUCKET-STITCHED, not a single-partition window — rows rank inside
    // fixed-width revenue bands (parallel partitioned windows), and each
    // band adds the broadcast count of all lower bands. Same-value rows
    // always share a band, so stitching cannot split ties. The oracle
    // uses a plain global row_number — identical ranks, different plan.
    Q("q_gini_concentration",
      (s, dir) => {
        val rev = Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
          .withColumn("__b", expr("cents div 1000000L"))
        val wB = Window.partitionBy(col("__b"))
          .orderBy(col("cents"), col("o_custkey"))
        val ranked = rev.withColumn("__rn", row_number().over(wB).cast("long"))
        val bands = rev.groupBy(col("__b")).agg(count(lit(1)).as("__bn"))
        val wOff = Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = bands.withColumn("__off",
          coalesce(sum(col("__bn")).over(wOff), lit(0L)))
        ranked
          .join(broadcast(offs.select(col("__b"), col("__off"))), Seq("__b"))
          .withColumn("rank", col("__off") + col("__rn"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("cents")).as("total_cents"),
            sum(col("rank") * col("cents")).as("rs"))
          // ppm numerator ~ n·Σcents·10⁶ overflows int64 past ~10k
          // customers → 128-bit decimal, mirroring DuckDB's HUGEINT sums
          .select(col("n_customers"), col("total_cents"),
            expr("(2L * CAST(rs AS DECIMAL(38,0)) - (n_customers + 1L) * " +
              "CAST(total_cents AS DECIMAL(38,0))) * 1000000L " +
              "div (n_customers * CAST(total_cents AS DECIMAL(38,0)))")
              .as("gini_ppm"))
      },
      Some("""WITH r AS (
             |  SELECT o_custkey,
             |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
             |              AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |k AS (
             |  SELECT cents,
             |         CAST(row_number() OVER (ORDER BY cents, o_custkey)
             |              AS BIGINT) AS rn
             |  FROM r)
             |SELECT count(*) AS n_customers,
             |       CAST(sum(cents) AS BIGINT) AS total_cents,
             |       CAST((2 * sum(rn * cents) - (count(*) + 1) * sum(cents))
             |            * 1000000 // (count(*) * sum(cents)) AS BIGINT)
             |         AS gini_ppm
             |FROM k""".stripMargin)),

    // ---- Poisson bootstrap confidence intervals ---------------------------
    // Resampling-based uncertainty for a corpus statistic (here the mean
    // event value), the eval-pipeline staple — deterministically: each
    // row's multiplicity in replicate r is Poisson(1) drawn by inverting
    // the CDF at a seeded hash uniform (fixed ppm thresholds e⁻¹·Σ1/k! as
    // shared literals, like the sign-LSH hyperplanes), so replicates are
    // reproducible across engines/partitionings/reruns — no RNG state.
    // Scale: corpus×R rows feed ONE map-side-combinable aggregate per
    // replicate (R tiny); nothing is ever collected or re-scanned per
    // replicate. The replicate-mean table IS the CI: downstream takes
    // percentiles of 20 numbers.
    Q("q_bootstrap_ci",
      (s, dir) => {
        val reps = 20
        val u = pmod(
          (col("event_id") + col("rep") * lit(1000003L)) * lit(2654435761L),
          lit(1000000007L)) % lit(1000000L)
        // Poisson(1) inverse CDF, cumulative ppm: P(X<=k), capped at 5
        val cnt = when(col("__u") < 367879L, 0L)
          .when(col("__u") < 735759L, 1L)
          .when(col("__u") < 919699L, 2L)
          .when(col("__u") < 981012L, 3L)
          .when(col("__u") < 996340L, 4L)
          .otherwise(5L)
        Tables.events(s, dir)
          .select(col("event_id"),
            floor(col("value") * 1e6).cast("long").as("v_ppm"),
            explode(sequence(lit(0), lit(reps - 1))).as("rep"))
          .withColumn("__u", u)
          .withColumn("__cnt", cnt)
          .groupBy(col("rep"))
          .agg(sum(col("__cnt")).as("n_eff"),
            sum(col("__cnt") * col("v_ppm")).as("__sv"))
          .select(col("rep"), col("n_eff"),
            expr("__sv div n_eff").as("mean_v_ppm"))
          .orderBy(col("rep"))
      },
      Some("""WITH e AS (
             |  SELECT event_id,
             |         CAST(floor(value * 1e6) AS BIGINT) AS v_ppm,
             |         CAST(u.r AS INTEGER) AS rep
             |  FROM events
             |  CROSS JOIN (SELECT unnest(range(20)) AS r) u),
             |h AS (
             |  SELECT rep, v_ppm,
             |    ((event_id + rep * 1000003) * 2654435761) % 1000000007
             |      % 1000000 AS uu
             |  FROM e),
             |c AS (
             |  SELECT rep, v_ppm,
             |    CASE WHEN uu < 367879 THEN 0 WHEN uu < 735759 THEN 1
             |         WHEN uu < 919699 THEN 2 WHEN uu < 981012 THEN 3
             |         WHEN uu < 996340 THEN 4 ELSE 5 END AS cnt
             |  FROM h)
             |SELECT rep, CAST(sum(cnt) AS BIGINT) AS n_eff,
             |       CAST(CAST(sum(cnt * v_ppm) AS BIGINT) // sum(cnt)
             |            AS BIGINT) AS mean_v_ppm
             |FROM c GROUP BY rep ORDER BY rep""".stripMargin))
  )
}
