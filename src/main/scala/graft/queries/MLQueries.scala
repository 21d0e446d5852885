package graft.queries

import graft.{Q, Tables}
import graft.ml.IsolationForest
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
             |FROM events GROUP BY split ORDER BY split""".stripMargin))
  )
}
