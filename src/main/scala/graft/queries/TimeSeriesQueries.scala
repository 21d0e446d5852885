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
    // for corpus scale, oracle-checked end to end via literal hyperplane
    // weights (5 planes = planesFor of the driver's 150-user corpus).
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
        val bucketSql = (0 until 5).map { p =>
          val dot = (0 until 24)
            .map(i => s"profile[${i + 1}] * (${graft.functions.SignBucketExpr.weight(p, i)})")
            .mkString(" + ")
          s"CASE WHEN ($dot) >= 0 THEN ${1L << p} ELSE 0 END"
        }.mkString(" + ")
        s"""WITH $profCtes,
           |bk AS (SELECT user_id, profile,
           |         CAST($bucketSql AS BIGINT) AS bucket FROM prof),
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
           |  AND (CASE WHEN (SELECT count(*) FROM prof) = 150 THEN TRUE
           |       ELSE error('q_ts_profile_nn_lsh oracle hardcodes 5 planes = planesFor(150): re-derive bucketSql for this corpus size') END)
           |ORDER BY user_id""".stripMargin
      })
  )
}
