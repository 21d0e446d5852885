package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query registry is assembled from the per-family modules under
  * `graft.queries`; each entry carries its own DuckDB oracle SQL.
  */
object SparkEntry {

  /** Raw pre-Map registry — package-visible so RegistrySpec can detect
    * name collisions the Map construction would silently collapse. */
  private[graft] lazy val registry: Seq[Q] =
    graft.queries.CoreQueries.all ++
      graft.queries.JoinQueries.all ++
      graft.queries.TextQueries.all ++
      graft.queries.DedupQueries.all ++
      graft.queries.SimilarityQueries.all ++
      graft.queries.MLQueries.all ++
      graft.queries.StreamQueries.all ++
      graft.queries.AdvancedQueries.all ++
      graft.queries.MiscQueries.all ++
      graft.queries.WindowQueries.all ++
      graft.queries.StarJoinQueries.all ++
      graft.queries.FunnelQueries.all ++
      graft.queries.TimeSeriesQueries.all ++
      graft.queries.CurationQueries.all ++
      graft.queries.DataOpsQueries.all ++
      graft.queries.PQQueries.all ++
      graft.queries.SearchQueries.all ++
      graft.queries.GraphQueries.all ++
      graft.queries.EvalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Latest event per user (the reference's signature DISTINCT ON operator,
    * db.py:237-246), top-5 by value — SURVEY.md §7.2's end-to-end slice. */
  def entry(spark: SparkSession): DataFrame =
    queriesMap("q_latest_per_user_top")(spark, "/root/testdata/sf0.001")

  private lazy val queriesMap: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = queriesMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries → rows-only check. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
