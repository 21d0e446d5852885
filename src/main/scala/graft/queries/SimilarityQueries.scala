package graft.queries

import graft.{Q, Tables}
import graft.operators.Knn
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (array<float>, 64-dim).
  * Cosine is a strictly sequential double-precision fold on both engines →
  * bit-identical similarity, compared as floor(sim·1e6).
  */
object SimilarityQueries {

  private val dotSql =
    """list_reduce(list_prepend(0::DOUBLE,
      |    list_transform(range(len(a.embedding)),
      |      i -> a.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)),
      |  (acc, v) -> acc + v)""".stripMargin

  private def normSql(side: String) =
    s"""sqrt(list_reduce(list_prepend(0::DOUBLE,
       |    list_transform($side.embedding, v -> v::DOUBLE * v::DOUBLE)),
       |  (acc, v) -> acc + v))""".stripMargin

  private val cosSql = s"$dotSql / (${normSql("a")} * ${normSql("b")})"

  val all: Seq[Q] = Seq(

    // ---- brute-force cosine top-5 for a broadcast query set --------------
    Q("q_knn_brute",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Knn.bruteTopK(emb, emb.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""SELECT query_id, neighbor_id,
              |       CAST(floor(sim * 1e6) AS BIGINT) AS sim_ppm,
              |       CAST(rn AS INTEGER) AS rank
              |FROM (
              |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, $cosSql AS sim,
              |         row_number() OVER (PARTITION BY a.vec_id
              |                            ORDER BY $cosSql DESC, b.vec_id) AS rn
              |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
              |  WHERE a.vec_id < 10) t
              |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin)),

    // ---- ANN scale path: random-hyperplane LSH bucket + NN inside it ----
    // Rows-only: the 6-plane sign bucketing is deterministic but its SQL
    // transliteration (6×64 weighted terms) is impractical as an oracle;
    // recall vs brute force is asserted in DedupKnnSpec instead.
    Q("q_nn_lsh_bucketed",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
          .withColumn("bucket", Knn.signBucket(col("embedding"), dim = 64, planes = 6))
        Knn.nnWithinBucket(emb, "vec_id", "embedding", "bucket")
          .orderBy(col("vec_id"))
      },
      None),

    // ---- IVF-style: exact top-1 neighbor within a coarse bucket (label) --
    Q("q_nn_within_label",
      (s, dir) => Knn.nnWithinBucket(
          Tables.embeddings(s, dir), "vec_id", "embedding", "label")
        .orderBy(col("vec_id")),
      Some(s"""SELECT vec_id, bucket, nn_id, nn_sim_ppm FROM (
              |  SELECT a.vec_id, a.label AS bucket, b.vec_id AS nn_id,
              |         CAST(floor($cosSql * 1e6) AS BIGINT) AS nn_sim_ppm,
              |         row_number() OVER (PARTITION BY a.vec_id
              |                            ORDER BY $cosSql DESC, b.vec_id) AS rn
              |  FROM embeddings a
              |  JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id) t
              |WHERE rn = 1 ORDER BY vec_id""".stripMargin))
  )
}
