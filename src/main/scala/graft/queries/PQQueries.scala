package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) over the embeddings table — the
  * billion-scale ANN compression pattern: 64-dim float vectors become 8
  * one-byte codes (one per 8-dim subspace), and search runs against a
  * tiny per-query lookup table instead of the raw vectors (asymmetric
  * distance computation, ADC).
  *
  * The sub-codebooks here are the exact integer-sum per-(label, subspace)
  * means (the same engine-portable quantizer IVF training uses — no
  * float accumulation order dependence), so encoding AND search are both
  * hash-checked against DuckDB: the oracle reproduces the approximate
  * result set bit-for-bit, not just a row count.
  *
  * Scale shape: codebook training is one hash aggregate to labels×dim
  * rows; encoding is one broadcast join (codebook is KBs) + one
  * min_by aggregate per (vector, subspace) — the corpus never shuffles
  * its vectors. ADC search scans only the CODES table (8 ints/vector ≈
  * 32× smaller than the float vectors) against a broadcast
  * query×subspace×codeword lookup of |Q|·8·|labels| longs. All distance
  * sums are exact long ppm (floored per subspace before summing), so no
  * double-sum ordering leaks into results.
  */
object PQQueries {

  private val S = 8 // subspaces
  private val D = 8 // dims per subspace (S*D = 64)

  private def encoded(emb: org.apache.spark.sql.DataFrame) =
    graft.operators.PQ.encode(emb, "vec_id", "embedding", "label", S, D)

  // shared oracle CTE prefix: parts → sums → cw → subs → enc
  private val encSql =
    """parts AS (
      |  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
      |         unnest(embedding) AS v
      |  FROM embeddings),
      |sums AS (
      |  SELECT label, pos, sum(CAST(floor(v * 1e6) AS BIGINT)) AS sv,
      |         count(*) AS n
      |  FROM parts GROUP BY label, pos),
      |cw AS (
      |  SELECT label AS c_label, pos // 8 AS s,
      |         list(CAST(sv AS DOUBLE) / n / 1e6 ORDER BY pos) AS cwv
      |  FROM sums GROUP BY label, pos // 8),
      |subs AS (
      |  SELECT vec_id, s,
      |         list_transform(range(8), i -> embedding[s*8 + i + 1]::DOUBLE) AS sub
      |  FROM embeddings, range(8) t(s)),
      |scored AS (
      |  SELECT vec_id, s, c_label,
      |    list_reduce(list_prepend(0::DOUBLE,
      |        list_transform(range(8),
      |          i -> (sub[i+1] - cwv[i+1]) * (sub[i+1] - cwv[i+1]))),
      |      (acc, x) -> acc + x) AS d2
      |  FROM subs JOIN cw USING (s)),
      |enc AS (
      |  SELECT vec_id, s, c_label AS code,
      |         CAST(floor(d2 * 1e6) AS BIGINT) AS err_ppm
      |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, s
      |                   ORDER BY d2, c_label) AS rn FROM scored) t
      |  WHERE rn = 1)""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- PQ encoding: 64 floats → 8 codes + quantization error ----------
    Q("q_pq_codes",
      (s, dir) => encoded(Tables.embeddings(s, dir))
        .groupBy(col("vec_id"))
        .agg(
          concat_ws(",", transform(
            array_sort(collect_list(struct(col("s"), col("code")))),
            x => x("code").cast("string"))).as("codes"),
          sum(col("err_ppm")).as("quant_err_ppm"))
        .orderBy(col("vec_id")),
      Some(s"""WITH $encSql
              |SELECT vec_id,
              |       array_to_string(list(code ORDER BY s), ',') AS codes,
              |       CAST(sum(err_ppm) AS BIGINT) AS quant_err_ppm
              |FROM enc GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    // ---- ADC search: top-5 neighbors by asymmetric PQ distance ----------
    // Per query: an 8×|labels| lookup table of exact subspace distances
    // (query slice ↔ codeword, floored to long ppm), broadcast against
    // the codes table; approx distance = Σ_s lut[s, code_s]. The scan
    // touches 8 ints per corpus vector — this is why PQ is THE pattern
    // once vectors outgrow memory.
    Q("q_pq_adc",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.operators.PQ.adcSearch(emb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", "label", k = 5, subspaces = S, subDim = D)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $encSql,
              |lut AS (
              |  SELECT u.vec_id AS query_id, u.s, c.c_label,
              |    CAST(floor(list_reduce(list_prepend(0::DOUBLE,
              |        list_transform(range(8),
              |          i -> (u.sub[i+1] - c.cwv[i+1]) * (u.sub[i+1] - c.cwv[i+1]))),
              |      (acc, x) -> acc + x) * 1e6) AS BIGINT) AS qd_ppm
              |  FROM subs u JOIN cw c ON u.s = c.s
              |  WHERE u.vec_id < 5),
              |approx AS (
              |  SELECT l.query_id, e.vec_id AS neighbor_id,
              |         CAST(sum(l.qd_ppm) AS BIGINT) AS adist_ppm
              |  FROM enc e JOIN lut l ON l.s = e.s AND l.c_label = e.code
              |  WHERE e.vec_id <> l.query_id
              |  GROUP BY l.query_id, e.vec_id)
              |SELECT query_id, neighbor_id, adist_ppm,
              |       CAST(rn AS INTEGER) AS rank
              |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              |               ORDER BY adist_ppm, neighbor_id) AS rn FROM approx) t
              |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin)),

    // ---- IVF-PQ: coarse lists + residual codes + per-list ADC -----------
    // The FAISS IVFx,PQy composition: probe the 2 nearest coarse lists,
    // then ADC over RESIDUAL codes with a per-(query, list) LUT. Every
    // stage (centroids, residuals, residual codebook, probe ranking,
    // floored LUT sums) is deterministic integer/double arithmetic, so the
    // full approximate result set hash-matches the oracle's replay.
    Q("q_ivfpq_search",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.operators.PQ.ivfPqSearch(emb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", "label", k = 5, nProbe = 2,
            subspaces = S, subDim = D)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqOracle)),

    // ---- filtered vector search: metadata predicate + ANN ---------------
    // The production "filtered top-k" every vector store ships: search
    // only among vectors passing a metadata predicate. Done the CORRECT
    // way — the predicate PRE-filters the coded lists before ADC, so
    // every query still gets k results from the allowed set (POST-
    // filtering a top-k under-fills it whenever ≥1 of the k is
    // disallowed — the classic bug). Composes from the public pieces:
    // train once, filter the codes relation, probe-search the rest.
    // Scale: the predicate is a pushed filter (or a semi-join with a
    // metadata table) on the codes scan — candidate volume shrinks BY
    // the selectivity, everything else is the proven plan.
    Q("q_ivfpq_filtered",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val (cents, rcw, codes) = graft.operators.PQ.ivfPqTrain(
          emb, "vec_id", "embedding", "label", S, D)
        graft.operators.PQ.ivfPqProbeSearch(cents, rcw,
            codes.filter(col("vec_id") % 2 === 0),
            emb.filter(col("vec_id") < 5), "vec_id", "embedding",
            k = 5, nProbe = 2, subspaces = S, subDim = D)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqFilteredOracle)),

    // ---- SQ8 scalar quantization: fit → uint8 codes → integer search ----
    // The remaining classic quantizer (faiss QT_8bit) next to the 1-bit
    // sign code and the PQ codebooks: per-dim [min,max] fit, one byte per
    // dimension, and a search loop of exact BIGINT (qa−qb)² sums — no
    // float anywhere past encoding, so the WHOLE pipeline (fit, clamp,
    // floor, distances, ranks) hash-matches the DuckDB replay. Scale: the
    // fit is one 64-group min/max aggregate; codes are 4× under float32;
    // search scans codes only (the one-pass bounded-heap shape is the
    // established scale path for bigger query sets).
    Q("q_sq8_search",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val fit = graft.operators.SQ.fitMinMax(emb, "embedding")
          .localCheckpoint(true) // consumed by both encode passes
        val coded = graft.operators.SQ.withCodes(emb, "embedding", fit)
        graft.operators.SQ.searchTopK(coded, "vec_id", "qcode",
            coded.filter(col("vec_id") < 5), k = 5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(sq8Oracle)),

    // ---- SQ8 index persistence: build → save → load → search -------------
    // The lifecycle for the fourth quantizer, same contract as the rest:
    // the per-dim [min,max] fit persists as the never-refit artifact,
    // codes live on the shared manifest-versioned layout (so tombstone
    // delete/compact/vacuum run unchanged), queries encode under the
    // LOADED fit. The oracle is q_sq8_search's verbatim — the equal hash
    // is the round-trip-losslessness proof (the q_index_persist /
    // q_ivfpq_persist pattern).
    Q("q_sq8_persist",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft_sq8idx").toString
        val emb = Tables.embeddings(s, dir)
        graft.operators.VectorIndex.buildSq8(emb, "vec_id", "embedding", path)
        graft.operators.VectorIndex.searchSq8(s, path,
            emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(sq8Oracle)),

    // ---- IVF-PQ index persistence: build → save → load → search ---------
    // The faiss-style lifecycle for the composed index (the binary-quant
    // analog is q_index_persist): centroids + residual codebooks + coded
    // lists persist as parquet, search runs over the LOADED artifacts.
    // The oracle is q_ivfpq_search's verbatim — the equal hash is the
    // round-trip-losslessness proof. Append-under-saved-quantizer
    // semantics (nearest-centroid assignment, no refit) are spec-locked
    // in IvfPqIndexSpec.
    Q("q_ivfpq_persist",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft_ivfpq").toString
        val emb = Tables.embeddings(s, dir)
        graft.operators.VectorIndex.buildIvfPq(
          emb, "vec_id", "embedding", "label", path, S, D)
        graft.operators.VectorIndex.searchIvfPq(
            s, path, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 5, nProbe = 2)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqOracle)),

    // ---- IVF-PQ append under the saved quantizer, oracle-gated ----------
    // The faiss add() semantics end to end: quantizer trained on the
    // FIRST half of the corpus only, the second half APPENDED — assigned
    // to its nearest saved centroid (not its label), residual-encoded
    // under the saved codebooks — then searched through the loaded index.
    // The oracle replays all of it, including the argmin centroid
    // assignment of the appended drop, so append is driver-hash-gated,
    // not just spec-tested.
    Q("q_ivfpq_append",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft_ivfpq_app").toString
        val emb = Tables.embeddings(s, dir)
        val split = emb.count() / 2
        graft.operators.VectorIndex.buildIvfPq(
          emb.filter(col("vec_id") < split), "vec_id", "embedding", "label",
          path, S, D)
        graft.operators.VectorIndex.appendIvfPq(
          emb.filter(col("vec_id") >= split), "vec_id", "embedding", path)
        graft.operators.VectorIndex.searchIvfPq(
            s, path, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 5, nProbe = 2)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqAppendOracle)),

    // ---- OPQ-rotated IVF-PQ: energy-balancing rotation before the split -
    // Ge et al.'s OPQ, in its structured HD form: corpus AND queries pass
    // through the fixed orthonormal sign-flip + Walsh–Hadamard rotation
    // (one fused codegen pass, d·log d integer adds per row — see
    // HadamardRotateExpr) before the standard IVF-PQ train/probe/ADC.
    // Rotation preserves exact L2, so the coarse geometry is unchanged;
    // what changes is how vector energy spreads across the 8 subspaces —
    // the recall lift is measured in Stress mode "recall" (SCALE.md).
    // The oracle replays the rotation naively in exact BIGINT arithmetic
    // and then runs the shared train/search CTEs over the rotated rows.
    Q("q_ivfpq_opq",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val rot = emb.select(col("vec_id"), col("label"),
          graft.functions.HadamardRotateExpr(col("embedding")).as("embedding"))
        graft.operators.PQ.ivfPqSearch(rot, rot.filter(col("vec_id") < 5),
            "vec_id", "embedding", "label", k = 5, nProbe = 2,
            subspaces = S, subDim = D)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqOpqOracle)),

    // ---- k-means PQ codebooks: the production quantizer, oracle-gated ---
    // The label-mean codebook above is the oracle-portable stand-in; real
    // deployments fit per-subspace k-means (faiss's PQ training). That fit
    // is deterministic here end to end — hash-ranked init via pure modular
    // arithmetic, Lloyd assignment with (d2, cid) tie order, exact
    // integer-sum ppm means — so the WHOLE training loop replays in SQL:
    // the oracle unrolls both Lloyd rounds as chained CTEs and re-encodes,
    // proving init, both argmin passes, and the mean updates bit-for-bit.
    // Output is q_pq_codes' shape (codes string + total quantization
    // error), so the two quantizers' error columns are directly
    // comparable — k-means strictly tightens err_ppm.
    Q("q_pq_kmeans",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val cb = graft.operators.PQ.kmeansCodebook(
          emb, "vec_id", "embedding", S, D, k = 8, iters = 2)
        graft.operators.PQ.encode(emb, "vec_id", "embedding", "label", S, D,
            Some(cb))
          .groupBy(col("vec_id"))
          .agg(
            concat_ws(",", transform(
              array_sort(collect_list(struct(col("s"), col("code")))),
              x => x("code").cast("string"))).as("codes"),
            sum(col("err_ppm")).as("quant_err_ppm"))
          .orderBy(col("vec_id"))
      },
      Some(kmeansOracle)),

    // ---- IVF-PQ + exact rerank: the faiss refine stage, oracle-gated ----
    // Pure ADC ranking cannot resolve distance gaps below its
    // quantization error — at 200k near-duplicate vectors its recall@10
    // is ~0.1 (SCALE.md "ANN recall"). Production serves ADC top-R →
    // exact-rerank top-k; here R=10 → k=5, the candidate set broadcasts
    // against the vector source so only candidates' floats ever load.
    // The oracle replays ADC candidates AND the exact-L2 rerank.
    Q("q_ivfpq_rerank",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val (cents, rcw, codes) = graft.operators.PQ.ivfPqTrain(
          emb, "vec_id", "embedding", "label", S, D)
        graft.operators.PQ.ivfPqSearchRerank(cents, rcw, codes, emb,
            emb.filter(col("vec_id") < 5), "vec_id", "embedding",
            k = 5, rerankWidth = 10, nProbe = 2, subspaces = S, subDim = D)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqRerankOracle))
  )
  /** Training-prefix CTEs of the IVF-PQ replay over `src`: coarse
    * centroids from labels, residuals (`resid1`), residual sub-codebooks
    * (`rcw`). Shared by all three IVF-PQ oracles — one copy of the
    * quantizer arithmetic. */
  private def ivfPqTrainCtes(src: String): String =
    s"""cparts AS (
       |  SELECT label AS l, generate_subscripts(embedding, 1) - 1 AS pos,
       |         unnest(embedding) AS v
       |  FROM $src),
       |csums AS (
       |  SELECT l, pos, sum(CAST(floor(v * 1e6) AS BIGINT)) AS sv,
       |         count(*) AS n
       |  FROM cparts GROUP BY l, pos),
       |cent AS (
       |  SELECT l, list(CAST(sv AS DOUBLE) / n / 1e6 ORDER BY pos) AS cv
       |  FROM csums GROUP BY l),
       |resid1 AS (
       |  SELECT e.vec_id, e.label AS l,
       |    list_transform(range(64),
       |      i -> e.embedding[i+1]::DOUBLE - c.cv[i+1]) AS r
       |  FROM $src e JOIN cent c ON e.label = c.l),
       |rparts AS (
       |  SELECT l, generate_subscripts(r, 1) - 1 AS pos, unnest(r) AS v
       |  FROM resid1),
       |rsums AS (
       |  SELECT l, pos, sum(CAST(floor(v * 1e6) AS BIGINT)) AS sv,
       |         count(*) AS n
       |  FROM rparts GROUP BY l, pos),
       |rcw AS (
       |  SELECT l AS c_label, pos // 8 AS s,
       |         list(CAST(sv AS DOUBLE) / n / 1e6 ORDER BY pos) AS cwv
       |  FROM rsums GROUP BY l, pos // 8)""".stripMargin

  /** ADC search tail over the `resid` (rows to encode), `cent`, and `rcw`
    * CTEs: encode → probe the 2 nearest centroids per query (vec_id < 5)
    * → per-(query, list) LUT → ADC top-5. Shared VERBATIM by all the
    * IVF-PQ oracles, so a change to the probe or flooring can never
    * desynchronize them. `qsrc` is the relation query vectors come from —
    * `embeddings` normally, the rotated CTE for the OPQ variant. */
  private def ivfPqSearchTail(qsrc: String = "embeddings",
      candPred: String = "TRUE"): String =
    s"""${ivfPqAdcCtes(qsrc, candPred)}
      |SELECT query_id, neighbor_id, adist_ppm, CAST(rn AS INTEGER) AS rank
      |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
      |               ORDER BY adist_ppm, neighbor_id) AS rn FROM approx) t
      |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin

  /** The tail's CTE chain up to `approx` (per-candidate ADC sums) — the
    * shared prefix of the plain top-5 select and the rerank variant. */
  private def ivfPqAdcCtes(qsrc: String,
      candPred: String = "TRUE"): String =
    s"""rsubs AS (
      |  SELECT vec_id, l, s,
      |         list_transform(range(8), i -> r[s*8 + i + 1]) AS sub
      |  FROM resid, range(8) t(s)),
      |rscored AS (
      |  SELECT vec_id, l, s, c_label,
      |    list_reduce(list_prepend(0::DOUBLE,
      |        list_transform(range(8),
      |          i -> (sub[i+1] - cwv[i+1]) * (sub[i+1] - cwv[i+1]))),
      |      (acc, x) -> acc + x) AS d2
      |  FROM rsubs JOIN rcw USING (s)),
      |enc AS (
      |  SELECT vec_id, l, s, c_label AS code
      |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, s
      |                   ORDER BY d2, c_label) AS rn FROM rscored) t
      |  WHERE rn = 1),
      |qd AS (
      |  SELECT q.vec_id AS query_id, c.l,
      |    list_reduce(list_prepend(0::DOUBLE,
      |        list_transform(range(64),
      |          i -> (q.embedding[i+1]::DOUBLE - c.cv[i+1])
      |             * (q.embedding[i+1]::DOUBLE - c.cv[i+1]))),
      |      (acc, x) -> acc + x) AS d2,
      |    list_transform(range(64),
      |      i -> q.embedding[i+1]::DOUBLE - c.cv[i+1]) AS qr
      |  FROM $qsrc q CROSS JOIN cent c WHERE q.vec_id < 5),
      |probed AS (
      |  SELECT query_id, l, qr
      |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
      |                   ORDER BY d2, l) AS pr FROM qd) t
      |  WHERE pr <= 2),
      |qsubs AS (
      |  SELECT query_id, l, s,
      |         list_transform(range(8), i -> qr[s*8 + i + 1]) AS sub
      |  FROM probed, range(8) t(s)),
      |lut AS (
      |  SELECT query_id, l, s, c_label,
      |    CAST(floor(list_reduce(list_prepend(0::DOUBLE,
      |        list_transform(range(8),
      |          i -> (sub[i+1] - cwv[i+1]) * (sub[i+1] - cwv[i+1]))),
      |      (acc, x) -> acc + x) * 1e6) AS BIGINT) AS qd_ppm
      |  FROM qsubs JOIN rcw USING (s)),
      |approx AS (
      |  SELECT u.query_id, e.vec_id AS neighbor_id,
      |         CAST(sum(u.qd_ppm) AS BIGINT) AS adist_ppm
      |  FROM enc e JOIN lut u
      |    ON u.l = e.l AND u.s = e.s AND u.c_label = e.code
      |  WHERE e.vec_id <> u.query_id AND ($candPred)
      |  GROUP BY u.query_id, e.vec_id)""".stripMargin

  /** DuckDB replay of the SQ8 pipeline (min/max fit → clamped uint8
    * codes → exact integer symmetric distances → top-5) — shared
    * VERBATIM by q_sq8_search and q_sq8_persist (their equal hashes are
    * the persistence-losslessness proof). */
  private def sq8Oracle: String =
    """WITH mm AS (
      |  SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx
      |  FROM (
      |    SELECT u.i AS pos,
      |           min(e.embedding[u.i + 1]::DOUBLE) AS mn,
      |           max(e.embedding[u.i + 1]::DOUBLE) AS mx
      |    FROM embeddings e
      |    CROSS JOIN (SELECT unnest(range(64)) AS i) u
      |    GROUP BY u.i)),
      |qc AS (
      |  SELECT e.vec_id,
      |    list_transform(range(64), i ->
      |      CASE WHEN mx[i + 1] = mn[i + 1] THEN 0
      |           ELSE CAST(least(255.0, greatest(0.0,
      |             floor((e.embedding[i + 1]::DOUBLE - mn[i + 1]) * 255.0
      |               / (mx[i + 1] - mn[i + 1])))) AS INT) END) AS qcode
      |  FROM embeddings e CROSS JOIN mm),
      |d AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(64), i ->
      |        CAST((q.qcode[i + 1] - c.qcode[i + 1])
      |           * (q.qcode[i + 1] - c.qcode[i + 1]) AS BIGINT))),
      |      (a, x) -> a + x) AS sqdist
      |  FROM qc q JOIN qc c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 5)
      |SELECT query_id, neighbor_id, sqdist, CAST(rn AS INTEGER) AS rank
      |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
      |               ORDER BY sqdist, neighbor_id) AS rn FROM d) t
      |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin

  /** DuckDB replay of the FILTERED search: the verbatim pipeline with the
    * metadata predicate applied to the candidate (coded) side before ADC
    * aggregation — k results AMONG the allowed set, the pre-filter
    * semantics. */
  private def ivfPqFilteredOracle: String =
    s"""WITH ${ivfPqTrainCtes("embeddings")},
       |resid AS (SELECT * FROM resid1),
       |${ivfPqSearchTail(candPred = "e.vec_id % 2 = 0")}""".stripMargin

  /** q_ivfpq_search's oracle, exposed for the streamed-serving entry
    * (q_stream_ann_search): the streamed path answers the same queries
    * from the same saved index, so the batch replay gates it verbatim. */
  private[queries] def ivfPqStreamOracle: String = ivfPqOracle

  /** DuckDB replay of the full IVF-PQ pipeline (centroids → residuals →
    * residual codebooks → probe → per-list LUT → ADC) — shared verbatim
    * by q_ivfpq_search and q_ivfpq_persist. */
  private def ivfPqOracle: String =
    s"""WITH ${ivfPqTrainCtes("embeddings")},
       |resid AS (SELECT * FROM resid1),
       |${ivfPqSearchTail()}""".stripMargin

  /** DuckDB replay of the build-on-half + append-half lifecycle: quantizer
    * (centroids + residual codebooks) trained on `vec_id < count()//2`
    * ONLY; the second half is assigned to its argmin-L2² saved centroid
    * (ties to the smallest list — `PQ.assignNearestList`'s order) and
    * residual-encoded under the saved codebooks; search probes the
    * half-trained quantizer over the UNION of built + appended codes. */
  private def ivfPqAppendOracle: String =
    s"""WITH half AS (SELECT count(*) // 2 AS m FROM embeddings),
       |base AS (SELECT e.* FROM embeddings e, half WHERE e.vec_id < half.m),
       |newv AS (SELECT e.* FROM embeddings e, half WHERE e.vec_id >= half.m),
       |${ivfPqTrainCtes("base")},
       |ad AS (
       |  SELECT e.vec_id, c.l,
       |    list_reduce(list_prepend(0::DOUBLE,
       |        list_transform(range(64),
       |          i -> (e.embedding[i+1]::DOUBLE - c.cv[i+1])
       |             * (e.embedding[i+1]::DOUBLE - c.cv[i+1]))),
       |      (acc, x) -> acc + x) AS d2
       |  FROM newv e CROSS JOIN cent c),
       |asg AS (
       |  SELECT vec_id, l
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
       |                   ORDER BY d2, l) AS rn FROM ad) t
       |  WHERE rn = 1),
       |resid2 AS (
       |  SELECT e.vec_id, a.l,
       |    list_transform(range(64),
       |      i -> e.embedding[i+1]::DOUBLE - c.cv[i+1]) AS r
       |  FROM newv e JOIN asg a USING (vec_id) JOIN cent c ON a.l = c.l),
       |resid AS (
       |  SELECT * FROM resid1 UNION ALL SELECT * FROM resid2),
       |${ivfPqSearchTail()}""".stripMargin

  /** The OPQ rotation as a CTE: ppm-quantize with the ±1 sign diagonal,
    * naive O(d²) Walsh–Hadamard row sums in EXACT BIGINT arithmetic, then
    * `CAST(... AS DOUBLE) / sqrt(64) / 1e6` — term-for-term the contract
    * of [[graft.functions.HadamardRotateExpr]] (whose O(d·log d) butterfly
    * is equal by long-arithmetic associativity, not float luck). */
  private def opqRotCte: String =
    """rotq AS (
      |  SELECT vec_id, label,
      |    list_transform(range(64), j ->
      |      CASE WHEN ((j * 2654435761) % 97) % 2 = 0 THEN 1 ELSE -1 END
      |        * CAST(floor(embedding[j+1] * 1e6) AS BIGINT)) AS q
      |  FROM embeddings),
      |rot AS (
      |  SELECT vec_id, label,
      |    list_transform(range(64), i ->
      |      CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(range(64), j ->
      |            CASE WHEN bit_count(i & j) % 2 = 0
      |                 THEN q[j+1] ELSE -q[j+1] END)),
      |        (acc, x) -> acc + x) AS DOUBLE) / sqrt(64) / 1e6) AS embedding
      |  FROM rotq)""".stripMargin

  /** DuckDB replay of the OPQ-rotated IVF-PQ search: rotate first, then
    * the verbatim train CTEs + search tail over the rotated relation. */
  private def ivfPqOpqOracle: String =
    s"""WITH $opqRotCte,
       |${ivfPqTrainCtes("rot")},
       |resid AS (SELECT * FROM resid1),
       |${ivfPqSearchTail("rot")}""".stripMargin

  /** DuckDB replay of ADC top-10 candidates + exact-L2 rerank to top-5:
    * the train/ADC CTEs verbatim, then candidates join their float
    * vectors and re-rank by the same sequential L2² fold Spark runs. */
  private def ivfPqRerankOracle: String =
    s"""WITH ${ivfPqTrainCtes("embeddings")},
       |resid AS (SELECT * FROM resid1),
       |${ivfPqAdcCtes("embeddings")},
       |cand AS (
       |  SELECT query_id, neighbor_id
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |                 ORDER BY adist_ppm, neighbor_id) AS rn FROM approx) t
       |  WHERE rn <= 10),
       |rr AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    list_reduce(list_prepend(0::DOUBLE,
       |        list_transform(range(64),
       |          i -> (q.embedding[i+1]::DOUBLE - v.embedding[i+1]::DOUBLE)
       |             * (q.embedding[i+1]::DOUBLE - v.embedding[i+1]::DOUBLE))),
       |      (acc, x) -> acc + x) AS d
       |  FROM cand c
       |  JOIN embeddings v ON v.vec_id = c.neighbor_id
       |  JOIN embeddings q ON q.vec_id = c.query_id)
       |SELECT query_id, neighbor_id,
       |       CAST(floor(d * 1e6) AS BIGINT) AS dist_ppm,
       |       CAST(rn AS INTEGER) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |               ORDER BY d, neighbor_id) AS rn FROM rr) t
       |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin

  /** Shared fold: exact sequential L2² between two 8-element lists. */
  private def l2sqSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0::DOUBLE,
       |        list_transform(range(8),
       |          i -> ($a[i+1] - $b[i+1]) * ($a[i+1] - $b[i+1]))),
       |      (acc, x) -> acc + x)""".stripMargin

  /** DuckDB replay of the FULL k-means PQ training loop + encode:
    * hash-ranked init → `iters` unrolled Lloyd rounds → final encode,
    * aggregated to q_pq_codes' (codes, quant_err_ppm) shape. Each round
    * reuses the proven cparts/csums/cent explode-sum-list pattern. */
  private def kmeansOracle: String = {
    val iters = 2
    val rounds = (1 to iters).map { r =>
      val prev = if (r == 1) "kcb0" else s"kcb${r - 1}"
      s"""asg$r AS (
         |  SELECT vec_id, s, sub, c_label
         |  FROM (SELECT u.vec_id, u.s, u.sub, c.c_label,
         |          row_number() OVER (PARTITION BY u.vec_id, u.s
         |            ORDER BY ${l2sqSql("u.sub", "c.cw")}, c.c_label) AS rn
         |        FROM subs u JOIN $prev c USING (s)) t
         |  WHERE rn = 1),
         |kp$r AS (
         |  SELECT s, c_label, generate_subscripts(sub, 1) - 1 AS pos,
         |         unnest(sub) AS v
         |  FROM asg$r),
         |ks$r AS (
         |  SELECT s, c_label, pos,
         |         sum(CAST(floor(v * 1e6) AS BIGINT)) AS sv, count(*) AS n
         |  FROM kp$r GROUP BY s, c_label, pos),
         |kcb$r AS (
         |  SELECT s, c_label,
         |         list(CAST(sv AS DOUBLE) / n / 1e6 ORDER BY pos) AS cw
         |  FROM ks$r GROUP BY s, c_label)""".stripMargin
    }.mkString(",\n")
    s"""WITH subs AS (
       |  SELECT vec_id, s,
       |         list_transform(range(8), i -> embedding[s*8 + i + 1]::DOUBLE) AS sub
       |  FROM embeddings, range(8) t(s)),
       |kcb0 AS (
       |  SELECT s, CAST(rn - 1 AS BIGINT) AS c_label, cw
       |  FROM (SELECT s, sub AS cw,
       |          row_number() OVER (PARTITION BY s
       |            ORDER BY ((vec_id % 999983) * 2654435761 + s * 40503)
       |                       % 1000003, vec_id) AS rn
       |        FROM subs) t
       |  WHERE rn <= 8),
       |$rounds,
       |enc AS (
       |  SELECT vec_id, s, c_label AS code,
       |         CAST(floor(d2 * 1e6) AS BIGINT) AS err_ppm
       |  FROM (SELECT u.vec_id, u.s, c.c_label,
       |          ${l2sqSql("u.sub", "c.cw")} AS d2,
       |          row_number() OVER (PARTITION BY u.vec_id, u.s
       |            ORDER BY ${l2sqSql("u.sub", "c.cw")}, c.c_label) AS rn
       |        FROM subs u JOIN kcb$iters c USING (s)) t
       |  WHERE rn = 1)
       |SELECT vec_id,
       |       array_to_string(list(code ORDER BY s), ',') AS codes,
       |       CAST(sum(err_ppm) AS BIGINT) AS quant_err_ppm
       |FROM enc GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }
}
