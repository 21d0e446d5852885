package graft.queries

import graft.{Q, Tables}
import graft.functions.Text
import graft.operators.TopK
import org.apache.spark.sql.functions._

/** Search-engine operators over the `documents` table: inverted-index
  * construction and BM25 ranked retrieval. Both are oracle-checked.
  *
  * Scale shapes:
  *  - Index build: one explode + one hash aggregate per token; posting
  *    lists are capped through the bounded-buffer TopK aggregator, so the
  *    shuffle carries at most ~2k candidate postings per (token × map
  *    task) — a stopword's billion-row posting list never materializes.
  *  - BM25: corpus-global statistics (N, Σdl, df) are token-sized after
  *    aggregation and broadcast back; query-time scoring is one corpus
  *    scan + broadcast joins, with all arithmetic in integer ppm (the
  *    k1=1.2 / b=0.75 rationals are folded into a single integer
  *    numerator/denominator), so scores are exact and engine-portable.
  */
object SearchQueries {

  /** Fixed retrieval query for q_bm25_rank. */
  private[queries] val QueryTerms = Seq("spark", "hash", "window")

  /** BM25 scores over `docs` for [[QueryTerms]] — the scoring core shared
    * by q_bm25_rank and the hybrid-fusion query (one copy, one oracle
    * mirror). Returns (doc_id, score_ppm, n_terms); integer-exact. */
  private def bm25Scores(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val dl = docs.select(col("doc_id"),
      size(Text.unicodeTokens(col("text"))).cast("long").as("dl"))
    val corpus = dl.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tok = docs.select(col("doc_id"),
      explode(Text.unicodeTokens(col("text"))).as("token"))
      .filter(col("token").isin(QueryTerms: _*))
    val df = docs.select(
        explode(array_distinct(Text.unicodeTokens(col("text")))).as("token"))
      .filter(col("token").isin(QueryTerms: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val tf = tok.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    tf.join(broadcast(df), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("idf_ppm",
        expr("(2*n_docs - 2*df + 1) * 1000000L div (2*df + 1)"))
      .withColumn("tf_ppm",
        expr("44*tf*sum_dl * 1000000L div (20*tf*sum_dl + 6*sum_dl + 18*dl*n_docs)"))
      .withColumn("contrib_ppm", expr("idf_ppm * tf_ppm div 1000000L"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib_ppm")).as("score_ppm"),
        count(lit(1)).as("n_terms"))
  }

  /** The BM25 CTE chain over relation `rel` (ends with `bm$sfx` =
    * doc_id, score_ppm, n_terms) — the DuckDB mirror of [[bm25Scores]].
    * `sfx` disambiguates when one oracle scores several corpus states
    * (the [[graft.operators.SearchIndex]] lifecycle query). */
  private[queries] def bm25CtesFor(rel: String, sfx: String = "",
      terms: Seq[String] = QueryTerms): String =
    s"""dl$sfx AS (
       |  SELECT doc_id, len(${Text.unicodeTokensSql("text")}) AS dl FROM $rel),
       |corpus$sfx AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl$sfx),
       |tf$sfx AS (
       |  SELECT doc_id, token, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(${Text.unicodeTokensSql("text")}) AS token
       |    FROM $rel) u
       |  WHERE token IN (${terms.map("'" + _ + "'").mkString(", ")})
       |  GROUP BY doc_id, token),
       |df$sfx AS (SELECT token, count(DISTINCT doc_id) AS df
       |           FROM tf$sfx GROUP BY token),
       |bm$sfx AS (
       |  SELECT tf$sfx.doc_id,
       |    CAST(sum((2*n_docs - 2*df + 1) * 1000000 // (2*df + 1)
       |         * (44*tf*sum_dl * 1000000 // (20*tf*sum_dl + 6*sum_dl + 18*dl$sfx.dl*n_docs))
       |         // 1000000) AS BIGINT) AS score_ppm,
       |    count(*) AS n_terms
       |  FROM tf$sfx JOIN df$sfx USING (token) JOIN dl$sfx USING (doc_id),
       |       corpus$sfx
       |  GROUP BY tf$sfx.doc_id)""".stripMargin

  private def bm25Ctes: String = bm25CtesFor("documents")

  /** The BATCHED BM25 CTE chain (requires a `qt(query_id, token)` CTE in
    * scope; ends with `sc` = query_id, doc_id, score_ppm, n_terms) — the
    * DuckDB mirror of [[graft.operators.SearchIndex.bm25Batch]], shared
    * by q_bm25_batch and the batched hybrid-serving oracle. */
  private def bm25BatchCtes: String =
    s"""dl AS (
       |  SELECT doc_id, len(${Text.unicodeTokensSql("text")}) AS dl FROM documents),
       |corpus AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
       |tok AS (
       |  SELECT doc_id, token, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(${Text.unicodeTokensSql("text")}) AS token
       |    FROM documents) u
       |  WHERE token IN (SELECT token FROM qt)
       |  GROUP BY doc_id, token),
       |df AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
       |sc AS (
       |  SELECT qt.query_id, tok.doc_id,
       |    CAST(sum((2*n_docs - 2*df + 1) * 1000000 // (2*df + 1)
       |         * (44*tf*sum_dl * 1000000 // (20*tf*sum_dl + 6*sum_dl + 18*dl.dl*n_docs))
       |         // 1000000) AS BIGINT) AS score_ppm,
       |    count(*) AS n_terms
       |  FROM tok JOIN qt USING (token) JOIN df USING (token)
       |       JOIN dl USING (doc_id), corpus
       |  GROUP BY qt.query_id, tok.doc_id)""".stripMargin

  /** Query set of the batched hybrid-serving query: five queries, each
    * with its own term set (sparse arm) and its own query vector by id
    * (dense arm). */
  private val HybridBatchTerms: Seq[(Long, String)] = Seq(
    0L -> "spark", 0L -> "hash", 0L -> "window",
    1L -> "table", 1L -> "fast",
    2L -> "join", 2L -> "merge", 2L -> "sort",
    3L -> "data", 3L -> "stream",
    4L -> "filter", 4L -> "group")

  val all: Seq[Q] = Seq(

    // ---- inverted index with capped posting lists ------------------------
    // token -> document frequency + the first `Cap` doc_ids (ascending),
    // one output row per (token, rank). The cap is enforced by the TopK
    // bounded-buffer aggregator, not collect_list-then-slice: a token
    // appearing in every document of a 100 TB corpus still only moves
    // O(cap) rows per map task through the shuffle.
    Q("q_inverted_index",
      (s, dir) => {
        val cap = 10
        val tok = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(array_distinct(Text.unicodeTokens(col("text")))).as("token"))
        val df = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
        // rank ascending by doc_id: TopK orders value DESC (tie: id ASC),
        // so feed the negated id as the value.
        val postings = TopK.perGroup(
          tok.withColumn("__negid", -col("doc_id")),
          Seq("token"), "__negid", "doc_id", cap)
          .select(col("token"), col("rank"), col("id").as("doc_id"))
        postings.join(broadcast(df), Seq("token"))
          .select(col("token"), col("df"), col("rank"), col("doc_id"))
          .orderBy(col("token"), col("rank"))
      },
      Some(s"""WITH tok AS (
             |  SELECT DISTINCT doc_id, token FROM (
             |    SELECT doc_id, unnest(${Text.unicodeTokensSql("text")}) AS token
             |    FROM documents) u),
             |df AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
             |r AS (SELECT token, doc_id,
             |        row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
             |      FROM tok)
             |SELECT r.token, df.df, CAST(r.rn AS INT) AS rank, r.doc_id
             |FROM r JOIN df USING (token) WHERE r.rn <= 10
             |ORDER BY token, rank""".stripMargin)),

    // ---- BM25 ranked retrieval (log-free, integer-exact) -----------------
    // Okapi BM25 with k1=1.2, b=0.75 and the Robertson idf REPLACED by its
    // log argument (N - df + 0.5)/(df + 0.5): ln() is libm-dependent and
    // not hash-portable across engines, and dropping the log preserves the
    // df ordering (same trick as q_tfidf_top_terms). Folding avgdl = S/N
    // and the rational constants through, the tf component becomes
    //   44·tf·S / (20·tf·S + 6·S + 18·dl·N)
    // — pure BIGINT arithmetic, exact in both engines.
    Q("q_bm25_rank",
      (s, dir) => bm25Scores(Tables.documents(s, dir))
        .orderBy(col("score_ppm").desc, col("doc_id"))
        .limit(20),
      Some(s"""WITH $bm25Ctes
              |SELECT doc_id, score_ppm, n_terms
              |FROM bm ORDER BY score_ppm DESC, doc_id LIMIT 20""".stripMargin)),

    // ---- persisted search index: BM25 serving without re-tokenizing ------
    // The retrieval family's production seam (operators.SearchIndex), the
    // analog of the dedup/ANN indexes: postings + reserved doc-length
    // rows persist ONCE on the shared manifest/tombstone layout, and a
    // probe re-aggregates df/N/Σdl from the LIVE rows — so serving from
    // the index is hash-equal to recomputing over the live documents,
    // and a tombstoned doc leaves every corpus statistic the moment it
    // is deleted (no stale-stats window). Three driver-gated states in
    // one hash: full index, after deleting doc_id % 9 = 0 (both the
    // rankings AND the df/idf shifts must track), and after compaction
    // (which must change nothing). Scale: probes read token-pruned
    // postings + 12 B/doc length rows; only appends tokenize new text.
    Q("q_search_index",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft_searchidx").toString
        val docs = Tables.documents(s, dir)
        graft.operators.SearchIndex.build(docs, "doc_id", "text", path)
        val full = graft.operators.SearchIndex
          .bm25(s, path, QueryTerms, 20)
          .withColumn("stage", lit("full")).localCheckpoint(true)
        graft.operators.VectorIndex.deleteIds(
          docs.filter(col("doc_id") % 9 === 0), "doc_id", path)
        val deleted = graft.operators.SearchIndex
          .bm25(s, path, QueryTerms, 20)
          .withColumn("stage", lit("deleted")).localCheckpoint(true)
        graft.operators.VectorIndex.compact(s, path)
        full.unionByName(deleted)
          .unionByName(graft.operators.SearchIndex
            .bm25(s, path, QueryTerms, 20)
            .withColumn("stage", lit("compacted")))
          .orderBy(col("stage"), col("score_ppm").desc, col("doc_id"))
      },
      Some(s"""WITH ${bm25CtesFor("documents")},
              |d2 AS (SELECT * FROM documents WHERE doc_id % 9 <> 0),
              |${bm25CtesFor("d2", "2")},
              |sel1 AS (SELECT doc_id, score_ppm, n_terms FROM bm
              |         ORDER BY score_ppm DESC, doc_id LIMIT 20),
              |sel2 AS (SELECT doc_id, score_ppm, n_terms FROM bm2
              |         ORDER BY score_ppm DESC, doc_id LIMIT 20)
              |SELECT 'full' AS stage, * FROM sel1
              |UNION ALL
              |SELECT 'deleted' AS stage, * FROM sel2
              |UNION ALL
              |SELECT 'compacted' AS stage, * FROM sel2
              |ORDER BY stage, score_ppm DESC, doc_id""".stripMargin)),

    // ---- MaxScore-pruned BM25: exact top-k without scoring the corpus ----
    // The serving-time pruning classic (Turtle & Flood 1995), Spark-form:
    // a query mixing a rare term ('dup', df ≈ 5% here) with common ones
    // ('batch'/'scan', df ≈ 80%) matches nearly every document, but the
    // top-k is decided by the rare term — per-term contribution UPPER
    // BOUNDS from the index's tstats artifact (df, max tf, min dl per
    // token×batch, O(vocab) rows) prove the common terms non-essential,
    // so only docs containing 'dup' ever reach the scoring aggregate.
    // The hash against the full unpruned replay is the exactness proof:
    // pruning may never change a score, a rank, or a tie-break. Three
    // states in one hash: full, after deleting doc_id % 7 = 0 (bounds
    // must stay valid under PENDING tombstones — the df lower-bound
    // correction), and after maintain() (compact + artifact rebuild).
    // Scale: scored-row volume drops from Σ postings(t) (corpus-sized
    // through the common terms) to |rare-term docs| × |terms|.
    Q("q_bm25_maxscore",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft_maxscore").toString
        val docs = Tables.documents(s, dir)
        val q = Seq("dup", "batch", "scan")
        graft.operators.SearchIndex.build(docs, "doc_id", "text", path)
        val full = graft.operators.SearchIndex
          .bm25Pruned(s, path, q, 15)
          .withColumn("stage", lit("full")).localCheckpoint(true)
        graft.operators.VectorIndex.deleteIds(
          docs.filter(col("doc_id") % 7 === 0), "doc_id", path)
        val deleted = graft.operators.SearchIndex
          .bm25Pruned(s, path, q, 15)
          .withColumn("stage", lit("deleted")).localCheckpoint(true)
        graft.operators.SearchIndex.maintain(s, path,
          maxTombstoneRatio = 0.0)
        full.unionByName(deleted)
          .unionByName(graft.operators.SearchIndex
            .bm25Pruned(s, path, q, 15)
            .withColumn("stage", lit("compacted")))
          .orderBy(col("stage"), col("score_ppm").desc, col("doc_id"))
      },
      Some(s"""WITH ${bm25CtesFor("documents", "",
                Seq("dup", "batch", "scan"))},
              |d2 AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),
              |${bm25CtesFor("d2", "2", Seq("dup", "batch", "scan"))},
              |sel1 AS (SELECT doc_id, score_ppm, n_terms FROM bm
              |         ORDER BY score_ppm DESC, doc_id LIMIT 15),
              |sel2 AS (SELECT doc_id, score_ppm, n_terms FROM bm2
              |         ORDER BY score_ppm DESC, doc_id LIMIT 15)
              |SELECT 'full' AS stage, * FROM sel1
              |UNION ALL
              |SELECT 'deleted' AS stage, * FROM sel2
              |UNION ALL
              |SELECT 'compacted' AS stage, * FROM sel2
              |ORDER BY stage, score_ppm DESC, doc_id""".stripMargin)),

    // ---- shard-index merge: parallel builds → one serving index ----------
    // The consolidation step of every sharded indexing pipeline: two
    // indexes built independently over disjoint doc-id spaces (even/odd
    // here — in production, per-partition builds), each with its OWN
    // tombstones, merged into one index with a single atomic commit.
    // The merged index must rank exactly what one index over the
    // union-minus-deletes corpus would — and must be a NORMAL index
    // afterward: the second stage appends a clone drop into it and
    // serves again. Scale: the merge moves each source's live postings
    // exactly once (read + partitioned write, no shuffle); sources stay
    // readable throughout; the disjointness check is one token-pruned
    // aggregate over the reserved rows.
    Q("q_index_merge",
      (s, dir) => {
        val base = java.nio.file.Files
          .createTempDirectory("graft_merge").toString
        val docs = Tables.documents(s, dir)
        val (pa, pb, dst) = (s"$base/a", s"$base/b", s"$base/merged")
        graft.operators.SearchIndex.build(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", pa)
        graft.operators.SearchIndex.build(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", pb)
        graft.operators.VectorIndex.deleteIds(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", pa)
        graft.operators.VectorIndex.deleteIds(
          docs.filter(col("doc_id") % 9 === 0), "doc_id", pb)
        graft.operators.SearchIndex.merge(s, Seq(pa, pb), dst)
        def serve() = graft.operators.SearchIndex
          .bm25(s, dst, QueryTerms, 20)
        val merged = serve().withColumn("stage", lit("merged"))
          .localCheckpoint(true)
        graft.operators.SearchIndex.append(
          docs.filter(col("doc_id") % 7 === 0)
            .withColumn("doc_id", col("doc_id") + 100000L),
          "doc_id", "text", dst)
        merged.unionByName(serve().withColumn("stage", lit("appended")))
          .orderBy(col("stage"), col("score_ppm").desc, col("doc_id"))
      },
      Some(s"""WITH l1 AS (
             |  SELECT doc_id, text FROM documents
             |  WHERE (doc_id % 2 = 0 AND doc_id % 10 <> 0)
             |     OR (doc_id % 2 = 1 AND doc_id % 9 <> 0)),
             |l2 AS (SELECT * FROM l1
             |       UNION ALL
             |       SELECT doc_id + 100000, text FROM documents
             |       WHERE doc_id % 7 = 0),
             |${bm25CtesFor("l1", "")},
             |${bm25CtesFor("l2", "2")},
             |s1 AS (SELECT doc_id, score_ppm, n_terms FROM bm
             |       ORDER BY score_ppm DESC, doc_id LIMIT 20),
             |s2 AS (SELECT doc_id, score_ppm, n_terms FROM bm2
             |       ORDER BY score_ppm DESC, doc_id LIMIT 20)
             |SELECT 'merged' AS stage, * FROM s1
             |UNION ALL
             |SELECT 'appended' AS stage, * FROM s2
             |ORDER BY stage, score_ppm DESC, doc_id""".stripMargin)),

    // ---- CDF-driven index maintenance: table changes → index sync --------
    // The composition that keeps a serving index in step with its source
    // table without rebuilding: TableManifest.readChanges drives
    // SearchIndex.syncFromTable — inserts append (tokenizing only the
    // drop), deletes tombstone, O(changes) per step on the append path.
    // Step 2 is a snapshot REPLACEMENT whose feed contains REWRITES
    // (delete + insert of the same doc id, text extended): the sync must
    // fold pending tombstones before re-appending or the rewritten docs
    // would stay masked — the one id-reuse hazard of tombstone indexes,
    // exercised deliberately. After each sync the index must rank
    // exactly what a fresh build over the table's current state would:
    // both stages replayed from scratch in SQL, one hash.
    Q("q_index_sync",
      (s, dir) => {
        val base = java.nio.file.Files
          .createTempDirectory("graft_sync").toString
        val (tPath, iPath) = (s"$base/table", s"$base/index")
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        import graft.operators.{SearchIndex, TableManifest}
        val v0 = TableManifest.commitSnapshot(docs, tPath)
        SearchIndex.build(TableManifest.read(s, tPath), "doc_id", "text",
          iPath)
        // step 1: an append-only drop (clones under shifted ids)
        val v1 = TableManifest.append(
          docs.filter(col("doc_id") % 11 === 0)
            .withColumn("doc_id", col("doc_id") + 100000L), tPath)
        SearchIndex.syncFromTable(s, tPath, iPath, v0, v1, "doc_id", "text")
        val s1 = SearchIndex.bm25(s, iPath, QueryTerms, 20)
          .withColumn("stage", lit("after_append_sync"))
          .localCheckpoint(true)
        // step 2: a replacement — drops doc_id % 13 = 0, REWRITES
        // doc_id % 17 = 0 (text extended), keeps the rest
        val v2 = TableManifest.commitSnapshot(
          TableManifest.read(s, tPath)
            .filter(col("doc_id") % 13 =!= 0)
            .withColumn("text",
              when(col("doc_id") % 17 === 0,
                concat(col("text"), lit(" extra fast")))
                .otherwise(col("text"))), tPath)
        SearchIndex.syncFromTable(s, tPath, iPath, v1, v2, "doc_id", "text")
        s1.unionByName(SearchIndex.bm25(s, iPath, QueryTerms, 20)
            .withColumn("stage", lit("after_replace_sync")))
          .orderBy(col("stage"), col("score_ppm").desc, col("doc_id"))
      },
      Some(s"""WITH c1 AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, text FROM documents
             |  WHERE doc_id % 11 = 0),
             |c2 AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 17 = 0 THEN text || ' extra fast'
             |         ELSE text END AS text
             |  FROM c1 WHERE doc_id % 13 <> 0),
             |${bm25CtesFor("c1", "")},
             |${bm25CtesFor("c2", "2")},
             |s1 AS (SELECT doc_id, score_ppm, n_terms FROM bm
             |       ORDER BY score_ppm DESC, doc_id LIMIT 20),
             |s2 AS (SELECT doc_id, score_ppm, n_terms FROM bm2
             |       ORDER BY score_ppm DESC, doc_id LIMIT 20)
             |SELECT 'after_append_sync' AS stage, * FROM s1
             |UNION ALL
             |SELECT 'after_replace_sync' AS stage, * FROM s2
             |ORDER BY stage, score_ppm DESC, doc_id""".stripMargin)),

    // ---- weighted sparse retrieval (learned-sparse serving shape) --------
    // SPLADE/uniCOIL-style: the query is a (token, weight) vector, the
    // score the sparse dot product Σ weight·tf — no corpus statistics,
    // the weights (a model's, here fixed) decide term importance. Served
    // via sparseDotPruned: MaxScore bounds UB(t) = weight·max_tf from
    // the tstats artifact (valid under pending deletes with NO
    // correction — deletes only shrink max tf) prune docs that provably
    // cannot reach the top-k; the hash against the plain full replay is
    // the exactness proof. A zero-weight and an absent term ride along
    // to pin the edge semantics (zero contribution, but n_terms counts
    // the zero-weight term's rows). Two states in one hash: full and
    // post-delete.
    Q("q_sparse_retrieval",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft_sparse").toString
        val docs = Tables.documents(s, dir)
        graft.operators.SearchIndex.build(docs, "doc_id", "text", path)
        val qv = Seq("dup" -> 5000L, "fast" -> 300L, "table" -> 100L,
          "zzznosuchterm" -> 900L, "scan" -> 0L)
        def serve() = graft.operators.SearchIndex
          .sparseDotPruned(s, path, qv, 15)
        val full = serve().withColumn("stage", lit("full"))
          .localCheckpoint(true)
        graft.operators.VectorIndex.deleteIds(
          docs.filter(col("doc_id") % 6 === 0), "doc_id", path)
        full.unionByName(serve().withColumn("stage", lit("deleted")))
          .orderBy(col("stage"), col("score_ppm").desc, col("doc_id"))
      },
      Some(s"""WITH w(token, wt) AS (VALUES ('dup', 5000), ('fast', 300),
             |    ('table', 100), ('zzznosuchterm', 900), ('scan', 0)),
             |tf AS (
             |  SELECT doc_id, token, count(*) AS tf FROM (
             |    SELECT doc_id, unnest(${Text.unicodeTokensSql("text")}) AS token
             |    FROM documents) u
             |  GROUP BY doc_id, token),
             |sc AS (SELECT doc_id, CAST(sum(wt * tf) AS BIGINT) AS score_ppm,
             |         count(*) AS n_terms
             |       FROM tf JOIN w USING (token) GROUP BY doc_id),
             |s1 AS (SELECT * FROM sc
             |       ORDER BY score_ppm DESC, doc_id LIMIT 15),
             |s2 AS (SELECT * FROM sc WHERE doc_id % 6 <> 0
             |       ORDER BY score_ppm DESC, doc_id LIMIT 15)
             |SELECT 'full' AS stage, * FROM s1
             |UNION ALL
             |SELECT 'deleted' AS stage, * FROM s2
             |ORDER BY stage, score_ppm DESC, doc_id""".stripMargin)),

    // ---- faceted search: metadata distribution of the match set ----------
    // The result-page sidebar: documents matching ALL query terms (the
    // index's conjunctive postings gate), bucketed by a metadata column
    // with top-k counts. Spark-first the metadata JOIN is the plan — the
    // match set moves as 8 B ids, the facet aggregate is map-side-
    // combinable — so the index never duplicates metadata (Lucene
    // doc-values is an optimization this layout does not need). Facet
    // counts must track deletes like every other statistic: two states
    // in one hash.
    Q("q_facet_search",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft_facet").toString
        val docs = Tables.documents(s, dir)
        graft.operators.SearchIndex.build(docs, "doc_id", "text", path)
        def facets() = graft.operators.SearchIndex.facetCounts(
          s, path, Seq("fast", "table"), docs, "doc_id", "source", k = 10)
        val full = facets().withColumn("stage", lit("full"))
          .localCheckpoint(true)
        graft.operators.VectorIndex.deleteIds(
          docs.filter(col("doc_id") % 4 === 0), "doc_id", path)
        full.unionByName(facets().withColumn("stage", lit("deleted")))
          .orderBy(col("stage"), col("n_docs").desc, col("facet"))
      },
      Some(s"""WITH tok AS (
             |  SELECT DISTINCT doc_id, token FROM (
             |    SELECT doc_id, unnest(${Text.unicodeTokensSql("text")}) AS token
             |    FROM documents) u
             |  WHERE token IN ('fast', 'table')),
             |m AS (SELECT doc_id FROM tok GROUP BY doc_id
             |      HAVING count(*) = 2),
             |f1 AS (SELECT d.source AS facet, count(*) AS n_docs
             |       FROM documents d JOIN m USING (doc_id)
             |       GROUP BY d.source
             |       ORDER BY n_docs DESC, facet LIMIT 10),
             |f2 AS (SELECT d.source AS facet, count(*) AS n_docs
             |       FROM documents d JOIN m USING (doc_id)
             |       WHERE d.doc_id % 4 <> 0
             |       GROUP BY d.source
             |       ORDER BY n_docs DESC, facet LIMIT 10)
             |SELECT 'full' AS stage, * FROM f1
             |UNION ALL
             |SELECT 'deleted' AS stage, * FROM f2
             |ORDER BY stage, n_docs DESC, facet""".stripMargin)),

    // ---- hybrid retrieval: BM25 + dense ANN, reciprocal-rank fusion ------
    // The retrieval shape RAG pipelines actually serve: a sparse arm (the
    // BM25 scorer above) and a dense arm (cosine vs a query embedding)
    // each produce a ranked top-20, fused with reciprocal-rank fusion
    // RRF(d) = Σ 1/(60+rank_i(d)) (Cormack, Clarke & Buettcher's k=60) in
    // integer ppm, so the fused ordering is exact and engine-portable.
    // Both arms rank on FLOORED ppm scores (sim never compares at raw
    // float resolution across engines). Scale: each arm is the already-
    // proven retrieval plan; fusion joins two ≤k-row frames — the fused
    // stage costs nothing at any corpus size.
    Q("q_hybrid_rrf",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val emb = Tables.embeddings(s, dir)
        val qv = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("__qv"))
        val denseScored = emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qv))
          .withColumn("__sp",
            floor(graft.functions.CosineSimExpr(col("embedding"), col("__qv"))
              * 1e6).cast("long"))
          .select(col("vec_id").as("doc_id"), col("__sp"))
        // rank windows run over ≤20 rows (post-TakeOrdered) — the global
        // window is k-sized by construction, never corpus-sized
        val dense = denseScored
          .orderBy(col("__sp").desc, col("doc_id")).limit(20)
          .withColumn("rank_dense", row_number()
            .over(Window.orderBy(col("__sp").desc, col("doc_id")))
            .cast("long"))
          .select(col("doc_id"), col("rank_dense"))
        val sparse = bm25Scores(docs)
          .orderBy(col("score_ppm").desc, col("doc_id")).limit(20)
          .withColumn("rank_sparse", row_number()
            .over(Window.orderBy(col("score_ppm").desc, col("doc_id")))
            .cast("long"))
          .select(col("doc_id"), col("rank_sparse"))
        dense.join(sparse, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            coalesce(col("rank_dense"), lit(0L)).as("rank_dense"),
            coalesce(col("rank_sparse"), lit(0L)).as("rank_sparse"),
            (coalesce(expr("1000000L div (60 + rank_dense)"), lit(0L)) +
              coalesce(expr("1000000L div (60 + rank_sparse)"), lit(0L)))
              .as("rrf_ppm"))
          .orderBy(col("rrf_ppm").desc, col("doc_id"))
      },
      Some(s"""WITH $bm25Ctes,
              |spr AS (SELECT doc_id, rank_sparse FROM (
              |          SELECT doc_id, CAST(row_number() OVER (
              |            ORDER BY score_ppm DESC, doc_id) AS BIGINT)
              |            AS rank_sparse
              |          FROM bm) t WHERE rank_sparse <= 20),
              |dsc AS (SELECT a.vec_id AS doc_id,
              |          CAST(floor(${SimilarityQueries.cosSql} * 1e6) AS BIGINT) AS sp
              |        FROM embeddings a CROSS JOIN
              |          (SELECT embedding FROM embeddings WHERE vec_id = 0) b
              |        WHERE a.vec_id <> 0),
              |den AS (SELECT doc_id, rank_dense FROM (
              |          SELECT doc_id, CAST(row_number() OVER (
              |            ORDER BY sp DESC, doc_id) AS BIGINT) AS rank_dense
              |          FROM dsc) t WHERE rank_dense <= 20)
              |SELECT coalesce(den.doc_id, spr.doc_id) AS doc_id,
              |  coalesce(den.rank_dense, 0) AS rank_dense,
              |  coalesce(spr.rank_sparse, 0) AS rank_sparse,
              |  CAST(coalesce(1000000 // (60 + den.rank_dense), 0)
              |     + coalesce(1000000 // (60 + spr.rank_sparse), 0) AS BIGINT)
              |    AS rrf_ppm
              |FROM den FULL OUTER JOIN spr ON den.doc_id = spr.doc_id
              |ORDER BY rrf_ppm DESC, doc_id""".stripMargin)),

    // ---- batched BM25 serving: a query SET in one pass -------------------
    // The production serving shape: a whole batch of (query_id, term)
    // rows scores against the live index at once — postings for any
    // requested term read once however many queries share it, df/N/Σdl
    // from live rows as always, per-query top-k by window. The oracle
    // replays the same math from the raw text with the query table as a
    // VALUES relation. Scale: one token-pruned postings read + one
    // shuffle to (query, doc) aggregation, queries broadcast.
    Q("q_bm25_batch",
      (s, dir) => {
        import s.implicits._
        val path = java.nio.file.Files
          .createTempDirectory("graft_bm25_batch").toString
        graft.operators.SearchIndex.build(
          Tables.documents(s, dir), "doc_id", "text", path)
        val qset = (QueryTerms.map((0L, _)) ++ Seq((1L, "table"), (1L, "fast")))
          .toDF("query_id", "token")
        graft.operators.SearchIndex
          .bm25Batch(s, path, qset, "query_id", "token", k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH qt(query_id, token) AS (
              |  VALUES ${QueryTerms.map(t => s"(0, '$t')").mkString(", ")},
              |         (1, 'table'), (1, 'fast')),
              |$bm25BatchCtes
              |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_ppm,
              |       n_terms, CAST(rn AS INTEGER) AS rank
              |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              |        ORDER BY score_ppm DESC, doc_id) AS rn FROM sc) t
              |WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin)),

    // ---- ranked-retrieval evaluation over the index's own serving --------
    // The eval loop for the search family: BM25 batch top-10 per query
    // (served from the persisted index) scored against conjunctive
    // relevance judgments (docs containing EVERY term of the query) with
    // operators.RetrievalEval — hits@k, reciprocal rank, precision@k,
    // recall@k, all exact integer ppm. The oracle replays the batch
    // ranking (bm25BatchCtes), the judgment derivation, and the metric
    // arithmetic, so ranking AND scoring are one hash. Scale: metrics
    // shuffle k×#queries prediction rows and per-query qrel counts only.
    Q("q_retrieval_eval",
      (s, dir) => {
        import s.implicits._
        val path = java.nio.file.Files
          .createTempDirectory("graft_reteval").toString
        graft.operators.SearchIndex.build(
          Tables.documents(s, dir), "doc_id", "text", path)
        val qset = (QueryTerms.map((0L, _)) ++
            Seq((1L, "table"), (1L, "fast"),
              (2L, "join"), (2L, "merge"), (2L, "sort")))
          .toDF("query_id", "token")
        val pred = graft.operators.SearchIndex
          .bm25Batch(s, path, qset, "query_id", "token", k = 10)
        val docToks = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(Text.unicodeTokens(col("text"))).as("token"))
          .distinct()
        val qn = qset.groupBy(col("query_id")).agg(count(lit(1)).as("__nt"))
        val rel = docToks.join(qset, "token")
          .groupBy(col("query_id"), col("doc_id"))
          .agg(count(lit(1)).as("__c"))
          .join(qn, "query_id").filter(col("__c") === col("__nt"))
          .select(col("query_id"), col("doc_id"))
        graft.operators.RetrievalEval
          .metricsAtK(pred, rel, "query_id", "doc_id", "rank", 10)
          .orderBy(col("query_id"))
      },
      Some(s"""WITH qt(query_id, token) AS (
              |  VALUES ${QueryTerms.map(t => s"(0, '$t')").mkString(", ")},
              |         (1, 'table'), (1, 'fast'),
              |         (2, 'join'), (2, 'merge'), (2, 'sort')),
              |$bm25BatchCtes,
              |topk AS (
              |  SELECT query_id, doc_id, rn AS rank
              |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              |          ORDER BY score_ppm DESC, doc_id) AS rn FROM sc) t
              |  WHERE rn <= 10),
              |tk AS (
              |  SELECT DISTINCT doc_id, token FROM (
              |    SELECT doc_id, unnest(${Text.unicodeTokensSql("text")})
              |      AS token FROM documents) u),
              |qn AS (SELECT query_id, count(*) AS nt FROM qt
              |       GROUP BY query_id),
              |relc AS (SELECT qt.query_id, tk.doc_id, count(*) AS c
              |         FROM tk JOIN qt USING (token)
              |         GROUP BY qt.query_id, tk.doc_id),
              |rel AS (SELECT relc.query_id, relc.doc_id
              |        FROM relc JOIN qn USING (query_id) WHERE c = nt),
              |nr AS (SELECT query_id, count(*) AS n_rel FROM rel
              |       GROUP BY query_id),
              |h AS (SELECT topk.query_id, count(*) AS hits,
              |        min(rank) AS fr
              |      FROM topk JOIN rel USING (query_id, doc_id)
              |      GROUP BY topk.query_id)
              |SELECT CAST(nr.query_id AS BIGINT) AS query_id, n_rel,
              |  coalesce(hits, 0) AS hits_at_k,
              |  CAST(coalesce(1000000 // fr, 0) AS BIGINT) AS rr_ppm,
              |  CAST(coalesce(hits, 0) * 1000000 // 10 AS BIGINT)
              |    AS p_at_k_ppm,
              |  CAST(coalesce(hits, 0) * 1000000 // n_rel AS BIGINT)
              |    AS r_at_k_ppm
              |FROM nr LEFT JOIN h USING (query_id)
              |ORDER BY query_id""".stripMargin)),

    // ---- exact-phrase search from positional postings --------------------
    // The index's positional dimension: (doc, token) postings carry the
    // sorted 1-based position list, and a phrase probe chains each term
    // onto the previous at (doc, position + offset) — the document text
    // is never read, per-term work is that term's posting list. The
    // oracle computes phrase occurrences DIRECTLY from the text with a
    // sliding window, so the hash proves the positional index path is
    // exactly the textual definition, multiplicity (number of starting
    // positions) included. Two phrase lengths gate the chaining.
    Q("q_phrase_search",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft_phrase_idx").toString
        graft.operators.SearchIndex.build(
          Tables.documents(s, dir), "doc_id", "text", path)
        graft.operators.SearchIndex.phrase(s, path, Seq("the", "table"))
          .withColumn("phrase", lit("the table"))
          .unionByName(graft.operators.SearchIndex
            .phrase(s, path, Seq("fast", "table", "value"))
            .withColumn("phrase", lit("fast table value")))
          .select(col("phrase"), col("doc_id"), col("n_matches"))
          .orderBy(col("phrase"), col("doc_id"))
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, ${Text.unicodeTokensSql("text")} AS t FROM documents),
             |p2 AS (SELECT 'the table' AS phrase, doc_id,
             |         CAST(len(list_filter(range(1, len(t)), i ->
             |           t[i] = 'the' AND t[i+1] = 'table')) AS BIGINT)
             |           AS n_matches
             |       FROM t),
             |p3 AS (SELECT 'fast table value' AS phrase, doc_id,
             |         CAST(len(list_filter(range(1, len(t) - 1), i ->
             |           t[i] = 'fast' AND t[i+1] = 'table'
             |           AND t[i+2] = 'value')) AS BIGINT) AS n_matches
             |       FROM t)
             |SELECT phrase, doc_id, n_matches FROM p2 WHERE n_matches > 0
             |UNION ALL
             |SELECT phrase, doc_id, n_matches FROM p3 WHERE n_matches > 0
             |ORDER BY phrase, doc_id""".stripMargin)),

    // ---- ordered proximity: the sloppy-phrase serving surface -------------
    // phraseNear = phrase with a bounded gap window per hop: 'fast … value'
    // within 2 positions catches 'fast table value' (gap 2) AND any direct
    // adjacency — the query a search box means by "near". The plan is the
    // phrase chain with a range residual on each equi-join hop (per-term
    // work stays that term's posting list); the oracle replays positions
    // via unnest + self-joins with the same gap windows, both a 2-term and
    // a 3-term chain, so the hop algebra itself is hash-gated.
    Q("q_phrase_near",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft_phrase_near").toString
        graft.operators.SearchIndex.build(
          Tables.documents(s, dir), "doc_id", "text", path)
        graft.operators.SearchIndex
          .phraseNear(s, path, Seq("fast", "value"), slop = 1)
          .withColumn("q", lit("fast value ~1"))
          .unionByName(graft.operators.SearchIndex
            .phraseNear(s, path, Seq("fast", "table", "value"), slop = 1)
            .withColumn("q", lit("fast table value ~1")))
          .select(col("q"), col("doc_id"), col("n_matches"))
          .orderBy(col("q"), col("doc_id"))
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, ${Text.unicodeTokensSql("text")} AS t
             |  FROM documents),
             |pos AS (SELECT doc_id, t[i] AS tok, i AS p
             |        FROM t, unnest(range(1, len(t) + 1)) AS u(i)),
             |fa AS (SELECT doc_id, p FROM pos WHERE tok = 'fast'),
             |tb AS (SELECT doc_id, p FROM pos WHERE tok = 'table'),
             |va AS (SELECT doc_id, p FROM pos WHERE tok = 'value'),
             |n2 AS (SELECT 'fast value ~1' AS q, fa.doc_id,
             |         count(*) AS n_matches
             |       FROM fa JOIN va ON fa.doc_id = va.doc_id
             |         AND va.p - fa.p BETWEEN 1 AND 2
             |       GROUP BY fa.doc_id),
             |n3 AS (SELECT 'fast table value ~1' AS q, fa.doc_id,
             |         count(*) AS n_matches
             |       FROM fa
             |         JOIN tb ON fa.doc_id = tb.doc_id
             |           AND tb.p - fa.p BETWEEN 1 AND 2
             |         JOIN va ON tb.doc_id = va.doc_id
             |           AND va.p - tb.p BETWEEN 1 AND 2
             |       GROUP BY fa.doc_id)
             |SELECT q, doc_id, n_matches FROM n2
             |UNION ALL
             |SELECT q, doc_id, n_matches FROM n3
             |ORDER BY q, doc_id""".stripMargin)),

    // ---- snippet localization: minimal cover window per document ---------
    // The result-page highlight surface: for every doc containing all
    // query terms, the tightest position window covering one occurrence
    // of each (ties toward the earliest), straight from positional
    // postings — the document text is never read. The chain join carries
    // a running (lo, hi) envelope and one min_by picks the winner; the
    // oracle replays all position combinations with least/greatest and
    // an (width, lo)-ordered row_number, so envelope algebra AND
    // tie-breaking are hash-gated for a 2- and a 3-term query.
    Q("q_snippet_window",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft_snippet").toString
        graft.operators.SearchIndex.build(
          Tables.documents(s, dir), "doc_id", "text", path)
        def win(q: String, terms: String*) =
          graft.operators.SearchIndex.snippetWindow(s, path, terms)
            .withColumn("q", lit(q))
        win("fast value", "fast", "value")
          .unionByName(win("the fast table", "the", "fast", "table"))
          .select(col("q"), col("doc_id"),
            col("win_start").cast("long").as("win_start"),
            col("win_end").cast("long").as("win_end"),
            col("win_len").cast("long").as("win_len"))
          .orderBy(col("q"), col("doc_id"))
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, ${Text.unicodeTokensSql("text")} AS t
             |  FROM documents),
             |pos AS (SELECT doc_id, t[i] AS tok, i AS p
             |        FROM t, unnest(range(1, len(t) + 1)) AS u(i)),
             |fa AS (SELECT doc_id, p FROM pos WHERE tok = 'fast'),
             |va AS (SELECT doc_id, p FROM pos WHERE tok = 'value'),
             |th AS (SELECT doc_id, p FROM pos WHERE tok = 'the'),
             |tb AS (SELECT doc_id, p FROM pos WHERE tok = 'table'),
             |w2 AS (SELECT fa.doc_id, least(fa.p, va.p) AS lo,
             |         greatest(fa.p, va.p) AS hi
             |       FROM fa JOIN va USING (doc_id)),
             |r2 AS (SELECT 'fast value' AS q, doc_id, lo, hi,
             |         row_number() OVER (PARTITION BY doc_id
             |           ORDER BY hi - lo, lo) AS rn FROM w2),
             |w3 AS (SELECT th.doc_id,
             |         least(th.p, least(fa.p, tb.p)) AS lo,
             |         greatest(th.p, greatest(fa.p, tb.p)) AS hi
             |       FROM th JOIN fa USING (doc_id) JOIN tb USING (doc_id)),
             |r3 AS (SELECT 'the fast table' AS q, doc_id, lo, hi,
             |         row_number() OVER (PARTITION BY doc_id
             |           ORDER BY hi - lo, lo) AS rn FROM w3)
             |SELECT q, doc_id, lo AS win_start, hi AS win_end,
             |  hi - lo + 1 AS win_len FROM r2 WHERE rn = 1
             |UNION ALL
             |SELECT q, doc_id, lo, hi, hi - lo + 1 FROM r3 WHERE rn = 1
             |ORDER BY q, doc_id""".stripMargin)),

    // ---- the Unicode-tokenization proof on HARD text ----------------------
    // The whole BM25 index lifecycle (build → probe → delete → probe) on
    // the DECORATED fixture: punctuation, mixed case, an accented term,
    // digits, NBSP/thin-space/tab separators (Text.DecoratedTextSql — the
    // identical expression evaluates in both engines). The query terms
    // include the accent-born 'gráft' and the digit token '42', so the
    // hash proves tokenizer parity END TO END through the persisted
    // postings, the stats artifact, and the delete path — not just on a
    // tokenize-and-count surface.
    Q("q_search_unicode",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), expr(Text.DecoratedTextSql).as("text"))
        val path = java.nio.file.Files
          .createTempDirectory("graft_sidx_uni").toString
        val terms = Seq("gráft", "42", "the")
        graft.operators.SearchIndex.build(docs, "doc_id", "text", path)
        val full = graft.operators.SearchIndex.bm25(s, path, terms, 20)
          .withColumn("stage", lit("full"))
        graft.operators.VectorIndex.deleteIds(
          docs.filter(col("doc_id") < 50), "doc_id", path)
        val deleted = graft.operators.SearchIndex.bm25(s, path, terms, 20)
          .withColumn("stage", lit("deleted"))
        full.unionByName(deleted)
          .select(col("stage"), col("doc_id"), col("score_ppm"),
            col("n_terms"))
          .orderBy(col("stage"), col("doc_id"))
      },
      Some(s"""WITH dd AS (
              |  SELECT doc_id, ${Text.DecoratedTextSql} AS text FROM documents),
              |dd2 AS (SELECT * FROM dd WHERE doc_id >= 50),
              |${bm25CtesFor("dd", terms = Seq("gráft", "42", "the"))},
              |${bm25CtesFor("dd2", "2", terms = Seq("gráft", "42", "the"))}
              |SELECT 'full' AS stage, doc_id, score_ppm, n_terms FROM
              |  (SELECT * FROM bm ORDER BY score_ppm DESC, doc_id LIMIT 20)
              |UNION ALL
              |SELECT 'deleted', doc_id, score_ppm, n_terms FROM
              |  (SELECT * FROM bm2 ORDER BY score_ppm DESC, doc_id LIMIT 20)
              |ORDER BY stage, doc_id""".stripMargin)),

    // Phrase search on the decorated fixture: 'tail 42' is adjacency
    // born ENTIRELY from decoration ('Tail…42!' — ellipsis separator,
    // mixed case, digit token), and 'the table' must still match where
    // the decoration replaced the spaces around 'the' with ',' and a
    // thin space — punctuation runs separate tokens but never break
    // adjacency, exactly what a positional index over a real tokenizer
    // must preserve.
    Q("q_phrase_unicode",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), expr(Text.DecoratedTextSql).as("text"))
        val path = java.nio.file.Files
          .createTempDirectory("graft_phrase_uni").toString
        graft.operators.SearchIndex.build(docs, "doc_id", "text", path)
        graft.operators.SearchIndex.phrase(s, path, Seq("tail", "42"))
          .withColumn("phrase", lit("tail 42"))
          .unionByName(graft.operators.SearchIndex
            .phrase(s, path, Seq("the", "table"))
            .withColumn("phrase", lit("the table")))
          .select(col("phrase"), col("doc_id"), col("n_matches"))
          .orderBy(col("phrase"), col("doc_id"))
      },
      Some(s"""WITH dd AS (
             |  SELECT doc_id, ${Text.DecoratedTextSql} AS text FROM documents),
             |t AS (
             |  SELECT doc_id, ${Text.unicodeTokensSql("text")} AS t FROM dd),
             |p2 AS (SELECT 'tail 42' AS phrase, doc_id,
             |         CAST(len(list_filter(range(1, len(t)), i ->
             |           t[i] = 'tail' AND t[i+1] = '42')) AS BIGINT)
             |           AS n_matches
             |       FROM t),
             |p3 AS (SELECT 'the table' AS phrase, doc_id,
             |         CAST(len(list_filter(range(1, len(t)), i ->
             |           t[i] = 'the' AND t[i+1] = 'table')) AS BIGINT)
             |           AS n_matches
             |       FROM t)
             |SELECT phrase, doc_id, n_matches FROM p2 WHERE n_matches > 0
             |UNION ALL
             |SELECT phrase, doc_id, n_matches FROM p3 WHERE n_matches > 0
             |ORDER BY phrase, doc_id""".stripMargin)),

    // ---- hybrid retrieval SERVED FROM the persisted indexes --------------
    // q_hybrid_rrf's production form: the sparse arm reads the persisted
    // BM25 postings index (operators.SearchIndex), the dense arm reads
    // the persisted binary ANN index (VectorIndex.searchBinary — coarse
    // popcount + exact-cosine rerank), and RRF fuses the two ranked
    // top-20s. NOTHING recomputes from raw text or raw floats at serve
    // time. The oracle replays BOTH serving paths — the from-scratch
    // BM25 chain (which the index probe provably equals) and the binary
    // coarse+rerank chain (the q_hamming_rerank mirror, query pinned to
    // vec 0) — plus the same integer RRF, so the whole index-served
    // pipeline is one hash. Scale: each arm is its index's proven probe
    // plan; fusion joins two 20-row frames.
    Q("q_hybrid_index_serve",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val emb = Tables.embeddings(s, dir)
        val sPath = java.nio.file.Files
          .createTempDirectory("graft_hybrid_sidx").toString
        val bPath = java.nio.file.Files
          .createTempDirectory("graft_hybrid_bidx").toString
        graft.operators.SearchIndex.build(docs, "doc_id", "text", sPath)
        graft.operators.VectorIndex.buildBinary(
          emb, "vec_id", "embedding", bPath)
        val sparse = graft.operators.SearchIndex
          .bm25(s, sPath, QueryTerms, 20)
          .withColumn("rank_sparse", row_number()
            .over(Window.orderBy(col("score_ppm").desc, col("doc_id")))
            .cast("long"))
          .select(col("doc_id"), col("rank_sparse"))
        val dense = graft.operators.VectorIndex.searchBinary(s, bPath,
            emb, "vec_id", "embedding", _.filter(col("vec_id") === 0),
            k = 20, rerankWidth = 32)
          .select(col("neighbor_id").as("doc_id"),
            col("rank").cast("long").as("rank_dense"))
        dense.join(sparse, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            coalesce(col("rank_dense"), lit(0L)).as("rank_dense"),
            coalesce(col("rank_sparse"), lit(0L)).as("rank_sparse"),
            (coalesce(expr("1000000L div (60 + rank_dense)"), lit(0L)) +
              coalesce(expr("1000000L div (60 + rank_sparse)"), lit(0L)))
              .as("rrf_ppm"))
          .orderBy(col("rrf_ppm").desc, col("doc_id"))
      },
      Some(s"""${SimilarityQueries.binaryCodesCte},
              |${SimilarityQueries.rerankCtes("codes", queryPred = "q.vec_id = 0")},
              |den AS (SELECT nid AS doc_id,
              |          CAST(rn2 AS BIGINT) AS rank_dense
              |        FROM f WHERE rn2 <= 20),
              |${bm25CtesFor("documents")},
              |spr AS (SELECT doc_id, rank_sparse FROM (
              |          SELECT doc_id, CAST(row_number() OVER (
              |            ORDER BY score_ppm DESC, doc_id) AS BIGINT)
              |            AS rank_sparse
              |          FROM bm) t WHERE rank_sparse <= 20)
              |SELECT coalesce(den.doc_id, spr.doc_id) AS doc_id,
              |  coalesce(den.rank_dense, 0) AS rank_dense,
              |  coalesce(spr.rank_sparse, 0) AS rank_sparse,
              |  CAST(coalesce(1000000 // (60 + den.rank_dense), 0)
              |     + coalesce(1000000 // (60 + spr.rank_sparse), 0) AS BIGINT)
              |    AS rrf_ppm
              |FROM den FULL OUTER JOIN spr ON den.doc_id = spr.doc_id
              |ORDER BY rrf_ppm DESC, doc_id""".stripMargin)),

    // ---- boolean retrieval from the postings index -------------------------
    // AND/OR/NOT over terms, served from the index: the conjunctive gate
    // is a per-doc count over the must-terms' postings (no per-term join
    // chain), exclusion a broadcast anti-join on the mustNot postings'
    // ids, and the survivors BM25-rank on the positive terms with
    // CORPUS-GLOBAL document frequencies (boolean retrieval restricts
    // which docs score, never what df means). The oracle replays gate,
    // exclusion, and ranking from the raw text.
    Q("q_boolean_search",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val path = java.nio.file.Files
          .createTempDirectory("graft_boolean").toString
        graft.operators.SearchIndex.build(docs, "doc_id", "text", path)
        graft.operators.SearchIndex.booleanSearch(s, path,
          must = Seq("table", "fast"), should = Seq("spark"),
          mustNot = Seq("dup"), k = 20)
      },
      Some(s"""WITH tok AS (
              |  SELECT doc_id, token, count(*) AS tf FROM (
              |    SELECT doc_id, unnest(${Text.unicodeTokensSql("text")}) AS token
              |    FROM documents) u GROUP BY doc_id, token),
              |cand AS (
              |  SELECT doc_id FROM tok WHERE token IN ('table', 'fast')
              |  GROUP BY doc_id HAVING count(*) = 2),
              |excl AS (SELECT DISTINCT doc_id FROM tok WHERE token = 'dup'),
              |gated AS (SELECT doc_id FROM cand ANTI JOIN excl USING (doc_id)),
              |dl AS (
              |  SELECT doc_id, len(${Text.unicodeTokensSql("text")}) AS dl FROM documents),
              |corpus AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
              |df AS (
              |  SELECT token, count(*) AS df FROM tok
              |  WHERE token IN ('table', 'fast', 'spark') GROUP BY token)
              |SELECT doc_id, score_ppm, n_terms FROM (
              |  SELECT tok.doc_id,
              |    CAST(sum((2*n_docs - 2*df + 1) * 1000000 // (2*df + 1)
              |         * (44*tf*sum_dl * 1000000 // (20*tf*sum_dl + 6*sum_dl + 18*dl.dl*n_docs))
              |         // 1000000) AS BIGINT) AS score_ppm,
              |    count(*) AS n_terms
              |  FROM tok
              |  SEMI JOIN gated ON tok.doc_id = gated.doc_id
              |  JOIN df USING (token) JOIN dl ON dl.doc_id = tok.doc_id,
              |       corpus
              |  WHERE token IN ('table', 'fast', 'spark')
              |  GROUP BY tok.doc_id) t
              |ORDER BY score_ppm DESC, doc_id LIMIT 20""".stripMargin)),

    // ---- term completion from the postings index ---------------------------
    // The autocomplete surface: live vocabulary under a prefix ranked by
    // document frequency, served entirely from the index — the prefix is
    // a pushed StringStartsWith over token-sorted row groups, so the
    // probe reads the prefix's own token range. Post-delete stage proves
    // df shifts with the tombstones like every other statistic.
    Q("q_term_completion",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val path = java.nio.file.Files
          .createTempDirectory("graft_complete").toString
        graft.operators.SearchIndex.build(docs, "doc_id", "text", path)
        val full = graft.operators.SearchIndex.completeTerm(s, path, "s", 10)
          .withColumn("stage", lit("full"))
        graft.operators.VectorIndex.deleteIds(
          docs.filter(col("doc_id") < 100), "doc_id", path)
        val deleted = graft.operators.SearchIndex
          .completeTerm(s, path, "s", 10)
          .withColumn("stage", lit("deleted"))
        full.unionByName(deleted)
          .select(col("stage"), col("token"), col("df"),
            col("n_occurrences"))
          .orderBy(col("stage"), col("df").desc, col("token"))
      },
      Some(s"""WITH dd2 AS (SELECT * FROM documents WHERE doc_id >= 100),
              |comp AS (
              |  SELECT token, count(DISTINCT doc_id) AS df,
              |         count(*) AS n_occurrences
              |  FROM (SELECT doc_id, unnest(${Text.unicodeTokensSql("text")}) AS token
              |        FROM documents) u
              |  WHERE token LIKE 's%' GROUP BY token),
              |comp2 AS (
              |  SELECT token, count(DISTINCT doc_id) AS df,
              |         count(*) AS n_occurrences
              |  FROM (SELECT doc_id, unnest(${Text.unicodeTokensSql("text")}) AS token
              |        FROM dd2) u
              |  WHERE token LIKE 's%' GROUP BY token)
              |SELECT 'full' AS stage, token, df, n_occurrences FROM
              |  (SELECT * FROM comp ORDER BY df DESC, token LIMIT 10)
              |UNION ALL
              |SELECT 'deleted', token, df, n_occurrences FROM
              |  (SELECT * FROM comp2 ORDER BY df DESC, token LIMIT 10)
              |ORDER BY stage, df DESC, token""".stripMargin)),

    // ---- search-index time travel ------------------------------------------
    // The BM25 index gains the vector indexes' VERSION AS OF surface:
    // build (v0) → delete (v1) → append clones (v2), then ALL THREE
    // rankings are probed at the end, after every mutation — the v0 pin
    // must rank the full original corpus (later deletes land in higher
    // segments, later appends above its watermark), the v1 pin the
    // post-delete corpus, the current one deletes + clones. Corpus stats
    // at a pin resolve that payload's stats artifact under the pin's
    // watermark, corrected by its own pending segments — so the pinned
    // df/N/Σdl shift exactly as a frozen corpus would, which is what
    // each stage's from-scratch BM25 CTE replay proves.
    Q("q_search_time_travel",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val path = java.nio.file.Files
          .createTempDirectory("graft_sidx_tt").toString
        graft.operators.SearchIndex.build(docs, "doc_id", "text", path)
        val v0 = graft.operators.VectorIndex.versions(s, path).last
        graft.operators.VectorIndex.deleteIds(
          docs.filter(col("doc_id") < 40), "doc_id", path)
        val v1 = graft.operators.VectorIndex.versions(s, path).last
        graft.operators.SearchIndex.append(
          docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")),
          "doc_id", "text", path)
        def stage(name: String, df: org.apache.spark.sql.DataFrame) =
          df.withColumn("stage", lit(name))
        stage("v0_full",
            graft.operators.SearchIndex.bm25At(s, path, v0, QueryTerms, 20))
          .unionByName(stage("v1_deleted",
            graft.operators.SearchIndex.bm25At(s, path, v1, QueryTerms, 20)))
          .unionByName(stage("v2_current",
            graft.operators.SearchIndex.bm25(s, path, QueryTerms, 20)))
          .select(col("stage"), col("doc_id"), col("score_ppm"),
            col("n_terms"))
          .orderBy(col("stage"), col("doc_id"))
      },
      Some(s"""WITH dd2 AS (SELECT * FROM documents WHERE doc_id >= 40),
              |dd3 AS (SELECT * FROM dd2
              |        UNION ALL
              |        SELECT doc_id + 1000000 AS doc_id, text, lang, source,
              |               n_chars
              |        FROM documents),
              |${bm25CtesFor("documents")},
              |${bm25CtesFor("dd2", "2")},
              |${bm25CtesFor("dd3", "3")}
              |SELECT 'v0_full' AS stage, doc_id, score_ppm, n_terms FROM
              |  (SELECT * FROM bm ORDER BY score_ppm DESC, doc_id LIMIT 20)
              |UNION ALL
              |SELECT 'v1_deleted', doc_id, score_ppm, n_terms FROM
              |  (SELECT * FROM bm2 ORDER BY score_ppm DESC, doc_id LIMIT 20)
              |UNION ALL
              |SELECT 'v2_current', doc_id, score_ppm, n_terms FROM
              |  (SELECT * FROM bm3 ORDER BY score_ppm DESC, doc_id LIMIT 20)
              |ORDER BY stage, doc_id""".stripMargin)),

    // ---- hybrid serving at BATCH scale ------------------------------------
    // q_hybrid_index_serve pins query 0; this is its production shape: a
    // whole query SET (five queries, each with its own term set and its
    // own query vector) served in ONE pass per index — bm25Batch reads
    // each requested term's postings once however many queries share it,
    // and the binary ANN arm scans the code table once for all five query
    // vectors (the coarse stage keys every query's candidate heap in the
    // same pass). RRF fuses per (query, doc). The oracle replays the
    // batched BM25 chain, the multi-query coarse+rerank chain, and the
    // fusion — the entire batched serving pipeline in one hash.
    Q("q_hybrid_batch_serve",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val emb = Tables.embeddings(s, dir)
        val sPath = java.nio.file.Files
          .createTempDirectory("graft_hb_sidx").toString
        val bPath = java.nio.file.Files
          .createTempDirectory("graft_hb_bidx").toString
        graft.operators.SearchIndex.build(docs, "doc_id", "text", sPath)
        graft.operators.VectorIndex.buildBinary(
          emb, "vec_id", "embedding", bPath)
        val qset = HybridBatchTerms.toDF("query_id", "token")
        val sparse = graft.operators.SearchIndex
          .bm25Batch(s, sPath, qset, "query_id", "token", k = 20)
          .select(col("query_id"), col("doc_id"),
            col("rank").cast("long").as("rank_sparse"))
        val dense = graft.operators.VectorIndex.searchBinary(s, bPath,
            emb, "vec_id", "embedding", _.filter(col("vec_id") < 5),
            k = 20, rerankWidth = 32)
          .select(col("query_id"), col("neighbor_id").as("doc_id"),
            col("rank").cast("long").as("rank_dense"))
        dense.join(sparse, Seq("query_id", "doc_id"), "full_outer")
          .select(col("query_id"), col("doc_id"),
            coalesce(col("rank_dense"), lit(0L)).as("rank_dense"),
            coalesce(col("rank_sparse"), lit(0L)).as("rank_sparse"),
            (coalesce(expr("1000000L div (60 + rank_dense)"), lit(0L)) +
              coalesce(expr("1000000L div (60 + rank_sparse)"), lit(0L)))
              .as("rrf_ppm"))
          .orderBy(col("query_id"), col("rrf_ppm").desc, col("doc_id"))
      },
      Some(s"""${SimilarityQueries.binaryCodesCte},
              |${SimilarityQueries.rerankCtes("codes", queryPred = "q.vec_id < 5")},
              |den AS (SELECT qid AS query_id, nid AS doc_id,
              |          CAST(rn2 AS BIGINT) AS rank_dense
              |        FROM f WHERE rn2 <= 20),
              |qt(query_id, token) AS (VALUES ${HybridBatchTerms
                .map { case (q, t) => s"($q, '$t')" }.mkString(", ")}),
              |$bm25BatchCtes,
              |spr AS (SELECT query_id, doc_id, rank_sparse FROM (
              |          SELECT query_id, doc_id, CAST(row_number() OVER (
              |            PARTITION BY query_id
              |            ORDER BY score_ppm DESC, doc_id) AS BIGINT)
              |            AS rank_sparse
              |          FROM sc) t WHERE rank_sparse <= 20)
              |SELECT CAST(coalesce(den.query_id, spr.query_id) AS BIGINT)
              |         AS query_id,
              |  coalesce(den.doc_id, spr.doc_id) AS doc_id,
              |  coalesce(den.rank_dense, 0) AS rank_dense,
              |  coalesce(spr.rank_sparse, 0) AS rank_sparse,
              |  CAST(coalesce(1000000 // (60 + den.rank_dense), 0)
              |     + coalesce(1000000 // (60 + spr.rank_sparse), 0) AS BIGINT)
              |    AS rrf_ppm
              |FROM den FULL OUTER JOIN spr
              |  ON den.query_id = spr.query_id AND den.doc_id = spr.doc_id
              |ORDER BY query_id, rrf_ppm DESC, doc_id""".stripMargin)),

    // ---- exact sparse cosine pairs via postings join ----------------------
    // The exact-similarity member of the near-dup family: MinHash
    // ESTIMATES Jaccard, SimHash estimates hamming proximity — this
    // computes the exact cosine over 3-gram-shingle frequency vectors,
    // through the inverted index (shingles, not unigrams: a natural
    // vocabulary's stopwords — or this synthetic corpus's 40-word
    // vocabulary — would otherwise appear in every document and carry no
    // signal). Scale: the postings self-join fans out Σ df² over the
    // shingle vocabulary, so high-df shingles are pruned first with a
    // CORPUS-RELATIVE cap (df ≤ N/10 — boilerplate grams drop, the bound
    // scales with the corpus instead of silently emptying at 10× like an
    // absolute cap would); dot products and norms live in the pruned
    // space, all-integer until the final sqrt (IEEE-exact in both
    // engines, the q_temperature_mix discipline). Deterministic top-100
    // by (sim desc, pair).
    Q("q_sparse_cosine_pairs",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val tot = docs.agg(count(lit(1)).as("__n"))
        val tf = docs
          .select(col("doc_id"),
            explode(Text.shingles(col("text"), 3)).as("token"))
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        val rare = tf.groupBy(col("token"))
          .agg(countDistinct(col("doc_id")).as("df"))
          .crossJoin(broadcast(tot))
          .filter(col("df") * 10 <= col("__n"))
          .select(col("token"))
        val pruned = tf.join(rare, Seq("token"), "left_semi")
        val norms = pruned.groupBy(col("doc_id"))
          .agg(sqrt(sum(col("tf") * col("tf")).cast("double")).as("norm"))
        val dots = pruned.as("a")
          .join(pruned.as("b"),
            col("a.token") === col("b.token") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
        dots
          .join(norms.select(col("doc_id").as("id_a"), col("norm").as("na")), "id_a")
          .join(norms.select(col("doc_id").as("id_b"), col("norm").as("nb")), "id_b")
          .select(col("id_a"), col("id_b"),
            floor(col("dot").cast("double") * 1e6 / (col("na") * col("nb")))
              .cast("long").as("sim_ppm"))
          .orderBy(col("sim_ppm").desc, col("id_a"), col("id_b"))
          .limit(100)
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, t.token, count(*) AS tf
             |  FROM (SELECT doc_id, list_transform(
             |          range(len(string_split(text, ' ')) - 2),
             |          j -> string_split(text, ' ')[j+1] || ' ' ||
             |               string_split(text, ' ')[j+2] || ' ' ||
             |               string_split(text, ' ')[j+3]) AS gs
             |        FROM documents) d, unnest(d.gs) AS t(token)
             |  GROUP BY doc_id, t.token),
             |n AS (SELECT count(*) AS nd FROM documents),
             |rare AS (
             |  SELECT token FROM (
             |    SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token), n
             |  WHERE df * 10 <= nd),
             |p AS (SELECT tf.* FROM tf SEMI JOIN rare USING (token)),
             |norms AS (
             |  SELECT doc_id, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS norm
             |  FROM p GROUP BY doc_id),
             |dots AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |         CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
             |  FROM p a JOIN p b
             |    ON a.token = b.token AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b,
             |  CAST(floor(CAST(dot AS DOUBLE) * 1e6 / (na.norm * nb.norm))
             |       AS BIGINT) AS sim_ppm
             |FROM dots
             |JOIN norms na ON na.doc_id = id_a
             |JOIN norms nb ON nb.doc_id = id_b
             |ORDER BY sim_ppm DESC, id_a, id_b LIMIT 100""".stripMargin))
  )
}
