package graft.queries

import graft.{Q, Tables}
import graft.functions.Text
import graft.operators.MinHashLSH
import org.apache.spark.sql.functions._

/** Deduplication family over `documents`: exact (hash-groupBy), exact
  * n-gram Jaccard, MinHash+LSH candidates, SimHash hamming pairs. All
  * oracle-checked via integer-ppm arithmetic (see operators/MinHashLSH).
  */
object DedupQueries {

  /** The near-dup fixture: the punctuation/Unicode-decorated text,
    * normalized through the canonical Unicode tokenizer — one expression
    * valid in BOTH engines. The MinHash/SimHash family fingerprints THIS
    * (real web text under-tokenizes on a bare space split), while the
    * fingerprint expressions keep their byte-faithful single-space
    * contract underneath. */
  private val dedupTextSql: String =
    Text.normalizeForDedupSql(Text.DecoratedTextSql)

  /** Shared oracle for the two MinHash+LSH pair queries: both signature
    * paths (fused MinHashSigExpr; explode + min aggregates over portable
    * shingle hashes) are bit-identical, so one DuckDB mirror checks both
    * — on the decorated-Unicode near-dup fixture. */
  private val lshPairsOracleSql: String =
    s"""WITH sig AS (
       |  SELECT doc_id, ${Text.minhashSigSql(dedupTextSql, 64)} AS sig FROM documents),
       |buckets AS (
       |  SELECT doc_id, sig, i AS band,
       |         md5(array_to_string(sig[i*4+1 : i*4+4], ',')) AS bkey
       |  FROM sig, range(16) t(i)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM buckets a
       |  JOIN buckets b ON a.band = b.band AND a.bkey = b.bkey
       |                AND a.doc_id < b.doc_id),
       |est AS (
       |  SELECT id_a, id_b,
       |         len(list_filter(range(64), i -> sa.sig[i+1] = sb.sig[i+1])) * 15625 AS est_ppm
       |  FROM cand
       |  JOIN sig sa ON cand.id_a = sa.doc_id
       |  JOIN sig sb ON cand.id_b = sb.doc_id)
       |SELECT id_a, id_b, est_ppm FROM est
       |WHERE est_ppm >= 500000 ORDER BY id_a, id_b""".stripMargin

  /** Full-recompute transitive closure over ALL near-dup pairs — shared
    * verbatim by q_dedup_clusters (batch clustering) and
    * q_dedup_incremental (standing + drop maintenance): their equal
    * hashes are the proof incremental == full recompute. */
  private[queries] def dedupClustersOracle: String =
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, unnest(${Text.shingleHashesSql("text")}) AS h FROM documents),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b
       |  FROM inter
       |  JOIN sizes sa ON id_a = sa.doc_id
       |  JOIN sizes sb ON id_b = sb.doc_id
       |  WHERE i * 1000000 // (sa.n + sb.n - i) >= 500000),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.src AS id, rc.r FROM edges e JOIN reach rc ON rc.id = e.dst),
       |lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
       |SELECT id AS doc_id, cluster_id,
       |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM lab ORDER BY doc_id""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- exact dedup: group identical text, keep lowest id ---------------
    Q("q_dedup_exact",
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id")),
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),

    // ---- exact dedup on content hash (the 100 TB shape: group 16-byte
    //      digests, never the full text) ----------------------------------
    Q("q_dedup_exact_hash",
      (s, dir) => Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("h"), col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id")),
      Some("""SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin)),

    // ---- exact 3-gram Jaccard near-dup pairs ≥ 0.5 -----------------------
    Q("q_jaccard_pairs",
      (s, dir) => MinHashLSH.jaccardPairs(
          Tables.documents(s, dir), "doc_id", "text", minJaccardPpm = 500000L)
        .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH sh AS (
              |  SELECT doc_id, unnest(${Text.shingleHashesSql("text")}) AS h FROM documents),
              |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT id_a, id_b, i * 1000000 // (sa.n + sb.n - i) AS jaccard_ppm
              |FROM inter
              |JOIN sizes sa ON id_a = sa.doc_id
              |JOIN sizes sb ON id_b = sb.doc_id
              |WHERE i * 1000000 // (sa.n + sb.n - i) >= 500000
              |ORDER BY id_a, id_b""".stripMargin)),

    // ---- MinHash + LSH candidate pairs (64 perms, 16 bands × 4) ----------
    // Over the decorated-Unicode fixture, shingling the NORMALIZED token
    // stream (Text.normalizeForDedup): punctuation, case, NBSP/thin
    // spaces and accents no longer split near-dup fingerprints apart.
    Q("q_minhash_lsh_pairs",
      (s, dir) => MinHashLSH.candidatePairs(
          Tables.documents(s, dir)
            .withColumn("text", expr(Text.DecoratedTextSql)),
          "doc_id", "text",
          k = 64, bands = 16, minEstPpm = 500000L,
          unicodeNormalize = true)
        .orderBy(col("id_a"), col("id_b")),
      Some(lshPairsOracleSql)),

    // ---- persisted MinHash signature index: text ingest-dedup artifact --
    // The text twin of q_dedup_index (operators.MinHashIndex): the
    // standing corpus's 64-perm signatures persist ONCE (~0.5 KB/item —
    // the text never re-shingles), drops probe the saved artifact with
    // the asymmetric banded bucket join, clean items append under the
    // SAVED geometry (k/shingle travel in meta — the never-refit
    // contract), and GDPR deletes run VectorIndex's shared tombstone
    // machinery. Oracle replays the full lifecycle: build → delete some
    // standing ids → probe drop 1 → append its clean survivors → compact
    // (observable change breaks the hash) → delete some survivors →
    // probe drop 2 against standing∪survivors.
    Q("q_minhash_index",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft_mhidx").toString
        val docs = Tables.documents(s, dir)
        graft.operators.MinHashIndex.build(
          docs.filter(col("doc_id") < 250), "doc_id", "text", path)
        graft.operators.VectorIndex.deleteIds(
          docs.filter(col("doc_id") < 250 && col("doc_id") % 11 === 0),
          "doc_id", path)
        val drop1 = docs.filter(col("doc_id") >= 250 && col("doc_id") < 400)
        // checkpoint BEFORE mutating the index: verdicts are lazy plans
        val v1 = graft.operators.MinHashIndex.verdicts(
            drop1, "doc_id", "text", path)
          .localCheckpoint(true)
        val survIds = v1.filter(col("n_dup_matches") === 0)
          .select(col("doc_id").as("__sid"))
        graft.operators.MinHashIndex.append(
          drop1.join(survIds, col("doc_id") === col("__sid"))
            .select(col("doc_id"), col("text")),
          "doc_id", "text", path)
        graft.operators.VectorIndex.compact(s, path)
        graft.operators.VectorIndex.deleteIds(
          survIds.filter(col("__sid") % 13 === 0), "__sid", path)
        val v2 = graft.operators.MinHashIndex.verdicts(
          docs.filter(col("doc_id") >= 400), "doc_id", "text", path)
        v1.withColumn("stage", lit("drop1"))
          .unionByName(v2.withColumn("stage", lit("drop2")))
          .orderBy(col("stage"), col("doc_id"))
      },
      Some(s"""WITH sig AS (
              |  SELECT doc_id, ${Text.minhashSigSql("text", 64)} AS sig
              |  FROM documents),
              |stand AS (SELECT * FROM sig
              |          WHERE doc_id < 250 AND doc_id % 11 <> 0),
              |d1 AS (SELECT * FROM sig WHERE doc_id >= 250 AND doc_id < 400),
              |bstand AS (SELECT doc_id, i AS band,
              |             md5(array_to_string(sig[i*4+1 : i*4+4], ',')) AS bkey
              |           FROM stand, range(16) t(i)),
              |bd1 AS (SELECT doc_id, i AS band,
              |          md5(array_to_string(sig[i*4+1 : i*4+4], ',')) AS bkey
              |        FROM d1, range(16) t(i)),
              |c1 AS (SELECT DISTINCT a.doc_id AS id_p, b.doc_id AS id_r
              |       FROM bd1 a JOIN bstand b
              |         ON a.band = b.band AND a.bkey = b.bkey),
              |m1 AS (SELECT id_p, id_r FROM c1
              |       JOIN sig sa ON c1.id_p = sa.doc_id
              |       JOIN sig sb ON c1.id_r = sb.doc_id
              |       WHERE len(list_filter(range(64),
              |         i -> sa.sig[i+1] = sb.sig[i+1])) * 15625 >= 500000),
              |v1 AS (SELECT d.doc_id,
              |         CAST(count(m1.id_r) AS BIGINT) AS n_dup_matches
              |       FROM d1 d LEFT JOIN m1 ON m1.id_p = d.doc_id
              |       GROUP BY d.doc_id),
              |surv AS (SELECT sig.* FROM sig JOIN v1 USING (doc_id)
              |         WHERE v1.n_dup_matches = 0 AND sig.doc_id % 13 <> 0),
              |live2 AS (SELECT * FROM stand UNION ALL SELECT * FROM surv),
              |d2 AS (SELECT * FROM sig WHERE doc_id >= 400),
              |blive2 AS (SELECT doc_id, i AS band,
              |             md5(array_to_string(sig[i*4+1 : i*4+4], ',')) AS bkey
              |           FROM live2, range(16) t(i)),
              |bd2 AS (SELECT doc_id, i AS band,
              |          md5(array_to_string(sig[i*4+1 : i*4+4], ',')) AS bkey
              |        FROM d2, range(16) t(i)),
              |c2 AS (SELECT DISTINCT a.doc_id AS id_p, b.doc_id AS id_r
              |       FROM bd2 a JOIN blive2 b
              |         ON a.band = b.band AND a.bkey = b.bkey),
              |m2 AS (SELECT id_p, id_r FROM c2
              |       JOIN sig sa ON c2.id_p = sa.doc_id
              |       JOIN sig sb ON c2.id_r = sb.doc_id
              |       WHERE len(list_filter(range(64),
              |         i -> sa.sig[i+1] = sb.sig[i+1])) * 15625 >= 500000),
              |v2 AS (SELECT d.doc_id,
              |         CAST(count(m2.id_r) AS BIGINT) AS n_dup_matches
              |       FROM d2 d LEFT JOIN m2 ON m2.id_p = d.doc_id
              |       GROUP BY d.doc_id)
              |SELECT 'drop1' AS stage, * FROM v1
              |UNION ALL
              |SELECT 'drop2' AS stage, * FROM v2
              |ORDER BY stage, doc_id""".stripMargin)),

    // ---- dedup materialization: the cleaned corpus itself ---------------
    // Remove every doc that appears as the larger id of a pair whose
    // MinHash-ESTIMATED Jaccard is >= 0.8 (canonical representative =
    // smallest id). This is the actual pipeline output a training run
    // consumes, built on the bucketed candidatePairs path — the 100 TB
    // shape (no shingle self-join anywhere). The oracle mirrors the same
    // 64-perm estimate, so recall/precision of the estimator cancel out.
    Q("q_dedup_corpus",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val dupIds = MinHashLSH.candidatePairs(docs, "doc_id", "text",
            k = 64, bands = 16, minEstPpm = 800000L)
          .select(col("id_b").as("doc_id")).distinct()
        docs.join(dupIds, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH sig AS (
              |  SELECT doc_id, ${Text.minhashSigSql("text", 64)} AS sig FROM documents),
              |buckets AS (
              |  SELECT doc_id, sig, i AS band,
              |         md5(array_to_string(sig[i*4+1 : i*4+4], ',')) AS bkey
              |  FROM sig, range(16) t(i)),
              |cand AS (
              |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM buckets a
              |  JOIN buckets b ON a.band = b.band AND a.bkey = b.bkey
              |                AND a.doc_id < b.doc_id),
              |dups AS (
              |  SELECT DISTINCT id_b FROM cand
              |  JOIN sig sa ON cand.id_a = sa.doc_id
              |  JOIN sig sb ON cand.id_b = sb.doc_id
              |  WHERE len(list_filter(range(64), i -> sa.sig[i+1] = sb.sig[i+1])) * 15625 >= 800000)
              |SELECT doc_id, lang, n_chars FROM documents
              |WHERE doc_id NOT IN (SELECT id_b FROM dups)
              |ORDER BY doc_id""".stripMargin)),

    // ---- MinHash+LSH, explode-and-aggregate signature path ---------------
    // The "fast" variant exercises candidatePairs' OTHER signature shape:
    // explode shingle hashes + 64 codegen'd min() aggregates with map-side
    // partials (vs the default fused MinHashSigExpr narrow pass). The
    // shingle hasher is the fused portable ShingleHashExpr (polyhash), so
    // — hashes already in [0, P) make the explode path's pmod-folded
    // permutation identical to the fused form — the output is
    // bit-identical to q_minhash_lsh_pairs and shares its DuckDB oracle.
    // (xxhash64 banding, which DuckDB cannot mirror, remains the Stress
    // harness's scale variant.)
    Q("q_minhash_lsh_pairs_fast",
      (s, dir) => MinHashLSH.candidatePairs(
          Tables.documents(s, dir)
            .withColumn("text",
              Text.normalizeForDedup(expr(Text.DecoratedTextSql))),
          "doc_id", "text",
          k = 64, bands = 16, minEstPpm = 500000L,
          shingleFn = c => Text.shingleHashes(c))
        .orderBy(col("id_a"), col("id_b")),
      Some(lshPairsOracleSql)),

    // ---- candidate verification: LSH candidates re-checked by edit
    //      distance — the standard two-phase dedup (cheap recall-oriented
    //      candidates, exact precision-oriented verify on the tiny
    //      candidate set, never on the N² corpus) --------------------------
    Q("q_dedup_verified",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val cands = MinHashLSH.candidatePairs(
          docs, "doc_id", "text", k = 64, bands = 16, minEstPpm = 500000L)
        cands
          .join(docs.withColumnsRenamed(Map("doc_id" -> "id_a", "text" -> "ta")), "id_a")
          .join(docs.withColumnsRenamed(Map("doc_id" -> "id_b", "text" -> "tb")), "id_b")
          .withColumn("edit_dist", levenshtein(col("ta"), col("tb")).cast("long"))
          .withColumn("max_len", greatest(length(col("ta")), length(col("tb"))).cast("long"))
          .filter(col("edit_dist") * 5 < col("max_len")) // >80% similar
          .select(col("id_a"), col("id_b"), col("edit_dist"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH sig AS (
              |  SELECT doc_id, ${Text.minhashSigSql("text", 64)} AS sig FROM documents),
              |buckets AS (
              |  SELECT doc_id, sig, i AS band,
              |         md5(array_to_string(sig[i*4+1 : i*4+4], ',')) AS bkey
              |  FROM sig, range(16) t(i)),
              |cand0 AS (
              |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM buckets a
              |  JOIN buckets b ON a.band = b.band AND a.bkey = b.bkey
              |                AND a.doc_id < b.doc_id),
              |cand AS (
              |  SELECT id_a, id_b FROM cand0
              |  JOIN sig sa ON cand0.id_a = sa.doc_id
              |  JOIN sig sb ON cand0.id_b = sb.doc_id
              |  WHERE len(list_filter(range(64), i -> sa.sig[i+1] = sb.sig[i+1])) * 15625 >= 500000)
              |SELECT id_a, id_b, levenshtein(da.text, db.text) AS edit_dist
              |FROM cand JOIN documents da ON da.doc_id = id_a
              |          JOIN documents db ON db.doc_id = id_b
              |WHERE levenshtein(da.text, db.text) * 5 < greatest(len(da.text), len(db.text))
              |ORDER BY id_a, id_b""".stripMargin)),

    // ---- dedup clusters: connected components over near-dup pairs -------
    // Near-dup similarity is only locally transitive, so canonical-doc
    // selection runs union-find over the pair graph. Spark side is
    // distributed min-label propagation (operators.Components, one
    // map-side-combinable shuffle per round); the oracle is the exact
    // transitive closure via DuckDB's recursive CTE — a hash match proves
    // the fixpoint, not just per-pair agreement.
    Q("q_dedup_clusters",
      (s, dir) => {
        val edges = MinHashLSH.jaccardPairs(
            Tables.documents(s, dir), "doc_id", "text", minJaccardPpm = 500000L)
          .select(col("id_a"), col("id_b"))
        val comps = graft.operators.Components
          .connectedComponents(edges, "id_a", "id_b")
        val sizes = comps.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("cluster_size"))
        comps.join(broadcast(sizes), Seq("cluster_id"))
          .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"))
          .orderBy(col("doc_id"))
      },
      Some(dedupClustersOracle)),

    // ---- INCREMENTAL dedup clustering: fold a drop into the standing ----
    // The continuous-dedup maintenance step (Components.
    // incrementalComponents): the standing corpus (doc_id < 350) is
    // clustered once; the drop's edges — every near-dup pair touching a
    // new doc, including drop↔drop and the cluster-MERGING drop↔standing
    // bridges — fold in by contracting touched clusters to a BATCH-sized
    // graph, re-solving components there, and broadcast-relabeling. The
    // oracle is the full transitive closure over ALL pairs — the same
    // text as q_dedup_clusters — so the hash match proves incremental
    // maintenance is indistinguishable from re-clustering the corpus,
    // transitive multi-cluster merges included. Scale: per ingest cycle
    // the corpus assignment is joined by key, never re-propagated —
    // O(batch) propagation instead of O(corpus).
    Q("q_dedup_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val standingEdges = MinHashLSH.jaccardPairs(
            docs.filter(col("doc_id") < 350), "doc_id", "text",
            minJaccardPpm = 500000L)
          .select(col("id_a"), col("id_b"))
        val standing = graft.operators.Components
          .connectedComponents(standingEdges, "id_a", "id_b")
        val newEdges = MinHashLSH.jaccardPairs(
            docs, "doc_id", "text", minJaccardPpm = 500000L)
          .filter(col("id_a") >= 350 || col("id_b") >= 350)
          .select(col("id_a"), col("id_b"))
        val comps = graft.operators.Components
          .incrementalComponents(standing, newEdges)
        val sizes = comps.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("cluster_size"))
        comps.join(broadcast(sizes), Seq("cluster_id"))
          .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"))
          .orderBy(col("doc_id"))
      },
      Some(dedupClustersOracle)),

    // ---- SimHash near-dup pairs: sampled probe side, hamming ≤ 6 ---------
    // Banded-LSH equi-join over the 30-bit simhash with the band width
    // DERIVED from count(*) (simhashBandBitsFor — round 7, same derivation
    // and sub-radius recall-1.0 machinery as the 64-bit Hamming join), so
    // the output is bit-identical to the quadratic cross-join form the
    // oracle runs — with no cross join in the Spark plan (asserted in
    // PlanShapeSpec).
    Q("q_simhash_pairs",
      (s, dir) => {
        val sh = Tables.documents(s, dir)
          .withColumn("__tokh",
            transform(Text.unicodeTokens(expr(Text.DecoratedTextSql)),
              t => Text.polyHash(t)))
          .select(col("doc_id"), Text.simhash30("__tokh").as("sh"))
          // materialize the 2-longs-per-doc hash table once: the banded
          // self-join consumes it on both sides, and without the cut the
          // tokenize+polyhash+simhash text pass runs twice (measured 8.8
          // → 1.9 s at sf0.1 — the same cut every media phash/audio call
          // site already applies to its dHash/fingerprint table)
          .localCheckpoint(true)
        MinHashLSH.simhashBandPairs(sh, "doc_id", "sh",
            maxHamming = 6, bits = 30,
            probePred = id => id % 20 === 0)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH th AS (SELECT doc_id,
              |  list_transform(${Text.unicodeTokensSql(Text.DecoratedTextSql)}, t -> ${Text.polyHashSql("t")}) AS h
              |  FROM documents),
              |sh AS (SELECT doc_id,
              |  list_reduce(list_prepend(0::BIGINT, range(30)), (acc, j) ->
              |    acc + CASE WHEN list_reduce(list_prepend(0::BIGINT, h),
              |                 (sm, x) -> sm + CASE WHEN (x >> j::INT) & 1 = 1 THEN 1 ELSE -1 END) > 0
              |               THEN (1::BIGINT << j::INT) ELSE 0 END) AS sh
              |  FROM th)
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              |       bit_count(xor(a.sh, b.sh))::BIGINT AS hamming
              |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |WHERE a.doc_id % 20 = 0 AND bit_count(xor(a.sh, b.sh)) <= 6
              |ORDER BY id_a, id_b""".stripMargin)),

    // ---- cluster canonicalization: keep the best doc per dup cluster -----
    // The step after clustering: within every near-dup cluster keep the
    // highest-quality document (type-token ratio, ties to the smallest
    // doc_id) and drop the rest. One max_by hash aggregate over the
    // (tiny) clustered subset joined back — the corpus-sized inputs never
    // move beyond what clustering itself already did. The oracle re-runs
    // the recursive-CTE closure and picks via ROW_NUMBER.
    Q("q_cluster_keep_best",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val edges = MinHashLSH.jaccardPairs(docs, "doc_id", "text",
            minJaccardPpm = 500000L)
          .select(col("id_a"), col("id_b"))
        val comps = graft.operators.Components
          .connectedComponents(edges, "id_a", "id_b")
        val t = Text.tokens(col("text"))
        val qual = docs.select(col("doc_id"),
          size(array_distinct(t)).cast("long").as("__nd"),
          size(t).cast("long").as("__n"))
          .select(col("doc_id"), expr("__nd * 1000000L div __n").as("ttr_ppm"))
        val members = comps.select(col("id").as("doc_id"), col("cluster_id"))
          .join(qual, Seq("doc_id"))
        val best = members.groupBy(col("cluster_id"))
          .agg(max(struct(col("ttr_ppm").as("t"), (-col("doc_id")).as("negid"))).as("__b"))
          .select(col("cluster_id"), (-col("__b.negid")).as("__keep_doc"))
        members.join(broadcast(best), Seq("cluster_id"))
          .select(col("doc_id"), col("cluster_id"), col("ttr_ppm"),
            (col("doc_id") === col("__keep_doc")).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE sh AS (
              |  SELECT doc_id, unnest(${Text.shingleHashesSql("text")}) AS h FROM documents),
              |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |pairs AS (
              |  SELECT id_a, id_b FROM inter
              |  JOIN sizes sa ON id_a = sa.doc_id
              |  JOIN sizes sb ON id_b = sb.doc_id
              |  WHERE i * 1000000 // (sa.n + sb.n - i) >= 500000),
              |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              |          UNION SELECT id_b, id_a FROM pairs),
              |reach AS (
              |  SELECT src AS id, src AS r FROM edges
              |  UNION
              |  SELECT e.src AS id, rc.r FROM edges e JOIN reach rc ON rc.id = e.dst),
              |lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
              |qual AS (SELECT doc_id,
              |  len(list_distinct(string_split(text, ' '))) * 1000000
              |    // len(string_split(text, ' ')) AS ttr_ppm
              |  FROM documents),
              |members AS (
              |  SELECT lab.id AS doc_id, lab.cluster_id, qual.ttr_ppm
              |  FROM lab JOIN qual ON lab.id = qual.doc_id),
              |best AS (
              |  SELECT cluster_id, doc_id AS keep_doc FROM (
              |    SELECT cluster_id, doc_id,
              |      row_number() OVER (PARTITION BY cluster_id
              |                         ORDER BY ttr_ppm DESC, doc_id) AS rn
              |    FROM members) t WHERE rn = 1)
              |SELECT m.doc_id, m.cluster_id, CAST(m.ttr_ppm AS BIGINT) AS ttr_ppm,
              |       m.doc_id = b.keep_doc AS keep
              |FROM members m JOIN best b USING (cluster_id)
              |ORDER BY m.doc_id""".stripMargin)),

    // ---- incremental dedup: new batch vs existing corpus ------------------
    // The shape every recurring crawl runs: a small new batch (docs with
    // id ≡ 7 mod 10 stand in for today's arrivals) checked against the
    // standing corpus. Each new doc gets its best-matching corpus doc by
    // shingle Jaccard and a verdict: dup_exact (identical shingle set),
    // dup_near (≥ 0.5), or keep. Scale: the NEW side's shingles broadcast
    // (a daily batch is GBs against a 100 TB corpus); the corpus is
    // scanned once and only hash-matching shingles enter the aggregate —
    // the corpus never self-joins and never shuffles its text.
    Q("q_incremental_dedup",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val sh = Text.shingleHashes(col("text"))
        val shNew = docs.filter(col("doc_id") % 10 === 7)
          .select(col("doc_id").as("new_id"), explode(sh).as("h"))
        val shCorp = docs.filter(col("doc_id") % 10 =!= 7)
          .select(col("doc_id").as("corp_id"), explode(sh).as("h"))
        val sizesN = shNew.groupBy(col("new_id")).agg(count(lit(1)).as("na"))
        val sizesC = shCorp.groupBy(col("corp_id")).agg(count(lit(1)).as("nb"))
        val jac = shCorp.join(broadcast(shNew), Seq("h"))
          .groupBy(col("new_id"), col("corp_id")).agg(count(lit(1)).as("i"))
          .join(broadcast(sizesN), Seq("new_id"))
          .join(sizesC, Seq("corp_id"))
          .withColumn("j", expr("i * 1000000L div (na + nb - i)"))
        val best = jac.groupBy(col("new_id"))
          .agg(max(struct(col("j"), (-col("corp_id")).as("negid"))).as("__b"))
          .select(col("new_id"), col("__b.j").as("jaccard_ppm"),
            (-col("__b.negid")).as("match_id"))
        docs.filter(col("doc_id") % 10 === 7).select(col("doc_id").as("new_id"))
          .join(best, Seq("new_id"), "left")
          .withColumn("jaccard_ppm", coalesce(col("jaccard_ppm"), lit(0L)))
          .withColumn("match_id", coalesce(col("match_id"), lit(-1L)))
          .select(col("new_id").as("doc_id"),
            when(col("jaccard_ppm") === 1000000L, "dup_exact")
              .when(col("jaccard_ppm") >= 500000L, "dup_near")
              .otherwise("keep").as("verdict"),
            col("match_id"), col("jaccard_ppm"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH sh AS (
              |  SELECT doc_id, unnest(${Text.shingleHashesSql("text")}) AS h FROM documents),
              |shn AS (SELECT doc_id AS new_id, h FROM sh WHERE doc_id % 10 = 7),
              |shc AS (SELECT doc_id AS corp_id, h FROM sh WHERE doc_id % 10 <> 7),
              |sn AS (SELECT new_id, count(*) AS na FROM shn GROUP BY 1),
              |sc AS (SELECT corp_id, count(*) AS nb FROM shc GROUP BY 1),
              |jac AS (
              |  SELECT new_id, corp_id, i * 1000000 // (na + nb - i) AS j
              |  FROM (SELECT new_id, corp_id, count(*) AS i
              |        FROM shn JOIN shc USING (h) GROUP BY 1, 2) x
              |  JOIN sn USING (new_id) JOIN sc USING (corp_id)),
              |best AS (
              |  SELECT new_id, corp_id AS match_id, j FROM (
              |    SELECT new_id, corp_id, j,
              |      row_number() OVER (PARTITION BY new_id ORDER BY j DESC, corp_id) AS rn
              |    FROM jac) t WHERE rn = 1)
              |SELECT d.doc_id,
              |  CASE WHEN coalesce(j, 0) = 1000000 THEN 'dup_exact'
              |       WHEN coalesce(j, 0) >= 500000 THEN 'dup_near'
              |       ELSE 'keep' END AS verdict,
              |  coalesce(match_id, -1) AS match_id,
              |  CAST(coalesce(j, 0) AS BIGINT) AS jaccard_ppm
              |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) d
              |LEFT JOIN best ON d.doc_id = best.new_id
              |ORDER BY d.doc_id""".stripMargin)),

    // ---- exact-substring dedup (duplicated-span accounting) ---------------
    // Document-level dedup misses the web's real duplication shape:
    // shared SPANS (quotes, licenses, templates) inside otherwise-unique
    // pages. The ExactSubstr discipline: a position is duplicated when
    // its 8-token gram occurs anywhere else in the corpus; overlapping
    // duplicated grams merge into maximal spans (gaps-and-islands over
    // positions), and each document reports its duplicated-token count —
    // the quantity a span-removal pass would cut. Scale: the corpus
    // shuffles (8-byte hash, position) pairs — never text — into one
    // occurrence-count aggregate; the span merge is two windows
    // partitioned by doc_id, so per-task state is bounded by document
    // length. This is the honest distributed form of suffix-array
    // ExactSubstr: same output, no global suffix sort.
    Q("q_exact_substr",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("__t", Text.tokens(col("text")))
          .withColumn("__n", size(col("__t")).cast("long"))
        val grams = docs.filter(col("__n") >= 8)
          .select(col("doc_id"),
            posexplode(transform(
              sequence(lit(0L), col("__n") - 8),
              p => Text.polyHash(
                array_join(slice(col("__t"), (p + 1).cast("int"), lit(8)), " "))))
              .as(Seq("p", "h")))
          .withColumn("p", col("p").cast("long"))
        val occ = grams.groupBy(col("h")).agg(count(lit(1)).as("__c"))
        val dup = grams.join(occ, Seq("h")).filter(col("__c") > 1)
          .select(col("doc_id"), col("p"))
        val per = graft.operators.Spans.coveredLength(dup, "doc_id", "p", width = 8)
        docs.select(col("doc_id"), col("__n"))
          .join(per, Seq("doc_id"), "left")
          .select(col("doc_id"), col("__n").as("n_tokens"),
            coalesce(col("n_intervals"), lit(0L)).as("n_dup_positions"),
            coalesce(col("covered"), lit(0L)).as("dup_tokens"),
            expr("coalesce(covered, 0L) * 1000000L div __n").as("dup_ppm"))
          .orderBy(col("doc_id"))
      },
      Some {
        val gram = "array_to_string(t[(u.p+1):(u.p+8)], ' ')"
        s"""WITH tk AS (
           |  SELECT doc_id, string_split(text, ' ') AS t,
           |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
           |  FROM documents),
           |g AS (
           |  SELECT doc_id, u.p AS p, ${Text.polyHashSql(gram)} AS h
           |  FROM tk CROSS JOIN LATERAL
           |    (SELECT unnest(range(n - 7)) AS p) u
           |  WHERE n >= 8),
           |occ AS (SELECT h, count(*) AS c FROM g GROUP BY h),
           |d AS (SELECT g.doc_id, g.p FROM g JOIN occ USING (h) WHERE occ.c > 1),
           |brk AS (
           |  SELECT doc_id, p,
           |    CASE WHEN max(p + 8) OVER prev IS NULL
           |           OR p >= max(p + 8) OVER prev THEN 1 ELSE 0 END AS b
           |  FROM d
           |  WINDOW prev AS (PARTITION BY doc_id ORDER BY p
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
           |isl AS (
           |  SELECT doc_id, p,
           |    CAST(sum(b) OVER (PARTITION BY doc_id ORDER BY p
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS island
           |  FROM brk),
           |spans AS (
           |  SELECT doc_id, island, min(p) AS s, max(p + 8) AS e,
           |         count(*) AS np
           |  FROM isl GROUP BY 1, 2),
           |per AS (
           |  SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS dt,
           |         CAST(sum(np) AS BIGINT) AS dp
           |  FROM spans GROUP BY 1)
           |SELECT tk.doc_id, tk.n AS n_tokens,
           |  coalesce(per.dp, 0) AS n_dup_positions,
           |  coalesce(per.dt, 0) AS dup_tokens,
           |  coalesce(per.dt, 0) * 1000000 // tk.n AS dup_ppm
           |FROM tk LEFT JOIN per USING (doc_id)
           |ORDER BY tk.doc_id""".stripMargin
      })
  )
}
