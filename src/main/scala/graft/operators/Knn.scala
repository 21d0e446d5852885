package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column.
  *
  * - [[bruteTopK]]: exact cosine top-k of a (small, broadcast) query set
  *   against the full corpus — the correctness baseline. One narrow pass
  *   over the corpus per run; queries are broadcast so the corpus never
  *   shuffles; top-k via per-query window on a corpus-partitioned frame.
  *
  * - [[nnWithinBucket]]: the IVF-style scale path — neighbors are only
  *   sought inside a coarse bucket (here any precomputed bucket column:
  *   a cluster id, an LSH sign-bucket, a label). Turns N² into
  *   Σ bucket² and keeps the join an equi-join on the bucket key, which
  *   Spark shuffles hash-partitioned — linear scale-out.
  *
  * Cosine is computed in double precision with a strictly sequential fold
  * (`aggregate`), making results bit-identical to the DuckDB oracle's
  * `list_reduce` — similarity output is floor(sim·1e6) for exact compare.
  *
  * Zero-magnitude vectors yield NaN cosine, which BOTH engines rank above
  * every real similarity (Spark and DuckDB agree, so oracle parity holds)
  * — but semantically a zero vector would then "win" every bucket it is
  * in. Callers should filter zero-norm vectors before NN search.
  */
object Knn {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product — deterministic, oracle-portable. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Interpreted-HOF cosine — kept as the spec oracle for [[cosine]]. */
  def cosineHof(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Hot-path cosine: fused native codegen expression, bit-identical to
    * [[cosineHof]] (same sequential fold order; see CosineSimExpr). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimExpr(a, b)

  /** Exact top-k neighbors for each row of `queries` (small, broadcast). */
  def bruteTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__v"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("__sim", cosine(col("__qv"), col("__v")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("neighbor_id"))
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        floor(col("__sim") * 1e6).cast("long").as("sim_ppm"),
        col("__rn").cast("int").as("rank"))
  }

  /** [[bruteTopK]] with NO pair materialization: one mapPartitions pass
    * holding bounded per-query top-k lists over a tight JVM cosine loop
    * (the exact [[graft.functions.CosineSimExpr]] fold — sequential
    * double accumulation, `dot / (sqrt(na)·sqrt(nb))` — so similarities
    * are bit-identical to the declarative form), emitting ≤ queries×k
    * rows per partition; a tiny global window merges partition winners.
    * The declarative join form materializes |corpus|·|queries| rows and
    * Spark's per-joined-row cost dominates at scale (measured on the
    * binary-ANN coarse stage, same shape). Spec-proven equal on real
    * data; one honest divergence: zero-norm vectors (NaN cosine) are
    * dropped here, while the window form ranks NaN first under DESC.
    * Query float vectors collect to the driver (4·dim bytes each, not
    * 8-byte codes — this path has no codes): queries are a
    * designed-small broadcast set by contract. */
  def bruteTopKPartitioned(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = queries.select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val cand = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val nq = q.length
        val sims = Array.fill(nq)(Array.fill(k)(Double.NegativeInfinity))
        val ids  = Array.fill(nq)(Array.fill(k)(Long.MaxValue))
        while (it.hasNext) {
          val (id, v) = it.next()
          var i = 0
          while (i < nq) {
            val (qid, qv) = q(i)
            if (id != qid) {
              var dot = 0.0; var na = 0.0; var nb = 0.0
              var j = 0
              while (j < qv.length) {
                val x = qv(j).toDouble; val y = v(j).toDouble
                dot += x * y; na += x * x; nb += y * y
                j += 1
              }
              val sim = dot / (math.sqrt(na) * math.sqrt(nb))
              val ss = sims(i); val is = ids(i)
              // replace the worst (index 0) if better under (sim desc, id)
              if (sim > ss(0) || (sim == ss(0) && id < is(0))) {
                ss(0) = sim; is(0) = id
                var b = 0
                while (b + 1 < k &&
                    (ss(b) > ss(b + 1) ||
                      (ss(b) == ss(b + 1) && is(b) < is(b + 1)))) {
                  val ts = ss(b); ss(b) = ss(b + 1); ss(b + 1) = ts
                  val ti = is(b); is(b) = is(b + 1); is(b + 1) = ti
                  b += 1
                }
              }
            }
            i += 1
          }
        }
        q.indices.iterator.flatMap { i =>
          val (qid, _) = q(i)
          sims(i).indices.collect {
            case j if sims(i)(j) != Double.NegativeInfinity =>
              (qid, ids(i)(j), sims(i)(j))
          }
        }
      }
      .toDF("query_id", "neighbor_id", "__sim")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("neighbor_id"))
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        floor(col("__sim") * 1e6).cast("long").as("sim_ppm"),
        col("__rn").cast("int").as("rank"))
  }

  /** Exact top-k by L2² distance, one partition-local pass — the L2
    * sibling of [[bruteTopKPartitioned]] (cosine), and the truth oracle
    * the ANN recall harness runs: IVF-PQ/ADC approximates L2, so its
    * ground truth must be L2 too. Same structure: bounded per-query
    * smallest-k heaps over a tight JVM loop (the exact
    * [[graft.functions.L2SqExpr]] fold — sequential double accumulation
    * over float→double widened components, so distances are bit-identical
    * to the declarative window form and the DuckDB mirror), ≤ queries×k
    * rows emitted per partition, a tiny global window merges partition
    * winners. Measured at 2M vectors × 100 queries: 15 s vs 153 s for
    * the declarative join+window form — pair materialization is the
    * cost, not the arithmetic. Ties to the smallest neighbor id. */
  def bruteTopKPartitionedL2(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = queries.select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val cand = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val nq = q.length
        val ds  = Array.fill(nq)(Array.fill(k)(Double.PositiveInfinity))
        val ids = Array.fill(nq)(Array.fill(k)(Long.MaxValue))
        while (it.hasNext) {
          val (id, v) = it.next()
          var i = 0
          while (i < nq) {
            val (qid, qv) = q(i)
            if (id != qid) {
              var d = 0.0
              var j = 0
              while (j < qv.length) {
                val t = qv(j).toDouble - v(j).toDouble
                d += t * t
                j += 1
              }
              val dd = ds(i); val is = ids(i)
              // replace the worst (index 0) if better under (d asc, id)
              if (d < dd(0) || (d == dd(0) && id < is(0))) {
                dd(0) = d; is(0) = id
                var b = 0
                while (b + 1 < k &&
                    (dd(b) < dd(b + 1) ||
                      (dd(b) == dd(b + 1) && is(b) < is(b + 1)))) {
                  val ts = dd(b); dd(b) = dd(b + 1); dd(b + 1) = ts
                  val ti = is(b); is(b) = is(b + 1); is(b + 1) = ti
                  b += 1
                }
              }
            }
            i += 1
          }
        }
        q.indices.iterator.flatMap { i =>
          val (qid, _) = q(i)
          ds(i).indices.collect {
            case j if ds(i)(j) != Double.PositiveInfinity =>
              (qid, ids(i)(j), ds(i)(j))
          }
        }
      }
      .toDF("query_id", "neighbor_id", "__d")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__d"), col("neighbor_id"))
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        floor(col("__d") * 1e6).cast("long").as("dist_ppm"),
        col("__rn").cast("int").as("rank"))
  }

  /** Random-hyperplane LSH bucketing: `planes` sign bits of dot products
    * with deterministic pseudo-random hyperplanes (seeded arithmetic, no
    * RNG state — replayable across runs and engines). Vectors whose sign
    * patterns match land in the same bucket; cosine-similar vectors
    * collide with high probability. Combine with [[nnWithinBucket]] for
    * the ANN scale path: N² search becomes Σ bucket².
    *
    * Hot path: the fused native [[graft.functions.SignBucketExpr]] — one
    * codegen'd loop regardless of plane count (the Column-tree form below
    * grows planes×dim nodes and falls out of codegen past ~16 planes).
    *
    * Plane p, dim i weight: frac((p·1315423911 + i·2654435761) mod 1000003
    * / 1000003) − 0.5. */
  def signBucket(vec: Column, dim: Int, planes: Int): Column =
    graft.functions.SignBucketExpr(vec, planes)

  /** Column-tree formulation of [[signBucket]] — kept as the spec oracle
    * for the native expression (bit-identical; see DedupKnnSpec). */
  def signBucketHof(vec: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dotp = (0 until dim).map { i =>
        val w = graft.functions.SignBucketExpr.weight(p, i)
        element_at(vec, i + 1).cast("double") * lit(w)
      }.reduce(_ + _)
      when(dotp >= 0, lit(1L) * (1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Plane count for a target mean bucket width: planes ≈ log₂(n/target),
    * clamped to [4, 24]. Buckets must multiply with corpus size or
    * Σ bucket² degenerates toward N² (fixed 64 buckets at 1B vectors ≈
    * N²/64); deriving from n keeps expected bucket width constant as the
    * corpus grows. */
  def planesFor(n: Long, targetBucket: Int = 8): Int = {
    require(n > 0 && targetBucket > 0)
    // integer form of ceil(log2(n/target)) — the smallest p with
    // 2^p·target ≥ n. Pure integer arithmetic (no float log whose last-ulp
    // rounding could flip a power-of-two boundary), so the DuckDB oracles
    // derive the SAME count from count(*) and stay hash-exact at any
    // corpus size.
    var p = 0
    while (p < 24 && (1L << p) * targetBucket < n) p += 1
    math.max(4, p)
  }

  /** Per-plane signed margins of `vec` against the [[signBucket]]
    * hyperplane family: margins[p] = Σ_i v[i]·w(p,i), the same
    * ascending-dimension fold and the same integer-hash weights as
    * [[graft.functions.SignBucketExpr]] — so `margins[p] >= 0` IS bit p
    * of the bucket, and |margins[p]| is how confidently the vector sits
    * on its side of plane p. The multi-probe sequence ranks these. */
  def planeMargins(vec: Column, planes: Int): Column =
    transform(sequence(lit(0), lit(planes - 1)), p =>
      aggregate(sequence(lit(0), size(vec) - 1), lit(0.0), (acc, i) =>
        acc + element_at(vec, i + 1).cast("double") *
          (((p.cast("long") * lit(1315423911L) +
             i.cast("long") * lit(2654435761L)) % lit(1000003L))
            .cast("double") / lit(1000003.0) - lit(0.5))))

  /** Multi-probe sign-LSH top-k search (Lv, Josephson, Wang, Charikar &
    * Li, "Multi-Probe LSH", VLDB 2007, applied to the hyperplane family):
    * each query probes its OWN bucket plus the buckets reached by its
    * best PERTURBATION SETS — non-empty subsets of its 4 least-confident
    * planes (smallest |margin|), ranked by the summed |margin| of the
    * flipped set (ties to the smaller subset mask) — because a true
    * neighbor that missed the query's bucket differs exactly in
    * low-margin sign bits, usually several at once; subset probing
    * recovers the recall that would otherwise need many independent
    * hash tables (the (k,L) memory multiplier).
    *
    * Deterministic end to end (integer-hash planes, sequential double
    * folds, integer tie-breaks), hence fully oracle-able.
    *
    * Plan shape at 100 TB: the corpus never shuffles — one narrow pass
    * computes (id, bucket) per corpus vector; the query side explodes to
    * queries×probes TINY key rows, broadcast to the corpus key table;
    * only candidate ids re-join the vector source for exact-cosine
    * verification and the per-query top-k window. A corpus vector sits
    * in exactly one bucket and the probe keys are distinct (distinct
    * subsets flip distinct masks), so no candidate dedup is needed.
    * Probe count trades recall for candidate work linearly; plane count
    * still derives from corpus size ([[planesFor]]). */
  def multiProbeSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, probes: Int,
      planesOverride: Int = 0): DataFrame = {
    val perturbPlanes = 4 // planesFor clamps planes >= 4, so always legal
    require(probes >= 1 && probes <= (1 << perturbPlanes),
      s"probes must be in [1, ${1 << perturbPlanes}], got $probes")
    // an empty corpus answers every query with zero neighbors — don't
    // let the plane derivation throw on n = 0 (the bestBandBits lesson)
    val n = if (planesOverride > 0) 1L else corpus.count()
    if (n == 0)
      return corpus.sparkSession.range(0).select(
        col("id").as("query_id"), col("id").as("neighbor_id"),
        col("id").as("sim_ppm"), col("id").cast("int").as("rank"))
    val planes =
      if (planesOverride > 0) planesOverride else planesFor(n)
    require(planes >= perturbPlanes,
      s"planes $planes below the $perturbPlanes-plane perturbation window")
    val pow2 = array((0 until planes).map(i => lit(1L << i)): _*)
    val pow2i = array((0 until perturbPlanes).map(i => lit(1 << i)): _*)

    val corpusKeys = corpus.select(col(idCol).cast("long").as("__cid"),
      graft.functions.SignBucketExpr(col(vecCol), planes).as("__cbk"))
    val probeKeys = multiProbeKeys(queries, idCol, vecCol, planes, probes)

    val cand = broadcast(probeKeys)
      .join(corpusKeys, col("__pk") === col("__cbk") &&
        col("__qid") =!= col("__cid"))
      .select(col("__qid"), col("__cid"))
    multiProbeRerank(cand, corpus, queries, idCol, vecCol, k)
  }

  /** The multi-probe PROBE-KEY table: (`__qid`, `__pk`) — one row per
    * (query, probe bucket). Shared by [[multiProbeSearch]] and the
    * persisted sign-LSH index ([[VectorIndex.searchSignLsh]]). */
  private[operators] def multiProbeKeys(queries: DataFrame, idCol: String,
      vecCol: String, planes: Int, probes: Int): DataFrame = {
    val perturbPlanes = 4
    // validate HERE, not just in multiProbeSearch: the persisted-index
    // path (VectorIndex.searchSignLsh) enters through this function, and
    // the slice below would otherwise silently cap probes > 16 —
    // returning fewer probes than requested instead of erring
    require(probes >= 1 && probes <= (1 << perturbPlanes),
      s"probes must be in [1, ${1 << perturbPlanes}], got $probes")
    val pow2 = array((0 until planes).map(i => lit(1L << i)): _*)
    val pow2i = array((0 until perturbPlanes).map(i => lit(1 << i)): _*)
    queries
      .select(col(idCol).cast("long").as("__qid"),
        planeMargins(col(vecCol), planes).as("__m"),
        graft.functions.SignBucketExpr(col(vecCol), planes).as("__qbk"))
      // the 4 least-confident planes, (|margin| asc, plane asc)
      .withColumn("__low",
        slice(array_sort(zip_with(col("__m"),
          sequence(lit(0), lit(planes - 1)),
          (m, p) => struct(abs(m).as("a"), p.as("p")))), 1, perturbPlanes))
      // every non-empty subset of them as (score = Σ flipped |margin|,
      // mask, flip-key), ranked (score asc, mask asc)
      .withColumn("__sets",
        array_sort(transform(sequence(lit(1), lit((1 << perturbPlanes) - 1)),
          mm => struct(
            aggregate(sequence(lit(0), lit(perturbPlanes - 1)), lit(0.0),
              (acc, j) => acc + when(
                mm.bitwiseAND(element_at(pow2i, j + 1)) =!= 0,
                element_at(col("__low"), j + 1).getField("a"))
                .otherwise(lit(0.0))).as("s"),
            mm.as("m"),
            aggregate(sequence(lit(0), lit(perturbPlanes - 1)), lit(0L),
              (acc, j) => acc + when(
                mm.bitwiseAND(element_at(pow2i, j + 1)) =!= 0,
                element_at(pow2,
                  element_at(col("__low"), j + 1).getField("p") + 1))
                .otherwise(lit(0L))).as("f")))))
      .select(col("__qid"),
        explode(concat(array(col("__qbk")),
          transform(slice(col("__sets"), 1, probes - 1), s =>
            col("__qbk").bitwiseXOR(s.getField("f"))))).as("__pk"))
  }

  /** Exact-cosine verification + per-query top-k over a candidate table
    * (`__qid`, `__cid`) — the multi-probe tail, shared with the
    * persisted index path. */
  private[operators] def multiProbeRerank(cand: DataFrame,
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    // query vectors come from the QUERIES frame (not necessarily a
    // corpus subset), corpus vectors load for candidates only
    val scored = cand
      .join(broadcast(queries.select(col(idCol).cast("long").as("__qid"),
        col(vecCol).as("__qv"))), "__qid")
      .join(corpus.select(col(idCol).cast("long").as("__cid"),
        col(vecCol).as("__cv")), "__cid")
      .withColumn("__sim", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("__sim").desc, col("__cid"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("__qid").as("query_id"), col("__cid").as("neighbor_id"),
        floor(col("__sim") * 1e6).cast("long").as("sim_ppm"),
        col("__rn").cast("int").as("rank"))
  }

  /** Embedding near-duplicate pairs via multi-table (k,L) sign-LSH — the
    * scale-safe replacement for the brute `id_a < id_b` theta join.
    *
    * L independent hash tables of k planes each (plane indices
    * [t·k, t·k+k), one weight family, no overlap): a pair is a candidate
    * if it shares a bucket in ANY table, so recall is 1−(1−p^k)^L where
    * p = 1−θ/π (the single-plane collision probability). k=3, L=8 gives
    * ~0.9 recall at cosine 0.45 where one k=6 table gives ~0.08.
    *
    * Plan shape at 100 TB: one narrow pass computes L bucket keys per
    * vector; the shuffle moves L×N TINY rows (id + table + key) — never
    * the vectors; candidates are distinct pairs from the per-table
    * equi-join; only candidates re-join the vector table for exact cosine
    * verification. Work = L·Σ bucket² with bucket ≈ N/2^k, so k grows
    * with log₂ N (cf. [[planesFor]]) and L stays fixed.
    */
  def neardupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      minSimPpm: Long,
      k: Int = 3,
      tables: Int = 8): DataFrame = {
    val e = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val buckets = e.select(col("__id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"),
            graft.functions.SignBucketExpr(col("__v"), k, t * k).as("bk"))): _*))
          .as("__tb"))
      .select(col("__id"), col("__tb.t").as("__t"), col("__tb.bk").as("__bk"))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.__t") === col("b.__t") && col("a.__bk") === col("b.__bk") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    cand
      .join(e.select(col("__id").as("id_a"), col("__v").as("__va")), "id_a")
      .join(e.select(col("__id").as("id_b"), col("__v").as("__vb")), "id_b")
      .withColumn("sim_ppm",
        floor(cosine(col("__va"), col("__vb")) * 1e6).cast("long"))
      .filter(col("sim_ppm") >= minSimPpm)
      .select(col("id_a"), col("id_b"), col("sim_ppm"))
  }

  /** Full IVF search: train per-list centroids (the coarse quantizer),
    * probe the `nProbe` nearest lists per query, then exact cosine top-k
    * within the probed lists only — the classic inverted-file ANN pipeline
    * (cf. the reference's sklearn-side modeling in
    * database_and_model_tools.py; search itself is beyond the reference).
    *
    * Centroids are exact portable means: per-(list, pos) sums of
    * floor(v·1e6) longs, so the quantizer is bit-identical across engines
    * and runs (no float accumulation order dependence) — which is what
    * lets the whole approximate search be oracle-checked.
    *
    * Plan shape at 100 TB: the corpus NEVER shuffles — centroids
    * (lists × dim, tiny) broadcast for probing, and the probed query set
    * (assumed small/broadcastable, same contract as [[bruteTopK]])
    * broadcasts into the corpus scan, so candidate generation is one
    * narrow pass; only candidate rows (|queries| · nProbe · mean list
    * width) reach the per-query top-k shuffle. Work scales as
    * nProbe/|lists| of brute force.
    */
  def ivfSearch(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      listCol: String,
      k: Int,
      nProbe: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__v"),
      col(listCol).as("__list"))
    val cents = c
      .select(col("__list"), posexplode(col("__v")).as(Seq("__pos", "__x")))
      .groupBy(col("__list"), col("__pos"))
      .agg(sum(floor(col("__x") * 1e6).cast("long")).as("__sv"),
        count(lit(1)).as("__n"))
      .groupBy(col("__list"))
      .agg(transform(array_sort(collect_list(struct(col("__pos"),
          (col("__sv").cast("double") / col("__n") / 1e6).as("c")))),
        x => x("c")).as("__cent"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("__csim").desc, col("__list"))
    val probed = q.crossJoin(broadcast(cents))
      .withColumn("__csim", cosine(col("__qv"), col("__cent")))
      .withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("__qv"), col("__list"))
    val scored = c.join(broadcast(probed), Seq("__list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__sim", cosine(col("__qv"), col("__v")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("neighbor_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        floor(col("__sim") * 1e6).cast("long").as("sim_ppm"),
        col("__rn").cast("int").as("rank"))
  }

  /** Top-1 neighbor per row, searched only within `bucketCol` (IVF path).
    *
    * @param maxBucket optional width cap: buckets wider than this are
    *   re-split by a deterministic secondary hash into ⌈n/maxBucket⌉
    *   sub-buckets, bounding per-bucket work at maxBucket² and total work
    *   at N·maxBucket — the guard against skewed/degenerate bucketings
    *   (e.g. near-duplicate floods). Recall inside an oversized bucket
    *   drops (neighbors may land in sibling sub-buckets), which is the
    *   standard ANN trade; leave at MaxValue for exact within-bucket
    *   semantics (the oracle-checked configuration). */
  def nnWithinBucket(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      bucketCol: String,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val t0 = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      col(bucketCol).as("__bk"))
    val t =
      if (maxBucket == Int.MaxValue) t0.withColumn("__sub", lit(0L))
      else {
        // bucket-size table is tiny (one row per bucket); the join back is
        // a shuffle of (id, vec) rows on __bk — same key the NN join uses
        val sizes = t0.groupBy(col("__bk")).agg(count(lit(1)).as("__bn"))
        t0.join(sizes, "__bk")
          .withColumn("__sub",
            pmod(xxhash64(col("__id")), ceil(col("__bn") / maxBucket).cast("long")))
          .select(col("__id"), col("__v"), col("__bk"), col("__sub"))
      }
    val pairs = t.as("a").join(t.as("b"),
        col("a.__bk") === col("b.__bk") && col("a.__sub") === col("b.__sub") &&
          col("a.__id") =!= col("b.__id"))
      .select(col("a.__id").as("vec_id"), col("a.__bk").as("bucket"),
        col("b.__id").as("__nid"),
        cosine(col("a.__v"), col("b.__v")).as("__sim"))
    // top-1 by (sim desc, neighbor id asc) as a single-pass hash aggregate
    pairs
      .groupBy(col("vec_id"), col("bucket"))
      .agg(max_by(struct(col("__nid"), floor(col("__sim") * 1e6).cast("long").as("__sp")),
        struct(col("__sim"), negate(col("__nid")))).as("__r"))
      .select(col("vec_id"), col("bucket"),
        col("__r.__nid").as("nn_id"), col("__r.__sp").as("nn_sim_ppm"))
  }

  /** Late-interaction retrieval (ColBERT MaxSim, Khattab & Zaharia
    * SIGIR'20): documents and queries are SETS of vectors, and
    * score(q, d) = Σ over query tokens of the max cosine against any of
    * the doc's vectors — token-level matching that single-vector
    * retrieval collapses away. This is the exact (PLAID-less) form: one
    * narrow pass over the doc vectors with the query set broadcast
    * (corpus never shuffles; cosines via the codegen'd
    * [[graft.functions.CosineSimExpr]], floored to ppm BEFORE the max so
    * cross-engine exactness survives the aggregation), a map-side-
    * combinable max per (query token, doc), a sum per (query, doc), and
    * the bounded-buffer [[TopK.perGroup]] — never a corpus-wide window.
    * Scale: cost is |doc vectors| × |query tokens| cosine evaluations —
    * the brute-force baseline; the candidate path at 100 TB composes the
    * binary-coarse stage per query token and reranks the candidate-doc
    * union through this same scorer. Returns (query_id, doc_id,
    * score_ppm, rank ≤ k), ties toward the smaller doc id. */
  def maxSimTopK(docVecs: DataFrame, docIdCol: String, vecCol: String,
      queryVecs: DataFrame, queryIdCol: String, qtokCol: String,
      qvecCol: String, k: Int): DataFrame = {
    val q = broadcast(queryVecs.select(
      col(queryIdCol).cast("long").as("query_id"),
      col(qtokCol).cast("long").as("__qt"), col(qvecCol).as("__qv")))
    val scored = docVecs
      .select(col(docIdCol).cast("long").as("doc_id"), col(vecCol).as("__dv"))
      .crossJoin(q)
      .withColumn("__sim",
        floor(graft.functions.CosineSimExpr(col("__dv"), col("__qv")) * 1e6)
          .cast("long"))
      .groupBy(col("query_id"), col("__qt"), col("doc_id"))
      .agg(max(col("__sim")).as("__mx"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__mx")).as("score_ppm"))
    TopK.perGroup(scored, Seq("query_id"), "score_ppm", "doc_id", k)
      .select(col("query_id"), col("id").as("doc_id"),
        col("value").cast("long").as("score_ppm"), col("rank"))
  }

  /** [[maxSimTopK]]'s 100 TB serving shape — the PLAID-style two-stage:
    * per QUERY TOKEN, binary-code candidates come from the one-pass
    * popcount coarse stage ([[BinaryQuant.coarseHammingTopR]], 8 B/vec
    * codes, bounded per-token heaps, no pair materialization); the
    * candidate DOC union per query then reranks through the exact
    * MaxSim scorer — so the full-precision pass touches only
    * ≤ |tokens|·r candidate docs' vectors instead of the corpus.
    * Approximate by construction (coarse misses trade recall — measured
    * in the spec and `Stress maxsimcoarse`, the multiprobe discipline);
    * the rerank arithmetic is the oracle-gated [[maxSimTopK]] verbatim,
    * so candidates are the ONLY approximation. `docVecs` needs a unique
    * per-VECTOR id (`vecIdCol`) for deterministic coarse tie-breaks
    * alongside the doc grouping id; `qtokCol` needs uniqueness only
    * WITHIN a query (per-query token positions are fine — probes key by
    * array position, and every query-side join carries `query_id`). */
  def maxSimTopKCoarse(docVecs: DataFrame, vecIdCol: String,
      docIdCol: String, vecCol: String, queryVecs: DataFrame,
      queryIdCol: String, qtokCol: String, qvecCol: String, k: Int,
      rPerToken: Int, thresholds: Option[DataFrame] = None,
      projCols: Option[(String, String)] = None,
      codes: Option[DataFrame] = None): DataFrame = {
    // `codes`: a STANDING (vec id, doc id, code) table — what a
    // persisted binary index serves — so a probe pays only the popcount
    // scan + rerank, never the corpus coding pass (which is build-time,
    // like every quantizer here). Requires the thresholds that built it
    // (query tokens must code under the same geometry).
    require(codes.isEmpty || thresholds.isDefined,
      "a standing code table needs the thresholds that built it")
    // `projCols` (docProj, queryProj): code a ≤64-dim PROJECTION (a JL /
    // RandomProjection column the caller prepared) while the rerank uses
    // the full vectors — the production recipe at 768–4096 dims, where
    // binary codes must stay 64-bit but the exact pass is where the
    // dimensionality cost lives. Default: code vecCol itself (≤ 64 d).
    val (dProj, qProj) = projCols.getOrElse((vecCol, qvecCol))
    // serving fits the quantizer ONCE and passes it in (the corpus-wide
    // per-dim order statistic is a build-time cost, the never-refit
    // contract every persisted binary index here already keeps); the
    // inline fit is the self-contained convenience path
    val thr = thresholds.getOrElse(
      BinaryQuant.fitThresholds(docVecs, dProj).localCheckpoint(true))
    // materialize the NARROW code table once (24 B/vector): the coarse
    // scan and the vec→doc candidate mapping both consume it, and
    // without the cut each re-runs the corpus-wide coding pass — this is
    // the in-memory analog of the persisted code table a standing index
    // (VectorIndex) keeps on disk; callers with one pass it via `codes`
    val coded = codes.map(_.select(
        col(vecIdCol).cast("long").as("__vid"),
        col(docIdCol).cast("long").as("doc_id"), col("code")))
      .getOrElse(BinaryQuant.withCode(
          docVecs.select(col(vecIdCol).cast("long").as("__vid"),
            col(docIdCol).cast("long").as("doc_id"), col(dProj).as("__p")),
          "__p", thr)
        .select(col("__vid"), col("doc_id"), col("code"))
        .localCheckpoint(true))
    val qCoded0 = BinaryQuant.withCode(
      queryVecs.select(col(queryIdCol).cast("long").as("query_id"),
        col(qtokCol).cast("long").as("__qt"), col(qProj).as("__qp")),
      "__qp", thr)
    // full vectors rejoin on (query_id, __qt) — token ids only need to
    // be unique WITHIN a query (the maxSimTopK contract), never across
    // queries: a per-query token position 0..n is a legal qtokCol
    val qCoded = qCoded0.join(
      queryVecs.select(col(queryIdCol).cast("long").as("query_id"),
        col(qtokCol).cast("long").as("__qt"), col(qvecCol).as("__qv")),
      Seq("query_id", "__qt"))
    // the coarse stage keys each probe by its POSITION in the collected
    // probe array (globally unique by construction), then maps survivors
    // back to (query_id) — duplicate token ids across queries can never
    // cross-wire candidates or vectors between queries
    val qRows = qCoded.select(col("query_id"), col("__qt"), col("code"))
      .collect()
    val qArr = qRows.zipWithIndex
      .map { case (r, i) => (i.toLong, r.getLong(2)) }
    val sparkQ = docVecs.sparkSession
    import sparkQ.implicits._
    val probeOwner = broadcast(qRows.zipWithIndex
      .map { case (r, i) => (i.toLong, r.getLong(0)) }.toSeq
      .toDF("__probe", "query_id"))
    // per-token coarse candidates over VECTORS, folded to candidate DOCS
    // per query (tokens belong to queries; the union is the rerank set)
    // the candidate set is ≤ tokens·r rows but sits behind a
    // mapPartitions (no size statistics) — broadcast it EXPLICITLY, or
    // the vec→doc mapping join and the rerank join both shuffle the
    // corpus (measured: the wide-vector shuffle tripled the whole search)
    val cand = broadcast(BinaryQuant
      .coarseHammingTopR(coded, "__vid", qArr, rPerToken)
      .withColumnRenamed("query_id", "__probe")
      .join(probeOwner, Seq("__probe"))
      .select(col("query_id"), col("neighbor_id")))
    val candDocs = broadcast(
      coded.select(col("__vid").as("neighbor_id"), col("doc_id"))
        .join(cand, Seq("neighbor_id"))
        .select(col("query_id"), col("doc_id")).distinct())
    // exact MaxSim over the candidate docs only — the scorer verbatim
    val scored = candDocs
      .join(docVecs.select(col(docIdCol).cast("long").as("doc_id"),
        col(vecCol).as("__dv")), Seq("doc_id"))
      .join(broadcast(qCoded.select(col("query_id"), col("__qt"),
        col("__qv"))), Seq("query_id"))
      .withColumn("__sim",
        floor(graft.functions.CosineSimExpr(col("__dv"), col("__qv")) * 1e6)
          .cast("long"))
      .groupBy(col("query_id"), col("__qt"), col("doc_id"))
      .agg(max(col("__sim")).as("__mx"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__mx")).as("score_ppm"))
    TopK.perGroup(scored, Seq("query_id"), "score_ppm", "doc_id", k)
      .select(col("query_id"), col("id").as("doc_id"),
        col("value").cast("long").as("score_ppm"), col("rank"))
  }
}
