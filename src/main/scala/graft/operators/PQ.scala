package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization: d-dim float vectors become `subspaces` small
  * integer codes (nearest sub-codeword per contiguous slice), and search
  * runs against a per-query lookup table over the CODES (asymmetric
  * distance computation) instead of the raw vectors — the billion-scale
  * ANN compression pattern (codes are ~32× smaller than the floats, so
  * the search scan is memory-bound on a fraction of the data).
  *
  * Sub-codebooks are exact integer-sum per-(label, subspace) means — the
  * same engine-portable quantizer the IVF path trains — so encode and
  * search are deterministic across engines, partitionings and reruns,
  * which is what lets both be oracle-checked bit-for-bit. A production
  * deployment would swap the label-mean codebook for per-subspace
  * k-means; every plan shape below is unchanged by that swap.
  *
  * Scale shape: codebook = one hash aggregate to labels×dim rows
  * (broadcast thereafter); encoding = broadcast join + one min_by
  * aggregate per (vector, subspace) — the corpus never shuffles its
  * vectors; ADC search scans only the codes against a broadcast
  * |queries|·subspaces·|labels| lookup of longs. All distance sums are
  * exact long ppm (floored per subspace before summing), so no
  * double-sum ordering leaks into results.
  */
object PQ {

  /** Hot-path squared L2: fused native codegen expression, bit-identical
    * to [[l2sqHof]] (same sequential fold order; see L2SqExpr). */
  def l2sq(a: Column, b: Column): Column = graft.functions.L2SqExpr(a, b)

  /** Interpreted-HOF formulation — kept as the spec oracle for [[l2sq]]. */
  def l2sqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, v) => acc + v)

  /** (c_label, s, cw) sub-codebooks: per-label mean of each subDim slice,
    * as an exact integer-sum mean (floor(v·1e6) longs). */
  def codebook(corpus: DataFrame, labelCol: String, vecCol: String,
      subspaces: Int, subDim: Int): DataFrame = corpus
    .select(col(labelCol).as("c_label"), posexplode(col(vecCol)).as(Seq("pos", "v")))
    .groupBy(col("c_label"), col("pos"))
    .agg(sum(floor(col("v") * 1e6).cast("long")).as("__sv"), count(lit(1)).as("__n"))
    .withColumn("__c", col("__sv").cast("double") / col("__n") / 1e6)
    .withColumn("s", expr(s"pos div $subDim"))
    .groupBy(col("c_label"), col("s"))
    .agg(transform(array_sort(collect_list(struct(col("pos"), col("__c")))),
      x => x("__c")).as("cw"))

  /** Per-subspace k-means sub-codebooks — the production PQ quantizer
    * (the label-mean [[codebook]] is the oracle-portable stand-in; its
    * |labels| codewords per subspace give real compression but coarse
    * ADC granularity: at scale, whole lists share one code and ranking
    * within them degenerates — measured in Stress mode "recall").
    * Deterministic end to end, so results are engine/partitioning/rerun
    * stable: init picks the k hash-ranked subvectors per subspace via
    * pure modular arithmetic (no RNG; `pmod` guards keep every product
    * far from Long overflow under ANSI mode), each Lloyd round assigns
    * to the nearest codeword (exact L2², ties to the smallest index) and
    * recomputes exact integer-sum ppm means. Empty clusters drop out
    * (codebook may shrink below k — standard Lloyd behavior).
    *
    * Output schema is [[codebook]]'s `(c_label, s, cw)`, so [[encode]],
    * [[adcSearch]] and [[ivfPqProbeSearch]] consume it unchanged — the
    * quantizer swap the Scaladoc above promises, with zero plan changes.
    *
    * Scale shape per round: one broadcast of k·subspaces·subDim doubles
    * against the subvector stream + one min_by aggregate (map-side
    * combinable) + one ppm-mean aggregate to k·subspaces·subDim rows —
    * the corpus never shuffles its vectors, rounds are O(iters) scans. */
  def kmeansCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      subspaces: Int, subDim: Int, k: Int, iters: Int): DataFrame = {
    // The Lloyd loop re-scans the subvectors iters+1 times (init ranking
    // + one assignment pass per round), each as its own job — materialize
    // ONCE instead of re-deriving the slice lineage per job (measured 3×
    // end-to-end on a 20k-vector fit). This is the standard "cache the
    // training set" shape: at 100 TB a k-means fit runs on a bounded
    // deterministic sample (faiss trains codebooks on ≤ millions of
    // vectors), so the materialized frame is capped by design.
    val subs = subvectors(corpus, idCol, vecCol, subspaces, subDim)
      .localCheckpoint(true)
    val wInit = Window.partitionBy(col("s")).orderBy(
      pmod(pmod(col("vec_id"), lit(999983L)) * 2654435761L +
        col("s") * 40503L, lit(1000003L)),
      col("vec_id"))
    var cb = subs
      .withColumn("__r", row_number().over(wInit))
      .filter(col("__r") <= k)
      .select(col("s"), (col("__r") - 1).cast("long").as("c_label"),
        transform(col("sub"), x => x.cast("double")).as("cw"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      // argmin as min(struct(d2, cid, sub)): a DeclarativeAggregate that
      // stays inside whole-stage codegen — min_by's typed-imperative
      // buffer measured 2.4× slower on the same input. (d2, c_label) is
      // unique per codeword, so the carried sub array never reaches the
      // struct comparison and the result is identical to min_by's.
      val assigned = subs.join(broadcast(cb), Seq("s"))
        .withColumn("__d2", l2sq(col("sub"), col("cw")))
        .groupBy(col("vec_id"), col("s"))
        .agg(min(struct(col("__d2"), col("c_label"), col("sub"))).as("__a"))
        .select(col("s"), col("__a.c_label").as("c_label"),
          col("__a.sub").as("sub"))
      cb = assigned
        .select(col("s"), col("c_label"),
          posexplode(col("sub")).as(Seq("pos", "v")))
        .groupBy(col("s"), col("c_label"), col("pos"))
        .agg(sum(floor(col("v") * 1e6).cast("long")).as("__sv"),
          count(lit(1)).as("__n"))
        .groupBy(col("s"), col("c_label"))
        .agg(transform(array_sort(collect_list(struct(col("pos"),
            (col("__sv").cast("double") / col("__n") / 1e6).as("c")))),
          x => x("c")).as("cw"))
        .localCheckpoint(true)
    }
    subs.unpersist()
    cb
  }

  /** (vec_id, s, sub): the contiguous subDim-wide slices of every vector. */
  def subvectors(corpus: DataFrame, idCol: String, vecCol: String,
      subspaces: Int, subDim: Int): DataFrame = corpus
    .select(col(idCol).as("vec_id"), posexplode(
      array((0 until subspaces).map(s =>
        slice(col(vecCol), s * subDim + 1, subDim)): _*))
      .as(Seq("s", "sub")))

  /** (vec_id, s, code, err_ppm): nearest sub-codeword per subspace, ties
    * to the smallest label; err_ppm = floor(L2²·1e6) to that codeword.
    * Pass `cb` (from [[codebook]]) when the caller also needs the codebook
    * elsewhere — one training aggregate instead of two. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, subspaces: Int, subDim: Int,
      cb: Option[DataFrame] = None): DataFrame =
    subvectors(corpus, idCol, vecCol, subspaces, subDim)
      .join(broadcast(cb.getOrElse(
        codebook(corpus, labelCol, vecCol, subspaces, subDim))), Seq("s"))
      .withColumn("__d2", l2sq(col("sub"), col("cw")))
      .groupBy(col("vec_id"), col("s"))
      // argmin as min(struct): declarative, stays in whole-stage codegen
      // (min_by is a typed-imperative buffer — measured 2.4× slower on
      // the k-means assignment, same shape). Ordering (d2, c_label) is
      // exactly min_by's tie rule; __dp rides along and is never compared
      // because (d2, c_label) is unique per codeword.
      .agg(min(struct(col("__d2"), col("c_label"),
        floor(col("__d2") * 1e6).cast("long").as("__dp"))).as("__r"))
      .select(col("vec_id"), col("s"),
        col("__r.c_label").as("code"), col("__r.__dp").as("err_ppm"))

  /** Top-k ADC search: (query_id, neighbor_id, adist_ppm, rank), rank 1 =
    * smallest approximate distance, ties to the smallest neighbor id.
    * `queries` must be small/broadcastable (same contract as
    * [[Knn.bruteTopK]]); pass precomputed `codes` (from [[encode]]) to
    * amortize encoding across query batches. */
  def adcSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int,
      subspaces: Int, subDim: Int,
      codes: Option[DataFrame] = None): DataFrame = {
    // the codebook (labels×subspaces rows, metadata-sized) feeds BOTH the
    // query LUT and corpus encoding — materialize it once instead of
    // re-running the corpus-wide training aggregate per consumer (the
    // same cut ivfPqTrain applies to its quantizer artifacts)
    val cb = codebook(corpus, labelCol, vecCol, subspaces, subDim)
      .localCheckpoint(true)
    val lut = subvectors(queries, idCol, vecCol, subspaces, subDim)
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("s"), col("c_label"),
        floor(l2sq(col("sub"), col("cw")) * 1e6).cast("long").as("qd_ppm"))
    val enc = codes.getOrElse(
      encode(corpus, idCol, vecCol, labelCol, subspaces, subDim, Some(cb)))
    val sums = enc.as("e")
      .join(broadcast(lut).as("l"),
        col("e.s") === col("l.s") && col("e.code") === col("l.c_label"))
      .filter(col("e.vec_id") =!= col("l.query_id"))
      .select(col("l.query_id").as("query_id"),
        col("e.vec_id").as("neighbor_id"), col("l.qd_ppm"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("qd_ppm")).as("adist_ppm"))
    // top-k as a per-query window: with a broadcastable query set the
    // group count is small and the sums table is |queries|·N narrow rows,
    // so the sort is cheap relative to the lookup join above (measured:
    // the TopK bounded-buffer aggregator is ~1.5× SLOWER here — its
    // per-row buffer serialization costs more than sorting 100 groups).
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist_ppm"), col("neighbor_id"))
    sums.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** IVF-PQ: the full billion-scale ANN composition — an inverted-file
    * coarse quantizer (exact per-list centroid means, as [[Knn.ivfSearch]]
    * trains) plus PQ over the RESIDUALS (vector − its list centroid), the
    * FAISS `IVFx,PQy` layout. Search probes the `nProbe` nearest lists per
    * query and runs ADC with a per-(query, list) lookup table — the LUT
    * must be per-list because the query's residual differs per probed
    * list's centroid.
    *
    * Residual sub-codebooks are keyed by home list (one codeword per list
    * per subspace — the same deterministic label-mean quantizer the rest
    * of the family uses, so the whole pipeline stays bit-portable and
    * oracle-checkable; swap in per-subspace k-means at production scale,
    * plan shapes unchanged).
    *
    * Plan shape at 100 TB: centroids and both codebooks are tiny
    * broadcasts; the corpus never shuffles its vectors (residuals and
    * codes are computed in narrow passes); search scans only the CODES of
    * probed lists against a |queries|·nProbe·subspaces·|lists| LUT of
    * longs. Each vector lives in exactly one list, so no candidate is
    * scored twice. */
  def ivfPqSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, listCol: String, k: Int, nProbe: Int,
      subspaces: Int, subDim: Int): DataFrame = {
    val (cents, rcw, codes) =
      ivfPqTrain(corpus, idCol, vecCol, listCol, subspaces, subDim)
    ivfPqProbeSearch(cents, rcw, codes, queries, idCol, vecCol, k, nProbe,
      subspaces, subDim)
  }

  /** The training half of [[ivfPqSearch]]: fits the coarse quantizer and
    * residual sub-codebooks and encodes the corpus. Returns the three
    * index artifacts — `(centroids (__list, __cent), codebooks
    * (c_label, s, cw), codes (vec_id, __list, s, code))` — the frames
    * [[VectorIndex]] persists for the faiss-style save/load/append
    * lifecycle. */
  def ivfPqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      listCol: String, subspaces: Int, subDim: Int,
      residCodebook: Option[DataFrame => DataFrame] = None)
      : (DataFrame, DataFrame, DataFrame) = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__v"),
      col(listCol).as("__list"))
    // coarse quantizer: exact integer-sum per-list means (broadcast).
    // Both quantizer artifacts are MATERIALIZED eagerly (localCheckpoint —
    // they are lists×dim / lists×subspaces rows, metadata-sized): every
    // downstream consumer references them at least twice across separate
    // actions (residuals + probe; encode + LUT; and VectorIndex.buildIvfPq
    // writes three artifacts as three jobs), and without a cut each
    // reference re-runs the corpus-wide training aggregate. The
    // corpus-sized residual frame deliberately stays a recomputable narrow
    // projection — at scale you re-scan, never cache, the big side.
    val cents = c
      .select(col("__list"), posexplode(col("__v")).as(Seq("__pos", "__x")))
      .groupBy(col("__list"), col("__pos"))
      .agg(sum(floor(col("__x") * 1e6).cast("long")).as("__sv"),
        count(lit(1)).as("__n"))
      .groupBy(col("__list"))
      .agg(transform(array_sort(collect_list(struct(col("__pos"),
          (col("__sv").cast("double") / col("__n") / 1e6).as("c")))),
        x => x("c")).as("__cent"))
      .localCheckpoint(true)
    // residuals stay with their row — a narrow broadcast-join projection
    val resid = c.join(broadcast(cents), Seq("__list"))
      .select(col("vec_id"), col("__list"),
        zip_with(col("__v"), col("__cent"),
          (x, y) => x.cast("double") - y).as("__r"))
    // PQ codebook + codes over the residuals; the residual codebook
    // trains ONCE and serves encode + LUT. Default: codewords keyed by
    // home list (the oracle-portable label-mean quantizer); pass
    // `residCodebook` (e.g. `r => kmeansCodebook(r, "vec_id", "__r", …)`)
    // to swap in the production per-subspace k-means fit — downstream
    // encode/probe/ADC consume either unchanged. Home list re-attaches
    // from the plain corpus projection (a narrow scan), not from resid —
    // no point recomputing the residual join just to drop the residuals.
    val rcw = residCodebook.getOrElse((r: DataFrame) =>
        codebook(r, "__list", "__r", subspaces, subDim))
      .apply(resid)
      .localCheckpoint(true)
    val codes = encode(resid, "vec_id", "__r", "__list", subspaces, subDim,
        Some(rcw))
      .join(c.select(col("vec_id"), col("__list")), Seq("vec_id"))
      .select(col("vec_id"), col("__list"), col("s"), col("code"))
    (cents, rcw, codes)
  }

  /** IVF-PQ search with an exact-rerank refine stage (faiss's
    * `IndexRefineFlat`): take the ADC top-`rerankWidth` per query as
    * candidates, load ONLY those candidates' float vectors, re-rank by
    * exact L2² (ties to the smallest id) and keep top-`k`. This is the
    * production serving config — ADC alone cannot resolve distance gaps
    * below its quantization error, which is exactly what dominates once
    * a corpus holds many near-duplicates (measured: recall@10 at 200k
    * vectors jumps from ~0.1 pure-ADC to near the rerank-width ceiling;
    * see SCALE.md "ANN recall").
    *
    * Scale shape: the candidate set is |queries|·rerankWidth rows —
    * broadcast it against the vector source, so the corpus contributes
    * one narrow semi-join scan and only candidates' vectors are ever
    * loaded; the final sort runs over |queries|·rerankWidth rows. */
  def ivfPqSearchRerank(cents: DataFrame, rcw: DataFrame, codes: DataFrame,
      vectors: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, rerankWidth: Int, nProbe: Int,
      subspaces: Int, subDim: Int): DataFrame = {
    val cand = ivfPqProbeSearch(cents, rcw, codes, queries, idCol, vecCol,
        rerankWidth, nProbe, subspaces, subDim)
      .select(col("query_id"), col("neighbor_id"))
    val src = vectors.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__nv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__d"), col("neighbor_id"))
    src.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("__d", l2sq(col("__qv"), col("__nv")))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        floor(col("__d") * 1e6).cast("long").as("dist_ppm"), col("rank"))
  }

  /** Assign vectors to their NEAREST centroid (exact L2², ties to the
    * smallest list id) and compute the residual against it — how new
    * vectors enter a trained IVF index whose quantizer must not move
    * (faiss `add` semantics). Returns (vec_id, __list, __r). */
  def assignNearestList(emb: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame =
    emb.select(col(idCol).as("vec_id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(cents))
      .withColumn("__d2", l2sq(col("__v"), col("__cent")))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("__list"), col("__cent"), col("__v")),
        struct(col("__d2"), col("__list"))).as("__a"))
      .select(col("vec_id"), col("__a.__list").as("__list"),
        zip_with(col("__a.__v"), col("__a.__cent"),
          (x, y) => x.cast("double") - y).as("__r"))

  /** The search half of [[ivfPqSearch]], over pre-built (or loaded)
    * artifacts: probe the `nProbe` nearest centroids per query, build the
    * per-(query, probed list) residual LUT, scan only the CODES of probed
    * lists. Artifact schemas are [[ivfPqTrain]]'s. */
  def ivfPqProbeSearch(cents: DataFrame, rcw: DataFrame, codes: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int, nProbe: Int,
      subspaces: Int, subDim: Int): DataFrame = {
    // probe: nProbe nearest centroids per query by exact L2², query
    // residual computed against each probed centroid
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("__qd2"), col("__list"))
    val probed = q.crossJoin(broadcast(cents))
      .withColumn("__qd2", l2sq(col("__qv"), col("__cent")))
      .withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("__list"),
        zip_with(col("__qv"), col("__cent"),
          (x, y) => x.cast("double") - y).as("__qr"))
    // per-(query, probed list) LUT of floored subspace distances
    val lut = probed
      .select(col("query_id"), col("__list"), posexplode(
        array((0 until subspaces).map(s =>
          slice(col("__qr"), s * subDim + 1, subDim)): _*)).as(Seq("s", "__qs")))
      .join(broadcast(rcw), Seq("s"))
      .select(col("query_id"), col("__list"), col("s"), col("c_label"),
        floor(l2sq(col("__qs"), col("cw")) * 1e6).cast("long").as("qd_ppm"))
    val sums = codes.as("e")
      .join(broadcast(lut).as("l"),
        col("e.__list") === col("l.__list") && col("e.s") === col("l.s") &&
          col("e.code") === col("l.c_label"))
      .filter(col("e.vec_id") =!= col("l.query_id"))
      .select(col("l.query_id").as("query_id"),
        col("e.vec_id").as("neighbor_id"), col("l.qd_ppm"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("qd_ppm")).as("adist_ppm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist_ppm"), col("neighbor_id"))
    sums.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }
}
