package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Locks in the physical-plan properties the operators are designed
  * around: broadcasts where dimensions are small, no shuffle where the
  * plan shape avoids one, top-k as TakeOrderedAndProject. A regression
  * here is a scale bug even when results stay correct.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def render(p: SparkPlan): String = p.toString

  private def countShuffles(p: SparkPlan): Int = {
    val expanded = p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
    (p +: expanded).map(_.collect { case _: ShuffleExchangeExec => 1 }.sum).max
  }

  test("q_user_recent_n plans as TakeOrderedAndProject (engine-side top-k)") {
    assert(render(plan("q_user_recent_n")).contains("TakeOrderedAndProject"))
  }

  test("star join broadcasts every dimension: no shuffle before the agg") {
    val s = render(plan("q_star_region_revenue"))
    assert("BroadcastHashJoin".r.findAllIn(s).length == 4,
      s"expected 4 broadcast joins:\n$s")
    // exactly 2 shuffles: partial→final agg, and the final orderBy
    assert(countShuffles(plan("q_star_region_revenue")) <= 2, s)
  }

  test("latest-per-key (max_by) is a single-shuffle hash aggregate, no sort") {
    val p = plan("q_latest_per_user_top")
    val s = render(p)
    assert(!s.contains("Window"), s"max_by path must not plan a Window:\n$s")
  }

  test("as-of join is one shuffle over the union, no nested-loop join") {
    val p = plan("q_asof_join")
    val s = render(p)
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"as-of must never plan a loop join:\n$s")
  }

  test("brute KNN broadcasts the query side (corpus never shuffles to join)") {
    val s = render(plan("q_knn_brute"))
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      s"expected a broadcast join:\n$s")
  }

  test("simhash pairs is a banded equi-join: no cross/loop join in the plan") {
    val s = render(plan("q_simhash_pairs"))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"banded simhash must plan an equi-join:\n$s")
  }

  test("phash dedup (two-half Hamming banding) is a banded equi-join") {
    val s = render(plan("q_media_phash_dedup"))
    assert(s.contains("Join"), s"phash dedup must contain the band join:\n$s")
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"banded phash dedup must plan an equi-join:\n$s")
  }

  test("clip dedup (frame-hash banding) and audio dedup are banded equi-joins") {
    // the sub-radius probe expansion must still meet the reference side
    // in an equi-join on (band, key) — never a cross/loop join, at any
    // derived width
    for (q <- Seq("q_media_clip_dedup", "q_media_audio_dedup",
        "q_media_phash_dedup_mih")) {
      val s = render(plan(q))
      assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
        s"$q must plan an equi-join:\n$s")
    }
  }

  test("naive Hamming SQL through the optimizer rule plans a banded equi-join") {
    // the registry entry writes the textbook quadratic self-join; the
    // injected HammingJoinRule must leave NO loop join in the physical
    // plan — this is the rewrite's plan-shape gate at registry level
    val s = render(plan("q_hamming_rewrite"))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"q_hamming_rewrite must be rewritten to an equi-join:\n$s")
  }

  test("multi-probe search (in-memory and index-served) plans no loop join") {
    // probe keys broadcast into a bucket equi-join; candidates re-join
    // vectors by id — a loop node would mean the probe degenerated
    for (q <- Seq("q_nn_multiprobe", "q_signlsh_index")) {
      val s = render(plan(q))
      assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
        s"$q must stay a bucket equi-join:\n$s")
    }
  }

  test("phrase search on the decorated Unicode fixture stays equi-join served") {
    val s = render(plan("q_phrase_unicode"))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"q_phrase_unicode must stay equi-join served:\n$s")
  }

  test("phrase search plans pure equi-joins over posting lists") {
    // the positional chain is (vec_id) equi-joins with position filters;
    // no loop node anywhere. (The BM25 entries are NOT in this lock: the
    // scorer's 1-row corpus-stats crossJoin(broadcast) legitimately
    // plans as a broadcast loop over one row — the metadata-stats
    // pattern used across the repo.)
    val s = render(plan("q_phrase_search"))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"q_phrase_search must stay equi-join served:\n$s")
  }

  test("LSH scale paths (embedding near-dup, profile NN) plan no loop join") {
    for (q <- Seq("q_embedding_neardup_lsh", "q_ts_profile_nn_lsh")) {
      val s = render(plan(q))
      assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
        s"$q must stay an equi-join:\n$s")
    }
  }

  test("brute quadratic baselines never hold a headline bench slot") {
    // q_jaccard_pairs / q_embedding_neardup / q_ts_profile_nn are declared
    // O(N²) oracle/recall baselines for their banded counterparts. They
    // stay in the Verify registry (correctness anchors) but must never be
    // what the bench grades — the benched slot belongs to the scale path.
    for (q <- Seq("q_jaccard_pairs", "q_embedding_neardup", "q_ts_profile_nn")) {
      assert(SparkEntry.queries.contains(q), s"$q must stay oracle-registered")
      assert(!Bench.headline.contains(q),
        s"brute baseline $q must not be a headline bench query")
    }
    // and each baseline's scale-safe counterpart IS registered
    for (q <- Seq("q_minhash_lsh_pairs", "q_embedding_neardup_lsh",
        "q_ts_profile_nn_lsh"))
      assert(SparkEntry.queries.contains(q), s"scale path $q missing")
  }

  test("minhash LSH pairs (both signature paths) plan no loop join") {
    // candidatePairs ends in localCheckpoint, which erases the join from
    // the result's executed plan — assert on the PRE-checkpoint plan the
    // operator exposes for exactly this purpose, with each registry
    // query's own arguments (fused MinHashSigExpr path, then the
    // explode+min() shingleFn path).
    val docs = Tables.documents(spark, sf)
    for ((label, shingleFn) <- Seq(
        ("q_minhash_lsh_pairs", null),
        ("q_minhash_lsh_pairs_fast",
          (c: org.apache.spark.sql.Column) => graft.functions.Text.shingleHashes(c)))) {
      val (pre, sig) = operators.MinHashLSH.candidatePairsPlan(
        docs, "doc_id", "text", k = 64, bands = 16, minEstPpm = 500000L,
        shingleFn = shingleFn)
      val s = render(pre.queryExecution.executedPlan)
      sig.unpersist()
      assert(s.contains("Join"), s"$label pre-checkpoint plan must contain the band join:\n$s")
      assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
        s"$label must stay a banded equi-join:\n$s")
    }
  }

  test("IVF search: probed-list join broadcasts (corpus never shuffles to join)") {
    val s = render(plan("q_ivf_search"))
    // candidate generation must be a broadcast hash join on the list key —
    // the corpus scan feeds it directly; only candidate rows reach the
    // per-query top-k exchange. (The probe step's cross join against the
    // broadcast lists×dim centroid table is the intended BNLJ.)
    assert(s.contains("BroadcastHashJoin"),
      s"probed-list join must broadcast the query side:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("SortMergeJoin"),
      s"corpus must not shuffle into a sort-merge join:\n$s")
  }

  test("PQ encode/search: codebook and lookup table broadcast, no loop join") {
    for (q <- Seq("q_pq_codes", "q_pq_adc")) {
      val s = render(plan(q))
      assert(s.contains("BroadcastHashJoin"),
        s"$q must broadcast the codebook/lut side:\n$s")
      assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
        s"$q must stay an equi-join:\n$s")
    }
  }

  test("IVF-PQ search (in-memory and loaded-index): centroids/codebooks/LUT " +
    "broadcast; codes never shuffle into a sort-merge join") {
    for (q <- Seq("q_ivfpq_search", "q_ivfpq_persist")) {
      val s = render(plan(q))
      assert(s.contains("BroadcastHashJoin"),
        s"$q must broadcast the LUT against the codes scan:\n$s")
      assert(!s.contains("CartesianProduct"), s)
      assert(!s.contains("SortMergeJoin"),
        s"$q: codes must not shuffle into a sort-merge join:\n$s")
    }
  }

  test("shard assignment: the per-document rank window partitions by bucket") {
    val s = render(plan("q_shard_assign"))
    // the only windows allowed over the full document set are partitioned
    // by the coarse quality bucket; the single-partition prefix window runs
    // over the 17-row bucket-totals table, never the documents
    assert(s.contains("__qb"),
      s"expected the rank window to partition by the quality bucket:\n$s")
  }

  test("interval-overlap join plans an equi-join on the bin: no loop node") {
    val s = render(plan("q_interval_overlap"))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"interval overlap must bin into an equi-join:\n$s")
  }

  test("binned range join plans an equi-join: no nested-loop/cartesian node") {
    val s = render(plan("q_range_join_binned"))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"the keyless interval join must bin into an equi-join:\n$s")
  }

  test("record linkage blocks into equi-joins: no nested-loop/cartesian node") {
    val s = render(plan("q_record_linkage"))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"blocked linkage must never plan an all-pairs join:\n$s")
  }

  test("exact-substring dedup joins on gram hash only: no loop join") {
    val s = render(plan("q_exact_substr"))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"span dedup must stay equi-join-only:\n$s")
  }

  test("CDC apply is a max_by hash aggregate, one data shuffle") {
    val p = plan("q_cdc_apply")
    val s = render(p)
    assert(s.contains("max_by"), s"expected the max_by aggregate form:\n$s")
    // one aggregate exchange + one range partition for the oracle ORDER BY
    assert(countShuffles(p) <= 2,
      s"CDC apply must not shuffle beyond agg + final sort:\n$s")
  }

  test("weighted sampling plans the top-k as TakeOrderedAndProject") {
    assert(render(plan("q_weighted_sample")).contains("TakeOrderedAndProject"))
  }

  test("a PageRank step broadcasts the rank side, no cartesian node") {
    // run() checkpoints each round (truncating the observable plan), so
    // assert on one step directly: edges ⋈ ranks must hash-join with the
    // node-count-sized rank table broadcast, never a loop join.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val nodes = (0L to 200L).toDF("node")
    val edges = (0L until 1000L)
      .map(i => (i % 200, (i * 7) % 200, 1L)).toDF("src", "dst", "w")
    val e = edges.join(
      edges.groupBy(col("src")).agg(sum(col("w")).as("__out_w")), Seq("src"))
    val ranks = nodes.select(col("node"), lit(1000000L).as("rank_ppm"))
    val p = graft.operators.PageRank.step(nodes, e, ranks, dampPct = 85)
      .queryExecution.executedPlan
    val s = render(p)
    assert(s.contains("BroadcastHashJoin"),
      s"expected ranks (node-count rows) on the broadcast side:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"no loop join in a PageRank step:\n$s")
  }

  test("DSIR weighting broadcasts the 64-row weight table to the token stream") {
    val s = render(plan("q_dsir_weights"))
    assert(s.contains("BroadcastHashJoin"),
      s"expected the bucket-weight join to broadcast:\n$s")
    // the one BroadcastNestedLoopJoin is the intentional 64-row × 1-row
    // totals crossJoin — metadata-sized by construction; what must never
    // appear is an unbroadcast cartesian over data-sized inputs
    assert(!s.contains("CartesianProduct"),
      s"no cartesian in DSIR weighting:\n$s")
  }

  test("BPE encode broadcasts the tokenized vocab to the document stream") {
    val s = render(plan("q_bpe_encode"))
    assert(s.contains("BroadcastHashJoin"),
      s"expected the vocab join to broadcast:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"no loop join in BPE encode:\n$s")
  }

  test("triangle census: every join is a hash equi-join (wedge closure " +
    "never plans a loop join)") {
    val s = render(plan("q_triangle_count"))
    assert(!s.contains("CartesianProduct"),
      s"no cartesian in the triangle census:\n$s")
    // the only nested-loop joins are the 1-row stats crossJoins
    // (threshold + final assembly), never the wedge/closure joins:
    // those must stay hash equi-joins on node ids
    assert(s.contains("BroadcastHashJoin") || s.contains("SortMergeJoin") ||
      s.contains("ShuffledHashJoin"),
      s"wedge closure must be an equi-join:\n$s")
  }

  test("label propagation step: vote joins are hash equi-joins, never " +
    "loops (the run output itself is checkpoint-truncated)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val nodes = Seq((1L, Some(1L)), (2L, None)).toDF("node", "seed")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val labels = nodes.select(col("node"), col("seed").as("label"))
    val p = graft.operators.LabelProp.step(nodes, edges, labels)
      .queryExecution.executedPlan
    val s = render(p)
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"no loop join in a label-propagation step:\n$s")
    assert(s.contains("BroadcastHashJoin") || s.contains("SortMergeJoin") ||
      s.contains("ShuffledHashJoin"),
      s"edges⋈labels must be an equi-join:\n$s")
  }

  test("BFS step: relaxation joins are hash equi-joins, never loops") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dist = Seq((1L, Some(0L)), (2L, None)).toDF("node", "dist")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val p = graft.operators.Bfs.step(dist, edges)
      .queryExecution.executedPlan
    val s = render(p)
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"no loop join in a BFS relaxation step:\n$s")
    assert(s.contains("BroadcastHashJoin") || s.contains("SortMergeJoin") ||
      s.contains("ShuffledHashJoin"),
      s"edges⋈dist must be an equi-join:\n$s")
  }

  test("popcount ANN: the coarse stage is the single-pass bounded-buffer " +
    "scan (no pair-expansion loop join), and the rerank joins broadcast") {
    val p = plan("q_hamming_rerank")
    val s = render(p)
    // round 15 switched the benched query to the partitioned coarse path
    // (hammingRerankTopKPartitioned — spec-proven equal to the
    // declarative pair join in BinaryQuantSpec): the CONDITIONED id≠id
    // pair-expansion loop joins must now be GONE entirely; the only loop
    // join allowed is the condition-free 1-row thresholds cross join
    val loops = (p +: p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
      }).flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
          if j.condition.isDefined => j
    })
    assert(loops.isEmpty,
      s"partitioned coarse scan must not plan a pair-expansion loop join:\n$s")
    assert(s.contains("MapPartitions"),
      s"expected the bounded-buffer coarse scan:\n$s")
    assert(s.contains("BroadcastHashJoin"),
      s"candidate/vector fetch must be broadcast equi-joins:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("OHLC downsample: one hash-aggregate shuffle, no Window") {
    val p = plan("q_ohlc_downsample")
    val s = render(p)
    assert(!s.contains("Window"),
      s"min_by/max_by bars must not plan a Window:\n$s")
    // partial→final agg exchange + the output orderBy range exchange
    assert(countShuffles(p) <= 2, s"expected ≤2 shuffles:\n$s")
  }

  test("CDC chunking: boundaries/spans/hashes compute before any exchange") {
    val p = plan("q_cdc_chunks")
    // the only exchange is the final orderBy — chunking itself is a
    // narrow per-row projection + generate
    assert(countShuffles(p) <= 1,
      s"CDC chunking must not shuffle before the output sort:\n${render(p)}")
  }

  test("sparse cosine pairs: postings self-join is an equi-join on token") {
    val s = render(plan("q_sparse_cosine_pairs"))
    // the one BroadcastNestedLoopJoin is the intentional 1-row
    // corpus-count broadcast feeding the relative df cap (same pattern as
    // the DSIR weight join); the postings self-join itself must hash
    assert(!s.contains("CartesianProduct"),
      s"no cartesian in the postings self-join:\n$s")
    assert(s.contains("BroadcastHashJoin") || s.contains("SortMergeJoin") ||
      s.contains("ShuffledHashJoin"),
      s"postings join must be an equi-join:\n$s")
  }

  test("co-purchase mining broadcasts the part dimension; the pair " +
    "self-join is an equi-join on orderkey") {
    val s = render(plan("q_copurchase_pairs"))
    assert(s.contains("BroadcastHashJoin"),
      s"expected the part dim to broadcast:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"no loop join in co-purchase mining:\n$s")
  }

  test("IVF-PQ rerank: candidates broadcast against the vector source; " +
    "the corpus never shuffles into a sort-merge join") {
    val s = render(plan("q_ivfpq_rerank"))
    assert(s.contains("BroadcastHashJoin"),
      s"candidate set and query set must broadcast:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("SortMergeJoin"),
      s"rerank must stay broadcast equi-joins:\n$s")
  }

  test("k-means PQ encode: codebook broadcasts, argmin is the declarative " +
    "min(struct) — not a min_by typed-imperative buffer") {
    val s = render(plan("q_pq_kmeans"))
    assert(s.contains("BroadcastHashJoin"),
      s"the fitted codebook must broadcast against the subvectors:\n$s")
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"encode must stay an equi-join:\n$s")
    // min(struct(d2, cid, …)) plans as a map-side-combinable
    // SortAggregate (struct buffers are immutable — measured 2.4× over
    // min_by's per-row serialized buffer); the only ObjectHashAggregate
    // allowed is the 8-element collect_list assembling the codes string
    assert(s.contains("min(struct") && !s.contains("min_by"),
      s"argmin must be the declarative min(struct), not min_by:\n$s")
  }

  test("one-pass exact L2 top-k: no join operator at all — the pair " +
    "join is the anti-pattern this operator exists to avoid") {
    val s = render(plan("q_knn_brute_l2"))
    assert(!s.contains("Join"), s"one-pass form must not plan a join:\n$s")
    assert(s.contains("MapPartitions"),
      s"expected the partition-local heap pass:\n$s")
  }

  test("MaxSim: queries broadcast against the corpus, top-k is the " +
    "bounded-buffer aggregator — never a corpus-wide window") {
    val s = render(plan("q_maxsim_retrieval"))
    assert(s.contains("BroadcastNestedLoopJoin"),
      s"the query set must broadcast (the corpus never shuffles):\n$s")
    assert(!s.contains("CartesianProduct"),
      s"no shuffle-based cartesian:\n$s")
    assert(!s.contains("Window"),
      s"per-query top-k must be the TopK aggregate, not a window:\n$s")
  }

  test("faceted search: postings gate + metadata semi-join plan no loop join") {
    val s = render(plan("q_facet_search"))
    assert(!s.contains("BroadcastNestedLoopJoin") &&
      !s.contains("CartesianProduct"),
      s"facet counting must stay equi-join served:\n$s")
  }
}
