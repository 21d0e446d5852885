package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: headline queries on SPARK_GRAFT_SF_DIR, one JSON line
  * on stdout. Headlines cover every operator family (scan-agg, window/
  * latest-per-key, joins incl. as-of, dedup/LSH, similarity, text,
  * multimodal, ML, streaming) — the full registry still runs in Verify;
  * benching a representative set keeps the timing signal per family
  * readable.
  */
object Bench {

  /** One per operator family; must all exist in SparkEntry.queries. */
  val headline: Seq[String] = Seq(
    "q_count_star",            // raw scan throughput
    "q_user_stats",            // grouped multi-aggregate
    "q_latest_per_user_top",   // latest-per-key (max_by)
    "q_topk_per_group",        // bounded-buffer top-k aggregator
    "q_join_orders_customer",  // broadcast join + agg
    "q_star_region_revenue",   // 5-table star join, all dims broadcast
    "q_asof_join",             // union+window as-of join
    // dedup: LSH is the benched path. Exact pairwise Jaccard
    // (q_jaccard_pairs, oracle-checked in Verify) is deliberately NOT a
    // headline: its shingle self-join grows as Σ df(shingle)² — ~100× per
    // 10× docs on a low-vocab corpus — which is the reason the LSH
    // formulation exists.
    "q_minhash_lsh_pairs",
    "q_knn_brute",             // similarity search (exact)
    "q_nn_lsh_bucketed",       // similarity search (ANN scale path)
    "q_ivf_search",            // similarity search (IVF train/probe/search)
    "q_pq_adc",                // similarity search (quantized codes + ADC)
    "q_ivfpq_search",          // similarity search (IVF lists + residual PQ)
    "q_hamming_rerank",        // similarity search (binary codes + popcount)
    "q_sessionize",            // gap sessionization window
    "q_doc_quality",           // text analysis
    "q_decontaminate",         // corpus curation (eval-overlap scrub)
    "q_bpe_merges",            // tokenizer training (iterative vocab rounds)
    "q_media_phash_dedup",     // multimodal (perceptual-hash near-dedup)
    "q_hamming_rewrite",       // optimizer rule (naive SQL → banded join)
    // batched index-served retrieval (q_hybrid_batch_serve) is NOT a
    // headline: a registry entry must be self-contained, so each timed
    // run would rebuild BOTH persisted indexes — a build benchmark, not
    // a serving one. Its serving economics are measured where they are
    // visible: `Stress hybridbatch` (per-query 1.83→0.073 s as the batch
    // grows 1→32 against standing indexes, SCALE.md).
    "q_hybrid_rrf",            // retrieval (BM25 + dense arms, RRF fusion)
    // round-9 index/table lifecycle queries (q_bm25_maxscore,
    // q_index_merge, q_index_sync, q_table_optimize, q_table_cdf, ...)
    // are NOT headlines for the same self-containment reason — each
    // timed run would rebuild its index/table, benching the build.
    // Their serving economics are measured against standing artifacts in
    // `Stress maxscore` / `Stress optimize` / `Stress zonemap` (SCALE.md).
    // The round-10 format("graft") connector queries (q_graft_source_*,
    // q_graft_catalog_*, q_graft_stream_*) follow the same rule: each
    // rebuilds its manifest table in-query. The connector's serving cost
    // against a STANDING table is measured in `Stress connector` —
    // scan/range/point within noise of the library API at identical
    // files read (SCALE.md).
    "q_maxsim_retrieval",      // late-interaction retrieval (ColBERT MaxSim)
    "q_zscore_events",         // ML standardization
    "q_iforest_top_anomalies", // custom ML scoring
    "q_stream_hourly_rollup")  // structured streaming

  /** First lines of a proc file, "" when absent — closed promptly (a
    * leaked handle per bench run would be harmless but sloppy). */
  private def procLine(p: String): String =
    try {
      val src = scala.io.Source.fromFile(p)
      try src.getLines().take(2).mkString("; ").trim
      finally src.close()
    } catch { case scala.util.control.NonFatal(_) => "" }

  /** (busy, steal) jiffies off /proc/stat's aggregate cpu line — the
    * HYPERVISOR-side contention loadavg cannot see: this box measured
    * ~18% steal during a nominally idle (loadavg 0.0) window, which is
    * exactly the uniform all-queries inflation rounds 6-13 kept having
    * to diagnose from narratives. (0, 0) when unreadable. */
  private def cpuJiffies(): (Long, Long) =
    try {
      val l = procLine("/proc/stat").split("\\s+")
      // cpu user nice system idle iowait irq softirq steal ...
      val busy = l(1).toLong + l(2).toLong + l(3).toLong
      val steal = if (l.length > 8) l(8).toLong else 0L
      (busy, steal)
    } catch { case scala.util.control.NonFatal(_) => (0L, 0L) }

  def main(args: Array[String]): Unit = {
    // idle-window gate: the r13/r14 verdicts made publishing a bench
    // from a loaded box a BLOCKER (a load-4 co-tenant inflates every
    // query 30-60% and the round then litigates phantom regressions).
    // Wait — bounded — for the 1-minute load to drop below 1 before
    // timing; if the window never comes, run anyway and say so in the
    // artifact (`idle_box: false`), so a contended number can never
    // masquerade as a clean one.
    def load1(): Double = procLine("/proc/loadavg").split("\\s+")
      .headOption.flatMap(_.toDoubleOption).getOrElse(0.0)
    val idleWait = sys.env.getOrElse("SPARK_GRAFT_BENCH_IDLE_WAIT", "240")
      .toIntOption.getOrElse(240)
    var waited = 0
    while (load1() >= 1.0 && waited < idleWait) {
      System.err.println(f"[bench] loadavg ${load1()}%.2f >= 1 — " +
        s"waiting for an idle window ($waited/$idleWait s)")
      Thread.sleep(5000)
      waited += 5
    }
    val loadStart = procLine("/proc/loadavg")
    val (busy0, steal0) = cpuJiffies()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // absorb JVM/session/codegen warm-up outside the timed region
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val qs = SparkEntry.queries
    // median-of-3: steady-state timing, robust to transient GC/page-cache
    // noise AND diagnosable under host contention — every sample is logged
    // to stderr as it completes, so a distorted run (e.g. a contended
    // sandbox inflating CPU-bound queries 30-75×) shows up as wildly
    // spread samples rather than a silent bad number. A failed run
    // contributes NO timing; a query failing all runs reports -1 so
    // failures can't masquerade as fast results.
    val results = headline.filter(qs.contains).map { name =>
      val times = (1 to 3).flatMap { i =>
        val t0 = System.nanoTime()
        try {
          qs(name)(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[bench] $name run $i: $dt%.3f s")
          Some(dt)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name run $i FAILED: ${e.getMessage}")
            None
        }
      }
      val t =
        if (times.isEmpty) -1.0
        else if (times.size < 3) times.min
        else times.sorted.apply(1) // median
      name -> t
    }
    val qJson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // host provenance IN the artifact: rounds 6-12 repeatedly had to
    // litigate "regression or contended box?" from SCALE.md narratives —
    // recording the 1/5/15-min load averages at start and end (plus
    // cgroup CPU pressure when the kernel exposes it) makes that call
    // data in BENCH_r{N}.json itself. Zero behavior change: read-only
    // proc files, missing ones report empty.
    def j(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val loadEnd = procLine("/proc/loadavg")
    val pressure = procLine("/proc/pressure/cpu")
    val (busy1, steal1) = cpuJiffies()
    // steal fraction over the whole bench window: stolen jiffies per
    // busy jiffy — >0.05 means the hypervisor took a real bite and the
    // absolute total should be read against an earlier low-steal run
    val stealPct =
      if (busy1 > busy0)
        100.0 * (steal1 - steal0) / (busy1 - busy0 + steal1 - steal0)
      else 0.0
    val idleBox = loadStart.split("\\s+").headOption
      .flatMap(_.toDoubleOption).exists(_ < 1.0) && stealPct < 5.0
    println(f"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"sf":"$sfDir","loadavg_start":${j(loadStart)},"loadavg_end":${j(loadEnd)},"cpu_pressure":${j(pressure)},"cpu_steal_pct":$stealPct%.1f,"idle_box":$idleBox}""")
    spark.stop()
  }
}
