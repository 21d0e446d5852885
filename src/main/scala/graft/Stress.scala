package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress harness — replicates a corpus N× (offset ids) and runs a
  * scale-path pipeline end to end. Prints one JSON line.
  *
  * Usage: graft.Stress [sfDir] [copies] [mode]
  *   mode "dedup" (default): MinHash+LSH candidate pairs over N× documents
  *   mode "knn":             sign-LSH bucketed top-1 NN over N× embeddings
  *   mode "skew":            plain vs salted groupBy on copies×1M rows
  *                           where 90% share ONE key (sfDir unused)
  *   mode "asof":            backward vs forward as-of join over
  *                           copies×1M left + right rows (sfDir unused)
  *   mode "pq":              PQ encode + 100-query ADC search over N×
  *                           embeddings
  *   mode "binquant":        binary-quantization ANN over N× embeddings —
  *                           exact vs sketch threshold fit, popcount
  *                           Hamming+rerank search timed against brute
  *                           cosine on the same corpus/queries
  *   mode "state":           streaming-dedup state store under
  *                           copies×100k keys, default HDFS-backed vs
  *                           RocksDB provider, per-batch times + equal
  *                           output asserted (sfDir unused)
  *   mode "ivfpq":           persisted IVF-PQ lifecycle over N×
  *                           embeddings — build (train+encode+write
  *                           artifacts), append a drop under the saved
  *                           quantizer, search 100 queries through the
  *                           loaded index
  *   mode "contam":          decontamination (shingle-hash overlap vs a
  *                           broadcast eval set) over N× documents
  *   mode "substr":          exact-substring span accounting over N×
  *                           documents (replication makes EVERY gram a
  *                           duplicate — worst case for the span merge)
  *   mode "pagerank":        3 PageRank rounds over copies×100k nodes /
  *                           copies×1M edges (rank side too big to
  *                           broadcast — the honest graph-scale path)
  *   mode "curation":        the full CurationPipeline over an N×
  *                           exact-replicated corpus — exact dedup must
  *                           collapse the replicas, LSH the planted
  *                           near-dups; survivor count must equal the
  *                           single-copy run's
  *   mode "cc":              connected components over a copies×100k-node
  *                           PATH graph (diameter = n−1 — the worst case
  *                           min-label propagation cannot finish; the
  *                           star contraction converges in O(log² n)
  *                           rounds; sfDir unused)
  *   mode "morupdate":       MoR UPDATE vs CoW rewrite cost across 10×
  *                           table volume, fixed 1000-row match; pending
  *                           read tax before/after maintain (sfDir unused)
  *   mode "mordepth":        read cost vs unfolded delete-segment depth
  *                           (0 / N/2 / N segments), then folded — the
  *                           number the depth guard pages about
  *   mode "bloomrefresh":    Bloom artifact BUILD at 256/1024 batches —
  *                           executor-resident, driver blob bytes 0
  *   mode "kll":             mergeable KLL quantile sketch build+merge
  *                           over copies×1M doubles in 30 day-keys, with
  *                           the p50/p99 rank bound verified exactly
  *                           (sfDir unused)
  *   mode "recall":          recall@10 of every ANN path vs the exact
  *                           answer on the SAME N× corpus (copies are
  *                           deterministically jittered — recall over
  *                           exact clones is degenerate): IVF-PQ and
  *                           OPQ-rotated IVF-PQ at nProbe 1/2/4 vs exact
  *                           L2, binary-quant Hamming+rerank at
  *                           rerankWidth 16/32/64 vs exact cosine —
  *                           the number a user tuning nProbe/rerankWidth
  *                           actually needs, at the corpus size where
  *                           recall has already degraded
  *   mode "bpe":             5 BPE merge rounds over a synthetic
  *                           copies×100k-word vocabulary (~web-scale
  *                           post-normalization English at copies=10;
  *                           sfDir unused) — stresses the per-round
  *                           vocab explode/aggregate/argmax/apply loop
  *   mode "phash":           perceptual-hash dedup over N× media items,
  *                           historical hand-picked 8-bit/tau=6 config
  *   mode "phashauto":       same corpus with bandBits DERIVED from
  *                           count(*) at the registry's tau (args(3) =
  *                           tau override, args(4) = forced bandBits for
  *                           counterfactual measurement)
  *   mode "audiofp":         Haitsma–Kalker audio fingerprint + derived
  *                           banded dedup over the N× corpus's audio items
  *                           (args(3) = tau, default 8)
  *   mode "audiofpq":        audio-fp precision/recall vs shingle-Jaccard
  *                           truth at args(3) = tau
  *   mode "phashq":          phash precision/recall vs shingle-Jaccard
  *                           text-near-dup truth
  *   mode "dedupindex":      persisted HammingIndex build-once vs
  *                           re-hash-per-batch: 100k standing corpus,
  *                           5k drop, cold + steady-state probe times
  * The measured numbers live in SCALE.md ("Measured" table).
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 20
    val mode = if (args.length > 2) args(2) else "dedup"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    mode match {
      case "knn" =>
        val emb0 = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"))
        val big = (0 until copies).map(i =>
            emb0.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
              col("embedding")))
          .reduce(_ unionByName _).cache()
        val n = big.count()
        // the production configuration: planes derived from corpus size
        // (constant expected bucket width) + a width cap as the skew guard
        val planes = operators.Knn.planesFor(n, targetBucket = 8)
        val t0 = System.nanoTime()
        val bucketed = big.withColumn("bucket",
          operators.Knn.signBucket(col("embedding"), 64, planes))
        val nn = operators.Knn.nnWithinBucket(
          bucketed, "vec_id", "embedding", "bucket", maxBucket = 64)
        val nr = nn.count()
        val dt = (System.nanoTime() - t0) / 1e9
        // Σ bucket² is the exact pair-join cost bound; report it with the
        // max width so SCALE.md documents the measured skew envelope
        val stats = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("w"))
          .agg(count(lit(1)).as("n_buckets"), max(col("w")).as("max_w"),
            sum(col("w") * col("w")).as("sum_w2"))
          .head()
        println(f"""{"vectors":$n%d,"planes":$planes%d,"nn_rows":$nr%d,"seconds":$dt%.1f,"n_buckets":${stats.getLong(0)}%d,"max_bucket":${stats.getLong(1)}%d,"sum_bucket_sq":${stats.getLong(2)}%d}""")

      case "ivf" =>
        // Full IVF pipeline (train → probe → bounded exact search) over an
        // N×-replicated corpus; 100 query vectors. Candidate volume is
        // |q|·nProbe·(n/|lists|) — the measured check that search cost
        // tracks the probed fraction, not the corpus.
        val emb0 = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"), col("label"))
        val big = (0 until copies).map(i =>
            emb0.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
              col("embedding"), col("label")))
          .reduce(_ unionByName _).cache()
        val n = big.count()
        val queries = big.filter(col("vec_id") < 100)
        val t0 = System.nanoTime()
        val res = operators.Knn.ivfSearch(big, queries,
          "vec_id", "embedding", "label", k = 10, nProbe = 3)
        val nr = res.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val nLists = big.select(col("label")).distinct().count()
        println(f"""{"vectors":$n%d,"lists":$nLists%d,"result_rows":$nr%d,"seconds":$dt%.1f}""")

      case "skew" =>
        // copies×1M rows, 90% on key 0, rest uniform over 10k keys —
        // repartitioned round-robin so the hot key starts spread like a
        // real scan, and every aggregate keeps non-trivial reduce work.
        val rows = copies * 1000000L
        val big = spark.range(rows).select(
            when(col("id") % 10 < 9, 0L)
              .otherwise(pmod(col("id") * 2654435761L, lit(10000))).as("key"),
            col("id"),
            (col("id") % 1000).cast("double").as("v"))
          .repartition(32).cache()
        big.count()
        def time(f: => Long): (Long, Double) = {
          val t0 = System.nanoTime(); val n = f
          (n, (System.nanoTime() - t0) / 1e9)
        }
        val (n1, tPlain) = time {
          big.groupBy(col("key"))
            .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,6)")).as("s"),
              min(col("v")), max(col("v"))).count()
        }
        val (n2, tSalted) = time {
          operators.SaltedAgg.countSumMinMax(big, "key", col("id"), col("v")).count()
        }
        // Non-decomposable case: count(DISTINCT payload). Partial agg
        // cannot collapse distinct sets, so the hot key's payload all
        // lands on one reducer — THIS is where two-stage wins.
        val (n3, tDistPlain) = time {
          big.groupBy(col("key")).agg(countDistinct(col("id"))).count()
        }
        val (n4, tDistTwoStage) = time {
          big.select(col("key"), col("id")).distinct()
            .groupBy(col("key")).agg(count(lit(1))).count()
        }
        println(f"""{"rows":$rows%d,"groups":$n1%d,"decomposable_plain_s":$tPlain%.1f,"decomposable_salted_s":$tSalted%.1f,"distinct_plain_s":$tDistPlain%.1f,"distinct_two_stage_s":$tDistTwoStage%.1f,"sanity":${n1 == n2 && n3 == n4}%b}""")

      case "asof" =>
        // Both directions must run in O(n log n): the forward join is the
        // regression guard (a naive unbounded-FOLLOWING frame is O(n²) —
        // ~1e12 frame evaluations at this size, i.e. it would not finish).
        val rows = copies * 1000000L
        def side(off: Long) = spark.range(rows).select(
          (col("id") % 1000).as("key"), (col("id") * 7 + off).as("t"),
          col("id").as("payload")).repartition(32)
        val l = side(0).cache(); val r = side(3).cache()
        l.count(); r.count()
        def time(f: => Long): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        // consume the CARRIED column, not count(): under a bare count()
        // Catalyst prunes the whole window/merge away and the number
        // measures the union scan, not the join
        val tB = time(operators.AsOfJoin.backward(
            l, r, "key", "t", "t", Seq("payload"))
          .agg(coalesce(sum(col("asof_payload")), lit(0L))).head().getLong(0))
        val tF = time(operators.AsOfJoin.forward(
            l, r, "key", "t", "t", Seq("payload"))
          .agg(coalesce(sum(col("asof_payload")), lit(0L))).head().getLong(0))
        // the custom physical operator on the same inputs (right columns
        // renamed: the merge-exec contract)
        val rP = r.select(col("key").as("rkey"), col("t").as("rt"),
          col("payload").as("rpayload"))
        val tP = time(graft.plans.PhysicalAsOf.backward(
            l, rP, "key", "t", "rkey", "rt")
          .agg(coalesce(sum(col("rpayload")), lit(0L))).head().getLong(0))
        println(f"""{"rows_per_side":$rows%d,"backward_s":$tB%.1f,"forward_s":$tF%.1f,"physical_backward_s":$tP%.1f}""")

      case "pq" =>
        // Encode is the corpus-wide cost (one broadcast join + min_by per
        // vector×subspace); search must track the CODES volume, not the
        // vector volume — that separation is what this mode measures.
        val emb0 = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"), col("label"))
        val big = (0 until copies).map(i =>
            emb0.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
              col("embedding"), col("label")))
          .reduce(_ unionByName _).cache()
        val n = big.count()
        def time[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime(); val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val (codes, tEnc) = time {
          val c = operators.PQ.encode(big, "vec_id", "embedding", "label", 8, 8)
            .localCheckpoint(true)
          c.count(); c
        }
        val queries = big.filter(col("vec_id") < 100)
        val (nr, tSearch) = time {
          operators.PQ.adcSearch(big, queries, "vec_id", "embedding", "label",
            k = 10, subspaces = 8, subDim = 8, codes = Some(codes)).count()
        }
        println(f"""{"vectors":$n%d,"encode_s":$tEnc%.1f,"search_s":$tSearch%.1f,"result_rows":$nr%d}""")

      case "binquant" =>
        // Binary quantization: fit (64-row order-stat aggregate) + pack is
        // the corpus-wide cost; the coarse search scans 8-byte codes with
        // an integer popcount and only the Hamming top-32 per query ever
        // evaluates a float cosine. Timed against brute cosine over the
        // SAME corpus/queries — the measured gap is the reason the code
        // table exists.
        val emb0 = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"))
        val big = (0 until copies).map(i =>
            emb0.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
              col("embedding")))
          .reduce(_ unionByName _).cache()
        val n = big.count()
        def time[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime(); val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        // exact order-stat fit (oracle parity) vs the sketch fit the scale
        // path uses — same downstream plan, different fit aggregate
        val (_, tFitExact) = time {
          operators.BinaryQuant.fitThresholds(big, "embedding").count()
        }
        val (coded, tFit) = time {
          val thr = operators.BinaryQuant.fitThresholdsApprox(big, "embedding")
          val c = operators.BinaryQuant.withCode(big, "embedding", thr)
            .localCheckpoint(true)
          c.count(); c
        }
        // 500 queries so distance compute dominates the fixed join/window
        // overhead; brute runs FIRST so page-cache/JIT warm-up cannot
        // flatter the popcount path.
        val queries = coded.filter(col("vec_id") < 500)
        val (nBrute, tBrute) = time {
          operators.Knn.bruteTopK(big, big.filter(col("vec_id") < 500),
            "vec_id", "embedding", k = 10).count()
        }
        val (nBruteP, tBruteP) = time {
          operators.Knn.bruteTopKPartitioned(big,
            big.filter(col("vec_id") < 500), "vec_id", "embedding", k = 10)
            .count()
        }
        val (nApprox, tHam) = time {
          operators.BinaryQuant.hammingRerankTopK(
            coded, "vec_id", "embedding", queries, k = 10, rerankWidth = 32)
            .count()
        }
        // single-pass partition-local coarse (no pair materialization) —
        // the scale path; must return the same row count
        val (nPart, tPart) = time {
          operators.BinaryQuant.hammingRerankTopKPartitioned(
            coded, "vec_id", "embedding", queries, k = 10, rerankWidth = 32)
            .count()
        }
        println(f"""{"vectors":$n%d,"fit_exact_s":$tFitExact%.1f,"fit_sketch_pack_s":$tFit%.1f,"hamming_s":$tHam%.1f,"hamming_1pass_s":$tPart%.1f,"brute_s":$tBrute%.1f,"brute_1pass_s":$tBruteP%.1f,"approx_rows":$nApprox%d,"onepass_rows":$nPart%d,"brute_rows":$nBrute%d,"brute_1pass_rows":$nBruteP%d}""")

      case "state" =>
        // Stateful-streaming state-store providers under real key volume:
        // exact streaming dedup (dropDuplicates by id, NO watermark — state
        // only grows) over two copies×100k-key drops, second drop half
        // duplicate / half new, run under the default HDFS-backed provider
        // and under RocksDB. The default keeps every state row on the JVM
        // heap; RocksDB keeps it off-heap with incremental snapshots — the
        // registry's default for the heavy stateful queries. Output counts
        // are asserted equal (provider choice must never change results);
        // sink is foreachBatch-count, so sink memory never pollutes the
        // state measurement.
        import org.apache.spark.sql.types._
        val nKeys = copies * 100000L
        val schema = StructType(Seq(StructField("event_id", LongType),
          StructField("user_id", LongType)))
        def runProvider(provider: Option[String]): (Double, Double, Long) = {
          val key = "spark.sql.streaming.stateStore.providerClass"
          provider match {
            case Some(p) => spark.conf.set(key, p)
            case None => spark.conf.unset(key)
          }
          val dir = java.nio.file.Files
            .createTempDirectory("stress_state_src").toString
          def drop(lo: Long, hi: Long): Unit =
            spark.range(lo, hi).select(col("id").as("event_id"),
                pmod(col("id"), lit(997L)).as("user_id"))
              .write.mode("append").parquet(dir)
          val seen = spark.sparkContext.longAccumulator("rows_out")
          drop(0L, nKeys)
          val q = spark.readStream.schema(schema).parquet(dir)
            .dropDuplicates("event_id")
            .writeStream.outputMode("append")
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  _: Long) => seen.add(b.count()); ()
            }.start()
          def timed(f: => Unit): Double = {
            val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
          }
          try {
            val t1 = timed(q.processAllAvailable())
            drop(nKeys / 2, nKeys * 3 / 2) // half dup — state must catch it
            val t2 = timed(q.processAllAvailable())
            (t1, t2, seen.value)
          } finally { q.stop(); spark.conf.unset(key) }
        }
        val (h1, h2, hOut) = runProvider(None)
        val (r1, r2, rOut) = runProvider(Some("org.apache.spark.sql." +
          "execution.streaming.state.RocksDBStateStoreProvider"))
        val want = nKeys * 3 / 2
        require(hOut == want && rOut == want,
          s"provider changed results: hdfs=$hOut rocks=$rOut want=$want")
        println(f"""{"keys":$want%d,"hdfs_batch1_s":$h1%.1f,"hdfs_batch2_s":$h2%.1f,"rocksdb_batch1_s":$r1%.1f,"rocksdb_batch2_s":$r2%.1f,"rows_out":$rOut%d}""")

      case "ivfpq" =>
        // Persisted IVF-PQ lifecycle at N× scale: build = train (two
        // broadcast-sized aggregates) + encode + the parquet write of all
        // three artifacts; append = one replica drop encoded under the
        // SAVED quantizer (nearest-centroid assign + residual encode, no
        // refit); search = 100 queries through the LOADED index. Numbers
        // include the artifact round trips — the real persistence path,
        // not just the plan.
        val emb0 = Tables.embeddings(spark, sfDir)
        val big = (0 until copies).map(i =>
            emb0.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
              col("embedding"), col("label")))
          .reduce(_ unionByName _).cache()
        val n = big.count()
        def time[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime(); val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val path = java.nio.file.Files
          .createTempDirectory("graft_stress_ivfpq").toString
        val (_, tBuild) = time {
          operators.VectorIndex.buildIvfPq(
            big, "vec_id", "embedding", "label", path, 8, 8)
        }
        val extra = emb0.select(
          (col("vec_id") + lit(copies * 10000000L)).as("vec_id"),
          col("embedding"), col("label"))
        val (_, tAppend) = time {
          operators.VectorIndex.appendIvfPq(extra, "vec_id", "embedding", path)
        }
        val (nr, tSearch) = time {
          operators.VectorIndex.searchIvfPq(spark, path,
            big.filter(col("vec_id") < 100), "vec_id", "embedding",
            k = 10, nProbe = 4).count()
        }
        val nCodes = operators.VectorIndex.loadIvfPqCodes(spark, path).count()
        println(f"""{"vectors":$n%d,"build_s":$tBuild%.1f,"append_s":$tAppend%.1f,"search_s":$tSearch%.1f,"result_rows":$nr%d,"code_rows":$nCodes%d}""")

      case "contam" =>
        // Corpus side: explode + broadcast join + hash agg — linear in
        // corpus shingles; the eval set stays fixed (benchmarks are small).
        val docs0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val big = (0 until copies).map(i =>
            docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
          .reduce(_ unionByName _).cache()
        val n = big.count()
        val evalH = docs0.filter(col("doc_id") < 20)
          .select(explode(functions.Text.shingleHashesWith(col("text"), 3,
            functions.Text.fastHash)).as("h"))
          .distinct().withColumn("__hit", lit(1L))
        val t0 = System.nanoTime()
        val nr = big
          .select(col("doc_id"), explode(functions.Text.shingleHashesWith(col("text"), 3,
            functions.Text.fastHash)).as("h"))
          .join(broadcast(evalH), Seq("h"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
          .filter(col("n_contaminated") > 0)
          .count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"docs":$n%d,"contaminated_docs":$nr%d,"seconds":$dt%.1f}""")

      case "substr" =>
        // Scale path of q_exact_substr (xxhash64 grams): (hash, pos) pairs
        // shuffle into the occurrence count, span merge windows per doc.
        // N× replication turns every gram into a duplicate, so the merge
        // stage sees its maximum possible input.
        val docs0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val big = (0 until copies).map(i =>
            docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
          .reduce(_ unionByName _).cache()
        val n = big.count()
        val t0 = System.nanoTime()
        val withT = big
          .withColumn("__t", functions.Text.tokens(col("text")))
          .withColumn("__n", size(col("__t")).cast("long"))
        val grams = withT.filter(col("__n") >= 8)
          .select(col("doc_id"),
            posexplode(transform(
              sequence(lit(0L), col("__n") - 8),
              p => functions.Text.fastHash(
                array_join(slice(col("__t"), (p + 1).cast("int"), lit(8)), " "))))
              .as(Seq("p", "h")))
          .withColumn("p", col("p").cast("long"))
        val occ = grams.groupBy(col("h")).agg(count(lit(1)).as("__c"))
        val dup = grams.join(occ, Seq("h")).filter(col("__c") > 1)
          .select(col("doc_id"), col("p"))
        val nr = operators.Spans.coveredLength(dup, "doc_id", "p", width = 8).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"docs":$n%d,"docs_with_spans":$nr%d,"seconds":$dt%.1f}""")

      case "pagerank" =>
        val nNodes = copies * 100000L
        val nodes = spark.range(nNodes).select(col("id").as("node")).cache()
        val edges = spark.range(copies * 1000000L).select(
            pmod(col("id") * 2654435761L, lit(nNodes)).as("src"),
            pmod(col("id") * 40503L + 7, lit(nNodes)).as("dst"),
            lit(1L).as("w")).cache()
        nodes.count(); edges.count()
        val t0 = System.nanoTime()
        val ranks = operators.PageRank.run(nodes, edges, iters = 3)
        val nr = ranks.count()
        val mass = ranks.agg(sum(col("rank_ppm"))).head().getLong(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"nodes":$nNodes%d,"edges":${copies * 1000000L}%d,"ranked":$nr%d,"total_mass_ppm":$mass%d,"seconds":$dt%.1f}""")

      case "recall" =>
        // Approximate-ANN recall vs ground truth at a corpus size where
        // recall has actually degraded (fixed planes/nProbe lose recall as
        // n grows — the effect a bench at sf0.1 cannot show). Copies get a
        // deterministic ±0.025 per-coordinate jitter (~10% of coordinate
        // scale): exact clones would make every true top-10 a list of
        // clones and recall trivially 1.0 or 0.0. All paths are scored
        // against the same 100 copy-0 queries.
        val emb0 = Tables.embeddings(spark, sfDir)
        // jitter computed in double, stored back as float — every ANN
        // operator's corpus contract is array<float>
        val big = (0 until copies).map { i =>
          if (i == 0) emb0.select(col("vec_id"), col("embedding"), col("label"))
          else
            emb0.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
              transform(col("embedding"), (x, j) =>
                (x.cast("double") +
                  (pmod(hash(col("vec_id"), j, lit(i)).cast("long"), lit(997L))
                    .cast("double") / 997.0 * 0.05 - 0.025)).cast("float"))
                .as("embedding"),
              col("label"))
        }.reduce(_ unionByName _).cache()
        val n = big.count()
        val queries = big.filter(col("vec_id") < 100).localCheckpoint(true)
        val nq = queries.count()
        def time[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime(); val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        // exact L2 truth (IVF-PQ approximates L2) — the one-pass
        // partition-local form, oracle-gated by q_knn_brute_l2; the
        // declarative join+window form measured 153 s vs 15 s at 2M
        // (pair materialization, not arithmetic — the binquant lesson)
        def l2Truth(corpus: org.apache.spark.sql.DataFrame)
            : org.apache.spark.sql.DataFrame = {
          val t = operators.Knn.bruteTopKPartitionedL2(corpus,
              corpus.filter(col("vec_id") < 100), "vec_id", "embedding",
              k = 10)
            .select(col("query_id"), col("neighbor_id"))
            .localCheckpoint(true)
          t.count(); t
        }
        val (truthL2, tTruthL2) = time(l2Truth(big))
        def recallOf(approx: org.apache.spark.sql.DataFrame,
            truth: org.apache.spark.sql.DataFrame): Double =
          approx.select(col("query_id"), col("neighbor_id"))
            .join(truth, Seq("query_id", "neighbor_id"))
            .count().toDouble / (nq * 10)
        // IVF-PQ: train ONCE, search at each nProbe over the same codes.
        // Residual codebooks are the production per-subspace k-means fit
        // (64 codewords, 3 Lloyd rounds) — the label-mean oracle quantizer
        // has only |lists| codewords per subspace, so within a list every
        // vector shares one code and ADC ranking degenerates to id order
        // (recall ≈ 0 by construction; measured before this harness
        // switched fits). Recall here is therefore the number a production
        // IVFx,PQ8 deployment would see.
        // nProbe 1/2/4 measure the probe/recall trade a user tunes;
        // nProbe 10 probes ALL lists, isolating pure ADC-quantization
        // recall (the number the codebook quality — and the OPQ
        // rotation — actually moves; smaller probes are bounded by
        // coarse-list mass, not quantization). At 2M vectors the np10
        // ADC join materializes |codes|·|queries| rows — the pure-ADC
        // point comes from the 200k run, so trim the sweep above 500k.
        val probes = if (n > 500000) Seq(1, 2, 4) else Seq(1, 2, 4, 10)
        def ivfPqRecalls(corpus: org.apache.spark.sql.DataFrame,
            truth: org.apache.spark.sql.DataFrame)
            : (Map[Int, Double], Double, Double) = {
          val ((cents, rcw, codes), tTrain) = time {
            val (c, r, k) = operators.PQ.ivfPqTrain(
              corpus, "vec_id", "embedding", "label", 8, 8,
              residCodebook = Some(resid => operators.PQ.kmeansCodebook(
                resid, "vec_id", "__r", 8, 8, k = 64, iters = 3)))
            val kc = k.localCheckpoint(true); kc.count(); (c, r, kc)
          }
          val rs = probes.map { np =>
            np -> recallOf(operators.PQ.ivfPqProbeSearch(cents, rcw, codes,
              corpus.filter(col("vec_id") < 100), "vec_id", "embedding",
              k = 10, nProbe = np, subspaces = 8, subDim = 8), truth)
          }.toMap
          // the production serving config (faiss refine): ADC top-100 →
          // exact rerank top-10 at the sweep's largest nProbe — the
          // candidate set is what ADC is actually good for; ranking
          // within it belongs to exact floats
          val rerank = recallOf(operators.PQ.ivfPqSearchRerank(
            cents, rcw, codes, corpus, corpus.filter(col("vec_id") < 100),
            "vec_id", "embedding", k = 10, rerankWidth = 100,
            nProbe = probes.max, subspaces = 8, subDim = 8), truth)
          (rs, rerank, tTrain)
        }
        def rotated(corpus: org.apache.spark.sql.DataFrame) =
          corpus.select(col("vec_id"), col("label"),
            functions.HadamardRotateExpr(col("embedding")).as("embedding"))
        val (pqRec, pqRerank, tPqTrain) = ivfPqRecalls(big, truthL2)
        // OPQ: the same pipeline over the rotated corpus. Rotation is
        // orthonormal, so the original-space L2 truth is still the
        // yardstick — neighbor ids, not distances, are compared.
        val (opqRec, opqRerank, tOpqTrain) = ivfPqRecalls(rotated(big), truthL2)
        // Energy-skewed corpus (≤300k only — a mechanism demonstration,
        // not a scale point): subspace s scaled 2^(1.5 − s/2), so
        // subspace 0 carries ~128× subspace 7's energy. This is the case
        // OPQ exists for — a fixed per-subspace code budget starves the
        // hot subspace, and the rotation re-spreads the energy. On the
        // isotropic synthetic corpus plain-vs-OPQ is a wash by design;
        // here the gap is the operator's value, measured.
        val skewRecs: Option[(Map[Int, Double], Map[Int, Double])] =
          if (n > 300000) None else {
            val skew = big.select(col("vec_id"), col("label"),
              transform(col("embedding"), (x, j) =>
                (x.cast("double") *
                  pow(lit(2.0), lit(1.5) - floor(j / 8).cast("double") * 0.5))
                  .cast("float")).as("embedding"))
              .localCheckpoint(true)
            val truthSkew = l2Truth(skew)
            Some((ivfPqRecalls(skew, truthSkew)._1,
              ivfPqRecalls(rotated(skew), truthSkew)._1))
          }
        val rerankJson =
          f""","ivfpq_rerank_np${probes.max}%d":$pqRerank%.3f""" +
          f""","opq_rerank_np${probes.max}%d":$opqRerank%.3f"""
        // binary quantization vs exact COSINE truth (its rerank metric)
        val (truthCos, tTruthCos) = time {
          val t = operators.Knn.bruteTopKPartitioned(big, queries,
              "vec_id", "embedding", k = 10)
            .select(col("query_id"), col("neighbor_id"))
            .localCheckpoint(true)
          t.count(); t
        }
        val thr = operators.BinaryQuant.fitThresholdsApprox(big, "embedding")
        val coded = operators.BinaryQuant.withCode(big, "embedding", thr)
          .localCheckpoint(true)
        val bqRec = Seq(16, 32, 64).map { rw =>
          rw -> recallOf(operators.BinaryQuant.hammingRerankTopKPartitioned(
            coded, "vec_id", "embedding", coded.filter(col("vec_id") < 100),
            k = 10, rerankWidth = rw), truthCos)
        }.toMap
        // SQ8 vs the exact-L2 truth: the declarative symmetric-code
        // search is corpus×queries-shaped, so score it at ≤300k only
        // (the quantizer-CHOICE point — at 8 bits/dim the codes are
        // near-lossless for ranking, the reason faiss defaults to SQ8
        // when 4× compression is enough and PQ when it is not)
        val sq8Rec: Option[Double] =
          if (n > 300000) None
          else {
            val fit = operators.SQ.fitMinMax(big, "embedding")
              .localCheckpoint(true)
            val sqCoded = operators.SQ.withCodes(big, "embedding", fit)
              .localCheckpoint(true)
            Some(recallOf(operators.SQ.searchTopK(sqCoded, "vec_id",
              "qcode", sqCoded.filter(col("vec_id") < 100), k = 10),
              truthL2))
          }
        def m(r: Map[Int, Double], p: String) = r.toSeq.sortBy(_._1)
          .map { case (k, v) => f""""$p$k%d":$v%.3f""" }.mkString(",")
        val skewJson = skewRecs.map { case (p, o) =>
          s""",${m(p, "skew_np")},${m(o, "skew_opq_np")}""" }.getOrElse("")
        val sq8Json = sq8Rec.map(r => f""","sq8":$r%.3f""").getOrElse("")
        println(f"""{"vectors":$n%d,"queries":$nq%d,"truth_l2_s":$tTruthL2%.1f,"truth_cos_s":$tTruthCos%.1f,"ivfpq_train_s":$tPqTrain%.1f,"opq_train_s":$tOpqTrain%.1f,${m(pqRec, "ivfpq_np")},${m(opqRec, "opq_np")}$rerankJson,${m(bqRec, "binquant_rw")}$sq8Json$skewJson}""")

      case "bpe" =>
        // synthetic vocab: ~copies×100k distinct 4–10-char words over a
        // 26-letter alphabet, Zipf-ish counts — deterministic via hash(id)
        val words = spark.range(copies * 100000L)
          .select(
            expr("array_join(transform(sequence(0, cast(3 + id % 7 as int)), " +
              "j -> chr(97 + pmod(hash(id, j), 26))), '')").as("w"),
            (lit(1L) + pmod(expr("hash(id)").cast("long"), lit(1000L))).as("c0"))
          .groupBy(col("w")).agg(sum(col("c0")).as("c"))
          .cache()
        val nVocab = words.count()
        val t0 = System.nanoTime()
        val merges = operators.BPE.learnMerges(words, "w", "c", nMerges = 5)
        val dt = (System.nanoTime() - t0) / 1e9
        words.unpersist()
        val tops = merges.map(m => s""""${m.left_sym}${m.right_sym}"""")
          .mkString("[", ",", "]")
        println(f"""{"vocab":$nVocab%d,"rounds":${merges.size}%d,"merged":$tops,"seconds":$dt%.1f}""")

      case "curation" =>
        // every replica of a doc is an EXACT dup of copy 0 (same text,
        // new id) — the pipeline must collapse the corpus back to its
        // single-copy survivor count via the exact-dedup stage, with the
        // LSH stage then removing the corpus's own planted near-dups
        val docs0 = Tables.documents(spark, sfDir)
        val big = (0 until copies).map(i =>
            docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
              col("text"), col("lang"), col("source"), col("n_chars")))
          .reduce(_ unionByName _).cache()
        big.count()
        val out = s"/tmp/graft_curation_stress_${System.nanoTime()}"
        val t0 = System.nanoTime()
        val counts = CurationPipeline.runDocs(spark, big, out)
        val dt = (System.nanoTime() - t0) / 1e9
        big.unpersist()
        println(counts.map { case (k, v) => s""""$k":$v""" }
          .mkString("{", ",", f""","seconds":$dt%.1f}"""))

      case "phash" =>
        // copies× exact-replicated docs: every replica pair is a
        // hamming-0 perceptual dup by construction, so pair volume is
        // known (docs × C(copies,2) + the corpus's own near-dup pairs).
        // This point keeps the HAND-PICKED 8-bit/maxHamming=6 config as
        // the historical baseline; "phashauto" below runs the same corpus
        // with the width DERIVED from count(*) (bandBitsFor) at the
        // registry's own maxHamming=12 — the derivation that retired the
        // hand-picking (a fixed 4-bit width puts ~n/16 rows per bucket
        // and Σ bucket² grows quadratically in n).
        val dph0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val bigd = (0 until copies).map(i =>
            dph0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
              col("text")))
          .reduce(_ unionByName _).cache()
        val nItems = bigd.count()
        val tp0 = System.nanoTime()
        val phMedia = multimodal.Media.synthesizeCovering(bigd, "doc_id", "text")
          .as[multimodal.Media.MediaRow](
            org.apache.spark.sql.Encoders.product[multimodal.Media.MediaRow])
        val ph = multimodal.Media.dHash(phMedia).toDF().localCheckpoint(true)
        val tHash = (System.nanoTime() - tp0) / 1e9
        val tp1 = System.nanoTime()
        val phPairs = operators.MinHashLSH.hammingBandPairs(
          ph, "media_id", "ph_hi", "ph_lo", maxHamming = 6, bandBits = 8)
        val nPairs = phPairs.count()
        val tPair = (System.nanoTime() - tp1) / 1e9
        bigd.unpersist()
        println(f"""{"items":$nItems%d,"hash_seconds":$tHash%.1f,"pairs":$nPairs%d,"pair_seconds":$tPair%.1f}""")

      case "phashauto" =>
        // the "phash" point WITHOUT the hand-picked 8×8 config: bandBits
        // derived from count(*) (MinHashLSH.bandBitsFor) at the registry's
        // own maxHamming=12 — the setting whose fixed 4-bit default went
        // quadratic at 100k+ in earlier rounds. Run next to "phash" at the
        // same copies to show the engine now picks the scale-safe width
        // (and pays the sub-radius probe expansion) by itself.
        val dpa0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val bigda = (0 until copies).map(i =>
            dpa0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
              col("text")))
          .reduce(_ unionByName _).cache()
        val nItemsA = bigda.count()
        // optional overrides for counterfactual measurement: args(3) = tau
        // (default 12, the registry radius), args(4) = forced bandBits
        // (default 0 = derive via bandBitsFor — the shipped path)
        val tauA = if (args.length > 3) args(3).toInt else 12
        val forcedB = if (args.length > 4) args(4).toInt else 0
        val usedB = if (forcedB > 0) forcedB
          else operators.MinHashLSH.bandBitsFor(nItemsA, tauA)
        val ta0 = System.nanoTime()
        val phMediaA = multimodal.Media.synthesizeCovering(bigda, "doc_id", "text")
          .as[multimodal.Media.MediaRow](
            org.apache.spark.sql.Encoders.product[multimodal.Media.MediaRow])
        val phA = multimodal.Media.dHash(phMediaA).toDF().localCheckpoint(true)
        val tHashA = (System.nanoTime() - ta0) / 1e9
        val ta1 = System.nanoTime()
        val nPairsA = operators.MinHashLSH.hammingBandPairs(
          phA, "media_id", "ph_hi", "ph_lo", maxHamming = tauA,
          bandBits = forcedB).count()
        val tPairA = (System.nanoTime() - ta1) / 1e9
        bigda.unpersist()
        println(f"""{"items":$nItemsA%d,"tau":$tauA%d,"band_bits":$usedB%d,"derived":${forcedB == 0}%b,"hash_seconds":$tHashA%.1f,"pairs":$nPairsA%d,"pair_seconds":$tPairA%.1f}""")

      case "rewriterule" =>
        // the Catalyst HammingJoinRule at scale: the NAIVE quadratic SQL
        // self-join (the query a user actually writes) through the
        // optimizer, next to the hammingBandPairs operator at the same
        // derived width — same corpus as "phashauto". The rewrite must
        // land within noise of the hand-called operator (identical plan
        // family), while rule-off would be the quadratic nested-loop
        // this harness does NOT run past 20k (214 s at 100k, measured
        // for the unweighted-width model in round 7).
        val drr0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val bigrr = (0 until copies).map(i =>
            drr0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
              col("text")))
          .reduce(_ unionByName _).cache()
        bigrr.count()
        val rrMedia = multimodal.Media.synthesizeCovering(bigrr, "doc_id", "text")
          .as[multimodal.Media.MediaRow](
            org.apache.spark.sql.Encoders.product[multimodal.Media.MediaRow])
        val rrHash = multimodal.Media.dHash(rrMedia).toDF().localCheckpoint(true)
        val nRr = rrHash.count()
        if (!spark.experimental.extraOptimizations.contains(plans.HammingJoinRule))
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ plans.HammingJoinRule
        rrHash.createOrReplaceTempView("rr_h")
        val rr0 = System.nanoTime()
        val nPairsRule = spark.sql(
          """SELECT a.media_id, b.media_id
            |FROM rr_h a JOIN rr_h b
            |  ON a.media_id < b.media_id
            | AND bit_count(a.ph_hi ^ b.ph_hi)
            |   + bit_count(a.ph_lo ^ b.ph_lo) <= 12""".stripMargin).count()
        val tRule = (System.nanoTime() - rr0) / 1e9
        val rr1 = System.nanoTime()
        val nPairsOp = operators.MinHashLSH.hammingBandPairs(
          rrHash, "media_id", "ph_hi", "ph_lo", maxHamming = 12).count()
        val tOp = (System.nanoTime() - rr1) / 1e9
        bigrr.unpersist()
        println(f"""{"items":$nRr%d,"rule_pairs":$nPairsRule%d,"rule_seconds":$tRule%.1f,"operator_pairs":$nPairsOp%d,"operator_seconds":$tOp%.1f}""")

      case "multiprobe" =>
        // multi-probe sign-LSH recall/cost trade at a corpus size where
        // single-probe recall has genuinely collapsed (same jittered
        // corpus as "recall"): recall@10 vs exact cosine truth and
        // seconds for probes 1/4/8/16 — the number that shows probing
        // low-margin perturbation sets buys back recall without (k,L)
        // index copies.
        val mpe0 = Tables.embeddings(spark, sfDir)
        val bigmp = (0 until copies).map { i =>
          if (i == 0) mpe0.select(col("vec_id"), col("embedding"))
          else
            mpe0.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
              transform(col("embedding"), (x, j) =>
                (x.cast("double") +
                  (pmod(hash(col("vec_id"), j, lit(i)).cast("long"), lit(997L))
                    .cast("double") / 997.0 * 0.05 - 0.025)).cast("float"))
                .as("embedding"))
        }.reduce(_ unionByName _).cache()
        val nMp = bigmp.count()
        val mpQueries = bigmp.filter(col("vec_id") < 100).localCheckpoint(true)
        val nMpq = mpQueries.count()
        val mp0 = System.nanoTime()
        val mpTruth = operators.Knn.bruteTopK(bigmp, mpQueries,
            "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
        mpTruth.count()
        val tMpTruth = (System.nanoTime() - mp0) / 1e9
        val sweep = Seq(1, 4, 8, 16).map { p =>
          val t0 = System.nanoTime()
          val hits = operators.Knn.multiProbeSearch(bigmp, mpQueries,
              "vec_id", "embedding", k = 10, probes = p)
            .select(col("query_id"), col("neighbor_id"))
            .join(mpTruth, Seq("query_id", "neighbor_id")).count()
          val dt = (System.nanoTime() - t0) / 1e9
          f""""p$p%d":{"recall":${hits.toDouble / (nMpq * 10)}%.3f,"seconds":$dt%.1f}"""
        }.mkString(",")
        bigmp.unpersist()
        println(f"""{"vectors":$nMp%d,"planes":${operators.Knn.planesFor(nMp)}%d,"truth_seconds":$tMpTruth%.1f,$sweep}""")

      case "upsert" =>
        // CoW vs MoR keyed-upsert sinks at a standing-table scale the
        // bench fixtures can't show: 2M standing keys, 20k-row drops.
        // CoW pays a full merged-snapshot rewrite per batch (cost ∝
        // table); MoR appends the drop and defers merging to the read
        // (cost ∝ batch). Reported: per-batch sink seconds for each,
        // plus the MoR read-resolve and compact cost — the complete
        // trade, measured.
        import spark.implicits._
        val nKeys = 2000000L
        val batchRows = 20000
        def drop(seed: Int) = spark.range(batchRows)
          .select((pmod(hash(col("id"), lit(seed)).cast("long"), lit(nKeys)))
              .as("user_id"),
            (col("id") + seed * 1000000L).as("last_event_id"),
            (col("id") % 1000L).as("__ts"),
            (col("id") % 97L).cast("double").as("last_value"))
          .localCheckpoint(true)
        val standing = spark.range(nKeys)
          .select(col("id").as("user_id"), col("id").as("last_event_id"),
            lit(0L).as("__ts"), lit(0.0).as("last_value"))
        def resolve(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(col("user_id"))
          .agg(max_by(
            struct(col("last_event_id"), col("__ts"), col("last_value")),
            struct(col("__ts"), col("last_event_id"))).as("__r"))
          .select(col("user_id"), col("__r.last_event_id").as("last_event_id"),
            col("__r.__ts").as("__ts"), col("__r.last_value").as("last_value"))
        // CoW sink: merge + full snapshot per batch
        val cowPath = java.nio.file.Files
          .createTempDirectory("stress_upsert_cow").toString
        operators.TableManifest.commitSnapshot(standing, cowPath)
        val tCow = (1 to 3).map { i =>
          val d = drop(i)
          val t0 = System.nanoTime()
          operators.TableManifest.commitSnapshot(
            resolve(operators.TableManifest.read(spark, cowPath)
              .unionByName(d)), cowPath)
          (System.nanoTime() - t0) / 1e9
        }
        // MoR sink: append per batch, resolve at read, compact once
        val morPath = java.nio.file.Files
          .createTempDirectory("stress_upsert_mor").toString
        operators.TableManifest.commitSnapshot(standing, morPath)
        val tMor = (1 to 3).map { i =>
          val d = drop(i)
          val t0 = System.nanoTime()
          operators.TableManifest.append(d, morPath, batchId = Some(i.toLong))
          (System.nanoTime() - t0) / 1e9
        }
        val tr0 = System.nanoTime()
        val nMor = resolve(operators.TableManifest.read(spark, morPath)).count()
        val tMorRead = (System.nanoTime() - tr0) / 1e9
        val tc0 = System.nanoTime()
        operators.TableManifest.compactBatches(spark, morPath)
        val tMorCompact = (System.nanoTime() - tc0) / 1e9
        val nCow = operators.TableManifest.read(spark, cowPath).count()
        require(nCow == nKeys && nMor == nKeys)
        println(f"""{"keys":$nKeys%d,"batch_rows":$batchRows%d,"cow_batch_seconds":[${tCow.map(t => f"$t%.1f").mkString(",")}],"mor_batch_seconds":[${tMor.map(t => f"$t%.1f").mkString(",")}],"mor_read_seconds":$tMorRead%.1f,"mor_compact_seconds":$tMorCompact%.1f}""")

      case "hybridbatch" =>
        // batched hybrid serving: ONE pass per index for a whole query
        // set. Per-query cost must FALL as the batch grows — postings
        // reads amortize over queries sharing terms, the code-table scan
        // over all query vectors. Indexes built once over the enlarged
        // corpus; batch sizes 1/8/32, each timed steady-state (second
        // call) after a warm first call.
        import spark.implicits._
        val hbd0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val hbDocs = (0 until copies).map(i =>
            hbd0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
              col("text")))
          .reduce(_ unionByName _).localCheckpoint(true)
        val hbe0 = Tables.embeddings(spark, sfDir)
        val hbEmb = (0 until copies).map { i =>
          if (i == 0) hbe0.select(col("vec_id"), col("embedding"))
          else hbe0.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
            transform(col("embedding"), (x, j) =>
              (x.cast("double") +
                (pmod(hash(col("vec_id"), j, lit(i)).cast("long"), lit(997L))
                  .cast("double") / 997.0 * 0.05 - 0.025)).cast("float"))
              .as("embedding"))
        }.reduce(_ unionByName _).localCheckpoint(true)
        val nHb = hbDocs.count()
        val sP = java.nio.file.Files.createTempDirectory("stress_hb_s").toString
        val bP = java.nio.file.Files.createTempDirectory("stress_hb_b").toString
        val hb0 = System.nanoTime()
        operators.SearchIndex.build(hbDocs, "doc_id", "text", sP)
        operators.VectorIndex.buildBinary(hbEmb, "vec_id", "embedding", bP)
        val tHbBuild = (System.nanoTime() - hb0) / 1e9
        val vocab = Seq("spark", "hash", "window", "table", "fast", "join",
          "merge", "sort", "data", "stream", "filter", "group", "key",
          "row", "agg", "scan", "batch", "query", "value", "line")
        def serve(nq: Int): Long = {
          val qset = (0 until nq).flatMap(q =>
            (0 until 3).map(j => (q.toLong, vocab((q * 3 + j) % vocab.size))))
            .toDF("query_id", "token")
          val sparse = operators.SearchIndex
            .bm25Batch(spark, sP, qset, "query_id", "token", k = 10)
          val dense = operators.VectorIndex.searchBinary(spark, bP, hbEmb, "vec_id",
            "embedding", _.filter(col("vec_id") < nq), k = 10,
            rerankWidth = 32, onePass = true)
          sparse.select(col("query_id"), col("doc_id"))
            .unionByName(dense.select(col("query_id"),
              col("neighbor_id").as("doc_id")))
            .count()
        }
        val sweep = Seq(1, 8, 32).map { nq =>
          serve(nq) // warm
          val t0 = System.nanoTime()
          val rows = serve(nq)
          val dt = (System.nanoTime() - t0) / 1e9
          f""""b$nq%d":{"rows":$rows%d,"seconds":$dt%.2f,"per_query":${dt / nq}%.3f}"""
        }.mkString(",")
        println(f"""{"docs":$nHb%d,"build_seconds":$tHbBuild%.1f,$sweep}""")

      case "hotbucket" =>
        // degenerate-bucket skew guard: a 30k flood sharing ONE 32-bit
        // half (blank-media low bits) but scattered in the other — every
        // flood row lands in the same 4 hot (band, key) buckets, so the
        // untiled join serializes ~4 × C(30k,2) popcount CHECKS on 4
        // tasks while 28 threads idle, and almost no pair passes the
        // radius (pure check cost — the worst case, since output-bound
        // floods parallelize through distinct anyway). Tiled (maxBucket)
        // the same checks spread over ⌈width/maxBucket⌉ tiles per band.
        // Identical counts asserted.
        import spark.implicits._
        val nFlood = 30000
        val flood = (0 until nFlood).map(i =>
          (i.toLong, (i * 0x9E3779B9L) & 0xFFFFFFFFL, 0x00FF00FFL))
        val tail = (0 until 50000).map(i =>
          (1000000L + i, (i * 1315423911L) & 0xFFFFFFFFL,
            (i * 2654435761L) & 0xFFFFFFFFL))
        val hb = (flood ++ tail).toDF("id", "hi", "lo").localCheckpoint(true)
        def run(mb: Int): (Long, Double) = {
          val t0 = System.nanoTime()
          val c = operators.MinHashLSH.hammingBandPairs(hb, "id", "hi", "lo",
            maxHamming = 4, bandBits = 8, maxBucket = mb).count()
          (c, (System.nanoTime() - t0) / 1e9)
        }
        run(512) // JIT/codegen warm
        val (cTiled, tTiled) = run(512)      // ~59 tiles over the flood
        val (cPlain, tPlain) = run(Int.MaxValue)
        require(cTiled == cPlain, s"tiling changed the result: $cTiled vs $cPlain")
        println(f"""{"flood":$nFlood%d,"pairs":$cTiled%d,"tiled_seconds":$tTiled%.1f,"untiled_seconds":$tPlain%.1f}""")

      case "searchindex" =>
        // persisted BM25 index vs per-batch recompute at 100k docs: the
        // recompute path re-tokenizes the WHOLE standing corpus on every
        // query batch (cost ∝ corpus text bytes), the index probe reads
        // token-pruned postings + one O(#batches) stats-artifact row set
        // (corpus stats never rescan doc-length rows). A second index at
        // 1× the corpus pins the scale claim: probe cost should be ~flat
        // as docs grow `copies`× (probe_seconds vs probe_seconds_base).
        // Steady-state probe reported separately from the first
        // (JIT-warm) call, the dedupindex discipline.
        val dsi0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val bigsi = (0 until copies).map(i =>
            dsi0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
              col("text")))
          .reduce(_ unionByName _).cache()
        val nSi = bigsi.count()
        val siTerms = Seq("spark", "hash", "window")
        val siPath = java.nio.file.Files
          .createTempDirectory("stress_sidx").toString
        val si0 = System.nanoTime()
        operators.SearchIndex.build(bigsi, "doc_id", "text", siPath)
        val tSiBuild = (System.nanoTime() - si0) / 1e9
        val si1 = System.nanoTime()
        val n1 = operators.SearchIndex.bm25(spark, siPath, siTerms, 20).count()
        val tProbeCold = (System.nanoTime() - si1) / 1e9
        val si2 = System.nanoTime()
        operators.SearchIndex.bm25(spark, siPath, siTerms, 20).count()
        val tProbeWarm = (System.nanoTime() - si2) / 1e9
        val si3 = System.nanoTime()
        val n2 = operators.SearchIndex.bm25FromDocs(bigsi, "doc_id", "text",
          siTerms, 20).count()
        val tScratch = (System.nanoTime() - si3) / 1e9
        // the 1×-corpus index: same probe, `copies`× fewer docs — a flat
        // probe_seconds/probe_seconds_base ratio is the serving claim
        val siPathB = java.nio.file.Files
          .createTempDirectory("stress_sidx_base").toString
        operators.SearchIndex.build(dsi0, "doc_id", "text", siPathB)
        operators.SearchIndex.bm25(spark, siPathB, siTerms, 20).count() // warm
        val si4 = System.nanoTime()
        operators.SearchIndex.bm25(spark, siPathB, siTerms, 20).count()
        val tProbeBase = (System.nanoTime() - si4) / 1e9
        bigsi.unpersist()
        println(f"""{"docs":$nSi%d,"build_seconds":$tSiBuild%.1f,"probe_cold_seconds":$tProbeCold%.1f,"probe_seconds":$tProbeWarm%.1f,"probe_seconds_base":$tProbeBase%.1f,"recompute_seconds":$tScratch%.1f,"rows":$n1%d,"rows_scratch":$n2%d}""")

      case "maxscore" =>
        // MaxScore-pruned vs unpruned BM25 serving on a `copies`×-replicated
        // corpus: the query mixes the rare term 'dup' (~5% df) with two
        // ~80%-df common terms, so full scoring aggregates ~1.6 rows/doc
        // while the pruned path proves the common terms non-essential and
        // aggregates only the rare term's docs × 3 terms. Identical row
        // sets asserted (the exactness contract the oracle also hashes);
        // steady-state (second-call) timings, the dedupindex discipline.
        val dms0 = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        val bigms = (0 until copies).map(i =>
            dms0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
              col("text")))
          .reduce(_ unionByName _).cache()
        val nMs = bigms.count()
        val msTerms = Seq("dup", "batch", "scan")
        val msPath = java.nio.file.Files
          .createTempDirectory("stress_maxscore").toString
        operators.SearchIndex.build(bigms, "doc_id", "text", msPath)
        bigms.unpersist()
        def msRows(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(_.toSeq.toVector).toVector
        val warmP = msRows(
          operators.SearchIndex.bm25Pruned(spark, msPath, msTerms, 20))
        val warmU = msRows(
          operators.SearchIndex.bm25(spark, msPath, msTerms, 20))
        require(warmP == warmU, "pruned serving must be exact")
        val ms1 = System.nanoTime()
        operators.SearchIndex.bm25Pruned(spark, msPath, msTerms, 20).count()
        val tPruned = (System.nanoTime() - ms1) / 1e9
        val ms2 = System.nanoTime()
        operators.SearchIndex.bm25(spark, msPath, msTerms, 20).count()
        val tFull = (System.nanoTime() - ms2) / 1e9
        // candidate volume: what actually reaches the scoring aggregate
        val idx = operators.SearchIndex.load(spark, msPath)
        val nCand = idx.filter(col("token") === "dup")
          .select(col("vec_id")).distinct().count()
        val nMatch = idx.filter(col("token").isin(msTerms: _*))
          .select(col("vec_id")).distinct().count()
        println(f"""{"docs":$nMs%d,"pruned_seconds":$tPruned%.2f,"full_seconds":$tFull%.2f,"candidate_docs":$nCand%d,"matching_docs":$nMatch%d}""")

      case "signlshindex" =>
        // persisted sign-LSH keys vs re-hash-per-batch at scale: the
        // in-memory multi-probe path recomputes every corpus bucket key
        // per query batch (a full corpus scan), the index probe reads
        // the pinned 16 B/vector key table. Same jittered corpus as
        // "multiprobe"; identical results asserted by count.
        val sle0 = Tables.embeddings(spark, sfDir)
        val bigsl = (0 until copies).map { i =>
          if (i == 0) sle0.select(col("vec_id"), col("embedding"))
          else
            sle0.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
              transform(col("embedding"), (x, j) =>
                (x.cast("double") +
                  (pmod(hash(col("vec_id"), j, lit(i)).cast("long"), lit(997L))
                    .cast("double") / 997.0 * 0.05 - 0.025)).cast("float"))
                .as("embedding"))
        }.reduce(_ unionByName _).cache()
        val nSl = bigsl.count()
        val slq = bigsl.filter(col("vec_id") < 100).localCheckpoint(true)
        val slPath = java.nio.file.Files
          .createTempDirectory("stress_signlsh").toString
        val sl0 = System.nanoTime()
        operators.VectorIndex.buildSignLsh(bigsl, "vec_id", "embedding", slPath)
        val tSlBuild = (System.nanoTime() - sl0) / 1e9
        def idxSearch() = operators.VectorIndex.searchSignLsh(spark, slPath,
          bigsl, "vec_id", "embedding", slq, k = 10, probes = 8).count()
        val nIdx = idxSearch() // warm
        val sl1 = System.nanoTime()
        idxSearch()
        val tProbe = (System.nanoTime() - sl1) / 1e9
        val sl2 = System.nanoTime()
        val nMem = operators.Knn.multiProbeSearch(bigsl, slq,
          "vec_id", "embedding", k = 10, probes = 8).count()
        val tMem = (System.nanoTime() - sl2) / 1e9
        bigsl.unpersist()
        println(f"""{"vectors":$nSl%d,"build_seconds":$tSlBuild%.1f,"probe_seconds":$tProbe%.1f,"rehash_seconds":$tMem%.1f,"rows_idx":$nIdx%d,"rows_mem":$nMem%d}""")

      case "audiofp" =>
        // the audio-modality twin of "phashauto": copies× exact-replicated
        // docs through Haitsma–Kalker fingerprinting + the derived banded
        // join at the registry's tau=16 — replica pairs are hamming-0 by
        // construction, so the floor on pairs is known and the join cost
        // at 100k is the measured number SCALE.md cites
        val dau0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val bigau = (0 until copies).map(i =>
            dau0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
              col("text")))
          .reduce(_ unionByName _).cache()
        bigau.count()
        val au0 = System.nanoTime()
        val auMedia = multimodal.Media.synthesizeCovering(bigau, "doc_id", "text")
          .as[multimodal.Media.MediaRow](
            org.apache.spark.sql.Encoders.product[multimodal.Media.MediaRow])
        val afp = multimodal.Media.audioFingerprint(
            auMedia.filter(col("kind") === "audio"))
          .toDF().localCheckpoint(true)
        val nFp = afp.count()
        val tFp = (System.nanoTime() - au0) / 1e9
        val tauAu = if (args.length > 3) args(3).toInt else 8
        val au1 = System.nanoTime()
        val derivedAu = operators.MinHashLSH.bandBitsFor(nFp, maxHamming = tauAu)
        val nPairsAu = operators.MinHashLSH.hammingBandPairs(
          afp, "media_id", "fp_hi", "fp_lo", maxHamming = tauAu).count()
        val tPairAu = (System.nanoTime() - au1) / 1e9
        bigau.unpersist()
        println(f"""{"audio_items":$nFp%d,"tau":$tauAu%d,"derived_band_bits":$derivedAu%d,"fp_seconds":$tFp%.1f,"pairs":$nPairsAu%d,"pair_seconds":$tPairAu%.1f}""")

      case "dedupindex" =>
        // the measured case FOR the persisted dedup indexes: a 100k-item
        // standing corpus (copies× replicated docs), a 5k-doc drop. Path
        // A (the seam the round closed): build the index ONCE, probe the
        // drop against the artifact. Path B (what the per-batch rebuild
        // did): re-hash the standing corpus AND band-join per drop. The
        // build cost amortizes over every future drop; the probe cost is
        // what an ingest pipeline actually pays per batch.
        val di0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val standingDocs = (0 until copies).map(i =>
            di0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
              col("text")))
          .reduce(_ unionByName _).cache()
        val nStand = standingDocs.count()
        val dropDocs = di0.select((col("doc_id") + lit(777000000L)).as("doc_id"),
          col("text")).cache()
        val nDrop = dropDocs.count()
        val idxDir = s"/tmp/graft_hidx_stress_${System.nanoTime()}"

        def phashOf(df: org.apache.spark.sql.DataFrame) =
          multimodal.Media.dHash(
            multimodal.Media.synthesizeCovering(df, "doc_id", "text")
              .as[multimodal.Media.MediaRow](
                org.apache.spark.sql.Encoders.product[multimodal.Media.MediaRow]))
            .toDF()

        // path A: one-time build, then the per-drop probe
        val tb0 = System.nanoTime()
        operators.HammingIndex.build(phashOf(standingDocs),
          "media_id", "ph_hi", "ph_lo", idxDir)
        val tBuild = (System.nanoTime() - tb0) / 1e9
        // probe twice: the first pays one-time JIT/codegen warmup, the
        // second is the steady-state per-batch cost an ingest pipeline
        // actually repeats — report both
        val tp0 = System.nanoTime()
        val nProbe = operators.HammingIndex.probe(phashOf(dropDocs),
          "media_id", "ph_hi", "ph_lo", idxDir, maxHamming = 12).count()
        val tProbeCold = (System.nanoTime() - tp0) / 1e9
        val tp1 = System.nanoTime()
        operators.HammingIndex.probe(phashOf(dropDocs),
          "media_id", "ph_hi", "ph_lo", idxDir, maxHamming = 12).count()
        val tProbe = (System.nanoTime() - tp1) / 1e9

        // path B: what every batch paid before the index — re-hash the
        // standing corpus and band-join in one go
        val tr0 = System.nanoTime()
        val nRebuild = operators.MinHashLSH.hammingBandJoin(
          phashOf(dropDocs), phashOf(standingDocs),
          "media_id", "ph_hi", "ph_lo", maxHamming = 12).count()
        val tRebuild = (System.nanoTime() - tr0) / 1e9
        standingDocs.unpersist(); dropDocs.unpersist()
        println(f"""{"standing":$nStand%d,"drop":$nDrop%d,"build_seconds":$tBuild%.1f,"probe_matches":$nProbe%d,"probe_cold_seconds":$tProbeCold%.1f,"probe_seconds":$tProbe%.1f,"rebuild_matches":$nRebuild%d,"rebuild_seconds":$tRebuild%.1f}""")

      case "mhindex" =>
        // the text twin of "dedupindex": MinHashIndex build-once vs the
        // re-shingle-per-batch path. 100k standing docs, 5k drop; the
        // rebuild path must re-run the fused signature expression over
        // the WHOLE standing corpus per batch (the cost candidatePairs
        // pays), the probe path reads the ~0.5 KB/item signature
        // artifact and shingles only the drop.
        val mi0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val standMi = (0 until copies).map(i =>
            mi0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
              col("text")))
          .reduce(_ unionByName _).cache()
        val nStandMi = standMi.count()
        val dropMi = mi0.select((col("doc_id") + lit(777000000L)).as("doc_id"),
          col("text")).cache()
        val nDropMi = dropMi.count()
        val miDir = s"/tmp/graft_mhidx_stress_${System.nanoTime()}"

        val tb1 = System.nanoTime()
        operators.MinHashIndex.build(standMi, "doc_id", "text", miDir)
        val tBuildMi = (System.nanoTime() - tb1) / 1e9
        // steady-state per-batch cost: probe twice, report the second
        val tw0 = System.nanoTime()
        val nP1 = operators.MinHashIndex.probe(dropMi, "doc_id", "text", miDir)
          .count()
        val tProbeCold2 = (System.nanoTime() - tw0) / 1e9
        val tw1 = System.nanoTime()
        operators.MinHashIndex.probe(dropMi, "doc_id", "text", miDir).count()
        val tProbeMi = (System.nanoTime() - tw1) / 1e9

        // rebuild path: shingle+sign the standing corpus AND the drop,
        // band-join — what every batch paid without the artifact
        val tr1 = System.nanoTime()
        val standSig = standMi.select(col("doc_id").as("vec_id"),
          graft.functions.MinHashSigExpr(col("text"), 64, 3).as("sig"))
          .filter(size(col("sig")) > 0)
        val dropSig = dropMi.select(col("doc_id").as("vec_id"),
          graft.functions.MinHashSigExpr(col("text"), 64, 3).as("sig"))
          .filter(size(col("sig")) > 0)
        def bkt(df: org.apache.spark.sql.DataFrame) = df
          .select(col("vec_id"), col("sig"),
            explode(sequence(lit(0), lit(15))).as("__band"))
          .withColumn("__bkey", md5(concat_ws(",", transform(
            slice(col("sig"), col("__band") * 4 + 1, lit(4)),
            x => x.cast("string")))))
          .select(col("vec_id"), col("__band"), col("__bkey"))
        val nRebuildMi = bkt(dropSig).as("a")
          .join(bkt(standSig).as("b"),
            col("a.__band") === col("b.__band") &&
              col("a.__bkey") === col("b.__bkey"))
          .select(col("a.vec_id"), col("b.vec_id")).distinct().count()
        val tRebuildMi = (System.nanoTime() - tr1) / 1e9
        standMi.unpersist(); dropMi.unpersist()
        println(f"""{"standing":$nStandMi%d,"drop":$nDropMi%d,"build_seconds":$tBuildMi%.1f,"probe_pairs":$nP1%d,"probe_cold_seconds":$tProbeCold2%.1f,"probe_seconds":$tProbeMi%.1f,"rebuild_candidates":$nRebuildMi%d,"rebuild_seconds":$tRebuildMi%.1f}""")

      case "phashq" =>
        // phash quality vs the repo's own text-near-dup truth
        // (shingle-hash Jaccard ≥ 0.5, the q_jaccard_pairs definition):
        // how much of TEXT near-dup structure does the image-modality
        // hash recover, and at what precision? Expected shape (SCALE.md):
        // precision ≈ 1, recall bounded well below 1 by translation
        // variance — insert/delete edits shift every downstream raster
        // byte, which no Hamming radius recovers.
        val docsq = Tables.documents(spark, sfDir)
        val truth = operators.MinHashLSH.jaccardPairs(
            docsq, "doc_id", "text", minJaccardPpm = 500000L)
          .select(col("id_a"), col("id_b")).cache()
        val qMedia = multimodal.Media.synthesizeCovering(docsq, "doc_id", "text")
          .as[multimodal.Media.MediaRow](
            org.apache.spark.sql.Encoders.product[multimodal.Media.MediaRow])
        val qPairs = operators.MinHashLSH.hammingBandPairs(
            multimodal.Media.dHash(qMedia).toDF().localCheckpoint(true),
            "media_id", "ph_hi", "ph_lo", maxHamming = 12)
          .select(col("id_a"), col("id_b")).cache()
        val nTruth = truth.count()
        val nPhash = qPairs.count()
        val nBoth = qPairs.join(truth, Seq("id_a", "id_b")).count()
        truth.unpersist(); qPairs.unpersist()
        println(f"""{"truth_pairs":$nTruth%d,"phash_pairs":$nPhash%d,"both":$nBoth%d,"precision_ppm":${if (nPhash == 0) 0 else nBoth * 1000000 / nPhash}%d,"recall_ppm":${if (nTruth == 0) 0 else nBoth * 1000000 / nTruth}%d}""")

      case "audiofpq" =>
        // audio-fingerprint quality vs the repo's own text-near-dup truth
        // (shingle-hash Jaccard ≥ 0.5 over the AUDIO-modality docs) — the
        // audio twin of "phashq". Expected shape: precision high, recall
        // bounded by translation variance (insert/delete edits shift the
        // energy windows), same structural story as the image hash.
        val aq = Tables.documents(spark, sfDir).filter(col("doc_id") % 3 === 1)
        val truthA = operators.MinHashLSH.jaccardPairs(
            aq, "doc_id", "text", minJaccardPpm = 500000L)
          .select(col("id_a"), col("id_b")).cache()
        val aqMedia = multimodal.Media.synthesizeCovering(aq, "doc_id", "text")
          .as[multimodal.Media.MediaRow](
            org.apache.spark.sql.Encoders.product[multimodal.Media.MediaRow])
        val tauQ = if (args.length > 3) args(3).toInt else 16
        val aPairs = operators.MinHashLSH.hammingBandPairs(
            multimodal.Media.audioFingerprint(aqMedia)
              .toDF().localCheckpoint(true),
            "media_id", "fp_hi", "fp_lo", maxHamming = tauQ)
          .select(col("id_a"), col("id_b")).cache()
        val nTruthA = truthA.count()
        val nFpA = aPairs.count()
        val nBothA = aPairs.join(truthA, Seq("id_a", "id_b")).count()
        truthA.unpersist(); aPairs.unpersist()
        println(f"""{"tau":$tauQ%d,"truth_pairs":$nTruthA%d,"audiofp_pairs":$nFpA%d,"both":$nBothA%d,"precision_ppm":${if (nFpA == 0) 0 else nBothA * 1000000 / nFpA}%d,"recall_ppm":${if (nTruthA == 0) 0 else nBothA * 1000000 / nTruthA}%d}""")

      case "zonemap" =>
        // manifest-level data skipping: an append-log table of `copies`
        // id-disjoint batches (250k rows × ~210 B payload each); a range
        // probe landing in ONE batch, zone-mapped vs the same predicate
        // as an unpruned filtered scan. The pruned probe must cost
        // ~one batch and scan ~one batch's files regardless of table
        // size — the property that holds at 100 TB where the unpruned
        // scan's listing+read grows with the table. Steady-state
        // (second run) timings; file counts from the scan metric.
        import org.apache.spark.sql.execution.FileSourceScanExec
        import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
        val batchRows = 250000L
        def batchDf(b: Long) = spark.range(batchRows)
          .select((col("id") + b * batchRows).as("id"),
            concat(lit("p"), rpad(col("id").cast("string"), 200, "x"))
              .as("payload"))
        val path = java.nio.file.Files
          .createTempDirectory("stress_zonemap").toString
        operators.TableManifest.commitSnapshot(batchDf(0L), path)
        operators.TableManifest.refreshZoneMaps(spark, path, Seq("id"))
        (1 until copies).foreach { b =>
          operators.TableManifest.append(batchDf(b.toLong), path,
            batchId = Some(b.toLong))
          operators.TableManifest.appendZoneMaps(spark, path, b.toLong,
            Seq("id"))
        }
        val probeB = copies / 2
        val (lo, hi) =
          (probeB * batchRows + 1000L, probeB * batchRows + 50000L)
        def filesOf(df: org.apache.spark.sql.DataFrame): Long = {
          val plan = df.queryExecution.executedPlan
          (plan +: plan.collect { case a: AdaptiveSparkPlanExec =>
            a.executedPlan })
            .flatMap(_.collect { case f: FileSourceScanExec => f })
            .map(_.metrics("numFiles").value).sum
        }
        // execute the frame's OWN physical plan (toRdd.count materializes
        // every column through it — count() would both build a separate
        // metadata-only plan and leave this plan's numFiles metric unset)
        def timed(mk: => org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
          mk.queryExecution.toRdd.count() // warm (listing caches, codegen)
          val t0 = System.nanoTime()
          val df = mk
          val n = df.queryExecution.toRdd.count()
          ((System.nanoTime() - t0) / 1e9, n, filesOf(df))
        }
        val (tPruned, nPruned, fPruned) = timed(
          operators.TableManifest.readRange(spark, path, Seq(("id", lo, hi))))
        val (tFull, nFull, fFull) = timed(
          operators.TableManifest.read(spark, path)
            .filter(col("id") >= lo && col("id") <= hi))
        require(nPruned == nFull && nPruned == hi - lo + 1)
        println(f"""{"batches":$copies%d,"rows":${copies * batchRows}%d,"pruned_seconds":$tPruned%.2f,"full_seconds":$tFull%.2f,"pruned_files":$fPruned%d,"full_files":$fFull%d}""")

      case "maxsim" =>
        // late-interaction MaxSim at scale: `copies`× the sf embeddings
        // (jittered clones so scores stay distinct), 8-vector docs, two
        // 3-token queries = 6 query vectors. Brute MaxSim is one narrow
        // corpus pass (|vectors| × |query tokens| cosines, broadcast
        // queries, map-side max/sum) — measured against single-vector
        // brute top-k on the same corpus to price the multi-vector
        // semantics (the ratio should track #query tokens / 1, not
        // explode). Steady-state timings, result sets asserted stable
        // across runs.
        val embMs = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"))
        val bigEmb = (0 until copies).map(i =>
            embMs.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
              transform(col("embedding"),
                x => x + lit(i.toFloat * 1e-4f)).as("embedding")))
          .reduce(_ unionByName _).cache()
        val nVec = bigEmb.count()
        val docVecs = bigEmb.select(expr("vec_id DIV 8").as("doc_id"),
          col("embedding"))
        val qVecs = embMs.filter(col("vec_id") < 6)
          .select(when(col("vec_id") < 3, lit(100L)).otherwise(lit(200L))
              .as("query_id"),
            col("vec_id").as("qt"), col("embedding"))
        def runMaxSim() = operators.Knn.maxSimTopK(docVecs, "doc_id",
          "embedding", qVecs, "query_id", "qt", "embedding", k = 10)
        runMaxSim().count() // warm
        val ms0 = System.nanoTime()
        val r1 = runMaxSim().collect().map(_.toSeq.toVector).toVector
        val tMaxSim = (System.nanoTime() - ms0) / 1e9
        require(r1 == runMaxSim().collect().map(_.toSeq.toVector).toVector)
        // single-vector brute top-k baseline on the same corpus
        val ms1 = System.nanoTime()
        operators.Knn.bruteTopKPartitioned(bigEmb,
          bigEmb.filter(col("vec_id") < 2), "vec_id", "embedding",
          k = 10).count()
        val tSingle = (System.nanoTime() - ms1) / 1e9
        bigEmb.unpersist()
        println(f"""{"vectors":$nVec%d,"docs":${nVec / 8}%d,"maxsim_seconds":$tMaxSim%.2f,"single_vector_brute_seconds":$tSingle%.2f,"query_tokens":6}""")

      case "maxsimhd" =>
        // the HIGH-DIM regime coarse MaxSim exists for: 512-d vectors
        // (8× the fixture's 64-d tiled, directionally jittered per
        // clone), codes from a 64-d projection column (the JL-then-code
        // recipe — at 768–4096 production dims codes must stay 64-bit),
        // exact 512-d rerank on candidates only. Brute pays the full
        // 512-d cosine over the corpus × 6 tokens.
        val embHd0 = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"))
        val bigHd = (0 until copies).map(i =>
            embHd0.select(
              (col("vec_id") + lit(i * 10000000L)).as("vec_id"),
              transform(flatten(array_repeat(col("embedding"), 8)),
                (x, j) => x + lit(i.toFloat * 1e-4f) *
                  (j.cast("float") - lit(255.5f)) / lit(256f))
                .as("embedding")))
          .reduce(_ unionByName _)
          .withColumn("proj", slice(col("embedding"), 1, 64))
          .cache()
        val nHd = bigHd.count()
        val dvHd = bigHd.select(col("vec_id"),
          expr("vec_id DIV 8").as("doc_id"), col("embedding"), col("proj"))
        val qvHd = bigHd.filter(col("vec_id") < 6)
          .select(when(col("vec_id") < 3, lit(100L)).otherwise(lit(200L))
              .as("query_id"),
            col("vec_id").as("qt"), col("embedding"), col("proj"))
        def topHd(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(r => (r.getLong(0), r.getLong(1)))
            .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val hd0 = System.nanoTime()
        val bruteHd = topHd(operators.Knn.maxSimTopK(dvHd, "doc_id",
          "embedding", qvHd, "query_id", "qt", "embedding", k = 10))
        val tBruteHd = (System.nanoTime() - hd0) / 1e9
        // the quantizer + code table build ONCE (a standing index's
        // build-time cost, reported separately); probes are the sweep
        val hdB = System.nanoTime()
        val thrHd = operators.BinaryQuant.fitThresholdsApprox(dvHd,
          "proj", 100).localCheckpoint(true)
        val codesHd = operators.BinaryQuant.withCode(
            dvHd.select(col("vec_id"), col("doc_id"), col("proj")),
            "proj", thrHd)
          .select(col("vec_id"), col("doc_id"), col("code"))
          .localCheckpoint(true)
        val tBuildHd = (System.nanoTime() - hdB) / 1e9
        val ptsHd = Seq(64, 256, 1024).map { r =>
          val t0 = System.nanoTime()
          val c = topHd(operators.Knn.maxSimTopKCoarse(dvHd, "vec_id",
            "doc_id", "embedding", qvHd, "query_id", "qt", "embedding",
            k = 10, rPerToken = r, thresholds = Some(thrHd),
            projCols = Some(("proj", "proj")), codes = Some(codesHd)))
          val dt = (System.nanoTime() - t0) / 1e9
          val recall = bruteHd.keys.toSeq.map { q =>
            c.getOrElse(q, Set.empty[Long]).intersect(bruteHd(q)).size
              .toDouble / bruteHd(q).size
          }.sum / bruteHd.size
          f""""r$r":{"seconds":$dt%.2f,"recall":$recall%.3f}"""
        }
        bigHd.unpersist()
        println(f"""{"vectors":$nHd%d,"dims":512,"brute_seconds":$tBruteHd%.2f,"build_seconds":$tBuildHd%.2f,${ptsHd.mkString(",")}}""")

      case "maxsimcoarse" =>
        // two-stage MaxSim at scale: per-token binary-code candidates →
        // exact rerank, vs the brute one-pass, recall@10 and seconds at
        // `copies`× the sf embeddings. The claim: wall-clock decouples
        // from corpus size (the full-precision pass touches ≤ tokens·r
        // candidate docs) at measured recall.
        val embMc = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"))
        // DIRECTIONAL jitter (per-dim, clone-dependent): a constant
        // shift leaves cosine ties everywhere (scores floor to identical
        // ppm and the top-k cut becomes a doc_id lottery recall can't
        // measure); varying the direction makes scores distinct
        val bigMc = (0 until copies).map(i =>
            embMc.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
              transform(col("embedding"),
                (x, j) => x + lit(i.toFloat * 1e-4f) *
                  (j.cast("float") - lit(31.5f)) / lit(32f))
                .as("embedding")))
          .reduce(_ unionByName _).cache()
        val nMc = bigMc.count()
        val dv = bigMc.select(col("vec_id"),
          expr("vec_id DIV 8").as("doc_id"), col("embedding"))
        val qv = embMc.filter(col("vec_id") < 6)
          .select(when(col("vec_id") < 3, lit(100L)).otherwise(lit(200L))
              .as("query_id"),
            col("vec_id").as("qt"), col("embedding"))
        def top(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(r => (r.getLong(0), r.getLong(1)))
            .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val mc0 = System.nanoTime()
        val bruteT = top(operators.Knn.maxSimTopK(dv, "doc_id",
          "embedding", qv, "query_id", "qt", "embedding", k = 10))
        val tBrute = (System.nanoTime() - mc0) / 1e9
        // the quantizer fits ONCE (build-time; the never-refit serving
        // contract) — probes are what the sweep times
        val thrMc = operators.BinaryQuant.fitThresholdsApprox(dv,
          "embedding", 100).localCheckpoint(true)
        val rs = Seq(64, 256, 1024)
        val pts = rs.map { r =>
          val t0 = System.nanoTime()
          val c = top(operators.Knn.maxSimTopKCoarse(dv, "vec_id",
            "doc_id", "embedding", qv, "query_id", "qt", "embedding",
            k = 10, rPerToken = r, thresholds = Some(thrMc)))
          val dt = (System.nanoTime() - t0) / 1e9
          val recall = bruteT.keys.toSeq.map { q =>
            c.getOrElse(q, Set.empty).intersect(bruteT(q)).size.toDouble /
              bruteT(q).size
          }.sum / bruteT.size
          f""""r$r":{"seconds":$dt%.2f,"recall":$recall%.3f}"""
        }
        bigMc.unpersist()
        println(f"""{"vectors":$nMc%d,"brute_seconds":$tBrute%.2f,${pts.mkString(",")}}""")

      case "optimize" =>
        // OPTIMIZE payoff on a single interleaved snapshot: `copies`×250k
        // rows land round-robin (every batch spans the whole id range —
        // zone maps prove nothing), then optimize(id) rewrites into
        // range-disjoint batch dirs and the SAME probe reads ~one bucket.
        // Steady-state timings + files touched from the scan metric.
        import org.apache.spark.sql.execution.FileSourceScanExec
        import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
        val nOpt = copies * 250000L
        val optDf = spark.range(nOpt)
          .select(col("id"),
            concat(lit("p"), rpad(col("id").cast("string"), 200, "x"))
              .as("payload"))
        val optPath = java.nio.file.Files
          .createTempDirectory("stress_optimize").toString
        operators.TableManifest.commitSnapshot(
          optDf.repartition(copies, col("id") % copies), optPath)
        operators.TableManifest.refreshZoneMaps(spark, optPath, Seq("id"))
        val (oLo, oHi) = (nOpt / 2 + 1000L, nOpt / 2 + 50000L)
        def optFiles(df: org.apache.spark.sql.DataFrame): Long = {
          val plan = df.queryExecution.executedPlan
          (plan +: plan.collect { case a: AdaptiveSparkPlanExec =>
            a.executedPlan })
            .flatMap(_.collect { case f: FileSourceScanExec => f })
            .map(_.metrics("numFiles").value).sum
        }
        def optTimed(mk: => org.apache.spark.sql.DataFrame)
            : (Double, Long, Long) = {
          mk.queryExecution.toRdd.count() // warm
          val t0 = System.nanoTime()
          val df = mk
          val n = df.queryExecution.toRdd.count()
          ((System.nanoTime() - t0) / 1e9, n, optFiles(df))
        }
        def optProbe() = operators.TableManifest.readRange(spark, optPath,
          Seq(("id", oLo, oHi)))
        val (tShuf, nShuf, fShuf) = optTimed(optProbe())
        val t0Opt = System.nanoTime()
        operators.TableManifest.optimize(spark, optPath, Seq("id"),
          files = copies, statsCols = Seq("id"))
        val tRewrite = (System.nanoTime() - t0Opt) / 1e9
        val (tOpt, nOptRows, fOpt) = optTimed(optProbe())
        require(nShuf == nOptRows && nShuf == oHi - oLo + 1)
        println(f"""{"rows":$nOpt%d,"probe_shuffled_seconds":$tShuf%.2f,"probe_optimized_seconds":$tOpt%.2f,"rewrite_seconds":$tRewrite%.1f,"files_shuffled":$fShuf%d,"files_optimized":$fOpt%d}""")

      case "mordelete" =>
        // DELETE cost vs table volume: the MoR predicate-tombstone DELETE
        // must stay FLAT as non-matching volume grows 10× (one O(1)
        // segment commit, match-count- and table-size-independent), and a
        // no-match DELETE must cost the same near-zero — measured against
        // the old copy-on-write shape (rewrite the filtered snapshot),
        // which pays the full table both times. Read-back after the MoR
        // delete verifies the mask is exact at both scales.
        def morTable(rows: Long): String = {
          val p = java.nio.file.Files
            .createTempDirectory(s"stress_mordel_$rows").toString
          operators.TableManifest.commitSnapshot(
            spark.range(rows).select(col("id"),
              concat(lit("p"), rpad(col("id").cast("string"), 200, "x"))
                .as("payload")), p)
          p
        }
        def secs(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        val rowsSmall = copies * 100000L
        val rowsBig = rowsSmall * 10L
        val (pS, pB) = (morTable(rowsSmall), morTable(rowsBig))
        // MoR: one predicate segment, whatever the volume
        val tMorS = secs(
          operators.TableManifest.deleteWhere(spark, pS, "id % 1000 = 7"))
        val tMorB = secs(
          operators.TableManifest.deleteWhere(spark, pB, "id % 1000 = 7"))
        val tNoMatch = secs(
          operators.TableManifest.deleteWhere(spark, pB, "id < 0"))
        val nS = operators.TableManifest.read(spark, pS).count()
        val nB = operators.TableManifest.read(spark, pB).count()
        require(nS == rowsSmall - rowsSmall / 1000L &&
          nB == rowsBig - rowsBig / 1000L,
          s"MoR mask wrong: $nS/$nB")
        // the old CoW shape for contrast: full filtered rewrite
        def cowDelete(p: String, pred: String): Double = secs {
          operators.TableManifest.commitSnapshot(
            operators.TableManifest.read(spark, p)
              .filter(!coalesce(expr(pred), lit(false))), p)
          ()
        }
        val tCowS = cowDelete(pS, "id % 1000 = 13")
        val tCowB = cowDelete(pB, "id % 1000 = 13")
        println(f"""{"rows_small":$rowsSmall%d,"rows_big":$rowsBig%d,"mor_small_seconds":$tMorS%.2f,"mor_big_seconds":$tMorB%.2f,"mor_nomatch_seconds":$tNoMatch%.2f,"cow_small_seconds":$tCowS%.2f,"cow_big_seconds":$tCowB%.2f}""")

      case "morupdate" =>
        // UPDATE cost vs table volume, the mordelete mirror for the MoR
        // UPDATE: cost = one scan + a write of the MATCHED rows + an
        // O(1) tombstone segment — so with a FIXED-size match (1000
        // rows) the matched-write is constant and only the scan grows as
        // non-matching volume grows 10×, vs the CoW shape that re-writes
        // the FULL table both times. A no-match UPDATE pays just the
        // discovery scan (zero commits). Read-back verifies the SET at
        // both scales, and the pending-update read overhead is measured
        // before/after maintain folds the replacement batch.
        def morUpdTable(rows: Long): String = {
          val p = java.nio.file.Files
            .createTempDirectory(s"stress_morupd_$rows").toString
          operators.TableManifest.commitSnapshot(
            spark.range(rows).select(col("id"),
              (col("id") % 97).cast("double").as("v"),
              concat(lit("p"), rpad(col("id").cast("string"), 200, "x"))
                .as("payload")), p)
          p
        }
        def updSecs(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        val updRowsSmall = copies * 100000L
        val updRowsBig = updRowsSmall * 10L
        val (upS, upB) = (morUpdTable(updRowsSmall), morUpdTable(updRowsBig))
        val fixedMatch = "id >= 500 AND id < 1500" // 1000 rows, any volume
        val setExprs = Seq("v" -> "v + 1000.0",
          "payload" -> "concat('u', payload)")
        // warm codegen/commit paths on a throwaway table so the first
        // TIMED update doesn't carry one-time JIT cost
        val upWarm = morUpdTable(1000L)
        operators.TableManifest.updateWhere(spark, upWarm, fixedMatch,
          setExprs)
        val tUpdS = updSecs(
          operators.TableManifest.updateWhere(spark, upS, fixedMatch,
            setExprs))
        val tUpdB = updSecs(
          operators.TableManifest.updateWhere(spark, upB, fixedMatch,
            setExprs))
        val tUpdNoMatch = updSecs(
          operators.TableManifest.updateWhere(spark, upB, "id < 0",
            setExprs))
        val updatedS = operators.TableManifest.read(spark, upS)
          .filter(col("payload").startsWith("u") && col("v") >= 1000.0)
          .count()
        val updatedB = operators.TableManifest.read(spark, upB)
          .filter(col("payload").startsWith("u") && col("v") >= 1000.0)
          .count()
        require(updatedS == 1000L && updatedB == 1000L &&
          operators.TableManifest.read(spark, upS).count() == updRowsSmall &&
          operators.TableManifest.read(spark, upB).count() == updRowsBig,
          s"MoR update wrong: $updatedS/$updatedB")
        // pending-update read tax, then maintain folds it away
        val tReadPending = updSecs {
          operators.TableManifest.read(spark, upB).count(); ()
        }
        val tMaintain = updSecs {
          operators.TableManifest.maintain(spark, upB, maxDeletes = 1)
            .collect(); ()
        }
        val tReadFolded = updSecs {
          operators.TableManifest.read(spark, upB).count(); ()
        }
        // the CoW shape for contrast: full CASE-WHEN rewrite of the table
        def cowUpdate(p: String): Double = updSecs {
          operators.TableManifest.commitSnapshot(
            operators.TableManifest.read(spark, p)
              .withColumn("v", when(expr(fixedMatch), col("v") + 1000.0)
                .otherwise(col("v"))), p)
          ()
        }
        val tCowUS = cowUpdate(upS)
        val tCowUB = cowUpdate(upB)
        println(f"""{"rows_small":$updRowsSmall%d,"rows_big":$updRowsBig%d,"matched_rows":1000,"mor_small_seconds":$tUpdS%.2f,"mor_big_seconds":$tUpdB%.2f,"mor_nomatch_seconds":$tUpdNoMatch%.2f,"read_pending_seconds":$tReadPending%.2f,"maintain_seconds":$tMaintain%.2f,"read_folded_seconds":$tReadFolded%.2f,"cow_small_seconds":$tCowUS%.2f,"cow_big_seconds":$tCowUB%.2f}""")

      case "mormerge" =>
        // MERGE cost vs table volume — the morupdate mirror for the MoR
        // MERGE path (equality tombstone + update-keyspace replacement
        // batch, one marker): with a FIXED 1000-row source (500 matched
        // updates + 500 inserts), the acted-on write is constant and
        // only the discovery scan grows across 1×/10×/40× non-matching
        // volume, while the CoW mergeInto shape re-writes the FULL
        // table and grows unbounded — the last CoW-proportional
        // mutation path, now priced against its replacement.
        import operators.TableManifest
        import operators.TableManifest.{MergeInsert, MergeMatched}
        def mrgTable(rows: Long): String = {
          val p = java.nio.file.Files
            .createTempDirectory(s"stress_mormrg_$rows").toString
          TableManifest.commitSnapshot(
            spark.range(rows).select(col("id"),
              (col("id") % 97).cast("double").as("v"),
              concat(lit("p"), rpad(col("id").cast("string"), 200, "x"))
                .as("payload")), p)
          p
        }
        def mrgSecs(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        val r1 = copies * 50000L
        val (r10, r40) = (r1 * 10L, r1 * 40L)
        val ps = Seq(r1, r10, r40).map(mrgTable)
        // fixed source: keys 500..999 match (UPDATE SET v = v + s.delta),
        // negative keys never match (INSERT) — constant acted-on volume
        def mrgSource = spark.range(500L, 1500L).select(
          when(col("id") < 1000, col("id"))
            .otherwise(-col("id")).as("id"),
          lit(0.5).as("delta"))
        val matchedCl = Seq(MergeMatched("update", None,
          Some(Seq("v" -> "__t.v + __s.delta",
            "payload" -> "concat('m', __t.payload)"))))
        val insertCl = Seq(MergeInsert(None,
          Some(Seq("id" -> "__s.id", "v" -> "__s.delta"))))
        def runMerge(p: String): Double = mrgSecs {
          TableManifest.mergeWhere(spark, p, mrgSource, Seq("id"),
            matchedCl, insertCl)
          ()
        }
        // warm codegen/commit paths on a throwaway table first
        runMerge(mrgTable(2000L))
        val Seq(t1, t10, t40) = ps.map(runMerge)
        // correctness at every scale: 500 updated, 500 inserted, volume
        // otherwise unchanged
        ps.zip(Seq(r1, r10, r40)).foreach { case (p, n) =>
          val live = TableManifest.read(spark, p)
          val updated = live
            .filter(col("payload").startsWith("m")).count()
          val inserted = live.filter(col("id") < 0).count()
          require(updated == 500L && inserted == 500L &&
            live.count() == n + 500L,
            s"MoR merge wrong at $n rows: $updated/$inserted")
        }
        // the CoW shape for contrast on the same three volumes
        def cowMerge(p: String): Double = mrgSecs {
          TableManifest.mergeInto(spark, p,
            mrgSource.select(col("id"), col("delta").as("v"),
              lit("cow").as("payload")),
            Seq("id"), Seq("v"))
          ()
        }
        val Seq(c1, c10, c40) = ps.map(cowMerge)
        println(f"""{"rows_1x":$r1%d,"rows_10x":$r10%d,"rows_40x":$r40%d,"source_rows":1000,"mor_1x_seconds":$t1%.2f,"mor_10x_seconds":$t10%.2f,"mor_40x_seconds":$t40%.2f,"cow_1x_seconds":$c1%.2f,"cow_10x_seconds":$c10%.2f,"cow_40x_seconds":$c40%.2f}""")

      case "constraints" =>
        // CHECK-constraint write overhead: enforcement is an inline
        // assert_true predicate riding the write's own scan, so an
        // append into a table with 0, 1, and 4 enforced constraints
        // should cost the SAME wall-clock (plus two tiny listing RPCs
        // to read the constraints_v artifact). This measures exactly
        // that — the SCALE.md "zero extra passes" claim as a number —
        // and proves a violating batch aborts without committing.
        import operators.TableManifest
        import operators.TableManifest.TableConstraint
        def consSecs(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        val consRows = copies * 1000000L
        val batch = spark.range(consRows).select(col("id"),
          (col("id") % 97).cast("double").as("v"),
          concat(lit("p"), rpad(col("id").cast("string"), 120, "x"))
            .as("payload"))
        val consP = java.nio.file.Files
          .createTempDirectory("stress_cons").toString
        TableManifest.commitSnapshot(batch.limit(10), consP)
        // warm the append path once
        TableManifest.append(batch.limit(10), consP)
        val t0c = consSecs { TableManifest.append(batch, consP); () }
        TableManifest.setConstraints(spark, consP, Seq(
          TableConstraint("id_nonneg", "id >= 0", true, false, "VALID")))
        val t1c = consSecs { TableManifest.append(batch, consP); () }
        TableManifest.setConstraints(spark, consP, Seq(
          TableConstraint("id_nonneg", "id >= 0", true, false, "VALID"),
          TableConstraint("v_range", "v >= 0 AND v < 97", true, false,
            "VALID"),
          TableConstraint("pay_prefix", "payload LIKE 'p%'", true, false,
            "VALID"),
          TableConstraint("pay_len", "length(payload) >= 120", true,
            false, "VALID")))
        val t4c = consSecs { TableManifest.append(batch, consP); () }
        val nBefore = TableManifest.read(spark, consP).count()
        val violated =
          try { TableManifest.append(
            batch.withColumn("v", lit(-1.0)), consP); false }
          catch { case scala.util.control.NonFatal(_) => true }
        val nAfter = TableManifest.read(spark, consP).count()
        require(violated && nAfter == nBefore,
          s"violating append must abort without committing " +
            s"($violated, $nBefore -> $nAfter)")
        println(f"""{"rows_per_append":$consRows%d,"append_0_constraints_seconds":$t0c%.2f,"append_1_constraint_seconds":$t1c%.2f,"append_4_constraints_seconds":$t4c%.2f,"violating_append_aborted":true,"rows_unchanged_after_abort":true}""")

      case "mordepth" =>
        // the pending-mutation read tax, measured: a retention sweep
        // issues N MoR DELETEs without a maintain — every read then
        // evaluates an O(N)-branch mask chain. Reads timed at depth 0 /
        // N/2 / N, then after maintain folds the chain; the depth guard
        // (spark.graft.table.pendingMutationsWarn) pages before the
        // chain gets deep, and this arm prices what it pages about.
        val depthN = 25 * copies.toInt // each delete's own commit pays
        // an O(depth) analysis read, so the sweep itself is O(N²) plan
        // nodes — exactly the growth this arm prices; keep N runnable
        val dpPath = java.nio.file.Files
          .createTempDirectory("stress_mordepth").toString
        operators.TableManifest.commitSnapshot(
          spark.range(copies * 500000L).select(col("id"),
            (col("id") % 97).cast("double").as("v")), dpPath)
        def dpSecs(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        def dpRead(): Double = {
          // median of 3: read cost is the quantity under test
          val ts = (1 to 3).map(_ => dpSecs {
            operators.TableManifest.read(spark, dpPath).count(); () })
          ts.sorted.apply(1)
        }
        spark.conf.set("spark.graft.table.pendingMutationsWarn",
          (depthN * 2).toString) // measure the chain, not the pager
        val tRead0 = dpRead()
        (1 to depthN / 2).foreach(i =>
          operators.TableManifest.deleteWhere(spark, dpPath,
            s"id = ${i * 13}"))
        val tReadHalf = dpRead()
        (depthN / 2 + 1 to depthN).foreach(i =>
          operators.TableManifest.deleteWhere(spark, dpPath,
            s"id = ${i * 13}"))
        val tReadFull = dpRead()
        val tFold = dpSecs {
          operators.TableManifest.maintain(spark, dpPath, maxDeletes = 1)
            .collect(); ()
        }
        val tReadAfter = dpRead()
        spark.conf.unset("spark.graft.table.pendingMutationsWarn")
        require(operators.TableManifest.read(spark, dpPath).count() ==
          copies * 500000L - depthN, "depth-chain masking went wrong")
        println(f"""{"rows":${copies * 500000L}%d,"segments":$depthN%d,"read_depth0_seconds":$tRead0%.2f,"read_depth${depthN / 2}%d_seconds":$tReadHalf%.2f,"read_depth$depthN%d_seconds":$tReadFull%.2f,"maintain_seconds":$tFold%.2f,"read_after_fold_seconds":$tReadAfter%.2f}""")

      case "bloomrefresh" =>
        // Bloom artifact BUILD at an append-log's true batch count: the
        // refresh aggregates per-batch filters on the executors and
        // writes them from there — the driver never holds a blob, so its
        // cost is O(1) regardless of batch count (the old path collected
        // every serialized filter: O(#batches × ~12 KB at 10k keys, MBs
        // at 1M keys/batch). Runs the same refresh at 256 and 1024
        // batches: executor-resident artifact bytes grow 4×, driver
        // bytes stay 0, and a post-refresh point probe stays exact.
        def refreshLayout(nB: Int, perB: Long): String = {
          val p = java.nio.file.Files
            .createTempDirectory(s"stress_bref_$nB").toString
          operators.TableManifest.commitSnapshot(
            spark.range(0).select(col("id"),
              col("id").cast("string").as("payload")), p)
          spark.range(nB * perB)
            .select(col("id"),
              concat(lit("p"), rpad(col("id").cast("string"), 60, "x"))
                .as("payload"),
              (col("id") % nB).as("__batch"))
            .write.partitionBy("__batch").mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(s"$p/data_v0")
          operators.TableManifest.append(
            spark.range(nB * perB - perB, nB * perB)
              .select(col("id"),
                concat(lit("p"), rpad(col("id").cast("string"), 60, "x"))
                  .as("payload")),
            p, batchId = Some(nB - 1L))
          p
        }
        def brSecs(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        def brBytes(p: String): Long = new org.apache.hadoop.fs.Path(
            s"$p/bloomstats_v0")
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getContentSummary(new org.apache.hadoop.fs.Path(
            s"$p/bloomstats_v0")).getLength
        val perB = 10000L
        val pSmallB = refreshLayout(256, perB)
        val pBigB = refreshLayout(1024, perB)
        val tRefS = brSecs(operators.TableManifest.refreshBloomFilters(
          spark, pSmallB, Seq("id"), expectedPerBatch = perB))
        val tRefB = brSecs(operators.TableManifest.refreshBloomFilters(
          spark, pBigB, Seq("id"), expectedPerBatch = perB))
        val probeKey = 513L * 1024L + 513L
        val hit = operators.TableManifest.readPoint(spark, pBigB, "id",
          Seq(probeKey)).count()
        require(hit == 1L, s"post-refresh probe wrong: $hit")
        println(f"""{"per_batch":$perB%d,"batches_small":256,"batches_big":1024,"refresh_small_seconds":$tRefS%.2f,"refresh_big_seconds":$tRefB%.2f,"artifact_bytes_small":${brBytes(pSmallB)}%d,"artifact_bytes_big":${brBytes(pBigB)}%d,"driver_blob_bytes":0}""")

      case "bloomprobe" =>
        // Bloom point-probe at an append-log's true batch count: 1024
        // batches × 10k keys. The might-contain decision runs in
        // EXECUTORS over the bloomstats rows and only (batch, hit) pairs
        // reach the driver — O(#batches × 9 B) — where the old plan
        // collected every serialized filter blob (the artifact's full
        // bytes) through the driver heap PER PROBE. Reports both byte
        // figures plus measured probe times and the files actually read.
        import org.apache.spark.sql.execution.FileSourceScanExec
        import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
        val nBatches = 1024
        val perBatch = 10000L
        val bpPath = java.nio.file.Files
          .createTempDirectory("stress_bloomprobe").toString
        // seed the manifest, then bulk-load the batch layout in ONE
        // partitioned write (the layout a year of keyed appends leaves —
        // writing 1024 separate append commits would measure commit
        // latency, not probe cost), and publish the watermark with a real
        // keyed append of the last batch
        operators.TableManifest.commitSnapshot(
          spark.range(0).select(col("id"),
            col("id").cast("string").as("payload")), bpPath)
        spark.range(nBatches * perBatch)
          .select(col("id"),
            concat(lit("p"), rpad(col("id").cast("string"), 60, "x"))
              .as("payload"),
            (col("id") % nBatches).as("__batch"))
          .write.partitionBy("__batch").mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(s"$bpPath/data_v0")
        operators.TableManifest.append(
          spark.range(nBatches * perBatch - perBatch,
              nBatches * perBatch)
            .select(col("id"),
              concat(lit("p"), rpad(col("id").cast("string"), 60, "x"))
                .as("payload")),
          bpPath, batchId = Some(nBatches - 1L))
        operators.TableManifest.refreshBloomFilters(spark, bpPath,
          Seq("id"), expectedPerBatch = perBatch)
        val artifactBytes = new org.apache.hadoop.fs.Path(
            s"$bpPath/bloomstats_v0")
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getContentSummary(new org.apache.hadoop.fs.Path(
            s"$bpPath/bloomstats_v0")).getLength
        def bpFiles(df: org.apache.spark.sql.DataFrame): Long = {
          val plan = df.queryExecution.executedPlan
          (plan +: plan.collect { case a: AdaptiveSparkPlanExec =>
            a.executedPlan })
            .flatMap(_.collect { case f: FileSourceScanExec => f })
            .map(_.metrics("numFiles").value).sum
        }
        def bpTimed(mk: => org.apache.spark.sql.DataFrame)
            : (Double, Long, Long) = {
          mk.queryExecution.toRdd.count() // warm listing caches + codegen
          val t0 = System.nanoTime()
          val df = mk
          val n = df.queryExecution.toRdd.count()
          ((System.nanoTime() - t0) / 1e9, n, bpFiles(df))
        }
        // a key that lives in exactly one batch (id = batch + k·1024)
        val probeKey = 513L * nBatches + 513L
        val (tPoint, nPoint, fPoint) = bpTimed(
          operators.TableManifest.readPoint(spark, bpPath, "id",
            Seq(probeKey)))
        val (tScan, nScan, fScan) = bpTimed(
          operators.TableManifest.read(spark, bpPath)
            .filter(col("id") === probeKey))
        require(nPoint == 1L && nScan == 1L, s"probe wrong: $nPoint/$nScan")
        val driverBytesNow = nBatches * 9L
        println(f"""{"batches":$nBatches%d,"rows":${nBatches * perBatch}%d,"probe_seconds":$tPoint%.2f,"fullscan_seconds":$tScan%.2f,"probe_files":$fPoint%d,"fullscan_files":$fScan%d,"artifact_bytes_old_driver_cost":$artifactBytes%d,"driver_bytes_now":$driverBytesNow%d}""")

      case "connector" =>
        // format("graft") vs the library API on the SAME table: (a) the
        // V1-bridge row-path tax on a full-scan aggregate (the connector
        // pays one extra per-row projection under RowDataSourceScanExec —
        // measured, not guessed), (b) pushed range and point predicates
        // must reach the SAME zone-map/Bloom pruning the library paths
        // use (files-read equality is the proof the planning surface
        // loses nothing). 256 batches × 40k rows, zone maps on id,
        // Blooms on id.
        import org.apache.spark.sql.execution.FileSourceScanExec
        import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
        val nBatches = 256
        val perBatch = 40000L
        val cPath = java.nio.file.Files
          .createTempDirectory("stress_connector").toString
        operators.TableManifest.commitSnapshot(
          spark.range(0).select(col("id"),
            col("id").cast("string").as("payload")), cPath)
        spark.range(nBatches * perBatch)
          .select(col("id"),
            concat(lit("p"), rpad(col("id").cast("string"), 60, "x"))
              .as("payload"),
            (col("id") / perBatch).cast("long").as("__batch"))
          .write.partitionBy("__batch").mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(s"$cPath/data_v0")
        // publish the watermark with a real keyed append of the LAST
        // batch — its ids are the same contiguous tail, so the dynamic
        // overwrite of its own partition is content-idempotent
        operators.TableManifest.append(
          spark.range(nBatches * perBatch - perBatch, nBatches * perBatch)
            .select(col("id"),
              concat(lit("p"), rpad(col("id").cast("string"), 60, "x"))
                .as("payload")),
          cPath, batchId = Some(nBatches - 1L))
        operators.TableManifest.refreshZoneMaps(spark, cPath, Seq("id"))
        operators.TableManifest.refreshBloomFilters(spark, cPath, Seq("id"),
          expectedPerBatch = perBatch)
        def cFiles(df: org.apache.spark.sql.DataFrame): Long = {
          df.queryExecution.toRdd.count() // metrics exist only post-run
          val plan = df.queryExecution.executedPlan
          (plan +: plan.collect { case a: AdaptiveSparkPlanExec =>
            a.executedPlan })
            .flatMap(_.collect { case f: FileSourceScanExec => f })
            .map(_.metrics("numFiles").value).sum
        }
        def cTimed(mk: => org.apache.spark.sql.DataFrame): (Double, Long) = {
          mk.queryExecution.toRdd.count() // warm codegen + listings
          val t0 = System.nanoTime()
          val n = mk.queryExecution.toRdd.count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        def conn = spark.read.format("graft").load(cPath)
        def lib = operators.TableManifest.read(spark, cPath)
        // the CREATE TABLE deployment shape: schema from the catalog, so
        // the per-query footer/listing inference is skipped
        val cSchema = lib.schema
        def connS = spark.read.format("graft").schema(cSchema).load(cPath)
        // (a) full-scan aggregate: the row-path tax
        val (tLibScan, _) = cTimed(lib.agg(sum(col("id"))))
        val (tConnScan, _) = cTimed(conn.agg(sum(col("id"))))
        val (tConnScanS, _) = cTimed(connS.agg(sum(col("id"))))
        // (b) range probe landing inside ONE batch (batches are
        // id-contiguous): both surfaces must prune to the same files
        val lo = nBatches * perBatch - perBatch
        val hi = lo + 999L
        val (tLibRange, nLibR) = cTimed(
          operators.TableManifest.readRange(spark, cPath,
            Seq(("id", lo, hi))))
        val (tConnRange, nConnR) = cTimed(
          connS.filter(col("id") >= lo && col("id") <= hi))
        require(nLibR == 1000L && nConnR == 1000L,
          s"range probe wrong: $nLibR/$nConnR")
        val fLibRange = cFiles(operators.TableManifest.readRange(spark,
          cPath, Seq(("id", lo, hi))))
        val fConnRange = cFiles(sources.GraftTableSource.plan(spark, cPath,
          None, None,
          Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("id", lo),
            org.apache.spark.sql.sources.LessThanOrEqual("id", hi)), None))
        // (c) point probe through the Bloom path, both surfaces
        val key = lo + 123L
        val (tLibPoint, nLibP) = cTimed(
          operators.TableManifest.readPoint(spark, cPath, "id", Seq(key)))
        val (tConnPoint, nConnP) = cTimed(connS.filter(col("id") === key))
        require(nLibP == 1L && nConnP == 1L, s"point probe wrong: $nLibP/$nConnP")
        println(f"""{"rows":${nBatches * perBatch}%d,"batches":$nBatches%d,"lib_scan_seconds":$tLibScan%.2f,"conn_scan_seconds":$tConnScan%.2f,"conn_scan_schema_seconds":$tConnScanS%.2f,"lib_range_seconds":$tLibRange%.2f,"conn_range_seconds":$tConnRange%.2f,"lib_range_files":$fLibRange%d,"conn_range_files":$fConnRange%d,"lib_point_seconds":$tLibPoint%.2f,"conn_point_seconds":$tConnPoint%.2f}""")

      case "streamsource" =>
        // the streaming source's scale claim, measured: a tail stream's
        // per-micro-batch cost must track the DROP, not the standing
        // table — readStream.format("graft") over a 32-batch table and
        // over a 256-batch table (8×), tailing from current
        // (startingVersion), one identical 20k-row append each; the
        // follow-batch wall-clock must be ~equal. The initial-snapshot
        // path (cost ∝ table, by design) is reported for contrast.
        def ssTable(batches: Int): String = {
          val p = java.nio.file.Files
            .createTempDirectory(s"stress_ss_$batches").toString
          operators.TableManifest.commitSnapshot(
            spark.range(0).select(col("id"),
              col("id").cast("string").as("payload")), p)
          spark.range(batches * 40000L)
            .select(col("id"),
              concat(lit("p"), rpad(col("id").cast("string"), 60, "x"))
                .as("payload"),
              (col("id") / 40000L).cast("long").as("__batch"))
            .write.partitionBy("__batch").mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(s"$p/data_v0")
          operators.TableManifest.append(
            spark.range(batches * 40000L - 40000L, batches * 40000L)
              .select(col("id"),
                concat(lit("p"), rpad(col("id").cast("string"), 60, "x"))
                  .as("payload")),
            p, batchId = Some(batches - 1L))
          p
        }
        def tailFollow(p: String): (Double, Double, Long) = {
          val cur = operators.TableManifest.versions(spark, p).last
          val name = s"ss_${java.util.UUID.randomUUID.toString.take(8)}"
          val q = spark.readStream.format("graft")
            .option("startingVersion", cur.toString).load(p)
            .writeStream.format("memory").queryName(name).start()
          try {
            q.processAllAvailable() // warm the stream machinery
            val t0 = System.nanoTime()
            operators.TableManifest.append(
              spark.range(20000).select((col("id") + 900000000L).as("id"),
                col("id").cast("string").as("payload")), p)
            q.processAllAvailable()
            val tFollow = (System.nanoTime() - t0) / 1e9
            val n = spark.table(name).count()
            // contrast: a fresh FULL stream (snapshot batch ∝ table)
            val name2 = s"ssf_${java.util.UUID.randomUUID.toString.take(8)}"
            val t1 = System.nanoTime()
            val q2 = spark.readStream.format("graft").load(p)
              .writeStream.format("memory").queryName(name2).start()
            try q2.processAllAvailable() finally q2.stop()
            val tSnap = (System.nanoTime() - t1) / 1e9
            (tFollow, tSnap, n)
          } finally q.stop()
        }
        val pSmall = ssTable(32)
        val pBig = ssTable(256)
        val (fS, sS, nS) = tailFollow(pSmall)
        val (fB, sB, nB) = tailFollow(pBig)
        require(nS == 20000L && nB == 20000L, s"tail served $nS/$nB")
        println(f"""{"batches_small":32,"batches_big":256,"follow_small_seconds":$fS%.2f,"follow_big_seconds":$fB%.2f,"snapshot_small_seconds":$sS%.2f,"snapshot_big_seconds":$sB%.2f}""")

      case "cc" =>
        // one path graph of copies×100k nodes: diameter = n-1, the case
        // where min-label propagation needs O(n) rounds and the
        // large-star/small-star contraction stays O(log² n)
        val n = copies * 100000L
        val edges = spark.range(n - 1)
          .select(col("id").as("a"), (col("id") + 1).as("b")).cache()
        edges.count()
        val t0 = System.nanoTime()
        val comp = operators.Components.connectedComponentsStar(edges, "a", "b")
        val labeled = comp.count()
        val roots = comp.select(col("cluster_id")).distinct().count()
        val dt = (System.nanoTime() - t0) / 1e9
        edges.unpersist()
        println(f"""{"nodes":$n%d,"diameter":${n - 1}%d,"labeled":$labeled%d,"components":$roots%d,"seconds":$dt%.1f}""")

      case "incrcc" =>
        // incremental component maintenance vs full recompute: copies×1M
        // nodes in 10-node star clusters (the near-dup cluster shape),
        // then a 10k-node drop where each new node bridges two random
        // standing clusters (worst case: every drop edge is a merge).
        // The incremental path must cost ~the drop, the full path ~the
        // corpus; both must agree on the final labeling signature.
        val nBase = copies * 1000000L
        val baseEdges = spark.range(nBase)
          .filter(col("id") % 10 =!= 0)
          .select(col("id").as("id_a"), (col("id") - col("id") % 10).as("id_b"))
          .localCheckpoint(true)
        val i0 = System.nanoTime()
        val standingCc = operators.Components.connectedComponents(
          baseEdges, "id_a", "id_b").localCheckpoint(true)
        val tStand = (System.nanoTime() - i0) / 1e9
        // 10k new nodes, each bridging two hash-random standing clusters
        val dropEdges = spark.range(10000)
          .select((col("id") + nBase).as("nid"),
            (pmod(hash(col("id"), lit(1)).cast("long"), lit(nBase))).as("t1"),
            (pmod(hash(col("id"), lit(2)).cast("long"), lit(nBase))).as("t2"))
          .select(col("nid"), explode(array(col("t1"), col("t2"))).as("tgt"))
          .select(col("nid").as("id_a"), col("tgt").as("id_b"))
          .localCheckpoint(true)
        val i1 = System.nanoTime()
        val incr = operators.Components.incrementalComponents(
          standingCc, dropEdges).localCheckpoint(true)
        val nIncr = incr.count()
        val tIncr = (System.nanoTime() - i1) / 1e9
        val i2 = System.nanoTime()
        val full = operators.Components.connectedComponents(
          baseEdges.unionByName(dropEdges), "id_a", "id_b", maxIter = 40)
          .localCheckpoint(true)
        val nFull = full.count()
        val tFull = (System.nanoTime() - i2) / 1e9
        val sigIncr = incr.agg(sum(hash(col("id"), col("cluster_id"))
          .cast("long"))).head().getLong(0)
        val sigFull = full.agg(sum(hash(col("id"), col("cluster_id"))
          .cast("long"))).head().getLong(0)
        println(f"""{"nodes":$nBase%d,"drop_nodes":10000,"standing_seconds":$tStand%.1f,"incremental_seconds":$tIncr%.1f,"full_seconds":$tFull%.1f,"rows_incr":$nIncr%d,"rows_full":$nFull%d,"signatures_equal":${sigIncr == sigFull}%b}""")

      case "manifestscale" =>
        // read PLANNING cost vs committed-version count — the manifest
        // checkpoint's claim as a number. A busy table (a streaming
        // Update-mode sink commits one marker per micro-batch)
        // accumulates thousands of markers between vacuums; without the
        // checkpoint, the read path's marker log opens EVERY marker
        // body — O(#versions) per read — while with it reads pay one
        // checkpoint read plus the checkpoint→head tail. Marker files
        // for the bulk are written directly (byte-identical to what
        // commits produce — this arm prices READS, not commits); the
        // same tiny payload serves at every depth, so only manifest
        // resolution varies.
        import operators.TableManifest
        def msBody(p: String): String = {
          // the seed snapshot's own marker body, copied verbatim: the
          // fake markers are byte-identical to real commits', just with
          // an append kind (a zero-row append's shape)
          val f = new org.apache.hadoop.fs.Path(p)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val in = f.open(new org.apache.hadoop.fs.Path(s"$p/manifest/v0"))
          val b = try scala.io.Source.fromInputStream(in).mkString.trim
          finally in.close()
          b.replace("kind=snapshot", "kind=append")
        }
        def msTable(nVersions: Int): String = {
          val p = java.nio.file.Files
            .createTempDirectory(s"stress_ms_$nVersions").toString
          TableManifest.commitSnapshot(
            spark.range(100000L).select(col("id"),
              (col("id") % 97).cast("double").as("v")), p)
          val f = new org.apache.hadoop.fs.Path(p)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val body = msBody(p)
          (1 to nVersions).foreach { v =>
            val out = f.create(
              new org.apache.hadoop.fs.Path(s"$p/manifest/v$v"), true)
            try out.writeBytes(body) finally out.close()
          }
          p
        }
        def msSecs(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        def msRead(p: String): Double = {
          val ts = (1 to 3).map(_ => msSecs {
            require(TableManifest.read(spark, p).count() == 100000L)
          })
          ts.sorted.apply(1)
        }
        def msCkpts(p: String): Seq[org.apache.hadoop.fs.Path] = {
          val f = new org.apache.hadoop.fs.Path(p)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          f.listStatus(new org.apache.hadoop.fs.Path(s"$p/manifest"))
            .map(_.getPath).filter(_.getName.startsWith("ckpt_v")).toSeq
        }
        val (nSmall, nLarge) = (1000, 50000)
        val (pS, pL) = (msTable(nSmall), msTable(nLarge))
        // no checkpoint on disk yet: the linear baseline
        val noCkptS = msRead(pS)
        val noCkptL = msRead(pL)
        // one checkpoint at the head: the flat path
        TableManifest.checkpointManifest(spark, pS)
        TableManifest.checkpointManifest(spark, pL)
        val ckptS = msRead(pS)
        val ckptL = msRead(pL)
        // a STALE checkpoint (100 newer markers after it) pays only the
        // tail — the steady state between interval-triggered rewrites
        val fL = new org.apache.hadoop.fs.Path(pL)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bodyL = msBody(pL)
        (nLarge + 1 to nLarge + 100).foreach { v =>
          val out = fL.create(
            new org.apache.hadoop.fs.Path(s"$pL/manifest/v$v"), true)
          try out.writeBytes(bodyL) finally out.close()
        }
        val staleL = msRead(pL)
        require(msCkpts(pL).nonEmpty, "checkpoint file missing")
        // COMMIT latency at 50k versions: each append's CAS loop asks
        // currentVersion — pointer+probe (fastHead) vs the full
        // manifest listing is the difference between flat and
        // O(#versions) commits on a long-lived table; and the
        // coordinated CommitStore (the object-store conditional-write
        // seam) must price in at noise level on top.
        def msAppend(p: String): Double = {
          val ts = (1 to 3).map(_ => msSecs {
            TableManifest.append(
              spark.range(2).select(col("id"),
                lit(0.5).as("v")), p)
          })
          ts.sorted.apply(1)
        }
        val appendCkptL = msAppend(pL) // pointer present: fast head
        spark.conf.set("spark.graft.commit.store", "coordinated")
        val appendCoordL =
          try msAppend(pL)
          finally spark.conf.unset("spark.graft.commit.store")
        // strip pointer + fence → commits fall back to full listings
        fL.delete(new org.apache.hadoop.fs.Path(
          s"$pL/manifest/_last_ckpt"), false)
        val appendListL = msAppend(pL)
        println(f"""{"versions_small":$nSmall%d,"versions_large":$nLarge%d,"read_nockpt_small_seconds":$noCkptS%.2f,"read_nockpt_large_seconds":$noCkptL%.2f,"read_ckpt_small_seconds":$ckptS%.2f,"read_ckpt_large_seconds":$ckptL%.2f,"read_stale_ckpt_tail100_seconds":$staleL%.2f,"append_50k_fasthead_seconds":$appendCkptL%.2f,"append_50k_coordinated_seconds":$appendCoordL%.2f,"append_50k_listing_seconds":$appendListL%.2f}""")

      case "commitstore" =>
        // the commit seam, PRICED: (a) the raw primitive — marker
        // placements through rename vs coordinated-local vs
        // coordinated-JDBC (Derby embedded standing in for the shared
        // RDBMS a multi-driver S3 deployment points at); (b) the
        // protocol — full TableManifest.append latency under each
        // store. The coordination cost must be noise next to data
        // movement for the conditional-write path to be the honest
        // default on object stores.
        import operators._
        val csBody = "wm=1\nuwm=-1\nkind=append"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        def csRawPerOpMs(store: CommitStore, n: Int): Double = {
          val d = java.nio.file.Files
            .createTempDirectory(s"stress_cs_${store.name}").toString
          val f = new org.apache.hadoop.fs.Path(d)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          f.mkdirs(new org.apache.hadoop.fs.Path(s"$d/manifest"))
          val t0 = System.nanoTime()
          (1 to n).foreach { v =>
            require(store.putIfAbsent(f,
              new org.apache.hadoop.fs.Path(s"$d/manifest/v$v"), csBody))
          }
          (System.nanoTime() - t0) / 1e6 / n
        }
        def csTable(): String = {
          val p = java.nio.file.Files
            .createTempDirectory("stress_cs_tbl").toString
          TableManifest.commitSnapshot(
            spark.range(100000L).select(col("id"),
              (col("id") % 97).cast("double").as("v")), p)
          p
        }
        def csMedAppend(p: String): Double = {
          val ts = (1 to 5).map { _ =>
            val t0 = System.nanoTime()
            TableManifest.append(
              spark.range(2).select(col("id"), lit(0.5).as("v")), p)
            (System.nanoTime() - t0) / 1e9
          }
          ts.sorted.apply(2)
        }
        val jdbcUrl = "jdbc:derby:memory:stress_cs;create=true"
        val rawN = 500
        val rawRename = csRawPerOpMs(RenameCommitStore, rawN)
        val rawLocal =
          csRawPerOpMs(new CoordinatedCommitStore(), rawN)
        val rawJdbc = csRawPerOpMs(new CoordinatedCommitStore(
          coordinator = new JdbcCommitCoordinator(jdbcUrl)), rawN)
        val appRename = csMedAppend(csTable())
        spark.conf.set("spark.graft.commit.store", "coordinated")
        val appLocal = try csMedAppend(csTable())
          finally spark.conf.unset("spark.graft.commit.store")
        spark.conf.set("spark.graft.commit.store", "coordinated")
        spark.conf.set("spark.graft.commit.coordinator", "jdbc")
        spark.conf.set("spark.graft.commit.jdbc.url", jdbcUrl)
        val appJdbc =
          try csMedAppend(csTable())
          finally {
            spark.conf.unset("spark.graft.commit.store")
            spark.conf.unset("spark.graft.commit.coordinator")
            spark.conf.unset("spark.graft.commit.jdbc.url")
          }
        println(f"""{"raw_ops":$rawN%d,"raw_rename_ms_per_op":$rawRename%.3f,"raw_coordinated_local_ms_per_op":$rawLocal%.3f,"raw_coordinated_jdbc_ms_per_op":$rawJdbc%.3f,"append_rename_seconds":$appRename%.3f,"append_coordinated_local_seconds":$appLocal%.3f,"append_coordinated_jdbc_seconds":$appJdbc%.3f}""")

      case "mergecontention" =>
        // MERGE liveness under hot append traffic: a free-running
        // appender commits small DISJOINT-key appends while a MERGE
        // runs. The slide path re-targets the claim over proven-disjoint
        // appends instead of re-deriving, so commit latency stays near
        // the quiet baseline instead of burning the attempt cap — the
        // starvation envelope the round-13 verdict asked to measure.
        import operators.TableManifest
        import operators.TableManifest.{MergeInsert, MergeMatched}
        val mcRows = copies * 100000L
        def mcTable(): String = {
          val p = java.nio.file.Files
            .createTempDirectory("stress_mc").toString
          TableManifest.commitSnapshot(
            spark.range(mcRows).select(col("id"),
              (col("id") % 97).cast("double").as("v")), p)
          p
        }
        def mcSecs(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        def mcSource = spark.range(500L, 1500L).select(
          when(col("id") < 1000, col("id"))
            .otherwise(-col("id")).as("id"), lit(0.5).as("delta"))
        def runMerge(p: String): Double = mcSecs {
          TableManifest.mergeWhere(spark, p, mcSource, Seq("id"),
            Seq(MergeMatched("update", None,
              Some(Seq("v" -> "__t.v + __s.delta")))),
            Seq(MergeInsert(None,
              Some(Seq("id" -> "__s.id", "v" -> "__s.delta")))))
          ()
        }
        runMerge(mcTable()) // warm codegen/commit paths
        val quietP = mcTable()
        val tQuiet = runMerge(quietP)
        val hotP = mcTable()
        val appended = new java.util.concurrent.atomic.AtomicLong(0L)
        val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
        val appender = new Thread(() => {
          var i = 0L
          while (!stop.get()) {
            TableManifest.append(
              spark.range(2L).select(
                (col("id") + 10000000L + i * 10L).as("id"),
                lit(7.0).as("v")), hotP)
            appended.incrementAndGet()
            i += 1
          }
        })
        appender.start()
        Thread.sleep(300) // let the appender reach steady state
        val tHot = runMerge(hotP)
        stop.set(true); appender.join(60000)
        val live = TableManifest.read(spark, hotP)
        require(live.filter(col("id") < 0).count() == 500L &&
          live.filter(col("id") >= 10000000L).count() ==
            appended.get() * 2L &&
          live.count() == mcRows + 500L + appended.get() * 2L,
          "merge-under-append lost rows or effects")
        println(f"""{"rows":$mcRows%d,"merge_quiet_seconds":$tQuiet%.2f,"merge_under_appends_seconds":$tHot%.2f,"appends_during_run":${appended.get()}%d}""")

      case "sinkmaintain" =>
        // the 24/7 Update-mode sink's steady state: each micro-batch is
        // one mergeWhere upsert (exactly what GraftSink commits), so an
        // unattended stream accrues one tombstone + replacement batch
        // per emission. 60 batches driven twice — maintenance OFF (the
        // chain grows unbounded: merge i itself pays the i-deep chain,
        // so the drive is O(N²) — which is the point) vs IN-BAND every
        // 10 batches (the sink's maintainEvery path: fold past
        // thresholds + retention vacuum) — with the served table's read
        // latency sampled every 20 batches. Done-criterion shape: the
        // maintained curve stays flat, the version count stays bounded,
        // content identical.
        import operators.TableManifest
        import operators.TableManifest.{MergeInsert, MergeMatched}
        val smBatches = 60
        val smKeys = copies * 1000L
        def smEmission(i: Int) = spark.range(smKeys / 10).select(
          ((col("id") * 7 + i) % smKeys).as("id"),
          (col("id") % 97 + i).cast("double").as("v"))
        def smSecs(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        def smRead(p: String): Double = {
          val ts = (1 to 3).map(_ => smSecs {
            TableManifest.read(spark, p).count(); () })
          ts.sorted.apply(1)
        }
        def smDrive(maintainEvery: Int): (String, Seq[(Int, Double)]) = {
          val p = java.nio.file.Files
            .createTempDirectory(s"stress_sm_$maintainEvery").toString
          TableManifest.createEmpty(spark, p,
            smEmission(0).schema)
          val samples = scala.collection.mutable
            .ArrayBuffer.empty[(Int, Double)]
          (1 to smBatches).foreach { i =>
            TableManifest.mergeWhere(spark, p, smEmission(i), Seq("id"),
              matched = Seq(MergeMatched("update", None)),
              inserts = Seq(MergeInsert(None)), nullSafeKeys = true)
            if (maintainEvery > 0 && i % maintainEvery == 0)
              TableManifest.maintain(spark, p, maxBatches = 16,
                maxDeletes = 8, keepVersions = 2, retainMs = 1L)
                .collect()
            if (i % 20 == 0) samples += ((i, smRead(p)))
          }
          (p, samples.toSeq)
        }
        val (pOff, offCurve) = smDrive(0)
        val (pOn, onCurve) = smDrive(10)
        def smState(p: String) = TableManifest.read(spark, p)
          .agg(count(lit(1)), sum(hash(col("id"), col("v")).cast("long")))
          .head()
        val (sOff, sOn) = (smState(pOff), smState(pOn))
        require(sOff.getLong(0) == sOn.getLong(0) &&
          sOff.getLong(1) == sOn.getLong(1),
          "maintained and unmaintained sinks must serve identical content")
        val vOff = TableManifest.versions(spark, pOff).size
        val vOn = TableManifest.versions(spark, pOn).size
        def curveJson(c: Seq[(Int, Double)]): String =
          c.map { case (i, t) => f""""$i%d":$t%.2f""" }.mkString("{", ",", "}")
        println(f"""{"batches":$smBatches%d,"keys":$smKeys%d,"read_secs_unmaintained":${curveJson(offCurve)}%s,"read_secs_maintained":${curveJson(onCurve)}%s,"versions_unmaintained":$vOff%d,"versions_maintained":$vOn%d,"content_identical":true}""")

      case "kll" =>
        // copies×1M skewed doubles in 30 "days": build per-partition
        // partials, merge, then verify the p50/p99 rank bound exactly
        val rows = spark.range(copies * 1000000L)
          .select(pmod(col("id"), lit(30L)).cast("string").as("d"),
            // abs over BIGINT: abs(hash()) on INT hits ANSI overflow at
            // Int.MinValue (~1% odds somewhere in a 20M-row run)
            (expr("abs(cast(hash(id) as bigint))").cast("double") *
              expr("abs(cast(hash(id, 1) as bigint))").cast("double")).as("v"))
          .cache()
        val nRows = rows.count()
        val t0 = System.nanoTime()
        val daily = operators.Sketches.kllMergeByKey(
          operators.Sketches.kllPartials(rows, "d", "v", 200), "d", 200)
        val acc = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
        daily.select(col("kll")).collect().foreach(r =>
          acc.merge(operators.Sketches.kllFromBytes(r.getAs[Array[Byte]](0))))
        val dt = (System.nanoTime() - t0) / 1e9
        val est50 = acc.getQuantile(0.5,
          org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
        val est99 = acc.getQuantile(0.99,
          org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
        val r = rows.agg(
          (sum(when(col("v") <= est50, 1L).otherwise(0L)) / count(lit(1))).as("r50"),
          (sum(when(col("v") <= est99, 1L).otherwise(0L)) / count(lit(1))).as("r99")).head()
        rows.unpersist()
        println(f"""{"rows":$nRows%d,"sketch_n":${acc.getN}%d,"rank_of_p50_est":${r.getDouble(0)}%.4f,"rank_of_p99_est":${r.getDouble(1)}%.4f,"seconds":$dt%.1f}""")

      case _ =>
        val docs0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val big = (0 until copies).map(i =>
            docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
          .reduce(_ unionByName _).cache()
        val n = big.count()
        val t0 = System.nanoTime()
        val pairs = operators.MinHashLSH.candidatePairs(
          big, "doc_id", "text", k = 64, bands = 16, minEstPpm = 500000L)
        val np = pairs.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"docs":$n%d,"candidate_pairs":$np%d,"seconds":$dt%.1f}""")
    }
    spark.stop()
  }
}
