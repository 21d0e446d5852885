package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupKnnSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"

  test("LSH candidates recover every exact-Jaccard>=0.8 near-dup pair") {
    val docs = Tables.documents(spark, sf)
    val exact = MinHashLSH.jaccardPairs(docs, "doc_id", "text", 800000L)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = MinHashLSH.candidatePairs(docs, "doc_id", "text",
        k = 64, bands = 16, minEstPpm = 500000L)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(exact.subsetOf(lsh),
      s"LSH missed ${exact.diff(lsh)}")
  }

  test("fast (xxhash64) LSH also recovers the planted near-dup pairs") {
    val docs = Tables.documents(spark, sf)
    val exact = MinHashLSH.jaccardPairs(docs, "doc_id", "text", 800000L)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = MinHashLSH.candidatePairs(docs, "doc_id", "text",
        k = 64, bands = 16, minEstPpm = 500000L,
        shingleFn = c => graft.functions.Text.shingleHashesWith(
          c, 3, graft.functions.Text.fastHash))
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(fast), s"fast LSH missed ${exact.diff(fast)}")
  }

  test("fused native minhash signature is bit-identical to explode+min-aggs") {
    import graft.functions.{MinHashSigExpr, Text}
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val k = 64
    val fused = docs
      .select(col("doc_id"), MinHashSigExpr(col("text"), k, 3).as("sig"))
      .filter(size(col("sig")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = docs
      .select(col("doc_id"), explode(Text.shingleHashes(col("text"), 3)).as("h"))
      .groupBy(col("doc_id"))
      .agg(array((0 until k).map(i =>
        min(pmod(pmod(col("h"), lit(Text.P)) * (2 * i + 3) + 7 * i + 1,
          lit(Text.P)))): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused.keySet == agg.keySet)
    fused.foreach { case (id, s) => assert(s == agg(id), s"doc $id") }
  }

  test("sign-bucket LSH: deterministic buckets, NN bounded by brute top-1") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
      .withColumn("bucket", Knn.signBucket(col("embedding"), 64, 6))
      .cache()
    val b1 = emb.select("vec_id", "bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b2 = Tables.embeddings(spark, sf)
      .withColumn("bucket", Knn.signBucket(col("embedding"), 64, 6))
      .select("vec_id", "bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(b1 == b2, "bucketing must be deterministic")
    assert(b1.values.forall(b => b >= 0 && b < 64), "6 planes → bucket in [0, 64)")

    val lshNN = Knn.nnWithinBucket(emb, "vec_id", "embedding", "bucket")
      .select("vec_id", "nn_sim_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val bruteTop1 = Knn.bruteTopK(
        Tables.embeddings(spark, sf), Tables.embeddings(spark, sf),
        "vec_id", "embedding", k = 1)
      .select("query_id", "sim_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lshNN.nonEmpty)
    // within-bucket NN can never beat the global brute-force top-1
    lshNN.foreach { case (id, sim) => assert(sim <= bruteTop1(id)) }
  }

  test("brute top-k: k rows per query, descending sim, self excluded") {
    val emb = Tables.embeddings(spark, sf)
    val out = Knn.bruteTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 4).cache()
    assert(out.count() == 12)
    assert(out.filter(col("query_id") === col("neighbor_id")).isEmpty)
    val perQuery = out.orderBy("query_id", "rank")
      .collect().groupBy(_.getLong(0))
    perQuery.values.foreach { rows =>
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("sim_ppm"))
      assert(sims.sameElements(sims.sorted.reverse), "ranks follow sim desc")
    }
  }

  test("one-pass brute top-k equals the declarative join form") {
    val emb = Tables.embeddings(spark, sf).repartition(5)
    val queries = emb.filter(col("vec_id") < 20)
    val declarative = Knn.bruteTopK(emb, queries, "vec_id", "embedding", k = 5)
    val onePass = Knn.bruteTopKPartitioned(
      emb, queries, "vec_id", "embedding", k = 5)
    assert(onePass.collect().toSet == declarative.collect().toSet)
  }

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val sim = df.select(Knn.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("native sign-bucket expression is bit-identical to the Column tree") {
    val emb = Tables.embeddings(spark, sf)
    // 17 planes also exercises the regime where the Column tree (17×64
    // nodes) falls out of codegen but the native loop does not
    for (planes <- Seq(6, 17)) {
      val both = emb.select(
        Knn.signBucket(col("embedding"), 64, planes).as("native"),
        Knn.signBucketHof(col("embedding"), 64, planes).as("hof"))
      assert(both.filter(col("native") =!= col("hof")).isEmpty,
        s"mismatch at planes=$planes")
    }
  }

  test("planesFor grows log2 with corpus size and clamps") {
    assert(Knn.planesFor(500, 8) == 6)   // the driver's verify corpus
    assert(Knn.planesFor(10, 8) == 4)    // lower clamp
    assert(Knn.planesFor(1L << 40, 8) == 24) // upper clamp
    assert(Knn.planesFor(16000, 8) == 11)
    // expected bucket width stays ~constant: n / 2^planes ≈ targetBucket
    for (n <- Seq(1000L, 100000L, 10000000L)) {
      val width = n.toDouble / (1L << Knn.planesFor(n, 8))
      assert(width <= 8.0 && width > 2.0, s"n=$n width=$width")
    }
  }

  test("bucket width cap: capped NN never beats uncapped (search subset)") {
    val emb = Tables.embeddings(spark, sf)
      .withColumn("bucket", Knn.signBucket(col("embedding"), 64, 2)) // 4 wide buckets
      .cache()
    val uncapped = Knn.nnWithinBucket(emb, "vec_id", "embedding", "bucket")
      .select("vec_id", "nn_sim_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val capped = Knn.nnWithinBucket(emb, "vec_id", "embedding", "bucket",
        maxBucket = 8)
      .select("vec_id", "nn_sim_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(capped.nonEmpty)
    capped.foreach { case (id, sim) => assert(sim <= uncapped(id)) }
    emb.unpersist()
  }

  test("multi-table LSH near-dup: precision 1.0, recall >= 0.7 vs brute") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val brute = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", Knn.cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("sim") >= 0.45)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Knn.neardupPairs(emb, "vec_id", "embedding",
        minSimPpm = 450000L, k = 3, tables = 8)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture should contain near-dup embeddings")
    // exact verification on candidates → no false positives, ever
    assert(lsh.subsetOf(brute), s"false positives: ${lsh.diff(brute)}")
    assert(lsh.size >= math.ceil(0.7 * brute.size),
      s"recall ${lsh.size}/${brute.size} below 0.7")
  }

  test("multi-probe sign-LSH: recall rises monotonically with probes") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 20)
    val truth = Knn.bruteTopK(emb, queries, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // fix planes so the probe sweep is stable regardless of corpus count
    val planes = 6
    def recall(probes: Int): Double = {
      val got = Knn.multiProbeSearch(emb, queries, "vec_id", "embedding",
          k = 3, probes = probes, planesOverride = planes)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val r1 = recall(1); val r4 = recall(4); val r16 = recall(16)
    info(f"multi-probe recall@3: probes=1 $r1%.3f, 4 $r4%.3f, 16 $r16%.3f")
    assert(r1 <= r4 && r4 <= r16,
      s"recall must not drop as probes grow: $r1 -> $r4 -> $r16")
    assert(r4 > r1,
      s"probing low-margin subsets must lift recall here: $r1 -> $r4")
    assert(r16 >= 2 * r1,
      s"the full 4-plane perturbation window should at least double " +
        s"single-probe recall on this fixture: $r1 -> $r16")
    // empty corpus: every query answers with zero neighbors, no crash
    // (the derive-from-count n=0 lesson)
    assert(Knn.multiProbeSearch(emb.filter(col("vec_id") < 0), queries,
      "vec_id", "embedding", k = 3, probes = 4).count() == 0)
  }

  test("label centroid arrays reassemble from the exploded (label,pos,c) rows") {
    val emb = Tables.embeddings(spark, sf)
    val exploded = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(floor(col("v") * 1e6).cast("long")).as("sv"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        (col("sv").cast("double") / col("n") / 1e6).as("c"))
      .collect().map(r => (r.get(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val arrays = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(floor(col("v") * 1e6).cast("long")).as("sv"), count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(
        struct(col("pos"), (col("sv").cast("double") / col("n") / 1e6).as("c")))),
        x => x("c")).as("centroid"))
      .collect().map(r => r.get(0) -> r.getSeq[Double](1)).toMap
    assert(arrays.nonEmpty)
    arrays.foreach { case (label, centroid) =>
      centroid.zipWithIndex.foreach { case (c, pos) =>
        assert(c == exploded((label, pos)), s"label=$label pos=$pos")
      }
    }
  }

  test("IVF search: results are brute-force restricted to probed lists") {
    val emb = Tables.embeddings(spark, sf).cache()
    val queries = emb.filter(col("vec_id") < 5)
    val ivf = Knn.ivfSearch(emb, queries, "vec_id", "embedding", "label",
        k = 3, nProbe = 3)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getLong(2))).toSeq)
      .toMap
    // model: for each query, rank ALL corpus vectors, keep those whose
    // label is among the query's nProbe nearest centroid lists, take top-3
    val cents = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(floor(col("v") * 1e6).cast("long")).as("sv"), count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(
        struct(col("pos"), (col("sv").cast("double") / col("n") / 1e6).as("c")))),
        x => x("c")).as("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val na = math.sqrt(a.foldLeft(0.0)((acc, v) => acc + v * v))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, v) => acc + v * v))
      d / (na * nb)
    }
    val corpus = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toSeq,
      r.getInt(r.fieldIndex("label"))))
    val qs = corpus.filter(_._1 < 5)
    assert(ivf.keySet == qs.map(_._1).toSet)
    qs.foreach { case (qid, qv, _) =>
      val probed = cents.toSeq
        .map { case (l, c) => (l, cos(qv, c)) }
        .sortBy { case (l, s) => (-s, l) }.take(3).map(_._1).toSet
      val expect = corpus
        .filter { case (id, _, l) => id != qid && probed(l) }
        .map { case (id, v, _) => (id, cos(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(3)
        .map { case (id, s) => (id, math.floor(s * 1e6).toLong) }.toSeq
      // compare ids and ppm sims (model recomputes the same fold order)
      assert(ivf(qid) == expect, s"query $qid")
    }
    emb.unpersist()
  }

  test("IVF-PQ search: k ranked rows per query, neighbors confined to probed lists") {
    val emb = Tables.embeddings(spark, sf).cache()
    val queries = emb.filter(col("vec_id") < 5)
    val rows = PQ.ivfPqSearch(emb, queries, "vec_id", "embedding", "label",
        k = 3, nProbe = 2, subspaces = 8, subDim = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length), s"query $qid ranks")
      assert(sorted.length <= 3 && sorted.nonEmpty, s"query $qid row count")
      // adist ascending with rank, ties broken by neighbor id
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 < b._3 || (a._3 == b._3 && a._2 < b._2)
        case _ => true
      }, s"query $qid ordering")
    }
    // probed lists per query, replayed driver-side with the same exact
    // integer-sum centroids and L2² probe ranking
    val cents = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(floor(col("v") * 1e6).cast("long")).as("sv"), count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(
        struct(col("pos"), (col("sv").cast("double") / col("n") / 1e6).as("c")))),
        x => x("c")).as("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val corpus = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toSeq,
      r.getInt(r.fieldIndex("label")))).toSeq
    val labelOf = corpus.map(t => t._1 -> t._3).toMap
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) =>
        acc + (a(i) - b(i)) * (a(i) - b(i)))
    corpus.filter(_._1 < 5).foreach { case (qid, qv, _) =>
      val probed = cents.toSeq.map { case (l, c) => (l, l2(qv, c)) }
        .sortBy { case (l, d) => (d, l) }.take(2).map(_._1).toSet
      byQ(qid).foreach { case (_, nid, _, _) =>
        assert(probed(labelOf(nid)),
          s"query $qid neighbor $nid outside probed lists $probed")
      }
    }
    emb.unpersist()
  }

  test("coarse MaxSim: candidates are the only approximation — recall " +
    "vs brute measured, generous widths recover the exact top-k") {
    val emb = Tables.embeddings(spark, sf)
    val docVecs = emb.select(col("vec_id"),
      expr("vec_id DIV 8").as("doc_id"), col("embedding"))
    val qVecs = emb.filter(col("vec_id") < 6)
      .select(when(col("vec_id") < 3, lit(100L)).otherwise(lit(200L))
          .as("query_id"),
        col("vec_id").as("qt"), col("embedding"))
    def ranked(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = ranked(Knn.maxSimTopK(docVecs, "doc_id", "embedding",
      qVecs, "query_id", "qt", "embedding", k = 10))
    // a generous per-token width recovers the exact result set (500
    // vectors → r=250 candidates/token over 63 docs covers everything)
    val wide = ranked(Knn.maxSimTopKCoarse(docVecs, "vec_id", "doc_id",
      "embedding", qVecs, "query_id", "qt", "embedding", k = 10,
      rPerToken = 250))
    assert(wide == brute, "generous coarse widths must be exact")
    // a tight width trades recall but must stay a valid subset-ranking:
    // measured, not asserted blindly — recall ≥ 0.5 at r=32 on this
    // fixture (63 docs, 8 vecs each)
    val tight = ranked(Knn.maxSimTopKCoarse(docVecs, "vec_id", "doc_id",
      "embedding", qVecs, "query_id", "qt", "embedding", k = 10,
      rPerToken = 32))
    val recall = brute.keys.toSeq.map { q =>
      tight.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble /
        brute(q).size
    }.sum / brute.size
    assert(recall >= 0.5, s"coarse recall collapsed: $recall")
  }

  test("coarse MaxSim serving seams: standing codes and projections " +
    "change nothing but the cost") {
    val emb = Tables.embeddings(spark, sf)
    val docVecs = emb.select(col("vec_id"),
      expr("vec_id DIV 8").as("doc_id"), col("embedding"))
    val qVecs = emb.filter(col("vec_id") < 6)
      .select(when(col("vec_id") < 3, lit(100L)).otherwise(lit(200L))
          .as("query_id"),
        col("vec_id").as("qt"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(_.toSeq.toVector).toVector
    val inline = rows(Knn.maxSimTopKCoarse(docVecs, "vec_id", "doc_id",
      "embedding", qVecs, "query_id", "qt", "embedding", k = 10,
      rPerToken = 24))
    // the standing-index seam: the same thresholds + a precomputed code
    // table must serve byte-identical results
    val thr = BinaryQuant.fitThresholds(docVecs, "embedding")
      .localCheckpoint(true)
    val codes = BinaryQuant.withCode(
        docVecs.select(col("vec_id"), col("doc_id"), col("embedding")),
        "embedding", thr)
      .select(col("vec_id"), col("doc_id"), col("code"))
      .localCheckpoint(true)
    val standing = rows(Knn.maxSimTopKCoarse(docVecs, "vec_id", "doc_id",
      "embedding", qVecs, "query_id", "qt", "embedding", k = 10,
      rPerToken = 24, thresholds = Some(thr), codes = Some(codes)))
    assert(standing == inline,
      "standing codes must serve exactly the inline-coded result")
    // the projection seam: coding a projection that IS the vector is the
    // identity — same candidates, same rerank, same rows
    val projected = rows(Knn.maxSimTopKCoarse(
      docVecs.withColumn("proj", col("embedding")), "vec_id", "doc_id",
      "embedding",
      qVecs.withColumn("proj", col("embedding")), "query_id", "qt",
      "embedding", k = 10, rPerToken = 24,
      projCols = Some(("proj", "proj"))))
    assert(projected == inline,
      "an identity projection must change nothing")
  }
}
