package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Persisted BM25 search index: serving equals recomputing, appends
  * tokenize only the drop, keyed replay is exactly-once, deletes shift
  * corpus statistics immediately, empty indexes serve empty results. */
class SearchIndexSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"
  private val terms = Seq("spark", "hash", "window")

  private def docs = Tables.documents(s, sf)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq.toVector).toVector

  test("append extends the corpus: probe equals a fresh build over the union") {
    val pathA = Files.createTempDirectory("sidx_a").toString
    val pathB = Files.createTempDirectory("sidx_b").toString
    val base = docs.filter(col("doc_id") < 300)
    val drop = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    SearchIndex.build(base, "doc_id", "text", pathA)
    SearchIndex.append(drop, "doc_id", "text", pathA)
    SearchIndex.build(base.unionByName(drop), "doc_id", "text", pathB)
    assert(rows(SearchIndex.bm25(s, pathA, terms, 20)) ==
      rows(SearchIndex.bm25(s, pathB, terms, 20)),
      "append + probe must equal build-from-scratch over the union")
  }

  test("keyed append replay is exactly-once; df/N shift the moment a doc is deleted") {
    val path = Files.createTempDirectory("sidx_replay").toString
    SearchIndex.build(docs.filter(col("doc_id") < 300), "doc_id", "text", path)
    val batch = docs.filter(col("doc_id") >= 300 && col("doc_id") < 350)
      .localCheckpoint(true)
    SearchIndex.append(batch, "doc_id", "text", path, batchId = Some(0L))
    SearchIndex.append(batch, "doc_id", "text", path, batchId = Some(0L))
    val nDocs = SearchIndex.load(s, path)
      .filter(col("token") === SearchIndex.DlToken).count()
    assert(nDocs == 350, s"replayed keyed append must not double docs: $nDocs")

    // delete, no compaction: every statistic must already reflect it
    VectorIndex.deleteIds(
      docs.filter(col("doc_id") < 50), "doc_id", path)
    val fresh = Files.createTempDirectory("sidx_fresh").toString
    SearchIndex.build(
      docs.filter(col("doc_id") >= 50 && col("doc_id") < 350),
      "doc_id", "text", fresh)
    assert(rows(SearchIndex.bm25(s, path, terms, 20)) ==
      rows(SearchIndex.bm25(s, fresh, terms, 20)),
      "tombstoned docs must vanish from rankings AND corpus stats")
    // compaction folds the tombstones and changes nothing
    VectorIndex.compact(s, path)
    assert(rows(SearchIndex.bm25(s, path, terms, 20)) ==
      rows(SearchIndex.bm25(s, fresh, terms, 20)))
    assert(VectorIndex.loadTombstones(s, path).count() == 0)
  }

  test("phrase search: multiplicity, overlap, append visibility, tombstone masking") {
    import s.implicits._
    val path = Files.createTempDirectory("sidx_phrase").toString
    SearchIndex.build(Seq(
        (1L, "a b a b a b"),   // "a b a" overlaps: starts at 1 and 3
        (2L, "b a b"),
        (3L, "a b c a b c")).toDF("doc_id", "text"),
      "doc_id", "text", path)
    def hits(terms: String*) = SearchIndex.phrase(s, path, terms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits("a", "b") == Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
    assert(hits("a", "b", "a") == Map(1L -> 2L), "overlapping starts both count")
    assert(hits("c", "a") == Map(3L -> 1L))
    assert(hits("z", "b").isEmpty)
    // appended docs serve phrases immediately; tombstoned docs drop out
    SearchIndex.append(Seq((4L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text", path)
    assert(hits("a", "b") == Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
    VectorIndex.deleteIds(Seq(1L).toDF("doc_id"), "doc_id", path)
    assert(hits("a", "b") == Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("phraseNear: slop 0 equals exact phrase; gap windows count tuples") {
    import s.implicits._
    val path = Files.createTempDirectory("sidx_near").toString
    SearchIndex.build(Seq(
        (1L, "a x b"),        // a..b gap 2
        (2L, "a b"),          // adjacent
        (3L, "a x x b"),      // gap 3 — outside slop 1
        (4L, "a x b x b")).toDF("doc_id", "text"), // a→b(3) gap 2 AND a→b(5) gap 4
      "doc_id", "text", path)
    def near(slop: Int, terms: String*) =
      SearchIndex.phraseNear(s, path, terms, slop)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(near(0, "a", "b") == Map(2L -> 1L),
      "slop 0 must be exact adjacency")
    assert(near(0, "a", "b") ==
      SearchIndex.phrase(s, path, Seq("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(near(1, "a", "b") == Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
    assert(near(2, "a", "b") == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    assert(near(3, "a", "b") == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L),
      "both qualifying b positions count as tuples")
    // 3-term chain: a → b → b in doc 4 (positions 1, 3, 5 — gaps 2 and 2)
    assert(near(1, "a", "b", "b") == Map(4L -> 1L))
  }

  test("snippetWindow: minimal cover, earliest-window tie-break, all-terms gate") {
    import s.implicits._
    val path = Files.createTempDirectory("sidx_snip").toString
    SearchIndex.build(Seq(
        (1L, "a x x b a b"), // windows (1,4) (4,5) (5,6) → min width tie → (4,5)
        (2L, "b x a"),       // only window (1,3)
        (3L, "a a a")        // no b → must not appear
      ).toDF("doc_id", "text"), "doc_id", "text", path)
    val w = SearchIndex.snippetWindow(s, path, Seq("a", "b"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(w == Map(1L -> ((4, 5, 2)), 2L -> ((1, 3, 3))))
    // 3-term cover in one doc
    val w3 = SearchIndex.snippetWindow(s, path, Seq("a", "x", "b"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(w3 == Map(1L -> ((3, 5, 3)), 2L -> ((1, 3, 3))))
  }

  test("bm25Batch with one query equals the single-query scorer") {
    import s.implicits._
    val path = Files.createTempDirectory("sidx_batch1").toString
    SearchIndex.build(docs.filter(col("doc_id") < 200), "doc_id", "text", path)
    val single = SearchIndex.bm25(s, path, terms, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = SearchIndex.bm25Batch(s, path,
        terms.map((7L, _)).toDF("query_id", "token"), "query_id", "token", 10)
      .orderBy(col("rank"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_ppm"),
        r.getAs[Long]("n_terms"))).toSeq
    assert(batch == single, "one-query batch must equal the single path")
  }

  test("stats artifact: per-batch rows track build/append/replay exactly") {
    val path = Files.createTempDirectory("sidx_stats").toString
    val base = docs.filter(col("doc_id") < 300)
    SearchIndex.build(base, "doc_id", "text", path)
    def stats() = s.read
      .schema("n_docs LONG, sum_dl LONG, __batch LONG")
      .parquet(s"$path/stats_v0")
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toVector
    def expected(d: org.apache.spark.sql.DataFrame) = (
      d.count(),
      d.select(sum(size(split(col("text"), " ")))).head().getLong(0))
    assert(stats().map(t => (t._1, t._2, t._3)) ==
      Vector((-1L, expected(base)._1, expected(base)._2)))
    // a keyed append adds ITS row; replaying it must not double-count
    val drop = docs.filter(col("doc_id") >= 300 && col("doc_id") < 350)
      .localCheckpoint(true)
    SearchIndex.append(drop, "doc_id", "text", path, batchId = Some(0L))
    SearchIndex.append(drop, "doc_id", "text", path, batchId = Some(0L))
    assert(stats() == Vector(
      (-1L, expected(base)._1, expected(base)._2),
      (0L, expected(drop)._1, expected(drop)._2)),
      "replayed keyed append must replace, not double, its stats row")
  }

  test("an incomplete stats artifact (crash between commit and stats " +
    "write) falls back to the exact aggregate, never undercounts") {
    val path = Files.createTempDirectory("sidx_crashstats").toString
    SearchIndex.build(docs.filter(col("doc_id") < 300), "doc_id", "text",
      path)
    SearchIndex.append(docs.filter(col("doc_id") >= 300 &&
      col("doc_id") < 350), "doc_id", "text", path, batchId = Some(0L))
    val healthy = rows(SearchIndex.bm25(s, path, terms, 20))
    // simulate the documented crash window: the append's version is
    // committed (postings live) but its stats row never landed
    val statsBatch = new org.apache.hadoop.fs.Path(
      s"$path/stats_v0/__batch=0")
    val fs = statsBatch.getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(fs.exists(statsBatch))
    fs.delete(statsBatch, true)
    // the completeness guard must reject the artifact and serve the
    // exact live aggregate — identical ranking, not a silently
    // undercounted N / Σdl forever after
    assert(rows(SearchIndex.bm25(s, path, terms, 20)) == healthy,
      "an artifact missing a committed batch's row must not be trusted")
    import s.implicits._
    val qdf = terms.map(t => (0L, t)).toDF("qid", "tok")
    assert(rows(SearchIndex.bm25Batch(s, path, qdf, "qid", "tok", 20)
        .select(col("doc_id"), col("score_ppm"))) ==
      rows(SearchIndex.bm25(s, path, terms, 20)
        .select(col("doc_id"), col("score_ppm"))),
      "the batched scorer must take the same exact-stats fallback")
    // refreshStats repairs the artifact and the ranking stays put
    SearchIndex.refreshStats(s, path)
    assert(fs.exists(statsBatch))
    assert(rows(SearchIndex.bm25(s, path, terms, 20)) == healthy)
  }

  test("generic compact falls back to exact stats; refreshStats restores the artifact") {
    val path = Files.createTempDirectory("sidx_restat").toString
    SearchIndex.build(docs.filter(col("doc_id") < 300), "doc_id", "text", path)
    VectorIndex.deleteIds(docs.filter(col("doc_id") < 60), "doc_id", path)
    val before = rows(SearchIndex.bm25(s, path, terms, 20))
    // kind-agnostic compact: new payload, no stats artifact — probes must
    // fall back to the exact live aggregate, not inherit stale stats
    VectorIndex.compact(s, path)
    val p = IndexManifest.payloadVersionAt(s, path,
      IndexManifest.currentVersion(s, path).get).get
    val statsDir = new org.apache.hadoop.fs.Path(s"$path/stats_v$p")
    val fs = statsDir.getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(!fs.exists(statsDir), "compact must not inherit pre-compact stats")
    assert(rows(SearchIndex.bm25(s, path, terms, 20)) == before,
      "fallback stats must serve the identical ranking")
    SearchIndex.refreshStats(s, path)
    assert(fs.exists(statsDir))
    assert(rows(SearchIndex.bm25(s, path, terms, 20)) == before,
      "refreshed artifact must serve the identical ranking")
    // search-aware maintenance does the repair in one call
    val path2 = Files.createTempDirectory("sidx_maintain").toString
    SearchIndex.build(docs.filter(col("doc_id") < 300), "doc_id", "text", path2)
    VectorIndex.deleteIds(docs.filter(col("doc_id") < 60), "doc_id", path2)
    val r = SearchIndex.maintain(s, path2).head()
    assert(r.getAs[Boolean]("compacted"))
    val p2 = IndexManifest.payloadVersionAt(s, path2,
      IndexManifest.currentVersion(s, path2).get).get
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path2/stats_v$p2")),
      "maintain must recompute the stats artifact after compacting")
    assert(rows(SearchIndex.bm25(s, path2, terms, 20)) == before)
  }

  test("bm25At: a pinned ranking is immutable under delete, append, AND rebuild") {
    val path = Files.createTempDirectory("sidx_tt").toString
    SearchIndex.build(docs.filter(col("doc_id") < 300), "doc_id", "text", path)
    val v0 = VectorIndex.versions(s, path).last
    val pinned = rows(SearchIndex.bm25At(s, path, v0, terms, 20))
    assert(pinned == rows(SearchIndex.bm25(s, path, terms, 20)),
      "the current-version pin must equal the live probe")
    VectorIndex.deleteIds(docs.filter(col("doc_id") < 50), "doc_id", path)
    assert(rows(SearchIndex.bm25At(s, path, v0, terms, 20)) == pinned,
      "a later delete must not reach the pin")
    SearchIndex.append(
      docs.filter(col("doc_id") >= 300 && col("doc_id") < 350),
      "doc_id", "text", path)
    assert(rows(SearchIndex.bm25At(s, path, v0, terms, 20)) == pinned,
      "a later append must not reach the pin")
    // rebuild with a DIFFERENT corpus: new payload + new stats artifact —
    // the pin keeps resolving its own
    SearchIndex.build(docs.filter(col("doc_id") >= 100), "doc_id", "text", path)
    assert(rows(SearchIndex.bm25At(s, path, v0, terms, 20)) == pinned,
      "a rebuild must not reach the pin")
    // and the pinned DELETE state is itself a stable snapshot
    val v1 = VectorIndex.versions(s, path)(1)
    val afterDelete = rows(SearchIndex.bm25At(s, path, v1, terms, 20))
    val fresh = Files.createTempDirectory("sidx_tt_fresh").toString
    SearchIndex.build(
      docs.filter(col("doc_id") >= 50 && col("doc_id") < 300),
      "doc_id", "text", fresh)
    assert(afterDelete == rows(SearchIndex.bm25(s, fresh, terms, 20)),
      "the v1 pin must rank exactly the post-delete corpus")
  }

  test("MaxScore-pruned BM25 equals unpruned serving across the lifecycle") {
    val path = Files.createTempDirectory("sidx_maxscore").toString
    SearchIndex.build(docs.filter(col("doc_id") < 350), "doc_id", "text", path)
    // query shapes: rare+common (prunes), all-common, absent term mixed
    // in, single term (trivial fallback), k larger than the rare df
    val queries = Seq(
      Seq("dup", "batch", "scan"), Seq("spark", "hash", "window"),
      Seq("dup", "zzznosuchterm", "table"), Seq("dup"),
      Seq("value", "key", "a", "dup"))
    def check(tag: String): Unit = queries.foreach { q =>
      assert(rows(SearchIndex.bm25Pruned(s, path, q, 10)) ==
        rows(SearchIndex.bm25(s, path, q, 10)), s"$tag: $q")
      assert(rows(SearchIndex.bm25Pruned(s, path, q, 1000)) ==
        rows(SearchIndex.bm25(s, path, q, 1000)), s"$tag (k>corpus): $q")
    }
    check("build")
    SearchIndex.append(docs.filter(col("doc_id") >= 350), "doc_id", "text",
      path)
    check("after append")
    VectorIndex.deleteIds(docs.filter(col("doc_id") % 5 === 0), "doc_id",
      path)
    check("after delete (pending-tombstone-corrected bounds)")
    SearchIndex.maintain(s, path, maxTombstoneRatio = 0.0)
    check("after compact + artifact refresh")
    // pruning ENGAGES on the rare+common shape: the common terms' summed
    // upper bounds stay under the k-th score of the rare term's docs
    val ub = SearchIndex.termUpperBounds(s, path,
      Seq("dup", "batch", "scan")).get
    val theta = rows(SearchIndex.bm25(s, path, Seq("dup", "batch", "scan"),
      10)).last(1).asInstanceOf[Long]
    val nonEss = SearchIndex.nonEssentialTerms(ub.toSeq, theta)
    assert(nonEss.toSet == Set("batch", "scan"),
      s"the common terms must be provably non-essential, got $nonEss " +
        s"(ub=$ub theta=$theta)")
  }

  test("CDF sync: O(changes) appends, rewrites fold tombstones first") {
    val base = Files.createTempDirectory("sidx_sync").toString
    val (tp, ip) = (s"$base/t", s"$base/i")
    val d = docs.select(col("doc_id"), col("text"))
    val v0 = TableManifest.commitSnapshot(d.filter(col("doc_id") < 400), tp)
    SearchIndex.build(TableManifest.read(s, tp), "doc_id", "text", ip)
    def payloadOf() = IndexManifest.resolve(s, ip)
      .payloadAt(IndexManifest.currentVersion(s, ip).get)
    val p0 = payloadOf()
    // append-only feed: the payload version must NOT move (no compact)
    val v1 = TableManifest.append(
      d.filter(col("doc_id") >= 400 && col("doc_id") < 450), tp)
    SearchIndex.syncFromTable(s, tp, ip, v0, v1, "doc_id", "text")
    assert(payloadOf() == p0,
      "an insert-only sync must never pay a payload rewrite")
    // delete-only feed: tombstones, still no rewrite
    val v2 = TableManifest.commitSnapshot(
      TableManifest.read(s, tp).filter(col("doc_id") % 9 =!= 0), tp)
    SearchIndex.syncFromTable(s, tp, ip, v1, v2, "doc_id", "text")
    assert(payloadOf() == p0,
      "a delete-only sync must never pay a payload rewrite")
    // rewrite feed (same ids deleted AND inserted): fold, then append
    val v3 = TableManifest.commitSnapshot(
      TableManifest.read(s, tp).withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" zzz")))
          .otherwise(col("text"))), tp)
    SearchIndex.syncFromTable(s, tp, ip, v2, v3, "doc_id", "text")
    assert(payloadOf() != p0, "a rewrite sync must fold the tombstones")
    val fresh = Files.createTempDirectory("sidx_sync_fresh").toString
    SearchIndex.build(TableManifest.read(s, tp), "doc_id", "text", fresh)
    assert(rows(SearchIndex.bm25(s, ip, terms, 20)) ==
      rows(SearchIndex.bm25(s, fresh, terms, 20)),
      "the synced index must rank exactly the table's current state")
    // the rewritten docs' NEW postings are live (not masked by their
    // old tombstones)
    assert(SearchIndex.phrase(s, ip, Seq("zzz")).count() > 0)
  }

  test("shard merge: one index over the union, full surface intact") {
    val base = Files.createTempDirectory("sidx_merge").toString
    val (pa, pb, dst) = (s"$base/a", s"$base/b", s"$base/m")
    SearchIndex.build(docs.filter(col("doc_id") % 3 === 0), "doc_id",
      "text", pa)
    SearchIndex.build(docs.filter(col("doc_id") % 3 =!= 0), "doc_id",
      "text", pb)
    VectorIndex.deleteIds(docs.filter(col("doc_id") % 6 === 0), "doc_id",
      pa)
    SearchIndex.merge(s, Seq(pa, pb), dst)
    val fresh = Files.createTempDirectory("sidx_merge_fresh").toString
    SearchIndex.build(docs.filter(col("doc_id") % 6 =!= 0), "doc_id",
      "text", fresh)
    // the merged index equals a fresh build over union-minus-deletes,
    // across the whole serving surface
    assert(rows(SearchIndex.bm25(s, dst, terms, 20)) ==
      rows(SearchIndex.bm25(s, fresh, terms, 20)))
    assert(rows(SearchIndex.phrase(s, dst, Seq("fast", "table"))
        .orderBy("doc_id")) ==
      rows(SearchIndex.phrase(s, fresh, Seq("fast", "table"))
        .orderBy("doc_id")))
    // the merged stats/tstats artifacts are trusted: pruning engages
    assert(SearchIndex.termUpperBounds(s, dst, Seq("dup")).isDefined)
    assert(rows(SearchIndex.bm25Pruned(s, dst, Seq("dup", "batch"), 10)) ==
      rows(SearchIndex.bm25(s, dst, Seq("dup", "batch"), 10)))
    // overlapping doc-id spaces are rejected before anything commits
    intercept[IllegalArgumentException] {
      SearchIndex.merge(s, Seq(pb, fresh), s"$base/bad")
    }
    assert(VectorIndex.versions(s, s"$base/bad").isEmpty)
  }

  test("sparse dot-product retrieval: pruned equals unpruned, bounds hold") {
    val path = Files.createTempDirectory("sidx_sparse").toString
    SearchIndex.build(docs.filter(col("doc_id") < 350), "doc_id", "text",
      path)
    val rnd = new scala.util.Random(7)
    val vocab = Seq("dup", "batch", "scan", "spark", "the", "value",
      "zzznosuch")
    def randomQuery() = rnd.shuffle(vocab).take(2 + rnd.nextInt(4))
      .map(t => t -> rnd.nextLong(10000L))
    def check(tag: String): Unit = (1 to 6).foreach { _ =>
      val q = randomQuery()
      assert(rows(SearchIndex.sparseDotPruned(s, path, q, 10)) ==
        rows(SearchIndex.sparseDot(s, path, q, 10)), s"$tag: $q")
    }
    check("build")
    SearchIndex.append(docs.filter(col("doc_id") >= 350), "doc_id", "text",
      path)
    VectorIndex.deleteIds(docs.filter(col("doc_id") % 5 === 0), "doc_id",
      path)
    check("after append + pending deletes")
    SearchIndex.maintain(s, path, maxTombstoneRatio = 0.0)
    check("after compact")
    intercept[IllegalArgumentException] {
      SearchIndex.sparseDotPruned(s, path, Seq("dup" -> -1L), 10)
    }
  }

  test("term upper bounds dominate every actual contribution") {
    val path = Files.createTempDirectory("sidx_ub").toString
    SearchIndex.build(docs.filter(col("doc_id") < 300), "doc_id", "text", path)
    SearchIndex.append(docs.filter(col("doc_id") >= 300), "doc_id", "text",
      path)
    VectorIndex.deleteIds(docs.filter(col("doc_id") % 7 === 0), "doc_id",
      path)
    val qts = Seq("dup", "the", "spark", "batch", "value")
    val ub = SearchIndex.termUpperBounds(s, path, qts).get
    // actual per-(doc, term) contributions, straight from the live rows
    // with exact df / N / Σdl — the scorer's own arithmetic
    val live = SearchIndex.load(s, path)
      .filter(col("token").isin(qts: _*) ||
        col("token") === SearchIndex.DlToken)
      .localCheckpoint(true)
    val corpus = live.filter(col("token") === SearchIndex.DlToken)
      .agg(count(lit(1)).as("n_docs"), sum(col("tf")).as("sum_dl"))
    val actual = live.filter(col("token") =!= SearchIndex.DlToken)
      .join(live.filter(col("token") =!= SearchIndex.DlToken)
        .groupBy(col("token")).agg(count(lit(1)).as("df")), Seq("token"))
      .crossJoin(corpus)
      .selectExpr("token",
        "(2*n_docs - 2*df + 1) * 1000000L div (2*df + 1) * " +
          "(44*tf*sum_dl * 1000000L div (20*tf*sum_dl + 6*sum_dl + 18*dl*n_docs))" +
          " div 1000000L as contrib_ppm")
      .groupBy(col("token")).agg(max(col("contrib_ppm")).as("mx"))
      .collect().map(r0 => r0.getString(0) -> r0.getLong(1)).toMap
    actual.foreach { case (t, mx) =>
      assert(ub(t) >= mx, s"UB must dominate: $t ub=${ub(t)} actual=$mx")
    }
  }

  test("MaxScore partition is pure, strict, and never swallows every term") {
    val ub = Seq("a" -> 10L, "b" -> 100L, "c" -> 1000L)
    // strictness: cum 10 < 15 admits a; 10+100 ≥ 15 stops
    assert(SearchIndex.nonEssentialTerms(ub, 15L) == List("a"))
    // boundary: cum 10 < 10 is false — θ equal to the prefix sum excludes
    assert(SearchIndex.nonEssentialTerms(ub, 10L).isEmpty)
    // θ ≤ Σ all UB always leaves the top term essential
    assert(!SearchIndex.nonEssentialTerms(ub, 1110L).contains("c"))
    assert(SearchIndex.nonEssentialTerms(ub, 1110L) == List("b", "a"))
    // prefix is contiguous from the lowest UB: b alone can never drop
    // while a survives
    assert(SearchIndex.nonEssentialTerms(ub, 50L) == List("a"))
  }

  test("pruning falls back safely when the artifact is missing or stale") {
    val path = Files.createTempDirectory("sidx_fallback").toString
    SearchIndex.build(docs, "doc_id", "text", path)
    val full = rows(SearchIndex.bm25(s, path, Seq("dup", "batch"), 10))
    // artifact deleted outright → unpruned path, same result
    val pv = VectorIndex.versions(s, path).last
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$path/tstats_v$pv"),
      new org.apache.hadoop.fs.Path(s"$path/tstats_stashed"))
    assert(SearchIndex.termUpperBounds(s, path, Seq("dup")).isEmpty)
    assert(rows(SearchIndex.bm25Pruned(s, path, Seq("dup", "batch"), 10))
      == full, "missing artifact must serve the exact unpruned result")
    // artifact restored but INCOMPLETE (an append whose artifact write
    // crashed): batch-set mismatch disables pruning
    fs.rename(new org.apache.hadoop.fs.Path(s"$path/tstats_stashed"),
      new org.apache.hadoop.fs.Path(s"$path/tstats_v$pv"))
    assert(SearchIndex.termUpperBounds(s, path, Seq("dup")).isDefined)
    SearchIndex.append(docs.limit(50), "doc_id", "text", path)
    val batches = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$path/tstats_v$pv"))
      .map(_.getPath).filter(_.getName.startsWith("__batch="))
    fs.delete(batches.maxBy(_.getName), true)
    assert(SearchIndex.termUpperBounds(s, path, Seq("dup")).isEmpty,
      "an artifact not covering every payload batch must disable pruning")
    assert(rows(SearchIndex.bm25Pruned(s, path, Seq("dup", "batch"), 10))
      == rows(SearchIndex.bm25(s, path, Seq("dup", "batch"), 10)))
  }

  test("an empty index serves empty results, not a crash") {
    val path = Files.createTempDirectory("sidx_empty").toString
    SearchIndex.build(docs.filter(col("doc_id") < 0), "doc_id", "text", path)
    assert(SearchIndex.bm25(s, path, terms, 20).count() == 0)
    assert(SearchIndex.phrase(s, path, Seq("the", "table")).count() == 0)
    // the ops views survive a footerless (zero-row) payload too
    val d = VectorIndex.describe(s, path).head()
    assert(d.getAs[Long]("live_items") == 0L)
    val h = VectorIndex.history(s, path).head()
    assert(h.getAs[Boolean]("readable") && h.getAs[Long]("live_items") == 0L)
  }
}
