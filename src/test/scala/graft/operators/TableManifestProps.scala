package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-based check of the table commit protocol: a seeded random
  * sequence of snapshot / keyed-append / unkeyed-append / compact /
  * optimize ops runs against BOTH the real TableManifest and an
  * in-memory reference model (version → row multiset). After every op,
  * the live read, a randomly chosen retained VERSION AS OF, the
  * metadata count, and a random change feed (applied to its from-state)
  * must all agree with the model — the protocol-level invariants no
  * single-scenario spec can sweep. */
class TableManifestProps extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def df(rows: Seq[(Long, Long)]): DataFrame = {
    import s.implicits._
    rows.toDF("id", "v")
  }

  private def rowsOf(d: DataFrame): Map[(Long, Long), Int] =
    d.select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap

  test("N concurrent unkeyed appenders all land: no lost, duplicated, " +
    "or cross-written batch") {
    val path = java.nio.file.Files
      .createTempDirectory("tm_props_conc").toString
    TableManifest.commitSnapshot(df(Seq((0L, 0L))), path)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 6).map { i =>
      new Thread(() => try {
        TableManifest.append(df(Seq((i.toLong, i.toLong * 100))), path)
      } catch { case t: Throwable => failures.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"concurrent appends threw: $failures")
    // every appender's row is present exactly once — distinct claimed
    // batch partitions, no dynamic-overwrite clobber, no double-land
    val got = rowsOf(TableManifest.read(s, path))
    val want = ((0L, 0L) +: (1 to 6).map(i => (i.toLong, i.toLong * 100)))
      .map(_ -> 1).toMap
    assert(got == want, s"concurrent appends lost or duplicated rows: $got")
  }

  test("threaded chaos: appenders, a deleter, an updater, and a " +
    "compactor race freely — every effect lands, nothing is lost") {
    val path = java.nio.file.Files
      .createTempDirectory("tm_props_chaos").toString
    runThreadedChaos(path)
  }

  test("threaded chaos THROUGH THE COMMIT SEAM: the same full workload " +
    "over a rename-atomicity-broken store, serialized only by the JDBC " +
    "coordinator (the multi-driver S3 shape)") {
    val path = java.nio.file.Files
      .createTempDirectory("tm_props_chaos_seam").toString
    // every protocol transition under this path runs an overwriting
    // non-atomic copy with a widened race window — correctness can
    // come only from the coordinator's database-uniqueness register
    CommitStore.installForTest(path,
      new CoordinatedCommitStore(
        coordinator = new JdbcCommitCoordinator(
          "jdbc:derby:memory:tm_chaos_seam;create=true"),
        underlying = new BrokenRenameStore(pauseMs = 2)))
    try runThreadedChaos(path)
    finally CommitStore.clearTestStores()
  }

  test("chaos WITH VACUUM through the seam: writers, readers, and a " +
    "retention vacuum race over the broken store — aged history is " +
    "reclaimed, racing commits stay protected, no read ever fails") {
    val path = java.nio.file.Files
      .createTempDirectory("tm_props_chaos_vac").toString
    CommitStore.installForTest(path,
      new CoordinatedCommitStore(
        coordinator = new JdbcCommitCoordinator(
          "jdbc:derby:memory:tm_chaos_vac;create=true"),
        underlying = new BrokenRenameStore(pauseMs = 1)))
    try {
      // deep AGED history WITH FOLDS: only superseded payload versions
      // are reclaimable (an unfolded append log keeps resolving through
      // its one payload dir), so interleave appends with compactions —
      // everything below the last fold's payload ages out
      TableManifest.commitSnapshot(
        df((0L until 50L).map(i => (i, i))), path)
      (0 until 5).foreach(j =>
        TableManifest.append(df(Seq((1000L + j, j.toLong))), path))
      TableManifest.compactBatches(s, path)
      (5 until 11).foreach(j =>
        TableManifest.append(df(Seq((1000L + j, j.toLong))), path))
      TableManifest.compactBatches(s, path)
      val retainMs = 3000L
      Thread.sleep(retainMs + 700)
      // racing window: appenders keep the head FRESH (inside the
      // retention horizon) while vacuum reclaims the aged tail and a
      // reader loop resolves the live table throughout — the fence
      // bump, checkpoint rewrite, and register forgets all happen
      // under fire
      val failures =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def worker(body: => Unit) = new Thread(() =>
        try body catch { case t: Throwable => failures.add(t) })
      val appenders = (0 until 2).map(a => worker {
        (0 until 4).foreach { j =>
          TableManifest.append(
            df(Seq((2000L + a * 10 + j, 5L))), path)
          Thread.sleep(10)
        }
      })
      val vacuumer = worker {
        Thread.sleep(30)
        val r1 = TableManifest.vacuum(s, path, keep = 2,
          retainMs = retainMs)
        assert(r1.nonEmpty, "aged history must be reclaimable")
        Thread.sleep(40)
        TableManifest.vacuum(s, path, keep = 2, retainMs = retainMs)
      }
      val reader = worker {
        (0 until 8).foreach { _ =>
          val n = TableManifest.read(s, path).count()
          assert(n >= 61L, s"reader saw a torn table: $n rows")
          Thread.sleep(15)
        }
      }
      val all = appenders ++ Seq(vacuumer, reader)
      all.foreach(_.start()); all.foreach(_.join(120000))
      assert(failures.isEmpty, s"chaos+vacuum workers threw: $failures")
      val got = rowsOf(TableManifest.read(s, path))
      val want = (
        (0L until 50L).map(i => (i, i)) ++
        (0L until 11L).map(j => (1000L + j, j)) ++
        (for (a <- 0 until 2; j <- 0 until 4)
          yield (2000L + a * 10 + j, 5L))
      ).map(_ -> 1).toMap
      assert(got == want,
        s"end state diverged: missing=${want.keySet -- got.keySet} " +
          s"extra=${got.keySet -- want.keySet}")
      val vs = IndexManifest.committedVersions(s, path)
      assert(vs == vs.distinct.sorted)
      // vacuum genuinely reclaimed: history no longer starts at v0
      assert(vs.head > 0L, "aged versions must be gone")
    } finally CommitStore.clearTestStores()
  }

  /** The full chaos workload against an empty temp `path`.
    * Effects are key-disjoint so the final state is order-independent:
    *  - base rows  [0, 100): survive, except...
    *  - the deleter removes id < 10 (base-only range)
    *  - the updater rewrites v += 1000000 for id in [50, 60)
    *  - the merger upserts v = 555 for id in [90, 100) (source wins)
    *  - appenders add unique ids >= 10000 (never matched by any)
    *  - the compactor folds twice along the way (content no-op)
    */
  private def runThreadedChaos(path: String): Unit = {
    TableManifest.commitSnapshot(
      df((0L until 100L).map(i => (i, i))), path)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def worker(f: => Unit) = new Thread(() =>
      try f catch { case t: Throwable => failures.add(t) })
    val appenders = (0 until 3).map(a => worker {
      (0 until 4).foreach(j =>
        TableManifest.append(
          df(Seq((10000L + a * 100 + j, 7L))), path))
    })
    val deleter = worker {
      TableManifest.deleteWhere(s, path, "id < 5")
      TableManifest.deleteWhere(s, path, "id >= 5 AND id < 10")
    }
    val updater = worker {
      TableManifest.updateWhere(s, path, "id >= 50 AND id < 60",
        Seq("v" -> "v + 1000000"))
    }
    val compactor = worker {
      TableManifest.compactBatches(s, path)
      Thread.sleep(50)
      TableManifest.compactBatches(s, path)
    }
    // upserts keys [90, 100) (base-only, disjoint from every other
    // effect) — the CoW merge's re-derive loop under real threads
    val merger = worker {
      TableManifest.mergeInto(s, path,
        df((90L until 100L).map(i => (i, 555L))),
        keyCols = Seq("id"), orderCols = Seq("v"))
    }
    // the MoR merger (the SQL MERGE engine path) on its own disjoint
    // keys [70, 80) + fresh inserts: its STRICT CAS restarts on every
    // intervening commit, so under free-running writers it must
    // eventually land exactly once — matched rows updated through the
    // equality tombstone + replacement batch, inserts appended, never
    // a lost or doubled effect
    val morMerger = worker {
      TableManifest.mergeWhere(s, path,
        df((70L until 80L).map(i => (i, 0L)) ++
          (20000L until 20005L).map(i => (i, 9L))),
        keyCols = Seq("id"),
        matched = Seq(TableManifest.MergeMatched("update", None,
          Some(Seq("v" -> "__t.v + 5000")))),
        inserts = Seq(TableManifest.MergeInsert(None)))
      ()
    }
    // constraint DDL races the writers: both sets hold over every
    // effect's rows, so enforcement must never reject a legitimate
    // write, and the metadata-only commits must never disturb a
    // mutation (they restart the in-flight CAS loops, bounded)
    val constrainer = worker {
      TableManifest.setConstraints(s, path, Seq(
        TableManifest.TableConstraint("id_nonneg", "id >= 0",
          true, false, "VALID")))
      Thread.sleep(30)
      TableManifest.setConstraints(s, path, Seq(
        TableManifest.TableConstraint("id_nonneg", "id >= 0",
          true, false, "VALID"),
        TableManifest.TableConstraint("v_nonneg", "v >= 0",
          true, false, "VALID")))
    }
    // a tagger pins whatever version is current mid-race: the pin must
    // stay resolvable whatever else lands
    val tagger = worker {
      Thread.sleep(40)
      TableManifest.tag(s, path, "chaos")
    }
    val all = appenders ++
      Seq(deleter, updater, compactor, merger, morMerger, constrainer,
        tagger)
    all.foreach(_.start()); all.foreach(_.join(120000))
    assert(failures.isEmpty, s"chaos workers threw: $failures")
    // the tag resolves to a committed version and reads cleanly
    val tagged = TableManifest.tagVersion(s, path, "chaos").get
    assert(TableManifest.versions(s, path).contains(tagged))
    TableManifest.readAt(s, path, tagged).count()
    // a constraint set is live (whichever DDL won last) and the final
    // state satisfies it — and a violating append is now refused
    assert(TableManifest.constraintsOf(s, path).nonEmpty)
    intercept[Exception](
      TableManifest.append(df(Seq((-1L, 0L))), path))
    val got = rowsOf(TableManifest.read(s, path))
    val want = (
      (10L until 100L).map(i =>
        (i, if (i >= 90L) 555L
            else if (i >= 70 && i < 80) i + 5000L
            else if (i >= 50 && i < 60) i + 1000000L
            else i)) ++
      (20000L until 20005L).map(i => (i, 9L)) ++
      (for (a <- 0 until 3; j <- 0 until 4)
        yield (10000L + a * 100 + j, 7L))
    ).map(_ -> 1).toMap
    assert(got == want,
      s"chaos end state diverged: missing=${want.keySet -- got.keySet} " +
        s"extra=${got.keySet -- want.keySet}")
  }

  test("random op sequences: live, pinned, counted, and fed reads all " +
    "match the reference model") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed * 97)
      val path = java.nio.file.Files
        .createTempDirectory(s"tm_props_$seed").toString
      def randRows(n: Int) =
        (0 until n).map(_ => (rnd.nextLong(50L), rnd.nextLong(1000L)))

      // the reference model: committed version -> multiset
      var model = Map.empty[Long, Map[(Long, Long), Int]]
      def multiset(rows: Seq[(Long, Long)]) =
        rows.groupBy(identity).view.mapValues(_.length).toMap
      def cur = model(model.keys.max)

      val v0 = TableManifest.commitSnapshot(df(randRows(20)), path)
      model += v0 -> rowsOf(TableManifest.read(s, path))

      (1 to 10).foreach { step =>
        val opRoll = rnd.nextInt(12)
        if (opRoll < 3) { // snapshot replacement
          val rows = randRows(10 + rnd.nextInt(20))
          val v = TableManifest.commitSnapshot(df(rows), path)
          model += v -> multiset(rows)
        } else if (opRoll < 7) { // append (keyed half the time)
          val rows = randRows(1 + rnd.nextInt(10))
          val keyed = rnd.nextBoolean()
          val v = TableManifest.append(df(rows), path,
            batchId = if (keyed) Some(1000L + step) else None)
          model += v -> (cur.keySet ++ multiset(rows).keySet).map { k =>
            k -> (cur.getOrElse(k, 0) + multiset(rows).getOrElse(k, 0))
          }.toMap
        } else if (opRoll < 8) { // compact the append log
          TableManifest.compactBatches(s, path)
          val v = TableManifest.versions(s, path).max
          model += v -> cur
        } else if (opRoll < 9) { // DELETE WHERE (a residue class of ids)
          val res = rnd.nextInt(7)
          val v = TableManifest.deleteWhere(s, path, s"id % 7 = $res")
          model += v -> cur.filter { case ((id, _), _) => id % 7 != res }
        } else if (opRoll < 10) { // MoR UPDATE (a residue class of ids)
          val res = rnd.nextInt(5)
          val v = TableManifest.updateWhere(s, path, s"id % 5 = $res",
            Seq("v" -> "v + 10000"))
          val next = cur.map { case (k @ (id, vv), n) =>
            (if (id % 5 == res) (id, vv + 10000L) else k) -> n }
          // a no-match update commits nothing: keep the model in step
          if (TableManifest.versions(s, path).max == v &&
              !model.contains(v)) model += v -> next
        } else if (opRoll < 11) { // MoR MERGE: update matched, insert new
          val srcRows = (0 until 1 + rnd.nextInt(5))
            .map(_ => rnd.nextLong(60L)).distinct
            .map(k => (k, rnd.nextLong(1000L)))
          val (v, _, _) = TableManifest.mergeWhere(s, path, df(srcRows),
            keyCols = Seq("id"),
            matched = Seq(TableManifest.MergeMatched("update", None,
              Some(Seq("v" -> "__t.v + 100000")))),
            inserts = Seq(TableManifest.MergeInsert(None)))
          val srcKeys = srcRows.map(_._1).toSet
          val present = cur.keys.map(_._1).toSet
          val next = cur.map { case ((id, vv), n) =>
            (if (srcKeys.contains(id)) (id, vv + 100000L)
             else (id, vv)) -> n } ++
            srcRows.filterNot(r => present.contains(r._1))
              .map(r => (r._1, r._2) -> 1)
          model += v -> next
        } else { // optimize: content no-op, new version
          val v = TableManifest.optimize(s, path, Seq("id"), files = 4,
            statsCols = Seq("id"))
          model += v -> cur
        }

        // 1. the live read is the newest model state
        assert(rowsOf(TableManifest.read(s, path)) == cur,
          s"seed=$seed step=$step: live read diverged")
        // 2. a random retained pin replays its own state
        val pins = TableManifest.versions(s, path)
          .filter(model.contains)
        val pin = pins(rnd.nextInt(pins.size))
        assert(rowsOf(TableManifest.readAt(s, path, pin)) == model(pin),
          s"seed=$seed step=$step: pin $pin diverged")
        // 3. metadata count (post-refresh) and fallback count agree
        TableManifest.refreshZoneMaps(s, path, Seq("id"))
        assert(TableManifest.countRows(s, path) == cur.values.sum,
          s"seed=$seed step=$step: count diverged")
        // 4. a random change feed applied to its from-state reproduces
        //    its to-state as a multiset
        val (from, to) = {
          val a = pins(rnd.nextInt(pins.size))
          val b = pins(rnd.nextInt(pins.size))
          (math.min(a, b), math.max(a, b))
        }
        val feed = TableManifest.readChanges(s, path, from, to)
          .select(col("id"), col("v"), col("_change_type")).collect()
        val applied = feed.foldLeft(model(from)) { (m, r) =>
          val k = (r.getLong(0), r.getLong(1))
          val d = if (r.getString(2) == "insert") 1 else -1
          val n = m.getOrElse(k, 0) + d
          if (n == 0) m - k else m + (k -> n)
        }
        assert(applied == model(to),
          s"seed=$seed step=$step: feed $from->$to did not reproduce")
      }
    }
  }

  test("merge liveness under a hot appender: the claim SLIDES over " +
    "provably-disjoint appends, so a MERGE lands within TWO attempts " +
    "instead of re-deriving against every interleaved commit") {
    val path = java.nio.file.Files
      .createTempDirectory("tm_props_mrglive").toString
    TableManifest.commitSnapshot(df((0L until 100L).map(i => (i, i))), path)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val appended = new java.util.concurrent.atomic.AtomicLong(0L)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // a free-running appender on keys DISJOINT from the merge source:
    // every commit it lands moves the head, which under the old strict
    // CAS forced a full re-derivation (and, under a fast enough
    // appender, starved the merge into its attempt cap)
    val appender = new Thread(() => try {
      var i = 0L
      while (!stop.get()) {
        TableManifest.append(df(Seq((100000L + i, 7L))), path)
        appended.incrementAndGet()
        i += 1
      }
    } catch { case t: Throwable => failures.add(t) })
    appender.start()
    try {
      Thread.sleep(200) // appender at steady state before the merge pins
      s.conf.set("spark.graft.merge.maxAttempts", "2")
      val (v, nMatched, nInserted) = TableManifest.mergeWhere(s, path,
        df((0L until 10L).map(i => (i, 0L)) ++
          Seq((200000L, 9L), (200001L, 9L))),
        keyCols = Seq("id"),
        matched = Seq(TableManifest.MergeMatched("update", None,
          Some(Seq("v" -> "__t.v + 5000")))),
        inserts = Seq(TableManifest.MergeInsert(None)))
      assert(v > 0 && nMatched == 10L && nInserted == 2L)
    } finally {
      s.conf.unset("spark.graft.merge.maxAttempts")
      stop.set(true)
      appender.join(60000)
    }
    assert(failures.isEmpty, s"appender threw: $failures")
    val got = rowsOf(TableManifest.read(s, path))
    val want = (
      (0L until 100L).map(i => (i, if (i < 10) i + 5000L else i)) ++
      Seq((200000L, 9L), (200001L, 9L)) ++
      (0L until appended.get()).map(i => (100000L + i, 7L))
    ).map(_ -> 1).toMap
    assert(got == want,
      s"slide lost rows: missing=${want.keySet -- got.keySet} " +
        s"extra=${got.keySet -- want.keySet}")
  }

  test("merge slide under a WIDENED key column: interleaved appends " +
    "physicalize keys under the era storage name, and the disjointness " +
    "probe must resolve them through the mapping — an INTERSECTING " +
    "append can never be slid over (no duplicate keys, ever)") {
    // regression canary for the null-padded-probe bug: the slide's
    // delta read used the LOGICAL key schema, so post-widening appends
    // (stored as id__w<v>) read as NULL keys, === matched nothing, and
    // an intersecting append was judged "provably disjoint" — the
    // merge then INSERTED a key the append had already landed
    // (a duplicate). The invariant is timing-independent: whenever an
    // intersecting append lands mid-merge, a correct probe forces a
    // re-derivation, so a duplicate key can never exist afterwards.
    val path = java.nio.file.Files
      .createTempDirectory("tm_props_mrgwide").toString
    TableManifest.commitSnapshot(
      s.range(0, 100).select(col("id").cast("int").as("id"),
        col("id").as("v")), path)
    // widen the KEY column: appends now land under the era name
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s.sql(s"ALTER TABLE graft.`$path` ALTER COLUMN id TYPE BIGINT")
    assert(TableManifest.columnMapOf(s, path).nonEmpty)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appendedKeys =
      new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    // appender keys INTERSECT the merge source's not-matched range
    // (500+i vs source 0..519): any append landing mid-merge must
    // force a re-derivation, never a slide
    val appender = new Thread(() => try {
      var i = 0L
      while (!stop.get() && i < 40) {
        TableManifest.append(df(Seq((500L + i, 7L))), path)
        appendedKeys.add(500L + i)
        i += 1
        Thread.sleep(30)
      }
    } catch { case t: Throwable => failures.add(t) })
    appender.start()
    try {
      Thread.sleep(100)
      TableManifest.mergeWhere(s, path,
        df((0L until 10L).map(i => (i, -1L)) ++
          (500L until 520L).map(i => (i, -1L))),
        keyCols = Seq("id"),
        matched = Seq(TableManifest.MergeMatched("update", None,
          Some(Seq("v" -> "__s.v")))),
        inserts = Seq(TableManifest.MergeInsert(None)))
      ()
    } finally {
      stop.set(true)
      appender.join(60000)
    }
    assert(failures.isEmpty, s"appender threw: $failures")
    // THE invariant: no key ever appears twice (a slid-over
    // intersecting append would duplicate its key via the merge's
    // stale not-matched INSERT)
    val dups = TableManifest.read(s, path)
      .groupBy(col("id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).collect()
    assert(dups.isEmpty,
      s"duplicate keys after merge under widened-key appends: " +
        s"${dups.mkString(", ")}")
    // and the merge's own effects landed: matched range updated
    val updated = TableManifest.read(s, path)
      .filter(col("id") < 10 && col("v") === -1L).count()
    assert(updated == 10L, s"matched updates: $updated")
  }
}
