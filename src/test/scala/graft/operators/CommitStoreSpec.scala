package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The object-store commit seam, fault-injected.
  *
  * [[BrokenRenameStore]] simulates S3 semantics: no atomic rename, no
  * no-overwrite enforcement — a "claim" is exists-check + COPY that
  * silently overwrites, with an injected pause between the check and
  * the copy so two racers deterministically both pass the check. The
  * spec proves (1) the hazard is REAL under those semantics — racing
  * marker placements both report success, i.e. a lost commit — and
  * (2) [[CoordinatedCommitStore]] over the SAME broken primitive
  * closes it: the coordinator picks exactly one winner, the full table
  * chaos workload lands every effect, and version history stays
  * exactly-once. */
class CommitStoreSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def df(rows: Seq[(Long, Long)]): DataFrame = {
    import s.implicits._
    rows.toDF("id", "v")
  }

  // S3-shaped primitive: overwriting copy with a widened race window;
  // `winners` counts claims that REPORTED success — under a real
  // atomic store at most one per destination can. Shared with the
  // TableManifestProps full-chaos arm: FaultInjection.scala.

  private def fs(path: String): FileSystem =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  test("the hazard is real: racing marker placements through a " +
    "non-atomic overwriting store BOTH report success (a lost commit)") {
    val path = java.nio.file.Files
      .createTempDirectory("cs_broken").toString
    val broken = new BrokenRenameStore(pauseMs = 150)
    val f = fs(path)
    f.mkdirs(new Path(s"$path/manifest"))
    val dst = new Path(s"$path/manifest/v7")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (1 to 2).map { i =>
      new Thread(() => results.add(
        broken.putIfAbsent(f, dst, s"wm=$i\nuwm=-1\nkind=append"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // BOTH believed they placed version 7 — one body overwrote the
    // other. This is exactly the data race the seam exists to close.
    assert(results.asScala.count(identity) == 2,
      "expected both racers to report success under broken rename")
    assert(broken.winners.get() == 2)
  }

  test("CoordinatedCommitStore over the SAME broken primitive: exactly " +
    "one marker-placement winner, losers never touch the filesystem") {
    val path = java.nio.file.Files
      .createTempDirectory("cs_coord_unit").toString
    val broken = new BrokenRenameStore(pauseMs = 150)
    val store = new CoordinatedCommitStore(underlying = broken)
    val f = fs(path)
    f.mkdirs(new Path(s"$path/manifest"))
    val dst = new Path(s"$path/manifest/v7")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (1 to 4).map { i =>
      new Thread(() => results.add(
        store.putIfAbsent(f, dst, s"wm=$i\nuwm=-1\nkind=append"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(results.asScala.count(identity) == 1,
      "coordinator must pick exactly one winner")
    // the broken primitive ran exactly once: losers were refused at
    // the coordinator, never reaching the racy filesystem transition
    assert(broken.winners.get() == 1)
    assert(f.exists(dst))
  }

  test("torn marker placement: a reader landing on a created-but-" +
    "unwritten marker resolves the COMMITTED body, never the legacy " +
    "empty record (the uwm=-1 read that lost unkeyed appends)") {
    val path = java.nio.file.Files
      .createTempDirectory("cs_torn_marker").toString
    val f = fs(path)
    f.mkdirs(new Path(s"$path/manifest"))
    val dst = new Path(s"$path/manifest/v3")
    // a writer mid-PUT: file exists, body lands 60 ms later — the
    // window a non-atomic store exposes between create and write
    val writer = new Thread(() => {
      val out = f.create(dst, true)
      try { Thread.sleep(60); out.write(
        "wm=7\nuwm=42\nkind=append"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)) }
      finally out.close()
    })
    writer.start()
    Thread.sleep(10) // land INSIDE the torn window
    val info = IndexManifest.markerInfoAt(s, path, 3L)
    writer.join()
    assert(info == IndexManifest.MarkerInfo(7L, 42L, "append"),
      s"torn read must resolve the committed body, got $info")
  }

  test("chaos through the seam: concurrent appenders + a deleter + a " +
    "compactor over the coordinated store on a rename-atomicity-broken " +
    "filesystem — every effect lands exactly once") {
    val path = java.nio.file.Files
      .createTempDirectory("cs_coord_chaos").toString
    // EVERY protocol transition under this path now runs the broken
    // primitive, serialized only by the coordinator
    CommitStore.installForTest(path,
      new CoordinatedCommitStore(
        underlying = new BrokenRenameStore(pauseMs = 2)))
    try {
      TableManifest.commitSnapshot(
        df((0L until 100L).map(i => (i, i))), path)
      val failures =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def worker(body: => Unit) = new Thread(() =>
        try body catch { case t: Throwable => failures.add(t) })
      val appenders = (1 to 4).map { i =>
        worker {
          (0 until 3).foreach { j =>
            TableManifest.append(
              df(Seq((10000L + i * 10 + j, i.toLong))), path)
          }
        }
      }
      val deleter = worker {
        Thread.sleep(30)
        TableManifest.deleteWhere(s, path, "id < 10 AND id < 10000")
      }
      val compactor = worker {
        Thread.sleep(60)
        TableManifest.compactBatches(s, path)
      }
      val all = appenders :+ deleter :+ compactor
      all.foreach(_.start()); all.foreach(_.join())
      assert(failures.isEmpty, s"chaos workers threw: $failures")
      val got = TableManifest.read(s, path).select("id", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = ((10L until 100L).map(i => (i, i)) ++
        (for { i <- 1 to 4; j <- 0 until 3 }
          yield (10000L + i * 10 + j, i.toLong))).sorted
      assert(got == want,
        s"chaos end state diverged: missing=${want.diff(got)} " +
          s"extra=${got.diff(want)}")
      // exactly-once history: no duplicated version numbers, markers
      // all parse (no torn overwrite survived)
      val vs = IndexManifest.committedVersions(s, path)
      assert(vs == vs.distinct.sorted)
    } finally CommitStore.clearTestStores()
  }

  test("JDBC coordinator: two SEPARATE coordinator instances (the " +
    "multi-driver shape) over one shared database admit exactly one " +
    "winner per key, durably") {
    val url = "jdbc:derby:memory:cs_jdbc_multi;create=true"
    // two instances = two drivers: no shared JVM state — exclusion can
    // only come from the database's primary-key uniqueness
    val driverA = new JdbcCommitCoordinator(url)
    val driverB = new JdbcCommitCoordinator(url)
    val key = "s3a://bucket/table/manifest/v7"
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { i =>
      val via = if (i % 2 == 0) driverA else driverB
      new Thread(() => if (via.tryAcquire(key)) wins.incrementAndGet())
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1, "database uniqueness must pick one winner")
    // durable memory: a THIRD instance (a restarted driver) still sees
    // the key held — the DynamoDB-record semantics
    assert(!new JdbcCommitCoordinator(url).tryAcquire(key))
    // a released key (failed filesystem write) is reacquirable, once
    driverA.release(key)
    assert(driverB.tryAcquire(key))
    assert(!driverA.tryAcquire(key))
  }

  test("CoordinatedCommitStore with the JDBC coordinator closes the " +
    "broken-rename race exactly like the local one") {
    val path = java.nio.file.Files
      .createTempDirectory("cs_jdbc_unit").toString
    val broken = new BrokenRenameStore(pauseMs = 150)
    val store = new CoordinatedCommitStore(
      coordinator = new JdbcCommitCoordinator(
        "jdbc:derby:memory:cs_jdbc_unit;create=true"),
      underlying = broken)
    val f = fs(path)
    f.mkdirs(new Path(s"$path/manifest"))
    val dst = new Path(s"$path/manifest/v7")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (1 to 4).map { i =>
      new Thread(() => results.add(
        store.putIfAbsent(f, dst, s"wm=$i\nuwm=-1\nkind=append"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(results.asScala.count(identity) == 1)
    assert(broken.winners.get() == 1)
    assert(f.exists(dst))
  }

  test("JDBC coordinator FAILS CLOSED: an unreachable database fails " +
    "the commit instead of default-winning") {
    // derby without ;create=true on a nonexistent db refuses to connect
    val dead = new JdbcCommitCoordinator("jdbc:derby:memory:cs_absent")
    intercept[java.sql.SQLException] { dead.tryAcquire("any-key") }
  }

  test("table protocol end-to-end through the JDBC coordinator on a " +
    "rename-atomicity-broken filesystem") {
    val path = java.nio.file.Files
      .createTempDirectory("cs_jdbc_proto").toString
    CommitStore.installForTest(path,
      new CoordinatedCommitStore(
        coordinator = new JdbcCommitCoordinator(
          "jdbc:derby:memory:cs_jdbc_proto;create=true"),
        underlying = new BrokenRenameStore(pauseMs = 2)))
    try {
      TableManifest.commitSnapshot(
        df((0L until 50L).map(i => (i, i))), path)
      val appenders = (1 to 3).map { i =>
        new Thread(() => TableManifest.append(
          df(Seq((100L + i, i.toLong))), path))
      }
      appenders.foreach(_.start()); appenders.foreach(_.join())
      TableManifest.deleteWhere(s, path, "id < 5")
      val got = TableManifest.read(s, path).select("id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == ((5L until 50L) ++ Seq(101L, 102L, 103L)).sorted)
      val vs = IndexManifest.committedVersions(s, path)
      assert(vs == vs.distinct.sorted)
    } finally CommitStore.clearTestStores()
  }

  test("crash recovery: a winner that DIED between registering and " +
    "writing is completed from the database record by the next " +
    "committer — no wedged slot") {
    val path = java.nio.file.Files
      .createTempDirectory("cs_jdbc_recover").toString
    val url = "jdbc:derby:memory:cs_jdbc_recover;create=true"
    val f = fs(path)
    f.mkdirs(new Path(s"$path/manifest"))
    val dst = new Path(s"$path/manifest/v7")
    val k = f.makeQualified(dst).toUri.toString
    val crashed = new JdbcCommitCoordinator(url) // registers, never writes
    val winnerBody = "wm=42\nuwm=-1\nkind=append"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(crashed.tryAcquireWithBody(k, winnerBody))
    // a MERELY-SLOW winner is protected: within the grace window the
    // record ages on the DATABASE clock and pendingBody stays empty
    assert(new JdbcCommitCoordinator(url).pendingBody(k).isEmpty)
    // past the grace window (grace=0 coordinator = "aged out" now), a
    // later committer LOSES the register but COMPLETES the dead
    // winner's write with the winner's recorded bytes, not its own
    val store = new CoordinatedCommitStore(
      coordinator = new JdbcCommitCoordinator(url, graceMs = 0L))
    val loserBody = "wm=99\nuwm=-1\nkind=append"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(!store.putIfAbsent(f, dst, loserBody))
    val in = f.open(dst)
    val got = try scala.io.Source.fromInputStream(in).mkString
      finally in.close()
    assert(got == new String(winnerBody,
      java.nio.charset.StandardCharsets.UTF_8),
      "recovery must complete the WINNER's intent, not the loser's")
  }

  test("protocol liveness through recovery: a registered-but-unwritten " +
    "marker (dead committer) does not wedge the table — the next " +
    "append completes it and lands above") {
    val path = java.nio.file.Files
      .createTempDirectory("cs_jdbc_wedge").toString
    val url = "jdbc:derby:memory:cs_jdbc_wedge;create=true"
    CommitStore.installForTest(path,
      new CoordinatedCommitStore(
        coordinator = new JdbcCommitCoordinator(url, graceMs = 0L)))
    try {
      TableManifest.commitSnapshot(
        df((0L until 20L).map(i => (i, i))), path)
      val f = fs(path)
      // simulate a committer killed between the database register and
      // the marker write: the row exists for head+1, the file does not
      val head = IndexManifest.committedVersions(s, path).max
      val wedged = new Path(s"$path/manifest/v${head + 1}")
      val in = f.open(new Path(s"$path/manifest/v$head"))
      val body = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      val crashed = new JdbcCommitCoordinator(url)
      assert(crashed.tryAcquireWithBody(
        f.makeQualified(wedged).toUri.toString,
        body.replace("kind=snapshot", "kind=append")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      // without recovery this append would spin forever: every attempt
      // at head+1 loses the register while the head never advances
      TableManifest.append(df(Seq((100L, 1L))), path)
      assert(f.exists(wedged), "dead winner's marker completed")
      val got = TableManifest.read(s, path).select("id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == ((0L until 20L) :+ 100L).sorted)
      val vs = IndexManifest.committedVersions(s, path)
      assert(vs == vs.distinct.sorted)
    } finally CommitStore.clearTestStores()
  }

  test("reclaim hygiene: vacuum forgets the coordinator rows of the " +
    "destinations it deletes — the register tracks LIVE history, and " +
    "the table keeps committing") {
    val path = java.nio.file.Files
      .createTempDirectory("cs_jdbc_hygiene").toString
    val url = "jdbc:derby:memory:cs_jdbc_hygiene;create=true"
    CommitStore.installForTest(path,
      new CoordinatedCommitStore(
        coordinator = new JdbcCommitCoordinator(url)))
    def rowCount(): Long = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(
          "SELECT count(*) FROM GRAFT_COMMITS")
        rs.next(); rs.getLong(1)
      } finally c.close()
    }
    try {
      TableManifest.commitSnapshot(
        df((0L until 20L).map(i => (i, i))), path)
      (1 to 6).foreach(i =>
        TableManifest.append(df(Seq((100L + i, i.toLong))), path))
      TableManifest.compactBatches(s, path)
      val before = rowCount()
      assert(before > 0, "commits must register")
      val reclaimed = TableManifest.vacuum(s, path, keep = 1)
      assert(reclaimed.nonEmpty, "vacuum must reclaim something")
      val after = rowCount()
      assert(after < before,
        s"vacuum must forget reclaimed destinations ($before -> $after)")
      // live history still registered: the head marker's row survives
      val f = fs(path)
      val head = IndexManifest.committedVersions(s, path).max
      val headKey = f.makeQualified(
        new Path(s"$path/manifest/v$head")).toUri.toString
      assert(!new JdbcCommitCoordinator(url).tryAcquire(headKey),
        "the live head's row must survive the forget")
      // and the table still reads and commits normally
      TableManifest.append(df(Seq((999L, 9L))), path)
      assert(TableManifest.read(s, path).count() == 20L + 6L + 1L)
    } finally CommitStore.clearTestStores()
  }

  test("ghost registrations: a claim row whose winner died before ANY " +
    "filesystem transition (no dir to sweep) is released by " +
    "cleanOrphans; rows of existing destinations survive") {
    val path = java.nio.file.Files
      .createTempDirectory("cs_jdbc_ghost").toString
    val url = "jdbc:derby:memory:cs_jdbc_ghost;create=true"
    CommitStore.installForTest(path,
      new CoordinatedCommitStore(
        coordinator = new JdbcCommitCoordinator(url)))
    try {
      TableManifest.commitSnapshot(
        df((0L until 10L).map(i => (i, i))), path)
      val f = fs(path)
      // the ghost: registered, then the driver died — no dir, no file
      val ghostDst = f.makeQualified(
        new Path(s"$path/data_v99")).toUri.toString
      assert(new JdbcCommitCoordinator(url).tryAcquire(ghostDst))
      // olderThanMs=0: everything is "aged" — the ghost must go, but
      // EXISTING destinations' rows survive the existence re-check
      TableManifest.cleanOrphans(s, path, olderThanMs = 0L)
      val probe = new JdbcCommitCoordinator(url)
      assert(probe.tryAcquire(ghostDst),
        "ghost row must be released (slot re-claimable)")
      probe.release(ghostDst)
      val head = IndexManifest.committedVersions(s, path).max
      val headKey = f.makeQualified(
        new Path(s"$path/manifest/v$head")).toUri.toString
      assert(!probe.tryAcquire(headKey),
        "existing destinations keep their rows")
      // the table still commits and reads
      TableManifest.append(df(Seq((50L, 5L))), path)
      assert(TableManifest.read(s, path).count() == 11L)
    } finally CommitStore.clearTestStores()
  }

  test("rename store REFUSES unverified-rename schemes unless " +
    "explicitly acknowledged") {
    // a local filesystem masquerading as s3a — only getUri differs
    val raw = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def getUri: java.net.URI =
        java.net.URI.create("s3a://bucket")
    }
    raw.initialize(java.net.URI.create("file:///"),
      s.sparkContext.hadoopConfiguration)
    val dst = new Path("/tmp/cs_scheme_probe")
    val e = intercept[IllegalStateException] {
      CommitStore.of(raw, dst)
    }
    assert(e.getMessage.contains("coordinated"))
    s.conf.set("spark.graft.commit.store", "coordinated")
    try assert(CommitStore.of(raw, dst).name == "coordinated")
    finally s.conf.unset("spark.graft.commit.store")
    s.conf.set("spark.graft.commit.allowUnverifiedRename", "true")
    try assert(CommitStore.of(raw, dst).name == "rename")
    finally s.conf.unset("spark.graft.commit.allowUnverifiedRename")
  }

  private implicit class QueueOps[A](
      q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala: Seq[A] = {
      val b = Seq.newBuilder[A]
      q.forEach(a => b += a)
      b.result()
    }
  }
}
