package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** The commit primitive the marker protocol rests on, made PLUGGABLE.
  *
  * Every atomicity-critical transition in the manifest layer is one of
  * two shapes:
  *
  *  - [[CommitStore.claim]]: move a staged directory/file onto a
  *    versioned destination, failing iff the destination is already
  *    taken (batch-partition claims, delete segments, checkpoint
  *    files);
  *  - [[CommitStore.putIfAbsent]]: publish a small immutable file at a
  *    destination iff absent (the version MARKERS themselves).
  *
  * The default [[RenameCommitStore]] implements both with the
  * filesystem's own no-overwrite rename — real on HDFS and ABFS, and
  * narrowed-window on checksummed local filesystems (the contract the
  * protocol has always documented). **S3-family object stores provide
  * neither atomic rename nor no-overwrite enforcement**: two racing
  * committers can BOTH believe they placed the same marker, and the
  * second copy silently overwrites the first — a lost commit, the
  * difference between a lakehouse and a data race. Delta solved this
  * with a pluggable LogStore (conditional PUT / an external
  * coordination table); this seam is the same idea:
  *
  *  - [[CoordinatedCommitStore]] serializes every claim through a
  *    [[CommitCoordinator]] — an atomic register-the-winner step that
  *    does NOT depend on rename atomicity. Only the coordinator's
  *    winner touches the filesystem, so a non-atomic rename (or a
  *    plain overwriting copy) underneath becomes safe: there is never
  *    a second writer for one destination. The in-JVM
  *    [[LocalCommitCoordinator]] is exact for every single-driver
  *    deployment (local[*], one Spark driver per table — the
  *    documented mutator contract); multi-driver deployments set
  *    `spark.graft.commit.coordinator=jdbc` +
  *    `spark.graft.commit.jdbc.url` to route the register through
  *    [[JdbcCommitCoordinator]] — a shared RDBMS's PRIMARY KEY insert
  *    as the conditional PUT (the Delta S3DynamoDBLogStore shape,
  *    implemented), or plug any other linearizable backend into the
  *    same two-method trait.
  *
  * Resolution ([[CommitStore.of]]) is per-destination: a spec-installed
  * override first (fault injection), then
  * `spark.graft.commit.store` (`rename` | `coordinated`), defaulting
  * to rename. Filesystems whose rename contract is UNVERIFIED for this
  * protocol (s3/s3a/s3n/gs/oss/cos/swift/wasb) REFUSE the rename store
  * outright — set `coordinated`, or acknowledge the race with
  * `spark.graft.commit.allowUnverifiedRename=true` (logged loudly) —
  * so nothing silently commits into a lost-update window.
  */
trait CommitStore {

  /** Claim `dst` by moving staged `src` onto it. False iff `dst` was
    * already taken — the caller re-resolves and retries at the next
    * version number. Implementations MUST ensure at most one of N
    * racing claimers for the same `dst` returns true. */
  def claim(f: FileSystem, src: Path, dst: Path): Boolean

  /** Publish the small immutable file `dst` with `body` iff absent.
    * Same at-most-one-winner contract as [[claim]]. */
  def putIfAbsent(f: FileSystem, dst: Path, body: Array[Byte]): Boolean

  /** Drop any coordination memory for the given destinations — called
    * by the reclaim paths (vacuum, checkpoint pruning, cleanOrphans)
    * AFTER deleting them, so a coordinator-backed table's register
    * stays proportional to the LIVE history instead of growing one row
    * per commit forever. Safe because version numbers are never reused
    * (tail-only commits) and a claim's own exists-check still refuses
    * re-claims of any destination that still exists. Default: no-op
    * (the rename store keeps no memory). */
  def forgetAll(f: FileSystem, dsts: Seq[Path]): Unit = ()

  /** Registrations under `under` older than `olderThanMs` whose memory
    * the store still holds — lets the orphan sweep discover a claim
    * whose winner died BEFORE any filesystem transition (a held row
    * with no dir: invisible to listings, permanently blocking its
    * slot). Default: none (the rename store keeps no memory). */
  def staleRegistrations(f: FileSystem, under: Path,
      olderThanMs: Long): Seq[Path] = Nil

  def name: String
}

/** Today's protocol: no-overwrite rename as the atomic decider.
  * Correct on HDFS/ABFS; narrowed-window on local filesystems;
  * REFUSED by [[CommitStore.of]] on S3-family schemes. */
object RenameCommitStore extends CommitStore {

  val name = "rename"

  /** Hadoop's `FileSystem.rename(src, dst)` with an existing dst
    * DIRECTORY moves src INSIDE dst and returns true — a racing
    * claimer would silently nest its (hidden, dot-named) staging dir
    * inside the winner's and lose its rows. Every claim in this layer
    * stages under a UUID-unique name, so the nesting is detected
    * exactly and backed out: the loser retries at the next number,
    * nobody's data moves. */
  def claim(f: FileSystem, src: Path, dst: Path): Boolean = {
    if (f.exists(dst)) return false
    if (!f.rename(src, dst)) return false
    val nested = new Path(dst, src.getName)
    if (f.exists(nested)) { f.rename(nested, src); false }
    else true
  }

  def putIfAbsent(f: FileSystem, dst: Path, body: Array[Byte]): Boolean = {
    if (f.exists(dst)) return false
    // unique tmp PER ATTEMPT: two committers racing the same number
    // must never share a staging file (the winner's rename would yank
    // it from under the loser's in-flight create)
    val tmp = new Path(dst.getParent,
      s".${dst.getName}_${java.util.UUID.randomUUID}_tmp")
    val out = f.create(tmp, true)
    try out.write(body) finally out.close()
    if (f.exists(dst)) { f.delete(tmp, false); false }
    else {
      val won = f.rename(tmp, dst)
      if (!won) f.delete(tmp, false) // lost between check and rename
      won
    }
  }
}

/** The atomic register-the-winner step [[CoordinatedCommitStore]]
  * serializes through. `tryAcquire` must be linearizable: of N
  * concurrent acquirers of one key, exactly one wins. A winner whose
  * filesystem write FAILS releases the key so a retry can proceed;
  * a SUCCESSFUL claim keeps the key held (the destination is immutable
  * once placed — the held entry is the coordinator's memory of it,
  * exactly the DynamoDB-LogStore record shape). */
trait CommitCoordinator {
  def tryAcquire(key: String): Boolean
  def release(key: String): Unit

  /** [[tryAcquire]] carrying the intended file CONTENT. Backends that
    * persist it (the JDBC coordinator) enable crash recovery: a winner
    * that dies between registering and writing leaves its intent in
    * the record, and [[pendingBody]] lets any later committer COMPLETE
    * the write instead of wedging on a dead winner. Default: plain
    * tryAcquire (no recovery — correctness is unaffected, only the
    * liveness of the crashed-winner case). */
  def tryAcquireWithBody(key: String, body: Array[Byte]): Boolean =
    tryAcquire(key)

  /** The recorded content of a held `key` whose winner looks DEAD —
    * None unless the backend stores bodies AND the registration is
    * older than the backend's grace window (measured on the backend's
    * own clock, so no cross-driver clock skew). */
  def pendingBody(key: String): Option[Array[Byte]] = None

  /** Bulk [[release]] — reclaim hygiene; backends may batch. */
  def releaseAll(keys: Seq[String]): Unit = keys.foreach(release)

  /** Held keys under `keyPrefix` registered at least `olderThanMs` ago
    * (the backend's clock) — the orphan sweep's view of coordination
    * memory, so registrations whose winner died BEFORE any filesystem
    * transition (no dir, no file — nothing a listing can find) are
    * still discoverable. Default: none (the in-JVM coordinator's
    * crashed claimers die with the JVM). */
  def heldKeysUnder(keyPrefix: String,
      olderThanMs: Long): Seq[String] = Nil
}

/** JVM-wide coordinator: exact whenever all mutators of a table share
  * one driver JVM (the documented single-logical-writer contract, and
  * everything local[*] runs). The entry set is bounded by the claims
  * a driver performs in its lifetime — tiny next to the data. */
object LocalCommitCoordinator extends CommitCoordinator {
  private val held = java.util.concurrent.ConcurrentHashMap
    .newKeySet[String]()
  def tryAcquire(key: String): Boolean = held.add(key)
  def release(key: String): Unit = { held.remove(key); () }
}

/** Multi-driver coordinator over any shared RDBMS reachable by JDBC:
  * the linearizable register-the-winner step is a PRIMARY KEY insert —
  * of N racing acquirers of one destination, the database commits
  * exactly one INSERT and refuses the rest with a duplicate-key
  * violation (SQLState class 23). This is the Delta S3DynamoDBLogStore
  * record shape with the conditional PUT expressed as SQL uniqueness,
  * so ANY shared Postgres/MySQL/Derby instance serializes commits for
  * tables on stores without atomic rename — across drivers, not just
  * within one JVM like [[LocalCommitCoordinator]].
  *
  * Semantics mirror the DynamoDB record: a SUCCESSFUL claim keeps its
  * row (the coordinator's durable memory of the commit — a restarted
  * driver still sees the destination taken even before the object
  * store shows it); a claim whose filesystem write FAILS releases the
  * row so a retry can proceed. Rows are one per committed destination,
  * tiny next to the data; under read-after-write-consistent stores
  * (today's S3) rows whose destination is durably visible may be
  * pruned — the store's own exists-check still refuses a re-claim.
  *
  * Failure posture: any SQL error OTHER than a duplicate key (network
  * down, auth, lost database) PROPAGATES and fails the commit — an
  * unreachable coordinator must never default-win, that would be
  * exactly the uncoordinated race this class exists to close.
  *
  * The key is stored as its SHA-256 hex digest (fixed 64 chars — fits
  * every RDBMS's index-key limit regardless of path length) alongside
  * the full destination and an acquisition timestamp for operators.
  * One connection per operation: claims are per-version (rare next to
  * data movement), and connection-per-op keeps the class lock-free
  * across racing committer threads. */
final class JdbcCommitCoordinator(url: String,
    table: String = "GRAFT_COMMITS",
    graceMs: Long = 5000L) extends CommitCoordinator {

  import java.sql.{Connection, DriverManager, SQLException}

  require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
    s"coordinator table name must be a plain SQL identifier: '$table'")

  private def digest(key: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  }

  @volatile private var ready = false

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  /** First-use table creation, racing-driver tolerant: a failed CREATE
    * is accepted iff the table is actually probeable afterwards
    * (another driver created it / it pre-exists) — otherwise the
    * ORIGINAL create error surfaces. SQLState-agnostic on purpose:
    * "already exists" codes differ per RDBMS (Derby X0Y32, Postgres
    * 42P07, MySQL 42S01); probing is portable. A pre-body-column table
    * (an earlier deployment of this coordinator) is widened in place —
    * ADD COLUMN is ANSI and metadata-only on every target RDBMS. */
  private def ensureTable(c: Connection): Unit =
    if (!ready) this.synchronized {
      if (!ready) {
        try {
          val st = c.createStatement()
          try st.executeUpdate(
            s"CREATE TABLE $table (" +
              "dst_digest VARCHAR(64) NOT NULL PRIMARY KEY, " +
              "dst VARCHAR(4096) NOT NULL, " +
              "acquired_at TIMESTAMP NOT NULL, " +
              "body VARCHAR(8192))")
          finally st.close()
        } catch {
          case e: SQLException =>
            val probe = c.createStatement()
            try probe.executeQuery(
              s"SELECT dst_digest FROM $table WHERE 1=0").close()
            catch { case _: SQLException => throw e }
            finally probe.close()
            val bodyProbe = c.createStatement()
            try bodyProbe.executeQuery(
              s"SELECT body FROM $table WHERE 1=0").close()
            catch {
              case _: SQLException =>
                val alter = c.createStatement()
                try alter.executeUpdate(
                  s"ALTER TABLE $table ADD COLUMN body VARCHAR(8192)")
                finally alter.close()
            } finally bodyProbe.close()
        }
        ready = true
      }
    }

  def tryAcquire(key: String): Boolean = insert(key, None)

  override def tryAcquireWithBody(key: String,
      body: Array[Byte]): Boolean = {
    // bodies too big for the column lose recovery, never correctness
    val encoded = java.util.Base64.getEncoder.encodeToString(body)
    insert(key, if (encoded.length <= 8192) Some(encoded) else None)
  }

  private def insert(key: String, body: Option[String]): Boolean =
    withConn { c =>
      ensureTable(c)
      val ps = c.prepareStatement(s"INSERT INTO $table " +
        "(dst_digest, dst, acquired_at, body) " +
        "VALUES (?, ?, CURRENT_TIMESTAMP, ?)")
      try {
        ps.setString(1, digest(key))
        ps.setString(2, key.take(4096))
        body match {
          case Some(b) => ps.setString(3, b)
          case None => ps.setNull(3, java.sql.Types.VARCHAR)
        }
        ps.executeUpdate()
        true
      } catch {
        // integrity-constraint class: another driver holds/committed it
        case e: SQLException
            if Option(e.getSQLState).exists(_.startsWith("23")) => false
      } finally ps.close()
    }

  /** The recorded intent of a held key whose winner has been silent for
    * at least [[graceMs]] — aged on the DATABASE's clock (acquired_at
    * and CURRENT_TIMESTAMP fetched in one round trip), so driver clock
    * skew can never mis-age a registration. */
  override def pendingBody(key: String): Option[Array[Byte]] =
    withConn { c =>
      ensureTable(c)
      val ps = c.prepareStatement(s"SELECT body, acquired_at, " +
        s"CURRENT_TIMESTAMP FROM $table WHERE dst_digest = ?")
      try {
        ps.setString(1, digest(key))
        val rs = ps.executeQuery()
        try {
          if (!rs.next()) None
          else {
            val b = rs.getString(1)
            val at = rs.getTimestamp(2)
            val now = rs.getTimestamp(3)
            if (b == null || at == null || now == null ||
                now.getTime - at.getTime < graceMs) None
            else Some(java.util.Base64.getDecoder.decode(b))
          }
        } finally rs.close()
      } finally ps.close()
    }

  def release(key: String): Unit = withConn { c =>
    ensureTable(c)
    val ps = c.prepareStatement(
      s"DELETE FROM $table WHERE dst_digest = ?")
    try { ps.setString(1, digest(key)); ps.executeUpdate(); () }
    finally ps.close()
  }

  /** Aged registrations under a prefix — dst-pattern scan (the one
    * non-PK query; runs only from the rare orphan sweep), aged on the
    * database's clock like [[pendingBody]]. Keys whose stored dst was
    * truncated (≥ 4096 chars) cannot round-trip and are skipped —
    * their rows stay until the dir-driven forget covers them. */
  override def heldKeysUnder(keyPrefix: String,
      olderThanMs: Long): Seq[String] = withConn { c =>
    ensureTable(c)
    val esc = keyPrefix.replace("!", "!!")
      .replace("%", "!%").replace("_", "!_")
    val ps = c.prepareStatement(s"SELECT dst, acquired_at, " +
      s"CURRENT_TIMESTAMP FROM $table " +
      "WHERE (dst = ? OR dst LIKE ? ESCAPE '!')")
    try {
      ps.setString(1, keyPrefix.take(4096))
      ps.setString(2, esc + "/%")
      val rs = ps.executeQuery()
      try {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (rs.next()) {
          val dst = rs.getString(1)
          val at = rs.getTimestamp(2)
          val now = rs.getTimestamp(3)
          if (dst != null && dst.length < 4096 && at != null &&
              now != null && now.getTime - at.getTime >= olderThanMs)
            out += dst
        }
        out.toSeq
      } finally rs.close()
    } finally ps.close()
  }

  /** Bulk release on ONE connection with a batched statement — every
    * delete is a primary-key hit (digests, never pattern scans), so a
    * vacuum forgetting thousands of reclaimed destinations costs one
    * round trip per batch, not one connection per row. */
  override def releaseAll(keys: Seq[String]): Unit =
    if (keys.nonEmpty) withConn { c =>
      ensureTable(c)
      val ps = c.prepareStatement(
        s"DELETE FROM $table WHERE dst_digest = ?")
      try {
        keys.foreach { k => ps.setString(1, digest(k)); ps.addBatch() }
        ps.executeBatch()
        ()
      } finally ps.close()
    }
}

/** Conditional-write commits: the coordinator decides the winner;
  * only the winner performs the filesystem transition, so the
  * underlying store's rename need not be atomic or no-overwrite —
  * this is what closes the S3 window. `underlying` defaults to the
  * rename store (whose rename, now single-writer, degenerates to a
  * plain move). */
final class CoordinatedCommitStore(
    coordinator: CommitCoordinator = LocalCommitCoordinator,
    underlying: CommitStore = RenameCommitStore) extends CommitStore {

  val name = "coordinated"

  private def key(f: FileSystem, dst: Path): String =
    f.makeQualified(dst).toUri.toString

  def claim(f: FileSystem, src: Path, dst: Path): Boolean = {
    val k = key(f, dst)
    if (!coordinator.tryAcquire(k)) return false
    val ok =
      try underlying.claim(f, src, dst)
      catch { case e: Throwable => coordinator.release(k); throw e }
    // dst already existed (a pre-coordinator era's claim, an orphan):
    // release so inspection/cleanup isn't wedged; the claim still lost
    if (!ok) coordinator.release(k)
    ok
  }

  def putIfAbsent(f: FileSystem, dst: Path, body: Array[Byte]): Boolean = {
    val k = key(f, dst)
    if (!coordinator.tryAcquireWithBody(k, body)) {
      // lost the register — but if the WINNER DIED between registering
      // and writing (a held key with no file), complete ITS write from
      // the recorded intent: the rename store's liveness restored (a
      // crash before the marker write leaves nothing there; here it
      // would otherwise leave a permanently-wedged slot — the head
      // never advances past a registered-but-absent marker). Writing
      // the WINNER'S recorded body is idempotent against a merely-slow
      // winner: both writes carry identical bytes, content converges
      // whatever the order. This is the Delta DynamoDB-LogStore
      // "complete incomplete entries" shape.
      if (!f.exists(dst))
        coordinator.pendingBody(k).foreach { b =>
          underlying.putIfAbsent(f, dst, b); ()
        }
      return false
    }
    val ok =
      try underlying.putIfAbsent(f, dst, body)
      catch { case e: Throwable => coordinator.release(k); throw e }
    if (!ok) coordinator.release(k)
    ok
  }

  override def forgetAll(f: FileSystem, dsts: Seq[Path]): Unit =
    coordinator.releaseAll(dsts.map(key(f, _)))

  override def staleRegistrations(f: FileSystem, under: Path,
      olderThanMs: Long): Seq[Path] =
    coordinator.heldKeysUnder(key(f, under), olderThanMs)
      .map(new Path(_))
}

object CommitStore {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Schemes with a VERIFIED no-overwrite-rename contract for this
    * protocol. Everything else refuses the rename store (see above). */
  private val renameSafeSchemes: Set[String] =
    Set("hdfs", "webhdfs", "viewfs", "abfs", "abfss", "file", "local")

  // spec-installed overrides: longest-matching path prefix wins
  private val testStores =
    new java.util.concurrent.ConcurrentHashMap[String, CommitStore]()

  /** Install a store for every destination under `pathPrefix` — the
    * fault-injection seam the chaos specs drive. */
  private[graft] def installForTest(pathPrefix: String,
      store: CommitStore): Unit = { testStores.put(pathPrefix, store); () }

  private[graft] def clearTestStores(): Unit = testStores.clear()

  private val warnedSchemes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private val coordinated = new CoordinatedCommitStore()

  // one coordinated store per (jdbc url, table): the coordinator's
  // ensureTable latch and the session conf are both per-target
  private val jdbcStores =
    new java.util.concurrent.ConcurrentHashMap[String, CommitStore]()

  /** The store governing commits at `dst`. */
  def of(f: FileSystem, dst: Path): CommitStore = {
    if (!testStores.isEmpty) {
      val p = dst.toString
      var best: Option[(String, CommitStore)] = None
      testStores.forEach { (prefix, store) =>
        if (p.startsWith(prefix) &&
            best.forall(_._1.length < prefix.length))
          best = Some(prefix -> store)
      }
      best.foreach { case (_, s) => return s }
    }
    // active session first (the thread's own — Spark's idiom for
    // custom thread pools is setActiveSession), then the JVM default:
    // without the fallback, a commit issued from a user worker thread
    // would silently resolve NO session conf and drop back to the
    // rename store even when the app configured coordinated commits
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.conf)
    def opt(k: String): Option[String] =
      conf.flatMap(_.getOption(k)).orElse(Option(f.getConf.get(k)))
    val choice = opt("spark.graft.commit.store").getOrElse("rename")
    val scheme = Option(f.getUri.getScheme).getOrElse("file")
      .toLowerCase(java.util.Locale.ROOT)
    choice match {
      case "coordinated" =>
        opt("spark.graft.commit.coordinator").getOrElse("local") match {
          case "local" => coordinated
          case "jdbc" =>
            val url = opt("spark.graft.commit.jdbc.url").getOrElse(
              throw new IllegalArgumentException(
                "spark.graft.commit.coordinator=jdbc requires " +
                  "spark.graft.commit.jdbc.url (a shared RDBMS every " +
                  "driver of the table can reach)"))
            val tbl = opt("spark.graft.commit.jdbc.table")
              .getOrElse("GRAFT_COMMITS")
            jdbcStores.computeIfAbsent(s"$url $tbl",
              _ => new CoordinatedCommitStore(
                coordinator = new JdbcCommitCoordinator(url, tbl)))
          case other =>
            throw new IllegalArgumentException(
              s"unknown spark.graft.commit.coordinator '$other' " +
                "(expected local | jdbc)")
        }
      case "rename" =>
        if (!renameSafeSchemes.contains(scheme)) {
          val allow = opt("spark.graft.commit.allowUnverifiedRename")
            .exists(_.equalsIgnoreCase("true"))
          if (!allow)
            throw new IllegalStateException(
              s"filesystem scheme '$scheme' has no verified atomic " +
                "no-overwrite rename — two racing committers could both " +
                "believe they won a version (a lost commit). Set " +
                "spark.graft.commit.store=coordinated (conditional-write " +
                "commits through a CommitCoordinator), or acknowledge " +
                "the race explicitly with " +
                "spark.graft.commit.allowUnverifiedRename=true")
          if (warnedSchemes.add(scheme))
            log.warn(s"commit protocol running on UNVERIFIED-rename " +
              s"scheme '$scheme' with the rename store — concurrent " +
              "committers may lose commits; prefer " +
              "spark.graft.commit.store=coordinated")
        }
        RenameCommitStore
      case other =>
        throw new IllegalArgumentException(
          s"unknown spark.graft.commit.store '$other' " +
            "(expected rename | coordinated)")
    }
  }
}
