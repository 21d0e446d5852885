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
  *    documented mutator contract); multi-driver deployments plug a
  *    DynamoDB/ZooKeeper-backed coordinator into the same two-method
  *    trait (the Delta S3DynamoDBLogStore shape).
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
    if (!coordinator.tryAcquire(k)) return false
    val ok =
      try underlying.putIfAbsent(f, dst, body)
      catch { case e: Throwable => coordinator.release(k); throw e }
    if (!ok) coordinator.release(k)
    ok
  }
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
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.conf)
    def opt(k: String): Option[String] =
      conf.flatMap(_.getOption(k)).orElse(Option(f.getConf.get(k)))
    val choice = opt("spark.graft.commit.store").getOrElse("rename")
    val scheme = Option(f.getUri.getScheme).getOrElse("file")
      .toLowerCase(java.util.Locale.ROOT)
    choice match {
      case "coordinated" => coordinated
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
