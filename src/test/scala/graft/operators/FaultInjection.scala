package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared fault-injection stores for the commit-seam specs.
  *
  * [[BrokenRenameStore]] simulates S3 semantics: no atomic rename, no
  * no-overwrite enforcement — a "claim" is exists-check + COPY that
  * silently overwrites, with an injected pause between the check and
  * the copy so racers deterministically both pass the check. Any
  * protocol arm routed through it is running on a filesystem whose
  * rename guarantees are strictly WEAKER than every real store we
  * refuse — if the coordinator closes the race here, it closes it
  * everywhere. The widened claim→marker window is also what surfaced
  * the round-15 append-vs-fold loss race (~ms wide under real rename).
  */
private[operators] final class BrokenRenameStore(pauseMs: Long)
    extends CommitStore {
  val name = "broken-rename"
  val winners = new java.util.concurrent.atomic.AtomicInteger(0)

  private def copyOver(f: FileSystem, src: Path, dst: Path): Unit = {
    // copy-then-delete, overwrite allowed — rename, S3-style
    org.apache.hadoop.fs.FileUtil.copy(f, src, f, dst, true, true,
      f.getConf)
    ()
  }

  def claim(f: FileSystem, src: Path, dst: Path): Boolean = {
    if (f.exists(dst)) return false
    Thread.sleep(pauseMs) // both racers pass the exists check
    copyOver(f, src, dst)
    winners.incrementAndGet()
    true
  }

  def putIfAbsent(f: FileSystem, dst: Path,
      body: Array[Byte]): Boolean = {
    if (f.exists(dst)) return false
    Thread.sleep(pauseMs)
    val out = f.create(dst, true) // overwriting PUT — S3-style
    // hold the file VISIBLY EMPTY before the body lands: the torn
    // single-file window copy-based stores expose (created, unwritten).
    // This is what silently lost every unkeyed append in the chaos arm
    // when a compactor read the mid-write head as a legacy empty marker
    // (uwm=-1) — widened here so the reader-side torn-marker retry is
    // exercised DETERMINISTICALLY, not only when thread timing colludes.
    try { Thread.sleep(pauseMs); out.write(body) } finally out.close()
    winners.incrementAndGet()
    true
  }
}
