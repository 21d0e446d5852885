package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental view maintenance: folding any sequence of multiset change
  * feeds equals recomputation, keys leave the state at count zero. */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def table(rows: Seq[(Long, String, Double)]): DataFrame = {
    import s.implicits._
    rows.toDF("id", "k", "v")
  }

  private def feedOf(from: Seq[(Long, String, Double)],
      to: Seq[(Long, String, Double)]): DataFrame = {
    val a = table(from); val b = table(to)
    b.exceptAll(a).withColumn("_change_type", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("_change_type", lit("delete")))
  }

  private def stateRows(st: DataFrame) =
    st.select(col("k"), col("n"), col("sum_v").cast("string"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet

  test("randomized feed sequences: maintained state equals recomputation") {
    val rnd = new scala.util.Random(11)
    val keys = Vector("a", "b", "c", "d")
    var cur = (0L until 40L).map(i =>
      (i, keys(rnd.nextInt(4)), rnd.nextInt(1000) / 7.0))
    var state = IncrementalAgg.initialize(table(cur), Seq("k"), "v")
      .localCheckpoint(true)
    (1 to 5).foreach { step =>
      // random edit: drop some rows, rewrite some values, add new rows
      val next = cur.filter(_ => rnd.nextDouble() > 0.2)
        .map { case (i, k, v) =>
          if (rnd.nextDouble() < 0.3) (i, k, v * 3 + 0.5) else (i, k, v) } ++
        (0 until rnd.nextInt(10)).map(j =>
          (1000L * step + j, keys(rnd.nextInt(4)),
            rnd.nextInt(1000) / 7.0))
      state = IncrementalAgg.maintain(state, feedOf(cur, next), Seq("k"),
        "v").localCheckpoint(true)
      val recomputed =
        IncrementalAgg.initialize(table(next), Seq("k"), "v")
      assert(stateRows(state) == stateRows(recomputed),
        s"step $step: maintained state must equal recomputation")
      cur = next
    }
  }

  test("maintainTable: replayed batches fold exactly once, by construction") {
    val base = java.nio.file.Files.createTempDirectory("ivm_replay")
      .toString
    val (tp, sp) = (s"$base/t", s"$base/s")
    TableManifest.commitSnapshot(table(Seq((1L, "a", 2.0), (2L, "b", 3.0))),
      tp)
    IncrementalAgg.maintainTable(s, tp, sp, Seq("k"), "v")
    TableManifest.append(table(Seq((3L, "a", 5.0))), tp, batchId = Some(0L))
    IncrementalAgg.maintainTable(s, tp, sp, Seq("k"), "v")
    val once = stateRows(TableManifest.read(s, sp).drop("__asof"))
    // an at-least-once retry: the SAME batch replays (keyed overwrite),
    // then maintenance runs again — the feed must be empty and the
    // state must not double-fold
    TableManifest.append(table(Seq((3L, "a", 5.0))), tp, batchId = Some(0L))
    IncrementalAgg.maintainTable(s, tp, sp, Seq("k"), "v")
    assert(stateRows(TableManifest.read(s, sp).drop("__asof")) == once,
      "a replayed batch must fold zero times more")
    assert(once.exists { case (k, n, sum) =>
      k == "a" && n == 2L && sum.startsWith("7.000000") },
      s"key a must hold exactly one fold of the batch: $once")
    // a no-change call commits no new state version
    val vs = TableManifest.versions(s, sp).size
    IncrementalAgg.maintainTable(s, tp, sp, Seq("k"), "v")
    assert(TableManifest.versions(s, sp).size == vs,
      "nothing new must mean no empty state commit")
  }

  test("maintainTable folds a MoR UPDATE (and a delete) exactly: the " +
    "feed's delete+insert rendering nets the value difference") {
    val base = java.nio.file.Files.createTempDirectory("ivm_upd")
      .toString
    val (tp, sp) = (s"$base/t", s"$base/s")
    TableManifest.commitSnapshot(table(Seq((1L, "a", 2.0), (2L, "a", 3.0),
      (3L, "b", 4.0), (4L, "b", 5.0))), tp)
    IncrementalAgg.maintainTable(s, tp, sp, Seq("k"), "v")
    // an UPDATE rewrites values in place (delete old + insert new in
    // the feed); a later DELETE removes a row; the maintained state
    // must equal recomputation after both — without re-initializing
    TableManifest.updateWhere(s, tp, "v <= 3.0",
      Seq("v" -> "v + 100.0"))
    TableManifest.deleteWhere(s, tp, "id = 4")
    IncrementalAgg.maintainTable(s, tp, sp, Seq("k"), "v")
    val maintained = stateRows(TableManifest.read(s, sp).drop("__asof"))
    val recomputed = stateRows(IncrementalAgg.initialize(
      TableManifest.read(s, tp), Seq("k"), "v"))
    assert(maintained == recomputed,
      s"update+delete fold drifted: $maintained vs $recomputed")
    assert(maintained.exists { case (k, n, sum) =>
      k == "a" && n == 2L && sum.startsWith("205.000000") },
      s"key a must net the +200 rewrite: $maintained")
  }

  test("a key whose rows all die leaves the state entirely") {
    val base = Seq((1L, "x", 2.0), (2L, "x", 3.0), (3L, "y", 4.0))
    val after = Seq((3L, "y", 4.0))
    val st = IncrementalAgg.maintain(
      IncrementalAgg.initialize(table(base), Seq("k"), "v"),
      feedOf(base, after), Seq("k"), "v")
    assert(stateRows(st).map(_._1) == Set("y"),
      "key x folded to zero rows and must vanish, not linger at n=0")
  }
}
