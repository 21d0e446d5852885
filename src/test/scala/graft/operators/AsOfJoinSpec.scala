package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  test("backward as-of picks latest right row at-or-before each left time") {
    val left = Seq(
      ("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 5L, "c"),
      ("u2", 15L, "d"), ("u3", 9L, "e"))
      .toDF("key", "t", "tag")
    val right = Seq(
      ("u1", 7L, 100.0), ("u1", 10L, 200.0), ("u1", 18L, 300.0),
      ("u2", 16L, 400.0))
      .toDF("key", "t", "rv")

    val out = AsOfJoin.backward(left, right, "key", "t", "t", Seq("t", "rv"))
      .select("key", "t", "tag", "asof_t", "asof_rv")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSet

    assert(out == Set(
      ("u1", 10L, "a", Some(10L), Some(200.0)), // inclusive match at equal t
      ("u1", 20L, "b", Some(18L), Some(300.0)),
      ("u1", 5L, "c", None, None),              // nothing at/before 5
      ("u2", 15L, "d", None, None),             // right row is later (16)
      ("u3", 9L, "e", None, None)))             // key absent on right
  }

  test("forward as-of picks earliest right row at-or-after each left time") {
    val left = Seq(
      ("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 5L, "c"),
      ("u2", 15L, "d"), ("u3", 9L, "e"))
      .toDF("key", "t", "tag")
    val right = Seq(
      ("u1", 7L, 100.0), ("u1", 10L, 200.0), ("u1", 18L, 300.0),
      ("u2", 16L, 400.0))
      .toDF("key", "t", "rv")

    val out = AsOfJoin.forward(left, right, "key", "t", "t", Seq("t", "rv"))
      .select("key", "t", "tag", "asof_t", "asof_rv")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSet

    assert(out == Set(
      ("u1", 10L, "a", Some(10L), Some(200.0)), // inclusive match at equal t
      ("u1", 20L, "b", None, None),             // nothing at/after 20
      ("u1", 5L, "c", Some(7L), Some(100.0)),
      ("u2", 15L, "d", Some(16L), Some(400.0)),
      ("u3", 9L, "e", None, None)))             // key absent on right
  }

  test("matched row is attached atomically: carried nulls stay null") {
    val left = Seq(("u1", 10L, "x")).toDF("key", "t", "tag")
    // the TRUE match (t=8) has a null rv; an older row (t=5) has a value —
    // a per-column carry would leak 100.0 from t=5 into the t=8 match
    val right = Seq(
      ("u1", 5L, Some(100.0)), ("u1", 8L, Option.empty[Double]))
      .toDF("key", "t", "rv")
    val r = AsOfJoin.backward(left, right, "key", "t", "t", Seq("t", "rv"))
      .select("asof_t", "asof_rv").head()
    assert(r.getLong(0) == 8L && r.isNullAt(1))
  }

  test("null timestamps match nothing on either side") {
    val left = Seq(("u1", Some(10L), "a"), ("u1", Option.empty[Long], "b"))
      .toDF("key", "t", "tag")
    val right = Seq(("u1", Option.empty[Long], 1.0), ("u1", Some(4L), 2.0))
      .toDF("key", "t", "rv")
    val out = AsOfJoin.backward(left, right, "key", "t", "t", Seq("rv"))
      .select("tag", "asof_rv").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSet
    // "a" matches the t=4 row; "b" (null time) and the null-time right
    // row produce no match
    assert(out == Set(("a", Some(2.0)), ("b", None)))
  }
}
