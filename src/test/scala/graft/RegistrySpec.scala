package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the driver contract that would otherwise fail SILENTLY:
  * `SparkEntry.queries` is a Map, so a duplicate query name would shadow
  * an entry (one query vanishes from the registry with no error), and
  * `Bench` filters its headline list through `queries.contains`, so a
  * typo'd headline would simply drop out of the benchmark.
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique — nothing is shadowed in the registry Map") {
    val raw = SparkEntry.registry.map(_.name)
    val dupes = raw.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dupes.isEmpty, s"duplicate query names shadow entries: $dupes")
    assert(SparkEntry.queries.size == raw.size)
    assert(raw.forall(_.startsWith("q_")))
  }

  test("every oracle belongs to a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every Bench headline exists in the registry") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names missing from registry: $missing")
  }
}
