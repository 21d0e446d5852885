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
    // SparkEntry.queries is already the Map; recover the raw count from
    // the per-module seqs to detect collapses
    val modules = Seq(
      graft.queries.CoreQueries.all, graft.queries.JoinQueries.all,
      graft.queries.TextQueries.all, graft.queries.DedupQueries.all,
      graft.queries.SimilarityQueries.all, graft.queries.MLQueries.all,
      graft.queries.StreamQueries.all, graft.queries.AdvancedQueries.all,
      graft.queries.MiscQueries.all, graft.queries.WindowQueries.all,
      graft.queries.StarJoinQueries.all, graft.queries.FunnelQueries.all,
      graft.queries.TimeSeriesQueries.all, graft.queries.CurationQueries.all,
      graft.queries.DataOpsQueries.all, graft.queries.PQQueries.all,
      graft.queries.SearchQueries.all, graft.queries.GraphQueries.all,
      graft.queries.EvalQueries.all)
    val raw = modules.flatten.map(_.name)
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
