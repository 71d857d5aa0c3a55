package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.StagedTables

/** The bench's staging-disclosure machinery (ADVICE r12): prebuild must
  * force a fresh build of every registered staged table and report a
  * real (measured) cost per tag, so the bench artifact can disclose the
  * amortization its timed consumers enjoy. */
class StagedTablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("prebuild forces a fresh build of every registered staged table and logs its cost") {
    val builds = StagedTables.prebuild(spark, TestSpark.sfDir)
    // every disclosure tag built (fresh — prebuild deletes first)
    assert(builds.keySet == StagedTables.consumers.keySet,
      s"built ${builds.keySet}, registered ${StagedTables.consumers.keySet}")
    assert(builds.values.forall(_ > 0.0), "build costs must be measured, not zero")
    // staged content round-trips (spot-check the shared fact)
    val ol = StagedTables.orderLines(spark, TestSpark.sfDir)
    assert(ol.count() > 0)
    assert(ol.columns.toSet == Set("l_orderkey", "l_partkey", "l_shipdate",
      "o_custkey", "o_orderdate", "o_orderpriority"))
    // a second access does NOT rebuild: the log keeps the prebuild cost
    val before = StagedTables.buildLog.get("orderlines")
    StagedTables.orderLines(spark, TestSpark.sfDir).count()
    assert(StagedTables.buildLog.get("orderlines") == before,
      "consumers after prebuild must reuse the staged parquet")
    // every consumer list names registered queries or downstream staged
    // tags (disclosure stays truthful as the query surface evolves) —
    // tag-consuming-tag edges model the staged build chains
    val registered = SparkEntry.queries.keySet ++ StagedTables.consumers.keySet
    val unknown = StagedTables.consumers.values.flatten.toSet.diff(registered)
    assert(unknown.isEmpty, s"consumer lists name unregistered queries: $unknown")
  }
}
