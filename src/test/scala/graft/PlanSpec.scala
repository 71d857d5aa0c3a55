package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions (SURVEY §5): the optimizations the engine claims
  * must be visible in the physical plan, not just intended.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  test("q1 pushes the shipdate filter and prunes columns at the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey")) // pruned: not referenced by q1
  }

  test("q5 multi-join broadcasts every dimension side") {
    val p = plan("q5_nation_volume")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.toLowerCase.contains("sortmergejoin") ||
      p.split("BroadcastHashJoin").length >= 4)
  }

  test("flagship top-k compiles to TakeOrderedAndProject") {
    assert(plan("q_topk_join").contains("TakeOrderedAndProject"))
  }

  test("projection queries read only the projected columns") {
    val p = plan("q_project_drop")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_extendedprice"))
  }

  test("dedup fan-out self-join pins its partitioning against AQE coalescing") {
    // The candidate self-join has tiny inputs but 100x fan-out; AQE would
    // coalesce it onto 1-2 threads (it sizes by input bytes). The numbered
    // repartition (REPARTITION_BY_NUM) is exempt from coalescing.
    val p = plan("d_ngram_jaccard")
    assert(p.contains("REPARTITION_BY_NUM"), s"expected pinned repartition in:\n$p")
  }

  test("hash sampling pushes nothing but still prunes to the 3 output columns") {
    val p = plan("q_hash_sample")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("o_totalprice"))
  }

  test("whole-stage codegen covers the q1 aggregation (final AQE plan)") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, d)
    df.collect() // resolve AQE to the final plan
    // codegen'd operators print with a "*(stageId)" prefix in the final plan
    assert("""\*\(\d+\)""".r.findFirstIn(df.queryExecution.executedPlan.toString).nonEmpty)
  }
}
