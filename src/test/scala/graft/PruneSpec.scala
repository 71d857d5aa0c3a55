package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Prune
import graft.sources.Tables

/** Bloom-pruned semi-join (SURVEY §2 B18): exact-result equivalence with
  * the plain semi-join, the false-positive-only guarantee at the filter
  * level, string-key hashing parity, and the plan shape that is the
  * operator's whole point — the probe runs scan-side, BELOW the join's
  * exchange.
  */
class PruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val d = TestSpark.sfDir

  test("bloomPrunedSemiJoin equals the plain semi-join on real tables") {
    val li = Tables.lineitem(spark, d)
    val urgent = Tables.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT")
    val plain = li.join(urgent.select("o_orderkey").distinct(),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .as[(Long, Long)].collect().sorted.toSeq
    val pruned = Prune.bloomPrunedSemiJoin(li, "l_orderkey", urgent, "o_orderkey",
        expectedKeys = 100000L)
      .select("l_orderkey", "l_linenumber")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(pruned == plain && plain.nonEmpty)
  }

  test("bloom probe alone admits every true key (no false negatives)") {
    val keys = spark.range(500).select((col("id") * 7).as("k"))
    val bf = keys.stat.bloomFilter("k", 1000, 0.01)
    val probeBytes = graft.functions.BloomExprs.serialize(bf)
    val trueKeys = spark.range(500).select((col("id") * 7).as("k"))
    val admitted = trueKeys
      .filter(call_function("graft_bloom_contains", col("k"), lit(probeBytes)))
      .count()
    assert(admitted == 500) // Bloom filters never drop a member
  }

  test("string keys hash identically on build and probe sides") {
    val dim = Seq("alpha", "beta", "gamma").toDF("name")
    val fact = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
      .toDF("name").withColumn("v", length(col("name")))
    val out = Prune.bloomPrunedSemiJoin(fact, "name", dim, "name", 100L)
      .select("name").as[String].collect().sorted.toSeq
    assert(out == Seq("alpha", "beta", "gamma"))
  }

  test("null fact keys are dropped, matching semi-join semantics") {
    val dim = Seq(1L, 2L).toDF("k")
    val fact = Seq(Some(1L), Some(3L), None).toDF("k")
    val out = Prune.bloomPrunedSemiJoin(fact, "k", dim, "k", 10L)
      .as[Option[Long]].collect().toSeq
    assert(out == Seq(Some(1L)))
  }

  test("the bloom probe filters BELOW the join (scan side of the exchange)") {
    val df = SparkEntry.queries("q_bloom_prune")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the probe must appear in a Filter, and that Filter must not sit
    // above the semi join — split the plan at the join operator and
    // require the probe in the BELOW part
    assert(p.contains("graft_bloom_contains") || p.contains("BloomContainsExpr"),
      s"probe expression missing from plan:\n$p")
    val joinAt = p.indexOf("LeftSemi")
    val probeAt = p.lastIndexOf("graft_bloom_contains")
    assert(joinAt >= 0 && probeAt > joinAt,
      "probe filter should be in the subtree below (printed after) the semi join")
  }
}
