package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Pre-aggregated HLL rollup (SURVEY §2 A13x, q_hll_presketch): weekly
  * distincts estimated by unioning DAILY sketches must agree with the
  * exact weekly distinct count — the property that makes a stored sketch
  * table a valid substitute for re-scanning events.
  */
class HllRollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("union of daily sketches estimates weekly distincts within 5%") {
    val ev = Tables.events(spark, TestSpark.sfDir)
    val daily = ev.select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
    val approx = daily
      .withColumn("week", date_format(date_trunc("week", col("day")), "yyyy-MM-dd"))
      .groupBy("week")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
    val exact = ev
      .select(date_format(date_trunc("week", to_date(col("ts"))), "yyyy-MM-dd").as("week"),
        col("user_id"))
      .groupBy("week").agg(count_distinct(col("user_id")).as("exact_users"))
    val joined = approx.join(exact, "week").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_users").toDouble
      val e = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(a - e) / e <= 0.05,
        s"week ${r.getAs[String]("week")}: approx $a vs exact $e")
    }
  }
}
