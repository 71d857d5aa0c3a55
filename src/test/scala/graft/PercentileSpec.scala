package graft

import org.scalatest.funsuite.AnyFunSuite

class PercentileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx percentile scale path tracks the exact discrete percentiles") {
    val exact = SparkEntry.queries("q_percentiles")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = SparkEntry.queries("q_approx_percentiles")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(exact.keySet == approx.keySet)
    // At sf0.001 group sizes are << the 10000 accuracy, so the sketch
    // holds every value: within one discrete step of the exact answer.
    exact.foreach { case (g, (p50, p90)) =>
      val (a50, a90) = approx(g)
      assert(math.abs(a50 - p50) / p50 < 0.02, s"$g p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 < 0.02, s"$g p90: $a90 vs $p90")
    }
  }
}
