package graft

import org.scalatest.funsuite.AnyFunSuite

/** Binds m_lift_gains_binned (rows-only, F16x) to its exact twin: the
  * B14x ladder is only real if the binned scale path reproduces the
  * global-ntile answer up to the one quantity it estimates (pro-rata
  * positive allocation inside a boundary-straddling score bin).
  */
class LiftGainsBinnedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("binned lift/gains: decile sizes exact, positives and lift in tight agreement") {
    val exact = SparkEntry.queries("m_lift_gains")(spark, TestSpark.sfDir)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5))).toMap
    val binned = SparkEntry.queries("m_lift_gains_binned")(spark, TestSpark.sfDir)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(4), r.getDouble(5))).toMap
    assert(exact.keySet == binned.keySet && exact.size == 10)
    val tpos = exact.values.map(_._2).sum.toDouble
    exact.foreach { case (dec, (nExact, nposExact, liftExact, capExact)) =>
      val (nBinned, nposBinned, liftBinned, capBinned) = binned(dec)
      // ntile sizes are pure arithmetic over N — the overlap allocation
      // must land them bit-for-bit
      assert(nBinned == nExact, s"decile $dec size: $nBinned vs $nExact")
      // positives differ only by the pro-rata split of boundary bins;
      // a boundary bin holds one score value's ties, so the absolute
      // error is bounded by that bin's positives — tight relative to a
      // decile's total
      assert(math.abs(nposBinned - nposExact) / math.max(nposExact, 1L) < 0.15,
        s"decile $dec npos: $nposBinned vs $nposExact")
      assert(math.abs(liftBinned - liftExact) / liftExact < 0.15,
        s"decile $dec lift: $liftBinned vs $liftExact")
      // cumulative capture absorbs boundary errors with a fixed bound:
      // at most one straddling bin per boundary
      assert(math.abs(capBinned - capExact) < 0.05,
        s"decile $dec cum_capture: $capBinned vs $capExact")
    }
    // estimates must conserve the totals exactly (allocation, not loss)
    val nposSum = binned.values.map(_._2).sum
    assert(math.abs(nposSum - tpos) < 1e-6 * tpos + 1e-6,
      s"allocated positives $nposSum vs total $tpos")
  }
}
