package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Incremental

/** Incremental aggregate maintenance (SURVEY §2 A20): merging a stored
  * aggregate with a delta aggregate must be indistinguishable from a
  * full rebuild — including keys only in the delta, keys only in the
  * store, and repeated refresh cycles.
  */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def aggOf(rows: Seq[(String, Long, Double)]) =
    rows.toDF("k", "n", "s").groupBy("k")
      .agg(sum("n").as("n"), sum("s").as("s"))

  test("merge equals full rebuild with new, untouched, and updated keys") {
    val history = Seq(("a", 1L, 1.0), ("a", 1L, 2.0), ("b", 1L, 5.0))
    val delta = Seq(("a", 1L, 4.0), ("c", 1L, 9.0)) // updates a, adds c, leaves b
    val merged = Incremental.mergeAdditive(aggOf(history), aggOf(delta),
        Seq("k"), Seq("n", "s"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val rebuilt = aggOf(history ++ delta)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(merged == rebuilt)
    assert(merged == Seq(("a", 3L, 7.0), ("b", 1L, 5.0), ("c", 1L, 9.0)))
  }

  test("repeated refresh cycles stay exact (merge is associative)") {
    val d0 = Seq(("x", 1L, 1.0))
    val d1 = Seq(("x", 1L, 2.0), ("y", 1L, 3.0))
    val d2 = Seq(("y", 2L, 4.0))
    val twice = Incremental.mergeAdditive(
      Incremental.mergeAdditive(aggOf(d0), aggOf(d1), Seq("k"), Seq("n", "s")),
      aggOf(d2), Seq("k"), Seq("n", "s"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(twice == Seq(("x", 2L, 3.0), ("y", 3L, 7.0)))
  }

  test("empty delta is a no-op refresh") {
    val stored = aggOf(Seq(("a", 2L, 3.0)))
    val out = Incremental.mergeAdditive(stored, aggOf(Nil), Seq("k"), Seq("n", "s"))
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", 2L, 3.0)))
  }
}
