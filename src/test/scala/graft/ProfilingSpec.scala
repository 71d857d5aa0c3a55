package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiling
import graft.sources.Tables

/** A18 column profiler. The driver oracle exercises it on `orders`, which
  * has NO nulls — these specs cover the paths the oracle can't: null
  * accounting, mixed-type melt, and exact↔approx agreement. */
class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val mixed = Seq(
    (Some(1L), Some("a"), Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
    (Some(2L), None, Some(Timestamp.valueOf("2024-01-03 00:00:00"))),
    (None, Some("b"), None),
    (Some(2L), Some("a"), Some(Timestamp.valueOf("2024-01-03 00:00:00"))))
    .toDF("k", "s", "ts")

  test("profiler counts nulls and distincts per column in one melt pass") {
    val out = Profiling.profile(mixed, Seq("k", "s", "ts"))
      .orderBy("col_name").collect()
    val byName = out.map(r => r.getString(0) -> r).toMap
    val k = byName("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 1 && k.getLong(3) == 2)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 2.0)
    assert(k.isNullAt(6) && k.isNullAt(7)) // no string stats for numerics
    val s = byName("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.getString(6) == "a" && s.getString(7) == "b")
    assert(s.isNullAt(4) && s.isNullAt(5)) // no numeric stats for strings
    val ts = byName("ts")
    assert(ts.getLong(2) == 1 && ts.getLong(3) == 2)
    assert(ts.getDouble(5) - ts.getDouble(4) == 2 * 86400_000.0) // epoch ms span
  }

  test("all-null column profiles to zero distincts and null extrema") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("k", "s")
    val r = Profiling.profile(df, Seq("s")).collect().head
    assert(r.getLong(1) == 2 && r.getLong(2) == 2 && r.getLong(3) == 0)
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
  }

  test("approx profile agrees with exact on everything but the estimator") {
    val cols = Seq("o_orderkey", "o_orderstatus", "o_totalprice")
    val exact = Profiling.profile(Tables.orders(spark, TestSpark.sfDir), cols)
      .orderBy("col_name").collect()
    val approx = Profiling.profile(Tables.orders(spark, TestSpark.sfDir), cols,
      approx = true).orderBy("col_name").collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getString(0) == a.getString(0))
      assert(e.getLong(1) == a.getLong(1) && e.getLong(2) == a.getLong(2))
      // HLL default rsd is 5%; allow 3 sigma
      val (de, da) = (e.getLong(3).toDouble, a.getLong(3).toDouble)
      assert(math.abs(de - da) <= math.max(3.0, de * 0.15),
        s"${e.getString(0)}: exact $de vs approx $da")
      assert(e.get(4) == a.get(4) && e.get(5) == a.get(5))
      assert(e.get(6) == a.get(6) && e.get(7) == a.get(7))
    }
  }

  test("approx profile plans without a multi-distinct Expand") {
    val p = Profiling.profile(Tables.orders(spark, TestSpark.sfDir),
      Seq("o_orderkey", "o_orderstatus"), approx = true)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), s"unexpected Expand in approx profile:\n$p")
  }
}
