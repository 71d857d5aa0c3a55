package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Diff, Expectations}

/** Snapshot diff (SURVEY §2 A22) and data-quality expectations (A23):
  * the change set must be exactly the planted inserts/updates/deletes —
  * including null→value transitions — and the rule report must count the
  * planted violations, not just pass on clean data.
  */
class DiffExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshotDiff emits exactly the planted insert/update/delete set") {
    val oldSnap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "s", "v")
    val newSnap = Seq((1L, "a", 10.0), // unchanged — must NOT appear
      (2L, "B", 20.0), // update (string change)
      (3L, "c", 35.0), // update (value change)
      (5L, "e", 50.0)) // insert; 4 deleted
      .toDF("k", "s", "v")
    val got = Diff.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("s", "v"))
      .orderBy("k")
      .select("k", "op", "old_s", "new_s", "old_v", "new_v")
      .as[(Long, String, String, String, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      (2L, "update", "b", "B", Some(20.0), Some(20.0)),
      (3L, "update", "c", "c", Some(30.0), Some(35.0)),
      (4L, "delete", "d", null, Some(40.0), None),
      (5L, "insert", null, "e", None, Some(50.0))))
  }

  test("snapshotDiff treats null→value and value→null as updates") {
    val oldSnap = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "s")
    val newSnap = Seq((1L, Some("y")), (2L, Option.empty[String]))
      .toDF("k", "s")
    val ops = Diff.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("s"))
      .orderBy("k").select("k", "op").as[(Long, String)].collect().toSeq
    assert(ops == Seq((1L, "update"), (2L, "update")))
  }

  test("identical snapshots diff to empty") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    assert(Diff.snapshotDiff(snap, snap, Seq("k"), Seq("s")).count() == 0L)
  }

  test("expectations counts planted violations in one report") {
    val df = Seq(
      (1L, Some(10.0), "O"),
      (2L, Some(-5.0), "O"),  // violates positive
      (3L, None, "X"),        // violates not_null (null pred → violation) and domain
      (3L, Some(7.0), "O")    // duplicate key
    ).toDF("k", "v", "status")
    val rep = Expectations.check(df, Seq(
        "v_positive" -> (col("v") > 0),
        "status_domain" -> col("status").isin("O", "F")),
        uniqueKeys = Seq("k"))
      .select("rule", "n_rows", "n_violations", "pass")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(rep == Seq(
      ("status_domain", 4L, 1L, false),
      ("unique_k", 4L, 1L, false),
      ("v_positive", 4L, 2L, false)))
  }

  test("expectations on a clean table passes every rule") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val rep = Expectations.check(df, Seq("pos" -> (col("v") > 0)),
        uniqueKeys = Seq("k"))
      .select("rule", "pass").as[(String, Boolean)].collect().toSeq
    assert(rep == Seq(("pos", true), ("unique_k", true)))
  }
}
