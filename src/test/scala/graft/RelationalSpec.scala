package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, Sessionize}

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("surrogateKey assigns dense 0-based ids in order") {
    val df = Seq(("c", 3), ("a", 1), ("b", 2)).toDF("k", "v")
    val out = Relational.surrogateKey(df, "id", Seq(col("k"))).orderBy("id")
      .select("k", "id").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("a", 0L), ("b", 1L), ("c", 2L)))
  }

  test("surrogateKeyUnordered ids are unique without a sort") {
    val df = spark.range(1000).toDF("v")
    val out = Relational.surrogateKeyUnordered(df, "id")
    assert(out.select("id").distinct().count() == 1000)
  }

  test("scd2Apply handles change, delete, insert, and no-op in one pass") {
    val history = Seq(
      (1L, "alice", "2020-01-01", null.asInstanceOf[String]), // will change
      (2L, "bob", "2020-01-01", null.asInstanceOf[String]),   // unchanged
      (3L, "carol", "2020-01-01", null.asInstanceOf[String]), // deleted
      (1L, "old-alice", "2019-01-01", "2020-01-01"))          // closed: pass through
      .toDF("k", "name", "valid_from", "valid_to")
    val snapshot = Seq(
      (1L, "alice2"), // changed
      (2L, "bob"),    // same
      (4L, "dave"))   // new
      .toDF("k", "name")
    val out = Relational.scd2Apply(history, snapshot, Seq("k"), Seq("name"), "2024-06-01")
      .select("k", "name", "valid_from", "valid_to")
      .as[(Long, String, String, Option[String])].collect().toSet
    assert(out == Set(
      (1L, "alice", "2020-01-01", Some("2024-06-01")),  // closed old version
      (1L, "alice2", "2024-06-01", None),               // new open version
      (2L, "bob", "2020-01-01", None),                  // untouched
      (3L, "carol", "2020-01-01", Some("2024-06-01")),  // logical delete
      (4L, "dave", "2024-06-01", None),                 // insert
      (1L, "old-alice", "2019-01-01", Some("2020-01-01")))) // closed history
  }

  test("repeatRows duplicates every row n times") {
    val df = Seq(1, 2).toDF("v")
    assert(Relational.repeatRows(df, 3).count() == 6)
  }

  test("dedupKeepFirst keeps exactly the first row per key by the given order") {
    val df = Seq(("k1", 2, "second"), ("k1", 1, "first"), ("k2", 9, "only"))
      .toDF("k", "ord", "tag")
    val out = Relational.dedupKeepFirst(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").select("tag").as[String].collect()
    assert(out.toSeq == Seq("first", "only"))
  }

  test("groupTransformCount attaches group sizes then dedups") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val out = Relational.groupTransformCount(df, "k", "n", Seq(col("v")))
      .orderBy("k").select("k", "n").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("a", 2L), ("b", 1L)))
  }

  test("topKByAgg plans TakeOrderedAndProject (no global sort)") {
    val df = spark.range(100).toDF("v")
    val plan = Relational.topKByAgg(df, 5, Seq(col("v").desc))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("hash sampling is deterministic and key-stable across repartitioning") {
    val df = spark.range(10000).toDF("k")
    val sampled = df
      .filter(substring(md5(col("k").cast("string")), 1, 2) < "04")
    val once = sampled.select("k").as[Long].collect().toSet
    val again = df.repartition(7)
      .filter(substring(md5(col("k").cast("string")), 1, 2) < "04")
      .select("k").as[Long].collect().toSet
    assert(once == again)              // partitioning-independent
    assert(once.nonEmpty && once.size < 1000) // ~4/256 ≈ 156 expected
  }

  test("top-k per group emits at most k rows per group in rank order") {
    val df = Seq(("a", 5), ("a", 3), ("a", 9), ("a", 1), ("b", 2))
      .toDF("g", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc)
    val out = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 2)
      .orderBy("g", "rnk").select("g", "v").as[(String, Int)].collect()
    assert(out.toSeq == Seq(("a", 9), ("a", 5), ("b", 2)))
  }

  test("asofJoin picks the latest right row at-or-before each left ts") {
    val left = Seq((1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 3L, "e0"), (2L, 3L, "f0"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 4L, 40.0), (1L, 9L, 90.0), (1L, 10L, 100.0), (2L, 7L, 70.0))
      .toDF("k", "ts", "p")
    val out = Relational.asofJoin(left, right, "k", "ts", Seq("p"))
      .select("tag", "p").as[(String, Option[Double])].collect().toMap
    // e0@3: no purchase yet; e1@5: latest is 4→40; e2@10: same-ts right wins (100)
    assert(out == Map("e0" -> None, "e1" -> Some(40.0), "e2" -> Some(100.0),
      "f0" -> None))
  }

  test("rangeJoinBinned pairs each point with exactly its containing intervals") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val points = Seq((1L, t("2024-01-01 10:30:00"), "in1"),
      (1L, t("2024-01-01 13:00:00"), "in2"), (1L, t("2024-01-01 09:59:59"), "out"),
      (2L, t("2024-01-01 10:30:00"), "wrongkey"))
      .toDF("k", "ts", "tag")
    val intervals = Seq(
      (1L, t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"), "iv1"),
      (1L, t("2024-01-01 10:15:00"), t("2024-01-01 14:00:00"), "iv2"))
      .toDF("k", "start_ts", "end_ts", "iv")
    val out = Relational.rangeJoinBinned(points, intervals, "k",
        "ts", "start_ts", "end_ts", binMillis = 1800000L)
      .select("tag", "iv").as[(String, String)].collect().toSet
    // in1 ∈ both intervals (exactly once each despite multi-bin overlap);
    // in2 only iv2; boundary-exclusive point and wrong key drop out
    assert(out == Set(("in1", "iv1"), ("in1", "iv2"), ("in2", "iv2")))
  }

  test("sessionize splits on gaps > threshold") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1L),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 1L))
      .toDF("event_id", "ts", "user_id")
    val out = Sessionize.byGap(df, "user_id", "ts", "event_id", 1800000L)
      .orderBy("event_id").select("session_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 1L, 2L))
  }
}
