package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows on a skewed key") {
    // 90% of the big side lands on one hot key.
    val big = spark.range(2000)
      .select((when(col("id") % 10 < 9, 7L).otherwise(col("id") % 5)).as("k"),
        col("id").as("v"))
    val small = Seq((7L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedJoin preserves left-join unmatched rows") {
    val big = Seq((1L, "x"), (9L, "unmatched")).toDF("k", "v")
    val small = Seq((1L, "dim")).toDF("k", "name")
    val out = Skew.saltedJoin(big, small, "k", salts = 4, joinType = "left")
      .select("k", "name").as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> Some("dim"), 9L -> None))
  }

  test("saltedDistinctCount matches exact countDistinct per key") {
    val df = spark.range(5000)
      .select((col("id") % 3).as("k"), (col("id") % 617).as("v"))
    val exact = df.groupBy("k").agg(countDistinct("v").as("n"))
      .as[(Long, Long)].collect().toMap
    val salted = Skew.saltedDistinctCount(df, "k", "v", salts = 16)
      .as[(Long, Long)].collect().toMap
    assert(salted == exact)
  }
}
