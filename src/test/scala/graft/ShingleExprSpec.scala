package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Bit-identity of the native graft_shingles expression vs the HOF
  * formulation (tokens + wordNgrams) it replaces on the hot path. */
class ShingleExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cases = Seq(
    "the quick brown fox",
    "  Leading  and   trailing   spaces  ",
    "UPPER lower MiXeD 123 abc9z",
    "punct!!!and---separators...here,now",
    "one",
    "one two",
    "",
    "!!!???...",
    "a b c d e f g",
    "tabs\tand\nnewlines\r\nhere",
    "digits 007 in 2024 tokens",
    "x" * 300 + " y " + "z" * 5)

  private def viaHof(n: Int) =
    cases.toDF("text").select(
      Dedup.wordNgrams(TextFunctions.tokens(col("text")), n).as("g"))

  private def viaExpr(n: Int) =
    cases.toDF("text").select(
      call_function("graft_shingles", col("text"), lit(n)).as("g"))

  test("graft_shingles matches the HOF formulation for n = 1, 2, 3, 5") {
    for (n <- Seq(1, 2, 3, 5)) {
      val hof = viaHof(n).as[Seq[String]].collect()
      val ex = viaExpr(n).as[Seq[String]].collect()
      assert(ex.toSeq == hof.toSeq, s"mismatch at n=$n")
    }
  }

  test("graft_shingles matches on randomized ASCII text") {
    val rng = new scala.util.Random(42)
    val alphabet = "abcXYZ019 ,.!-_\t"
    val texts = Seq.fill(200)(
      (0 until rng.nextInt(80)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = texts.toDF("text")
    val both = df.select(
      call_function("graft_shingles", col("text"), lit(2)).as("ex"),
      Dedup.wordNgrams(TextFunctions.tokens(col("text")), 2).as("hof"))
    assert(both.filter(col("ex") =!= col("hof")).count() == 0)
  }

  test("null text gives null shingles") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("text")
    val out = df.select(call_function("graft_shingles", col("text"), lit(2)).as("g"))
      .collect()
    assert(out(0).isNullAt(0) && !out(1).isNullAt(0))
  }

  test("graft_cdc_windows matches the declarative explode/filter/md5 chain (incl. multi-byte text)") {
    val rng = new scala.util.Random(7)
    val alphabet = "abc XYZ 019.,!é漢" // exercises 2- and 3-byte UTF-8
    val texts = Seq.fill(120)(
      (0 until (64 + rng.nextInt(200)))
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString) ++
      Seq("", "short", "x" * 64, "y" * 63)
    val df = texts.toDF("text")
    val hof = df
      .select(col("text"), explode(expr(
        "CASE WHEN length(text) >= 64 THEN sequence(1, length(text)-63) ELSE array() END")).as("o"))
      .filter(expr("md5(substring(text, o, 8)) LIKE '0%'"))
      .select(col("text"), md5(expr("substring(text, o, 64)")).as("h"))
      .groupBy("text").agg(collect_list("h").as("hof"))
    val ex = df.select(col("text"),
      call_function("graft_cdc_windows", col("text"), lit(64), lit(8)).as("ex"))
    val joined = ex.join(hof, Seq("text"), "left")
      .select(col("ex"), coalesce(col("hof"), array()).as("hof"))
    assert(joined.filter(col("ex") =!= col("hof")).count() == 0)
  }
}
