package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("r")).collect().head.getAs[T]("r")

  private def toks(text: String): Seq[String] =
    one[scala.collection.Seq[String]](TextFunctions.tokens(col("text")), text).toSeq

  test("approx_top_k heavy hitters contain the exact top-10 with exact counts") {
    // binds t_frequent_tokens_approx (rows-only) to the oracled C7: at
    // 10000 tracked items the sketch is exact for every token the corpus
    // actually ranks in its top-10
    val exact = SparkEntry.queries("t_frequent_tokens")(spark, TestSpark.sfDir)
      .limit(10).collect().map(r => (r.getAs[String]("tok"), r.getAs[Long]("n"))).toSet
    val approx = SparkEntry.queries("t_frequent_tokens_approx")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getAs[String]("tok"), r.getAs[Long]("n"))).toSet
    assert(exact.subsetOf(approx),
      s"missing from sketch top-20: ${exact -- approx}")
  }

  test("tokens lowercases, strips punctuation, drops empties") {
    assert(toks("  Hello, WORLD!2x  ") == Seq("hello", "world", "2x"))
  }

  test("tokens of empty/whitespace text is empty") {
    assert(toks("  ,;  ").isEmpty)
    assert(toks("").isEmpty)
  }

  test("charFingerprint matches a reference fold") {
    val expected = "ab".foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)
    assert(one[Long](TextFunctions.charFingerprint(col("text")), "ab") == expected)
  }

  test("xxFingerprint is deterministic and text-sensitive") {
    val a = one[Long](TextFunctions.xxFingerprint(col("text")), "abc")
    val b = one[Long](TextFunctions.xxFingerprint(col("text")), "abd")
    assert(a == one[Long](TextFunctions.xxFingerprint(col("text")), "abc"))
    assert(a != b)
  }

  test("native stopwordScores equals the per-profile HOF stopwordCount on real docs") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .withColumn("__toks", TextFunctions.tokens(col("text")))
      .withColumn("__scores", TextFunctions.stopwordScores(col("__toks")))
    val mismatches = TextFunctions.langProfiles.zipWithIndex.map { case ((_, words), i) =>
      docs.filter(element_at(col("__scores"), i + 1) =!=
        TextFunctions.stopwordCount(col("__toks"), words)).count()
    }.sum
    assert(mismatches == 0)
  }

  test("langId picks the profile with most stopword hits, ties alphabetical") {
    val df = Seq("the cat and the hat is back", "el que no la de y en un")
      .toDF("text").withColumn("__toks", TextFunctions.tokens(col("text")))
    val scored = TextFunctions.langProfiles.foldLeft(df) { case (acc, (lang, words)) =>
      acc.withColumn(s"s_$lang", TextFunctions.stopwordCount(col("__toks"), words))
    }
    val preds = scored.select(TextFunctions.langIdFromScores(
      TextFunctions.langProfiles.map { case (l, _) => col(s"s_$l") }).as("p"))
      .as[String].collect()
    assert(preds.toSeq == Seq("en", "es"))
  }

  test("qualityScore is bounded by construction") {
    val comps = TextFunctions.qualityComponents(col("text"))
    val df = Seq("The quick brown fox jumps over the lazy dog.", "", "!!!")
      .toDF("text")
    val withComps = comps.foldLeft(df) { case (acc, (n, c)) => acc.withColumn(n, c) }
    val scores = withComps.select(TextFunctions.qualityScore(
      col("n_tokens"), col("punct_ratio"), col("stop_ratio"), col("avg_token_len")).as("q"))
      .as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("graft_nfc composes decomposed accents; ASCII is untouched (C15)") {
    // "cafe"+combining-acute (5 cp) -> composed e-acute (4 cp);
    // a+acute, e+grave, o (5 cp) -> 3 composed cp
    val df = Seq("cafe\u0301", "plain ascii", "a\u0301e\u0300o").toDF("t")
    val got = df.select(
        TextFunctions.nfcNormalize(col("t")).as("n"),
        length(col("t")).as("lraw"),
        length(TextFunctions.nfcNormalize(col("t"))).as("lnfc"))
      .as[(String, Int, Int)].collect().toSeq
    assert(got == Seq(
      ("caf\u00e9", 5, 4),
      ("plain ascii", 11, 11),
      ("\u00e1\u00e8o", 5, 3)))
  }

  test("graft_strip_accents recovers the unaccented base (C15)") {
    // composed, decomposed, tilde, plain, empty
    val df = Seq("caf\u00e9", "cafe\u0301", "na\u0303o", "none", "").toDF("t")
    val got = df.select(TextFunctions.stripAccents(col("t")))
      .as[String].collect().toSeq
    assert(got == Seq("cafe", "cafe", "nao", "none", ""))
  }

  test("normalization expressions are null-safe and SQL-callable") {
    val df = Seq(Option("a\u0301"), None).toDF("t")
    df.createOrReplaceTempView("norm_in")
    val got = spark.sql(
      "SELECT graft_nfc(t), graft_strip_accents(t) FROM norm_in ORDER BY t NULLS FIRST")
      .as[(Option[String], Option[String])].collect().toSeq
    assert(got == Seq((None, None), (Some("\u00e1"), Some("a"))))
  }

  test("graft_jaro_winkler reproduces the DuckDB variant on the discriminating probes (D12)") {
    // expected values are DuckDB jaro_winkler_similarity outputs, which
    // pin: the 0.7 boost threshold (abcdef/abxxxx keeps raw jaro despite
    // a 2-char prefix), window max/2-1 (ab/ba -> 0), prefix cap 4
    // (prefixzz/prefixaa -> 0.9, not 0.93), and empty -> 0 even for ""/"".
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dwayne", "duane", 0.8400000000000001),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("abc", "xyz", 0.0),
      ("abcdef", "abxxxx", 0.5555555555555555),
      ("a", "a", 1.0),
      ("a", "", 0.0),
      ("", "", 0.0),
      ("prefixzz", "prefixaa", 0.9),
      ("ab", "ba", 0.0),
      ("red widget", "red gadget", 0.895),
      ("small ring", "small rings", 0.9818181818181818))
    // interpreted path
    cases.foreach { case (a, b, want) =>
      val got = graft.functions.JaroWinklerImpl.jw(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(math.abs(got - want) < 1e-12, s"jw($a, $b): got $got want $want")
    }
    // codegen path through the registered SQL function, plus null safety
    val df = (cases.map { case (a, b, w) => (Option(a), Option(b), w) } :+
      ((None: Option[String]), Option("x"), -1.0)).toDF("a", "b", "w")
    val rows = df.selectExpr("graft_jaro_winkler(a, b) AS jw", "w").collect()
    rows.foreach { r =>
      if (r.getDouble(1) < 0) assert(r.isNullAt(0), "null input must yield null")
      else assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }
}
