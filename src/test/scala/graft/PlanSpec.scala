package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions (SURVEY §5): the optimizations the engine claims
  * must be visible in the physical plan, not just intended.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  test("q1 pushes the shipdate filter and prunes columns at the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey")) // pruned: not referenced by q1
  }

  test("q5 multi-join broadcasts every dimension side") {
    val p = plan("q5_nation_volume")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.toLowerCase.contains("sortmergejoin") ||
      p.split("BroadcastHashJoin").length >= 4)
  }

  test("q5 prunes ASIA scan-side: semi-joins on both linear sides, no post-join region filter") {
    // r13 change (verdict item 6): the r_name='ASIA' dim predicate is
    // pushed into customer AND supplier as broadcast semi-joins BEFORE
    // the fact joins, so downstream shuffles move only ASIA rows. The
    // plan must show (a) two LeftSemi broadcast joins, and (b) r_name
    // appearing only at the region SCAN (PushedFilters), never as a
    // Filter above a join.
    val p = plan("q5_nation_volume")
    assert(p.split("LeftSemi").length >= 3, s"expected 2 LeftSemi joins in:\n$p")
    // Structural check: every Filter mentioning r_name must sit in a
    // join-free subtree (the region dim scan); a Filter with any join
    // BELOW it would mean the predicate ran after rows were joined.
    import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec}
    def hasJoinBelow(n: SparkPlan): Boolean = n.collectFirst {
      case j: BaseJoinExec => j
      case j: BroadcastNestedLoopJoinExec => j
    }.isDefined
    val exec = SparkEntry.queries("q5_nation_volume")(spark, d).queryExecution.executedPlan
    val badFilters = exec.collect {
      case f: FilterExec if f.condition.toString.contains("r_name") && hasJoinBelow(f.child) => f
    }
    assert(badFilters.isEmpty,
      s"r_name Filter above a join:\n${badFilters.mkString("\n")}")
  }

  test("flagship top-k compiles to TakeOrderedAndProject") {
    assert(plan("q_topk_join").contains("TakeOrderedAndProject"))
  }

  test("projection queries read only the projected columns") {
    val p = plan("q_project_drop")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_extendedprice"))
  }

  test("dedup fan-out self-join pins its partitioning against AQE coalescing") {
    // The candidate self-join has tiny inputs but 100x fan-out; AQE would
    // coalesce it onto 1-2 threads (it sizes by input bytes). The numbered
    // repartition (REPARTITION_BY_NUM) is exempt from coalescing. Asserted
    // on the overlap BUILD itself (d_ngram_jaccard now reads the staged
    // candidate table, so the repartition lives in the staging pass).
    val p = operators.Dedup
      .setOverlapPairs(sources.Tables.documents(spark, d), "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("REPARTITION_BY_NUM"), s"expected pinned repartition in:\n$p")
  }

  test("t_unigram_ce reads the staged (doc,token) aggregate and broadcasts the vocabulary") {
    // r6 flagged run-to-run variance on this query; the plan shape is the
    // structural guard. Since r16 the (doc_id, tok, k) aggregate is the
    // staged doc_tok_cnt parquet (tokenize-once for the whole bag-of-words
    // family): every branch must read the STAGED FILE — if the staging is
    // lost, the tokenize+explode+agg reappears as an explode/generate over
    // documents — and the vocabulary/total joins must broadcast
    // (vocabulary-sized side, never a shuffle of the doc-token table).
    val p = plan("t_unigram_ce")
    assert(p.split("graft_doc_tok_cnt").length >= 3,
      s"expected two staged doc_tok_cnt reads (vocab build + per-doc agg) in:\n$p")
    assert(!p.contains("Generate"),
      s"expected NO tokenize explode (staged counts only) in:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast vocab join in:\n$p")
  }

  test("t_zipf_fit ranks over the aggregated vocabulary, not raw tokens") {
    // The global rank window is legal ONLY because its input is the
    // vocabulary-sized (tok, n) aggregate; a plan change that slides the
    // window below the aggregate would sort the full token stream on one
    // partition. Exactly one Window node, with the aggregate below it.
    val p = plan("t_zipf_fit")
    assert(p.split("\\bWindow\\b").length == 2, s"expected exactly one Window in:\n$p")
    val windowIdx = p.indexOf("Window")
    assert(p.indexOf("HashAggregate", windowIdx) > 0,
      s"expected the vocabulary aggregate BELOW the window in:\n$p")
  }

  test("bucketed orders⋈customer join has zero Exchange below the join (G9)") {
    // The q_bucketed_join claim: the custkey shuffle is paid ONCE at
    // bucket-build time, and the repeated join needs no exchange at all —
    // both scans' bucket layout satisfies the sort-merge join's
    // distribution requirement. An Exchange reappearing here means the
    // catalog lost the bucketing spec or the join stopped using it.
    val (ot, ct) = queries.EtlQueries.bucketedOrdersCustomer(spark, d)
    val joined = queries.EtlQueries.bucketedJoin(spark, ot, ct)
    joined.count() // materialize so AQE finalizes the plan
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected sort-merge join in:\n$p")
    assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
  }

  test("per-group top-k prunes to k rows per group BEFORE the shuffle") {
    // Historically Spark's WindowGroupLimit provided this partial
    // pruning (asserted here through round 8's first half); the native
    // TopKPerGroup operator (plans/TopKPerGroup.scala) now supersedes it —
    // heap-based partial before the exchange, no post-shuffle sort at
    // all. If a query-shape change ever breaks the rewrite AND the stock
    // pushdown, the window degenerates to a full sort+rank — catch it
    // here, not at 100 TB.
    val p = plan("q_topk_per_group")
    val prunes = p.split("TopKPerGroup").length >= 3 ||
      (p.contains("WindowGroupLimit") && p.contains("Partial"))
    assert(prunes, s"expected pre-shuffle per-group pruning in:\n$p")
  }

  test("hash sampling pushes nothing but still prunes to the 3 output columns") {
    val p = plan("q_hash_sample")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("o_totalprice"))
  }

  test("surrogate key has no single-partition window over the data") {
    // The data-sized stages are a range exchange + local sort; the only
    // window runs over the n-row per-partition offsets table.
    val p = plan("q_surrogate_key")
    assert(p.contains("rangepartitioning"), s"expected range exchange in:\n$p")
    val windowFrames = "Window ".r.findAllIn(p).size
    assert(windowFrames <= 1, s"unexpected extra window stages:\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"single-partition exchange in:\n$p")
  }

  test("salted join shuffles on (key, salt), never a plain hot key") {
    val p = plan("q_salted_join")
    assert(p.contains("__salt"), s"salt column missing from plan:\n$p")
  }

  test("IVF probe joins lists by equi-join — no cross join anywhere") {
    val p = plan("s_ann_ivf")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"IVF degenerated to a cross join:\n$p")
  }

  test("whole-stage codegen covers the q1 aggregation (final AQE plan)") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, d)
    df.collect() // resolve AQE to the final plan
    // codegen'd operators print with a "*(stageId)" prefix in the final plan
    assert("""\*\(\d+\)""".r.findFirstIn(df.queryExecution.executedPlan.toString).nonEmpty)
  }

  test("ewma self-join broadcasts the trailing-frame side and reuses the daily aggregate") {
    // the ×14 fan-out joins the DAILY aggregate to itself: the build side
    // must broadcast (dimension-sized at any scale), and the aggregate
    // subtree must plan once (ReusedExchange), not re-scan events
    val df = SparkEntry.queries("q_ewma")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("ReusedExchange"))
  }

  test("distribution audits are one scan + broadcast bounds, no window over data") {
    // q_psi_drift / m_calibration / q_benford: the bounds/total row rides
    // a BroadcastNestedLoopJoin (1-row cross join), the data side is one
    // scan with a partial agg — never a windowed or shuffled full pass
    for (name <- Seq("q_psi_drift", "m_calibration", "q_benford")) {
      val df = SparkEntry.queries(name)(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), s"$name plans a window over data")
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"$name does not broadcast its bounds row")
    }
  }

  test("graph joins broadcast at spec scale WITHOUT forced hints (r7 verdict #6)") {
    // g_triangle_count/g_link_predict formerly forced broadcast() on the
    // degree map, the closing edge probe, and the adjacency/edge sides —
    // the repo's one plan shape that would OOM (not degrade) at 100×.
    // The hints are gone; this pins the other half of the contract: at
    // spec scale the sides are far under the 64 MB threshold, so the
    // planner must still CHOOSE broadcast from the staged table's
    // parquet-derived stats. Collect first: AQE finalizes join strategies
    // at runtime.
    for (name <- Seq("g_triangle_count", "g_link_predict")) {
      val df = SparkEntry.queries(name)(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"$name no longer broadcasts its graph-sized sides at spec scale:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("rank-filter windows rewrite to the native partial/final TopKPerGroup plan (B10n)") {
    // the rewrite must fire for the declarative rn<=k form...
    val p = plan("q_topk_per_group")
    assert(p.split("TopKPerGroup").length >= 3,
      s"expected partial AND final TopKPerGroupExec:\n$p")
    assert(!p.contains("WindowGroupLimit") && !p.contains("Window ("),
      s"window machinery should be gone:\n$p")
    assert(p.contains("Exchange hashpartitioning"),
      "EnsureRequirements must insert the group-key exchange between partial and final")
    // ...and results must be row-identical to the un-rewritten window form
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val native = SparkEntry.queries("q_topk_per_group")(spark, d).collect().toSeq
    val stock = sources.Tables.orders(spark, d)
      .withColumn("rnk", row_number().over(w))
      // reference the rank in a way the rewrite pattern does NOT match,
      // so this plan keeps the stock window machinery
      .filter(col("rnk") + 0 <= 3)
      .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("totalprice"))
      .orderBy("o_orderpriority", "rnk").collect().toSeq
    assert(native == stock, "native and window plans must agree row-for-row")
  }

  test("TopKPerGroup edge cases: k exceeding group size, single row, rn=1 form (B10n)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9), ("c", 5), ("c", 5))
      .toDF("g", "v")
    val w = Window.partitionBy("g").orderBy(col("v"), col("g"))
    // k=10 > any group size: every row survives, ranks dense per group
    val all = df.withColumn("r", row_number().over(w)).filter(col("r") <= 10)
    assert(all.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val got = all.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(got == Seq(("a", 1, 1), ("a", 2, 2), ("a", 3, 3), ("b", 9, 1), ("c", 5, 1), ("c", 5, 2)))
    // rn = 1 keep-first form
    val first = df.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .collect().map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    assert(first == Seq(("a", 1), ("b", 9), ("c", 5)))
    // empty input
    assert(df.filter(col("v") > 100).withColumn("r", row_number().over(w))
      .filter(col("r") <= 2).count() == 0)
  }

  test("global rank filter (empty PARTITION BY) plans and runs through the native path (B10n)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // row_number() OVER (ORDER BY x) <= k — no PARTITION BY. Pre-fix this
    // shape FAILED at planning (ClusteredDistribution(Nil)); now it plans
    // as partial heaps -> single-partition exchange -> final heap.
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = sources.Tables.orders(spark, d)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("o_orderkey", "rnk")
    val p = df.queryExecution.executedPlan.toString
    assert(p.split("TopKPerGroup").length >= 3, s"expected native plan:\n$p")
    val got = df.orderBy("rnk").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val stock = sources.Tables.orders(spark, d)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") + 0 <= 5)
      .select("o_orderkey", "rnk")
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == stock, "global top-k must match the stock window plan")
  }

  test("rank() <= k rewrites natively and keeps boundary ties with gapped ranks (B10n)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("a", 2), ("a", 2), ("a", 3),
                 ("b", 5), ("b", 5), ("c", 9)).toDF("g", "v")
    val w = Window.partitionBy("g").orderBy(col("v"))
    val q = df.withColumn("r", rank().over(w)).filter(col("r") <= 2)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
      "rank() filter must take the native path")
    val got = q.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    // a: 1 -> rank 1; the three 2s -> rank 2 (all kept: boundary ties);
    //    3 -> rank 5 (gap), excluded. b: both 5s rank 1. c: 9 rank 1.
    assert(got == Seq(("a", 1, 1), ("a", 2, 2), ("a", 2, 2), ("a", 2, 2),
      ("b", 5, 1), ("b", 5, 1), ("c", 9, 1)))
    // and it must agree with the stock window plan on real data
    val wo = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc)
    val native = sources.Tables.orders(spark, d)
      .withColumn("r", rank().over(wo)).filter(col("r") <= 3)
      .select("o_orderpriority", "r", "o_orderkey")
      .orderBy("o_orderpriority", "r", "o_orderkey").collect().toSeq
    val stock = sources.Tables.orders(spark, d)
      .withColumn("r", rank().over(wo)).filter(col("r") + 0 <= 3)
      .select("o_orderpriority", "r", "o_orderkey")
      .orderBy("o_orderpriority", "r", "o_orderkey").collect().toSeq
    assert(native == stock, "native rank() plan must agree with stock row-for-row")
    // global rank() with ties at the boundary, empty PARTITION BY
    val tied = Seq(1, 2, 2, 3).toDF("v")
      .withColumn("r", rank().over(Window.orderBy(col("v"))))
      .filter(col("r") <= 2)
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(tied == Seq((1, 1), (2, 2), (2, 2)))
  }

  test("dense_rank() <= k rewrites natively, keeps whole tie classes, numbers gaplessly (B10n)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("a", 2), ("a", 2), ("a", 3),
                 ("b", 5), ("b", 5), ("c", 9)).toDF("g", "v")
    val w = Window.partitionBy("g").orderBy(col("v"))
    val q = df.withColumn("r", dense_rank().over(w)).filter(col("r") <= 2)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
      "dense_rank() filter must take the native path")
    val got = q.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    // a: class {1} -> 1, class {2,2,2} kept WHOLE -> 2 (3 excluded: 3rd class);
    // b: class {5,5} -> 1; c: {9} -> 1 — gapless numbering throughout
    assert(got == Seq(("a", 1, 1), ("a", 2, 2), ("a", 2, 2), ("a", 2, 2),
      ("b", 5, 1), ("b", 5, 1), ("c", 9, 1)))
    // agree with the stock window plan row-for-row on real data (the +0
    // in the filter blocks the rewrite on the stock side)
    val wo = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc)
    val native = sources.Tables.orders(spark, d)
      .withColumn("r", dense_rank().over(wo)).filter(col("r") <= 3)
      .select("o_orderpriority", "r", "o_orderkey")
      .orderBy("o_orderpriority", "r", "o_orderkey").collect().toSeq
    val stock = sources.Tables.orders(spark, d)
      .withColumn("r", dense_rank().over(wo)).filter(col("r") + 0 <= 3)
      .select("o_orderpriority", "r", "o_orderkey")
      .orderBy("o_orderpriority", "r", "o_orderkey").collect().toSeq
    assert(native == stock, "native dense_rank() plan must agree with stock row-for-row")
    // empty PARTITION BY (global dense top-k) with boundary ties
    val tied = Seq(1, 2, 2, 3).toDF("v")
      .withColumn("r", dense_rank().over(Window.orderBy(col("v"))))
      .filter(col("r") <= 2)
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(tied == Seq((1, 1), (2, 2), (2, 2)))
  }

  test("staged orders-lineitem consumers read pruned columns off the shared fact, join-free") {
    // The r12 staging contract: each consumer of StagedTables.orderLines
    // is a scan of the materialized fact plus its own aggregate — no
    // re-join of orders to lineitem, and parquet pruning keeps the scan
    // at the consumer's own columns.
    val sla = plan("q_ship_sla")
    assert(!sla.contains("Join"), "q_ship_sla must not re-join the staged fact")
    assert(sla.contains("ReadSchema") && !sla.contains("l_partkey") &&
      !sla.contains("o_custkey"),
      "q_ship_sla must prune to its 3 columns of the 6-column staged fact")
    val q4 = plan("q4_priority_exists")
    assert(!q4.contains("Join"), "q4 reduces to a groupBy over the staged fact — no semi join")
    val ro = plan("q_reorder_rate")
    assert(!ro.contains("SortMergeJoin") ||
      !ro.contains("o_orderkey"), "q_reorder_rate must not re-run the fact-fact join")
  }

  test("dense mode unifies -0.0/0.0 and NaN bit-pattern tie classes (float normalization)") {
    // Class identity in the dense exec is UnsafeRow binary equality while
    // retention is SQL ordering; stock windows are protected by the
    // optimizer's NormalizeFloatingNumbers, the custom exec normalizes in
    // its own class projection. -0.0 and 0.0 (== in SQL) must be ONE
    // dense_rank class, and both NaN encodings must be one class.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val negZero = java.lang.Double.longBitsToDouble(0x8000000000000000L)
    val nanAlt = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val df = Seq(("a", 0.0), ("a", negZero), ("a", 1.0), ("a", 2.0),
                 ("b", Double.NaN), ("b", nanAlt), ("b", 3.0))
      .toDF("g", "v")
    val w = Window.partitionBy("g").orderBy(col("v"))
    val q = df.withColumn("r", dense_rank().over(w)).filter(col("r") <= 2)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val got = q.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
      .sortBy(t => (t._1, t._3, t._2)).toSeq
    // a: {0.0, -0.0} is one class -> rank 1 (both rows), {1.0} -> 2;
    // b: {3.0} -> 1, {NaN, NaN'} one class (NaN sorts last) -> 2
    assert(got.map(t => (t._1, t._3)) ==
      Seq(("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 2), ("b", 2)))
    val bRanks = got.filter(t => t._1 == "b" && t._3 == 2).map(_._2)
    assert(bRanks.forall(_.isNaN), "both NaN bit patterns share one class")
  }

  test("the TopK rewrite leaves non-matching windows alone (B10n guard)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice").desc)
    // two window expressions → no rewrite
    val df = sources.Tables.orders(spark, d)
      .withColumn("rnk", row_number().over(w))
      .withColumn("mx", max("o_totalprice").over(w))
      .filter(col("rnk") <= 2)
    assert(!df.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    assert(df.count() == 10)
  }

  test("epoch-shuffle head prunes to k rows per epoch before any shuffle (H11)") {
    // the rank-limit must compile to the native TopKPerGroup partial/final
    // pair (or Spark's own partial WindowGroupLimit) — never a full
    // per-epoch sort of the corpus just to keep 20 rows
    val p = plan("p_epoch_shuffle")
    assert(p.contains("TopKPerGroup") ||
      (p.contains("WindowGroupLimit") && p.contains("Partial")),
      s"expected pre-shuffle rank pruning in:\n$p")
  }

  test("skyline never plans the O(n²) pair space (B118)") {
    val p = plan("q_skyline")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"skyline must not materialize the quadratic dominance join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the day-rollup join back onto the facts must broadcast:\n$p")
  }

  test("interval-overlap sweep ends in a top-k reduce, not a global sort of the curve (B117)") {
    val p = plan("q_interval_overlap")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-20 reduce in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("data masking is projection-only: no joins, no hash exchange (A27)") {
    val p = plan("q_data_mask")
    assert(!p.contains("hashpartitioning") && !p.contains("Join"),
      s"masking must stay a narrow projection:\n$p")
  }

  test("SCD2 lookup plans as an equi-join on the key, never a nested-loop range join (A28)") {
    // the validity window must ride as a residual predicate on a hash
    // join — a BroadcastNestedLoopJoin here would be the O(facts×dim)
    // scale-killer the comment claims is impossible
    val p = plan("q_scd2_lookup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"SCD2 lookup must not plan a non-equi join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"expected a keyed hash/merge join in:\n$p")
  }
}
