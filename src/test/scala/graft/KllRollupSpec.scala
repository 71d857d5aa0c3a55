package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binds the round-8 sketch estimators to their exact twins (the A13x
  * HllRollupSpec discipline): q_kll_presketch's MERGED weekly quantiles
  * must sit inside KLL's rank-error envelope of the exact weekly
  * percentiles, and q_theta_overlap's intersection estimates must agree
  * with exact distinct-user overlaps.
  */
class KllRollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("merged weekly KLL quantiles sit inside the rank-error envelope of exact percentiles (A13y)") {
    val approx = SparkEntry.queries("q_kll_presketch")(spark, d).collect()
      .map(r => r.getAs[String]("week") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"), r.getAs[Double]("p99"))).toMap
    assert(approx.nonEmpty)
    // exact rank envelope: KLL k=200 guarantees ~1.65% rank error (we
    // allow 3%): the sketch's q-quantile VALUE must lie between the exact
    // values at ranks q±0.03
    val exact = sources.Tables.events(spark, d)
      .withColumn("week", date_format(date_trunc("week", to_date(col("ts"))), "yyyy-MM-dd"))
      .groupBy("week")
      .agg(expr("percentile(value, array(0.47D, 0.53D, 0.92D, 0.98D, 0.96D, 1.0D))").as("p"))
      .collect().map(r => r.getAs[String]("week") ->
        r.getAs[scala.collection.Seq[Double]]("p").toIndexedSeq).toMap
    approx.foreach { case (wk, (p50, p95, p99)) =>
      val e = exact(wk)
      assert(p50 >= e(0) && p50 <= e(1), s"$wk p50 $p50 outside [${e(0)}, ${e(1)}]")
      assert(p95 >= e(2) && p95 <= e(3), s"$wk p95 $p95 outside [${e(2)}, ${e(3)}]")
      assert(p99 >= e(4) && p99 <= e(5), s"$wk p99 $p99 outside [${e(4)}, ${e(5)}]")
    }
  }

  test("theta-sketch overlaps agree with exact distinct-user intersections (B98)") {
    val est = SparkEntry.queries("q_theta_overlap")(spark, d).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        (r.getAs[Long]("users_a").toDouble, r.getAs[Long]("users_b").toDouble,
          r.getAs[Long]("overlap").toDouble)).toMap
    assert(est.nonEmpty)
    val byType = sources.Tables.events(spark, d)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(_._2).toSet }
    est.foreach { case ((a, b), (ua, ub, ov)) =>
      val (sa, sb) = (byType(a), byType(b))
      val exactOv = (sa intersect sb).size.toDouble
      // default theta k=4096 ⇒ sub-2% relative error far above this scale
      def close(e: Double, g: Double) =
        math.abs(e - g) <= math.max(2.0, 0.05 * math.max(e, 1.0))
      assert(close(sa.size.toDouble, ua), s"$a users: exact ${sa.size} est $ua")
      assert(close(sb.size.toDouble, ub), s"$b users: exact ${sb.size} est $ub")
      assert(close(exactOv, ov), s"($a,$b) overlap: exact $exactOv est $ov")
    }
  }
}
