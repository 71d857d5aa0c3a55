package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_round0 must be BIT-IDENTICAL to Spark's round(x) on DOUBLE —
  * m_logreg_newton's ×10¹² quantization contract rides on it (the Newton
  * trajectory is exact long sums of these rounded terms, so one ulp of
  * drift in any row changes the committed coefficients). The spec pins
  * equality on (a) adversarial boundary values — exact .5 halves, the
  * nearest doubles on either side of halves, ±0 crossings, 2⁵²/2⁵³
  * integrality edges, subnormals, NaN/±Inf — and (b) a large
  * deterministic pseudo-random sweep shaped like the real terms
  * (magnitudes 10⁰..10¹⁵, both signs), evaluated through BOTH the
  * codegen and interpreted paths. */
class Round0ExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  private def referenceRound(t: Double): Double =
    if (java.lang.Double.isNaN(t) || java.lang.Double.isInfinite(t)) t
    else java.math.BigDecimal.valueOf(t)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  private val adversarial: Seq[Double] = {
    val halves = (-20 to 20).map(_ + 0.5)
    val nearHalves = halves.flatMap(h => Seq(
      Math.nextDown(h), Math.nextUp(h),
      Math.nextDown(Math.nextDown(h)), Math.nextUp(Math.nextUp(h))))
    val ints = Seq(-3.0, -2.0, -1.0, 0.0, -0.0, 1.0, 2.0, 3.0)
    val nearInts = ints.flatMap(i => Seq(Math.nextDown(i), Math.nextUp(i)))
    val big = Seq(4.503599627370496e15, 9.007199254740992e15, 1e16, 1e300,
      4.503599627370495e15, 4503599627370495.5, -4503599627370495.5)
    val tiny = Seq(java.lang.Double.MIN_VALUE, -java.lang.Double.MIN_VALUE,
      1e-300, -1e-300, 0.49999999999999994, -0.49999999999999994,
      0.5000000000000001, -0.5000000000000001)
    val special = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    halves ++ nearHalves ++ ints ++ nearInts ++ big ++ tiny ++ special
  }

  test("compute() matches the BigDecimal reference on adversarial values") {
    adversarial.foreach { t =>
      val got = graft.functions.Round0Expr.compute(t)
      val want = referenceRound(t)
      assert(bits(got) == bits(want) || (got.isNaN && want.isNaN),
        s"compute($t) = $got, reference = $want")
    }
  }

  test("compute() matches the reference on a deterministic random sweep") {
    val rnd = new java.util.Random(421717L)
    var i = 0
    while (i < 200000) {
      // magnitudes like the real terms: |t| in [0, 1e15], both signs,
      // plus a band engineered close to .5 fractions
      val base = rnd.nextDouble() * math.pow(10, rnd.nextInt(16))
      val t = (if (rnd.nextBoolean()) base else -base) match {
        case x if i % 5 == 0 => Math.floor(x) + 0.5 + (rnd.nextDouble() - 0.5) * 1e-12
        case x => x
      }
      val got = graft.functions.Round0Expr.compute(t)
      val want = referenceRound(t)
      assert(bits(got) == bits(want), s"compute($t) = $got, reference = $want")
      i += 1
    }
  }

  test("SQL graft_round0 equals round(x) bitwise through codegen and interpreted paths") {
    val rnd = new java.util.Random(171717L)
    val vals = adversarial.filterNot(_.isNaN) ++
      (1 to 50000).map { i =>
        val base = rnd.nextDouble() * math.pow(10, rnd.nextInt(16))
        val x = if (rnd.nextBoolean()) base else -base
        if (i % 5 == 0) Math.floor(x) + 0.5 else x
      }
    val df = vals.toDF("x")
    Seq("CODEGEN_ONLY", "NO_CODEGEN").foreach { mode =>
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val mismatches = df
          .selectExpr("x", "graft_round0(x) AS a", "round(x) AS b")
          .where("NOT (a <=> b)")
          .count()
        assert(mismatches == 0L, s"mode=$mode: $mismatches mismatching rows")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("graft_round0 rejects non-double input and passes null through") {
    intercept[Exception] {
      spark.sql("SELECT graft_round0('abc')").collect()
    }
    val r = spark.sql("SELECT graft_round0(CAST(NULL AS DOUBLE))").head()
    assert(r.isNullAt(0))
  }
}
