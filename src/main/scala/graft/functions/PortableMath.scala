package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine BIT-PORTABLE transcendental math.
  *
  * WHY THIS EXISTS: the correctness gate hashes raw double bits, and the
  * two engines disagree at the libm level — Spark's `log`/`exp`/trig call
  * `java.lang.StrictMath` (fdlibm, bit-stable on every host forever),
  * while DuckDB calls the HOST's libm (`std::log` → glibc), whose
  * rounding drifts across glibc versions/container images. Round 10
  * found 21 green-for-9-rounds oracles red purely from a host-image
  * change: identical data, identical SQL, 1-ulp-different `ln()`.
  * No pinning of *our* code can fix that — the divergence is inside the
  * oracle engine's math library.
  *
  * THE FIX: compute every transcendental from operations IEEE-754
  * REQUIRES to be correctly rounded — `+ - * / sqrt` — in a FIXED
  * evaluation order, expressed twice from one file: as a Spark `Column`
  * tree and as DuckDB SQL text with the identical op structure. Both
  * engines then produce the same bits on any host, permanently. (Neither
  * Spark's codegen nor DuckDB's vector kernels fuse `a*b+c` into an FMA —
  * each SQL-level operator is its own correctly-rounded instruction —
  * and DuckDB parses high-precision decimal literals to the same
  * correctly-rounded double as a Java literal; verified in round 10.)
  *
  * Numerics (arguments reduced with EXACT ops only — powers of two and
  * sqrt):
  *  - ln(x) = 128·atanh(t), t=(y-1)/(y+1), y=x^(1/64) via 6 sqrt's.
  *    Domain ~[1e-14, 1e15] ⇒ |t| ≤ 0.27; odd series to t^27 truncates
  *    below 1e-16 relative; accumulated rounding ≲ 1e-13 absolute.
  *  - sin/cos: Taylor in x² on |x| ≤ 3.2 (covers radians of any lat/lon),
  *    terms to x^27 / x^28 ⇒ ≲ 5e-15 absolute.
  *  - atan: THREE exact half-angle reductions w ← w/(1+√(1+w²)) (⇒
  *    |w| ≤ tan(π/16) for ANY input), odd series to w^19, ×8.
  *  - asin(z) = atan(z/√(1-z²)) with z clamped one ulp below 1.
  *
  * Accuracy is ~1e-13 absolute — far inside analytic tolerance — and,
  * the actual contract, BIT-IDENTICAL between engines. `q_math_portable`
  * runs both sides over a value grid through the driver's hash gate
  * every round, so future drift in the primitives themselves (a new
  * engine version fusing FMA, say) is caught immediately.
  */
object PortableMath {

  /** Shortest round-trip decimal text of `d`: parses back to the exact
    * same double in Java (JLS §3.10.2) and DuckDB (correctly-rounded
    * literal/strtod — verified against Java bit images). */
  private def lit17(d: Double): String = {
    val s = java.lang.Double.toString(d)
    require(java.lang.Double.parseDouble(s) == d, s"non-roundtrip literal $s")
    s
  }

  // odd atanh series coefficients 1/1, 1/3, ..., 1/27
  private val atanhC: Seq[Double] = (0 to 13).map(i => 1.0 / (2 * i + 1))
  // odd atan series coefficients 1/1, -1/3, 1/5, ..., -1/19
  // (shared with PortableGeoImpl so the scalar twin can't drift)
  private[functions] val atanC: Seq[Double] =
    (0 to 9).map(i => (if (i % 2 == 0) 1.0 else -1.0) / (2 * i + 1))
  // sin(x)/x = sum_k (-1)^k x^(2k) / (2k+1)!, k = 0..13 (to x^26)
  private[functions] val sinC: Seq[Double] = {
    var f = 1.0
    (0 to 13).map { k =>
      if (k > 0) f = f * (2 * k) * (2 * k + 1)
      (if (k % 2 == 0) 1.0 else -1.0) / f
    }
  }
  // cos(x) = sum_k (-1)^k x^(2k) / (2k)!, k = 0..14 (to x^28)
  private[functions] val cosC: Seq[Double] = {
    var f = 1.0
    (0 to 14).map { k =>
      if (k > 0) f = f * (2 * k - 1) * (2 * k)
      (if (k % 2 == 0) 1.0 else -1.0) / f
    }
  }

  // exp Taylor coefficients 1/j!, j = 0..17 (argument ≤ ln2 after the
  // exact power-of-two reduction ⇒ truncation below 1e-19)
  private val expC: Seq[Double] = {
    var f = 1.0
    (0 to 17).map { j => if (j > 0) f = f * j; 1.0 / f }
  }

  val LOG2_INV = 1.4426950408889634 // IEEE-nearest 1/ln(2)
  val DEG2RAD = 0.017453292519943295 // IEEE-nearest pi/180
  val LN2 = 0.6931471805599453 // IEEE-nearest ln(2)

  // ---------- Spark Column side ----------

  /** Horner: c0 + u·(c1 + u·(c2 + ...)) with a fixed Add(lit, Mul(u, acc))
    * shape at every level — mirrored token-for-token by hornerSql. */
  private def horner(u: Column, cs: Seq[Double]): Column = {
    val rev = cs.reverse
    rev.tail.foldLeft(lit(rev.head): Column)((acc, c) => lit(c) + u * acc)
  }

  /** Bit-portable natural log; domain ~[1e-14, 1e15], x > 0. */
  def pLn(x: Column): Column = {
    val y = sqrt(sqrt(sqrt(sqrt(sqrt(sqrt(x))))))
    val t = (y - lit(1.0)) / (y + lit(1.0))
    val u = t * t
    (t * horner(u, atanhC)) * lit(128.0)
  }

  /** Bit-portable log base 2: pLn(x) · (1/ln 2). */
  def pLog2(x: Column): Column = pLn(x) * lit(LOG2_INV)

  /** Scalar twin of [[pLn]]/[[lnSql]] — the identical op order in plain
    * doubles (Java arithmetic is the same IEEE correctly-rounded ops, so
    * a driver-side constant folded into a plan matches the engines'
    * column form bit-for-bit; the PortableGeoImpl precedent). */
  def lnScalar(x: Double): Double = {
    var y = x
    var i = 0
    while (i < 6) { y = math.sqrt(y); i += 1 }
    val t = (y - 1.0) / (y + 1.0)
    val u = t * t
    val rev = atanhC.reverse
    var acc = rev.head
    rev.tail.foreach(c => acc = c + u * acc)
    (t * acc) * 128.0
  }

  /** Bit-portable sin on |x| ≤ 3.2. */
  def pSin(x: Column): Column = { val u = x * x; x * horner(u, sinC) }

  /** Bit-portable cos on |x| ≤ 3.2. */
  def pCos(x: Column): Column = { val u = x * x; horner(u, cosC) }

  /** One atan half-angle reduction. NOTE: references `v` three times —
    * Catalyst Columns are TREES, so chain halvings through withColumn
    * stages on wide inputs (see the geo queries) or the duplicated
    * subtree grows ~27× and whole-stage codegen explodes. */
  def atanHalf(v: Column): Column = v / (lit(1.0) + sqrt(lit(1.0) + v * v))

  /** The atan odd series ×8 over an already three-times-halved arg. */
  def atanTail(w3: Column): Column = {
    val u = w3 * w3
    (w3 * horner(u, atanC)) * lit(8.0)
  }

  /** Bit-portable atan, any finite w. Inline form — fine for thin
    * inputs (a column reference); stage for computed inputs. */
  def pAtan(w: Column): Column = atanTail(atanHalf(atanHalf(atanHalf(w))))

  /** Bit-portable asin on [0, 1]; z clamps one ulp below 1 so degenerate
    * (antipodal) inputs stay finite — identically in both engines. */
  def pAsin(z: Column): Column = {
    val zc = least(z, lit(0.9999999999999999))
    pAtan(zc / sqrt(lit(1.0) - zc * zc))
  }

  /** Degrees → radians as one literal multiply. */
  def pRadians(deg: Column): Column = deg * lit(DEG2RAD)

  // ---------- DuckDB SQL side (identical op structure) ----------
  // Splice arguments that are SHORT (a column/CTE alias): each helper
  // duplicates its argument text many times. Stage long expressions
  // through a SELECT layer first.

  private def hornerSql(u: String, cs: Seq[Double]): String = {
    val rev = cs.reverse
    rev.tail.foldLeft(lit17(rev.head))((acc, c) => s"(${lit17(c)} + $u * $acc)")
  }

  def lnSql(x: String): String = {
    val y = s"sqrt(sqrt(sqrt(sqrt(sqrt(sqrt($x))))))"
    val t = s"(($y - 1.0) / ($y + 1.0))"
    val u = s"($t * $t)"
    s"(($t * ${hornerSql(u, atanhC)}) * 128.0)"
  }

  def log2Sql(x: String): String = s"(${lnSql(x)} * ${lit17(LOG2_INV)})"

  def sinSql(x: String): String = {
    val u = s"(($x) * ($x))"
    s"(($x) * ${hornerSql(u, sinC)})"
  }

  def cosSql(x: String): String = {
    val u = s"(($x) * ($x))"
    hornerSql(u, cosC)
  }

  def atanSql(w: String): String = {
    def half(v: String): String = s"(($v) / (1.0 + sqrt(1.0 + ($v) * ($v))))"
    val w3 = half(half(half(w)))
    val u = s"($w3 * $w3)"
    s"(($w3 * ${hornerSql(u, atanC)}) * 8.0)"
  }

  /** asin over a SHORT expression `z` (clamped, then atan(z/√(1-z²))). */
  def asinSql(z: String): String = {
    val zc = s"least($z, 0.9999999999999999)"
    atanSql(s"(($zc) / sqrt(1.0 - ($zc) * ($zc)))")
  }

  // Staged pieces for oracles that must bind intermediates through
  // SELECT layers (inlining asin's three halvings would duplicate the
  // argument text ~500×). Stage: w0 = zc/√(1-zc²), w1..w3 = three
  // atanHalfSql steps, then atanTailSql(w3). The Column twins are the
  // same ops pAsin/pAtan produce — the SQL splits them only textually.
  def atanHalfSql(v: String): String =
    s"(($v) / (1.0 + sqrt(1.0 + ($v) * ($v))))"

  /** The atan odd series ×8 over an ALREADY three-times-halved argument. */
  def atanTailSql(w3: String): String = {
    val u = s"(($w3) * ($w3))"
    s"((($w3) * ${hornerSql(u, atanC)}) * 8.0)"
  }

  def radiansSql(deg: String): String = s"(($deg) * ${lit17(DEG2RAD)})"

  /** Bit-portable 2^x for x ∈ [0, 62) as a DIALECT PAIR (the one place
    * the two engines' SQL spellings differ — the bigint shift): 2^⌊x⌋ is
    * an exact integer shift, then an exact int→double cast (powers of
    * two convert exactly at any magnitude), and the fraction runs
    * e^(f·ln2) as a fixed Taylor horner. With portable log2 this gives a
    * portable pow: n^α = exp2(α·log2(n)). Splice SHORT aliases only —
    * `x` is referenced ~35× through the horner. */
  def exp2Sql(x: String): String = exp2Dialect(x, duck = true)
  def exp2SparkSql(x: String): String = exp2Dialect(x, duck = false)
  private def exp2Dialect(x: String, duck: Boolean): String = {
    val t = s"((($x) - floor($x)) * ${lit17(LN2)})"
    val p2k =
      if (duck) s"CAST((CAST(1 AS BIGINT) << CAST(floor($x) AS INTEGER)) AS DOUBLE)"
      else s"CAST(SHIFTLEFT(CAST(1 AS BIGINT), CAST(FLOOR($x) AS INT)) AS DOUBLE)"
    s"($p2k * ${hornerSql(t, expC)})"
  }
}
