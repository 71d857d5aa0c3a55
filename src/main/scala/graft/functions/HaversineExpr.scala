package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Scalar twin of the PortableMath haversine: the SAME IEEE op sequence
  * as the DuckDB oracle's staged SQL (GeoQueries.kmCteSql), written as
  * plain Scala double arithmetic. Java double ops are the IEEE-mandated
  * correctly-rounded ones in program order, so this matches the staged
  * SQL bit-for-bit on any host — and it codegens as ONE static call.
  *
  * WHY an Expression and not PortableMath Columns: Catalyst Columns are
  * trees; the three atan half-angle steps reference their argument 3×
  * each, so an inline Column form copies the haversine subtree ~500×.
  * Even staged through projections, PushDownPredicates substitutes the
  * alias chain back into a `km <= r` filter and regenerates the blowup
  * (Janino ran 13+ minutes on it in round 10). A native expression is
  * the engine's own answer: the whole formula is one codegen'd call,
  * pushdown-safe, and fused into whole-stage codegen.
  */
object PortableGeoImpl {
  private val D2R = 0.017453292519943295 // IEEE-nearest pi/180

  // Horner with the exact shape of PortableMath.horner / hornerSql:
  // acc = c_last; acc = c + u * acc  (one mul + one add per level)
  private def horner(u: Double, cs: Array[Double]): Double = {
    var acc = cs(cs.length - 1)
    var i = cs.length - 2
    while (i >= 0) { acc = cs(i) + u * acc; i -= 1 }
    acc
  }
  private val sinC = PortableMath.sinC.toArray
  private val cosC = PortableMath.cosC.toArray
  private val atanC = PortableMath.atanC.toArray

  private def pSin(x: Double): Double = { val u = x * x; x * horner(u, sinC) }
  private def pCos(x: Double): Double = { val u = x * x; horner(u, cosC) }
  private def half(v: Double): Double = v / (1.0 + math.sqrt(1.0 + v * v))
  private def atanTail(w3: Double): Double = {
    val u = w3 * w3
    (w3 * horner(u, atanC)) * 8.0
  }

  /** Great-circle distance in km; mirrors kmCteSql op-for-op. */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val da = ((lat2 - lat1) * D2R) / 2
    val db = ((lon2 - lon1) * D2R) / 2
    val sa = pSin(da); val sb = pSin(db)
    val ca = pCos(lat1 * D2R); val cb = pCos(lat2 * D2R)
    val z = math.sqrt((sa * sa) + ((ca * cb) * (sb * sb)))
    val zc = math.min(z, 0.9999999999999999) // least(): z is never NaN here
    val w0 = zc / math.sqrt(1.0 - zc * zc)
    val w3 = half(half(half(w0)))
    12742.0176 * atanTail(w3) // 2 * 6371.0088, exact doubling
  }
}

/** `graft_haversine_km(lat1, lon1, lat2, lon2)` → distance in km. */
case class HaversineKmExpr(first: Expression, second: Expression,
                           third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_haversine_km"
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    PortableGeoImpl.haversineKm(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.PortableGeoImpl.haversineKm($a, $b, $c, $d);")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): HaversineKmExpr =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
