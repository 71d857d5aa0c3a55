package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity (SURVEY §2 D12) — the entity-resolution
  * staple for SHORT strings (names, titles, headers) that Levenshtein (D7)
  * over-penalizes: transposition-tolerant, prefix-weighted. Spark has no
  * built-in, so this is a native Catalyst `BinaryExpression` with
  * `doGenCode` (the b-path of the preference ladder — no UDF boxing; one
  * static call per row inside whole-stage codegen, same shape as the
  * built-in `levenshtein`).
  *
  * Cross-engine contract (pinned against DuckDB `jaro_winkler_similarity`
  * on discriminating probes, and proven pairwise by the D12 hash gate):
  *  - match window = max(|a|,|b|)/2 − 1, floored at 0 (so "ab"/"ba" → 0:
  *    only same-position matches inside a 0 window);
  *  - transpositions counted over the matched-sequence order, halved;
  *  - Winkler prefix boost ONLY when jaro > 0.7 ("abcdef"/"abxxxx" keeps
  *    its raw 0.5556 despite the 2-char prefix), prefix capped at 4,
  *    scale 0.1;
  *  - either side empty → 0.0 (DuckDB returns 0 even for ""/"").
  */
object JaroWinklerImpl {

  def jw(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matchedB(j) && a.charAt(i) == b.charAt(j)) {
          matchedA(i) = true
          matchedB(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** `graft_jaro_winkler(a, b)` → [0,1] similarity. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"
  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.jw($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}
