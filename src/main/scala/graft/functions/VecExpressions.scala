package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for cosine similarity over `array<float>`
  * (SURVEY §2 D5/E1/E2 hot path).
  *
  * Why not a UDF or the `zip_with`/`aggregate` higher-order form: HOFs and
  * UDFs evaluate through interpreted lambda machinery per element; this
  * expression participates in whole-stage codegen (`doGenCode` emits a
  * tight primitive loop over the unsafe array data — no boxing, no
  * per-element virtual calls). That ordering is exactly the preference
  * ladder the engine follows: built-in functions, then a native
  * `Expression`, and a UDF only as a last resort.
  *
  * Determinism contract (SURVEY §4 rule 3): elements are widened
  * float→double BEFORE multiplication and accumulated left-to-right, and
  * the result is `dot / (sqrt(Σx²)·sqrt(Σy²))` — bit-identical to both the
  * HOF formulation ([[VectorFunctions.cosineHof]]) and the DuckDB oracle's
  * `list_reduce` fold, so the three agree exactly.
  */
case class CosineF32(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<float>; VectorFunctions.cosine casts explicitly
  // (ExpectsInputTypes would be the idiomatic check, but its signature
  // types are private[sql] — not implementable outside Spark's packages).
  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val n = math.min(nx, ny)
    var dot = 0.0; var sxx = 0.0; var syy = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; sxx += xi * xi; syy += yi * yi
      i += 1
    }
    // norms run over each full array (the dot zip stops at the shorter)
    while (i < nx) { val xi = x.getFloat(i).toDouble; sxx += xi * xi; i += 1 }
    i = n
    while (i < ny) { val yi = y.getFloat(i).toDouble; syy += yi * yi; i += 1 }
    dot / (math.sqrt(sxx) * math.sqrt(syy))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val sxx = ctx.freshName("sxx")
      val syy = ctx.freshName("syy")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($xa.numElements(), $ya.numElements());
         |double $dot = 0.0, $sxx = 0.0, $syy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $xa.getFloat($i);
         |  double $yi = (double) $ya.getFloat($i);
         |  $dot += $xi * $yi; $sxx += $xi * $xi; $syy += $yi * $yi;
         |}
         |for (int $i = $n; $i < $xa.numElements(); $i++) {
         |  double $xi = (double) $xa.getFloat($i); $sxx += $xi * $xi;
         |}
         |for (int $i = $n; $i < $ya.numElements(); $i++) {
         |  double $yi = (double) $ya.getFloat($i); $syy += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($sxx) * java.lang.Math.sqrt($syy));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineF32 =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the engine's native functions in the
  * FunctionRegistry (`spark.sql.extensions=graft.functions.GraftExtensions`
  * — wired by GraftSession), so `graft_cosine(a, b)` is callable from SQL
  * as well as the DataFrame API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineF32].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineF32(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShinglesExpr].getName, "graft_shingles"),
      (children: Seq[Expression]) => WordShinglesExpr(children.head, children(1))))
  }
}
