package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingling: `graft_shingles(text, n)` → the array of word
  * n-grams of the lowercased alphanumeric tokenization of `text`, each
  * shingle the n tokens joined by one space.
  *
  * Semantics are exactly the HOF formulation
  * `wordNgrams(tokens(text), n)` (= the DuckDB oracle's
  * `list_transform(range(...), ...)` over
  * `str_split_regex(regexp_replace(lower(text), '[^a-z0-9]+', ' '))`) —
  * spec'd bit-identical in ShingleExprSpec. The difference is cost: the
  * HOF chain evaluates interpreted per ELEMENT (regex, split, boxed
  * lambda machinery, ~20 CPU-s over the sf0.1 corpus); this is one
  * compiled byte-scan per document inside whole-stage codegen.
  *
  * ASCII contract: bytes outside [A-Za-z0-9] are token separators. For
  * pure-ASCII corpora (the oracle corpus is) this is identical to the
  * lower()+regex pipeline; a non-ASCII codepoint whose Unicode lowercase
  * form lands in [a-z0-9] (e.g. U+212A KELVIN SIGN) would tokenize
  * differently — use the HOF form if that matters.
  */
case class WordShinglesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(t: Any, n: Any): Any =
    WordShinglesExpr.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.WordShinglesExpr.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShinglesExpr =
    copy(left = newLeft, right = newRight)
}

object WordShinglesExpr {

  @inline private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  @inline private def toLower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  private val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  /** One pass over the UTF-8 bytes: find token spans, then emit each
    * n-gram as a fresh UTF8String (lowercasing on emit — the source
    * buffer may alias the row and is never mutated). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // n <= 0 is ill-formed (a "0-gram" has no tokens); the function is
    // SQL-registered, so return the empty array rather than letting the
    // size computation below throw NegativeArraySizeException at a caller.
    if (n <= 0) return EMPTY
    val src = text.getBytes // read-only: may alias the underlying buffer
    val len = src.length
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var nt = 0
    var i = 0
    while (i < len) {
      if (isAlnum(src(i))) {
        val s = i
        while (i < len && isAlnum(src(i))) i += 1
        if (nt == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(nt) = s; ends(nt) = i; nt += 1
      } else i += 1
    }
    if (nt < n) return EMPTY
    val out = new Array[Any](nt - n + 1)
    var t = 0
    while (t <= nt - n) {
      var sz = n - 1 // n-1 joining spaces
      var k = 0
      while (k < n) { sz += ends(t + k) - starts(t + k); k += 1 }
      val sb = new Array[Byte](sz)
      var p = 0
      k = 0
      while (k < n) {
        if (k > 0) { sb(p) = ' '; p += 1 }
        var q = starts(t + k)
        val e = ends(t + k)
        while (q < e) { sb(p) = toLower(src(q)); p += 1; q += 1 }
        k += 1
      }
      out(t) = UTF8String.fromBytes(sb)
      t += 1
    }
    new GenericArrayData(out)
  }
}
