package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native stopword scoring: `graft_stopword_scores(toks)` → the array of
  * per-language stopword counts, one slot per [[TextFunctions.langProfiles]]
  * entry in declaration (alphabetical) order.
  *
  * Semantics are exactly `stopwordCount(toks, words)` per profile (count
  * tokens WITH duplicates that appear in the profile's word list —
  * bit-identity spec'd in TextFunctionsSpec). The difference is cost: the
  * HOF form runs one interpreted `filter` lambda per profile per row
  * (6 per-token array scans across the quality+langid chain); this is ONE
  * pass over the tokens with a single hash lookup per token against a
  * static word→profile-bitmask map.
  */
case class StopwordScoresExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_stopword_scores"

  override def nullSafeEval(a: Any): Any =
    StopwordScoresExpr.compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.StopwordScoresExpr.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): StopwordScoresExpr =
    copy(child = newChild)
}

object StopwordScoresExpr {

  private val nProfiles = TextFunctions.langProfiles.size
  // The word→profile map packs profile membership into an Int bitmask;
  // past 32 profiles `1 << p` would wrap mod 32 and silently credit
  // counts to the wrong language slot.
  require(nProfiles <= 32,
    s"StopwordScoresExpr supports at most 32 language profiles (got $nProfiles); widen masks to Long")

  /** word → bitmask of profiles containing it (a word may appear in
    * several languages' lists — e.g. "de"/"la" across Romance profiles). */
  private val masks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    TextFunctions.langProfiles.zipWithIndex.foreach { case ((_, words), p) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue) | (1 << p)))
      }
    }
    m
  }

  def compute(toks: ArrayData): ArrayData = {
    val counts = new Array[Int](nProfiles)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val m = masks.get(toks.getUTF8String(i))
        if (m != null) {
          var bits = m.intValue
          while (bits != 0) {
            counts(Integer.numberOfTrailingZeros(bits)) += 1
            bits &= bits - 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}
