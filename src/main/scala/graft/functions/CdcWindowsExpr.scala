package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined window hashing for substring dedup (D11):
  * `graft_cdc_windows(text, winLen, anchorLen)` → the array of md5 hex
  * hashes of every winLen-char window whose position is a CONTENT anchor
  * (md5 of the local anchorLen-gram starts with hex nibble 0 — expected
  * one position in 16). Anchors derive from content, so a duplicated
  * span anchors at the same positions in both copies regardless of
  * offset phase — the property a fixed stride lacks.
  *
  * Semantics are exactly the declarative formulation
  * `explode(sequence(1, len-winLen+1)) → filter md5(substring(text, o,
  * anchorLen)) LIKE '0%' → md5(substring(text, o, winLen))` (= the
  * DuckDB oracle) — spec'd bit-identical in ShingleExprSpec. The
  * difference is cost shape: the HOF chain materializes one row per
  * CHARACTER of corpus before the anchor filter prunes 15/16 of them;
  * this emits only the surviving hashes, one compiled pass per document
  * inside whole-stage codegen, no fan-out, no shuffle of non-anchors.
  *
  * Position semantics are CHARACTER-based (UTF-8 aware: the char→byte
  * offset table is built once per document), matching substring()'s.
  */
case class CdcWindowsExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_cdc_windows"

  override def nullSafeEval(t: Any, w: Any, a: Any): Any =
    CdcWindowsExpr.compute(t.asInstanceOf[UTF8String],
      w.asInstanceOf[Int], a.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w, a) =>
      s"${ev.value} = graft.functions.CdcWindowsExpr.compute($t, $w, $a);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CdcWindowsExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CdcWindowsExpr {

  private val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  private val HEX = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HEX((d(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = HEX(d(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(text: UTF8String, win: Int, anchor: Int): ArrayData = {
    val bytes = text.getBytes
    // char-start byte offsets, built once (UTF-8 lead bytes are not
    // 10xxxxxx continuations)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) nChars += 1
      i += 1
    }
    if (nChars < win) return EMPTY
    val offs = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(nChars) = bytes.length
    val md = MessageDigest.getInstance("MD5")
    val out = new java.util.ArrayList[Any]()
    var o = 0
    val last = nChars - win
    while (o <= last) {
      // anchor slice is min(anchor, remaining) chars — same as substring()
      val aEnd = math.min(o + anchor, nChars)
      md.reset()
      md.update(bytes, offs(o), offs(aEnd) - offs(o))
      if ((md.digest()(0) & 0xF0) == 0) {
        md.reset()
        md.update(bytes, offs(o), offs(o + win) - offs(o))
        out.add(hex(md.digest()))
      }
      o += 1
    }
    if (out.isEmpty) EMPTY else new GenericArrayData(out.toArray)
  }
}
