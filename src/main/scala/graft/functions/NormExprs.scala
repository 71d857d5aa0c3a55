package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode text-normalization expressions (SURVEY §2 C15).
  *
  * A web corpus carries the same grapheme in many byte encodings
  * (composed U+00E1 vs 'a'+combining U+0301), which silently defeats
  * exact dedup (D1), shingling (D2-D4), and tokenizer vocabularies —
  * normalization is the first pass of corpus prep, before anything
  * hashes text. Spark has no built-in for it, so these are native
  * Catalyst expressions (the b-path of the engine's preference ladder):
  * whole-stage codegen via a static JDK `java.text.Normalizer` call, no
  * UDF boxing, null-safe.
  *
  * Cross-engine contract: both `java.text.Normalizer` and DuckDB's
  * utf8proc implement the Unicode normalization standard, so
  * `graft_nfc` ≡ DuckDB `nfc_normalize` and `graft_strip_accents`
  * (NFD → drop `\p{Mn}` → NFC) ≡ DuckDB `strip_accents` on the planted
  * inputs — byte-equal, which q_normalize's hash gate proves.
  */
object NormExprs {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: NFC-normalized is the common case (all-ASCII always is)
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  private val combiningMarks = "\\p{Mn}+".r

  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val decomposed = Normalizer.normalize(str, Normalizer.Form.NFD)
    val stripped = combiningMarks.replaceAllIn(decomposed, "")
    val out = Normalizer.normalize(stripped, Normalizer.Form.NFC)
    if (out == str) s else UTF8String.fromString(out)
  }
}

/** `graft_nfc(text)` → NFC-normalized text. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  override def nullSafeEval(a: Any): Any =
    NormExprs.nfc(a.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NormExprs.nfc($a);")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** `graft_strip_accents(text)` → text with combining marks removed. */
case class StripAccentsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"
  override def nullSafeEval(a: Any): Any =
    NormExprs.stripAccents(a.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NormExprs.stripAccents($a);")
  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpr =
    copy(child = newChild)
}
