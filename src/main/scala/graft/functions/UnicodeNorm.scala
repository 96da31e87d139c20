package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text-normalization kernels shared by the interpreted and
  * generated paths of [[NfcNormalize]] and [[StripAccents]]. A Scala
  * top-level object emits static forwarders, so generated Java calls
  * `graft.functions.UnicodeNorm.nfc(...)` directly.
  *
  * Semantics match DuckDB's `nfc_normalize` / `strip_accents`
  * (utf8proc): NFC composition, and accent stripping = canonical
  * decomposition (NFD) followed by dropping every non-spacing mark
  * (general category Mn). Standalone letters like `ø`/`đ` are NOT
  * marks and survive stripping in both engines.
  */
object UnicodeNorm {

  /** Canonical composition (NFC). The common case — already-normalized
    * text, which includes all ASCII — returns the input buffer
    * untouched; `isNormalized` is a cheap quick-check-property scan.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** NFD-decompose, then drop combining marks (category Mn). */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    // ASCII (and any NFD string with no marks to strip) short-circuit:
    // scan once, and only allocate when a mark or composition exists
    val d =
      if (Normalizer.isNormalized(str, Normalizer.Form.NFD)) str
      else Normalizer.normalize(str, Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (i < d.length && !hasMark) {
      if (Character.getType(d.charAt(i)) == Character.NON_SPACING_MARK)
        hasMark = true
      i += 1
    }
    if (!hasMark) { if (d eq str) s else UTF8String.fromString(d) }
    else {
      val sb = new java.lang.StringBuilder(d.length)
      var j = 0
      while (j < d.length) {
        val c = d.charAt(j)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        j += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }
}

/** Base for the two string-normalization expressions: string → string,
  * null-propagating, codegen'd as a single static call (stays inside
  * whole-stage codegen; the kernel itself is JIT-compiled JVM code).
  */
abstract class UnicodeNormExpression extends UnaryExpression {

  /** Fully-qualified static kernel, e.g. `graft.functions.UnicodeNorm.nfc`. */
  protected def kernel: String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = child.dataType

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernel($c)")
}

/** `nfc_normalize(str)` — Unicode canonical composition, the
  * dedup-and-fingerprint prerequisite: visually-identical strings with
  * different codepoint sequences (`é` vs `e`+U+0301) hash apart until
  * normalized. Twin of DuckDB's `nfc_normalize`.
  */
case class NfcNormalize(child: Expression) extends UnicodeNormExpression {
  override def prettyName: String = "nfc_normalize"
  override protected def kernel: String = "graft.functions.UnicodeNorm.nfc"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `strip_accents(str)` — drop diacritics (NFD + remove category-Mn
  * marks), the language-ID / matching-key normalization step. Twin of
  * DuckDB's `strip_accents`.
  */
case class StripAccents(child: Expression) extends UnicodeNormExpression {
  override def prettyName: String = "strip_accents"
  override protected def kernel: String = "graft.functions.UnicodeNorm.stripAccents"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.stripAccents(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
