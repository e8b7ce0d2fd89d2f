package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Unicode text canonicalisation for corpus cleaning — NFC normalisation
  * and accent stripping as codegen'd scalar expressions.
  *
  * Web-crawl corpora mix composed (U+00E1) and decomposed (a + U+0301)
  * forms of the same text, which breaks exact dedup, n-gram matching and
  * tokenizer-vocabulary lookups; canonicalising to NFC first is standard
  * pipeline hygiene. Accent stripping (NFD, drop combining marks) is the
  * common normalisation for language-agnostic fingerprints.
  *
  * Spark has no built-in Unicode-normalize function, so these wrap
  * `java.text.Normalizer` as native `UnaryExpression`s with `doGenCode`
  * delegating to the static helpers below — the call stays inside
  * whole-stage codegen like the other kernels in this package (no UDF
  * serialization, no codegen break on the corpus-scan hot path).
  *
  * Semantics are pinned to DuckDB's `nfc_normalize` / `strip_accents`
  * by the q116 oracle: strip = NFD then remove category-Mn codepoints,
  * without re-composition (ß and other non-mark letters pass through).
  */
object UnicodeNorm {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan for ASCII/NFC text
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFD) && !hasMark(str)) s
    else {
      val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var i = 0
      while (i < nfd.length) {
        val cp = nfd.codePointAt(i)
        if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }

  private def hasMark(str: String): Boolean = {
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (Character.getType(cp) == Character.NON_SPACING_MARK) return true
      i += Character.charCount(cp)
    }
    false
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormFns {
  def nfcNormalize(text: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(text)))
  def stripAccents(text: Column): Column = Bridge.column(StripAccents(Bridge.expression(text)))
}
