package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Fused single-pass Gopher document statistics over RAW text — the
  * full per-document input of the q355/q371 rule battery
  *
  *   [wc, sumlen, n_digit_tokens, n_stopkinds, maxw, n_sym]
  *
  * computed without materializing normText, a token array, or a
  * (doc, word) shuffle. This extends the WordStopStats treatment to
  * the whole gopherDoc chain, which after the round-11 optimization
  * still paid three regex passes (normText's two + the pure-digit
  * `regexp_count`) plus a split and an `array_sort` fold per document
  * — ~84 s at ×100 docs, the text battery's residual ceiling
  * (BENCHNOTES round 12).
  *
  * Value definitions (bit-equality with the expression chain pinned in
  * GopherTextStatsSpec over the real corpus and adversarial edges):
  *  - tokens are normText's: whitespace(\s)-separated segments of
  *    lower(text) that retain ≥1 [a-z0-9] codepoint; a token's content
  *    is its kept codepoints in order. Lowercasing is
  *    UTF8String.toLowerCase — the same call as Spark's `lower`, so
  *    Unicode 1:N mappings agree with the regex chain by construction.
  *  - wc = token count; sumlen = Σ token lengths
  *    (= length(nt) − (wc−1) for wc > 0).
  *  - n_digit_tokens = tokens whose kept chars are all [0-9] — exactly
  *    what `regexp_count(nt, '\b[0-9]+\b')` counts, since inside a
  *    [a-z0-9]-only token `\b` can only fire at token edges
  *    (n_alpha = wc − n_digit_tokens at the call site).
  *  - n_stopkinds = DISTINCT members of `stops` present as whole
  *    tokens (the Σ array_contains form), NOT occurrence count.
  *  - maxw = max token multiplicity (= the max run length of the
  *    sorted token array).
  *  - n_sym is over the RAW pre-lowercase text (matching the chain,
  *    which reads $"text"): count('#') + non-overlapping
  *    left-to-right count("..."), the `replace`-difference arithmetic.
  */
object GopherTextKernel {

  private def isWs(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def stats(s: UTF8String, stops: Array[String]): ArrayData = {
    // raw-text symbol scan ('#' and '.' are lowercase-invariant, but
    // 1:N Unicode lowerings shift positions — stay on the raw string
    // the expression chain reads)
    val raw = s.toString
    var nSym = 0L
    var i = 0
    val rl = raw.length
    while (i < rl) {
      val c = raw.charAt(i)
      if (c == '#') { nSym += 1; i += 1 }
      else if (c == '.' && i + 2 < rl &&
        raw.charAt(i + 1) == '.' && raw.charAt(i + 2) == '.') {
        nSym += 1; i += 3 // replace() consumes non-overlapping, left to right
      } else i += 1
    }

    // token scan over the lowered text
    val str = s.toLowerCase.toString
    val len = str.length
    var wc = 0L
    var sumlen = 0L
    var nDigit = 0L
    var stopMask = 0
    var maxw = 0L
    val counts = new java.util.HashMap[String, Integer]()
    val sb = new java.lang.StringBuilder
    var allDigit = true
    i = 0
    while (i <= len) {
      val ws = i == len || isWs(str.charAt(i))
      if (ws) {
        if (sb.length > 0) {
          wc += 1
          sumlen += sb.length
          if (allDigit) nDigit += 1
          val tok = sb.toString
          var m = 0
          while (m < stops.length) {
            if ((stopMask & (1 << m)) == 0 && stops(m) == tok)
              stopMask |= 1 << m
            m += 1
          }
          val c0 = counts.get(tok)
          val c1 = if (c0 == null) 1 else c0.intValue() + 1
          counts.put(tok, c1)
          if (c1 > maxw) maxw = c1
          sb.setLength(0)
          allDigit = true
        }
      } else {
        val c = str.charAt(i)
        if (c >= '0' && c <= '9') sb.append(c)
        else if (c >= 'a' && c <= 'z') { sb.append(c); allDigit = false }
        // any other codepoint: dropped by normText; segment continues
      }
      i += 1
    }
    ArrayData.toArrayData(
      Array(wc, sumlen, nDigit, Integer.bitCount(stopMask).toLong, maxw, nSym))
  }
}

/** array(wc, sumlen, n_digit_tokens, n_stopkinds, maxw, n_sym) — see
  * GopherTextKernel. `stops` is a literal parameter, not a child: the
  * set is fixed at plan time (GopherStops, ≤ 32 words for the bitmask).
  */
case class GopherTextStats(child: Expression, stops: Seq[String])
    extends UnaryExpression {
  require(stops.size <= 32, "stop-kind bitmask holds at most 32 words")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gopher_text_stats"

  @transient private lazy val stopsArr: Array[String] = stops.toArray

  override protected def nullSafeEval(input: Any): Any =
    GopherTextKernel.stats(input.asInstanceOf[UTF8String], stopsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stops", stopsArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherTextKernel.stats($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherTextStats {
  /** The canonical Gopher-rules stopword set — the default stop set of
    * the SQL forms `gopher_text_stats(text)` / `word_stop_stats(text)`
    * and the one the q355/q371 battery pins its oracles to. */
  val GopherStops: Seq[String] = Seq("the", "a", "of", "to", "and")

  /** Column API over a raw text column. */
  def apply(text: Column, stops: Seq[String]): Column =
    Bridge.column(GopherTextStats(Bridge.expression(text), stops))
}
