package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Fused single-pass (word count, stopword count) over RAW text —
  * exactly the values of the q358/q385 chain
  *
  *   nt = normText(text)               // lower + 2 regexp_replace
  *   wc = length(nt) - length(replace(nt,' ','')) + 1   (0 if nt='')
  *   ns = regexp_count(nt, '\b(stop1|...|stopK)\b')
  *
  * computed WITHOUT materializing nt: the ×100-docs probes priced the
  * text battery at ~68 s per regex pass over 500k documents (the
  * per-core regex wall, BENCHNOTES round 11), and q385 paid for four
  * byte passes (two normText regexes, one replace, one regexp_count) —
  * 134 s map-only. This kernel is the gopherDoc fusion treatment: one
  * primitive scan, no regex engine, no intermediate string.
  *
  * Semantics proof sketch (pinned bit-for-bit in WordStopStatsSpec
  * against the regex chain):
  *  - normText keeps [a-z0-9] of lower(text), turns `\s` runs into
  *    single spaces, drops everything else, trims. So nt's tokens are
  *    the raw text's whitespace-separated segments that retain ≥1 kept
  *    codepoint after lowering — wc counts exactly those segments.
  *  - nt's tokens contain only [a-z0-9], so `\b` can only match at
  *    token edges, and `\b(...)\b` hits are whole tokens equal to a
  *    stopword — ns counts those (hits cannot overlap).
  *  - Lowercasing uses UTF8String.toLowerCase — the SAME call Spark's
  *    `lower` makes, so Unicode 1:N mappings and oddities (Kelvin sign
  *    K→k) agree with the regex chain by construction.
  */
object WordStopKernel {

  private def isWs(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def stats(s: UTF8String, stops: Array[String]): ArrayData = {
    val str = s.toLowerCase.toString
    val len = str.length
    var maxStop = 0
    var k = 0
    while (k < stops.length) {
      if (stops(k).length > maxStop) maxStop = stops(k).length; k += 1
    }
    val buf = new Array[Char](maxStop)
    var wc = 0L
    var ns = 0L
    var kept = 0       // kept chars in the current whitespace segment
    var i = 0
    while (i <= len) {
      val ws = i == len || isWs(str.charAt(i))
      if (ws) {
        if (kept > 0) {
          wc += 1
          if (kept <= maxStop) {
            var m = 0
            var hit = false
            while (m < stops.length && !hit) {
              val st = stops(m)
              if (st.length == kept) {
                var j = 0
                while (j < kept && st.charAt(j) == buf(j)) j += 1
                hit = j == kept
              }
              m += 1
            }
            if (hit) ns += 1
          }
          kept = 0
        }
      } else {
        val c = str.charAt(i)
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          if (kept < maxStop) buf(kept) = c
          kept += 1
        }
        // any other codepoint: dropped by normText; segment continues
      }
      i += 1
    }
    ArrayData.toArrayData(Array(wc, ns))
  }
}

/** array(wc, ns) — see WordStopKernel. `stops` is a literal parameter,
  * not a child: the set is fixed at plan time (GopherStops). */
case class WordStopStats(child: Expression, stops: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_stop_stats"

  @transient private lazy val stopsArr: Array[String] = stops.toArray

  override protected def nullSafeEval(input: Any): Any =
    WordStopKernel.stats(input.asInstanceOf[UTF8String], stopsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stops", stopsArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.WordStopKernel.stats($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordStopStats {
  /** Column API: array(word_count, stopword_count) of a raw text column. */
  def apply(text: Column, stops: Seq[String]): Column =
    Bridge.column(WordStopStats(Bridge.expression(text), stops))
}
