package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Character n-gram set of a string, packed into collision-free int64s
  * (codepoint radix 0x110000), SORTED and DISTINCT — emitted in one pass
  * as a primitive long[].
  *
  * This replaces the expression pyramid
  * `array_sort(array_distinct(transform(sequence(...), i ->
  * (ascii(substr(text,i,1))*M + ascii(substr(text,i+1,1)))*M + ...)))`,
  * whose per-element lambdas evaluate interpretively and re-slice the
  * string three times per gram. Semantics match exactly: grams running
  * past the end pad with 0 (ascii('') = 0), a short text yields its
  * single padded gram.
  */
object CharNgrams {
  val M = 1114112L // 0x110000 > any Unicode codepoint

  /** Called from both the interpreted and the generated path. */
  def packSortedDistinct(s: UTF8String, n: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val len = cps.length
    val m = math.max(len - (n - 1), 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var k = 0
      while (k < n) {
        acc = acc * M + (if (i + k < len) cps(i + k) else 0L)
        k += 1
      }
      out(i) = acc
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < m) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == m) out else java.util.Arrays.copyOf(out, w))
  }
}

case class CharNgramLongs(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_longs"

  override protected def nullSafeEval(input: Any): Any =
    CharNgrams.packSortedDistinct(input.asInstanceOf[UTF8String], n)

  /** One static call — the expression stays inside whole-stage codegen
    * with no per-gram virtual dispatch. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharNgrams.packSortedDistinct($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgramLongs {
  /** Column API: sorted-distinct packed char n-grams. */
  def apply(text: Column, n: Int): Column =
    Bridge.column(CharNgramLongs(Bridge.expression(text), n))
}
