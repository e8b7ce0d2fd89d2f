package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Distinct 32-bit hashes of the word k-gram shingles of a normalized
  * (single-space-separated) text, in one primitive pass: split → k-gram
  * join → md5 → leading 8 hex digits as int64 → distinct.
  *
  * Replaces the two interpreted higher-order stages the MinHash pipeline
  * otherwise pays per document (transform building gram strings with
  * per-element try_element_at/concat_ws, then transform md5-ing each
  * gram). The md5-of-UTF8-bytes here is byte-identical to SQL
  * `md5(gram)` on every engine, so the shared DuckDB oracle template is
  * unchanged. Output order is ascending (sorted during dedup); all
  * consumers are set/min-semantics.
  *
  * Edge semantics match the SQL template exactly: fewer than k words →
  * one shingle of the available words; empty text → the single md5("")
  * shingle.
  */
object ShingleHashes {
  def hash32SortedDistinct(s: UTF8String, k: Int): ArrayData = {
    val words = s.toString.split(" ", -1)
    val len = words.length
    val m = math.max(len - (k - 1), 1)
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder()
      var j = i
      val end = math.min(i + k, len)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      // first 8 hex digits = first 4 bytes, big-endian, unsigned
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
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

case class WordShingleHash32(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hash32"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.hash32SortedDistinct(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.hash32SortedDistinct($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleHash32 {
  /** Column API: distinct 32-bit shingle hashes of normalized text. */
  def apply(normText: Column, k: Int): Column =
    Bridge.column(WordShingleHash32(Bridge.expression(normText), k))
}
