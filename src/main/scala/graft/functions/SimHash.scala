package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.graftbridge.Bridge

/** 32-bit SimHash of a token array in one primitive pass per document.
  *
  * Exactly the bit-vote scheme of the shared SQL template
  * (Dedup.md5DigitSql / simhashBitSql): token → md5 → the 8 leading hex
  * digits carry 32 vote bits; bit j reads hex digit j/4 (0-based here),
  * power 2^(j%4); votes sum ±1 over ALL tokens (with multiplicity);
  * bit set when the sum is ≥ 0. The md5 of the token's UTF-8 bytes is
  * byte-identical to SQL md5(token), so the kernel is hash-compatible
  * with the DuckDB oracle while collapsing the explode → md5 → 32
  * partial-sum aggregation pipeline into a map-only projection.
  */
object SimHash {
  def simhash32(tokens: ArrayData): Long = {
    val votes = new Array[Int](32)
    val md = MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      md.reset()
      val d = md.digest(tok.getBytes)
      var j = 0
      while (j < 32) {
        // hex digit at 1-based position j/4+1 = nibble of byte (j/4)/2
        val p = j / 4
        val byte = d(p / 2) & 0xff
        val digit = if (p % 2 == 0) byte >>> 4 else byte & 0xf
        val pow = 1 << (j % 4)
        votes(j) += (if (((digit / pow) % 2) == 1) 1 else -1)
        j += 1
      }
      t += 1
    }
    var packed = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) >= 0) packed |= 1L << j
      j += 1
    }
    packed
  }
}

case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any =
    SimHash.simhash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {
  /** Column API: 32-bit simhash of an array<string> token column. */
  def apply(tokens: Column): Column =
    Bridge.column(SimHash32(Bridge.expression(tokens)))
}
