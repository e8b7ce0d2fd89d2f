package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Codepoint-class counters — the primitive-loop twins of
  * `regexp_count(text, '[a-z]')` and `regexp_count(text, '[^a-z0-9 ]')`
  * used by the text-quality operator. A single-character regex class is
  * just a per-codepoint predicate; running the regex engine per char is
  * pure overhead on the corpus-scan hot path.
  *
  * Class semantics match the regexes exactly, INCLUDING non-ASCII:
  * "alpha" counts only a-z; "punct" counts every codepoint that is not
  * a-z, 0-9, or the ASCII space (so multibyte letters count as punct,
  * exactly as `[^a-z0-9 ]` matches them).
  */
object CharClassCount {
  def countAlpha(s: UTF8String): Int = {
    val str = s.toString
    var n = 0
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp >= 'a' && cp <= 'z') n += 1
      i += Character.charCount(cp)
    }
    n
  }

  def countPunct(s: UTF8String): Int = {
    val str = s.toString
    var n = 0
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      val inClass = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') || cp == ' '
      if (!inClass) n += 1
      i += Character.charCount(cp)
    }
    n
  }
}

case class AlphaCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "alpha_count"
  override protected def nullSafeEval(input: Any): Any =
    CharClassCount.countAlpha(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharClassCount.countAlpha($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PunctCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "punct_count"
  override protected def nullSafeEval(input: Any): Any =
    CharClassCount.countPunct(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharClassCount.countPunct($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharClassCounts {
  def alphaCount(text: Column): Column = Bridge.column(AlphaCount(Bridge.expression(text)))
  def punctCount(text: Column): Column = Bridge.column(PunctCount(Bridge.expression(text)))
}
