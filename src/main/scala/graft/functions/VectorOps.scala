package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.graftbridge.Bridge

/** Dot product of two array<double> columns as one primitive loop.
  *
  * This is the inner kernel of every embedding-similarity operator
  * (brute-force / LSH / IVF ANN, cosine near-dup): at |Q|·N candidate
  * pairs it replaces `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — which
  * materializes a zipped array and walks it with interpreted lambda
  * calls per element — with a single codegen'd multiply-add loop over
  * unboxed doubles.
  *
  * Summation order is left-to-right in both the interpreted and the
  * generated path, and the quantized integer-valued inputs (see
  * ext.Similarity) make each product and partial sum exact, so results
  * are bit-identical across engines and partitionings.
  *
  * Length mismatch returns NULL (matching `zip_with`+`aggregate`, which
  * null-pads the shorter side into a null product). Array ELEMENTS are
  * required non-null (`containsNull=false`) — embeddings are dense; the
  * hot loop reads doubles unchecked, so a null element would read as
  * 0.0. The SQL-registered form shares these semantics.
  */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_dot"
  // produces null on length mismatch even for non-null inputs
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    var acc = 0.0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Column API: dot product of two array<double> columns. */
  def doubleDot(a: Column, b: Column): Column =
    Bridge.column(DoubleDot(Bridge.expression(a), Bridge.expression(b)))
}
