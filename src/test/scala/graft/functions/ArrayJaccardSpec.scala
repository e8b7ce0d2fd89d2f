package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ArrayJaccardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SortedLongJaccard equals array_intersect/array_union on random sets") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val a = (1 to rnd.nextInt(40) + 1).map(_ => rnd.nextInt(60).toLong).distinct.sorted
      val b = (1 to rnd.nextInt(40) + 1).map(_ => rnd.nextInt(60).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      ArrayJaccard.sortedLongJaccard($"a", $"b").as("fast"),
      (size(array_intersect($"a", $"b")).cast("double") / size(array_union($"a", $"b"))).as("ref"))
    assert(got.filter($"fast" =!= $"ref").count() == 0)
  }

  test("edge cases: disjoint, identical, null") {
    val df = Seq(
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))).toDF("a", "b")
    val r = df.select(ArrayJaccard.sortedLongJaccard($"a", $"b")).as[Double].collect()
    assert(r(0) == 0.0 && r(1) == 1.0)
    val withNull = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(withNull.select(ArrayJaccard.sortedLongJaccard($"a", $"b").as("j"))
      .filter($"j".isNull).count() == 1)
  }
}
