package graft

import graft.PlanText.PlanTextOps

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.GridCumulative

/** The two-level grid cumulative must be bit-identical to the direct
  * single-partition window at every bucket count — bucketing is a
  * monotone range split, the within/offset sums are exact integers,
  * so ANY divergence is a bug (a non-monotone bucket, an off-by-one
  * offset). Pinned on a real skewed grid (lineitem cents).
  */
class GridCumulativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val grid = Tables.t(spark, TestSpark.Sf, "lineitem")
    .select(floor($"l_extendedprice" * 100 + 0.5).cast("long").as("v"))
    .groupBy($"v").agg(count(lit(1)).as("c"))
    .localCheckpoint()

  private lazy val direct = grid
    .withColumn("cum", sum($"c").over(Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    .select($"v", $"c", $"cum")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    .sortBy(_._1).toSeq

  test("bit-identical to the direct window for buckets in {1, 7, 32}") {
    assert(direct.nonEmpty && direct.last._3 == direct.map(_._2).sum)
    for (b <- Seq(1, 7, 32)) {
      val got = GridCumulative.withRunningTotal(grid, "v", "c", "cum", b)
        .select($"v", $"c", $"cum")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got == direct, s"two-level cumulative diverged at buckets=$b")
    }
  }

  test("degenerate grids: single value, and a span smaller than the bucket count") {
    val tiny = Seq((5L, 2L), (6L, 3L), (7L, 1L)).toDF("v", "c")
    val got = GridCumulative.withRunningTotal(tiny, "v", "c", "cum", 32)
      .orderBy($"v").select($"cum").as[Long].collect().toSeq
    assert(got == Seq(2L, 5L, 6L))
    val one = Seq((9L, 4L)).toDF("v", "c")
    val g1 = GridCumulative.withRunningTotal(one, "v", "c", "cum", 32)
      .select($"cum").as[Long].collect().toSeq
    assert(g1 == Seq(4L))
  }

  test("per-task state is bounded: the big window partitions on the range bucket") {
    val plan = GridCumulative.withRunningTotal(grid, "v", "c", "cum", 32)
      .planText
    assert(plan.contains("hashpartitioning(__bkt"),
      s"grid window not partitioned by the range bucket:\n$plan")
  }
}
