package graft.ext

import graft.PlanText.PlanTextOps

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.{Tables, TestSpark}

class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bands = spark.range(0, 30).select(
    $"id".as("band_id"),
    ($"id" * 20000.0 - 5000.0).as("lo"),
    ($"id" * 20000.0 + 25000.0).as("hi"))

  private def pts = Tables.t(spark, TestSpark.Sf, "orders")
    .select($"o_orderkey", $"o_totalprice")

  test("bucketed interval join matches the naive range-predicate join") {
    val got = IntervalJoin.pointInterval(pts, "o_totalprice", bands, "lo", "hi",
        bucketWidth = 20000.0)
      .select($"o_orderkey", $"band_id")
      .as[(Long, Long)].collect().toSet
    val naive = pts.join(bands,
        $"lo" <= $"o_totalprice" && $"o_totalprice" < $"hi")
      .select($"o_orderkey", $"band_id")
      .as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got.nonEmpty)
    // overlapping bands: some points must land in 2 bands
    assert(got.groupBy(_._1).exists(_._2.size == 2))
  }

  test("bucket width does not change semantics (half-open boundaries)") {
    // hi exactly on a bucket boundary + points exactly on lo/hi edges
    val iv = Seq((1L, 0.0, 40000.0), (2L, 10000.0, 20000.0)).toDF("iid", "lo", "hi")
    val p = Seq((10L, 0.0), (11L, 19999.99), (12L, 20000.0), (13L, 39999.0), (14L, 40000.0))
      .toDF("pid", "x")
    for (w <- Seq(7000.0, 20000.0, 100000.0)) {
      val got = IntervalJoin.pointInterval(p, "x", iv, "lo", "hi", w)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(got == Set((10L, 1L), (11L, 1L), (11L, 2L), (12L, 1L), (13L, 1L)),
        s"width $w wrong: $got")
    }
  }

  test("the plan is an equi-join on the bucket id, not a nested loop") {
    val plan = IntervalJoin.pointInterval(pts, "o_totalprice", bands, "lo", "hi",
        bucketWidth = 20000.0)
      .planText
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("intervalOverlap matches the naive overlap join, once per pair, any width") {
    // overlapping sessions (left) x maintenance windows (right)
    val l = Seq((1L, 0.0, 100.0), (2L, 50.0, 260.0), (3L, 300.0, 301.0), (4L, 500.0, 600.0))
      .toDF("lid", "l_lo", "l_hi")
    val r = Seq((10L, 90.0, 210.0), (11L, 200.0, 300.5), (12L, 300.0, 310.0), (13L, 601.0, 700.0))
      .toDF("rid", "r_lo", "r_hi")
    val naive = l.join(r, greatest($"l_lo", $"r_lo") < least($"l_hi", $"r_hi"))
      .select($"lid", $"rid").as[(Long, Long)].collect().sorted.toSeq
    for (w <- Seq(7.0, 50.0, 1000.0)) {
      val got = IntervalJoin.intervalOverlap(l, "l_lo", "l_hi", r, "r_lo", "r_hi", w)
        .select($"lid", $"rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naive, s"width $w: $got vs $naive")
      // exactly once per pair even when many buckets are shared
      assert(got.distinct == got)
    }
    assert(naive.nonEmpty && naive.contains((2L, 10L)) && naive.contains((3L, 12L)))
  }

  test("intervalOverlap plans as an equi-join on the bucket, not a nested loop") {
    val l = Tables.t(spark, TestSpark.Sf, "orders")
      .select($"o_orderkey", ($"o_totalprice" - 1000.0).as("l_lo"), ($"o_totalprice" + 1000.0).as("l_hi"))
    val r = spark.range(0, 30).select($"id".as("band_id"),
      ($"id" * 20000.0 - 5000.0).as("r_lo"), ($"id" * 20000.0 + 25000.0).as("r_hi"))
    val plan = IntervalJoin.intervalOverlap(l, "l_lo", "l_hi", r, "r_lo", "r_hi", 20000.0)
      .planText
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
