package graft.catalog

import graft.PlanText.PlanTextOps

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one hot key (90% of rows) + a long tail
  private def skewed = ((1 to 900).map(i => ("hot", i.toLong)) ++
    (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")

  test("saltedSumCount equals the direct aggregation") {
    val direct = skewed.groupBy($"k")
      .agg(sum($"v").as("sum_value"), count(lit(1)).as("n_rows"))
      .orderBy("k").collect()
    val salted = Skew.saltedSumCount(skewed, $"k", $"v", buckets = 8)
      .orderBy("k").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("AQE splits a skewed sort-merge join at runtime (the no-salt path)") {
    // the runtime complement to explicit salting: thresholds lowered so
    // the test-sized hot partition qualifies as skewed; at production
    // scale the defaults (256 MB) play the same role
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "3KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = ((1 to 20000).map(i => ("hot", i.toLong)) ++
        (1 to 200).map(i => (s"k${i % 20}", i.toLong))).toDF("k", "v")
      val dim = (Seq("hot") ++ (0 until 20).map(i => s"k$i"))
        .map(k => (k, s"label_$k")).toDF("k", "label")
      val joined = big.join(dim, Seq("k"))
      // materialize THIS DataFrame's execution (count() would build a
      // separate one and leave this plan un-finalized)
      assert(joined.collect().length == 20200)
      val plan = joined.planText
      assert(plan.contains("SortMergeJoin") && plan.contains("skew=true"), plan)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("saltedJoin equals the plain equi-join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val direct = skewed.join(dim, Seq("k")).groupBy($"k", $"label")
      .agg(count(lit(1)).as("n")).orderBy("k").collect()
    val salted = Skew.saltedJoin(skewed, dim, "k", buckets = 8)
      .groupBy($"k", $"label").agg(count(lit(1)).as("n")).orderBy("k").collect()
    assert(salted.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      == direct.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq)
  }
}
