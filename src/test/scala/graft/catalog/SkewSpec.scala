package graft.catalog

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
