package graft

import graft.PlanText.PlanTextOps



import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: pre-bucketed tables join with NO
  * exchange on either side — at 100 TB this is the difference between a
  * full-data shuffle per join and none. Asserted on the physical plan. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    // (default warehouse dir; tables dropped at the end)
    // force SMJ: auto-broadcast would hide the bucketing effect on tiny data
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    // orphan locations survive a crashed prior run with the in-memory catalog
    Seq("li_b", "o_b").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists) { d.listFiles.foreach(_.delete()); d.delete() }
    }
    val li = Tables.t(spark, TestSpark.Sf, "lineitem")
    val orders = Tables.t(spark, TestSpark.Sf, "orders")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")
    val joined = spark.table("li_b")
      .join(spark.table("o_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    joined.collect()
    // AQE echoes the pre-adaptive plan after "== Initial Plan ==" — only
    // the final plan above it matters
    val fullPlan = joined.planText
    val plan = fullPlan.split("== Initial Plan ==").head
    // the join itself must not introduce a shuffle: no Exchange between
    // the scans and the SortMergeJoin (the aggregation's exchange is fine)
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected SMJ in:\n$plan")
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // sanity: result matches the unbucketed join
    val expected = li.join(orders, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus").collect()
    assert(joined.orderBy("o_orderstatus").collect().toSeq == expected.toSeq)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
