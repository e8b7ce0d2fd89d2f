package graft

import org.scalatest.funsuite.AnyFunSuite

/** TEMP dev scaffold — dumps optimized plans; deleted before commit. */
class PlanDumpTmp extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dump plans") {
    for (q <- Seq("q321_adamic_adar_capped", "q340_personalized_pagerank",
        "q335_fs_linkage_weights")) {
      val df = SparkEntry.queries(q)(spark, TestSpark.Sf)
      val s = df.queryExecution.optimizedPlan.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/tmp/plan_$q.txt"), s)
    }
  }
}
