package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows; every registered query
  * analyzes and runs at sf0.001; every oracle key exists in queries. */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry produces rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys, with matching columns checkable") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
    assert(qk.nonEmpty)
  }

  test("every query runs at sf0.001") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.Sf).count()
      assert(n >= 0, s"$name failed")
    }
  }
}
