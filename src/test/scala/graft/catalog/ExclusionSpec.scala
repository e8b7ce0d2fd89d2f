package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ExclusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wildcard rewrite * → % (root.go:237-239)") {
    assert(Exclusion.toLikePattern("*_cswysk") == "%_cswysk")
    assert(Exclusion.toLikePattern("log*") == "log%")
    assert(Exclusion.toLikePattern("exact") == "exact")
  }

  test("filterExcluded drops matching names, keeps the rest (example.yml:23-26)") {
    val df = Seq("log1", "log2", "audit_cswysk", "keepme", "logical")
      .toDF("table_name")
    val kept = Exclusion.filterExcluded(df, "table_name", Seq("log1", "log2", "*_cswysk"))
      .as[String].collect().toSet
    assert(kept == Set("keepme", "logical"))
    // empty pattern list keeps everything
    assert(Exclusion.filterExcluded(df, "table_name", Nil).count() == 5)
  }
}
