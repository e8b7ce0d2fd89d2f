package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-close protocol's parity subset is a documented artifact
  * (BASELINE.md "Parity-subset bench"): pin its composition so a
  * registry rename or renumber fails here instead of silently changing
  * what bench/parity_subset.json measures.
  */
class BenchCloseSpec extends AnyFunSuite {

  test("parity subset is exactly the 19 documented §2 queries") {
    val expected = Seq(
      "q01_agg", "q02_deferred_join_page", "q03_exclusion_filter",
      "q04_group_concat", "q05_typemap", "q06_value_transforms",
      "q07_count_compare", "q08_page_plan", "q09_schema_probe",
      "q10_join_agg", "q11_sort_limit", "q12_scalar_funcs",
      "q13_window_topk", "q14_event_window", "q15_json_extract",
      "q36_ddl_index", "q37_ddl_fk", "q38_ddl_sequence",
      "q39_ddl_view_trigger")
    assert(BenchClose.paritySubset == expected)
  }

  test("every parity query is registered and oracle-gated") {
    BenchClose.paritySubset.foreach { n =>
      assert(SparkEntry.queries.contains(n), s"$n not in registry")
      assert(SparkEntry.oracleSql.contains(n), s"$n has no oracle")
    }
  }

  test("non-default SF dir cannot silently repoint the bench pin") {
    BenchClose.requirePinnableSf(BenchClose.DefaultSfDir, forcePin = false)
    BenchClose.requirePinnableSf("/tmp/scale_x100", forcePin = true)
    intercept[IllegalArgumentException] {
      BenchClose.requirePinnableSf("/tmp/scale_x100", forcePin = false)
    }
  }

  test("calibration shapes: fixed trio, scalar outputs, no cartesian") {
    import graft.PlanText.PlanTextOps
    val spark = TestSpark.spark
    assert(Calibration.shapes.map(_._1) == Seq("scan", "shuffle", "graph"))
    Calibration.shapes.foreach { case (name, fn) =>
      val df = fn(spark)
      // shape-pure microqueries fold to a handful of scalar columns —
      // the sink cost must be nil so the timing is the shape itself
      assert(df.schema.fields.length <= 2, s"$name output not scalar-sized")
      // plan inspection only (no execution — the shapes are sized in
      // seconds, not test-budget): the graph shape must be a keyed
      // equi-join, never a row cross
      assert(!df.planText.contains("CartesianProduct"), s"$name crosses")
    }
  }
}
