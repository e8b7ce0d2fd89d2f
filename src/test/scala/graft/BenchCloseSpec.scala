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
}
