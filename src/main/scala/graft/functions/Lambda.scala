package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers for higher-order-function expressions. */
object Lambda {

  /** Evaluate `c` once per row and hand the *bound* lambda variable to
    * `body`.
    *
    * Inside transform/aggregate/filter lambdas, any captured non-attribute
    * expression is re-evaluated once per array element — and
    * ProjectCollapse happily inlines a column's defining expression into
    * the lambda, turning O(n) array pipelines into O(n²) silently.
    * Wrapping the expression in a single-element array and binding it
    * through an outer transform pins its evaluation count to exactly one,
    * no matter how the optimizer rewrites the plan.
    */
  def bind1(c: Column)(body: Column => Column): Column =
    element_at(transform(array(c), a => body(a)), 1)
}
