package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.JoinType
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Stable plan rendering for spec assertions.
  *
  * `executedPlan.toString` under AQE hides subtrees behind
  * `ReusedExchange` / `*QueryStage` pointers, and WHICH branch gets the
  * pointer depends on session-wide exchange-reuse state — so a string
  * assertion like `plan.contains("LeftAnti")` passes in isolation and
  * fails under full-suite ordering (the r12 q412 flake). This walker
  * follows the pointers and prints every distinct physical node exactly
  * once, making containment checks order-independent:
  *   - positive checks see nodes even when their branch is rendered as
  *     a reuse pointer;
  *   - exact-count checks (e.g. "ONE parquet scan") still count each
  *     physical node once, because reused subtrees are deduped by
  *     object identity — a `ReusedExchange` is NOT a second read.
  */
object PlanText {

  /** Every distinct physical node reachable from the (final, if
    * executed) plan, following AQE stage pointers, reused exchanges,
    * and subqueries; each node once, by identity.
    */
  def finalNodes(df: DataFrame): Seq[SparkPlan] = {
    val seen = new java.util.IdentityHashMap[SparkPlan, Unit]
    val out = scala.collection.mutable.ArrayBuffer[SparkPlan]()
    def walk(p: SparkPlan): Unit = if (!seen.containsKey(p)) {
      seen.put(p, ())
      out += p
      val followed = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec        => Seq(s.plan)
        case r: ReusedExchangeExec    => Seq(r.child)
        case _                        => Nil
      }
      (p.children ++ followed ++ p.subqueries).foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    out.toSeq
  }

  /** One line per distinct node (operator name + fields + scan
    * metadata). Use for `.contains` / count assertions instead of
    * `executedPlan.toString`.
    */
  def planStr(df: DataFrame): String =
    finalNodes(df).map(_.simpleString(100)).mkString("\n")

  /** Join types present in the OPTIMIZED logical plan — the semantic
    * (AQE-independent) way to assert "this query anti-joins".
    */
  def logicalJoinTypes(df: DataFrame): Seq[JoinType] =
    df.queryExecution.optimizedPlan.collect { case j: Join => j.joinType }

  /** `df.planText` — drop-in replacement for the brittle
    * `df.queryExecution.executedPlan.toString` spec idiom.
    */
  implicit class PlanTextOps(private val df: DataFrame) extends AnyVal {
    def planText: String = planStr(df)
  }
}
