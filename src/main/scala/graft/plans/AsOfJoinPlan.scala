package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Native backward as-of join — the SURVEY §7.3(c) extension path
  * (custom LogicalPlan + SparkStrategy + SparkPlan) for the operator
  * Spark lacks: each left row (key, t) joins the right row with the
  * same key and the greatest time ≤ t, or nulls.
  *
  * The composed form (range-join + windowed top-1, q45) is semantically
  * identical and stays the oracle; this physical operator is the scale
  * path: both sides hash-partition on the key and sort by (key, time),
  * then ONE forward merge pass per partition joins every left row —
  * no row multiplication (the range join materializes every (event,
  * earlier-order) pair before discarding all but one) and no window.
  * O(|L| + |R|) per partition, zero extra state beyond one buffered
  * right row.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTime: Expression, rightTime: Expression,
                    rightTieBreak: Seq[Expression] = Nil)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoin into AsOfJoinExec (inject via injectPlannerStrategy or
  * spark.experimental.extraStrategies). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTieBreak: Seq[Expression] = Nil)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Co-partition both sides on the key; EnsureRequirements inserts the
    * exchanges (and aligns partition counts across the two children). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  /** (key, time) ascending on both sides — the merge invariant. The
    * optional right tie-break pins which of several equal-time rows the
    * merge keeps ("last consumed" = greatest tie-break), making the
    * operator deterministic on non-unique series. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val outAttrs = output
    val leftAttrs = left.output
    val rightAttrs = right.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind against a right schema marked nullable: unmatched left rows
      // join a null row, and a non-nullable BoundReference would read
      // those nulls as zeros
      val project = UnsafeProjection.create(outAttrs,
        leftAttrs ++ rightAttrs.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightAttrs.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // the latest right row whose (key, time) the merge has passed;
      // valid for a left row only while the keys still compare equal
      var matchRow: InternalRow = null
      var matchKey: Any = null
      lIter.map { l =>
        val k = lk.eval(l)
        val t = lt.eval(l)
        // SQL join semantics: a null key or null time matches nothing
        if (k == null || t == null) project(joined(l, nullRight))
        else {
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val hk = rk.eval(head)
            if (hk == null) { rBuf.next() } // null right key matches nothing
            else {
              val c = keyOrd.compare(hk, k)
              val ht = if (c == 0) rt.eval(head) else null
              if (c < 0 || (c == 0 && ht != null && timeOrd.compare(ht, t) <= 0)) {
                val consumed = rBuf.next()
                if (c == 0) { matchRow = consumed.copy(); matchKey = hk }
                else { matchRow = null; matchKey = null } // smaller key flushed
              } else if (c == 0 && ht == null) { rBuf.next() } // null time: skip
              else advance = false
            }
          }
          val r =
            if (matchRow != null && keyOrd.compare(matchKey, k) == 0) matchRow
            else nullRight
          project(joined(l, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinOps {
  /** Backward as-of left join by column NAME: for every left row, the
    * right row with equal key and greatest rightTime ≤ leftTime (nulls
    * when none). Requires the strategy to be registered
    * (GraftExtensions, or spark.experimental.extraStrategies). */
  def asofBackward(leftDf: DataFrame, rightDf: DataFrame,
                   key: (String, String), time: (String, String),
                   rightTieBreak: Seq[String] = Nil): DataFrame = {
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    val (lk, rk) = (attr(lPlan, key._1), attr(rPlan, key._2))
    val (lt, rt) = (attr(lPlan, time._1), attr(rPlan, time._2))
    // the exec builds interpreted orderings from the LEFT types and
    // applies them to right-side values — a type mismatch would surface
    // as a ClassCastException mid-task; fail at plan time instead
    def requireSameType(what: String, a: Attribute, b: Attribute): Unit =
      require(a.dataType == b.dataType,
        s"as-of join $what type mismatch: left ${a.name}: ${a.dataType.sql} " +
          s"vs right ${b.name}: ${b.dataType.sql} — cast one side first")
    requireSameType("key", lk, rk)
    requireSameType("time", lt, rt)
    Bridge.dataset(leftDf.sparkSession,
      AsOfJoin(lPlan, rPlan, lk, rk, lt, rt, rightTieBreak.map(attr(rPlan, _))))
  }
}
