package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Data-adaptive join-strategy pick (optimization guide §3.1): broadcast
  * a MATERIALIZED (localCheckpoint'd) side when its measured row count is
  * small, instead of letting the planner sort-merge against it.
  *
  * Why not rely on AQE: a localCheckpoint'd plan is a LogicalRDD with no
  * usable size statistics, so the planner never auto-broadcasts it — the
  * wedge operators (q296/q321/q353, q160, q272) were sorting their
  * 40–150M-row wedge streams against an existing-edge table of well under
  * a million rows (measured: the q296 anti-join's sort spilled ~20 GB at
  * sf0.1).
  *
  * The caller passes a checkpointed frame, so `count()` is a cheap scan
  * of local blocks, not a recompute. Above the cap the frame is returned
  * unhinted and the planner keeps the shuffle join — the 100 TB shape —
  * so results are identical either way (the hint changes strategy, never
  * semantics).
  */
object AdaptiveJoin {

  /** ~128 MB of built hash relation for two-long rows — comfortably
    * inside one executor's memory at any deployment size, far under the
    * 8 GB broadcast hard cap.
    */
  val BroadcastRowCap = 4000000L

  /** The measured pick itself, exposed so staged forms can make ONE
    * decision and apply it to every slice (a per-slice re-count would
    * both cost a job per slice and risk slices disagreeing on strategy).
    *
    * NOTE the cap prices NARROW rows (two longs ≈ 32 B built); a caller
    * whose rows carry arrays/strings must pass a proportionally smaller
    * `cap` — the gate is row count, not bytes.
    */
  def isSmall(checkpointed: DataFrame, cap: Long = BroadcastRowCap): Boolean =
    checkpointed.count() <= cap

  /** Apply an already-made pick: hint or pass through unchanged. */
  def broadcastIf(flag: Boolean, df: DataFrame): DataFrame =
    if (flag) broadcast(df) else df

  /** One-shot form: count the materialized frame and hint if small.
    * Same narrow-row precondition as [[isSmall]].
    */
  def broadcastIfSmall(checkpointed: DataFrame,
                       cap: Long = BroadcastRowCap): DataFrame =
    broadcastIf(isSmall(checkpointed, cap), checkpointed)
}
