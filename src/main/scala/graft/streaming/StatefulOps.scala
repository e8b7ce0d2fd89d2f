package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Arbitrary-state streaming operators on the Spark 4 `transformWithState`
  * API (the successor of flatMapGroupsWithState: typed state variables,
  * per-state TTL, timers decoupled from output mode).
  *
  * These are the continuous forms of training-data-pipeline maintenance
  * ops: exact dedup of an event stream and running per-key statistics —
  * the pieces a CDC-style continuous sync (the reference's migration loop
  * run forever) needs. State lives in the RocksDB state store, hash
  * partitioned by key; TTL bounds it at scale.
  */
object StatefulOps {

  case class KeyedEvent(dedup_key: String, event_id: Long, user_id: Long, value: Double)

  /** Streaming exact dedup: the first event per `dedup_key` passes, later
    * replicas are dropped. One boolean ValueState per key; `ttl` bounds
    * the memory of "seen" keys (a replica arriving after the TTL horizon
    * passes again — the standard at-scale trade: exactly-once dedup
    * within the horizon, at-least-once beyond it). */
  class DedupProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[String, KeyedEvent, KeyedEvent] {
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[KeyedEvent],
                                 timers: TimerValues): Iterator[KeyedEvent] = {
      if (seen.exists || !rows.hasNext) Iterator.empty
      else {
        seen.update(true)
        Iterator.single(rows.next())
      }
    }
  }

  /** First-seen-wins streaming dedup keyed on `dedup_key`. */
  def dedupStream(events: Dataset[KeyedEvent],
                  ttl: java.time.Duration = null): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.dedup_key)
      .transformWithState(new DedupProcessor(ttl), TimeMode.None(), OutputMode.Append())
  }

  case class UserStats(user_id: Long, n_events: Long, total_value: Double)

  /** Running per-user counters: ValueState[(count, sum)] updated per
    * micro-batch, emitting the new running totals for each key that saw
    * data — the continuous form of a grouped aggregate feeding a
    * dashboard/serving table. */
  class RunningStatsProcessor
      extends StatefulProcessor[Long, KeyedEvent, UserStats] {
    @transient private var agg: org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[(Long, Double)]("agg",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
                                 timers: TimerValues): Iterator[UserStats] = {
      var (n, sum) = if (agg.exists) agg.get else (0L, 0.0)
      rows.foreach { e => n += 1; sum += e.value }
      agg.update((n, sum))
      Iterator.single(UserStats(key, n, sum))
    }
  }

  /** Running per-user event count + value sum. */
  def runningUserStats(events: Dataset[KeyedEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
