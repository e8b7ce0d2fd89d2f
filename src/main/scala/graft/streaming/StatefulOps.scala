package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

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

  /** First-seen-wins streaming dedup keyed on `dedup_key`. State TTL is
    * only meaningful under processing-time mode (Spark rejects a TTL
    * config in TimeMode.None at query start), so the time mode follows
    * the ttl argument. */
  def dedupStream(events: Dataset[KeyedEvent],
                  ttl: java.time.Duration = null): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    val timeMode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    events.groupByKey(_.dedup_key)
      .transformWithState(new DedupProcessor(ttl), timeMode, OutputMode.Append())
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

  /** RunningStatsProcessor warm-started from a batch snapshot: the
    * migration hand-off pattern — backfill computes per-key totals once
    * in batch, the stream continues from them instead of recounting
    * history. handleInitialState seeds each key's ValueState before the
    * first batch touches it. */
  class WarmStartStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, KeyedEvent, UserStats, UserStats] {
    @transient private var agg: org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[(Long, Double)]("agg",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)

    override def handleInitialState(key: Long, initial: UserStats,
                                    timers: TimerValues): Unit =
      agg.update((initial.n_events, initial.total_value))

    override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
                                 timers: TimerValues): Iterator[UserStats] = {
      var (n, sum) = if (agg.exists) agg.get else (0L, 0.0)
      rows.foreach { e => n += 1; sum += e.value }
      agg.update((n, sum))
      Iterator.single(UserStats(key, n, sum))
    }
  }

  /** Running per-user stats continuing from `snapshot` (a batch
    * backfill's per-user totals). */
  def runningUserStatsFrom(events: Dataset[KeyedEvent],
                           snapshot: Dataset[UserStats]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new WarmStartStatsProcessor,
        TimeMode.None(), OutputMode.Update(), snapshot.groupByKey(_.user_id))
  }

  case class RecentEvents(user_id: Long, event_ids: Seq[Long])

  /** Bounded per-key event buffer on ListState — the state shape the
    * ValueState ops don't exercise: appendValue is O(1) per arrival (no
    * read-modify-write of the whole list), and the cap bounds state
    * growth per key. Emits each key's current window of the last
    * `keep` event ids after every batch it saw data in. */
  class RecentEventsProcessor(keep: Int)
      extends StatefulProcessor[Long, KeyedEvent, RecentEvents] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[Long]("buf", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
                                 timers: TimerValues): Iterator[RecentEvents] = {
      rows.foreach(e => buf.appendValue(e.event_id))
      val all = buf.get().toSeq
      val trimmed = if (all.size > keep) all.takeRight(keep) else all
      if (all.size > keep) buf.put(trimmed.toArray)
      Iterator.single(RecentEvents(key, trimmed))
    }
  }

  /** Last-`keep` event ids per user, maintained incrementally. */
  def recentEvents(events: Dataset[KeyedEvent], keep: Int = 3): Dataset[RecentEvents] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RecentEventsProcessor(keep), TimeMode.None(), OutputMode.Update())
  }

  case class TypeCount(user_id: Long, dedup_key: String, n: Long)

  /** Per-(key, sub-key) counters on MapState: one state entry per
    * sub-key, point-updated — the shape a per-user per-event-type
    * counter table needs. Only sub-keys seen in the batch are emitted
    * (their new totals), not the whole map. */
  class SubKeyCountProcessor
      extends StatefulProcessor[Long, KeyedEvent, TypeCount] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
                                 timers: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet[String]()
      rows.foreach { e =>
        val cur = if (counts.containsKey(e.dedup_key)) counts.getValue(e.dedup_key) else 0L
        counts.updateValue(e.dedup_key, cur + 1)
        touched += e.dedup_key
      }
      touched.iterator.map(k => TypeCount(key, k, counts.getValue(k)))
    }
  }

  /** Running per-(user, dedup_key) counts via MapState. */
  def subKeyCounts(events: Dataset[KeyedEvent]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SubKeyCountProcessor, TimeMode.None(), OutputMode.Update())
  }

  case class TimedKeyedEvent(user_id: Long, ts: java.sql.Timestamp)
  case class InactiveUser(user_id: Long, last_seen_ms: Long, n_events: Long)

  /** Inactivity detection on event-time TIMERS — the piece of the
    * transformWithState API the value-state ops don't exercise: every
    * batch re-arms one timer at last-event + gap; when the watermark
    * passes it, handleExpiredTimer fires exactly once with the user's
    * final state. The emission is timer-driven (nothing arrives for the
    * key in that batch), which flatMapGroupsWithState could do only
    * through its timeout flag — here timers are first-class and
    * per-key-re-armable. */
  class InactivityProcessor(gapMs: Long)
      extends StatefulProcessor[Long, TimedKeyedEvent, InactiveUser] {
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[(Long, Long)]("seen",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TimedKeyedEvent],
                                 timers: TimerValues): Iterator[InactiveUser] = {
      var (last, n) = if (seen.exists) seen.get else (Long.MinValue, 0L)
      rows.foreach { e =>
        last = math.max(last, e.ts.getTime)
        n += 1
      }
      seen.update((last, n))
      // stale-timer pattern: timers from earlier batches are left in
      // place and ignored at expiry (their time ≠ the current deadline);
      // deleting while iterating listTimers mutates the store mid-scan
      getHandle.registerTimer(last + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[InactiveUser] = {
      if (seen.exists) {
        val (last, n) = seen.get
        // only the timer registered at the CURRENT deadline counts
        if (last + gapMs == expired.getExpiryTimeInMs) {
          seen.clear()
          return Iterator.single(InactiveUser(key, last, n))
        }
      }
      Iterator.empty
    }
  }

  /** Emit each user once, when the event-time watermark passes their
    * last event + gap. Input must carry a watermark on `ts`. */
  def inactiveUsers(events: Dataset[TimedKeyedEvent],
                    gapMs: Long = 3600 * 1000L): Dataset[InactiveUser] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new InactivityProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
