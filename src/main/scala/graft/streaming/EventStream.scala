package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference is strictly batch (SURVEY
  * §2.7) — its concurrency is a goroutine pool, which Spark's scheduler
  * replaces — so these operators are the *continuous* forms of the batch
  * queries (q14 windowed counts, q28 sessionization) for CDC-style
  * pipelines: same transforms, `readStream` in, `writeStream` out.
  */
object EventStream {

  /** events stream schema template; ts is declared per-file (see
    * streamFromParquetDir — the generator has emitted both
    * TIMESTAMP(NANOS) and TIMESTAMP(MICROS) encodings over time). */
  import org.apache.spark.sql.types._
  val RawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet.
    *
    * A streaming source needs its schema declared up front, but the ts
    * physical type depends on how the files were generated: Spark's
    * TimestampType reads MICROS directly, while NANOS only reads as long
    * (legacy flag) and needs an explicit div-1000 conversion — the same
    * dual handling as the batch reader (Tables.t). One driver-side footer
    * probe via the batch reader picks the right declaration; at 100 TB
    * that is a single-file metadata read, not a scan. An empty or
    * not-yet-populated directory (a normal state for a file-source
    * stream awaiting its first files) has no footer to probe — fall
    * back to the NANOS/long declaration so the stream still starts. */
  def streamFromParquetDir(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val nanosAsLong =
      try spark.read.parquet(dir).schema("ts").dataType.typeName == "long"
      catch { case scala.util.control.NonFatal(_) => true }
    if (nanosAsLong)
      spark.readStream.schema(RawSchema).parquet(dir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      spark.readStream.schema(StructType(RawSchema.map(f =>
          if (f.name == "ts") f.copy(dataType = TimestampType) else f)))
        .parquet(dir)
  }

  /** Tumbling-window counts with a watermark — the streaming form of
    * q14_event_window. Late data beyond 10 minutes is dropped; state is
    * bounded by (watermark horizon / window) × |event_type|. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n_events"))

  /** Streaming exact-dedup → distinct-user counts.
    * `dropDuplicatesWithinWatermark` is the form whose state the
    * watermark actually EVICTS: plain `dropDuplicates(keys)` without the
    * event-time column among the keys never builds an eviction
    * predicate, so its state grows one row per key forever. Here a key
    * silent longer than the horizon is evicted and a later re-arrival
    * re-counts — the standard streaming-dedup contract, and the price
    * of bounded state. The downstream aggregate makes the result
    * order-independent, so within one watermark horizon the batch
    * oracle is exactly `count(DISTINCT user_id)`. */
  def distinctUsersByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))

  /** Stream-static enrichment: every micro-batch joins the (small,
    * broadcast) static dimension — the canonical streaming star-join.
    * The static side is planned once and rebroadcast per batch; no
    * stream-side state is needed for the join itself, so state is
    * bounded by the downstream aggregate alone. */
  def enrichedTypeCounts(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), events("user_id") === dim("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** Stream-stream interval self-join: purchases attributed to the same
    * user's clicks within the preceding hour. Both sides carry watermarks
    * and the join condition bounds event-time distance, so the engine
    * keeps only one hour of per-side state — the bounded-state shape
    * stream-stream joins require at scale. */
  def clickToPurchase(events: DataFrame, attributionWindow: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", attributionWindow)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", attributionWindow)
    purchases.join(clicks,
      expr(s"""p_user = c_user AND click_ts <= purchase_ts
              AND click_ts >= purchase_ts - INTERVAL $attributionWindow"""))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** Left-outer stream-stream interval join: every click emits — joined
    * to same-user purchases within the following hour when they exist,
    * with nulls once the watermark proves no purchase can still arrive.
    * The outer side's completeness is watermark-driven: a click row is
    * held in state only until `click_ts + attributionWindow` passes the
    * watermark, keeping state bounded exactly like the inner form. */
  def clickOutcomes(events: DataFrame, attributionWindow: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", attributionWindow)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", attributionWindow)
    clicks.join(purchases,
      expr(s"""c_user = p_user AND purchase_ts >= click_ts
              AND purchase_ts <= click_ts + INTERVAL $attributionWindow"""),
      "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  case class UserEvent(user_id: Long, tsec: Long)
  case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)
  case class TimedEvent(user_id: Long, ts: java.sql.Timestamp)
  case class ClosedSession(user_id: Long, start_sec: Long, end_sec: Long, n_events: Long)
  case class OpenSession(startSec: Long, endSec: Long, n: Long)

  /** Session *windows* via flatMapGroupsWithState with an event-time
    * timeout: a session closes either when a same-batch event arrives
    * past the gap, or when the watermark passes sessionEnd+gap (the
    * timeout path) — so closed sessions are emitted exactly once, in
    * append mode, with bounded per-user state (one open session).
    */
  def sessionWindows(events: Dataset[TimedEvent], gapSeconds: Long = 1800,
                     watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, evs, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, s.startSec, s.endSec, s.n))
          } else {
            val times = evs.map(_.ts.getTime / 1000).toSeq.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            times.foreach { t =>
              open match {
                case Some(s) if t - s.endSec <= gapSeconds =>
                  open = Some(s.copy(endSec = math.max(s.endSec, t), n = s.n + 1))
                case Some(s) =>
                  closed += ClosedSession(uid, s.startSec, s.endSec, s.n)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.endSec + gapSeconds) * 1000 + 1)
            }
            closed.result().iterator
          }
      }
  }

  /** Stateful sessionization via mapGroupsWithState — the streaming form
    * of q28_sessionize (30-min gap). State per user is two longs + the
    * last event time; at scale state is hash-partitioned by user and
    * checkpointed by the engine. */
  def sessionize(events: Dataset[UserEvent],
                 gapSeconds: Long = 1800): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Long, Long), UserSessions](
        GroupStateTimeout.NoTimeout) {
        case (uid, evs, state: GroupState[(Long, Long, Long)]) =>
          val (n0, s0, last0) = state.getOption.getOrElse((0L, 0L, Long.MinValue))
          var n = n0; var sess = s0; var last = last0
          evs.toSeq.sortBy(_.tsec).foreach { e =>
            if (last == Long.MinValue || e.tsec - last > gapSeconds) sess += 1
            n += 1
            last = e.tsec
          }
          state.update((n, sess, last))
          UserSessions(uid, n, sess)
      }
  }
}
