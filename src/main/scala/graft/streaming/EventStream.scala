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

  /** events stream schema, matching the events parquet after ts
    * normalization (nanos → TimestampType happens on read; see
    * streamFromParquetDir). */
  import org.apache.spark.sql.types._
  val RawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet. */
  def streamFromParquetDir(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(RawSchema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

  case class UserEvent(user_id: Long, tsec: Long)
  case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

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
