package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark
import StatefulOps.{KeyedEvent, UserStats}

class StatefulOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // transformWithState requires the RocksDB state store provider
  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("transformWithState dedup keeps the first replica across batches") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[KeyedEvent]
      val q = StatefulOps.dedupStream(in.toDS())
        .writeStream.format("memory").queryName("tws_dedup")
        .outputMode("append").start()
      try {
        in.addData(
          KeyedEvent("a", 1L, 10L, 1.0),
          KeyedEvent("a", 2L, 10L, 2.0), // same-batch replica
          KeyedEvent("b", 3L, 11L, 3.0))
        q.processAllAvailable()
        in.addData(
          KeyedEvent("a", 4L, 10L, 4.0), // cross-batch replica
          KeyedEvent("c", 5L, 12L, 5.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("tws_dedup").as[KeyedEvent].collect()
        .map(e => e.dedup_key -> e.event_id).sortBy(_._1)
      assert(got.toSeq == Seq("a" -> 1L, "b" -> 3L, "c" -> 5L))
    }
  }

  test("transformWithState event-time timers fire once per inactive user") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import StatefulOps.{InactiveUser, TimedKeyedEvent}
      // NOT epoch-0-based: rows at/behind the initial watermark (0) are
      // dropped as late in EventTime mode
      val base = 1704067200000L // 2024-01-01
      def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
      val in = MemoryStream[TimedKeyedEvent]
      val q = StatefulOps.inactiveUsers(
          in.toDS().withWatermark("ts", "0 seconds"), gapMs = 10 * 60000L)
        .writeStream.format("memory").queryName("tws_timers")
        .outputMode("append").start()
      try {
        // user 1: events at t=0,5; user 2: event at t=0
        in.addData(TimedKeyedEvent(1L, ts(0)), TimedKeyedEvent(2L, ts(0)))
        q.processAllAvailable()
        in.addData(TimedKeyedEvent(1L, ts(5)))
        q.processAllAvailable()
        // advance the watermark far past both users' last+gap
        in.addData(TimedKeyedEvent(99L, ts(60)))
        q.processAllAvailable()
        // one more batch so the watermark update takes effect on timers
        in.addData(TimedKeyedEvent(99L, ts(61)))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("tws_timers").as[InactiveUser].collect()
        .filter(u => u.user_id == 1L || u.user_id == 2L)
        .map(u => u.user_id -> (((u.last_seen_ms - base) / 60000L), u.n_events)).toMap
      assert(got(1L) == ((5L, 2L)), s"user 1 wrong: $got")
      assert(got(2L) == ((0L, 1L)), s"user 2 wrong: $got")
    }
  }

  test("transformWithState dedup with a TTL runs in processing-time mode") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[KeyedEvent]
      // a long TTL: the query must START (TTL outside processing-time
      // mode is rejected at query start) and dedup within the horizon.
      // Processing-time mode runs no-data batches to advance the TTL
      // clock — an explicit trigger interval keeps that loop from
      // running back-to-back and starving processAllAvailable.
      val q = StatefulOps.dedupStream(in.toDS(), ttl = java.time.Duration.ofHours(1))
        .writeStream.format("memory").queryName("tws_dedup_ttl")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
        .outputMode("append").start()
      // processAllAvailable() cannot be used here: processing-time TTL
      // makes every batch request another no-data batch (to advance the
      // TTL clock), so the stream never reports quiescence. Poll the
      // progress feed until all input rows are committed instead.
      def awaitInputRows(n: Long): Unit = {
        val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
        while (q.recentProgress.map(_.numInputRows).sum < n
            && System.nanoTime < deadline) Thread.sleep(100)
        assert(q.recentProgress.map(_.numInputRows).sum >= n,
          s"timed out waiting for $n input rows")
        Thread.sleep(500) // let the sink commit settle
      }
      try {
        in.addData(KeyedEvent("a", 1L, 10L, 1.0), KeyedEvent("b", 2L, 11L, 2.0))
        awaitInputRows(2)
        in.addData(KeyedEvent("a", 3L, 10L, 3.0)) // replica inside the TTL horizon
        awaitInputRows(3)
      } finally q.stop()
      val got = spark.table("tws_dedup_ttl").as[KeyedEvent].collect()
        .map(e => e.dedup_key -> e.event_id).sortBy(_._1)
      assert(got.toSeq == Seq("a" -> 1L, "b" -> 2L))
    }
  }

  test("transformWithState ListState keeps a bounded recent-events buffer") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import StatefulOps.RecentEvents
      val in = MemoryStream[KeyedEvent]
      val q = StatefulOps.recentEvents(in.toDS(), keep = 3)
        .writeStream.format("memory").queryName("tws_recent")
        .outputMode("update").start()
      try {
        in.addData(KeyedEvent("a", 1L, 10L, 0), KeyedEvent("b", 2L, 10L, 0))
        q.processAllAvailable()
        in.addData(KeyedEvent("c", 3L, 10L, 0), KeyedEvent("d", 4L, 10L, 0),
          KeyedEvent("e", 5L, 20L, 0))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("tws_recent").as[RecentEvents].collect()
        .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.event_ids.size) }
      // user 10 saw 1,2,3,4 → capped to last 3
      assert(got(10L).event_ids == Seq(2L, 3L, 4L))
      assert(got(20L).event_ids == Seq(5L))
    }
  }

  test("transformWithState MapState counts per sub-key incrementally") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import StatefulOps.TypeCount
      val in = MemoryStream[KeyedEvent]
      val q = StatefulOps.subKeyCounts(in.toDS())
        .writeStream.format("memory").queryName("tws_subkey")
        .outputMode("update").start()
      try {
        in.addData(KeyedEvent("click", 1L, 10L, 0), KeyedEvent("click", 2L, 10L, 0),
          KeyedEvent("view", 3L, 10L, 0))
        q.processAllAvailable()
        in.addData(KeyedEvent("click", 4L, 10L, 0), KeyedEvent("view", 5L, 20L, 0))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("tws_subkey").as[TypeCount].collect()
        .groupBy(r => (r.user_id, r.dedup_key))
        .map { case (k, rs) => k -> rs.map(_.n).max }
      assert(got((10L, "click")) == 3L)
      assert(got((10L, "view")) == 1L)
      assert(got((20L, "view")) == 1L)
    }
  }

  test("dropDuplicatesWithinWatermark dedups replicas inside the horizon") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import StatefulOps.TimedKeyedEvent
      val base = 1704067200000L
      def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
      val in = MemoryStream[TimedKeyedEvent]
      // state for a key is dropped once the watermark passes its event
      // time + the 10-minute horizon — bounded state, unlike plain
      // dropDuplicates on a stream
      val q = in.toDS().withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("user_id")
        .writeStream.format("memory").queryName("ddww")
        .outputMode("append").start()
      try {
        in.addData(TimedKeyedEvent(1L, ts(0)), TimedKeyedEvent(1L, ts(1)))
        q.processAllAvailable()
        in.addData(TimedKeyedEvent(1L, ts(2))) // still within horizon: dropped
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("ddww").as[TimedKeyedEvent].collect()
      assert(got.length == 1, got.mkString(","))
      assert(got.head.ts.getTime == base)
    }
  }

  test("transformWithState warm-starts from a batch snapshot (initial state)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // batch backfill says user 10 already has 5 events / 50.0 total
      val snapshot = Seq(UserStats(10L, 5L, 50.0)).toDS()
      val in = MemoryStream[KeyedEvent]
      val q = StatefulOps.runningUserStatsFrom(in.toDS(), snapshot)
        .writeStream.format("memory").queryName("tws_warm")
        .outputMode("update").start()
      try {
        in.addData(KeyedEvent("a", 1L, 10L, 2.5), KeyedEvent("b", 2L, 20L, 1.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("tws_warm").as[UserStats].collect()
        .map(s => s.user_id -> s).toMap
      // warm-started: 5+1 events, 50.0+2.5 total; cold key starts at zero
      assert(got(10L) == UserStats(10L, 6L, 52.5))
      assert(got(20L) == UserStats(20L, 1L, 1.0))
    }
  }

  test("transformWithState running stats accumulate across batches") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[KeyedEvent]
      val q = StatefulOps.runningUserStats(in.toDS())
        .writeStream.format("memory").queryName("tws_stats")
        .outputMode("update").start()
      try {
        in.addData(KeyedEvent("a", 1L, 10L, 1.5), KeyedEvent("b", 2L, 10L, 2.5))
        q.processAllAvailable()
        in.addData(KeyedEvent("c", 3L, 10L, 1.0), KeyedEvent("d", 4L, 20L, 7.0))
        q.processAllAvailable()
      } finally q.stop()
      // last update per user wins
      val got = spark.table("tws_stats").as[UserStats].collect()
        .groupBy(_.user_id).map { case (u, rows) =>
          u -> rows.maxBy(_.n_events)
        }
      assert(got(10L) == UserStats(10L, 3L, 5.0))
      assert(got(20L) == UserStats(20L, 1L, 7.0))
    }
  }
}
