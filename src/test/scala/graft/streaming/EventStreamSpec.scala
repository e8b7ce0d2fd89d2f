package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eventsDir: String = {
    val dir = graft.TempScratch.fresh("graft_events")
    Files.copy(Paths.get(s"${TestSpark.Sf}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("stream construction survives an empty directory (footer probe falls back)") {
    // a file-source stream awaiting its first files is a normal state:
    // the schema probe has nothing to read and must fall back to the
    // NANOS/long declaration rather than throw
    val empty = graft.TempScratch.fresh("graft_events_empty").toString
    val stream = EventStream.streamFromParquetDir(spark, empty)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType.typeName == "timestamp")
  }

  test("streaming windowed counts equal the batch q14 aggregation") {
    val stream = EventStream.streamFromParquetDir(spark, eventsDir)
    val q = EventStream.windowedCounts(stream)
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("wincounts")
      .orderBy("hour_start", "event_type")
      .as[(java.sql.Timestamp, String, Long)].collect()

    val batch = Tables.t(spark, TestSpark.Sf, "events")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .select($"window.start", $"event_type", $"n_events")
      .orderBy("start", "event_type")
      .as[(java.sql.Timestamp, String, Long)].collect()

    assert(streamed.toSeq == batch.toSeq)
  }

  test("stream-stream interval join matches the equivalent batch join") {
    val stream = EventStream.streamFromParquetDir(spark, eventsDir)
    val q = EventStream.clickToPurchase(stream)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("attrib")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet

    val ev = Tables.t(spark, TestSpark.Sf, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("click_ts"), $"event_id".as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("purchase_ts"), $"event_id".as("purchase_id"))
    val batch = purchases.join(clicks,
        expr("p_user = c_user AND click_ts <= purchase_ts AND click_ts >= purchase_ts - INTERVAL 1 HOUR"))
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("left-outer stream-stream join emits matched and unmatched clicks") {
    val stream = EventStream.streamFromParquetDir(spark, eventsDir)
    val q = EventStream.clickOutcomes(stream)
      .writeStream.format("memory").queryName("outcomes")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // file source is finite: unmatched rows beyond the final watermark
    // stay in state, so compare the MATCHED subset exactly and check
    // unmatched rows carry nulls
    val streamed = spark.table("outcomes")
    val matched = streamed.filter($"purchase_id".isNotNull)
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet

    val ev = Tables.t(spark, TestSpark.Sf, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("click_ts"), $"event_id".as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("purchase_ts"), $"event_id".as("purchase_id"))
    val batchMatched = clicks.join(purchases,
        expr("c_user = p_user AND purchase_ts >= click_ts AND purchase_ts <= click_ts + INTERVAL 1 HOUR"))
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet

    assert(matched == batchMatched)
    assert(matched.nonEmpty)
    // outer rows: null purchase columns for clicks the watermark closed
    val unmatched = streamed.filter($"purchase_id".isNull).count()
    val batchUnmatched = clicks.join(purchases,
        expr("c_user = p_user AND purchase_ts >= click_ts AND purchase_ts <= click_ts + INTERVAL 1 HOUR"),
        "left_anti").count()
    assert(unmatched <= batchUnmatched) // tail clicks may still sit in state
  }

  test("session windows close on gap within a batch and on watermark timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sql = spark.sqlContext
    val input = MemoryStream[EventStream.TimedEvent]
    val q = EventStream.sessionWindows(input.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // non-zero base: an event at exactly epoch 0 is dropped by the strict
      // event-time > watermark(0) late filter
      val base = 1700000000L
      def ts(sec: Long) = new Timestamp((base + sec) * 1000)
      // batch 1: user 1 has two bursts separated by > gap (closes first
      // burst in-batch); user 2 one event
      input.addData(
        EventStream.TimedEvent(1L, ts(0)), EventStream.TimedEvent(1L, ts(100)),
        EventStream.TimedEvent(1L, ts(5000)),
        EventStream.TimedEvent(2L, ts(50)))
      q.processAllAvailable()
      // in-batch gap close for user 1's first burst; user 2's session then
      // times out in the follow-up batch (watermark advanced to 5000-600)
      val afterB1 = spark.table("sessions")
        .as[EventStream.ClosedSession].collect().toSet
      assert(afterB1 == Set(
        EventStream.ClosedSession(1L, base + 0L, base + 100L, 2L),
        EventStream.ClosedSession(2L, base + 50L, base + 50L, 1L)))
      // batch 2: far-future event advances the watermark past every open
      // session's end+gap → timeouts close them
      input.addData(EventStream.TimedEvent(3L, ts(100000)))
      q.processAllAvailable()
      input.addData(EventStream.TimedEvent(3L, ts(100001)))
      q.processAllAvailable()
      val all = spark.table("sessions").as[EventStream.ClosedSession].collect().toSet
      assert(all.contains(EventStream.ClosedSession(1L, base + 5000L, base + 5000L, 1L)))
      assert(all.contains(EventStream.ClosedSession(2L, base + 50L, base + 50L, 1L)))
    } finally q.stop()
  }

  test("streaming dedup + aggregate equals batch count(DISTINCT user_id) per type") {
    val stream = EventStream.streamFromParquetDir(spark, eventsDir)
    val q = EventStream.distinctUsersByType(stream)
      .writeStream.format("memory").queryName("dedup_counts")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("dedup_counts")
      .orderBy("event_type").as[(String, Long)].collect().toSeq

    val batch = Tables.t(spark, TestSpark.Sf, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy("event_type").as[(String, Long)].collect().toSeq

    assert(streamed == batch)
    // the dedup did real work: raw rows exceed the distinct keys
    val raw = Tables.t(spark, TestSpark.Sf, "events").count()
    assert(raw > streamed.map(_._2).sum)
  }

  test("stateful sessionization matches the batch q28 session counts") {
    val ev = Tables.t(spark, TestSpark.Sf, "events")
      .select($"user_id", unix_timestamp(date_trunc("second", $"ts")).as("tsec"))
      .as[EventStream.UserEvent]
    val got = EventStream.sessionize(ev).orderBy("user_id")
      .as[EventStream.UserSessions].collect()

    val expected = graft.SparkEntry.queries("q28_sessionize")(spark, TestSpark.Sf)
      .orderBy("user_id").collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g.user_id == e.getAs[Long]("user_id"))
      assert(g.n_events == e.getAs[Long]("n_events"))
      assert(g.n_sessions == e.getAs[Long]("n_sessions"))
    }
  }
}
