package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eventsDir: String = {
    val dir = Files.createTempDirectory("graft_events")
    Files.copy(Paths.get(s"${TestSpark.Sf}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
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
