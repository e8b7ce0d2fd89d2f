package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark
import graft.io.PgCopyLoadSpec

/** The continuous COPY sink: micro-batches stream through the same
  * transport as the batch path, and the ledger makes batch replay a
  * no-op (exactly-once at micro-batch granularity). */
class CopyStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def payloadLines(id: String): Seq[String] =
    PgCopyLoadSpec.recorded(id).chunks.asScala
      .map(new String(_, StandardCharsets.UTF_8)).mkString
      .split("\n", -1).filter(_.nonEmpty).toSeq

  test("micro-batches COPY through the transport; replayed batch ids are skipped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ledger = new CopyStream.InMemoryLedger
    val ckpt = Files.createTempDirectory("graft-copystream").toString
    val q = CopyStream.start(input.toDF().toDF("id", "v"), "t_stream",
      new PgCopyLoadSpec.FakeFactory("stream"), ledger, ckpt)
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    val lines = payloadLines("stream").sorted
    assert(lines == Seq("1\ta", "2\tb", "3\tc"))
    assert(ledger.committed(0L) && ledger.committed(1L))
    val r = PgCopyLoadSpec.recorded("stream")
    assert(r.commits == r.begins.size && r.rollbacks == 0)

    // replay: a batch id already in the ledger must not touch the
    // transport again (the restart-after-commit case)
    val before = r.chunks.size
    val replayFn = (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
      if (!ledger.committed(batchId)) {
        graft.io.PgCopyLoad.copyInto(batch, "t_stream",
          new PgCopyLoadSpec.FakeFactory("stream"))
        ledger.record(batchId)
      }
    replayFn(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L) // already committed
    assert(r.chunks.size == before, "replayed batch must be skipped")
    replayFn(Seq((9L, "z")).toDF("id", "v"), 7L) // new batch id goes through
    assert(payloadLines("stream").sorted.contains("9\tz"))
  }
}
