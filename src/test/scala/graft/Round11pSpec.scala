package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavior pin for the streaming ingest gate (q415): the streaming
  * per-source counters must equal the batch aggregation row for row,
  * and the gate laws must hold (pass ≤ each component gate ≤ volume).
  */
class Round11pSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q415 streaming gate state equals the batch aggregation; gate laws hold") {
    import spark.implicits._
    val streamed = SparkEntry.queries("q415_stream_ingest_gate")(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val batch = Tables.t(spark, TestSpark.Sf, "documents")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(($"n_chars" >= 200).cast("long")).as("n_len_ok"),
        sum(($"lang" === "en").cast("long")).as("n_en"),
        sum(($"n_chars" >= 200 && $"lang" === "en").cast("long")).as("n_pass"))
      .select($"source", $"n_docs", $"n_len_ok", $"n_en", $"n_pass",
        expr("1000000 * n_pass div n_docs").as("pass_ppm"))
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(streamed == batch)
    streamed.foreach { case (src, n, lenOk, en, pass, ppm) =>
      assert(pass <= math.min(lenOk, en), s"$src: pass exceeds a component gate")
      assert(math.max(lenOk, en) <= n, s"$src: gate exceeds volume")
      assert(ppm == 1000000L * pass / n, s"$src: ppm arithmetic")
    }
  }
}
