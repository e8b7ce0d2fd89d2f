package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class CharClassCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kernels equal the regex counts, including multibyte and edge cases") {
    val df = Seq(
      "hello world 123!",
      "ALLCAPS stays zero alpha? NO - caps are not a-z",
      "的是了 chinese chars count as punct",
      "",
      "   ",
      "a1 b2 c3 ~~~"
    ).toDF("text")
    val got = df.select(
      CharClassCounts.alphaCount($"text").as("ka"),
      regexp_count($"text", lit("[a-z]")).as("ra"),
      CharClassCounts.punctCount($"text").as("kp"),
      regexp_count($"text", lit("[^a-z0-9 ]")).as("rp")).collect()
    got.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"alpha mismatch: $r")
      assert(r.getInt(2) == r.getInt(3), s"punct mismatch: $r")
    }
  }
}
