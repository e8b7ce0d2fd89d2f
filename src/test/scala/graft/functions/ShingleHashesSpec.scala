package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.ext.{Dedup, TextAnalysis}

class ShingleHashesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kernel equals the shingles->md5 expression composition as a set") {
    val df = Seq(
      "The quick brown fox jumps over the lazy dog!",
      "short",
      "two words",
      "",
      "  Punct,,, and   SPACING   chaos?! here  "
    ).toDF("text")
    val both = df.select(
      sort_array(WordShingleHash32(TextAnalysis.normText($"text"), 3)).as("kernel"),
      sort_array(Dedup.shingleHashes(TextAnalysis.shingles($"text", 3))).as("composed"))
    both.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch for row $r")
    }
  }

  test("kernel output is sorted, distinct, 32-bit") {
    val hs = Seq("a b c d e f g a b c d e f g").toDF("text")
      .select(WordShingleHash32(TextAnalysis.normText($"text"), 3))
      .as[Seq[Long]].head()
    assert(hs == hs.sorted && hs == hs.distinct)
    assert(hs.forall(h => h >= 0 && h < (1L << 32)))
  }
}
