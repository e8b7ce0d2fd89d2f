package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exactDedup keeps min id and counts replicas") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "text")
    val got = Dedup.exactDedup(df, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhashLshPairs finds exact duplicates with jaccard 1.0") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base), (2L, base),                       // exact dup pair
      (3L, "completely different words entirely unrelated content here now"))
      .toDF("id", "text")
      .select($"id", TextAnalysis.shingles($"text", 3).as("shingles"))
    val pairs = Dedup.minhashLshPairs(docs, nBands = 4, threshold = 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("simhash32: identical docs get identical hashes, 32-bit range") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v"))
      .toDF("id", "text")
      .select($"id", TextAnalysis.tokens($"text").as("tokens"))
    val got = Dedup.simhash32(docs).orderBy("id").as[(Long, Long)].collect()
    assert(got(0)._2 == got(1)._2)
    assert(got.forall(r => r._2 >= 0 && r._2 < (1L << 32)))
  }

  test("ngramJaccardPairs respects blocking and threshold") {
    val docs = Seq(
      (1L, "b1", Seq(1L, 2L, 3L, 4L)),
      (2L, "b1", Seq(1L, 2L, 3L, 5L)),   // jaccard 3/5 = 0.6
      (3L, "b2", Seq(1L, 2L, 3L, 4L)))   // same grams but different bucket
      .toDF("id", "bucket", "grams")
    val got = Dedup.ngramJaccardPairs(docs, 0.5).collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 1L && got.head.getLong(1) == 2L)
    assert(math.abs(got.head.getDouble(2) - 0.6) < 1e-12)
  }

  test("minhash int mixing is deterministic and order-independent") {
    val a = Seq((1L, Seq("x y z", "p q r"))).toDF("id", "shingles")
    val b = Seq((1L, Seq("p q r", "x y z"))).toDF("id", "shingles")
    def mh(df: org.apache.spark.sql.DataFrame) =
      df.select(Dedup.minhashInt(Dedup.shingleHashes($"shingles"), 3).as("m")).as[Long].head()
    assert(mh(a) == mh(b))
  }
}
