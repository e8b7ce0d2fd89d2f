package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq("the cat sat", "a1 b!  c").toDF("text")
    assert(df.select(TextAnalysis.wsTokenCount($"text")).as[Int].collect().toSeq == Seq(3, 3))
    // "a1 b! c": [a],[1],[b],[!],[c] = 5 BPE-ish pieces
    assert(df.select(TextAnalysis.bpeTokenCount($"text")).as[Int].collect()(1) == 5)
  }

  test("normText lowercases, strips punct, collapses whitespace") {
    val df = Seq("  Hello,   WORLD!! 42 ").toDF("text")
    assert(df.select(TextAnalysis.normText($"text")).as[String].head() == "hello world 42")
  }

  test("shingles: k-grams, distinct, short-text fallback") {
    val df = Seq("a b c d", "x y").toDF("text")
    val got = df.select(TextAnalysis.shingles($"text", 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("x y")) // shorter than k → whole text
  }

  test("charNgramInts matches charNgrams cardinality and is collision-free") {
    val df = Seq("abcabc", "xyz").toDF("text")
    val s = df.select(size(TextAnalysis.charNgrams($"text", 3)).as("a"),
      size(TextAnalysis.charNgramInts($"text", 3)).as("b")).collect()
    assert(s.forall(r => r.getInt(0) == r.getInt(1)))
  }

  test("langPredict: argmax with asc tiebreak, und when all zero") {
    val df = Seq("the der le", "zzz qqq", "der die das und").toDF("text")
    val scores = TextAnalysis.Stopwords.map { case (l, _) => l -> TextAnalysis.langScore($"text", l) }
    val got = df.select(TextAnalysis.langPredict(scores)).as[String].collect()
    assert(got(0) == "de")  // 1-1-1 tie between de/en/fr → 'de' first asc
    assert(got(1) == "und")
    assert(got(2) == "de")
  }

  test("langScores (join path) agrees with langScore (lambda path) per language") {
    val df = Seq(
      (1L, "the quick fox and the dog"),   // en: the,and,the → 3
      (2L, "der die das"),                 // de: 3
      (3L, "zzz qqq www"),                 // no hits anywhere → all 0
      (4L, "el y el y por"))               // es: 5
      .toDF("doc_id", "text")
    val joined = TextAnalysis.langScores(df, "doc_id", "text").orderBy("doc_id")
    TextAnalysis.Stopwords.foreach { case (l, _) =>
      val viaJoin = joined.select(col(s"score_$l")).as[Int].collect().toSeq
      val viaLambda = df.orderBy("doc_id")
        .select(TextAnalysis.langScore($"text", l)).as[Int].collect().toSeq
      assert(viaJoin == viaLambda, s"lang $l: join=$viaJoin lambda=$viaLambda")
    }
  }

  test("fingerprint is stable under whitespace/punct noise") {
    val df = Seq("Hello World", "  hello,, world!! ").toDF("text")
    val fps = df.select(TextAnalysis.fingerprintMd5($"text")).as[String].collect()
    assert(fps(0) == fps(1))
    val msh = df.select(TextAnalysis.minShingleHash($"text", 5)).as[String].collect()
    assert(msh(0) == msh(1))
  }

  test("vocabOov: deterministic top-V vocabulary, exact per-doc OOV counts") {
    val docs = Seq((1L, "a a a b c"), (2L, "a b b z q")).toDF("doc_id", "text")
    // corpus freq: a=4 b=3 c=1 z=1 q=1 → top-2 vocab = {a, b};
    // OOV: doc1 {c}, doc2 {z, q}
    val got = TextAnalysis.vocabOov(docs, topV = 2).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L, 1L), (2L, 5L, 2L)))
    // tie at the V boundary breaks by token ascending: top-3 adds c (not q/z)
    val got3 = TextAnalysis.vocabOov(docs, topV = 3).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got3 == Seq((1L, 5L, 0L), (2L, 5L, 2L)))
  }
}
