package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, document fingerprinting. All pure Column
  * expressions (codegen'd, no UDFs) so they run at scan speed and stay
  * inside WholeStageCodegen — at 100 TB these are map-only passes with
  * zero shuffle.
  */
object TextAnalysis {

  /** Whitespace token array. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, single digits, single punctuation
    * marks — the pre-tokenizer split most BPE vocabularies assume. */
  val BpePattern = "[a-z]+|[0-9]|[^a-z0-9 ]"
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(BpePattern))

  /** Normalized text: lowercase, punctuation stripped, whitespace
    * collapsed — the canonical form for fingerprinting/dedup. */
  def normText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** DuckDB rendering of `normText` over a `text` column — the single
    * source every oracle shares (the Similarity.prepareSql convention). */
  val normTextSql: String =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))"""

  /** MD5 content fingerprint of the normalized text. */
  def fingerprintMd5(text: Column): Column = md5(normText(text))

  import graft.functions.Lambda.bind1

  /** One word k-gram starting at 1-based position i of bound array `a`.
    * try_element_at: the final grams of a short text run past the array
    * end (ANSI element_at would throw); concat_ws drops the nulls, which
    * matches the truncating slice the DuckDB oracle uses (arr[i:i+k-1]). */
  private def gramAt(a: Column, i: Column, k: Int): Column =
    concat_ws(" ", (0 until k).map(j => try_element_at(a, i + j)): _*)

  /** Min-hash over word k-grams of the normalized text (a single-seed
    * winnowing-style fingerprint: two documents sharing their minimal
    * k-gram hash are near-dup candidates). */
  def minShingleHash(text: Column, k: Int = 5): Column =
    bind1(split(normText(text), " ")) { a =>
      array_min(transform(sequence(lit(1), greatest(size(a) - (k - 1), lit(1))),
        i => md5(gramAt(a, i, k))))
    }

  /** Word k-gram shingle set (distinct) — the unit of Jaccard similarity. */
  def shingles(text: Column, k: Int = 3): Column =
    bind1(split(normText(text), " ")) { a =>
      array_distinct(transform(sequence(lit(1), greatest(size(a) - (k - 1), lit(1))),
        i => gramAt(a, i, k)))
    }

  /** Character n-gram set (distinct). */
  def charNgrams(text: Column, n: Int = 3): Column = {
    val nGrams = greatest(length(text) - (n - 1), lit(1))
    array_distinct(transform(sequence(lit(1), nGrams), i => text.substr(i, lit(n))))
  }

  /** Character n-gram set packed into collision-free int64s
    * (codepoint-radix 0x110000), sorted + distinct: downstream
    * joins/intersects shuffle and compare longs instead of strings, and
    * the sorted form feeds the two-pointer SortedLongJaccard verify
    * directly. Backed by the codegen'd functions.CharNgramLongs kernel
    * (one primitive pass per document, no per-gram lambda eval). */
  def charNgramInts(text: Column, n: Int = 3): Column =
    graft.functions.CharNgramLongs(text, n)

  /** Stopword lists per language (disjoint, ASCII-safe except zh). */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "los", "las", "y", "por", "para"),
    "fr" -> Seq("le", "les", "et", "une", "est", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "有", "我"))

  /** Per-language stopword hit count over the token array (single-doc
    * Column form; array filter is interpreted per element — for corpus
    * scoring use `langScores`, which stays in whole-stage codegen). */
  def langScore(text: Column, lang: String): Column = {
    val stops = Stopwords.toMap.apply(lang)
    size(filter(tokens(lower(text)), t => stops.foldLeft(lit(false))((acc, s) => acc || t === s)))
  }

  /** Corpus-scale language scoring: explode tokens, broadcast-hash-join
    * the (word → language) list, count hits per (doc, language) with
    * map-side partial aggregation. Every operator here is codegen'd —
    * unlike a per-token lambda filter, which drops each document's token
    * array out of Tungsten and evaluates |stopwords| comparisons per
    * token interpretively. One shuffle (the per-doc count), join back on
    * the doc id. Returns `docs` plus one `score_<lang>` column per
    * language (0 when no hits). */
  def langScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sw = Stopwords.flatMap { case (l, ws) => ws.map(w => (w, l)) }
      .toDF("__tok", "__sw_lang")
    val scoreCols = Stopwords.map { case (l, _) =>
      sum(when(col("__sw_lang") === l, 1).otherwise(0)).cast("int").as(s"score_$l")
    }
    val hits = docs
      .select(col(idCol).as("__id"), explode(tokens(lower(col(textCol)))).as("__tok"))
      .join(broadcast(sw), Seq("__tok"))
      .groupBy(col("__id"))
      .agg(scoreCols.head, scoreCols.tail: _*)
    docs.join(hits, docs(idCol) === hits("__id"), "left")
      .drop("__id")
      .na.fill(0, Stopwords.map { case (l, _) => s"score_$l" })
  }

  /** Predicted language: argmax of stopword hits, ties broken by language
    * code ascending; no hits at all → "und" (undetermined). */
  def langPredict(scores: Seq[(String, Column)]): Column = {
    val maxScore = greatest(scores.map(_._2): _*)
    val chain = scores.sortBy(_._1).foldLeft(when(maxScore === 0, "und")) {
      case (acc, (lang, sc)) => acc.when(sc === maxScore, lang)
    }
    chain.otherwise("und")
  }

  /** Vocabulary coverage / OOV analysis — the tokenizer-coverage QA pass
    * a training corpus gets before committing to a vocabulary: build the
    * top-`topV` corpus vocabulary (count desc, token asc — deterministic
    * ties), then per-document token totals and the count falling outside
    * it.
    *
    * Scale shape: corpus token counts are a two-phase hash aggregate
    * (map-side combine over the explode); the vocabulary is a
    * TakeOrderedAndProject top-V (no global sort) whose V rows BROADCAST
    * into the per-doc pass — the corpus-sized token stream shuffles once
    * (doc_id aggregate) and never joins a corpus-sized side. */
  def vocabOov(docs: DataFrame, topV: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(normText(col(textCol)))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(topV)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).cast("long").as("n_oov"))
  }
}
