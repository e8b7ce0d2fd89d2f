package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-7 additions beyond the reference surface — corpus-QA operators
  * for the training-data pipeline story, each with a DuckDB oracle. */
object Round7Queries {

  /** DuckDB rendering of TextAnalysis.normText (shared template — see
    * ExtQueries.normSql). */
  private val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))"""

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- tokenizer-coverage QA: top-V vocabulary + per-doc OOV ---------
    ("q114_vocab_oov", (s: SparkSession, dir: String) => {
      import s.implicits._
      TA.vocabOov(Tables.spread(Tables.t(s, dir, "documents")), topV = 16)
        .orderBy("doc_id")
    }, Some(s"""
      WITH toks AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
        FROM documents),
      vocab AS (SELECT tok FROM (
        SELECT tok, count(*) AS freq FROM toks GROUP BY tok
        ORDER BY freq DESC, tok LIMIT 16))
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
      GROUP BY t.doc_id ORDER BY t.doc_id""")),

    // ----- memorization risk: cross-doc duplicated-n-gram rate -----------
    ("q115_dupgram_rate", (s: SparkSession, dir: String) => {
      import s.implicits._
      // per document: how many of its distinct word 3-grams occur in at
      // least one OTHER document — the corpus-level duplication signal
      // (within-doc repetition is q105; cross-set contamination is q108).
      // Both shuffles key on the n-gram itself, so the gram-frequency
      // aggregate and the join back are co-partitioned (one exchange,
      // reused) and there is no cross join at any corpus size; the
      // per-doc rollup is the only doc_id shuffle.
      val n = 3
      val grams = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", split(TA.normText($"text"), " ").as("a"))
        .filter(size($"a") >= n)
        .select($"doc_id", explode(expr(
          s"transform(sequence(1, size(a) - ${n - 1}), j -> array_join(slice(a, j, $n), ' '))"))
          .as("ngram"))
        .distinct()
      val freq = grams.groupBy($"ngram").agg(count(lit(1)).as("n_docs_with"))
      grams.join(freq, Seq("ngram"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).cast("long").as("n_grams"),
          sum(when($"n_docs_with" >= 2, 1L).otherwise(0L)).cast("long").as("n_dup_grams"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS a
        FROM documents WHERE len(string_split($normSql, ' ')) >= 3),
      pos AS (SELECT doc_id, a, unnest(range(1, len(a) - 1)) AS j FROM base),
      grams AS (SELECT DISTINCT doc_id,
          array_to_string(list_slice(a, CAST(j AS INT), CAST(j + 2 AS INT)), ' ') AS ngram
        FROM pos),
      freq AS (SELECT ngram, count(*) AS n_docs_with FROM grams GROUP BY ngram)
      SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        CAST(sum(CASE WHEN f.n_docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
      FROM grams g JOIN freq f ON g.ngram = f.ngram
      GROUP BY g.doc_id ORDER BY g.doc_id"""))
  )
}
