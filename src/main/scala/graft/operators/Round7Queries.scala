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
      GROUP BY t.doc_id ORDER BY t.doc_id"""))
  )
}
