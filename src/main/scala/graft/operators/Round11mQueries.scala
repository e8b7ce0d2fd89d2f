package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-11 batch 13: the DIALS the composed curation pipeline (q352)
  * runs on — each an explicit planning/sensitivity table for a knob
  * that upstream operators take as given:
  *
  *  - q407 plans EPOCHS under an over-corpus token budget (q397 plans a
  *    sub-corpus budget and never repeats data) — units are
  *    (source, epoch) valued at quality × (3/4)^(epoch−1), the
  *    data-constrained allocation;
  *  - q408 sweeps q23's near-dup Jaccard threshold and reports
  *    pairs / flagged docs per cut — the table that justifies the dial;
  *  - q409 re-scores q108's contamination screen with corpus-rarity
  *    weights (exact rational N/df in micro units, q86's log-free
  *    convention) — verbatim leakage vs stock phrases.
  *
  * Float discipline: zero doubles — decay is exact dyadic, IDF the
  * exact rational micro division, Jaccard exact micro.
  */
object Round11mQueries {

  type QFn = (SparkSession, String) => DataFrame

  private val normSql = TA.normTextSql

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- epoch allocation under repetition decay -------------------------
    // The data-constrained regime: the budget is 2× the corpus, so
    // repetition is forced and the question is WHERE. Each (source,
    // epoch≤4) unit supplies the source's tokens at marginal value
    // quality_ppm × (3/4)^(epoch−1) — exact dyadic decay ppm
    // {1e6, 750000, 562500, 421875} — and the waterfill takes units in
    // value order. A 2nd epoch of a high-quality source outranks a 1st
    // epoch of junk exactly when q_hi × 3/4 > q_lo: the planner's whole
    // point. 80-row grid; the cumulative is the GridCumulative totals
    // convention (constant partition key, roster-bounded).
    ("q407_epoch_allocation", (s: SparkSession, dir: String) => {
      import s.implicits._
      val src = Tables.t(s, dir, "documents")
        .groupBy($"source").agg(
          sum(expr("CAST(n_chars AS BIGINT) div 4")).as("supply"),
          count(lit(1)).as("n_docs"),
          sum(($"lang" === "en").cast("long")).as("n_en"))
        .withColumn("q_ppm", expr("n_en * 1000000 div n_docs"))
        .localCheckpoint() // reused: total + the 4-epoch fan-out
      val tot = src.agg(sum($"supply").as("tot"))
      val decay = Seq((1L, 1000000L), (2L, 750000L), (3L, 562500L),
        (4L, 421875L)).toDF("epoch", "decay_ppm")
      val units = src.crossJoin(broadcast(decay))
        .withColumn("value_ppm", expr("q_ppm * decay_ppm div 1000000"))
      val w = Window.partitionBy(lit(0))
        .orderBy($"value_ppm".desc, $"epoch", $"source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      units.crossJoin(broadcast(tot))
        .withColumn("budget", expr("tot * 2"))
        .withColumn("cum", sum($"supply").over(w))
        .withColumn("alloc", expr(
          "greatest(0L, least(supply, budget - (cum - supply)))"))
        .withColumn("eff_tokens", expr("alloc * value_ppm div 1000000"))
        .select($"source", $"epoch", $"q_ppm", $"value_ppm", $"supply",
          $"alloc", $"eff_tokens")
        .orderBy($"value_ppm".desc, $"epoch", $"source")
    }, Some("""
      WITH src AS (SELECT source,
          CAST(sum(CAST(n_chars AS BIGINT) // 4) AS BIGINT) AS supply,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
        FROM documents GROUP BY 1),
      s2 AS (SELECT source, supply, n_en * 1000000 // n_docs AS q_ppm FROM src),
      tt AS (SELECT CAST(sum(supply) AS BIGINT) AS tot FROM s2),
      dk AS (SELECT CAST(unnest([1, 2, 3, 4]) AS BIGINT) AS epoch,
          CAST(unnest([1000000, 750000, 562500, 421875]) AS BIGINT) AS decay_ppm),
      u AS (SELECT source, epoch, q_ppm, supply,
          q_ppm * decay_ppm // 1000000 AS value_ppm
        FROM s2, dk),
      s3 AS (SELECT source, epoch, q_ppm, value_ppm, supply, tot * 2 AS budget,
          CAST(sum(supply) OVER (ORDER BY value_ppm DESC, epoch, source)
            AS BIGINT) AS cum
        FROM u, tt)
      SELECT source, epoch, q_ppm, value_ppm, supply,
        greatest(0, least(supply, budget - (cum - supply))) AS alloc,
        greatest(0, least(supply, budget - (cum - supply)))
          * value_ppm // 1000000 AS eff_tokens
      FROM s3 ORDER BY value_ppm DESC, epoch, source""")),

    // ----- near-dup threshold sensitivity ----------------------------------
    // q23 ships ONE threshold (0.55); this sweeps the dial over the same
    // blocked candidate space — (lang, length-bucket) blocking, char-
    // 3-gram sets, Jaccard in EXACT micro — and reports the pair count
    // and flagged-doc count per cut. Candidates are computed once
    // (blocking bounds them at any corpus size) and the 5-row τ grid is
    // broadcast over them; the flagged-doc count dedups ids per τ.
    ("q408_dedup_threshold_curve", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.spread(Tables.t(s, dir, "documents")).select(
        $"doc_id".as("id"),
        concat($"lang", lit("_"), expr("n_chars div 100")).as("bucket"),
        TA.charNgramInts($"text", 3).as("grams")) // sorted + distinct
      val pairs = d.toDF("id_a", "bucket", "ga")
        .join(d.toDF("id_b", "bucket", "gb"), "bucket")
        .filter($"id_a" < $"id_b")
        .withColumn("inter", expr("CAST(size(array_intersect(ga, gb)) AS BIGINT)"))
        .withColumn("uni", expr("CAST(size(ga) + size(gb) AS BIGINT) - inter"))
        .select($"id_a", $"id_b",
          expr("1000000 * inter div uni").as("j_micro"))
        // only pairs at or above the SMALLEST swept threshold can appear
        // in any cut — filter before materializing (the q23 discipline;
        // without it the checkpoint holds every in-bucket pair and the
        // downstream aggregates OOM at ×10 docs)
        .filter($"j_micro" >= 500000L)
        .localCheckpoint() // reused by the 5 threshold cuts
      val taus = Seq(500000L, 600000L, 700000L, 800000L, 900000L).toDF("tau_micro")
      val hits = pairs.crossJoin(broadcast(taus)).filter($"j_micro" >= $"tau_micro")
      val nPairs = hits.groupBy($"tau_micro").agg(count(lit(1)).as("n_pairs"))
      val nDocs = hits.select($"tau_micro", explode(array($"id_a", $"id_b")).as("id"))
        .distinct()
        .groupBy($"tau_micro").agg(count(lit(1)).as("n_docs_flagged"))
      taus.join(nPairs, Seq("tau_micro"), "left")
        .join(nDocs, Seq("tau_micro"), "left")
        .select($"tau_micro",
          coalesce($"n_pairs", lit(0L)).as("n_pairs"),
          coalesce($"n_docs_flagged", lit(0L)).as("n_docs_flagged"))
        .orderBy($"tau_micro")
    }, Some("""
      WITH d AS (SELECT doc_id, lang || '_' || (n_chars // 100) AS bucket,
        list_distinct(list_transform(range(1, greatest(length(text) - 2, 1) + 1),
          i -> (CAST(ascii(substr(text, i, 1)) AS BIGINT) * 1114112
            + ascii(substr(text, i + 1, 1))) * 1114112
            + ascii(substr(text, i + 2, 1)))) AS grams
        FROM documents),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          1000000 * len(list_intersect(a.grams, b.grams))
            // (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
            AS j_micro
        FROM d a JOIN d b USING (bucket) WHERE a.doc_id < b.doc_id),
      pf AS (SELECT * FROM p WHERE j_micro >= 500000),
      taus AS (SELECT CAST(unnest([500000, 600000, 700000, 800000, 900000])
          AS BIGINT) AS tau_micro),
      h AS (SELECT tau_micro, id_a, id_b FROM pf, taus WHERE j_micro >= tau_micro),
      np AS (SELECT tau_micro, CAST(count(*) AS BIGINT) AS n_pairs
        FROM h GROUP BY 1),
      nd AS (SELECT tau_micro, CAST(count(*) AS BIGINT) AS n_docs_flagged
        FROM (SELECT DISTINCT tau_micro, id FROM (
          SELECT tau_micro, id_a AS id FROM h
          UNION ALL SELECT tau_micro, id_b FROM h)) GROUP BY 1)
      SELECT t.tau_micro, coalesce(np.n_pairs, 0) AS n_pairs,
        coalesce(nd.n_docs_flagged, 0) AS n_docs_flagged
      FROM taus t LEFT JOIN np USING (tau_micro) LEFT JOIN nd USING (tau_micro)
      ORDER BY tau_micro""")),

    // ----- rarity-weighted contamination ------------------------------------
    // q108 counts every shared 3-gram equally, so on a low-entropy
    // corpus every eval doc looks contaminated; this weights each shared
    // gram by its corpus rarity — IDF as the exact rational
    // n_corpus_docs/df in micro units (q86's log-free convention, df
    // from the CORPUS side only) — separating verbatim leakage (rare
    // grams) from stock phrases (df≈N grams score ≈1e6 each, the
    // floor). Same gram-keyed equi-join shape as q108: the n-gram is
    // its own blocking key, no cross join at any corpus size.
    ("q409_idf_contamination", (s: SparkSession, dir: String) => {
      import s.implicits._
      val n = 3
      def ngrams(df: DataFrame): DataFrame = df
        .select($"doc_id", split(TA.normText($"text"), " ").as("a"))
        .filter(size($"a") >= n)
        .select($"doc_id", explode(expr(
          s"transform(sequence(1, size(a) - ${n - 1}), j -> array_join(slice(a, j, $n), ' '))"))
          .as("ngram"))
        .distinct()
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
      val corpus = ngrams(docs.filter($"doc_id" % 97 =!= 0))
        .localCheckpoint() // reused: df table + the screen join
      val nc = corpus.select($"doc_id").distinct()
        .agg(count(lit(1)).as("n_corpus"))
      val dfT = corpus.groupBy($"ngram").agg(count(lit(1)).as("df"))
      val eval = ngrams(docs.filter($"doc_id" % 97 === 0))
        .withColumnRenamed("doc_id", "eval_doc_id")
      corpus.join(eval, Seq("ngram"))
        .join(dfT, Seq("ngram"))
        .crossJoin(broadcast(nc))
        .groupBy($"doc_id", $"eval_doc_id")
        .agg(count(lit(1)).as("n_shared"),
          sum(expr("n_corpus * 1000000 div df")).as("idf_score"))
        .orderBy("doc_id", "eval_doc_id")
    }, Some(s"""
      WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS a
        FROM documents WHERE len(string_split($normSql, ' ')) >= 3),
      pos AS (SELECT doc_id, a, unnest(range(1, len(a) - 1)) AS j FROM base),
      grams AS (SELECT DISTINCT doc_id,
          array_to_string(list_slice(a, CAST(j AS INT), CAST(j + 2 AS INT)), ' ') AS ngram
        FROM pos),
      corpus AS (SELECT * FROM grams WHERE doc_id % 97 <> 0),
      nc AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_corpus FROM corpus),
      dft AS (SELECT ngram, CAST(count(*) AS BIGINT) AS df FROM corpus GROUP BY 1),
      ev AS (SELECT doc_id AS eval_doc_id, ngram FROM grams WHERE doc_id % 97 = 0)
      SELECT c.doc_id, e.eval_doc_id,
        CAST(count(*) AS BIGINT) AS n_shared,
        CAST(sum(n_corpus * 1000000 // df) AS BIGINT) AS idf_score
      FROM corpus c JOIN ev e USING (ngram) JOIN dft USING (ngram) CROSS JOIN nc
      GROUP BY 1, 2 ORDER BY doc_id, eval_doc_id"""))
  )
}
