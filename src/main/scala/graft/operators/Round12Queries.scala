package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, TextAnalysis => TA}

/** Round-12 batch 1: the PRODUCTION-form threshold sweep — the q408
  * dial run over a candidate space that stays bounded at any corpus
  * shape (r11 VERDICT item 1 / missing #2).
  *
  * The three sweeps now tell one complete story:
  *  - q408 audits q23's bucket-blocked char-3-gram space — exact on a
  *    DENSE gram universe, quadratic by ANSWER size (killed at ×100);
  *  - q410 is the recall-lossless curve over PPJoin prefix-filtered
  *    pairs — the true curve, same density boundary;
  *  - q416 (here) is what production runs at 100 TB: banded-MinHash
  *    candidate generation (bucket-bounded by construction — pair work
  *    is Σ|bucket|², and band keys over 2 minhashes keep buckets small
  *    on any non-degenerate corpus), exact integer verify with the
  *    codegen'd two-pointer kernel, then the multi-τ cut table. q411
  *    measured this index's recall per cut (≥ the 500k-cut recall for
  *    every higher τ, since banding only loses LOW-similarity pairs);
  *    q416 is the sweep itself over those candidates — the table a
  *    curation run reads to pick its dedup threshold.
  *
  * The oracle replays the band keys EXACTLY (q21's template CTE) and
  * then the same integer cut arithmetic, so the gate pins the whole
  * candidate-generation + verify + sweep chain, not just the counts.
  */
object Round12Queries {

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    ("q416_threshold_sweep_lsh", (s: SparkSession, dir: String) => {
      import s.implicits._
      val hashed = Tables.spread(Tables.t(s, dir, "documents")).select(
        $"doc_id".as("id"),
        graft.functions.WordShingleHash32(TA.normText($"text"), 3).as("hs"))
      val (hs, cand) = Dedup.lshCandidates(hashed, nBands = 4)
      // exact verify on the candidate set only; filter to the smallest
      // cut any consumer needs BEFORE the checkpoint (the q408 ×10 OOM
      // lesson), then one cached pair table feeds all five cuts
      val pairs = cand
        .join(hs.toDF("id_a", "h_a"), Seq("id_a"))
        .join(hs.toDF("id_b", "h_b"), Seq("id_b"))
        .withColumn("inter",
          graft.functions.ArrayJaccard.sortedLongIntersect($"h_a", $"h_b"))
        .select($"id_a", $"id_b", expr(
          "1000000L * inter div (CAST(size(h_a) AS BIGINT) + size(h_b) - inter)")
          .as("j_micro"))
        .filter($"j_micro" >= 500000L)
        .localCheckpoint()
      Round11nQueries.sweep(s, pairs)
    }, Some(s"""
      ${ExtQueries.minhashPairsCte},
      lp AS (SELECT id_a, id_b,
          1000000 * len(list_intersect(ha.hs, hb.hs))
            // (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))
            AS j_micro
        FROM cand JOIN hst ha ON ha.doc_id = id_a
        JOIN hst hb ON hb.doc_id = id_b),
      lpf AS (SELECT * FROM lp WHERE j_micro >= 500000),
      taus AS (SELECT CAST(unnest([500000, 600000, 700000, 800000, 900000])
          AS BIGINT) AS tau_micro),
      h AS (SELECT tau_micro, id_a, id_b FROM lpf, taus WHERE j_micro >= tau_micro),
      np AS (SELECT tau_micro, CAST(count(*) AS BIGINT) AS n_pairs FROM h GROUP BY 1),
      nd AS (SELECT tau_micro, CAST(count(*) AS BIGINT) AS n_docs_flagged
        FROM (SELECT DISTINCT tau_micro, id FROM (
          SELECT tau_micro, id_a AS id FROM h
          UNION ALL SELECT tau_micro, id_b FROM h)) GROUP BY 1)
      SELECT t.tau_micro, coalesce(np.n_pairs, 0) AS n_pairs,
        coalesce(nd.n_docs_flagged, 0) AS n_docs_flagged
      FROM taus t LEFT JOIN np USING (tau_micro) LEFT JOIN nd USING (tau_micro)
      ORDER BY tau_micro"""))
  )
}
