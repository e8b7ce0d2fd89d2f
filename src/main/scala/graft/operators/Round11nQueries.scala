package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, TextAnalysis => TA}

/** Round-11 batch 14: the SCALE PATHS for the q408 threshold sweep —
  * the same dial audited over candidate spaces that stay bounded at any
  * corpus shape, closing the loop the q408 BENCHNOTES boundary opened:
  *
  *  - q410 sweeps over PPJoin prefix-filtered pairs
  *    (Dedup.prefixFilterPairsMicro — exact integer pruning rules, so
  *    the sweep is recall-LOSSLESS: its counts are the true curve, per
  *    construction a superset of q408's bucket-blocked counts);
  *  - q411 sweeps over q21's banded-MinHash candidates and reports the
  *    MEASURED recall per cut against the q410-form exact counts on the
  *    same hash universe — the empirical s-curve q396 predicts
  *    analytically.
  *
  * Both oracles are brute-force all-pairs ground truth in DuckDB (the
  * strongest possible check: the engine's pruned plans must equal the
  * unpruned enumeration), feasible at gate scale.
  */
object Round11nQueries {

  type QFn = (SparkSession, String) => DataFrame

  private val normSql = TA.normTextSql

  /** The shared 5-cut sweep over a (id_a, id_b, j_micro) pair table:
    * pairs and distinct flagged docs per threshold (also q416's tail). */
  private[operators] def sweep(s: SparkSession, pairs: DataFrame): DataFrame = {
    import s.implicits._
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
  }

  /** q410's pair table, UN-checkpointed — the exact builder the query
    * materializes behind its localCheckpoint. Shared with PlanDump's
    * `sub_q410_ppjoin_micro` evidence entry so the committed plan IS the
    * executed plan by construction (a drifting copy would silently
    * invalidate the plans/rNN dumps).
    */
  private[graft] def q410PairTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.spread(Tables.t(s, dir, "documents")).select(
      $"doc_id".as("id"),
      TA.charNgramInts($"text", 3).as("grams")) // sorted distinct longs
    Dedup.prefixFilterPairsMicro(docs, 500000L)
  }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- recall-lossless threshold sweep ----------------------------------
    // q408's table over q23's bucket blocking can MISS pairs the blocking
    // drops; this is the true curve — prefix filtering guarantees every
    // pair with J ≥ 0.5 is produced at any corpus shape, and all pruning
    // arithmetic is exact-integer so the five cuts replay bit-for-bit
    // against DuckDB's unpruned all-pairs enumeration.
    //
    // Density caveat (measured, BENCHNOTES ×10 row): when the gram space
    // is DENSE — this synthetic corpus is 38% self-similar at τ=0.5 in
    // char-3-grams — the true pair set itself grows as corpus² and no
    // lossless sweep escapes its size; sweep dense spaces at τ ≥ 0.7 or
    // sweep the sparse shingle universe instead (q411's side, which
    // completes ×10).
    ("q410_threshold_curve_exact", (s: SparkSession, dir: String) => {
      val pairs = q410PairTable(s, dir)
        .localCheckpoint() // reused by the 5 cuts
      sweep(s, pairs)
    }, Some("""
      WITH d AS (SELECT doc_id,
        list_distinct(list_transform(range(1, greatest(length(text) - 2, 1) + 1),
          i -> (CAST(ascii(substr(text, i, 1)) AS BIGINT) * 1114112
            + ascii(substr(text, i + 1, 1))) * 1114112
            + ascii(substr(text, i + 2, 1)))) AS grams
        FROM documents),
      p0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          len(list_intersect(a.grams, b.grams)) AS inter,
          len(a.grams) + len(b.grams) AS stot
        FROM d a JOIN d b ON a.doc_id < b.doc_id),
      pf AS (SELECT id_a, id_b, 1000000 * inter // (stot - inter) AS j_micro
        FROM p0 WHERE 1000000 * inter >= 500000 * (stot - inter)),
      taus AS (SELECT CAST(unnest([500000, 600000, 700000, 800000, 900000])
          AS BIGINT) AS tau_micro),
      h AS (SELECT tau_micro, id_a, id_b FROM pf, taus WHERE j_micro >= tau_micro),
      np AS (SELECT tau_micro, CAST(count(*) AS BIGINT) AS n_pairs FROM h GROUP BY 1),
      nd AS (SELECT tau_micro, CAST(count(*) AS BIGINT) AS n_docs_flagged
        FROM (SELECT DISTINCT tau_micro, id FROM (
          SELECT tau_micro, id_a AS id FROM h
          UNION ALL SELECT tau_micro, id_b FROM h)) GROUP BY 1)
      SELECT t.tau_micro, coalesce(np.n_pairs, 0) AS n_pairs,
        coalesce(nd.n_docs_flagged, 0) AS n_docs_flagged
      FROM taus t LEFT JOIN np USING (tau_micro) LEFT JOIN nd USING (tau_micro)
      ORDER BY tau_micro""")),

    // ----- measured LSH recall per threshold --------------------------------
    // q396 PLANS (bands, rows) from an analytic collision curve; this
    // MEASURES the shipped 4-band index: per cut, the exact pair count
    // on the word-shingle hash universe (prefix-filtered, lossless) vs
    // the count surviving banded candidate generation — recall in micro.
    // Bands can only lose pairs, so recall ≤ 1e6 by construction; the
    // oracle enumerates all pairs AND replays the band keys exactly
    // (the q21 template CTE).
    ("q411_lsh_recall_curve", (s: SparkSession, dir: String) => {
      import s.implicits._
      val hashed = Tables.spread(Tables.t(s, dir, "documents")).select(
        $"doc_id".as("id"),
        graft.functions.WordShingleHash32(TA.normText($"text"), 3).as("hs"))
      val (hs, cand) = Dedup.lshCandidates(hashed, nBands = 4)
      val lshPairs = cand
        .join(hs.toDF("id_a", "h_a"), Seq("id_a"))
        .join(hs.toDF("id_b", "h_b"), Seq("id_b"))
        .withColumn("inter", size(array_intersect($"h_a", $"h_b")).cast("long"))
        .select($"id_a", $"id_b", expr(
          "1000000L * inter div (CAST(size(h_a) AS BIGINT) + size(h_b) - inter)")
          .as("j_micro"))
        .filter($"j_micro" >= 500000L)
      val exPairs = Dedup.prefixFilterPairsMicro(
        hashed.withColumnRenamed("hs", "grams"), 500000L)
      val taus = Seq(500000L, 600000L, 700000L, 800000L, 900000L).toDF("tau_micro")
      val nEx = exPairs.crossJoin(broadcast(taus))
        .filter($"j_micro" >= $"tau_micro")
        .groupBy($"tau_micro").agg(count(lit(1)).as("n_exact"))
      val nLsh = lshPairs.crossJoin(broadcast(taus))
        .filter($"j_micro" >= $"tau_micro")
        .groupBy($"tau_micro").agg(count(lit(1)).as("n_lsh"))
      taus.join(nEx, Seq("tau_micro"), "left").join(nLsh, Seq("tau_micro"), "left")
        .select($"tau_micro",
          coalesce($"n_exact", lit(0L)).as("n_exact"),
          coalesce($"n_lsh", lit(0L)).as("n_lsh"))
        .withColumn("recall_micro", expr(
          "CASE WHEN n_exact = 0 THEN NULL ELSE 1000000 * n_lsh div n_exact END"))
        .orderBy($"tau_micro")
    }, Some(s"""
      ${ExtQueries.minhashPairsCte},
      lp AS (SELECT id_a, id_b,
          1000000 * len(list_intersect(ha.hs, hb.hs))
            // (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))
            AS j_micro
        FROM cand JOIN hst ha ON ha.doc_id = id_a
        JOIN hst hb ON hb.doc_id = id_b),
      lpf AS (SELECT * FROM lp WHERE j_micro >= 500000),
      ex AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          1000000 * len(list_intersect(a.hs, b.hs))
            // (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))
            AS j_micro
        FROM hst a JOIN hst b ON a.doc_id < b.doc_id),
      exf AS (SELECT * FROM ex WHERE j_micro >= 500000),
      taus AS (SELECT CAST(unnest([500000, 600000, 700000, 800000, 900000])
          AS BIGINT) AS tau_micro),
      ne AS (SELECT tau_micro, CAST(count(*) AS BIGINT) AS n_exact
        FROM exf, taus WHERE j_micro >= tau_micro GROUP BY 1),
      nl AS (SELECT tau_micro, CAST(count(*) AS BIGINT) AS n_lsh
        FROM lpf, taus WHERE j_micro >= tau_micro GROUP BY 1)
      SELECT t.tau_micro, coalesce(ne.n_exact, 0) AS n_exact,
        coalesce(nl.n_lsh, 0) AS n_lsh,
        CASE WHEN coalesce(ne.n_exact, 0) = 0 THEN NULL
          ELSE 1000000 * coalesce(nl.n_lsh, 0) // ne.n_exact END AS recall_micro
      FROM taus t LEFT JOIN ne USING (tau_micro) LEFT JOIN nl USING (tau_micro)
      ORDER BY tau_micro"""))
  )
}
