package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-9 batch 4: entity-resolution blocking quality (pair
  * completeness × reduction ratio — the two numbers that justify every
  * blocking scheme the dedup family uses), confident-learning label
  * noise estimation (which given labels does the scorer itself
  * contradict), and the exact cross-source vocabulary overlap matrix
  * (which sources mirror each other wholesale — the source-level
  * companion to q162's doc-level containment).
  *
  * House rules as elsewhere: integer arithmetic at every gate, 128-bit
  * where cross-products can pass Int64, identical aliases both sides,
  * total ORDER BY.
  */
object Round9dQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- blocking quality: pair completeness × reduction ratio ----------
    // Every blocking scheme (q21 bands, q122 sorted neighborhood, q132
    // paragraph blocks) trades recall for candidate count; this
    // operator MEASURES the trade on a planted-truth corpus: each
    // document gets a near-duplicate clone (' copydup' appended, id
    // shifted by 1e12 — the q20 union-with-self device, perturbed so
    // the clone's length moves), truth = the n (original, clone)
    // pairs, and the audited scheme is the classic (lang, length div
    // 100) band block. Pair completeness then reads the boundary-
    // straddle failure mode exactly: a truth pair is co-blocked iff
    // its lengths land in the same band, so PC ≈ 1 − shift/band long
    // before any sampling. Reduction ratio (candidates vs all pairs)
    // runs in DECIMAL(38,0)/HUGEINT — C(2n,2)·1e6 passes int64 at
    // ~2e6 docs. Shape: one block-size aggregate + one map-side truth
    // check; nothing pairwise is ever materialized.
    ("q328_blocking_quality", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"lang", $"text")
        .localCheckpoint() // reused: corpus union + truth-pair check
      val corpus = d.select($"doc_id", $"lang", length($"text").as("len"))
        .unionByName(d.select(($"doc_id" + 1000000000000L).as("doc_id"),
          $"lang", (length($"text") + 8).as("len")))
      val cand = corpus.groupBy($"lang", expr("len div 100").as("band"))
        .agg(count(lit(1)).as("b"))
        .agg(sum(expr("b * (b - 1) div 2")).as("n_cand_pairs"),
          sum($"b").as("n_docs"))
      val truth = d.select(
          (expr("length(text) div 100") ===
            expr("(length(text) + 8) div 100")).cast("long").as("cob"))
        .agg(count(lit(1)).as("n_truth_pairs"),
          sum($"cob").as("n_coblocked_truth"))
      cand.crossJoin(broadcast(truth))
        .select($"n_docs", $"n_truth_pairs", $"n_coblocked_truth",
          expr("""CASE WHEN n_truth_pairs = 0 THEN NULL
                  ELSE 1000000 * n_coblocked_truth div n_truth_pairs END""")
            .as("pc_micro"),
          $"n_cand_pairs",
          expr("""CAST(1000000 - CAST(1000000 AS DECIMAL(38,0)) * n_cand_pairs
                  div (CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1) div 2)
                  AS BIGINT)""").as("rr_micro"))
    }, Some("""
      WITH d AS (SELECT doc_id, lang, text FROM documents),
      corpus AS (SELECT doc_id, lang, length(text) AS len FROM d
        UNION ALL SELECT doc_id + 1000000000000, lang, length(text) + 8
        FROM d),
      cand AS (SELECT CAST(sum(b * (b - 1) // 2) AS BIGINT) AS n_cand_pairs,
          CAST(sum(b) AS BIGINT) AS n_docs
        FROM (SELECT lang, len // 100 AS band, CAST(count(*) AS BIGINT) AS b
              FROM corpus GROUP BY 1, 2)),
      truth AS (SELECT CAST(count(*) AS BIGINT) AS n_truth_pairs,
          CAST(sum(CASE WHEN length(text) // 100 = (length(text) + 8) // 100
            THEN 1 ELSE 0 END) AS BIGINT) AS n_coblocked_truth
        FROM d)
      SELECT n_docs, n_truth_pairs, n_coblocked_truth,
        CASE WHEN n_truth_pairs = 0 THEN NULL
          ELSE 1000000 * n_coblocked_truth // n_truth_pairs END AS pc_micro,
        n_cand_pairs,
        CAST(1000000 - CAST(1000000 AS HUGEINT) * n_cand_pairs
          // (CAST(n_docs AS HUGEINT) * (n_docs - 1) // 2) AS BIGINT)
          AS rr_micro
      FROM cand CROSS JOIN truth""")),

    // ----- confident-learning label noise estimate (score-space) ----------
    // q309 picks the best threshold ASSUMING the labels; confident
    // learning asks the opposite: which labels does the scorer itself
    // confidently contradict? (q187 runs the FEATURE-space version of
    // this screen — kNN label agreement over embeddings; this is the
    // score-space sibling, which needs no vectors and no pair scan.) Per-class confident thresholds are the
    // class-mean scores (t_pos = mean score of labeled-positives,
    // t_neg of labeled-negatives — integer div means, truncation
    // identical both engines); a labeled-positive scoring BELOW the
    // negatives' own mean is a suspected pos→neg flip, and vice versa.
    // The off-diagonal rates are the Cleanlab-style noise read —
    // simplified to mean-thresholds and documented as such (no
    // probability calibration is assumed; q297/q204 own that). Two
    // aggregates over the shared q297 scoring pass, output one row.
    ("q329_label_noise", (s: SparkSession, dir: String) => {
      import s.implicits._
      val lab = Round8aeQueries.scoredDocs(s, dir)
        .select($"score", $"pos").localCheckpoint() // reused: means + flags
      val th = lab.agg(
        sum(when($"pos" === 1, $"score")).as("sp"),
        sum($"pos").as("np"),
        sum(when($"pos" === 0, $"score")).as("sn"),
        (count(lit(1)) - sum($"pos")).as("nn"))
        .select(
          expr("CASE WHEN np = 0 THEN NULL ELSE sp div np END").as("t_pos"),
          expr("CASE WHEN nn = 0 THEN NULL ELSE sn div nn END").as("t_neg"),
          $"np", $"nn")
      lab.crossJoin(broadcast(th))
        .agg(max($"np").as("n_pos"), max($"nn").as("n_neg"),
          max($"t_pos").as("t_pos"), max($"t_neg").as("t_neg"),
          sum(when($"pos" === 1 && $"score" < $"t_neg", 1L).otherwise(0L))
            .as("n_suspect_pos2neg"),
          sum(when($"pos" === 0 && $"score" > $"t_pos", 1L).otherwise(0L))
            .as("n_suspect_neg2pos"))
        .select($"n_pos", $"n_neg", $"t_pos", $"t_neg",
          $"n_suspect_pos2neg", $"n_suspect_neg2pos",
          expr("""CASE WHEN n_pos = 0 THEN NULL
                  ELSE 1000000 * n_suspect_pos2neg div n_pos END""")
            .as("noise_pos_micro"),
          expr("""CASE WHEN n_neg = 0 THEN NULL
                  ELSE 1000000 * n_suspect_neg2pos div n_neg END""")
            .as("noise_neg_micro"))
    }, Some(s"""
      WITH ${Round8aeQueries.scoredSql},
      th AS (SELECT
          CASE WHEN sum(pos) = 0 THEN NULL
            ELSE CAST(sum(CASE WHEN pos = 1 THEN score ELSE 0 END) AS BIGINT)
                 // CAST(sum(pos) AS BIGINT) END AS t_pos,
          CASE WHEN count(*) - sum(pos) = 0 THEN NULL
            ELSE CAST(sum(CASE WHEN pos = 0 THEN score ELSE 0 END) AS BIGINT)
                 // CAST(count(*) - sum(pos) AS BIGINT) END AS t_neg,
          CAST(sum(pos) AS BIGINT) AS np,
          CAST(count(*) - sum(pos) AS BIGINT) AS nn
        FROM lab)
      SELECT max(np) AS n_pos, max(nn) AS n_neg,
        max(t_pos) AS t_pos, max(t_neg) AS t_neg,
        CAST(sum(CASE WHEN pos = 1 AND score < t_neg THEN 1 ELSE 0 END)
          AS BIGINT) AS n_suspect_pos2neg,
        CAST(sum(CASE WHEN pos = 0 AND score > t_pos THEN 1 ELSE 0 END)
          AS BIGINT) AS n_suspect_neg2pos,
        CASE WHEN max(np) = 0 THEN NULL
          ELSE 1000000 * CAST(sum(CASE WHEN pos = 1 AND score < t_neg
            THEN 1 ELSE 0 END) AS BIGINT) // max(np) END AS noise_pos_micro,
        CASE WHEN max(nn) = 0 THEN NULL
          ELSE 1000000 * CAST(sum(CASE WHEN pos = 0 AND score > t_pos
            THEN 1 ELSE 0 END) AS BIGINT) // max(nn) END AS noise_neg_micro
      FROM lab CROSS JOIN th""")),

    // ----- exact cross-source vocabulary overlap matrix -------------------
    // Which sources are mirrors of each other? q194 ESTIMATES this
    // matrix from 8-permutation minhash signatures; this is its exact
    // ground truth — per source-pair Jaccard |A∩B| / |A∪B| — plus the
    // containment |A∩B| / min(|A|,|B|) the signature form cannot give
    // (containment catches the subset-mirror case Jaccard dilutes,
    // and it is the audit that says how far q194's 8 permutations
    // drift). Shape: one distinct (source, token)
    // aggregate, an equi-join on the TOKEN for intersections (each
    // token fans at most |sources|² — bounded by the source roster,
    // not the corpus), a broadcast of the |sources| size table. The
    // output is the |sources|²/2 matrix, total-ordered.
    ("q330_source_overlap", (s: SparkSession, dir: String) => {
      import s.implicits._
      val st = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", explode(split(TA.normText($"text"), " ")).as("tok"))
        .filter($"tok" =!= "").distinct()
        .localCheckpoint() // reused: sizes + the intersection join
      val sz = st.groupBy($"source").agg(count(lit(1)).as("v"))
      val inter = st.toDF("sa", "tok").join(st.toDF("sb", "tok"), Seq("tok"))
        .filter($"sa" < $"sb")
        .groupBy($"sa", $"sb").agg(count(lit(1)).as("n_common"))
      inter
        .join(broadcast(sz.toDF("sa", "va")), Seq("sa"))
        .join(broadcast(sz.toDF("sb", "vb")), Seq("sb"))
        .select($"sa".as("source_a"), $"sb".as("source_b"),
          $"va".as("v_a"), $"vb".as("v_b"), $"n_common",
          expr("1000000 * n_common div (va + vb - n_common)")
            .as("jaccard_micro"),
          expr("1000000 * n_common div least(va, vb)")
            .as("containment_micro"))
        .orderBy($"source_a", $"source_b")
    }, Some(s"""
      WITH st AS (SELECT DISTINCT source, tok FROM
        (SELECT source, unnest(string_split($normSql, ' ')) AS tok
         FROM documents) WHERE tok <> ''),
      sz AS (SELECT source, CAST(count(*) AS BIGINT) AS v
        FROM st GROUP BY 1),
      inter AS (SELECT a.source AS sa, b.source AS sb,
          CAST(count(*) AS BIGINT) AS n_common
        FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2)
      SELECT i.sa AS source_a, i.sb AS source_b,
        za.v AS v_a, zb.v AS v_b, i.n_common,
        1000000 * i.n_common // (za.v + zb.v - i.n_common) AS jaccard_micro,
        1000000 * i.n_common // least(za.v, zb.v) AS containment_micro
      FROM inter i JOIN sz za ON i.sa = za.source
      JOIN sz zb ON i.sb = zb.source
      ORDER BY source_a, source_b"""))
  )
}
