package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 31: operating-point selection (the F1- and
  * Youden-optimal decision thresholds over the exact score grid — the
  * step that turns q276's AUC curve and q297's calibrated scores into
  * a deployable classifier), the Brier score with its Murphy
  * reliability–resolution–uncertainty decomposition (what q204's ECE
  * reads only one third of), and a hash-collision namespace audit
  * (birthday-bound engineering for every md5-truncation the battery's
  * determinism rests on).
  *
  * House rules as elsewhere: integer arithmetic at every gate,
  * 128-bit where cross-products can pass Int64, identical aliases
  * both sides, total ORDER BY.
  */
object Round8aeQueries {

  private val normSql = TA.normTextSql

  /** The battery's shared hashed-token document score (q297's form);
    * reused by q329's label-noise estimate. */
  private[operators] def scoredDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.spread(Tables.t(s, dir, "documents"))
      .select($"doc_id", $"n_chars",
        explode(split(TA.normText($"text"), " ")).as("tok"))
      .withColumn("w",
        conv(substring(md5(concat(lit("w|"),
            (conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long") % 1024)
              .cast("string"))), 1, 8), 16, 10)
          .cast("long") % 2001 - 1000)
      .groupBy($"doc_id").agg(max($"n_chars").as("nc"), sum($"w").as("score"))
      .withColumn("pos", ($"nc" >= 250).cast("long"))
  }

  private[operators] val scoredSql = s"""
      st AS (SELECT doc_id, n_chars,
          unnest(string_split($normSql, ' ')) AS tok FROM documents),
      sc AS (SELECT doc_id, max(n_chars) AS nc,
          CAST(sum(('0x' || substr(md5('w|' || CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) AS BIGINT) AS score
        FROM st GROUP BY 1),
      lab AS (SELECT doc_id, score,
          CAST(CASE WHEN nc >= 250 THEN 1 ELSE 0 END AS BIGINT) AS pos
        FROM sc)"""

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- operating-point selection over the exact score grid ------------
    // q276 integrates over ALL thresholds (AUC) and q297 calibrates the
    // scores; neither answers the deployment question: WHICH threshold
    // ships? This sweeps every achievable operating point — the
    // distinct-score grid, suffix-cumulated once (TP(t), FP(t) ride one
    // descending window over the value grid, the q195/q276 documented
    // bound: bucket first for unbounded score domains) — and picks two
    // canonical points: max-F1 (the imbalance-robust choice) and
    // max-Youden-J = recall − FPR (the ROC-corner choice). Precision/
    // recall/F1/J are floored micro integers (identical both engines);
    // argmax ties break toward the LOWER threshold (more recall at
    // equal score). Degenerate single-class corpora (np = 0 or nn = 0)
    // yield explicit NULL recall/J — Spark's div would NULL silently
    // while DuckDB's // raises, so the CASE guard keeps the engines in
    // agreement (tp + fp ≥ 1 holds by grid construction, so precision
    // needs no guard). Two rank-1 windows over the grid, not the corpus.
    ("q309_operating_point", (s: SparkSession, dir: String) => {
      import s.implicits._
      val lab = scoredDocs(s, dir).select($"score", $"pos")
      val tot = lab.agg(sum($"pos").as("np"),
        (count(lit(1)) - sum($"pos")).as("nn"))
      val wdesc = Window.orderBy(desc("score"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val grid = lab.groupBy($"score").agg(sum($"pos").as("p"),
          (count(lit(1)) - sum($"pos")).as("q"))
        .withColumn("tp", sum($"p").over(wdesc))
        .withColumn("fp", sum($"q").over(wdesc))
        .crossJoin(broadcast(tot))
        .select($"score".as("thr"), $"tp", $"fp", $"np", $"nn",
          expr("1000000 * tp div (tp + fp)").as("prec_micro"),
          expr("CASE WHEN np = 0 THEN NULL ELSE 1000000 * tp div np END")
            .as("rec_micro"))
        .select($"thr", $"tp", $"fp", $"np", $"nn", $"prec_micro",
          $"rec_micro",
          expr("""CASE WHEN prec_micro + rec_micro = 0 THEN 0
                  ELSE 2 * prec_micro * rec_micro
                       div (prec_micro + rec_micro) END""").as("f1_micro"),
          expr("""CASE WHEN np = 0 OR nn = 0 THEN NULL
                  ELSE 1000000 * tp div np - 1000000 * fp div nn END""")
            .as("j_micro"))
        .localCheckpoint() // reused by both argmax windows
      val wf = Window.orderBy(desc("f1_micro"), $"thr")
      val wj = Window.orderBy(desc("j_micro"), $"thr")
      val bestF = grid.withColumn("rn", row_number().over(wf))
        .filter($"rn" === 1).select(lit("f1").as("criterion"),
          $"thr", $"tp", $"fp", ($"np" - $"tp").as("fn"),
          $"prec_micro", $"rec_micro", $"f1_micro", $"j_micro")
      val bestJ = grid.withColumn("rn", row_number().over(wj))
        .filter($"rn" === 1).select(lit("youden").as("criterion"),
          $"thr", $"tp", $"fp", ($"np" - $"tp").as("fn"),
          $"prec_micro", $"rec_micro", $"f1_micro", $"j_micro")
      bestF.unionByName(bestJ).orderBy($"criterion")
    }, Some(s"""
      WITH $scoredSql,
      tot AS (SELECT CAST(sum(pos) AS BIGINT) AS np,
          CAST(count(*) - sum(pos) AS BIGINT) AS nn FROM lab),
      grid0 AS (SELECT score AS thr,
          CAST(sum(sum(pos)) OVER (ORDER BY score DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS tp,
          CAST(sum(count(*) - sum(pos)) OVER (ORDER BY score DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS fp
        FROM lab GROUP BY score),
      grid1 AS (SELECT thr, tp, fp, np, nn,
          1000000 * tp // (tp + fp) AS prec_micro,
          CASE WHEN np = 0 THEN NULL ELSE 1000000 * tp // np END
            AS rec_micro
        FROM grid0 CROSS JOIN tot),
      grid AS (SELECT thr, tp, fp, np, nn, prec_micro, rec_micro,
          CASE WHEN prec_micro + rec_micro = 0 THEN 0
            ELSE 2 * prec_micro * rec_micro
                 // (prec_micro + rec_micro) END AS f1_micro,
          CASE WHEN np = 0 OR nn = 0 THEN NULL
            ELSE 1000000 * tp // np - 1000000 * fp // nn END AS j_micro
        FROM grid1),
      bf AS (SELECT 'f1' AS criterion, thr, tp, fp, np - tp AS fn,
          prec_micro, rec_micro, f1_micro, j_micro,
          row_number() OVER (ORDER BY f1_micro DESC, thr) AS rn FROM grid),
      bj AS (SELECT 'youden' AS criterion, thr, tp, fp, np - tp AS fn,
          prec_micro, rec_micro, f1_micro, j_micro,
          row_number() OVER (ORDER BY j_micro DESC, thr) AS rn FROM grid)
      SELECT criterion, thr, tp, fp, fn, prec_micro, rec_micro, f1_micro,
        j_micro FROM bf WHERE rn = 1
      UNION ALL SELECT criterion, thr, tp, fp, fn, prec_micro, rec_micro,
        f1_micro, j_micro FROM bj WHERE rn = 1
      ORDER BY criterion""")),

    // ----- Brier score + Murphy decomposition -----------------------------
    // q204's ECE reads only RELIABILITY; the Murphy decomposition reads
    // the whole forecast: Brier = REL − RES + UNC, where resolution
    // rewards forecasts that actually SEPARATE outcomes and uncertainty
    // is the outcome base rate's own variance. Forecasts are the 16-bin
    // equal-width calibration of the document score (the q297
    // preprocessing), forecast value = bin midpoint in micro. Every
    // term is an exact integer: squared micro differences accumulate in
    // DECIMAL(38,0) (n·1e12 passes Int64 at ~9e6 rows), each component
    // is floored once by n·1e6, and the floor-bounded identity residual
    // brier − (rel − res + unc) ships as its own column — measured,
    // not assumed away (|gap| ≤ 8: one floor per component plus the
    // per-bin ōk and base-rate floors, each worth ≤ 2 micro;
    // spec-pinned).
    ("q310_brier_decomposition", (s: SparkSession, dir: String) => {
      import s.implicits._
      val lab = scoredDocs(s, dir).select($"score", $"pos")
      val rng = lab.agg(min($"score").as("mn"), max($"score").as("mx"))
      val binned = lab.crossJoin(broadcast(rng))
        .select(expr("(score - mn) * 16 div (mx - mn + 1)").as("bin"),
          $"pos")
        .select($"bin", $"pos",
          expr("(2 * bin + 1) * 1000000 div 32").as("f"))
        .localCheckpoint() // reused: per-bin stats + the global base rate
      val tot = binned.agg(count(lit(1)).as("n"), sum($"pos").as("sp"))
      val bins = binned.groupBy($"bin", $"f")
        .agg(count(lit(1)).as("nk"), sum($"pos").as("pk"))
        .select($"bin", $"f", $"nk", $"pk",
          expr("1000000 * pk div nk").as("ok"))
      val brier = binned.agg(sum(
        expr("CAST(f - pos * 1000000 AS DECIMAL(38,0)) * (f - pos * 1000000)"))
        .as("sq"))
      val comps = bins.crossJoin(broadcast(tot))
        .agg(sum(expr("CAST(nk AS DECIMAL(38,0)) * (f - ok) * (f - ok)"))
            .as("reln"),
          sum(expr(
            "CAST(nk AS DECIMAL(38,0)) * (ok - 1000000 * sp div n) * (ok - 1000000 * sp div n)"))
            .as("resn"))
      brier.crossJoin(broadcast(comps)).crossJoin(broadcast(tot))
        .select(
          expr("CAST(sq div (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)")
            .as("brier_micro"),
          expr("CAST(reln div (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)")
            .as("rel_micro"),
          expr("CAST(resn div (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)")
            .as("res_micro"),
          expr("""CAST((1000000 * sp div n) * (1000000 - 1000000 * sp div n)
              div 1000000 AS BIGINT)""").as("unc_micro"))
        .select($"brier_micro", $"rel_micro", $"res_micro", $"unc_micro",
          ($"brier_micro" - ($"rel_micro" - $"res_micro" + $"unc_micro"))
            .as("identity_gap"))
    }, Some(s"""
      WITH $scoredSql,
      rng AS (SELECT min(score) AS mn, max(score) AS mx FROM lab),
      binned AS (SELECT (score - mn) * 16 // (mx - mn + 1) AS bin, pos,
          ((score - mn) * 16 // (mx - mn + 1) * 2 + 1) * 1000000 // 32 AS f
        FROM lab CROSS JOIN rng),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(pos) AS BIGINT) AS sp FROM binned),
      bins AS (SELECT bin, f, CAST(count(*) AS BIGINT) AS nk,
          CAST(sum(pos) AS BIGINT) AS pk,
          1000000 * CAST(sum(pos) AS BIGINT) // CAST(count(*) AS BIGINT)
            AS ok
        FROM binned GROUP BY 1, 2),
      brier AS (SELECT sum(CAST(f - pos * 1000000 AS HUGEINT)
          * (f - pos * 1000000)) AS sq FROM binned),
      comps AS (SELECT
          sum(CAST(nk AS HUGEINT) * (f - ok) * (f - ok)) AS reln,
          sum(CAST(nk AS HUGEINT) * (ok - 1000000 * sp // n)
            * (ok - 1000000 * sp // n)) AS resn
        FROM bins CROSS JOIN tot)
      SELECT
        CAST(sq // (CAST(n AS HUGEINT) * 1000000) AS BIGINT) AS brier_micro,
        CAST(reln // (CAST(n AS HUGEINT) * 1000000) AS BIGINT) AS rel_micro,
        CAST(resn // (CAST(n AS HUGEINT) * 1000000) AS BIGINT) AS res_micro,
        CAST((1000000 * sp // n) * (1000000 - 1000000 * sp // n) // 1000000
          AS BIGINT) AS unc_micro,
        CAST(sq // (CAST(n AS HUGEINT) * 1000000) AS BIGINT)
          - (CAST(reln // (CAST(n AS HUGEINT) * 1000000) AS BIGINT)
             - CAST(resn // (CAST(n AS HUGEINT) * 1000000) AS BIGINT)
             + CAST((1000000 * sp // n) * (1000000 - 1000000 * sp // n)
               // 1000000 AS BIGINT)) AS identity_gap
      FROM brier CROSS JOIN comps CROSS JOIN tot""")),

    // ----- hash-collision namespace audit ---------------------------------
    // Every md5-truncation in the battery (32-bit buckets, band keys,
    // ring positions) carries a silent birthday bound; this measures it
    // for the document-id namespace at widths 16/20/24/28/32 bits:
    // observed colliding pairs Σ C(cnt,2) per truncated hash vs the
    // birthday expectation C(n,2)/2^w in micro. The widths travel as a
    // 5-row broadcast grid (map-side fanout ×5), collision counting is
    // one hash aggregate per width, and the expectation is closed-form
    // — the "how many bits does this ID space need" table, measured
    // against its own theory.
    ("q311_hash_collision_audit", (s: SparkSession, dir: String) => {
      import s.implicits._
      val h = Tables.spread(Tables.t(s, dir, "documents"))
        .select(conv(substring(md5(concat(lit("ns|"),
          $"doc_id".cast("string"))), 1, 8), 16, 10).cast("long").as("h"))
      val widths = Seq(16L, 20L, 24L, 28L, 32L).map(Tuple1(_)).toDF("w")
      val tot = h.agg(count(lit(1)).as("n"))
      h.crossJoin(broadcast(widths))
        .select($"w", expr("h % CAST(pow(2, w) AS BIGINT)").as("b"))
        .groupBy($"w", $"b").agg(count(lit(1)).as("c"))
        .groupBy($"w").agg(count(lit(1)).as("n_buckets_used"),
          sum(expr("c * (c - 1) div 2")).as("obs_pairs"))
        .crossJoin(broadcast(tot))
        .select($"w", $"n".as("n_ids"), $"n_buckets_used", $"obs_pairs",
          expr("""1000000 * (n * (n - 1) div 2)
                  div CAST(pow(2, w) AS BIGINT)""").as("exp_pairs_micro"))
        .orderBy($"w")
    }, Some("""
      WITH h AS (SELECT ('0x' || substr(md5('ns|' || CAST(doc_id AS VARCHAR)),
          1, 8))::BIGINT AS h FROM documents),
      widths AS (SELECT CAST(w AS BIGINT) AS w
        FROM (SELECT unnest([16, 20, 24, 28, 32]) AS w)),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM h),
      bkt AS (SELECT w, h % CAST(pow(2, w) AS BIGINT) AS b,
          CAST(count(*) AS BIGINT) AS c
        FROM h CROSS JOIN widths GROUP BY 1, 2),
      agg AS (SELECT w, CAST(count(*) AS BIGINT) AS n_buckets_used,
          CAST(sum(c * (c - 1) // 2) AS BIGINT) AS obs_pairs
        FROM bkt GROUP BY 1)
      SELECT a.w, tot.n AS n_ids, a.n_buckets_used, a.obs_pairs,
        1000000 * (tot.n * (tot.n - 1) // 2) // CAST(pow(2, a.w) AS BIGINT)
          AS exp_pairs_micro
      FROM agg a CROSS JOIN tot ORDER BY a.w"""))
  )
}
