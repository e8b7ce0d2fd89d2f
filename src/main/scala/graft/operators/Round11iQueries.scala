package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, GridCumulative, TextAnalysis => TA}

/** Round-11 batch 9: pipeline-planning operators — split-conformal
  * coverage (the distribution-free gate-threshold calibrator),
  * a data-driven MinHash LSH parameter planner (re-plan the (bands,
  * rows) budget against the corpus's observed candidate similarity
  * mass), and a token-budget waterfill allocator (the mixture planner
  * that turns per-source quality ranks into an exact allocation).
  *
  * Float discipline: q395/q397 are BIGINT end to end; q396's s-curve
  * probabilities are the one double step, micro-rounded per cell (the
  * q235 rule — Spark's Math.pow and DuckDB's libm pow may differ in
  * the last ulp) before every downstream mass sum runs in integers.
  */
object Round11iQueries {

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- split-conformal coverage ----------------------------------------
    // The distribution-free calibrator for any numeric gate: on an
    // md5-gated calibration split, the conformal quantile q̂ is the
    // ⌈(n_cal+1)·(1−α)⌉-th smallest score, and P(score ≤ q̂) ≥ 1−α
    // holds on exchangeable test data with NO distributional
    // assumption — the modern way to set q118-style thresholds with a
    // guarantee. Exact: order statistic via the calibration value
    // grid + the q393 interval-join lookup (rank k lands in exactly
    // one grid row), coverage counted on the test grid. Both α rows
    // (10%, 5%) come off one shared grid pass.
    ("q395_conformal_coverage", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.t(s, dir, "documents")
        .select($"n_chars".cast("long").as("v"),
          expr("""CAST(conv(substring(md5(CAST(doc_id AS STRING) || '_cf'), 1, 8),
              16, 10) AS BIGINT) % 2 = 0""").as("cal"))
      val calGrid = d.filter($"cal").groupBy($"v").agg(count(lit(1)).as("c"))
      val testGrid = d.filter(!$"cal").groupBy($"v").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val cum = GridCumulative.withRunningTotal(calGrid, "v", "c", "cum")
      val lookup = cum.select($"v".as("qhat"),
        ($"cum" - $"c").as("lo"), $"cum".as("hi"))
      val nCal = calGrid.agg(sum($"c").as("n_cal"))
      val nTest = testGrid.agg(sum($"c").as("n_test"))
      val alphas = s.range(0, 2)
        .select(when($"id" === 0, 90L).otherwise(95L).as("pct"))
      val k = alphas.crossJoin(broadcast(nCal)).crossJoin(broadcast(nTest))
        .withColumn("k", expr("((n_cal + 1) * pct + 99) div 100"))
      val withQ = k.join(broadcast(lookup), $"k" > $"lo" && $"k" <= $"hi")
      withQ.join(broadcast(testGrid.withColumnRenamed("v", "tv")),
          $"tv" <= $"qhat")
        .groupBy($"pct", $"n_cal", $"n_test", $"k", $"qhat")
        .agg(sum($"c").as("n_covered"))
        .select($"pct", $"n_cal", $"n_test", $"k", $"qhat", $"n_covered",
          expr("n_covered * 1000000 div n_test").as("cov_ppm"))
        .orderBy($"pct")
    }, Some("""
      WITH d AS (SELECT CAST(n_chars AS BIGINT) AS v,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_cf'), 1, 8))::BIGINT % 2 = 0 AS cal
        FROM documents),
      cg AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM d WHERE cal GROUP BY 1),
      tg AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM d WHERE NOT cal GROUP BY 1),
      cc AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM cg),
      lk AS (SELECT v AS qhat, cum - c AS lo, cum AS hi FROM cc),
      ncal AS (SELECT CAST(sum(c) AS BIGINT) AS n_cal FROM cg),
      ntst AS (SELECT CAST(sum(c) AS BIGINT) AS n_test FROM tg),
      al AS (SELECT CAST(unnest([90, 95]) AS BIGINT) AS pct),
      kk AS (SELECT pct, n_cal, n_test, ((n_cal + 1) * pct + 99) // 100 AS k
        FROM al, ncal, ntst),
      wq AS (SELECT kk.*, lk.qhat FROM kk JOIN lk ON kk.k > lk.lo AND kk.k <= lk.hi)
      SELECT pct, n_cal, n_test, k, qhat,
        CAST(sum(tg.c) AS BIGINT) AS n_covered,
        CAST(sum(tg.c) AS BIGINT) * 1000000 // n_test AS cov_ppm
      FROM wq JOIN tg ON tg.v <= wq.qhat
      GROUP BY 1, 2, 3, 4, 5 ORDER BY pct""")),

    // ----- MinHash LSH parameter planner -----------------------------------
    // q139 audits the CURRENT plan's estimate quality; this RE-PLANS
    // the signature budget: for every (bands b × rows r) factorization
    // of a 128-permutation budget, the analytic collision curve
    // p(s) = 1 − (1 − s^r)^b is weighted by the corpus's OBSERVED
    // candidate-pair similarity histogram (exact integer Jaccard
    // buckets off the shared q21/q139 shingle-hash candidates), and
    // the plan minimizing expected false-positive + false-negative
    // mass around the 0.5 threshold wins. Candidate generation stays
    // bucketed (band equi-join); everything after the ≤20-row
    // histogram is spine-scale. One double per (plan, bucket) cell,
    // micro-rounded; the masses are BIGINT.
    ("q396_lsh_planner", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id".as("id"),
          graft.functions.WordShingleHash32(TA.normText($"text"), 3).as("hs"))
      val (hs, cand) = Dedup.lshCandidates(docs, 4)
      val hist = cand
        .join(hs.select($"id".as("id_a"), $"hs".as("h_a")), Seq("id_a"))
        .join(hs.select($"id".as("id_b"), $"hs".as("h_b")), Seq("id_b"))
        .select(expr("size(array_intersect(h_a, h_b))").cast("long").as("inter"),
          (expr("size(h_a) + size(h_b)")
            - expr("size(array_intersect(h_a, h_b))")).cast("long").as("uni"))
        .filter($"uni" > 0) // an empty-shingle doc has no similarity defined
        .select(least(lit(19L), expr("20 * inter div uni")).as("bkt"))
        .groupBy($"bkt").agg(count(lit(1)).as("n_pairs"))
      val plans = s.range(0, 8)
        .select(expr("CAST(pow(2.0, CAST(id AS DOUBLE)) AS BIGINT)").as("r"))
        .withColumn("b", expr("128 div r"))
      val cells = broadcast(plans).crossJoin(broadcast(hist))
        .withColumn("s", expr("CAST(2 * bkt + 1 AS DOUBLE) / 40.0"))
        .withColumn("p_micro", expr(
          """CAST(floor((1.0 - pow(1.0 - pow(s, CAST(r AS DOUBLE)),
               CAST(b AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)"""))
      val scored = cells.groupBy($"b", $"r").agg(
          sum(when($"bkt" < 10, $"n_pairs" * $"p_micro").otherwise(0L))
            .as("fp_mass_micro"),
          sum(when($"bkt" >= 10, $"n_pairs" * (lit(1000000L) - $"p_micro"))
            .otherwise(0L)).as("fn_mass_micro"))
        .withColumn("err_micro", $"fp_mass_micro" + $"fn_mass_micro")
      val best = scored.agg(min(struct($"err_micro", $"b")).as("m"))
        .select($"m.err_micro".as("best_err"), $"m.b".as("best_b"))
      scored.crossJoin(broadcast(best))
        .select($"b", $"r", $"fp_mass_micro", $"fn_mass_micro", $"err_micro",
          ($"err_micro" === $"best_err" && $"b" === $"best_b").cast("long")
            .as("is_best"))
        .orderBy($"r")
    }, Some(s"""
      ${Round7Queries.minhashCandCte},
      pj AS (SELECT cand.id_a, cand.id_b,
          CAST(len(list_intersect(ha.hs, hb.hs)) AS BIGINT) AS inter,
          CAST(len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)) AS BIGINT) AS uni
        FROM cand JOIN hst ha ON ha.doc_id = cand.id_a
        JOIN hst hb ON hb.doc_id = cand.id_b),
      hist AS (SELECT least(19, 20 * inter // uni) AS bkt,
          CAST(count(*) AS BIGINT) AS n_pairs
        FROM pj WHERE uni > 0 GROUP BY 1),
      plans AS (SELECT CAST(pow(2.0, CAST(i AS DOUBLE)) AS BIGINT) AS r,
          128 // CAST(pow(2.0, CAST(i AS DOUBLE)) AS BIGINT) AS b
        FROM (SELECT unnest(generate_series(0, 7)) AS i)),
      cells AS (SELECT b, r, bkt, n_pairs,
          CAST(floor((1.0 - pow(1.0 - pow(CAST(2 * bkt + 1 AS DOUBLE) / 40.0,
            CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) AS p_micro
        FROM plans, hist),
      sc AS (SELECT b, r,
          CAST(sum(CASE WHEN bkt < 10 THEN n_pairs * p_micro ELSE 0 END) AS BIGINT)
            AS fp_mass_micro,
          CAST(sum(CASE WHEN bkt >= 10 THEN n_pairs * (1000000 - p_micro) ELSE 0 END)
            AS BIGINT) AS fn_mass_micro
        FROM cells GROUP BY 1, 2),
      sc2 AS (SELECT *, fp_mass_micro + fn_mass_micro AS err_micro FROM sc),
      bst AS (SELECT err_micro AS best_err, b AS best_b FROM sc2
        ORDER BY err_micro, b LIMIT 1)
      SELECT b, r, fp_mass_micro, fn_mass_micro, err_micro,
        CAST(CASE WHEN err_micro = best_err AND b = best_b THEN 1 ELSE 0 END AS BIGINT)
          AS is_best
      FROM sc2, bst ORDER BY r""")),

    // ----- token-budget waterfill allocator --------------------------------
    // The mixture PLANNER q107/q110's samplers execute: given per-source
    // token supply (n_chars div 4 proxy) and a quality rank (English
    // rate in exact ppm), greedily fill a 40%-of-corpus token budget
    // best-source-first, each source capped at its own supply —
    // allocation a_s = clamp(B − Σ_{better} supply, 0, supply_s). The
    // cumulative runs over the ≤20-row source table (the GridCumulative
    // totals convention: constant partition key states the intent).
    ("q397_token_budget_allocation", (s: SparkSession, dir: String) => {
      import s.implicits._
      val src = Tables.t(s, dir, "documents")
        .groupBy($"source").agg(
          sum(expr("CAST(n_chars AS BIGINT) div 4")).as("supply"),
          count(lit(1)).as("n_docs"),
          sum(($"lang" === "en").cast("long")).as("n_en"))
        .withColumn("q_ppm", expr("n_en * 1000000 div n_docs"))
        .localCheckpoint() // reused: total + fold (one corpus scan, not two)
      val tot = src.agg(sum($"supply").as("tot"))
      val w = Window.partitionBy(lit(0)).orderBy($"q_ppm".desc, $"source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      src.crossJoin(broadcast(tot))
        .withColumn("budget", expr("tot * 2 div 5"))
        .withColumn("cum", sum($"supply").over(w))
        .withColumn("alloc", expr(
          "greatest(0L, least(supply, budget - (cum - supply)))"))
        .select($"source", $"q_ppm", $"supply", $"budget", $"alloc",
          ($"alloc" === $"supply").cast("long").as("fully_taken"))
        .orderBy($"q_ppm".desc, $"source")
    }, Some("""
      WITH src AS (SELECT source,
          CAST(sum(CAST(n_chars AS BIGINT) // 4) AS BIGINT) AS supply,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
        FROM documents GROUP BY 1),
      s2 AS (SELECT source, supply, n_en * 1000000 // n_docs AS q_ppm FROM src),
      tt AS (SELECT CAST(sum(supply) AS BIGINT) AS tot FROM s2),
      s3 AS (SELECT source, q_ppm, supply, tot * 2 // 5 AS budget,
          CAST(sum(supply) OVER (ORDER BY q_ppm DESC, source) AS BIGINT) AS cum
        FROM s2, tt)
      SELECT source, q_ppm, supply, budget,
        greatest(0, least(supply, budget - (cum - supply))) AS alloc,
        CAST(CASE WHEN greatest(0, least(supply, budget - (cum - supply))) = supply
          THEN 1 ELSE 0 END AS BIGINT) AS fully_taken
      FROM s3 ORDER BY q_ppm DESC, source"""))
  )
}
