package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, GridCumulative, TextAnalysis => TA}

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
      ORDER BY tau_micro""")),

    // ----- distribution-drift monitors ------------------------------------
    // The re-crawl question a production corpus asks every snapshot:
    // has the length distribution MOVED? Three standard monitors over
    // the same split (snapshot A = even doc_id, B = odd — the
    // deterministic stand-in for consecutive crawls), all computed
    // from ONE distinct-value grid: per-value (countA, countB) and
    // GridCumulative running totals — never a global sort, never a
    // per-row rank. Pair counts are corpus-sized; the grid is
    // value-DOMAIN-sized (distinct document lengths), the same
    // boundedness argument as the rank-test battery (q356/q357).
    // All comparisons are cross-multiplied exact integers
    // (|cumA·nB − cumB·nA| in DECIMAL(38,0) vs DuckDB HUGEINT);
    // doubles appear only in the final scalar chains, written with
    // IDENTICAL expression text on both engines. Where an exact
    // integer is itself an OUTPUT column (q417 d_num, q418 w1_num),
    // the oracle narrows it to BIGINT at the very end: that cast is a
    // gate-representation constraint, not an engine-type claim — the
    // driver's duckdb→pandas bridge degrades both HUGEINT and
    // DECIMAL(38,0) to float64 ("12345.0", 1e+26), which would break
    // the exact string-repr compare, while BIGINT survives verbatim.
    // The narrowing is safe to |d_num| < 2^63, i.e. ~3e9 docs per
    // split; the engine-side arithmetic stays DECIMAL(38,0)/HUGEINT
    // throughout (r12 ADVICE, adjudicated with a measured probe).

    // Kolmogorov–Smirnov two-sample: D = sup|F_A − F_B| — the classic
    // nonparametric drift alarm (q357 ranks; this sups the CDF gap).
    ("q417_ks_two_sample", (s: SparkSession, dir: String) => {
      import s.implicits._
      val (cums, tot) = driftCums(s, dir)
      val dmax = cums.crossJoin(broadcast(tot))
        .select(abs($"cuma".cast("decimal(38,0)") * $"n_b" -
          $"cumb".cast("decimal(38,0)") * $"n_a").as("dn"))
        .agg(max($"dn").as("d_num"))
      dmax.crossJoin(broadcast(tot)).select(
        $"n_a", $"n_b", $"d_num",
        expr(KsDSql).as("d_stat"),
        expr(s"sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / " +
          s"CAST(n_a + n_b AS DOUBLE)) * ($KsDSql)").as("ks_scaled"))
    }, Some(s"""
      WITH $DriftGridSql,
      m AS (SELECT CAST(max(abs(cuma * (SELECT n_b FROM t)
                         - cumb * (SELECT n_a FROM t))) AS BIGINT) AS d_num FROM c)
      SELECT n_a, n_b, d_num, $KsDSql AS d_stat,
        sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) /
          CAST(n_a + n_b AS DOUBLE)) * ($KsDSql) AS ks_scaled
      FROM t, m""")),

    // Wasserstein-1 (earth mover) drift: ∫|F_A − F_B| dx — KS flags
    // the worst point; W1 prices the whole transport. Exact integer
    // numerator Σ|cumA·nB − cumB·nA|·Δv over consecutive grid values.
    ("q418_wasserstein_drift", (s: SparkSession, dir: String) => {
      import s.implicits._
      val (cums, tot) = driftCums(s, dir)
      // lead over the GRID: value-domain-bounded, the documented
      // bounded-grid window idiom (one row per distinct length)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(0)).orderBy($"n_chars")
      val segs = cums.withColumn("vnext", lead($"n_chars", 1).over(w))
        .filter($"vnext".isNotNull)
        .crossJoin(broadcast(tot))
        .select((abs($"cuma".cast("decimal(38,0)") * $"n_b" -
          $"cumb".cast("decimal(38,0)") * $"n_a") *
          ($"vnext" - $"n_chars").cast("decimal(38,0)")).as("seg"))
      segs.agg(sum($"seg").as("w1_num")).crossJoin(broadcast(tot))
        .select($"n_a", $"n_b", $"w1_num",
          expr("CAST(w1_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * " +
            "CAST(n_b AS DOUBLE))").as("w1"))
    }, Some(s"""
      WITH $DriftGridSql,
      sg AS (SELECT abs(cuma * (SELECT n_b FROM t)
                      - cumb * (SELECT n_a FROM t))
               * (lead(n_chars) OVER (ORDER BY n_chars) - n_chars) AS seg
             FROM c),
      m AS (SELECT CAST(sum(seg) AS BIGINT) AS w1_num FROM sg WHERE seg IS NOT NULL)
      SELECT n_a, n_b, w1_num,
        CAST(w1_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS w1
      FROM t, m""")),

    // Population stability index over pooled deciles — the ML-ops
    // drift score. Decile assignment is EXACT integer (a 10-arm CASE
    // on (cum_pool−1)·10 vs b·n — no decimal division, whose rounding
    // differs between engines); the ≤10 ln terms fold sorted by bin
    // (the q386 sorted-fold discipline). Bins where either side is
    // empty contribute 0 by convention (ε-free; n_bins_used reports
    // how many scored).
    ("q419_psi_deciles", (s: SparkSession, dir: String) => {
      import s.implicits._
      val (cums, tot) = driftCums(s, dir)
      val binned = cums.crossJoin(broadcast(tot))
        .withColumn("xp",
          ($"cump".cast("decimal(38,0)") - 1) * 10)
        .withColumn("nt", ($"n_a" + $"n_b").cast("decimal(38,0)"))
        .withColumn("bin", expr(PsiBinCase))
      val bins = binned.groupBy($"bin").agg(
        sum($"ca").as("a"), sum($"cb").as("b"))
      bins.crossJoin(broadcast(tot))
        .withColumn("term", expr(PsiTermSql))
        .agg(
          count(lit(1)).as("n_bins"),
          sum(when($"a" > 0 && $"b" > 0, 1L).otherwise(0L)).as("n_bins_used"),
          first($"n_a").as("n_a"), first($"n_b").as("n_b"),
          collect_list(struct($"bin", $"term")).as("ts"))
        .withColumn("psi", expr(
          "aggregate(array_sort(ts), CAST(0.0 AS DOUBLE), (acc, t) -> acc + t.term)"))
        .select($"n_a", $"n_b", $"n_bins", $"n_bins_used", $"psi")
    }, Some(s"""
      WITH $DriftGridSql,
      bn AS (SELECT ${PsiBinCaseSql} AS bin, ca, cb FROM c),
      bins AS (SELECT bin, CAST(sum(ca) AS BIGINT) AS a,
          CAST(sum(cb) AS BIGINT) AS b FROM bn GROUP BY 1),
      tm AS (SELECT bin, $PsiTermSql AS term FROM bins, t),
      ag AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
          CAST(sum(CASE WHEN a > 0 AND b > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_bins_used
        FROM bins, t),
      ps AS (SELECT list_reduce(list(term ORDER BY bin), (x, y) -> x + y)
          AS psi FROM tm)
      SELECT n_a, n_b, n_bins, n_bins_used, psi FROM t, ag, ps"""))
  )

  // ----- shared drift-grid machinery ---------------------------------

  /** (cums, totals): one row per distinct n_chars with per-split counts
    * (ca, cb), running totals (cuma, cumb, cump — GridCumulative, so
    * bounded per-task state), and the (n_a, n_b) totals table.
    */
  private def driftCums(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    // checkpoint the grid: the totals branch and the three cumulative
    // branches all read the materialized value-domain-sized grid, so
    // the CORPUS is scanned exactly once per query (PlanQualitySpec
    // pins the grid plan: one scan, pruned to (doc_id, n_chars))
    val g = driftGrid(s, dir).localCheckpoint()
    val cums = GridCumulative.withRunningTotal(
      GridCumulative.withRunningTotal(
        GridCumulative.withRunningTotal(g, "n_chars", "ca", "cuma"),
        "n_chars", "cb", "cumb")
        .withColumn("cp", $"ca" + $"cb"),
      "n_chars", "cp", "cump")
    val tot = g.agg(sum($"ca").as("n_a"), sum($"cb").as("n_b"))
    (cums, tot)
  }

  /** The pre-checkpoint grid plan — exposed so PlanQualitySpec can
    * assert the one-pruned-scan shape that checkpointing hides from
    * the final plans. */
  private[graft] def driftGrid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.spread(Tables.t(s, dir, "documents"))
      .select($"n_chars", (pmod($"doc_id", lit(2)) === 0).as("is_a"))
      .groupBy($"n_chars").agg(
        sum(when($"is_a", 1L).otherwise(0L)).as("ca"),
        sum(when($"is_a", 0L).otherwise(1L)).as("cb"))
  }

  /** DuckDB CTE chain ending in `c(n_chars, ca, cb, cuma, cumb, cump)`
    * and `t(n_a, n_b)` — the oracle rendering of [[driftCums]].
    */
  private val DriftGridSql: String = """
      d0 AS (SELECT n_chars, (doc_id % 2 = 0) AS is_a FROM documents),
      g AS (SELECT n_chars,
          CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
          CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        FROM d0 GROUP BY 1),
      c AS (SELECT n_chars, ca, cb,
          sum(ca) OVER (ORDER BY n_chars) AS cuma,
          sum(cb) OVER (ORDER BY n_chars) AS cumb,
          sum(ca + cb) OVER (ORDER BY n_chars) AS cump
        FROM g),
      t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
          CAST(sum(cb) AS BIGINT) AS n_b FROM g)"""

  /** D = d_num/(nA·nB) — identical text on both engines so the IEEE
    * chain agrees to the last ulp. */
  private val KsDSql =
    "CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"

  /** Exact integer decile assignment: bin b ⟺ b·n ≤ (cum_pool−1)·10
    * < (b+1)·n. Spark side compares DECIMAL(38,0) columns xp/nt. */
  private val PsiBinCase: String =
    (9 to 1 by -1).map(b => s"WHEN xp >= $b * nt THEN ${b}L")
      .mkString("CASE ", " ", " ELSE 0L END")

  /** The same CASE for DuckDB, inline over HUGEINT cump. */
  private val PsiBinCaseSql: String =
    (9 to 1 by -1).map(b =>
      s"WHEN (cump - 1) * 10 >= $b * (SELECT n_a + n_b FROM t) THEN $b")
      .mkString("CASE ", " ", " ELSE 0 END")

  /** Per-bin PSI term — identical text on both engines. */
  private val PsiTermSql = """CASE WHEN a = 0 OR b = 0 THEN CAST(0.0 AS DOUBLE)
      ELSE (CAST(a AS DOUBLE) / CAST(n_a AS DOUBLE)
          - CAST(b AS DOUBLE) / CAST(n_b AS DOUBLE))
        * ln((CAST(a AS DOUBLE) / CAST(n_a AS DOUBLE))
           / (CAST(b AS DOUBLE) / CAST(n_b AS DOUBLE))) END"""
}
