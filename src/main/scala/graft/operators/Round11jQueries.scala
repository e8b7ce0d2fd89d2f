package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 10: the robust-inference completions — Poisson
  * overdispersion audit (is a count column really Poisson before any
  * rate model trusts it), OLS influence diagnostics (which days BEND
  * the q80-style trend line), and Holm–Bonferroni step-down (the FWER
  * dual of q359's BH step-up, over the LITERALLY shared permutation
  * p-value table).
  *
  * Float discipline: q398 is exact integer micro-units end to end;
  * q399 computes every residual/leverage numerator in DECIMAL(38,0)
  * and runs one double chain per day-grid row (SSE folded in day
  * order); q400 inherits q359's exact permutation ranks.
  */
object Round11jQueries {

  type QFn = (SparkSession, String) => DataFrame

  private val EpdSpark =
    """datediff(to_date(CAST(ts AS TIMESTAMP)), DATE '1970-01-01')"""
  private val EpdSql =
    """CAST(date_diff('day', DATE '1970-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT)"""

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- Poisson overdispersion audit ------------------------------------
    // Every rate-based monitor (q319's SPRT, q320's intervals) assumes
    // the daily event counts are Poisson-ish; clumped traffic
    // (var >> mean) silently breaks their error guarantees. The
    // dispersion index D = s²/x̄ per event type, EXACT:
    // D_micro = (n·Σc² − S²)·10⁶ div ((n−1)·S) in DECIMAL(38,0) —
    // D > 1 ⟺ overdispersed is an integer comparison, no double
    // anywhere. One day-grid aggregate per type; the type table is the
    // only thing that leaves the executors.
    ("q398_overdispersion", (s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.t(s, dir, "events")
        .select($"event_type", expr(EpdSpark).cast("long").as("epd"))
        .groupBy($"event_type", $"epd").agg(count(lit(1)).as("c"))
      daily.groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"), sum($"c").as("total"),
          sum($"c".cast("decimal(38,0)") * $"c").as("q2"))
        .withColumn("d_micro", expr(
          """CASE WHEN n_days < 2 THEN NULL ELSE
             (n_days * q2 - CAST(total AS DECIMAL(38,0)) * total) * 1000000
               div ((n_days - 1) * CAST(total AS DECIMAL(38,0))) END"""))
        .select($"event_type", $"n_days", $"total", $"d_micro",
          ($"d_micro" > 1000000L).cast("long").as("overdispersed"))
        .orderBy($"event_type")
    }, Some(s"""
      WITH daily AS (SELECT event_type, $EpdSql AS epd,
          CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
          CAST(sum(c) AS BIGINT) AS total,
          sum(CAST(c AS HUGEINT) * c) AS q2
        FROM daily GROUP BY 1),
      d2 AS (SELECT event_type, n_days, total,
          CASE WHEN n_days < 2 THEN NULL ELSE
            (n_days * q2 - CAST(total AS HUGEINT) * total) * 1000000
              // ((n_days - 1) * CAST(total AS HUGEINT)) END AS d_micro
        FROM ag)
      SELECT event_type, n_days, total, CAST(d_micro AS BIGINT) AS d_micro,
        CAST(CASE WHEN d_micro IS NULL THEN NULL
          WHEN d_micro > 1000000 THEN 1 ELSE 0 END AS BIGINT) AS overdispersed
      FROM d2 ORDER BY event_type""")),

    // ----- OLS influence diagnostics (Cook's distance) ---------------------
    // q80 fits trend lines and q361 makes the slope robust; this asks
    // WHICH observations bend the fit — the day whose removal moves
    // the line most. For daily counts vs day index: leverage
    // h_i = 1/n + xc_i²/Sxx (xc = n·x − Sx cleared integers, Sxx =
    // Σxc²), residual e_i = (yc_i·Sxx − Sxy·xc_i)/(n·Sxx) with an
    // exact DECIMAL numerator, SSE folded in day order, Cook's
    // D_i = e_i²·h_i / (2·s²·(1−h_i)²). Top-5 days by (D, epd) —
    // identical doubles from identical integers on both engines. The
    // whole computation lives on the bounded day grid.
    ("q399_regression_influence", (s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.t(s, dir, "events")
        .select(expr(EpdSpark).cast("long").as("epd"))
        .groupBy($"epd").agg(count(lit(1)).as("c"))
        .localCheckpoint() // reused: moments + per-day terms
      val m = daily.agg(count(lit(1)).as("n"), sum($"epd").as("sx"),
        sum($"c").as("sy"))
      val cent = daily.crossJoin(broadcast(m))
        .select($"epd", $"c", $"n",
          ($"n" * $"epd" - $"sx").as("xc"), ($"n" * $"c" - $"sy").as("yc"))
        .localCheckpoint()
      val mom = cent.agg(
        sum($"xc".cast("decimal(38,0)") * $"xc").as("sxx"),
        sum($"xc".cast("decimal(38,0)") * $"yc").as("sxy"))
      val terms = cent.crossJoin(broadcast(mom))
        .withColumn("en", ($"yc".cast("decimal(38,0)") * $"sxx"
          - $"sxy" * $"xc"))
        .withColumn("e", expr(
          "CAST(en AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE))"))
        .withColumn("h", expr(
          """1.0 / CAST(n AS DOUBLE)
             + CAST(CAST(xc AS DECIMAL(38,0)) * xc AS DOUBLE) / CAST(sxx AS DOUBLE)"""))
      val sse = terms.agg(expr(
        """aggregate(array_sort(collect_list(struct(epd, e))),
           CAST(0.0 AS DOUBLE), (acc, t) -> acc + t.e * t.e)""").as("sse"),
        max($"n").as("nn"))
      terms.crossJoin(broadcast(sse))
        .withColumn("s2", expr("sse / (CAST(nn AS DOUBLE) - 2.0)"))
        .withColumn("cook_d", expr(
          "e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))"))
        .select($"epd", $"c", $"h".as("leverage"), $"cook_d")
        .orderBy($"cook_d".desc, $"epd").limit(5)
    }, Some(s"""
      WITH daily AS (SELECT $EpdSql AS epd, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(epd) AS BIGINT) AS sx,
          CAST(sum(c) AS BIGINT) AS sy FROM daily),
      cent AS (SELECT epd, c, n, n * epd - sx AS xc, n * c - sy AS yc
        FROM daily, m),
      mom AS (SELECT sum(CAST(xc AS HUGEINT) * xc) AS sxx,
          sum(CAST(xc AS HUGEINT) * yc) AS sxy FROM cent),
      tm AS (SELECT epd, c, n,
          CAST(CAST(yc AS HUGEINT) * sxx - sxy * xc AS DOUBLE)
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)) AS e,
          1.0 / CAST(n AS DOUBLE)
            + CAST(CAST(xc AS HUGEINT) * xc AS DOUBLE) / CAST(sxx AS DOUBLE) AS h
        FROM cent, mom),
      ss AS (SELECT list_reduce(list(e * e ORDER BY epd), (a, b) -> a + b) AS sse,
          max(n) AS nn FROM tm)
      SELECT epd, c, h AS leverage,
        e * e * h / (2.0 * (sse / (CAST(nn AS DOUBLE) - 2.0)) * (1.0 - h) * (1.0 - h))
          AS cook_d
      FROM tm, ss ORDER BY cook_d DESC, epd LIMIT 5""")),

    // ----- Holm–Bonferroni step-down ---------------------------------------
    // q359's BH controls the FALSE DISCOVERY RATE (a fraction of
    // rejections may be wrong — fine for screening); Holm controls the
    // FAMILY-WISE error rate (probability of even ONE false rejection
    // — what a "these sources shifted" report to stakeholders needs),
    // over the LITERALLY shared fdrPvals/FdrPvalSql permutation table
    // so the two procedures can never see different p-values.
    // Step-DOWN: reject p_(k) while p_(j) ≤ α/(m−j+1) for all j ≤ k;
    // the first failure stops everything after it. Always a subset of
    // BH's rejections at the same α — spec-pinned.
    ("q400_holm_fwer", (s: SparkSession, dir: String) => {
      import s.implicits._
      val wRank = Window.partitionBy(lit(0)).orderBy($"p", $"source")
      val wAll = Window.partitionBy(lit(0))
      Round11bQueries.fdrPvals(s, dir)
        .withColumn("krank", row_number().over(wRank).cast("long"))
        .withColumn("m", count(lit(1)).over(wAll))
        .withColumn("fail", expr(
          "CASE WHEN p > 0.1 / CAST(m - krank + 1 AS DOUBLE) THEN krank ELSE NULL END"))
        .withColumn("first_fail", min($"fail").over(wAll))
        .select($"source", $"nx".as("n_docs"), $"p", $"krank",
          ($"krank" < coalesce($"first_fail", $"m" + 1)).as("rejected"))
        .orderBy($"source")
    }, Some(s"""
      WITH ${Round11bQueries.FdrPvalSql},
      rk AS (SELECT *,
          CAST(row_number() OVER (ORDER BY p, source) AS BIGINT) AS krank,
          CAST(count(*) OVER () AS BIGINT) AS m
        FROM pv),
      fl AS (SELECT *,
          min(CASE WHEN p > 0.1 / CAST(m - krank + 1 AS DOUBLE)
            THEN krank ELSE NULL END) OVER () AS first_fail
        FROM rk)
      SELECT source, nx AS n_docs, p, krank,
        (krank < coalesce(first_fail, m + 1)) AS rejected
      FROM fl ORDER BY source"""))
  )
}
