package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 30: Heaps'-law vocabulary-growth fit (the sizing law
  * q119's Zipf fit is dual to), lagged cross-correlation between two
  * event series (does one stream LEAD the other — the causal-ordering
  * read q287's ACF can't give), and an AMS F2 sketch with its exact
  * audit (the sketched self-join-size estimator behind q165's
  * exact forecaster).
  *
  * House rules as elsewhere: integer/128-bit arithmetic at every gate,
  * micro-ln per transcendental term, the identical final double
  * formula on both engines for fits/ratios, total ORDER BY.
  */
object Round8adQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- Heaps'-law vocabulary growth fit -------------------------------
    // V(N) ≈ K·N^β — how fast vocabulary grows with corpus size, THE
    // input to q215-style vocab sizing and BPE budget decisions (β≈0.5
    // for natural text; this generator's closed vocabulary should read
    // much lower — the diagnostic exists to catch exactly that). The
    // growth curve is measured at 16 doc_id-threshold checkpoints:
    // per-doc token totals and per-doc first-seen vocabulary gains
    // (min first_doc per token) collapse the corpus to |docs| metadata
    // rows ONCE, and the 16 checkpoint sums are a broadcast grid join
    // over that compacted table — no corpus-sized window, no
    // re-tokenization per checkpoint. Checkpoints are GEOMETRIC
    // (doc_id thresholds mxid >> (16−k)) — vocabulary growth lives at
    // the small end, and a linear grid on a closed vocabulary lands
    // every point on the plateau (y-variance exactly 0, the r² 0/0 —
    // found the hard way at sf0.01). The OLS runs over 16 micro-ln
    // points in exact integer sums (the q119 rule: no regr_* builtins),
    // with the identical final double formula on both engines; a
    // zero-variance plateau reads r² = 1 by the no-residual convention.
    ("q306_heaps_fit", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", explode(split(TA.normText($"text"), " ")).as("tok"))
        .localCheckpoint() // reused: per-doc totals + first-occurrence vocab
      val perDoc = toks.groupBy($"doc_id").agg(count(lit(1)).as("nt"))
      val firstSeen = toks.groupBy($"tok").agg(min($"doc_id").as("fd"))
        .groupBy($"fd").agg(count(lit(1)).as("nv"))
      val mx = perDoc.agg(max($"doc_id").as("mxid"))
      val grid = s.range(1, 17).select($"id".as("k"))
        .crossJoin(broadcast(mx))
        .select($"k", expr("shiftright(mxid, CAST(16 - k AS INT))").as("thr"))
      val nk = grid.join(perDoc, $"doc_id" <= $"thr")
        .groupBy($"k").agg(sum($"nt").as("nn"))
      val vk = grid.join(firstSeen, $"fd" <= $"thr")
        .groupBy($"k").agg(sum($"nv").as("vv"))
      nk.join(vk, Seq("k"))
        .select(
          floor(log($"nn".cast("double")) * 1e6 + 0.5).cast("long").as("lx"),
          floor(log($"vv".cast("double")) * 1e6 + 0.5).cast("long").as("ly"))
        .agg(count(lit(1)).as("n"), sum($"lx").as("sx"), sum($"ly").as("sy"),
          sum($"lx" * $"lx").as("sxx"), sum($"lx" * $"ly").as("sxy"),
          sum($"ly" * $"ly").as("syy"))
        .select($"n".cast("long").as("n_points"),
          round((($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
            ($"n" * $"sxx" - $"sx" * $"sx").cast("double")), 6)
            .as("heaps_beta"),
          when(expr("n * syy - sy * sy = 0"), lit(1.0))
            .otherwise(round((($"n" * $"sxy" - $"sx" * $"sy").cast("double") *
              ($"n" * $"sxy" - $"sx" * $"sy").cast("double")) /
              (($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
                ($"n" * $"syy" - $"sy" * $"sy").cast("double")), 6))
            .as("heaps_r2"))
    }, Some(s"""
      WITH toks AS (SELECT doc_id,
          unnest(string_split($normSql, ' ')) AS tok FROM documents),
      perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nt
        FROM toks GROUP BY 1),
      firstseen AS (SELECT fd, CAST(count(*) AS BIGINT) AS nv FROM
        (SELECT tok, min(doc_id) AS fd FROM toks GROUP BY 1) GROUP BY 1),
      mx AS (SELECT max(doc_id) AS mxid FROM perdoc),
      grid AS (SELECT CAST(k AS BIGINT) AS k, mxid >> (16 - k) AS thr
        FROM (SELECT unnest(range(1, 17)) AS k) CROSS JOIN mx),
      nk AS (SELECT g.k, CAST(sum(p.nt) AS BIGINT) AS nn
        FROM grid g JOIN perdoc p ON p.doc_id <= g.thr GROUP BY 1),
      vk AS (SELECT g.k, CAST(sum(f.nv) AS BIGINT) AS vv
        FROM grid g JOIN firstseen f ON f.fd <= g.thr GROUP BY 1),
      fixed AS (SELECT
          CAST(floor(ln(CAST(nn AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lx,
          CAST(floor(ln(CAST(vv AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS ly
        FROM nk JOIN vk USING (k)),
      sums AS (SELECT count(*) AS n, sum(lx) AS sx, sum(ly) AS sy,
          sum(lx * lx) AS sxx, sum(lx * ly) AS sxy, sum(ly * ly) AS syy
        FROM fixed)
      SELECT CAST(n AS BIGINT) AS n_points,
        round(CAST(n * sxy - sx * sy AS DOUBLE)
          / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS heaps_beta,
        CASE WHEN n * syy - sy * sy = 0 THEN 1.0
          ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
            * CAST(n * sxy - sx * sy AS DOUBLE)
            / (CAST(n * sxx - sx * sx AS DOUBLE)
               * CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS heaps_r2
      FROM sums""")),

    // ----- lagged cross-correlation between two event series --------------
    // q287 asks whether a series predicts ITSELF; this asks whether one
    // stream LEADS another: the cross-correlation of daily error-counts
    // against daily purchase-value at lags −3..+3. A peak at positive
    // lag says errors precede purchase shifts — the incident-impact
    // read an ops dashboard wants. Same scale shape as q287: the corpus
    // collapses to the day grid first, centering is exact by scaling
    // (n·x_t − S), the 7 lags ride ONE equi-join against a broadcast
    // lag table, products in 128-bit, and the sqrt-normalized ratio is
    // the identical final double formula on both engines over 7 rows.
    // CCF convention: full-series means/variances, pairwise-complete
    // overlap sums.
    ("q307_cross_correlation", (s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables.t(s, dir, "events")
        .select(datediff(to_date($"ts".cast("timestamp")),
          lit("1970-01-01").cast("date")).cast("long").as("epd"),
          $"event_type",
          floor($"value" + 0.5).cast("long").as("v"))
      val daily = ev.groupBy($"epd").agg(
          sum(when($"event_type" === "error", 1L).otherwise(0L)).as("a"),
          sum(when($"event_type" === "purchase", $"v").otherwise(0L)).as("b"))
        .localCheckpoint() // reused: moments + both sides of the lag join
      val m = daily.agg(count(lit(1)).as("n"), sum($"a").as("sa"),
        sum($"b").as("sb"))
      val centered = daily.crossJoin(broadcast(m))
        .select($"epd", ($"n" * $"a" - $"sa").as("ca"),
          ($"n" * $"b" - $"sb").as("cb"))
        .localCheckpoint()
      val dens = centered.agg(
        sum(expr("CAST(ca AS DECIMAL(38,0)) * ca")).as("da"),
        sum(expr("CAST(cb AS DECIMAL(38,0)) * cb")).as("db"))
      val lags = (-3L to 3L).map(l => Tuple1(l)).toDF("lag")
      val pairs = centered.select($"epd", $"ca").crossJoin(broadcast(lags))
        .withColumn("tgt", $"epd" + $"lag")
        .join(centered.select($"epd".as("tgt"), $"cb"), Seq("tgt"))
      pairs.groupBy($"lag")
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("CAST(ca AS DECIMAL(38,0)) * cb")).as("num"))
        .crossJoin(broadcast(dens))
        .select($"lag", $"n_pairs",
          expr("""CAST(floor(CAST(num AS DOUBLE)
              / sqrt(CAST(da AS DOUBLE) * CAST(db AS DOUBLE))
              * 1000000 + 0.5) AS BIGINT)""").as("ccf_micro"))
        .orderBy($"lag")
    }, Some("""
      WITH daily AS (SELECT
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS epd,
          CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS a,
          CAST(sum(CASE WHEN event_type = 'purchase'
            THEN CAST(floor(value + 0.5) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS b
        FROM events GROUP BY 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(a) AS BIGINT)
          AS sa, CAST(sum(b) AS BIGINT) AS sb FROM daily),
      centered AS (SELECT d.epd, m.n * d.a - m.sa AS ca,
          m.n * d.b - m.sb AS cb FROM daily d CROSS JOIN m),
      dens AS (SELECT sum(CAST(ca AS HUGEINT) * ca) AS da,
          sum(CAST(cb AS HUGEINT) * cb) AS db FROM centered),
      lags(lag) AS (VALUES (CAST(-3 AS BIGINT)), (-2), (-1), (0), (1),
        (2), (3)),
      pairs AS (SELECT l.lag, x.ca, y.cb
        FROM centered x CROSS JOIN lags l
        JOIN centered y ON y.epd = x.epd + l.lag)
      SELECT p.lag, CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(floor(CAST(sum(CAST(p.ca AS HUGEINT) * p.cb) AS DOUBLE)
          / sqrt(CAST(d.da AS DOUBLE) * CAST(d.db AS DOUBLE))
          * 1000000 + 0.5) AS BIGINT) AS ccf_micro
      FROM pairs p CROSS JOIN dens d GROUP BY p.lag, d.da, d.db
      ORDER BY p.lag""")),

    // ----- AMS F2 sketch + exact audit ------------------------------------
    // F2 = Σ_tok f² is the self-join size — the quantity q165 forecasts
    // EXACTLY from per-key counts. The AMS sketch (Alon–Matias–Szegedy)
    // estimates it in constant space: 8 independent ±1-hash counters
    // Z_j = Σ_occurrences s_j(tok), each Z_j² an unbiased F2 estimate.
    // Counters are mergeable sums — map-side combine collapses each
    // partition to 8 cells, so the sketch costs one 8×-fanout pass and
    // shuffles 8 rows — while the exact audit is the full groupBy(tok).
    // Both estimates reported (mean of 8, median via the sorted middle
    // pair) with signed micro relative errors; integer throughout
    // (f ≤ 2^31 keeps Z² in Int64; the 100 TB form lifts Z² to
    // DECIMAL(38,0) as elsewhere).
    ("q308_ams_f2_sketch", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select(explode(split(TA.normText($"text"), " ")).as("tok"))
        .localCheckpoint() // reused: exact F2 + the 8-counter sketch pass
      val exact = toks.groupBy($"tok").agg(count(lit(1)).as("f"))
        .agg(sum($"f" * $"f").as("f2_exact"))
      val sk = s.range(8).select($"id".as("j"))
      val counters = toks.crossJoin(broadcast(sk))
        .select($"j",
          (conv(substring(md5(concat($"j".cast("string"), lit("|"), $"tok")),
            1, 8), 16, 10).cast("long") % 2 * 2 - 1).as("sgn"))
        .groupBy($"j").agg(sum($"sgn").as("z"))
        .select($"j", ($"z" * $"z").as("z2"))
        .localCheckpoint() // reused: mean + the sorted-middle median
      val mean = counters.agg(expr("sum(z2) div 8").as("est_mean"))
      val med = counters
        .withColumn("r", row_number().over(Window.orderBy($"z2", $"j")))
        .filter($"r" === 4 || $"r" === 5)
        .agg(expr("sum(z2) div 2").as("est_median"))
      // signed errors go through the double-floor form — integer div
      // truncates in Spark but floors in DuckDB on negatives
      exact.crossJoin(broadcast(mean)).crossJoin(broadcast(med))
        .select($"f2_exact", $"est_mean", $"est_median",
          expr("""CAST(floor(CAST(est_mean - f2_exact AS DOUBLE)
              / CAST(f2_exact AS DOUBLE) * 1000000 + 0.5) AS BIGINT)""")
            .as("err_mean_micro"),
          expr("""CAST(floor(CAST(est_median - f2_exact AS DOUBLE)
              / CAST(f2_exact AS DOUBLE) * 1000000 + 0.5) AS BIGINT)""")
            .as("err_median_micro"))
    }, Some(s"""
      WITH toks AS (SELECT unnest(string_split($normSql, ' ')) AS tok
        FROM documents),
      exact AS (SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact FROM
        (SELECT CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY tok)),
      sk AS (SELECT CAST(j AS BIGINT) AS j
        FROM (SELECT unnest(range(8)) AS j)),
      counters AS (SELECT j, z * z AS z2 FROM
        (SELECT sk.j, CAST(sum(
            ('0x' || substr(md5(CAST(sk.j AS VARCHAR) || '|' || tok), 1, 8))
              ::BIGINT % 2 * 2 - 1) AS BIGINT) AS z
         FROM toks CROSS JOIN sk GROUP BY 1)),
      mean AS (SELECT CAST(sum(z2) // 8 AS BIGINT) AS est_mean
        FROM counters),
      med AS (SELECT CAST(sum(z2) // 2 AS BIGINT) AS est_median FROM
        (SELECT z2, row_number() OVER (ORDER BY z2, j) AS r FROM counters)
        WHERE r = 4 OR r = 5)
      SELECT exact.f2_exact, mean.est_mean, med.est_median,
        CAST(floor(CAST(mean.est_mean - exact.f2_exact AS DOUBLE)
          / CAST(exact.f2_exact AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
          AS err_mean_micro,
        CAST(floor(CAST(med.est_median - exact.f2_exact AS DOUBLE)
          / CAST(exact.f2_exact AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
          AS err_median_micro
      FROM exact CROSS JOIN mean CROSS JOIN med"""))
  )
}
