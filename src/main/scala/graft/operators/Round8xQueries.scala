package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 24: autocorrelation of the daily series, a one-step
  * logistic GLM fit in exact integers, effective-sample-size
  * diagnostics for weighted data, and cold-start coverage of the CF
  * neighbor graph — time-series memory, an exact distributed GLM
  * iteration, and two production diagnostics.
  *
  * House rules as elsewhere: integer arithmetic at every gate, 128-bit
  * (DECIMAL(38,0)/HUGEINT) for moment products; centering multiplies
  * through by n instead of dividing (no fractional means anywhere).
  * Identical aliases both sides, total ORDER BY.
  */
object Round8xQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- autocorrelation function, lags 1..7 ----------------------------
    // Does today predict next week? The ACF at daily lags 1..7 over the
    // event-value series — the memory diagnostic that decides between
    // q223's naive and seasonal-naive forecasters and validates q270's
    // weekly decomposition. Centering is done EXACTLY by scaling:
    // c_t = n·x_t − S is an integer, ACF_L = Σ c_t·c_{t+L} / Σ c_t²
    // needs no fractional mean; lag pairing is an equi-join on the
    // |days| grid shifted by L (a 7-row lag table cross-joined, ONE
    // join for all lags). Products in 128-bit. Metadata-scale after
    // the daily pre-aggregate — the q229/q259 shape.
    ("q287_acf_daily", (s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.t(s, dir, "events")
        .select(datediff(to_date($"ts".cast("timestamp")),
          lit("1970-01-01").cast("date")).cast("long").as("epd"),
          floor($"value" + 0.5).cast("long").as("v"))
        .groupBy($"epd").agg(sum($"v").as("dv"))
        .localCheckpoint() // reused: moments + both sides of the lag join
      val m = daily.agg(count(lit(1)).as("n"), sum($"dv").as("sv"))
      val centered = daily.crossJoin(broadcast(m))
        .select($"epd", ($"n" * $"dv" - $"sv").as("c"))
        .localCheckpoint()
      val den = centered.agg(
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("den"))
      val lags = (1L to 7L).map(l => Tuple1(l)).toDF("lag")
      val pairs = centered.toDF("epd", "c1").crossJoin(broadcast(lags))
        .withColumn("tgt", $"epd" + $"lag")
        .join(centered.toDF("tgt", "c2"), Seq("tgt"))
      pairs.groupBy($"lag")
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("CAST(c1 AS DECIMAL(38,0)) * c2")).as("num"))
        .crossJoin(broadcast(den))
        .select($"lag", $"n_pairs",
          expr("CAST(1000000 * num div den AS BIGINT)").as("acf_micro"))
        .orderBy($"lag")
    }, Some("""
      WITH daily AS (SELECT
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS epd,
          CAST(sum(CAST(floor(value + 0.5) AS BIGINT)) AS BIGINT) AS dv
        FROM events GROUP BY 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dv) AS BIGINT) AS sv
        FROM daily),
      centered AS (SELECT d.epd, m.n * d.dv - m.sv AS c
        FROM daily d CROSS JOIN m),
      den AS (SELECT sum(CAST(c AS HUGEINT) * c) AS den FROM centered),
      lags(lag) AS (VALUES (CAST(1 AS BIGINT)), (2), (3), (4), (5), (6), (7)),
      pairs AS (SELECT l.lag, a.c AS c1, b.c AS c2
        FROM centered a CROSS JOIN lags l
        JOIN centered b ON b.epd = a.epd + l.lag)
      SELECT p.lag, CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(1000000 * sum(CAST(p.c1 AS HUGEINT) * p.c2) // d.den AS BIGINT)
          AS acf_micro
      FROM pairs p CROSS JOIN den d GROUP BY p.lag, d.den ORDER BY p.lag""")),

    // ----- one-step logistic regression (Fisher scoring from null) --------
    // A distributed GLM iteration with NO floating-point reduction:
    // starting from β = 0 the logistic Fisher-scoring step has weight
    // matrix W = ¼I and working response y − ½ exactly, so the first
    // Newton step β = 4(X'X)⁻¹X'(y − ½) is a RATIONAL function of five
    // integer moments (n, Σx, Σx², Σy, Σxy) — the 2×2 inverse in
    // closed form, halves cleared by doubling. One aggregate pass
    // computes the moments; the coefficient (nano-scaled, 128-bit
    // numerators) answers "does token count predict English?" with the
    // exact sign and magnitude any GLM library's first iteration would
    // produce. The template for distributed GLMs: moments shuffle,
    // never rows.
    ("q288_logistic_one_step", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.spread(Tables.t(s, dir, "documents"))
        .select(($"lang" === "en").cast("long").as("y"),
          TA.normText($"text").as("nt"))
        .select($"y", when($"nt" === "", lit(0L))
          .otherwise(size(split($"nt", " ")).cast("long")).as("x"))
      val mom = d.agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum($"y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      mom.select($"n", $"sx", $"sy",
          expr("CAST(sxx AS BIGINT)").as("sxx"),
          expr("CAST(sxy AS BIGINT)").as("sxy"),
          // a2 = 2Σz, b2 = 2Σxz with z = y − ½;
          // det = n·Σx² − (Σx)²; β = 2·adj·[a2 b2] / det, nano-scaled
          expr("""CAST(2000000000 * (sxx * CAST(2 * sy - n AS DECIMAL(38,0))
            - CAST(sx AS DECIMAL(38,0)) * (2 * sxy - sx))
            div (CAST(n AS DECIMAL(38,0)) * sxx
            - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)""").as("b0_nano"),
          expr("""CAST(2000000000 * (CAST(n AS DECIMAL(38,0)) * (2 * sxy - sx)
            - CAST(sx AS DECIMAL(38,0)) * (2 * sy - n))
            div (CAST(n AS DECIMAL(38,0)) * sxx
            - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)""").as("b1_nano"))
    }, Some(s"""
      WITH d AS (SELECT
          CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y,
          CASE WHEN $normSql = '' THEN 0
            ELSE CAST(len(string_split($normSql, ' ')) AS BIGINT) END AS x
        FROM documents),
      mom AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
          sum(CAST(x AS HUGEINT) * x) AS sxx, CAST(sum(y) AS BIGINT) AS sy,
          sum(CAST(x AS HUGEINT) * y) AS sxy
        FROM d)
      SELECT n, sx, sy, CAST(sxx AS BIGINT) AS sxx, CAST(sxy AS BIGINT) AS sxy,
        CAST(2000000000 * (sxx * CAST(2 * sy - n AS HUGEINT)
          - CAST(sx AS HUGEINT) * (2 * sxy - sx))
          // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT)
          AS b0_nano,
        CAST(2000000000 * (CAST(n AS HUGEINT) * (2 * sxy - sx)
          - CAST(sx AS HUGEINT) * (2 * sy - n))
          // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT)
          AS b1_nano
      FROM mom""")),

    // ----- effective sample size of a weighting scheme --------------------
    // Every importance-weighted pipeline (q190's DSIR reweighting, any
    // mixture temperature) should report Kish's ESS = (Σw)²/Σw² — the
    // number of EQUIVALENT unweighted samples the weighted set is
    // worth. Computed here for length-proportional sampling weights,
    // per source and overall: a low ess_ratio says the weights
    // concentrate on few documents and downstream variance will blow
    // up. Two moments per group, 128-bit, one scan — the diagnostic is
    // cheaper than the mistake it prevents.
    ("q289_effective_sample_size", (s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", TA.normText($"text").as("nt"))
        .select($"source", when($"nt" === "", lit(1L))
          .otherwise(size(split($"nt", " ")).cast("long") + 1L).as("w"))
      val per = w.groupBy($"source")
        .agg(count(lit(1)).as("n"), sum($"w").as("sw"),
          sum(expr("CAST(w AS DECIMAL(38,0)) * w")).as("sw2"))
        .select($"source", $"n",
          expr("CAST(CAST(sw AS DECIMAL(38,0)) * sw div sw2 AS BIGINT)")
            .as("ess"),
          expr("""CAST(1000000 * (CAST(sw AS DECIMAL(38,0)) * sw div sw2)
            div n AS BIGINT)""").as("ess_ratio_micro"))
      val overall = w.agg(count(lit(1)).as("n"), sum($"w").as("sw"),
          sum(expr("CAST(w AS DECIMAL(38,0)) * w")).as("sw2"))
        .select(lit("__overall__").as("source"), $"n",
          expr("CAST(CAST(sw AS DECIMAL(38,0)) * sw div sw2 AS BIGINT)")
            .as("ess"),
          expr("""CAST(1000000 * (CAST(sw AS DECIMAL(38,0)) * sw div sw2)
            div n AS BIGINT)""").as("ess_ratio_micro"))
      per.unionByName(overall).orderBy($"source")
    }, Some(s"""
      WITH w AS (SELECT source,
          CASE WHEN $normSql = '' THEN 1
            ELSE CAST(len(string_split($normSql, ' ')) AS BIGINT) + 1 END AS w
        FROM documents),
      per AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(w) AS BIGINT) AS sw, sum(CAST(w AS HUGEINT) * w) AS sw2
        FROM w GROUP BY 1),
      ov AS (SELECT '__overall__' AS source, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(w) AS BIGINT) AS sw, sum(CAST(w AS HUGEINT) * w) AS sw2
        FROM w),
      u AS (SELECT * FROM per UNION ALL SELECT * FROM ov)
      SELECT source, n,
        CAST(CAST(sw AS HUGEINT) * sw // sw2 AS BIGINT) AS ess,
        CAST(1000000 * (CAST(sw AS HUGEINT) * sw // sw2) // n AS BIGINT)
          AS ess_ratio_micro
      FROM u ORDER BY source""")),

    // ----- CF cold-start coverage -----------------------------------------
    // The recommender-quality read on top of q275: what share of items
    // in each support band has enough (≥3) sufficiently-similar
    // (cosine ≥ 0.05 — tuned to this co-purchase density; on retail
    // data it would be 0.1–0.3) neighbors to recommend from? Low-support items
    // with no neighbors are the cold-start set a content-based
    // fallback must cover — this query sizes that set exactly. Pair
    // counts and supports as in q275; the map-side cosine gate, one
    // per-item rollup, one band rollup. All |items|-bounded beyond the
    // pair counting.
    ("q290_cf_cold_start", (s: SparkSession, dir: String) => {
      import s.implicits._
      val items = Tables.t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      val sup = items.groupBy($"pk").agg(count(lit(1)).as("c"))
      val pairs = items.toDF("ok", "a").join(items.toDF("ok", "b"), Seq("ok"))
        .filter($"a" < $"b")
        .groupBy($"a", $"b").agg(count(lit(1)).as("cab"))
      val sym = pairs.unionByName(pairs.select($"b".as("a"), $"a".as("b"), $"cab"))
      val good = sym
        .join(sup.select($"pk".as("a"), $"c".as("ca")), Seq("a"))
        .join(sup.select($"pk".as("b"), $"c".as("cb")), Seq("b"))
        .filter(expr(
          """1000000 * CAST(cab AS DOUBLE)
             / sqrt(CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)) >= 50000"""))
        .groupBy($"a".as("pk")).agg(count(lit(1)).as("n_nb"))
      sup.join(good, Seq("pk"), "left")
        .select($"pk", $"c", coalesce($"n_nb", lit(0L)).as("n_nb"))
        .withColumn("band", expr(
          "CASE WHEN c >= 32 THEN 'c_head' WHEN c >= 25 THEN 'b_mid' ELSE 'a_tail' END"))
        .groupBy($"band")
        .agg(count(lit(1)).as("n_items"),
          sum(when($"n_nb" >= 3, 1L).otherwise(0L)).as("n_covered"),
          sum($"n_nb").as("nb_sum"))
        .select($"band", $"n_items", $"n_covered",
          expr("1000000 * n_covered div n_items").as("coverage_micro"),
          expr("1000000 * nb_sum div n_items").as("avg_nb_micro"))
        .orderBy($"band")
    }, Some("""
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        FROM lineitem),
      sup AS (SELECT pk, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY 1),
      pairs AS (SELECT a.pk AS a, b.pk AS b, CAST(count(*) AS BIGINT) AS cab
        FROM items a JOIN items b ON a.ok = b.ok WHERE a.pk < b.pk GROUP BY 1, 2),
      sym AS (SELECT a, b, cab FROM pairs UNION ALL SELECT b, a, cab FROM pairs),
      good AS (SELECT s.a AS pk, CAST(count(*) AS BIGINT) AS n_nb
        FROM sym s JOIN sup ca ON s.a = ca.pk JOIN sup cb ON s.b = cb.pk
        WHERE 1000000 * CAST(s.cab AS DOUBLE)
          / sqrt(CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) >= 50000
        GROUP BY 1),
      j AS (SELECT sup.pk, sup.c, coalesce(g.n_nb, 0) AS n_nb,
          CASE WHEN sup.c >= 32 THEN 'c_head' WHEN sup.c >= 25 THEN 'b_mid'
            ELSE 'a_tail' END AS band
        FROM sup LEFT JOIN good g ON sup.pk = g.pk)
      SELECT band, CAST(count(*) AS BIGINT) AS n_items,
        CAST(sum(CASE WHEN n_nb >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        CAST(1000000 * sum(CASE WHEN n_nb >= 3 THEN 1 ELSE 0 END) // count(*)
          AS BIGINT) AS coverage_micro,
        CAST(1000000 * sum(n_nb) // count(*) AS BIGINT) AS avg_nb_micro
      FROM j GROUP BY 1 ORDER BY 1"""))
  )
}
