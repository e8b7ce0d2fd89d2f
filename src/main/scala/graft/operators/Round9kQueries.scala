package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-9 batch 11 (index-vetted): a distribution-free confidence
  * interval for the median (the order-statistic CI — q320's Wilson
  * intervals cover proportions, nothing covered quantiles), the
  * retention half-life fit (q90 reports the cohort matrix; this fits
  * the decay LAW and reports the one number a growth model consumes),
  * and a Flesch-style readability gate (the classic curation signal
  * the q17 length/punct heuristics don't capture).
  *
  * House rules as elsewhere: integer micro/milli arithmetic, micro-ln
  * per factor, the sqrt on a single scalar row, identical aliases
  * both sides, total ORDER BY.
  */
object Round9kQueries {

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- distribution-free median confidence interval ---------------------
    // Reporting a median without an interval invites the q320 mistake
    // at the quantile level. The order-statistic CI needs NO
    // distributional assumption: by the sign argument, ranks
    // l = max(1, floor((n − 1.96√n)/2)) and
    // u = min(n, ceil((n + 1.96√n)/2) + 1) cover the true median with
    // ~95% probability (large-sample binomial(n, ½) normal
    // approximation — the convention stated, not hidden). The three
    // order statistics read off ONE cents value-grid cumulative (the
    // q195 bound); the sqrt runs once on the scalar n with the
    // identical expression in both engines.
    ("q349_median_ci", (s: SparkSession, dir: String) => {
      import s.implicits._
      val c = Tables.t(s, dir, "orders")
        .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v"))
      val n = c.agg(count(lit(1)).as("n"))
        .select($"n",
          expr("""greatest(CAST(1 AS BIGINT), CAST(floor(
              (n - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT))""")
            .as("lo_rank"),
          expr("""least(n, CAST(ceil(
              (n + 1.96 * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT) + 1)""")
            .as("hi_rank"))
      val cumGrid = graft.ext.GridCumulative.withRunningTotal(
        c.groupBy($"v").agg(count(lit(1)).as("cnt")), "v", "cnt", "cum")
      cumGrid
        .crossJoin(broadcast(n))
        .agg(max($"n").as("n_rows"), max($"lo_rank").as("lo_rank"),
          max($"hi_rank").as("hi_rank"),
          min(when($"cum" >= expr("(n + 1) div 2"), $"v"))
            .as("median_cents"),
          min(when($"cum" >= $"lo_rank", $"v")).as("ci_lo_cents"),
          min(when($"cum" >= $"hi_rank", $"v")).as("ci_hi_cents"))
    }, Some("""
      WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        FROM orders),
      n AS (SELECT n,
          greatest(CAST(1 AS BIGINT), CAST(floor(
            (n - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT)) AS lo_rank,
          least(n, CAST(ceil(
            (n + 1.96 * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT) + 1)
            AS hi_rank
        FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM c)),
      g AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
          CAST(sum(count(*)) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum
        FROM c GROUP BY v)
      SELECT max(n.n) AS n_rows, max(n.lo_rank) AS lo_rank,
        max(n.hi_rank) AS hi_rank,
        min(CASE WHEN cum >= (n.n + 1) // 2 THEN v END) AS median_cents,
        min(CASE WHEN cum >= n.lo_rank THEN v END) AS ci_lo_cents,
        min(CASE WHEN cum >= n.hi_rank THEN v END) AS ci_hi_cents
      FROM g CROSS JOIN n""")),

    // ----- retention half-life fit ------------------------------------------
    // q90 SHOWS the retention matrix; a growth model needs the decay
    // LAW: pooled day-k retention r_k (only cohorts old enough to
    // reach offset k are eligible — the censoring-honest pooling),
    // fit ln r_k = a + b·k over offsets 1..14 by exact integer least
    // squares on micro-ln values, half-life = ln2 / (−b). A positive
    // or zero slope yields NULL half-life (no decay — itself the
    // finding). One distinct (user, day) pass, user-keyed first-day
    // aggregate, a 14-point grid regression — the q306 Heaps-fit
    // shape.
    ("q350_retention_halflife", (s: SparkSession, dir: String) => {
      import s.implicits._
      val ud = Tables.t(s, dir, "events")
        .select($"user_id".as("u"),
          datediff(to_date($"ts".cast("timestamp")),
            lit("1970-01-01").cast("date")).cast("long").as("d"))
        .distinct()
        .localCheckpoint() // reused: first-day, horizon, activity join
      val first = ud.groupBy($"u").agg(min($"d").as("fd"))
      val hor = ud.agg(max($"d").as("mx"))
      val ks = (1L to 14L).map(Tuple1(_)).toDF("k")
      val elig = first.crossJoin(broadcast(hor))
        .crossJoin(broadcast(ks))
        .filter($"fd" + $"k" <= $"mx")
        .select($"u", $"fd", $"k")
      val actv = elig.join(ud.select($"u", $"d"), Seq("u"))
        .filter($"d" === $"fd" + $"k")
        .groupBy($"k").agg(countDistinct($"u").as("n_active"))
      val base = elig.groupBy($"k").agg(count(lit(1)).as("n_elig"))
      val pts = base.join(actv, Seq("k"), "left")
        .select($"k",
          expr("1000000 * coalesce(n_active, 0) div n_elig").as("r_micro"))
        .filter($"r_micro" > 0)
        .select($"k", expr(
          "CAST(floor(ln(CAST(r_micro AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)")
          .as("y"))
      val fit = pts.agg(count(lit(1)).as("m"), sum($"k").as("sk"),
          sum($"y").as("sy"), sum($"k" * $"y").as("sky"),
          sum($"k" * $"k").as("skk"))
        .select($"m",
          expr("""CASE WHEN m * skk - sk * sk = 0 THEN NULL
              ELSE (m * sky - sk * sy) div (m * skk - sk * sk) END""")
            .as("b_microln_per_day"))
      fit.select($"m".as("n_offsets"), $"b_microln_per_day",
        expr("""CASE WHEN b_microln_per_day IS NULL
                  OR b_microln_per_day >= 0 THEN NULL
                ELSE 693147180 div (-b_microln_per_day) END""")
          .as("half_life_days_milli"))
    }, Some("""
      WITH ud AS (SELECT DISTINCT user_id AS u,
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS d
        FROM events),
      first AS (SELECT u, min(d) AS fd FROM ud GROUP BY u),
      hor AS (SELECT max(d) AS mx FROM ud),
      ks AS (SELECT CAST(k AS BIGINT) AS k
        FROM (SELECT unnest(range(1, 15)) AS k)),
      elig AS (SELECT f.u, f.fd, ks.k
        FROM first f CROSS JOIN hor CROSS JOIN ks
        WHERE f.fd + ks.k <= hor.mx),
      actv AS (SELECT e.k, CAST(count(DISTINCT e.u) AS BIGINT) AS n_active
        FROM elig e JOIN ud ON e.u = ud.u AND ud.d = e.fd + e.k
        GROUP BY 1),
      base AS (SELECT k, CAST(count(*) AS BIGINT) AS n_elig
        FROM elig GROUP BY 1),
      pts AS (SELECT b.k,
          CAST(floor(ln(CAST(1000000 * coalesce(a.n_active, 0) // b.n_elig
            AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y
        FROM base b LEFT JOIN actv a ON b.k = a.k
        WHERE 1000000 * coalesce(a.n_active, 0) // b.n_elig > 0),
      fit AS (SELECT CAST(count(*) AS BIGINT) AS m,
          CAST(sum(k) AS BIGINT) AS sk, CAST(sum(y) AS BIGINT) AS sy,
          CAST(sum(k * y) AS BIGINT) AS sky,
          CAST(sum(k * k) AS BIGINT) AS skk
        FROM pts),
      b AS (SELECT m,
          CASE WHEN m * skk - sk * sk = 0 THEN NULL
            ELSE (m * sky - sk * sy) // (m * skk - sk * sk) END
            AS b_microln_per_day
        FROM fit)
      SELECT m AS n_offsets, b_microln_per_day,
        CASE WHEN b_microln_per_day IS NULL OR b_microln_per_day >= 0
          THEN NULL
          ELSE 693147180 // (-b_microln_per_day) END AS half_life_days_milli
      FROM b""")),

    // ----- Flesch-style readability gate ------------------------------------
    // The curation classic q17's length/punctuation ratios skip:
    // reading ease from words-per-sentence and syllables-per-word.
    // Deterministic proxies only — sentences = [.!?]+ runs in the RAW
    // text (min 1), syllables = [aeiou]+ vowel groups in the lowered
    // text, words = normText tokens — and the Flesch formula in exact
    // milli: 206835 − 1015·(w div s... rather, the two ratios carried
    // as integer milli before weighting, each floor documented. The
    // verdict column applies the standard "≥ 30 = readable by
    // college-level readers" bar. Map-only over documents; the one
    // regex pass per column is codegen'd.
    ("q351_readability", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id",
          size(split(TA.normText($"text"), " ")).cast("long").as("w"),
          greatest(lit(1L),
            size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long"))
            .as("sen"),
          greatest(lit(1L),
            size(expr("regexp_extract_all(lower(text), '[aeiou]+', 0)"))
              .cast("long")).as("syl"))
        .filter($"w" > 0)
        .select($"doc_id", $"w".as("n_words"), $"sen".as("n_sentences"),
          $"syl".as("n_syllables"),
          expr("""206835 - 1015 * (1000 * w div sen) div 1000
                  - 84600 * (1000 * syl div w) div 1000""")
            .as("flesch_milli"))
        .select($"doc_id", $"n_words", $"n_sentences", $"n_syllables",
          $"flesch_milli",
          ($"flesch_milli" >= 30000L).cast("long").as("readable"))
        .orderBy($"doc_id")
    }, Some(s"""
      WITH d AS (SELECT doc_id,
          CAST(len(string_split(${TA.normTextSql}, ' ')) AS BIGINT) AS w,
          greatest(CAST(1 AS BIGINT),
            CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS sen,
          greatest(CAST(1 AS BIGINT),
            CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT))
            AS syl
        FROM documents)
      SELECT doc_id, w AS n_words, sen AS n_sentences, syl AS n_syllables,
        206835 - 1015 * (1000 * w // sen) // 1000
          - 84600 * (1000 * syl // w) // 1000 AS flesch_milli,
        CAST(CASE WHEN 206835 - 1015 * (1000 * w // sen) // 1000
          - 84600 * (1000 * syl // w) // 1000 >= 30000
          THEN 1 ELSE 0 END AS BIGINT) AS readable
      FROM d WHERE w > 0 ORDER BY doc_id"""))
  )
}
