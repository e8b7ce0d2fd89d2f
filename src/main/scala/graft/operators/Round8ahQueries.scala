package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 batch 34: delete-one-source jackknife variance (the
  * deterministic resampling SE the Poisson bootstrap approximates with
  * RNG), an SPRT sequential monitor over the daily error rate (decide
  * WHILE data arrives, not after — Wald's test as a cumulative
  * log-likelihood walk), and per-source rates with Wilson confidence
  * intervals (the interval that stays honest at small n where the
  * normal approximation lies).
  *
  * House rules as elsewhere: integer arithmetic at every gate,
  * micro-ln per transcendental constant with the identical expression
  * both sides, sqrt only on final bounded rows, total ORDER BY.
  */
object Round8ahQueries {

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- delete-one-source jackknife SE ---------------------------------
    // The corpus mean doc length has a standard error — under CLUSTER
    // sampling (sources are the clusters), not the iid formula. The
    // delete-one-group jackknife: μ_j = mean with source j removed
    // (every LOO mean from ONE per-source aggregate — the q227 trick),
    // SE² = (g−1)/g · Σ(μ_j − μ̄·)². Deterministic — no RNG, unlike
    // the Poisson bootstrap — and the per-source influence |μ_j − μ|
    // ranks which source DRIVES the estimate. Output is one row from
    // a |sources|-bounded table; the one sqrt runs on that row.
    ("q318_jackknife_se", (s: SparkSession, dir: String) => {
      import s.implicits._
      val per = Tables.spread(Tables.t(s, dir, "documents"))
        .groupBy($"source").agg(count(lit(1)).as("ns"),
          sum($"n_chars").as("ss"))
        .localCheckpoint() // reused: totals + LOO table + influence rank
      val tot = per.agg(count(lit(1)).as("g"), sum($"ns").as("n"),
        sum($"ss").as("st"))
      val loo = per.crossJoin(broadcast(tot))
        .select($"source", $"g", $"n", $"st",
          expr("1000000 * (st - ss) div (n - ns)").as("mu_j"),
          expr("1000000 * st div n").as("mu"))
        .localCheckpoint()
      val mdot = loo.agg(expr("sum(mu_j) div count(*)").as("md"))
      val infl = loo
        .withColumn("rn", row_number().over(
          Window.orderBy(abs($"mu_j" - $"mu").desc, $"source")))
        .filter($"rn" === 1)
        .select($"source".as("top_influence_source"),
          abs($"mu_j" - $"mu").as("max_influence_micro"))
      loo.crossJoin(broadcast(mdot))
        .groupBy($"g", $"mu")
        .agg(sum(($"mu_j" - $"md") * ($"mu_j" - $"md")).as("sd2"))
        .crossJoin(broadcast(infl))
        .select($"g", $"mu".as("mean_micro"),
          expr("""CAST(floor(sqrt(CAST((g - 1) * sd2 AS DOUBLE)
              / CAST(g AS DOUBLE)) + 0.5) AS BIGINT)""").as("jack_se_micro"),
          $"max_influence_micro", $"top_influence_source")
    }, Some("""
      WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS ns,
          CAST(sum(n_chars) AS BIGINT) AS ss FROM documents GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS g,
          CAST(sum(ns) AS BIGINT) AS n, CAST(sum(ss) AS BIGINT) AS st
        FROM per),
      loo AS (SELECT source, g, n, st,
          1000000 * (st - ss) // (n - ns) AS mu_j,
          1000000 * st // n AS mu
        FROM per CROSS JOIN tot),
      mdot AS (SELECT CAST(sum(mu_j) // count(*) AS BIGINT) AS md FROM loo),
      infl AS (SELECT source AS top_influence_source,
          abs(mu_j - mu) AS max_influence_micro FROM
        (SELECT source, mu_j, mu, row_number() OVER
           (ORDER BY abs(mu_j - mu) DESC, source) AS rn FROM loo)
        WHERE rn = 1),
      sd AS (SELECT g, mu,
          CAST(sum((mu_j - md) * (mu_j - md)) AS BIGINT) AS sd2
        FROM loo CROSS JOIN mdot GROUP BY 1, 2)
      SELECT sd.g, sd.mu AS mean_micro,
        CAST(floor(sqrt(CAST((sd.g - 1) * sd.sd2 AS DOUBLE)
          / CAST(sd.g AS DOUBLE)) + 0.5) AS BIGINT) AS jack_se_micro,
        infl.max_influence_micro, infl.top_influence_source
      FROM sd CROSS JOIN infl""")),

    // ----- SPRT sequential monitor over the daily error rate --------------
    // Fixed-n tests (q224) decide AFTER the window closes; Wald's SPRT
    // decides WHILE days arrive: the cumulative log-likelihood-ratio
    // walk Λ_t = Σ_days [e_d·ln(p1/p0) + (n_d−e_d)·ln((1−p1)/(1−p0))]
    // for H0: error rate p0 = 19% vs H1: p1 = 21%, with acceptance
    // bounds ±ln(19) (α = β = 0.05). The two ln constants are
    // micro-ln literals evaluated by the identical expression both
    // sides; each day contributes an exact integer increment, the walk
    // is one cumulative window over the day grid (the documented q195
    // bound), and the verdict column marks the FIRST crossing — how
    // many days of data the decision actually needed.
    ("q319_sprt_monitor", (s: SparkSession, dir: String) => {
      import s.implicits._
      def lnm(a: String) =
        s"CAST(floor(ln(CAST(($a) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
      val daily = Tables.t(s, dir, "events")
        .select(datediff(to_date($"ts".cast("timestamp")),
          lit("1970-01-01").cast("date")).cast("long").as("epd"),
          when($"event_type" === "error", 1L).otherwise(0L).as("e"))
        .groupBy($"epd").agg(count(lit(1)).as("nd"), sum($"e").as("ed"))
      val stepped = daily.select($"epd", $"nd", $"ed",
        expr(s"ed * (${lnm("21")} - ${lnm("19")})" +
          s" + (nd - ed) * (${lnm("79")} - ${lnm("81")})").as("inc"))
      val wc = Window.orderBy($"epd")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      stepped.withColumn("llr_micro", sum($"inc").over(wc))
        .crossJoin(broadcast(s.range(1).select(expr(lnm("19")).as("bound"))))
        .select($"epd", $"nd", $"ed", $"llr_micro",
          when($"llr_micro" >= $"bound", lit("accept_h1"))
            .when($"llr_micro" <= -$"bound", lit("accept_h0"))
            .otherwise(lit("continue")).as("verdict"))
        .orderBy($"epd")
    }, Some("""
      WITH daily AS (SELECT
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS epd,
          CAST(count(*) AS BIGINT) AS nd,
          CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS ed
        FROM events GROUP BY 1),
      c AS (SELECT
          CAST(floor(ln(CAST(21 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
            - CAST(floor(ln(CAST(19 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
            AS le,
          CAST(floor(ln(CAST(79 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
            - CAST(floor(ln(CAST(81 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
            AS lq,
          CAST(floor(ln(CAST(19 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
            AS bound),
      walk AS (SELECT epd, nd, ed,
          CAST(sum(ed * c.le + (nd - ed) * c.lq) OVER (ORDER BY epd
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS llr_micro,
          c.bound
        FROM daily CROSS JOIN c)
      SELECT epd, nd, ed, llr_micro,
        CASE WHEN llr_micro >= bound THEN 'accept_h1'
          WHEN llr_micro <= -bound THEN 'accept_h0'
          ELSE 'continue' END AS verdict
      FROM walk ORDER BY epd""")),

    // ----- per-source Wilson confidence intervals -------------------------
    // "Source X is 12% long-docs" means nothing without an interval,
    // and at n = 60 the normal interval lies. Wilson's score interval
    // center ± halfwidth (z = 1.96 with z² carried as the rational
    // 96/25 = 3.84, so the center term stays integer until the one
    // sqrt per source row): the audit flags sources whose interval EXCLUDES the corpus
    // rate — the statistically-honest version of a naive rate sort.
    // One per-source aggregate, |sources| output rows, sqrt on those
    // rows only.
    ("q320_wilson_rate_audit", (s: SparkSession, dir: String) => {
      import s.implicits._
      val per = Tables.spread(Tables.t(s, dir, "documents"))
        .groupBy($"source").agg(count(lit(1)).as("n"),
          sum(($"n_chars" >= 250).cast("long")).as("k"))
        .localCheckpoint()
      val tot = per.agg(sum($"n").as("nt"), sum($"k").as("kt"))
      // Wilson with z² = 96/25: center = (k + z²/2) / (n + z²),
      // hw = z·sqrt(k(n−k)/n + z²/4) / (n + z²); scaled by 100n/(100n+384)
      // in exact integers, sqrt once per row.
      per.crossJoin(broadcast(tot))
        .select($"source", $"n", $"k",
          expr("1000000 * k div n").as("rate_micro"),
          expr("(1000000 * (50 * k + 96)) div (50 * n + 192)")
            .as("center_micro"),
          expr("""CAST(floor(1960000.0
              * sqrt(CAST(k * (n - k) AS DOUBLE) / CAST(n AS DOUBLE)
                     + 0.96)
              / (CAST(n AS DOUBLE) + 3.84) + 0.5) AS BIGINT)""")
            .as("hw_micro"),
          expr("1000000 * kt div nt").as("corpus_micro"))
        .select($"source", $"n", $"k", $"rate_micro", $"center_micro",
          $"hw_micro",
          when($"corpus_micro" < $"center_micro" - $"hw_micro" ||
            $"corpus_micro" > $"center_micro" + $"hw_micro", 1L)
            .otherwise(0L).as("sig_flag"))
        .orderBy($"source")
    }, Some("""
      WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END) AS BIGINT)
            AS k
        FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
          CAST(sum(k) AS BIGINT) AS kt FROM per),
      w AS (SELECT source, n, k,
          1000000 * k // n AS rate_micro,
          (1000000 * (50 * k + 96)) // (50 * n + 192) AS center_micro,
          CAST(floor(1960000.0
            * sqrt(CAST(k * (n - k) AS DOUBLE) / CAST(n AS DOUBLE) + 0.96)
            / (CAST(n AS DOUBLE) + 3.84) + 0.5) AS BIGINT) AS hw_micro,
          1000000 * kt // nt AS corpus_micro
        FROM per CROSS JOIN tot)
      SELECT source, n, k, rate_micro, center_micro, hw_micro,
        CAST(CASE WHEN corpus_micro < center_micro - hw_micro
          OR corpus_micro > center_micro + hw_micro THEN 1 ELSE 0 END
          AS BIGINT) AS sig_flag
      FROM w ORDER BY source"""))
  )
}
