package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-9 batch 7: the two-sample A/B read (pooled two-proportion
  * z-test over an md5 assignment — q320 owns the single-rate Wilson
  * interval, q319 the sequential monitor; this is the fixed-horizon
  * comparison between them), trimmed/winsorized robust means (what to
  * report when q323 has flagged the tails), and the Gini/Lorenz
  * concentration read of corpus token mass across sources (the
  * inequality number behind every "is our mix too concentrated?"
  * mixing debate).
  *
  * House rules as elsewhere: integer micro arithmetic; the one sqrt
  * (the z denominator) runs on exact integers on the final row, the
  * q295 pattern; identical aliases both sides, total ORDER BY.
  */
object Round9gQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- two-proportion A/B z-test ---------------------------------------
    // Assignment = md5(user) % 2 (the deterministic split q110
    // established); outcome = did the user ever make a BIG purchase
    // (value ≥ 150.00, compared in cents — plain "ever purchased"
    // saturates at 100% here and would null the test). The pooled
    // two-proportion z: z = (p̂_A − p̂_B) / √(p̂(1−p̂)(1/n_A + 1/n_B)),
    // computed as z_milli = (pa−pb)·1e3·1e6 div √(p(1e6−p)(...)) with
    // every operand an exact integer micro-rate and ONE map-side sqrt
    // on the single output row (q295's rule). |z| ≥ 1960 milli is the
    // 5% two-sided call. On an md5 split of identical populations the
    // test MUST read null — this operator doubles as the battery's
    // assignment-integrity check (an |z| ≥ 1.96 here would mean the
    // hash split itself is biased). Shape: one per-user aggregate, one
    // two-row group, one output row.
    ("q337_ab_proportion_ztest", (s: SparkSession, dir: String) => {
      import s.implicits._
      val u = Tables.t(s, dir, "events")
        .select($"user_id".as("u"), $"event_type".as("et"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vc"))
        .groupBy($"u")
        .agg(max(when($"et" === "purchase" && $"vc" >= 15000L, 1L)
          .otherwise(0L)).as("conv"))
        .withColumn("arm",
          conv(substring(md5(concat(lit("ab|"), $"u".cast("string"))),
            1, 8), 16, 10).cast("long") % 2)
      val arms = u.groupBy($"arm")
        .agg(count(lit(1)).as("n"), sum($"conv").as("x"))
      val wide = arms.agg(
        max(when($"arm" === 0, $"n")).as("na"),
        max(when($"arm" === 0, $"x")).as("xa"),
        max(when($"arm" === 1, $"n")).as("nb"),
        max(when($"arm" === 1, $"x")).as("xb"))
      wide.select($"na", $"xa", $"nb", $"xb",
          expr("1000000 * xa div na").as("pa_micro"),
          expr("1000000 * xb div nb").as("pb_micro"),
          expr("1000000 * (xa + xb) div (na + nb)").as("pool_micro"))
        .select($"na", $"xa", $"nb", $"xb", $"pa_micro", $"pb_micro",
          $"pool_micro",
          expr("""CASE WHEN pool_micro = 0 OR pool_micro = 1000000 THEN NULL
                  ELSE CAST(floor(
                    CAST((pa_micro - pb_micro) * 1000 AS DOUBLE)
                    / sqrt(CAST(pool_micro AS DOUBLE)
                        * (1000000 - pool_micro)
                        * (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb))
                    + 0.5) AS BIGINT) END""").as("z_milli"))
        .select($"na", $"xa", $"nb", $"xb", $"pa_micro", $"pb_micro",
          $"pool_micro", $"z_milli",
          when(abs($"z_milli") >= 1960L, 1L).otherwise(0L)
            .as("reject_h0"))
    }, Some("""
      WITH u AS (SELECT user_id AS u,
          CAST(max(CASE WHEN event_type = 'purchase'
            AND CAST(floor(value * 100 + 0.5) AS BIGINT) >= 15000
            THEN 1 ELSE 0 END) AS BIGINT) AS conv
        FROM events GROUP BY 1),
      a AS (SELECT u, conv,
          ('0x' || substr(md5('ab|' || CAST(u AS VARCHAR)), 1, 8))::BIGINT % 2
            AS arm
        FROM u),
      arms AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(conv) AS BIGINT) AS x FROM a GROUP BY 1),
      wide AS (SELECT
          max(CASE WHEN arm = 0 THEN n END) AS na,
          max(CASE WHEN arm = 0 THEN x END) AS xa,
          max(CASE WHEN arm = 1 THEN n END) AS nb,
          max(CASE WHEN arm = 1 THEN x END) AS xb
        FROM arms),
      r AS (SELECT na, xa, nb, xb,
          1000000 * xa // na AS pa_micro,
          1000000 * xb // nb AS pb_micro,
          1000000 * (xa + xb) // (na + nb) AS pool_micro
        FROM wide),
      z AS (SELECT r.*,
          CASE WHEN pool_micro = 0 OR pool_micro = 1000000 THEN NULL
          ELSE CAST(floor(
            CAST((pa_micro - pb_micro) * 1000 AS DOUBLE)
            / sqrt(CAST(pool_micro AS DOUBLE) * (1000000 - pool_micro)
                * (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb))
            + 0.5) AS BIGINT) END AS z_milli
        FROM r)
      SELECT na, xa, nb, xb, pa_micro, pb_micro, pool_micro, z_milli,
        CAST(CASE WHEN abs(z_milli) >= 1960 THEN 1 ELSE 0 END AS BIGINT)
          AS reject_h0
      FROM z""")),

    // ----- trimmed and winsorized means ------------------------------------
    // Once q323 has flagged tail contamination, which center do you
    // REPORT? The 5% trimmed mean (drop the outer 5% each side) and
    // the 5% winsorized mean (clamp to the 5th/95th percentile values)
    // — both exact, both off the o_totalprice cents value grid: the
    // rank thresholds lo = ceil(n/20), hi = n − lo select interior
    // mass; straddling values contribute PARTIAL counts
    // (min(cum,hi) − max(cum−cnt,lo) clipped at 0), so the trim is by
    // RANK, not by whole value — no heavy value distorts the cut. One
    // grid pass, one output row with the raw mean alongside: the gap
    // between the three IS the tail-mass diagnostic.
    ("q338_trimmed_mean", (s: SparkSession, dir: String) => {
      import s.implicits._
      val c = Tables.t(s, dir, "orders")
        .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v"))
      val n = c.agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      val wv = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val g = c.groupBy($"v").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum($"cnt").over(wv))
        .crossJoin(broadcast(n))
        .withColumn("lo", expr("(n + 19) div 20")) // ceil(n/20)
        .withColumn("hi", expr("n - (n + 19) div 20"))
        .withColumn("inkeep", expr(
          """greatest(CAST(0 AS BIGINT),
             least(cum, hi) - greatest(cum - cnt, lo))"""))
      g.agg(max($"n").as("n_rows"), max($"sv").as("sum_cents"),
          sum($"inkeep" * $"v").as("tsum"), sum($"inkeep").as("tn"),
          min(when($"cum" > $"lo", $"v")).as("p05"),
          min(when($"cum" >= $"hi", $"v")).as("p95"),
          max($"lo").as("lo"))
        .select($"n_rows",
          expr("sum_cents div n_rows").as("mean_cents"),
          expr("tsum div tn").as("trimmed_mean_cents"),
          expr("""(tsum + lo * p05 + (n_rows - lo - tn) * p95)
                  div n_rows""").as("winsorized_mean_cents"),
          $"p05".as("p05_cents"), $"p95".as("p95_cents"))
    }, Some("""
      WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        FROM orders),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(v) AS BIGINT) AS sv FROM c),
      g AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
          CAST(sum(count(*)) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum
        FROM c GROUP BY v),
      k AS (SELECT v, cnt, cum, n, sv,
          (n + 19) // 20 AS lo, n - (n + 19) // 20 AS hi
        FROM g CROSS JOIN n),
      p AS (SELECT max(n) AS n_rows, max(sv) AS sum_cents,
          CAST(sum(greatest(CAST(0 AS BIGINT),
            least(cum, hi) - greatest(cum - cnt, lo)) * v) AS BIGINT)
            AS tsum,
          CAST(sum(greatest(CAST(0 AS BIGINT),
            least(cum, hi) - greatest(cum - cnt, lo))) AS BIGINT) AS tn,
          min(CASE WHEN cum > lo THEN v END) AS p05,
          min(CASE WHEN cum >= hi THEN v END) AS p95,
          max(lo) AS lo
        FROM k)
      SELECT n_rows, sum_cents // n_rows AS mean_cents,
        tsum // tn AS trimmed_mean_cents,
        (tsum + lo * p05 + (n_rows - lo - tn) * p95) // n_rows
          AS winsorized_mean_cents,
        p05 AS p05_cents, p95 AS p95_cents
      FROM p""")),

    // ----- Gini / Lorenz concentration of corpus mass ----------------------
    // "Is the corpus too concentrated in a few sources?" deserves a
    // number, not a bar chart: the Gini coefficient of token mass
    // across sources, with the Lorenz curve alongside. Sources are
    // ranked by mass ascending (ties broken by name — total order);
    // G = (2·Σ i·xᵢ) / (n·Σx) − (n+1)/n on the ranked masses, carried
    // as gini_micro = (2e6·Σ i·xᵢ − 1e6·(n+1)·Σx) div (n·Σx) with the
    // Σ i·xᵢ cross-product in DECIMAL(38,0)/HUGEINT. The per-source
    // Lorenz rows (cumulative mass share at each rank) ride along —
    // |sources|-bounded output, one tokenize pass, one rank window
    // over the source roster.
    ("q339_gini_concentration", (s: SparkSession, dir: String) => {
      import s.implicits._
      val m = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source",
          size(split(TA.normText($"text"), " ")).cast("long").as("nt"))
        .groupBy($"source").agg(sum($"nt").as("mass"))
      val wr = Window.orderBy($"mass", $"source")
      val wc = Window.orderBy($"mass", $"source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = m.withColumn("rk", row_number().over(wr).cast("long"))
        .withColumn("cmass", sum($"mass").over(wc))
        .localCheckpoint() // reused: totals + output rows
      val tot = ranked.agg(count(lit(1)).as("ns"), sum($"mass").as("tm"),
        sum(expr("CAST(rk AS DECIMAL(38,0)) * mass")).as("sxi"))
      ranked.crossJoin(broadcast(tot))
        .select($"rk".as("rank"), $"source", $"mass",
          expr("1000000 * cmass div tm").as("lorenz_micro"),
          expr("""CAST((2 * CAST(sxi AS DECIMAL(38,0)) * 1000000
                  - CAST(1000000 AS DECIMAL(38,0)) * (ns + 1) * tm)
                  div (CAST(ns AS DECIMAL(38,0)) * tm) AS BIGINT)""")
            .as("gini_micro"))
        .orderBy($"rank")
    }, Some(s"""
      WITH m AS (SELECT source,
          CAST(sum(len(string_split($normSql, ' '))) AS BIGINT) AS mass
        FROM documents GROUP BY 1),
      ranked AS (SELECT source, mass,
          CAST(row_number() OVER (ORDER BY mass, source) AS BIGINT) AS rk,
          CAST(sum(mass) OVER (ORDER BY mass, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cmass
        FROM m),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS ns,
          CAST(sum(mass) AS BIGINT) AS tm,
          CAST(sum(CAST(rk AS HUGEINT) * mass) AS HUGEINT) AS sxi
        FROM ranked)
      SELECT rk AS rank, source, mass,
        1000000 * cmass // tm AS lorenz_micro,
        CAST((2 * CAST(sxi AS HUGEINT) * 1000000
          - CAST(1000000 AS HUGEINT) * (ns + 1) * tm)
          // (CAST(ns AS HUGEINT) * tm) AS BIGINT) AS gini_micro
      FROM ranked CROSS JOIN tot ORDER BY rank"""))
  )
}
