package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 batch 7: trimmed/winsorized robust means — what to report
  * once q323 has flagged tail contamination; exact by rank on the
  * cents value grid.
  *
  * (This batch's first draft also carried a two-proportion A/B z-test
  * and a Gini/Lorenz concentration read; both duplicated existing
  * operators — q224's chi-square is the identical 2x2 test (z² = χ²)
  * and q239 already owns Gini — and were removed in the round-9
  * dedup audit.)
  *
  * House rules as elsewhere: integer micro arithmetic, identical
  * aliases both sides, total ORDER BY.
  */
object Round9gQueries {

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

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
          expr("CASE WHEN tn = 0 THEN NULL ELSE tsum div tn END")
            .as("trimmed_mean_cents"),
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
        CASE WHEN tn = 0 THEN NULL ELSE tsum // tn END
          AS trimmed_mean_cents,
        (tsum + lo * p05 + (n_rows - lo - tn) * p95) // n_rows
          AS winsorized_mean_cents,
        p05 AS p05_cents, p95 AS p95_cents
      FROM p"""))
  )
}
