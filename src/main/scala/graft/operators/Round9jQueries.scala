package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 batch 10 (index-vetted: no existing operator covers these):
  * the Wald–Wolfowitz runs test (is the daily error-rate's wander
  * around its median RANDOM, or does it trend/oscillate — the
  * randomness gate the CUSUM/EWMA/SPRT control charts all silently
  * assume), session gap-threshold sensitivity (how much the session
  * count itself depends on the 30-minute convention), and daily top-k
  * churn (rank-stability monitoring of the revenue leaderboard).
  *
  * House rules as elsewhere: integer micro arithmetic, the one sqrt
  * on the single output row from exact-integer operands (q295's
  * rule), identical aliases both sides, total ORDER BY.
  */
object Round9jQueries {

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- Wald–Wolfowitz runs test on the daily error rate -----------------
    // q229/q312/q319 DETECT shifts; this tests the null they assume:
    // that the daily error-share series is exchangeable noise around
    // its center. Signs = above/below the series' lower-median
    // (median-equal days are EXCLUDED, the standard treatment); the
    // number of runs R among n = n1 + n2 signed days is compared to
    // its exchangeability law, E[R] = 1 + 2n1n2/n,
    // Var[R] = 2n1n2(2n1n2 − n) / (n²(n−1)); too FEW runs = trending
    // (the control-chart case), too MANY = oscillation (over-dispersed
    // sampling or a feedback loop). R comes from one lag window over
    // the day grid; z is computed from exact integer counts with the
    // identical float expression in both engines, NULL when a sign
    // class is empty.
    ("q346_runs_test", (s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.t(s, dir, "events")
        .select(datediff(to_date($"ts".cast("timestamp")),
          lit("1970-01-01").cast("date")).cast("long").as("epd"),
          ($"event_type" === "error").cast("long").as("is_err"))
        .groupBy($"epd")
        .agg(expr("1000000 * sum(is_err) div count(1)").as("v"))
        .localCheckpoint() // reused: median grid + the sign series
      val nd = daily.agg(count(lit(1)).as("nd"))
      val wv = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = daily.groupBy($"v").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum($"cnt").over(wv))
        .crossJoin(broadcast(nd))
        .filter($"cum" >= expr("(nd + 1) div 2"))
        .agg(min($"v").as("med"))
      val signed = daily.crossJoin(broadcast(med))
        .filter($"v" =!= $"med")
        .select($"epd", ($"v" > $"med").cast("long").as("sgn"))
      val wd = Window.orderBy($"epd")
      val runs = signed
        .withColumn("chg",
          when(lag($"sgn", 1).over(wd).isNull, 1L)
            .when(lag($"sgn", 1).over(wd) =!= $"sgn", 1L).otherwise(0L))
        .agg(count(lit(1)).as("n"), sum($"sgn").as("n1"),
          (count(lit(1)) - sum($"sgn")).as("n2"),
          sum($"chg").as("n_runs"))
      runs.select($"n".as("n_days"), $"n1", $"n2", $"n_runs",
          expr("""CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
              ELSE CAST(floor(
                (CAST(n_runs AS DOUBLE) - 1
                   - CAST(2 * n1 * n2 AS DOUBLE) / n) * 1000
                / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                    * (2 * n1 * n2 - n) / (CAST(n AS DOUBLE) * n * (n - 1)))
                + 0.5) AS BIGINT) END""").as("z_milli"))
        .select($"n_days", $"n1", $"n2", $"n_runs", $"z_milli",
          when(abs($"z_milli") >= 1960L, 1L).otherwise(0L).as("reject_h0"))
    }, Some("""
      WITH daily AS (SELECT
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS epd,
          1000000 * CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
            END) AS BIGINT) // CAST(count(*) AS BIGINT) AS v
        FROM events GROUP BY 1),
      nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM daily),
      medg AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
          CAST(sum(count(*)) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum
        FROM daily GROUP BY v),
      med AS (SELECT min(v) AS med FROM medg CROSS JOIN nd
        WHERE cum >= (nd + 1) // 2),
      signed AS (SELECT epd,
          CAST(CASE WHEN v > med THEN 1 ELSE 0 END AS BIGINT) AS sgn
        FROM daily CROSS JOIN med WHERE v <> med),
      runs AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(sgn) AS BIGINT) AS n1,
          CAST(count(*) - sum(sgn) AS BIGINT) AS n2,
          CAST(sum(chg) AS BIGINT) AS n_runs FROM
        (SELECT sgn, CASE WHEN lag(sgn, 1) OVER (ORDER BY epd) IS NULL
            THEN 1 WHEN lag(sgn, 1) OVER (ORDER BY epd) <> sgn THEN 1
            ELSE 0 END AS chg
          FROM signed)),
      z AS (SELECT n AS n_days, n1, n2, n_runs,
          CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
          ELSE CAST(floor(
            (CAST(n_runs AS DOUBLE) - 1
               - CAST(2 * n1 * n2 AS DOUBLE) / n) * 1000
            / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                * (2 * n1 * n2 - n) / (CAST(n AS DOUBLE) * n * (n - 1)))
            + 0.5) AS BIGINT) END AS z_milli
        FROM runs)
      SELECT n_days, n1, n2, n_runs, z_milli,
        CAST(CASE WHEN abs(z_milli) >= 1960 THEN 1 ELSE 0 END AS BIGINT)
          AS reject_h0
      FROM z""")),

    // ----- session gap-threshold sensitivity --------------------------------
    // Every sessionization (q28, q144, q171) hard-codes a gap; this
    // measures what the choice COSTS: for gaps of 5/15/30/60 minutes,
    // the session count, the share of inter-event gaps that split, and
    // events-per-session — all from ONE per-user lag pass with four
    // conditional counters (no fanout, no re-sessionization per
    // threshold: a session count is just n_users + #gaps-over). A
    // cliff between adjacent rows means the convention, not the
    // behavior, is driving the metric.
    ("q347_session_gap_sensitivity", (s: SparkSession, dir: String) => {
      import s.implicits._
      val raw = Tables.t(s, dir, "events")
      val tus = raw.schema("ts").dataType.typeName match {
        case "timestamp_ntz" => unix_micros($"ts".cast("timestamp"))
        case _ => unix_micros($"ts")
      }
      val wu = Window.partitionBy($"u").orderBy($"tm", $"event_id")
      val gaps = raw.select($"user_id".as("u"), tus.as("tm"), $"event_id")
        .withColumn("g", $"tm" - lag($"tm", 1).over(wu))
      val agg = gaps.agg(
        countDistinct($"u").as("nu"), count(lit(1)).as("ne"),
        sum(when($"g" > 300L * 1000000, 1L).otherwise(0L)).as("o5"),
        sum(when($"g" > 900L * 1000000, 1L).otherwise(0L)).as("o15"),
        sum(when($"g" > 1800L * 1000000, 1L).otherwise(0L)).as("o30"),
        sum(when($"g" > 3600L * 1000000, 1L).otherwise(0L)).as("o60"),
        sum(when($"g".isNotNull, 1L).otherwise(0L)).as("ng"))
        .localCheckpoint() // one row; reused by the 4-way unpivot
      def row(gapS: Long, oc: String) = agg.select(
        lit(gapS).as("gap_s"), ($"nu" + col(oc)).as("n_sessions"),
        expr(s"1000000 * $oc div ng").as("split_share_micro"),
        expr(s"1000000 * ne div (nu + $oc)").as("events_per_session_micro"))
      row(300, "o5").unionByName(row(900, "o15"))
        .unionByName(row(1800, "o30")).unionByName(row(3600, "o60"))
        .orderBy($"gap_s")
    }, Some("""
      WITH g AS (SELECT user_id AS u,
          epoch_us(CAST(ts AS TIMESTAMP))
            - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER
              (PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS gp
        FROM events),
      agg AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS nu,
          CAST(count(*) AS BIGINT) AS ne,
          CAST(sum(CASE WHEN gp > 300000000 THEN 1 ELSE 0 END) AS BIGINT)
            AS o5,
          CAST(sum(CASE WHEN gp > 900000000 THEN 1 ELSE 0 END) AS BIGINT)
            AS o15,
          CAST(sum(CASE WHEN gp > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
            AS o30,
          CAST(sum(CASE WHEN gp > 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
            AS o60,
          CAST(sum(CASE WHEN gp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS ng
        FROM g)
      SELECT gap_s, n_sessions, split_share_micro, events_per_session_micro
      FROM (
        SELECT CAST(300 AS BIGINT) AS gap_s, nu + o5 AS n_sessions,
          1000000 * o5 // ng AS split_share_micro,
          1000000 * ne // (nu + o5) AS events_per_session_micro FROM agg
        UNION ALL SELECT 900, nu + o15, 1000000 * o15 // ng,
          1000000 * ne // (nu + o15) FROM agg
        UNION ALL SELECT 1800, nu + o30, 1000000 * o30 // ng,
          1000000 * ne // (nu + o30) FROM agg
        UNION ALL SELECT 3600, nu + o60, 1000000 * o60 // ng,
          1000000 * ne // (nu + o60) FROM agg)
      ORDER BY gap_s""")),

    // ----- daily top-k revenue churn ----------------------------------------
    // A leaderboard that reshuffles daily is noise; one that never
    // moves is stale — churn rate is the monitoring number in
    // between, and none of the rank operators (q96 ties, q128 heavy
    // hitters, q277 RBO between two FIXED rankings) tracks it OVER
    // TIME. Per ship-day: top-10 parts by revenue cents (row_number
    // per day — day-partitioned window, fully parallel); then one
    // self-equi-join on consecutive days counts the overlap, and
    // churn = 1 − |∩| / min(|top_d|, |top_prev|) (the min guards thin
    // early days that field fewer than 10 parts). Output one row per
    // day with a predecessor.
    ("q348_topk_churn", (s: SparkSession, dir: String) => {
      import s.implicits._
      val rev = Tables.t(s, dir, "lineitem")
        .select(datediff(to_date($"l_shipdate"),
          lit("1970-01-01").cast("date")).cast("long").as("d"),
          $"l_partkey".as("pk"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
        .groupBy($"d", $"pk").agg(sum($"cents").as("rev"))
      val wd = Window.partitionBy($"d").orderBy(desc("rev"), $"pk")
      val top = rev.withColumn("rn", row_number().over(wd))
        .filter($"rn" <= 10).select($"d", $"pk")
        .localCheckpoint() // reused: both sides of the consecutive join
      val sizes = top.groupBy($"d").agg(count(lit(1)).as("k"))
      val common = top.toDF("d", "pk")
        .join(top.toDF("d2", "pk").withColumn("d", $"d2" + 1), Seq("d", "pk"))
        .groupBy($"d").agg(count(lit(1)).as("n_common"))
      sizes.join(sizes.toDF("dp", "kp").withColumn("d", $"dp" + 1), Seq("d"))
        .join(common, Seq("d"), "left")
        .select($"d".as("day"), $"k".as("n_top"), $"kp".as("n_prev"),
          coalesce($"n_common", lit(0L)).as("n_common"),
          expr("""1000000 - 1000000 * coalesce(n_common, 0)
                  div least(k, kp)""").as("churn_micro"))
        .orderBy($"day")
    }, Some("""
      WITH rev AS (SELECT
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(l_shipdate AS DATE)) AS BIGINT) AS d,
          l_partkey AS pk,
          CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS rev
        FROM lineitem GROUP BY 1, 2),
      top AS (SELECT d, pk FROM
        (SELECT d, pk, row_number() OVER
           (PARTITION BY d ORDER BY rev DESC, pk) AS rn FROM rev)
        WHERE rn <= 10),
      sizes AS (SELECT d, CAST(count(*) AS BIGINT) AS k
        FROM top GROUP BY 1),
      common AS (SELECT a.d, CAST(count(*) AS BIGINT) AS n_common
        FROM top a JOIN top b ON a.pk = b.pk AND b.d = a.d - 1
        GROUP BY 1)
      SELECT s.d AS day, s.k AS n_top, sp.k AS n_prev,
        coalesce(c.n_common, 0) AS n_common,
        1000000 - 1000000 * coalesce(c.n_common, 0) // least(s.k, sp.k)
          AS churn_micro
      FROM sizes s JOIN sizes sp ON sp.d = s.d - 1
      LEFT JOIN common c ON c.d = s.d
      ORDER BY day"""))
  )
}
