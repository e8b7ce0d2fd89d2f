package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 batch 9: the experimentation/planning analytics a telemetry
  * pipeline serves — forecast model selection by backtest, and A/B test
  * analysis with an exact chi-square decision statistic.
  */
object Round8iQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** Epoch-micros column for events.ts, tolerant of both parquet
    * timestamp encodings (the TESTDATA gotcha). */
  private def tusOf(raw: DataFrame) =
    raw.schema("ts").dataType.typeName match {
      case "timestamp_ntz" => unix_micros(col("ts").cast("timestamp"))
      case _ => unix_micros(col("ts"))
    }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- forecast backtesting (model selection table) -------------------
    // Which forecaster earns the capacity-planning job is an empirical
    // question answered by backtest, not taste: against the daily event
    // series, score naive (yesterday), seasonal-naive (7 days ago) and
    // the 7-day moving average on every day where all three are defined,
    // by MAE. Forecasts are CALENDAR JOINS on the day grid (day−1,
    // day−7, and an offsets-1..7 explode requiring all 7 present), not
    // positional lags — gap-safe, and the grid is |days| rows (bounded;
    // the corpus-sized work is the one daily count aggregate). The
    // moving average floors to an integer forecast, so every error is
    // an exact integer and the MAE table is engine-identical. At scale
    // this is the nightly model-selection job over per-tenant series —
    // the same plan with a tenant key prepended to every join.
    ("q223_forecast_backtest", (s: SparkSession, dir: String) => {
      import s.implicits._
      val raw = Tables.t(s, dir, "events")
      val daily = raw.select((tusOf(raw) / 86400000000L).cast("long").as("day"))
        .groupBy($"day").agg(count(lit(1)).as("y"))
        .localCheckpoint() // self-joined by three forecasters
      val bounds = daily.agg(min($"day").as("d0"))
      val naive = daily.toDF("day", "f").select(($"day" + 1).as("day"),
        $"f".as("f_naive"))
      val snaive = daily.toDF("day", "f").select(($"day" + 7).as("day"),
        $"f".as("f_snaive"))
      val ma7 = daily.toDF("dd", "f")
        .select($"dd", $"f", explode(array((1 to 7).map(lit): _*)).as("off"))
        .select(($"dd" + $"off").as("day"), $"f")
        .groupBy($"day").agg(count(lit(1)).as("k"), sum($"f").as("sf"))
        .filter($"k" === 7)
        .select($"day", expr("sf div 7").as("f_ma7"))
      val joined = daily.join(naive, "day").join(snaive, "day").join(ma7, "day")
        .crossJoin(broadcast(bounds))
        .filter($"day" >= $"d0" + 7)
      joined.select(explode(array(
          struct(lit("ma7").as("forecaster"), abs($"y" - $"f_ma7").as("ae")),
          struct(lit("naive").as("forecaster"), abs($"y" - $"f_naive").as("ae")),
          struct(lit("snaive").as("forecaster"), abs($"y" - $"f_snaive").as("ae"))))
          .as("x"))
        .select($"x.forecaster".as("forecaster"), $"x.ae".as("ae"))
        .groupBy($"forecaster")
        .agg(count(lit(1)).as("n_eval"), sum($"ae").as("sae"))
        .select($"forecaster", $"n_eval", $"sae",
          expr("(1000000 * sae) div n_eval").as("mae_micro"))
        .orderBy("forecaster")
    }, Some("""
      WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1),
      bounds AS (SELECT min(day) AS d0 FROM daily),
      naive AS (SELECT day + 1 AS day, y AS f_naive FROM daily),
      snaive AS (SELECT day + 7 AS day, y AS f_snaive FROM daily),
      ma7 AS (SELECT day, sf // 7 AS f_ma7 FROM (
        SELECT d.day + o.off AS day, CAST(count(*) AS BIGINT) AS k,
            CAST(sum(d.y) AS BIGINT) AS sf
          FROM daily d CROSS JOIN (SELECT unnest(range(1, 8)) AS off) o
          GROUP BY 1) WHERE k = 7),
      j AS (SELECT d.day, d.y, n.f_naive, sn.f_snaive, m.f_ma7
        FROM daily d JOIN naive n USING (day) JOIN snaive sn USING (day)
        JOIN ma7 m USING (day) CROSS JOIN bounds b
        WHERE d.day >= b.d0 + 7),
      e AS (SELECT 'naive' AS forecaster, abs(y - f_naive) AS ae FROM j
        UNION ALL SELECT 'snaive', abs(y - f_snaive) FROM j
        UNION ALL SELECT 'ma7', abs(y - f_ma7) FROM j)
      SELECT forecaster, CAST(count(*) AS BIGINT) AS n_eval,
        CAST(sum(ae) AS BIGINT) AS sae,
        (1000000 * CAST(sum(ae) AS BIGINT)) // CAST(count(*) AS BIGINT) AS mae_micro
      FROM e GROUP BY forecaster ORDER BY forecaster""")),

    // ----- A/B test analysis (exact chi-square decision) ------------------
    // The experimentation read-out: variant by user-id parity (the
    // hash-bucket assignment every platform uses), conversion = the
    // user is a heavy purchaser (≥ 14 purchase events — "ever
    // purchased" saturates at 100% on this generator and would zero two
    // cells), and the 2×2 chi-square statistic
    //   χ² = n·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    // computed exactly in integers and emitted in micro units next to
    // the per-variant rates and the lift; `significant` is the α=0.05
    // decision bit (χ² ≥ 3.841). On this corpus the parity split flags
    // a genuine id-correlated pattern in the synthetic generator
    // (34.7% vs 57.3% heavy-purchaser rate at sf0.01) — which is the
    // point: an "A/A" split that rejects means the assignment key is
    // NOT independent of the metric, the first thing a platform's
    // sample-ratio/pre-experiment checks exist to catch. One user-level
    // aggregate + one 4-cell reduction; the Int64 products are exact to
    // ~10⁴ users per cell — past that the same expressions promote to
    // DECIMAL(38,0), the q192 rule.
    ("q224_ab_analysis", (s: SparkSession, dir: String) => {
      import s.implicits._
      val raw = Tables.t(s, dir, "events")
      val users = raw.select($"user_id", $"event_type")
        .groupBy($"user_id")
        .agg(when(sum(when($"event_type" === "purchase", 1L).otherwise(0L)) >= 14,
          1L).otherwise(0L).as("conv"))
        .select(($"user_id" % 2).as("variant"), $"conv")
      val cells = users.agg(
        sum(when($"variant" === 0 && $"conv" === 1, 1L).otherwise(0L)).as("a"),
        sum(when($"variant" === 0 && $"conv" === 0, 1L).otherwise(0L)).as("b"),
        sum(when($"variant" === 1 && $"conv" === 1, 1L).otherwise(0L)).as("c"),
        sum(when($"variant" === 1 && $"conv" === 0, 1L).otherwise(0L)).as("d"))
      cells.select(
          ($"a" + $"b" + $"c" + $"d").as("n_users"),
          $"a".as("conv_a"), ($"a" + $"b").as("n_a"),
          $"c".as("conv_b"), ($"c" + $"d").as("n_b"),
          expr("(1000000 * a) div (a + b)").as("cr_a_micro"),
          expr("(1000000 * c) div (c + d)").as("cr_b_micro"),
          (expr("(1000000 * c) div (c + d)") - expr("(1000000 * a) div (a + b)"))
            .as("lift_micro"),
          expr("(1000000 * (a + b + c + d) * (a * d - b * c) * (a * d - b * c)) div ((a + b) * (c + d) * (a + c) * (b + d))")
            .as("chi2_micro"))
        .select($"n_users", $"conv_a", $"n_a", $"conv_b", $"n_b",
          $"cr_a_micro", $"cr_b_micro", $"lift_micro", $"chi2_micro",
          when($"chi2_micro" >= 3841000L, 1L).otherwise(0L).as("significant"))
    }, Some("""
      WITH users AS (SELECT user_id % 2 AS variant,
          CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
            THEN 1 ELSE 0 END AS BIGINT) AS conv
        FROM events GROUP BY user_id),
      cells AS (SELECT
          CAST(sum(CASE WHEN variant = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
          CAST(sum(CASE WHEN variant = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
          CAST(sum(CASE WHEN variant = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
          CAST(sum(CASE WHEN variant = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM users)
      SELECT a + b + c + d AS n_users, a AS conv_a, a + b AS n_a,
        c AS conv_b, c + d AS n_b,
        (1000000 * a) // (a + b) AS cr_a_micro,
        (1000000 * c) // (c + d) AS cr_b_micro,
        (1000000 * c) // (c + d) - (1000000 * a) // (a + b) AS lift_micro,
        (1000000 * (a + b + c + d) * (a * d - b * c) * (a * d - b * c))
          // ((a + b) * (c + d) * (a + c) * (b + d)) AS chi2_micro,
        CAST(CASE WHEN (1000000 * (a + b + c + d) * (a * d - b * c) * (a * d - b * c))
          // ((a + b) * (c + d) * (a + c) * (b + d)) >= 3841000 THEN 1 ELSE 0 END AS BIGINT) AS significant
      FROM cells"""))
  )
}
