package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 33: Good–Turing unseen-mass estimation per source
  * (the probability-of-novelty companion to q313's richness counts),
  * the German-tank cardinality estimator (ID-space size from a sample
  * — the sampling-side answer q311 audits from the hash side), and a
  * sliding 7-day distinct-user window (the windowed COUNT DISTINCT
  * every engagement dashboard needs and naive windowing gets wrong).
  *
  * House rules as elsewhere: integer arithmetic at every gate,
  * identical aliases both sides, total ORDER BY.
  */
object Round8agQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- Good–Turing unseen probability mass per source ------------------
    // Turing's estimator: the chance the NEXT token drawn from a source
    // is a type never seen there is f1/N — singleton types over token
    // count. q313 counts the unseen species; this prices their
    // probability mass, per source, which is the number an active
    // curation loop reads ("which sources still surprise us?").
    // Shape: one tokenize pass → per-(source, type) counts → one
    // per-source aggregate; everything hash-partitioned, the output
    // |sources|-bounded. On a closed shared vocabulary the singleton
    // count comes from each source's OWN draw, so the per-source
    // readings differ — measured, not assumed.
    ("q315_good_turing_mass", (s: SparkSession, dir: String) => {
      import s.implicits._
      val st = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source",
          explode(split(TA.normText($"text"), " ")).as("tok"))
        .groupBy($"source", $"tok").agg(count(lit(1)).as("f"))
      st.groupBy($"source")
        .agg(sum($"f").as("n_tokens"), count(lit(1)).as("n_types"),
          sum(when($"f" === 1, 1L).otherwise(0L)).as("f1"))
        .select($"source", $"n_tokens", $"n_types", $"f1",
          expr("1000000 * f1 div n_tokens").as("unseen_mass_micro"))
        .orderBy($"source")
    }, Some(s"""
      WITH st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS f FROM
        (SELECT source, unnest(string_split($normSql, ' ')) AS tok
         FROM documents) GROUP BY 1, 2)
      SELECT source, CAST(sum(f) AS BIGINT) AS n_tokens,
        CAST(count(*) AS BIGINT) AS n_types,
        CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        1000000 * CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
          // CAST(sum(f) AS BIGINT) AS unseen_mass_micro
      FROM st GROUP BY source ORDER BY source""")),

    // ----- German-tank cardinality estimator ------------------------------
    // How many rows does the table have, from a SAMPLE of its serial
    // ids? The minimum-variance unbiased answer (the WWII production
    // estimate): N̂ = m + m/k − 1 with m the sample max and k the
    // sample size — assuming ids are 1..N serials, which this audit
    // CHECKS by also reporting the true count and max. Sample is the
    // engine-reproducible md5-Bernoulli ~10% (no RNG); the whole
    // operator is two aggregates over one scan, output a single row.
    // The production read: estimate a partner table's cardinality from
    // a sampled extract before planning the full copy (q165's
    // join-size forecast needs exactly this input when only a sample
    // has landed).
    ("q316_german_tank", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.spread(Tables.t(s, dir, "orders"))
        .select($"o_orderkey".as("id"))
      val tot = d.agg(count(lit(1)).as("n_true"), max($"id").as("max_true"))
      val samp = d.filter(
          conv(substring(md5(concat(lit("gt|"), $"id".cast("string"))),
            1, 8), 16, 10).cast("long") % 10 === 0)
        .agg(count(lit(1)).as("k"), max($"id").as("m"))
      samp.crossJoin(broadcast(tot))
        .select($"n_true", $"max_true", $"k", $"m",
          expr("m + m div k - 1").as("n_est"),
          expr("""CAST(floor(CAST(m + m div k - 1 - max_true AS DOUBLE)
              / CAST(max_true AS DOUBLE) * 1000000 + 0.5) AS BIGINT)""")
            .as("err_vs_max_micro"))
    }, Some("""
      WITH d AS (SELECT o_orderkey AS id FROM orders),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_true,
          CAST(max(id) AS BIGINT) AS max_true FROM d),
      samp AS (SELECT CAST(count(*) AS BIGINT) AS k,
          CAST(max(id) AS BIGINT) AS m
        FROM d WHERE ('0x' || substr(md5('gt|' || CAST(id AS VARCHAR)),
          1, 8))::BIGINT % 10 = 0)
      SELECT tot.n_true, tot.max_true, samp.k, samp.m,
        samp.m + samp.m // samp.k - 1 AS n_est,
        CAST(floor(CAST(samp.m + samp.m // samp.k - 1 - tot.max_true
            AS DOUBLE)
          / CAST(tot.max_true AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
          AS err_vs_max_micro
      FROM samp CROSS JOIN tot""")),

    // ----- sliding 7-day distinct users -----------------------------------
    // Windowed COUNT DISTINCT does NOT decompose over a sliding window
    // (distinct is not subtractable), which is why naive rolling sums
    // get WAU wrong. The exact distributed form: collapse events to
    // DISTINCT (day, user) pairs once, then fan each pair to the ≤7
    // window-end days it supports via a broadcast 0..6 offset grid and
    // count DISTINCT users per end day — the fanout is 7×|distinct
    // day-user pairs|, never 7×|events|, and every stage is an
    // equi-shuffle on the day. Emitted for end days with a full 7-day
    // history inside the observed range.
    ("q317_sliding_distinct_users", (s: SparkSession, dir: String) => {
      import s.implicits._
      val du = Tables.t(s, dir, "events")
        .select(datediff(to_date($"ts".cast("timestamp")),
          lit("1970-01-01").cast("date")).cast("long").as("epd"),
          $"user_id")
        .distinct()
        .localCheckpoint() // reused: range scalar + the offset fanout
      val rng = du.agg(min($"epd").as("mn"), max($"epd").as("mx"))
      val offs = (0L to 6L).map(k => Tuple1(k)).toDF("off")
      du.crossJoin(broadcast(offs))
        .select(($"epd" + $"off").as("endd"), $"user_id")
        .crossJoin(broadcast(rng))
        .filter($"endd" - 6 >= $"mn" && $"endd" <= $"mx")
        .groupBy($"endd")
        .agg(countDistinct($"user_id").as("wau"))
        .orderBy($"endd")
    }, Some("""
      WITH du AS (SELECT DISTINCT
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS epd,
          user_id
        FROM events),
      rng AS (SELECT min(epd) AS mn, max(epd) AS mx FROM du),
      offs AS (SELECT CAST(o AS BIGINT) AS off
        FROM (SELECT unnest(range(7)) AS o)),
      fan AS (SELECT du.epd + offs.off AS endd, du.user_id
        FROM du CROSS JOIN offs CROSS JOIN rng
        WHERE du.epd + offs.off - 6 >= rng.mn AND du.epd + offs.off <= rng.mx)
      SELECT endd, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM fan GROUP BY endd ORDER BY endd"""))
  )
}
