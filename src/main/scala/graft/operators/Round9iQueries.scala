package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-9 batch 9: the sliding-distinct KMV audit — q317's exact
  * WAU against the bottom-k estimate that replaces it when the
  * window's distinct set no longer fits (the scale path, with its
  * error measured per window).
  *
  * (This batch's first draft also carried a 2-D skyline and
  * association rules; both duplicated existing operators — q225 and
  * q226 — and were removed in the round-9 dedup audit.)
  *
  * House rules as elsewhere: integer micro arithmetic, md5-derived
  * hashes, identical aliases both sides, total ORDER BY.
  */
object Round9iQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- sliding 7-day distinct users: KMV audit --------------------------
    // q317 computes WAU exactly by fanning distinct (day, user) pairs
    // — the right answer while the per-window distinct set is small.
    // At billions of users the production form is a mergeable bottom-k
    // (KMV) sketch per day, merged across the window; this operator
    // runs BOTH and reports the estimate's signed error per window,
    // which is the number that decides when the exact form must be
    // retired. KMV here is pure relational algebra (the aggregator
    // form is functions.KmvSketch/q53): h = md5-trunc-8 of the user,
    // per end-day the k = 256 smallest distinct hashes via ONE rank
    // window over the fanned pairs; estimate = (k−1)·2³² div h₍ₖ₎,
    // falling back to the distinct-HASH count when the window holds
    // fewer than k hashes (still an estimate, not exact: a 32-bit
    // collision between two users undercounts by one — negligible at
    // these cardinalities, stated for honesty).
    ("q343_sliding_kmv_audit", (s: SparkSession, dir: String) => {
      import s.implicits._
      val du = Tables.t(s, dir, "events")
        .select(datediff(to_date($"ts".cast("timestamp")),
          lit("1970-01-01").cast("date")).cast("long").as("epd"),
          $"user_id")
        .distinct()
        .withColumn("h",
          conv(substring(md5(concat(lit("wau|"), $"user_id".cast("string"))),
            1, 8), 16, 10).cast("long"))
        .localCheckpoint() // reused: range + fanout (exact and sketch lanes)
      val rng = du.agg(min($"epd").as("mn"), max($"epd").as("mx"))
      val offs = (0L to 6L).map(Tuple1(_)).toDF("off")
      val fan = du.crossJoin(broadcast(offs))
        .select(($"epd" + $"off").as("endd"), $"user_id", $"h")
        .crossJoin(broadcast(rng))
        .filter($"endd" - 6 >= $"mn" && $"endd" <= $"mx")
      val exact = fan.groupBy($"endd")
        .agg(countDistinct($"user_id").as("wau_exact"))
      val ranked = fan.select($"endd", $"h").distinct()
        .withColumn("rn", row_number().over(
          Window.partitionBy($"endd").orderBy($"h")))
      val kth = ranked.groupBy($"endd")
        .agg(max($"rn").as("n_hashes"),
          max(when($"rn" === 256, $"h")).as("hk"))
      exact.join(kth, Seq("endd"))
        .select($"endd", $"wau_exact",
          expr("""CASE WHEN n_hashes < 256 THEN n_hashes
                  ELSE 255 * 4294967296 div hk END""").as("wau_est"))
        .select($"endd", $"wau_exact", $"wau_est",
          expr("""CAST(floor(CAST(wau_est - wau_exact AS DOUBLE)
                / CAST(wau_exact AS DOUBLE) * 1000000 + 0.5) AS BIGINT)""")
            .as("err_micro"))
        .orderBy($"endd")
    }, Some("""
      WITH du AS (SELECT DISTINCT
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS epd,
          user_id
        FROM events),
      duh AS (SELECT epd, user_id,
          ('0x' || substr(md5('wau|' || CAST(user_id AS VARCHAR)), 1, 8))
            ::BIGINT AS h
        FROM du),
      rng AS (SELECT min(epd) AS mn, max(epd) AS mx FROM du),
      offs AS (SELECT CAST(o AS BIGINT) AS off
        FROM (SELECT unnest(range(7)) AS o)),
      fan AS (SELECT duh.epd + offs.off AS endd, duh.user_id, duh.h
        FROM duh CROSS JOIN offs CROSS JOIN rng
        WHERE duh.epd + offs.off - 6 >= rng.mn
          AND duh.epd + offs.off <= rng.mx),
      exact AS (SELECT endd, CAST(count(DISTINCT user_id) AS BIGINT)
          AS wau_exact FROM fan GROUP BY 1),
      ranked AS (SELECT endd, h,
          CAST(row_number() OVER (PARTITION BY endd ORDER BY h) AS BIGINT)
            AS rn
        FROM (SELECT DISTINCT endd, h FROM fan)),
      kth AS (SELECT endd, max(rn) AS n_hashes,
          max(CASE WHEN rn = 256 THEN h END) AS hk
        FROM ranked GROUP BY 1)
      SELECT e.endd, e.wau_exact,
        CASE WHEN k.n_hashes < 256 THEN k.n_hashes
          ELSE 255 * 4294967296 // k.hk END AS wau_est,
        CAST(floor(CAST((CASE WHEN k.n_hashes < 256 THEN k.n_hashes
            ELSE 255 * 4294967296 // k.hk END) - e.wau_exact AS DOUBLE)
          / CAST(e.wau_exact AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
          AS err_micro
      FROM exact e JOIN kth k ON e.endd = k.endd
      ORDER BY e.endd"""))
  )
}
