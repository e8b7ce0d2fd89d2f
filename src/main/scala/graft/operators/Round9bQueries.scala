package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-9 batch 2: single-pass column profiling (the Deequ-style
  * completeness/distinctness/min-max audit every ingestion pipeline
  * runs before trusting a table), median/MAD robust outlier detection
  * (the heavy-tail-safe alternative to the q178-era mean/σ z-score),
  * and frequent-items sketch capacity planning (which counter budget k
  * GUARANTEES the true top-10 survives any Misra–Gries/space-saving
  * merge — the capacity-side companion to q155's count-min error and
  * q311's collision audit).
  *
  * House rules as elsewhere: integer arithmetic at every gate (money
  * as cents, dates as epoch days), identical aliases both sides, total
  * ORDER BY.
  */
object Round9bQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- typed column profile (numeric-correct min/max) -----------------
    // q125 profiles columns through a STRING unpivot — cross-engine
    // safe, but its min/max are lexicographic ('10.0' < '2.0'), which
    // is the wrong answer for planning range partitions or validating
    // bounds on a numeric column. This profile maps each column to a
    // deterministic INTEGER domain first (cents, epoch days, the house
    // money/date rules — injective, so distinct counts equal the raw
    // columns') and unpivots to (col_name, BIGINT value), so min/max
    // are numerically correct; the lone string column (returnflag)
    // rides a separate tiny aggregate with the same output schema.
    // Shape follows q125's documented rule, NOT the multi-distinct
    // form: Spark expands a 5-way count-distinct into 5 copies of
    // every row before the shuffle (Expand — measured 9.1 s vs 1.3 s
    // for this shape at sf0.1), while the stack-unpivot dedups per
    // (column, value) map-side before anything wide shuffles.
    // WIDE-SCHEMA rule (WideProbe, bench/r11_wide.json): one stack()
    // feeds ONE per-task partial-agg hash map covering every lane's
    // (col, value) grid — past ~16 lanes that map exceeds the
    // aggregate budget and falls back to sort-spill (15.6× slower and
    // erratic at 64 columns). Profile wider tables as a UNION of
    // ≤16-column stack chunks: row-identical output, same bytes read
    // (columnar pruning), per-branch maps that fit.
    ("q322_column_profile", (s: SparkSession, dir: String) => {
      import s.implicits._
      val num = Tables.t(s, dir, "lineitem").select(expr(
        """stack(4,
           'l_orderkey', l_orderkey,
           'l_quantity_int', CAST(l_quantity AS BIGINT),
           'l_extendedprice_cents',
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
           'l_shipdate_epd',
             CAST(datediff(to_date(l_shipdate), DATE '1970-01-01') AS BIGINT)
           ) AS (col_name, v)"""))
        .groupBy($"col_name", $"v").agg(count(lit(1)).as("c"))
        .groupBy($"col_name")
        .agg(sum($"c").as("n_rows"),
          count(when($"v".isNotNull, lit(1))).as("n_distinct"),
          sum(when($"v".isNull, $"c").otherwise(0L)).as("n_null"),
          min($"v").cast("string").as("min_val"),
          max($"v").cast("string").as("max_val"))
      val flag = Tables.t(s, dir, "lineitem")
        .groupBy($"l_returnflag".as("v")).agg(count(lit(1)).as("c"))
        .agg(lit("l_returnflag").as("col_name"), sum($"c").as("n_rows"),
          count(when($"v".isNotNull, lit(1))).as("n_distinct"),
          sum(when($"v".isNull, $"c").otherwise(0L)).as("n_null"),
          min($"v").as("min_val"), max($"v").as("max_val"))
      num.unionByName(flag)
        .select($"col_name", $"n_rows", $"n_distinct", $"n_null",
          expr("1000000 * (n_rows - n_null) div n_rows")
            .as("completeness_micro"),
          $"min_val", $"max_val")
        .orderBy($"col_name")
    }, Some("""
      WITH p AS (SELECT l_orderkey AS c1,
          CAST(l_quantity AS BIGINT) AS c2,
          CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c3,
          l_returnflag AS c4,
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(l_shipdate AS DATE)) AS BIGINT) AS c5
        FROM lineitem),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(count(DISTINCT c1) AS BIGINT) AS d1,
          CAST(sum(CASE WHEN c1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS x1,
          CAST(min(c1) AS VARCHAR) AS mn1, CAST(max(c1) AS VARCHAR) AS mx1,
          CAST(count(DISTINCT c2) AS BIGINT) AS d2,
          CAST(sum(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS x2,
          CAST(min(c2) AS VARCHAR) AS mn2, CAST(max(c2) AS VARCHAR) AS mx2,
          CAST(count(DISTINCT c3) AS BIGINT) AS d3,
          CAST(sum(CASE WHEN c3 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS x3,
          CAST(min(c3) AS VARCHAR) AS mn3, CAST(max(c3) AS VARCHAR) AS mx3,
          CAST(count(DISTINCT c4) AS BIGINT) AS d4,
          CAST(sum(CASE WHEN c4 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS x4,
          CAST(min(c4) AS VARCHAR) AS mn4, CAST(max(c4) AS VARCHAR) AS mx4,
          CAST(count(DISTINCT c5) AS BIGINT) AS d5,
          CAST(sum(CASE WHEN c5 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS x5,
          CAST(min(c5) AS VARCHAR) AS mn5, CAST(max(c5) AS VARCHAR) AS mx5
        FROM p)
      SELECT col_name, n_rows, n_distinct, n_null,
        1000000 * (n_rows - n_null) // n_rows AS completeness_micro,
        min_val, max_val
      FROM (
        SELECT 'l_orderkey' AS col_name, n AS n_rows, d1 AS n_distinct,
          x1 AS n_null, mn1 AS min_val, mx1 AS max_val FROM a
        UNION ALL SELECT 'l_quantity_int', n, d2, x2, mn2, mx2 FROM a
        UNION ALL SELECT 'l_extendedprice_cents', n, d3, x3, mn3, mx3 FROM a
        UNION ALL SELECT 'l_returnflag', n, d4, x4, mn4, mx4 FROM a
        UNION ALL SELECT 'l_shipdate_epd', n, d5, x5, mn5, mx5 FROM a)
      ORDER BY col_name""")),

    // ----- σ-consistent robust z outliers (money column) ------------------
    // Mean/σ outlier rules break exactly when needed most: one extreme
    // value inflates σ until nothing is an outlier (masking). q126
    // counts plain 3-MAD token-length outliers per source; this is the
    // σ-CONSISTENT form on a money column — flag |x − median| >
    // 3 · 1.4826 · MAD, where 1.4826 ≈ 1/Φ⁻¹(3/4) rescales MAD to σ
    // under normality, so "3" means the same thing it does in a z-rule
    // (q126's unscaled 3-MAD is a ~4.4σ gate). 50% breakdown point
    // either way. Everything runs on the o_totalprice CENTS grid:
    // value-grid cumulative windows (the q195/q276 documented bound —
    // the window is over DISTINCT values, not rows), lower-median
    // convention rank = (n+1) div 2 for engine-identical medians, and
    // the 1.4826 consistency constant as the integer comparison
    // dev · 10000 > 3 · 14826 · mad, so no doubles anywhere.
    ("q323_mad_outliers", (s: SparkSession, dir: String) => {
      import s.implicits._
      val c = Tables.t(s, dir, "orders")
        .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v"))
        .localCheckpoint() // reused: median grid + deviation grid + flags
      val n = c.agg(count(lit(1)).as("n"))
      val wv = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = c.groupBy($"v").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum($"cnt").over(wv))
        .crossJoin(broadcast(n))
        .filter($"cum" >= expr("(n + 1) div 2"))
        .agg(min($"v").as("med"))
      val dev = c.crossJoin(broadcast(med))
        .select(abs($"v" - $"med").as("d"), $"med")
      val wd = Window.orderBy($"d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mad = dev.groupBy($"d").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum($"cnt").over(wd))
        .crossJoin(broadcast(n))
        .filter($"cum" >= expr("(n + 1) div 2"))
        .agg(min($"d").as("mad"))
      dev.crossJoin(broadcast(mad))
        .crossJoin(broadcast(n))
        .agg(max($"n").as("n_rows"), max($"med").as("med_cents"),
          max($"mad").as("mad_cents"),
          sum(when(expr("d * 10000 > 3 * 14826 * mad"), 1L).otherwise(0L))
            .as("n_outliers"),
          max($"d").as("max_dev_cents"))
        .select($"n_rows", $"med_cents", $"mad_cents", $"n_outliers",
          expr("1000000 * n_outliers div n_rows").as("outlier_share_micro"),
          $"max_dev_cents")
    }, Some("""
      WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        FROM orders),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
      medg AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
          CAST(sum(count(*)) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum
        FROM c GROUP BY v),
      med AS (SELECT min(v) AS med FROM medg CROSS JOIN n
        WHERE cum >= (n + 1) // 2),
      dev AS (SELECT abs(v - med) AS d, med FROM c CROSS JOIN med),
      madg AS (SELECT d, CAST(count(*) AS BIGINT) AS cnt,
          CAST(sum(count(*)) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum
        FROM dev GROUP BY d),
      mad AS (SELECT min(d) AS mad FROM madg CROSS JOIN n
        WHERE cum >= (n + 1) // 2)
      SELECT max(n.n) AS n_rows, max(dev.med) AS med_cents,
        max(mad.mad) AS mad_cents,
        CAST(sum(CASE WHEN dev.d * 10000 > 3 * 14826 * mad.mad
          THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        1000000 * CAST(sum(CASE WHEN dev.d * 10000 > 3 * 14826 * mad.mad
          THEN 1 ELSE 0 END) AS BIGINT) // max(n.n) AS outlier_share_micro,
        max(dev.d) AS max_dev_cents
      FROM dev CROSS JOIN mad CROSS JOIN n""")),

    // ----- frequent-items sketch capacity planning ------------------------
    // Misra–Gries / space-saving with k counters guarantees (merge-
    // order independent) that any item with frequency f > N/(k+1)
    // survives the sketch — the contrapositive of the count bound.
    // This turns the guarantee into a capacity plan over the corpus
    // vocabulary: for each counter budget k in a 5-point grid, the
    // guarantee threshold N div (k+1), how many types clear it, and
    // how many of the TRUE top-10 types (frequency desc, token asc —
    // total order) are guaranteed captured. The smallest k whose
    // top10_guaranteed reads 10 is the budget to ship. One tokenize
    // pass → vocab-bounded counts; the top-10 rank is one window over
    // the VOCAB grid (the documented q195-class bound), the k-grid a
    // 5-row broadcast.
    ("q324_sketch_capacity", (s: SparkSession, dir: String) => {
      import s.implicits._
      // distributed vocab rank (r14; was a single-partition window over
      // the whole vocabulary): GridRank range-buckets on f — bit-identical
      // row numbers, bounded per-task state (GridRankSpec)
      val f = graft.ext.GridRank.withRowNumber(
          Tables.spread(Tables.t(s, dir, "documents"))
            .select(explode(split(TA.normText($"text"), " ")).as("tok"))
            .filter($"tok" =!= "")
            .groupBy($"tok").agg(count(lit(1)).as("f")),
          "f", Seq($"tok"), "rn", descending = true)
        .localCheckpoint() // reused per k-grid row
      val tot = f.agg(sum($"f").as("nn"))
      val ks = Seq(8L, 16L, 32L, 64L, 128L).map(Tuple1(_)).toDF("k")
      f.crossJoin(broadcast(ks)).crossJoin(broadcast(tot))
        .groupBy($"k")
        .agg(max(expr("nn div (k + 1)")).as("thr"),
          sum(when(expr("f > nn div (k + 1)"), 1L).otherwise(0L))
            .as("n_guaranteed"),
          sum(when(expr("rn <= 10 AND f > nn div (k + 1)"), 1L)
            .otherwise(0L)).as("top10_guaranteed"))
        .orderBy($"k")
    }, Some(s"""
      WITH f AS (SELECT tok, CAST(count(*) AS BIGINT) AS f,
          CAST(row_number() OVER (ORDER BY count(*) DESC, tok) AS BIGINT)
            AS rn
        FROM (SELECT unnest(string_split($normSql, ' ')) AS tok
              FROM documents)
        WHERE tok <> '' GROUP BY tok),
      tot AS (SELECT CAST(sum(f) AS BIGINT) AS nn FROM f),
      ks AS (SELECT CAST(k AS BIGINT) AS k
        FROM (SELECT unnest([8, 16, 32, 64, 128]) AS k))
      SELECT k, max(nn // (k + 1)) AS thr,
        CAST(sum(CASE WHEN f > nn // (k + 1) THEN 1 ELSE 0 END) AS BIGINT)
          AS n_guaranteed,
        CAST(sum(CASE WHEN rn <= 10 AND f > nn // (k + 1) THEN 1 ELSE 0 END)
          AS BIGINT) AS top10_guaranteed
      FROM f CROSS JOIN ks CROSS JOIN tot
      GROUP BY k ORDER BY k"""))
  )
}
