package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 batch 6: streaming reconciliation and optimizer statistics —
  * the late-data correction merge a watermarked pipeline owes its
  * consumers, and the equi-depth histogram ANALYZE feeds the planner.
  */
object Round8fQueries {

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- late-data reconciliation (emitted + corrections = truth) -------
    // A watermarked streaming aggregate EMITS each window at close +
    // horizon and silently drops later arrivals; the production answer
    // is a reconciliation table: the dropped rows aggregated per window
    // as CORRECTIONS, merged with the emitted result so batch consumers
    // converge to truth (the lambda-architecture contract). Arrival
    // times are synthesized deterministically — 10% of events carry an
    // md5-derived delay up to 30 min — and an event makes the emitted
    // window iff arrival ≤ window_end + 600 s. Everything is a MAP
    // expression over the event row (no global arrival sort — the
    // membership test needs only the event's own delay and its window
    // bound) followed by two aggregates and a full-outer merge on the
    // window key; `match_direct` pins merged == direct recompute per
    // window. At 100 TB this is the periodic correction job next to the
    // streaming query, and its cost is one scan of the late tail.
    ("q216_late_data_reconciliation", (s: SparkSession, dir: String) => {
      import s.implicits._
      val raw = Tables.t(s, dir, "events")
      val tusCol = raw.schema("ts").dataType.typeName match {
        case "timestamp_ntz" => unix_micros($"ts".cast("timestamp"))
        case _ => unix_micros($"ts")
      }
      val ev = raw.select($"event_id", $"value", tusCol.as("tus"))
        .withColumn("delay_s",
          when(conv(substring(md5(concat(lit("d|"), $"event_id".cast("string"))), 1, 8), 16, 10)
            .cast("long") % 10 === 0,
            conv(substring(md5(concat(lit("dd|"), $"event_id".cast("string"))), 1, 8), 16, 10)
              .cast("long") % 1800).otherwise(0L))
        .withColumn("w", expr("tus div 3600000000"))
        .withColumn("v_micro", floor($"value" * 1000000 + lit(0.5)).cast("long"))
        .withColumn("in_emitted",
          ($"tus" + $"delay_s" * 1000000L) <= (($"w" + 1) * 3600000000L + 600000000L))
        .localCheckpoint() // emitted, corrections, and direct-audit branches
      val emitted = ev.filter($"in_emitted").groupBy($"w")
        .agg(count(lit(1)).as("n_emitted"), sum($"v_micro").as("v_emitted_micro"))
      val late = ev.filter(!$"in_emitted").groupBy($"w")
        .agg(count(lit(1)).as("n_late"), sum($"v_micro").as("v_late_micro"))
      val direct = ev.groupBy($"w")
        .agg(count(lit(1)).as("n_direct"), sum($"v_micro").as("v_direct_micro"))
      emitted.join(late, Seq("w"), "full_outer")
        .na.fill(0L, Seq("n_emitted", "v_emitted_micro", "n_late", "v_late_micro"))
        .join(direct, Seq("w"))
        .select($"w".as("wstart_hr"), $"n_emitted", $"n_late", $"v_emitted_micro",
          $"v_late_micro",
          ($"n_emitted" + $"n_late").as("n_final"),
          ($"v_emitted_micro" + $"v_late_micro").as("v_final_micro"),
          when($"n_emitted" + $"n_late" === $"n_direct" &&
            $"v_emitted_micro" + $"v_late_micro" === $"v_direct_micro", 1L)
            .otherwise(0L).as("match_direct"))
        .orderBy("wstart_hr")
    }, Some("""
      WITH ev AS (SELECT event_id, value, epoch_us(ts) AS tus FROM events),
      x AS (SELECT event_id, value, tus,
          CASE WHEN ('0x' || substr(md5('d|' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
            THEN ('0x' || substr(md5('dd|' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 1800
            ELSE 0 END AS delay_s,
          tus // 3600000000 AS w,
          CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_micro
        FROM ev),
      y AS (SELECT *,
          (tus + delay_s * 1000000) <= ((w + 1) * 3600000000 + 600000000) AS in_emitted
        FROM x),
      emitted AS (SELECT w, CAST(count(*) AS BIGINT) AS n_emitted,
          CAST(sum(v_micro) AS BIGINT) AS v_emitted_micro
        FROM y WHERE in_emitted GROUP BY w),
      late AS (SELECT w, CAST(count(*) AS BIGINT) AS n_late,
          CAST(sum(v_micro) AS BIGINT) AS v_late_micro
        FROM y WHERE NOT in_emitted GROUP BY w),
      direct AS (SELECT w, CAST(count(*) AS BIGINT) AS n_direct,
          CAST(sum(v_micro) AS BIGINT) AS v_direct_micro
        FROM y GROUP BY w),
      m AS (SELECT coalesce(e.w, l.w) AS w,
          coalesce(e.n_emitted, 0) AS n_emitted, coalesce(l.n_late, 0) AS n_late,
          coalesce(e.v_emitted_micro, 0) AS v_emitted_micro,
          coalesce(l.v_late_micro, 0) AS v_late_micro
        FROM emitted e FULL OUTER JOIN late l ON l.w = e.w)
      SELECT m.w AS wstart_hr, m.n_emitted, m.n_late, m.v_emitted_micro,
        m.v_late_micro,
        m.n_emitted + m.n_late AS n_final,
        m.v_emitted_micro + m.v_late_micro AS v_final_micro,
        CAST(CASE WHEN m.n_emitted + m.n_late = d.n_direct
          AND m.v_emitted_micro + m.v_late_micro = d.v_direct_micro
          THEN 1 ELSE 0 END AS BIGINT) AS match_direct
      FROM m JOIN direct d ON d.w = m.w ORDER BY wstart_hr""")),

    // ----- equi-depth histogram builder (ANALYZE statistics) --------------
    // The planner statistic behind every selectivity estimate: 8
    // equal-mass buckets per column with boundaries, row counts, and
    // NDVs. Built the scale-safe way: one count aggregate per column to
    // the VALUE GRID (distinct values — bounded for l_quantity, and for
    // money columns pre-quantized to cents, the q126 convention), a
    // cumulative window over that grid (grid-sized, never row-sized),
    // and bucket assignment by the value's cumulative FIRST-row rank —
    // each distinct value lands wholly in one bucket, which is how a
    // real equi-depth histogram resolves heavy values straddling a
    // boundary (bucket masses then deviate from N/8 exactly where heavy
    // hitters sit, and that deviation is itself the skew signal the
    // planner wants). Two columns through one template; per-bucket
    // n_rows / n_values / lo / hi, the artifact ANALYZE would persist.
    ("q217_equidepth_histogram", (s: SparkSession, dir: String) => {
      import s.implicits._
      val li = Tables.t(s, dir, "lineitem")
      val vals = li.select(lit("l_quantity").as("col"),
          $"l_quantity".cast("long").as("v"))
        .unionByName(li.select(lit("price_cents").as("col"),
          floor($"l_extendedprice" * 100 + lit(0.5)).cast("long").as("v")))
      val grid = vals.groupBy($"col", $"v").agg(count(lit(1)).as("cnt"))
      val wg = Window.partitionBy($"col").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val tot = vals.groupBy($"col").agg(count(lit(1)).as("n"))
      val g2 = grid.withColumn("cum_prev", coalesce(sum($"cnt").over(wg), lit(0L)))
        .join(broadcast(tot), "col")
        .withColumn("bucket", expr("least(7, (cum_prev * 8) div n)"))
      g2.groupBy($"col", $"bucket")
        .agg(sum($"cnt").as("n_rows"), count(lit(1)).as("n_values"),
          min($"v").as("lo"), max($"v").as("hi"))
        .orderBy("col", "bucket")
    }, Some("""
      WITH vals AS (
        SELECT 'l_quantity' AS col, CAST(l_quantity AS BIGINT) AS v FROM lineitem
        UNION ALL
        SELECT 'price_cents', CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) FROM lineitem),
      grid AS (SELECT col, v, CAST(count(*) AS BIGINT) AS cnt FROM vals GROUP BY 1, 2),
      tot AS (SELECT col, CAST(count(*) AS BIGINT) AS n FROM vals GROUP BY 1),
      g2 AS (SELECT g.col, g.v, g.cnt,
          CAST(coalesce(sum(g.cnt) OVER (PARTITION BY g.col ORDER BY g.v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_prev,
          t.n
        FROM grid g JOIN tot t ON t.col = g.col),
      b AS (SELECT col, v, cnt, least(7, (cum_prev * 8) // n) AS bucket FROM g2)
      SELECT col, bucket, CAST(sum(cnt) AS BIGINT) AS n_rows,
        CAST(count(*) AS BIGINT) AS n_values,
        min(v) AS lo, max(v) AS hi
      FROM b GROUP BY col, bucket ORDER BY col, bucket"""))
  )
}
