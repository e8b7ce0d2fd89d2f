package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-9 batch 5: the sampled range-partitioner audit (how much
  * partition imbalance does boundary SAMPLING — what Spark's
  * RangePartitioner actually does — cost vs the exact equi-depth
  * floor), Kaplan–Meier time-to-conversion (the censoring-aware
  * survival read naive "average days to purchase" gets wrong), and
  * the inverted-index delta-encoding budget (what the postings lists
  * cost on disk before building them).
  *
  * House rules as elsewhere: integer arithmetic at every gate —
  * including exact bit lengths via length(bin(x)), identical in both
  * engines — identical aliases both sides, total ORDER BY.
  */
object Round9eQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- sampled range-partitioner audit ----------------------------------
    // A range shuffle at 100 TB never computes exact quantile
    // boundaries — it SAMPLES keys and cuts the sample (Spark's
    // RangePartitioner); q217 owns the exact equi-depth statistic.
    // The question that design leaves open is WHAT THE SAMPLING
    // COSTS: for sample rates 1% / 5% / 10% / 100%, cut 31 boundaries
    // from the md5-deterministic sample (boundary p = smallest sample
    // value with 32·cum ≥ p·n_s), assign the FULL corpus, and report
    // the worst partition's overfill vs the ideal n/32 — the number
    // that decides whether a rate suffices or AQE must re-split. The
    // 100% row is the exact-boundary floor (whole-value ties are the
    // residual skew even there). Shapes: sample grids and corpus grid
    // are distinct-value-bounded; assignment is ONE cumulative count
    // of interleaved boundary markers per rate (boundaries sort before
    // equal values: pid = #boundaries ≤ v) — no per-row boundary
    // search, no crossJoin against the corpus.
    ("q331_sampled_range_partitioner", (s: SparkSession, dir: String) => {
      import s.implicits._
      val c = Tables.t(s, dir, "orders")
        .select($"o_orderkey".as("k"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v"))
        .withColumn("h",
          conv(substring(md5(concat(lit("rp|"), $"k".cast("string"))),
            1, 8), 16, 10).cast("long") % 100)
        .localCheckpoint() // reused: 4 sample grids + the corpus grid
      val rates = Seq(1L, 5L, 10L, 100L).map(Tuple1(_)).toDF("r")
      val samp = c.crossJoin(broadcast(rates)).filter($"h" < $"r")
        .groupBy($"r", $"v").agg(count(lit(1)).as("scnt"))
      val ws = Window.partitionBy($"r").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wtot = Window.partitionBy($"r")
      val sg = samp.withColumn("cum", sum($"scnt").over(ws))
        .withColumn("ns", sum($"scnt").over(wtot))
      val bnd = sg
        .withColumn("plo", expr("least(31, 32 * (cum - scnt) div ns)"))
        .withColumn("phi", expr("least(31, 32 * cum div ns)"))
        .filter($"phi" > $"plo")
        .select($"r", $"v", explode(expr("sequence(plo + 1, phi)")).as("p"))
      val grid = c.groupBy($"v").agg(count(lit(1)).as("cnt"))
      val lanes = grid.crossJoin(broadcast(rates))
        .select($"r", $"v", $"cnt", lit(0L).as("isb"))
        .unionByName(bnd.select($"r", $"v", lit(0L).as("cnt"),
          lit(1L).as("isb")))
      val wl = Window.partitionBy($"r").orderBy($"v", desc("isb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val assigned = lanes.withColumn("pid", sum($"isb").over(wl))
        .filter($"isb" === 0)
        .groupBy($"r", $"pid").agg(sum($"cnt").as("pn"))
      val n = c.agg(count(lit(1)).as("n"))
      val nsamp = samp.groupBy($"r").agg(sum($"scnt").as("n_sample"))
      assigned.groupBy($"r")
        .agg(max($"pn").as("max_part_rows"),
          count(lit(1)).as("n_parts_used"))
        .join(broadcast(nsamp), Seq("r"))
        .crossJoin(broadcast(n))
        .select($"r".as("sample_pct"), $"n_sample", $"n_parts_used",
          $"max_part_rows",
          expr("1000000 * max_part_rows * 32 div n - 1000000")
            .as("overfill_micro"))
        .orderBy($"sample_pct")
    }, Some("""
      WITH c AS (SELECT o_orderkey AS k,
          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
          ('0x' || substr(md5('rp|' || CAST(o_orderkey AS VARCHAR)), 1, 8))
            ::BIGINT % 100 AS h
        FROM orders),
      rates AS (SELECT CAST(r AS BIGINT) AS r
        FROM (SELECT unnest([1, 5, 10, 100]) AS r)),
      samp AS (SELECT r, v, CAST(count(*) AS BIGINT) AS scnt
        FROM c CROSS JOIN rates WHERE h < r GROUP BY 1, 2),
      sg AS (SELECT r, v, scnt,
          CAST(sum(scnt) OVER (PARTITION BY r ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum,
          CAST(sum(scnt) OVER (PARTITION BY r) AS BIGINT) AS ns
        FROM samp),
      bnd AS (SELECT r, v,
          CAST(unnest(range(least(31, 32 * (cum - scnt) // ns) + 1,
            least(31, 32 * cum // ns) + 1)) AS BIGINT) AS p
        FROM sg WHERE least(31, 32 * cum // ns)
          > least(31, 32 * (cum - scnt) // ns)),
      grid AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY v),
      lanes AS (SELECT r, v, cnt, CAST(0 AS BIGINT) AS isb
          FROM grid CROSS JOIN rates
        UNION ALL SELECT r, v, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
          FROM bnd),
      assigned AS (SELECT r, pid, CAST(sum(cnt) AS BIGINT) AS pn FROM
        (SELECT r, cnt, isb,
            CAST(sum(isb) OVER (PARTITION BY r ORDER BY v, isb DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS pid
          FROM lanes)
        WHERE isb = 0 GROUP BY 1, 2),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
      nsamp AS (SELECT r, CAST(sum(scnt) AS BIGINT) AS n_sample
        FROM samp GROUP BY 1)
      SELECT a.r AS sample_pct, nsamp.n_sample,
        CAST(count(*) AS BIGINT) AS n_parts_used,
        max(a.pn) AS max_part_rows,
        1000000 * max(a.pn) * 32 // max(n.n) - 1000000 AS overfill_micro
      FROM assigned a JOIN nsamp ON a.r = nsamp.r CROSS JOIN n
      GROUP BY a.r, nsamp.n_sample ORDER BY sample_pct""")),

    // ----- Kaplan–Meier time-to-conversion ---------------------------------
    // "Average days from signup to purchase" silently drops every user
    // who has not converted YET — survival analysis keeps them as
    // right-censored at the end of observation. Cohort = users with a
    // signup; event day = first purchase strictly after it (the q325
    // strict rule); censor day = last observed day. Per event day t:
    // at-risk n_t (event-or-censor day ≥ t), events d_t, hazard
    // d_t/n_t, and the KM survival carried as the CUMULATIVE MICRO-LN
    // Σ ln(1 − d/n) = Σ (lnm(n−d) − lnm(n)) — the product-limit
    // estimator in the battery's exact-integer log domain (S(t) =
    // exp(cum/1e6); the ln floors once per factor, the documented
    // micro-ln rule). Shapes: two user-keyed aggregates, a day-grid
    // suffix-cumulative window (grid-bounded), and one prefix window.
    ("q332_kaplan_meier", (s: SparkSession, dir: String) => {
      import s.implicits._
      val raw = Tables.t(s, dir, "events")
      val tus = raw.schema("ts").dataType.typeName match {
        case "timestamp_ntz" => unix_micros($"ts".cast("timestamp"))
        case _ => unix_micros($"ts")
      }
      val e = raw.select($"user_id".as("u"), $"event_type".as("et"),
        tus.as("tm")).localCheckpoint() // reused: cohort, events, horizon
      val s1 = e.filter($"et" === "signup").groupBy($"u")
        .agg(min($"tm").as("t1"))
      val ev = e.filter($"et" === "purchase").join(s1, Seq("u"))
        .filter($"tm" > $"t1").groupBy($"u").agg(min($"tm").as("tp"))
      val hor = e.agg(max($"tm").as("th"))
      val uu = s1.join(ev, Seq("u"), "left").crossJoin(broadcast(hor))
        .select($"u",
          when($"tp".isNotNull, lit(1L)).otherwise(lit(0L)).as("is_event"),
          when($"tp".isNotNull, expr("(tp - t1) div 86400000000"))
            .otherwise(expr("(th - t1) div 86400000000")).as("d"))
      val grid = uu.groupBy($"d")
        .agg(sum($"is_event").as("d_events"),
          (count(lit(1)) - sum($"is_event")).as("d_censored"))
      val wRisk = Window.orderBy($"d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val wCum = Window.orderBy($"d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid
        .withColumn("n_risk", sum($"d_events" + $"d_censored").over(wRisk))
        .filter($"d_events" > 0)
        .withColumn("lnterm",
          // a day where survival hits exactly 0 (n_risk = d_events) is
          // outside the log domain; its term is NULL in BOTH engines
          // (ln(0) would be -inf here and an error in DuckDB) and both
          // window sums skip NULL identically
          expr("""CASE WHEN n_risk = d_events THEN NULL
                ELSE CAST(floor(ln(CAST(n_risk - d_events AS DOUBLE)) * 1000000
                    + 0.5) AS BIGINT)
                - CAST(floor(ln(CAST(n_risk AS DOUBLE)) * 1000000 + 0.5)
                    AS BIGINT) END"""))
        .withColumn("cum_ln_surv_micro", sum($"lnterm").over(wCum))
        .select($"d".as("day"), $"n_risk", $"d_events",
          expr("1000000 * d_events div n_risk").as("hazard_micro"),
          $"cum_ln_surv_micro")
        .orderBy($"day")
    }, Some("""
      WITH e AS (SELECT user_id AS u, event_type AS et,
          epoch_us(CAST(ts AS TIMESTAMP)) AS tm FROM events),
      s1 AS (SELECT u, min(tm) AS t1 FROM e WHERE et = 'signup' GROUP BY u),
      ev AS (SELECT e.u, min(e.tm) AS tp FROM e JOIN s1 ON e.u = s1.u
        WHERE e.et = 'purchase' AND e.tm > s1.t1 GROUP BY e.u),
      hor AS (SELECT max(tm) AS th FROM e),
      uu AS (SELECT s1.u,
          CASE WHEN ev.tp IS NOT NULL THEN CAST(1 AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS is_event,
          CASE WHEN ev.tp IS NOT NULL THEN (ev.tp - s1.t1) // 86400000000
            ELSE (hor.th - s1.t1) // 86400000000 END AS d
        FROM s1 LEFT JOIN ev ON s1.u = ev.u CROSS JOIN hor),
      grid AS (SELECT d, CAST(sum(is_event) AS BIGINT) AS d_events,
          CAST(count(*) - sum(is_event) AS BIGINT) AS d_censored
        FROM uu GROUP BY d),
      risk AS (SELECT d, d_events,
          CAST(sum(d_events + d_censored) OVER (ORDER BY d
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
            AS n_risk
        FROM grid),
      terms AS (SELECT d, n_risk, d_events,
          CASE WHEN n_risk = d_events THEN NULL
          ELSE CAST(floor(ln(CAST(n_risk - d_events AS DOUBLE)) * 1000000
            + 0.5) AS BIGINT)
          - CAST(floor(ln(CAST(n_risk AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
          END AS lnterm
        FROM risk WHERE d_events > 0)
      SELECT d AS day, n_risk, d_events,
        1000000 * d_events // n_risk AS hazard_micro,
        CAST(sum(lnterm) OVER (ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_ln_surv_micro
      FROM terms ORDER BY day""")),

    // ----- inverted-index delta-encoding budget ----------------------------
    // Before building a token index over the corpus, price it: sorted
    // postings lists store doc-id GAPS, and a gap costs exactly
    // length(bin(gap)) bits raw (plus the same again minus one under
    // Elias-γ — the length prefix). One distinct (token, doc) pass,
    // one lag window partitioned by TOKEN (co-partitioned, no global
    // sort), exact bit lengths via the engines' shared bin() string —
    // no float log2 at power-of-two boundaries. The single-row budget:
    // postings count, vocabulary, total γ and raw-binary bits vs the
    // 64-bit-per-posting baseline, compression ratio in micro. First
    // posting in each list encodes doc_id + 1 (absolute, gap-coded
    // against −1).
    ("q333_postings_budget", (s: SparkSession, dir: String) => {
      import s.implicits._
      val st = Tables.spread(Tables.t(s, dir, "documents"))
        .select(explode(split(TA.normText($"text"), " ")).as("tok"), $"doc_id")
        .filter($"tok" =!= "").distinct()
      val wt = Window.partitionBy($"tok").orderBy($"doc_id")
      val gaps = st.withColumn("gap",
          $"doc_id" - coalesce(lag($"doc_id", 1).over(wt), lit(-1L)))
        .select($"tok", length(bin($"gap")).cast("long").as("bits"))
      gaps.agg(count(lit(1)).as("n_postings"),
          countDistinct($"tok").as("n_tokens"),
          sum($"bits").as("bin_bits"),
          sum($"bits" * 2 - 1).as("gamma_bits"))
        .select($"n_postings", $"n_tokens", $"bin_bits", $"gamma_bits",
          (lit(64L) * $"n_postings").as("raw_bits"),
          expr("1000000 * gamma_bits div (64 * n_postings)")
            .as("gamma_ratio_micro"))
    }, Some(s"""
      WITH st AS (SELECT DISTINCT tok, doc_id FROM
        (SELECT unnest(string_split($normSql, ' ')) AS tok, doc_id
         FROM documents) WHERE tok <> ''),
      gaps AS (SELECT tok,
          CAST(length(bin(doc_id - coalesce(lag(doc_id, 1) OVER
            (PARTITION BY tok ORDER BY doc_id), -1))) AS BIGINT) AS bits
        FROM st)
      SELECT CAST(count(*) AS BIGINT) AS n_postings,
        CAST(count(DISTINCT tok) AS BIGINT) AS n_tokens,
        CAST(sum(bits) AS BIGINT) AS bin_bits,
        CAST(sum(bits * 2 - 1) AS BIGINT) AS gamma_bits,
        64 * CAST(count(*) AS BIGINT) AS raw_bits,
        1000000 * CAST(sum(bits * 2 - 1) AS BIGINT)
          // (64 * CAST(count(*) AS BIGINT)) AS gamma_ratio_micro
      FROM gaps"""))
  )
}
