package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 32: an EWMA control chart in exact trailing-window
  * weights (the smoother-memory alarm between q168's median gate and
  * q265's CUSUM), capture–recapture + Chao1 vocabulary-size estimation
  * (how big is the vocabulary you HAVEN'T seen — the sample-based
  * answer q306's growth curve extrapolates), and a context-window
  * truncation-loss table (what fraction of tokens a context limit
  * throws away — the first number a packing policy needs before
  * q246/q291 optimize what's left).
  *
  * House rules as elsewhere: integer arithmetic at every gate (EWMA
  * weights are exact 7^k·8^(15−k) integers, 128-bit where the
  * weighted sums scale), one identical double sqrt on final rows,
  * identical aliases both sides, total ORDER BY.
  */
object Round8afQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- EWMA control chart (exact trailing-16 weights) -----------------
    // The classic λ=1/8 EWMA z_t = (7·z_{t−1} + x_t)/8 is a recursion —
    // hostile to both engines — but its trailing-16 truncation is a
    // CLOSED FORM: z_t = Σ_{k=0..15} 7^k·8^(15−k)·x_{t−k} / 8^16, with
    // every weight an exact Int64 (7^15·1 and 1·8^15 both < 2^53, so
    // pow() is exact in both engines) and the truncation error < (7/8)^16
    // ≈ 12% of weight mass, absorbed into the statistic's definition.
    // Distributed shape: the corpus collapses to the day grid, the 16
    // lags ride ONE equi-join against a broadcast lag table (the q287
    // pattern), the weighted sum runs in DECIMAL(38,0), and the alarm
    // compares |1e6·x_t − z_t| against 3σ̂ with σ̂ from exact integer
    // central sums and the one final sqrt. Only days with a full
    // 16-day history are emitted (HAVING count = 16).
    ("q312_ewma_control_chart", (s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.t(s, dir, "events")
        .select(datediff(to_date($"ts".cast("timestamp")),
          lit("1970-01-01").cast("date")).cast("long").as("epd"))
        .groupBy($"epd").agg(count(lit(1)).as("x"))
        .localCheckpoint() // reused: moments + both sides of the lag join
      val m = daily.agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      val sig = m.select(
        expr("""CAST(floor(sqrt(CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx
            AS DOUBLE)) / CAST(n AS DOUBLE) * 1000000 + 0.5) AS BIGINT)""")
          .as("sigma_micro"))
      val lags = (0L to 15L).map(k => Tuple1(k)).toDF("k")
      val z = daily.select($"epd".as("t")).crossJoin(broadcast(lags))
        .withColumn("src", $"t" - $"k")
        .join(daily.select($"epd".as("src"), $"x".as("xs")), Seq("src"))
        .groupBy($"t")
        .agg(count(lit(1)).as("nw"),
          sum(expr("""CAST(CAST(pow(7, k) AS BIGINT)
              * CAST(pow(8, 15 - k) AS BIGINT) AS DECIMAL(38,0)) * xs"""))
            .as("wsum"))
        .filter($"nw" === 16)
        .select($"t",
          expr("CAST(1000000 * wsum div CAST(pow(8, 16) AS DECIMAL(38,0)) AS BIGINT)")
            .as("ewma_micro"))
      z.join(daily.select($"epd".as("t"), $"x"), Seq("t"))
        .crossJoin(broadcast(sig))
        .select($"t".as("epd"), $"x", $"ewma_micro",
          when(abs($"x" * 1000000L - $"ewma_micro") >
            lit(3L) * $"sigma_micro", 1L).otherwise(0L).as("alarm"))
        .orderBy($"epd")
    }, Some("""
      WITH daily AS (SELECT
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS epd,
          CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT)
          AS sx, sum(CAST(x AS HUGEINT) * x) AS sxx FROM daily),
      sig AS (SELECT CAST(floor(sqrt(CAST(n * sxx - CAST(sx AS HUGEINT) * sx
          AS DOUBLE)) / CAST(n AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
          AS sigma_micro FROM m),
      lags AS (SELECT CAST(k AS BIGINT) AS k
        FROM (SELECT unnest(range(16)) AS k)),
      z AS (SELECT g.t,
          CAST(1000000 * sum(CAST(CAST(pow(7, l.k) AS BIGINT)
            * CAST(pow(8, 15 - l.k) AS BIGINT) AS HUGEINT) * d.x)
            // CAST(pow(8, 16) AS HUGEINT) AS BIGINT) AS ewma_micro,
          count(*) AS nw
        FROM (SELECT epd AS t FROM daily) g
        CROSS JOIN lags l JOIN daily d ON d.epd = g.t - l.k
        GROUP BY 1 HAVING count(*) = 16)
      SELECT z.t AS epd, d.x, z.ewma_micro,
        CAST(CASE WHEN abs(d.x * 1000000 - z.ewma_micro)
          > 3 * s.sigma_micro THEN 1 ELSE 0 END AS BIGINT) AS alarm
      FROM z JOIN daily d ON d.epd = z.t CROSS JOIN sig s
      ORDER BY epd""")),

    // ----- capture–recapture + Chao1 vocabulary estimation ----------------
    // q306 fits HOW FAST vocabulary grows; this estimates WHERE IT
    // ENDS from samples alone: Lincoln–Petersen n1·n2/m over two
    // md5-disjoint document halves (each half a "capture", shared
    // types the "marked recaptures"), and bias-corrected Chao1
    // V_obs + f1(f1−1)/(2(f2+1)) (the bc form: defined even when a
    // closed vocabulary drives f2 to zero), i.e. f1²/(2·f2)
    // from the frequency-1/frequency-2 type counts — the species-
    // richness pair every corpus-coverage claim leans on. Both
    // compare against the TRUE distinct count, with signed micro
    // errors through the double-floor form. Shape: one tokenize pass,
    // two distinct aggregates and a frequency histogram — all
    // hash-partitioned on the token, nothing corpus-squared.
    ("q313_vocab_capture_recapture", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id",
          explode(split(TA.normText($"text"), " ")).as("tok"))
        .withColumn("half",
          conv(substring(md5(concat(lit("cr|"), $"doc_id".cast("string"))),
            1, 8), 16, 10).cast("long") % 2)
        .localCheckpoint() // reused: halves, truth, frequency histogram
      val perTok = toks.groupBy($"tok")
        .agg(max(when($"half" === 0, 1L).otherwise(0L)).as("in1"),
          max(when($"half" === 1, 1L).otherwise(0L)).as("in2"),
          countDistinct($"doc_id").as("df"))
        .localCheckpoint()
      val caps = perTok.agg(sum($"in1").as("n1"), sum($"in2").as("n2"),
        sum($"in1" * $"in2").as("mm"), count(lit(1)).as("v_true"),
        sum(when($"df" === 1, 1L).otherwise(0L)).as("f1"),
        sum(when($"df" === 2, 1L).otherwise(0L)).as("f2"))
      caps.select($"v_true", $"n1", $"n2", $"mm", $"f1", $"f2",
          // mm = 0 (no shared types — tiny/skewed corpora) must yield
          // NULL in BOTH engines: Spark's div would return NULL but
          // DuckDB's // raises, so the guard is explicit.
          expr("CASE WHEN mm = 0 THEN NULL ELSE n1 * n2 div mm END")
            .as("lp_est"),
          expr("v_true + f1 * (f1 - 1) div (2 * (f2 + 1))").as("chao1_est"))
        .select($"v_true", $"n1", $"n2", $"mm", $"f1", $"f2", $"lp_est",
          $"chao1_est",
          expr("""CAST(floor(CAST(lp_est - v_true AS DOUBLE)
              / CAST(v_true AS DOUBLE) * 1000000 + 0.5) AS BIGINT)""")
            .as("lp_err_micro"),
          expr("""CAST(floor(CAST(chao1_est - v_true AS DOUBLE)
              / CAST(v_true AS DOUBLE) * 1000000 + 0.5) AS BIGINT)""")
            .as("chao1_err_micro"))
    }, Some(s"""
      WITH toks AS (SELECT doc_id,
          unnest(string_split($normSql, ' ')) AS tok,
          ('0x' || substr(md5('cr|' || CAST(doc_id AS VARCHAR)), 1, 8))
            ::BIGINT % 2 AS half
        FROM documents),
      pertok AS (SELECT tok,
          CAST(max(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS in1,
          CAST(max(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS in2,
          CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks GROUP BY 1),
      caps AS (SELECT CAST(sum(in1) AS BIGINT) AS n1,
          CAST(sum(in2) AS BIGINT) AS n2,
          CAST(sum(in1 * in2) AS BIGINT) AS mm,
          CAST(count(*) AS BIGINT) AS v_true,
          CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
          CAST(sum(CASE WHEN df = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        FROM pertok)
      SELECT v_true, n1, n2, mm, f1, f2,
        CASE WHEN mm = 0 THEN NULL ELSE n1 * n2 // mm END AS lp_est,
        v_true + f1 * (f1 - 1) // (2 * (f2 + 1)) AS chao1_est,
        CAST(floor(CAST(
            (CASE WHEN mm = 0 THEN NULL ELSE n1 * n2 // mm END) - v_true
            AS DOUBLE)
          / CAST(v_true AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
          AS lp_err_micro,
        CAST(floor(CAST(v_true + f1 * (f1 - 1) // (2 * (f2 + 1)) - v_true
            AS DOUBLE)
          / CAST(v_true AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
          AS chao1_err_micro
      FROM caps""")),

    // ----- context-window truncation-loss table ---------------------------
    // Before q246 packs and q291 batches, a pipeline must pick the
    // context length — and the first number that decision needs is
    // what each candidate limit THROWS AWAY. Per window W ∈ {16, 32,
    // 64, 128} tokens: documents over the limit, total vs kept tokens
    // (kept = Σ min(n_toks, W)), and the token-loss fraction in micro.
    // One tokenize-count pass collapses the corpus to |docs| metadata
    // rows; the four windows ride a broadcast grid over that compacted
    // table — the q306 shape, nothing corpus-sized repeated.
    ("q314_truncation_loss", (s: SparkSession, dir: String) => {
      import s.implicits._
      val perDoc = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id",
          explode(split(TA.normText($"text"), " ")).as("tok"))
        .groupBy($"doc_id").agg(count(lit(1)).as("nt"))
      val ws = Seq(16L, 32L, 64L, 128L).map(Tuple1(_)).toDF("w")
      perDoc.crossJoin(broadcast(ws))
        .groupBy($"w")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"nt" > $"w", 1L).otherwise(0L)).as("n_docs_over"),
          sum($"nt").as("tokens_total"),
          sum(least($"nt", $"w")).as("tokens_kept"))
        .select($"w", $"n_docs", $"n_docs_over", $"tokens_total",
          $"tokens_kept",
          expr("1000000 * (tokens_total - tokens_kept) div tokens_total")
            .as("loss_micro"))
        .orderBy($"w")
    }, Some(s"""
      WITH perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nt FROM
        (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
         FROM documents) GROUP BY 1),
      ws AS (SELECT CAST(w AS BIGINT) AS w
        FROM (SELECT unnest([16, 32, 64, 128]) AS w))
      SELECT w, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN nt > w THEN 1 ELSE 0 END) AS BIGINT)
          AS n_docs_over,
        CAST(sum(nt) AS BIGINT) AS tokens_total,
        CAST(sum(least(nt, w)) AS BIGINT) AS tokens_kept,
        CAST(1000000 * (CAST(sum(nt) AS BIGINT)
          - CAST(sum(least(nt, w)) AS BIGINT))
          // CAST(sum(nt) AS BIGINT) AS BIGINT) AS loss_micro
      FROM perdoc CROSS JOIN ws GROUP BY w ORDER BY w"""))
  )
}
