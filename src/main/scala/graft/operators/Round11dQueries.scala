package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-11 batch 4: the COMPOSED statistics layer — each operator
  * builds on machinery another battery query already ships (and the
  * Spark helper + oracle CTE are literally shared constants, the
  * q321-AaCap / q300-AriExprSql discipline): Dunn's post-hoc on
  * q357's rank grid, Friedman/Kendall-W on weekday blocks, the
  * Ljung–Box portmanteau over q287's centered-integer ACF trick,
  * Brown–Forsythe variance equality from per-source value grids,
  * McNemar's paired-gate test, and Cochran's Q over q355's rule
  * battery. Float discipline unchanged: integer/DECIMAL to the end,
  * then one deterministic double chain (Friedman and Cochran reduce
  * to a SINGLE integer division).
  */
object Round11dQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** Bonferroni critical value for q366's 20-source Dunn family:
    * Φ⁻¹(1 − 0.05 / (2 · 190)) for the m = k(k−1)/2 = 190 pairwise
    * comparisons at family α = 0.05 — precomputed, documented, and
    * interpolated into BOTH engines so the dial cannot desynchronize
    * them (the q321 AaCap lesson).
    */
  val DunnZCrit = "3.6555"

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- Dunn's post-hoc pairwise rank tests ----------------------------
    // q357 says "SOME source differs"; Dunn answers WHICH pairs, from
    // the SAME shared rank tables (Round11bQueries.sourceRankTables /
    // SourceRankSql — zero recomputation drift possible): z_ij =
    // (R̄_i − R̄_j) / sqrt((N(N+1)/12 − T/(12(N−1)))·(1/n_i + 1/n_j)),
    // flagged at the precomputed Bonferroni z* for the 190-pair
    // family. The pair space is the 20-row per-source table's
    // broadcast self-join — nothing data-scale moves.
    ("q366_dunn_posthoc", (s: SparkSession, dir: String) => {
      import s.implicits._
      val (rj, totals) = Round11bQueries.sourceRankTables(s, dir)
      val a = rj.select($"source".as("src_a"), $"nj".as("na"), $"rj2".as("ra2"))
      val b = rj.select($"source".as("src_b"), $"nj".as("nb"), $"rj2".as("rb2"))
      a.crossJoin(broadcast(b)).filter($"src_a" < $"src_b")
        .crossJoin(broadcast(totals))
        .withColumn("z", expr(
          """(CAST(ra2 AS DOUBLE)/(2.0*CAST(na AS DOUBLE)) - CAST(rb2 AS DOUBLE)/(2.0*CAST(nb AS DOUBLE)))
             / sqrt((CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)+1.0)/12.0
                     - CAST(tsum AS DOUBLE)/(12.0*(CAST(n AS DOUBLE)-1.0)))
                    * (1.0/CAST(na AS DOUBLE) + 1.0/CAST(nb AS DOUBLE)))"""))
        .select($"src_a", $"src_b", $"z",
          (abs($"z") >= expr(DunnZCrit)).as("significant"))
        .orderBy($"src_a", $"src_b")
    }, Some(s"""
      WITH ${Round11bQueries.SourceRankSql},
      p AS (SELECT a.source AS src_a, b.source AS src_b,
          a.nj AS na, a.rj2 AS ra2, b.nj AS nb, b.rj2 AS rb2
        FROM rj a, rj b WHERE a.source < b.source)
      SELECT src_a, src_b,
        (CAST(ra2 AS DOUBLE)/(2.0*CAST(na AS DOUBLE)) - CAST(rb2 AS DOUBLE)/(2.0*CAST(nb AS DOUBLE)))
          / sqrt((CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)+1.0)/12.0
                  - CAST(tsum AS DOUBLE)/(12.0*(CAST(n AS DOUBLE)-1.0)))
                 * (1.0/CAST(na AS DOUBLE) + 1.0/CAST(nb AS DOUBLE))) AS z,
        (abs((CAST(ra2 AS DOUBLE)/(2.0*CAST(na AS DOUBLE)) - CAST(rb2 AS DOUBLE)/(2.0*CAST(nb AS DOUBLE)))
          / sqrt((CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)+1.0)/12.0
                  - CAST(tsum AS DOUBLE)/(12.0*(CAST(n AS DOUBLE)-1.0)))
                 * (1.0/CAST(na AS DOUBLE) + 1.0/CAST(nb AS DOUBLE)))) >= $DunnZCrit)
          AS significant
      FROM p, tot ORDER BY src_a, src_b""")),

    // ----- Friedman test + Kendall's W over weekday blocks ----------------
    // Is daily event volume exchangeable across weekdays, treating
    // each complete Monday-aligned week as a block? Tie-corrected
    // Friedman over within-block average ranks, which with 2·rank
    // integers collapses to a SINGLE integer division: χ² =
    // 6·Σ_j(R2_j − 8b)² / (A4 − 448·b) for k = 7 (A4 = Σ(2r)², C4 =
    // b·k·(k+1)² = 448b), plus Kendall's W = χ²/(b(k−1)). Blocks rank
    // only 7 values each (window partitioned by week); incomplete
    // weeks are dropped, so k is constant by construction. Calendar
    // math is pure epoch-day integer arithmetic (epd−4 aligns Monday),
    // identical text both engines.
    ("q367_friedman_weekday", (s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.t(s, dir, "events")
        .select(datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("epd"))
        .groupBy($"epd").agg(count(lit(1)).as("y"))
        .withColumn("wk", expr("(epd - 4) div 7"))
        .withColumn("dow", expr("(epd - 4) % 7"))
      val complete = daily.groupBy($"wk").agg(count(lit(1)).as("ndays"))
        .filter($"ndays" === 7).select($"wk")
      val ranked = daily.join(broadcast(complete), Seq("wk"))
        .withColumn("rnk", rank().over(
          Window.partitionBy($"wk").orderBy($"y")))
        .withColumn("ceq", count(lit(1)).over(
          Window.partitionBy($"wk", $"y")))
        .withColumn("r2", lit(2) * ($"rnk" - 1) + $"ceq" + 1)
      val perDow = ranked.groupBy($"dow").agg(sum($"r2").as("rsum2"))
      val scal = ranked.agg(
        (count(lit(1)) / 7).cast("long").as("b"),
        sum($"r2" * $"r2").as("a4"))
      perDow.crossJoin(broadcast(scal))
        .withColumn("dev", $"rsum2" - lit(8) * $"b")
        .agg(first($"b").as("b"), first($"a4").as("a4"),
          sum($"dev" * $"dev").as("ssq"))
        .select($"b", lit(7L).as("k"),
          expr("""CASE WHEN a4 - 448 * b = 0 THEN NULL
            ELSE CAST(6 * ssq AS DOUBLE) / CAST(a4 - 448 * b AS DOUBLE) END""")
            .as("chi2_f"))
        .withColumn("w_kendall",
          expr("chi2_f / (CAST(b AS DOUBLE) * 6.0)"))
    }, Some("""
      WITH daily AS (SELECT
          CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS epd,
          CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1),
      d2 AS (SELECT epd, y, (epd - 4) // 7 AS wk, (epd - 4) % 7 AS dow
        FROM daily),
      complete AS (SELECT wk FROM d2 GROUP BY wk HAVING count(*) = 7),
      rk AS (SELECT d2.*,
          CAST(rank() OVER (PARTITION BY d2.wk ORDER BY y) AS BIGINT) AS rnk,
          CAST(count(*) OVER (PARTITION BY d2.wk, y) AS BIGINT) AS ceq
        FROM d2 JOIN complete USING (wk)),
      r2t AS (SELECT wk, dow, 2*(rnk - 1) + ceq + 1 AS r2 FROM rk),
      pd AS (SELECT dow, CAST(sum(r2) AS BIGINT) AS rsum2 FROM r2t GROUP BY 1),
      sc AS (SELECT CAST(count(*) // 7 AS BIGINT) AS b,
          CAST(sum(r2 * r2) AS BIGINT) AS a4 FROM r2t),
      dv AS (SELECT b, a4,
          CAST(sum((rsum2 - 8*b) * (rsum2 - 8*b)) AS BIGINT) AS ssq
        FROM pd, sc GROUP BY b, a4),
      res AS (SELECT b, CAST(7 AS BIGINT) AS k,
          CASE WHEN a4 - 448 * b = 0 THEN NULL
            ELSE CAST(6 * ssq AS DOUBLE) / CAST(a4 - 448 * b AS DOUBLE) END AS chi2_f
        FROM dv)
      SELECT b, k, chi2_f,
        chi2_f / (CAST(b AS DOUBLE) * 6.0) AS w_kendall
      FROM res""")),

    // ----- Ljung–Box portmanteau test -------------------------------------
    // "Is the daily count series white noise" over the first 7
    // autocorrelation lags — the TEST on top of q287's ACF (q287
    // reports the function; this aggregates it into the portmanteau
    // statistic Q = n(n+2)·Σ ρ_k²/(n−k)). Same exact-integer
    // centering trick: c_t = n·y_t − S makes every ρ numerator and
    // the denominator an exact DECIMAL, so the only floats are 7
    // ρ-divisions and the lag-sorted fold. Day-grid scale throughout
    // after the one count aggregate.
    ("q368_ljung_box", (s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.t(s, dir, "events")
        .select(datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("epd"))
        .groupBy($"epd").agg(count(lit(1)).as("y"))
        .localCheckpoint()
      val m = daily.agg(count(lit(1)).as("n"), sum($"y").as("sv"))
      val centered = daily.crossJoin(broadcast(m))
        .select($"epd", ($"n" * $"y" - $"sv").as("c"), $"n")
        .localCheckpoint()
      val den = centered.agg(first($"n").as("n"),
        sum($"c".cast("decimal(38,0)") * $"c").as("den"))
      val lags = (1L to 7L).map(l => Tuple1(l)).toDF("lag")
      val nums = centered.select($"epd", $"c".as("c1"))
        .crossJoin(broadcast(lags))
        .withColumn("tgt", $"epd" + $"lag")
        .join(centered.select($"epd".as("tgt"), $"c".as("c2")), Seq("tgt"))
        .groupBy($"lag")
        .agg(sum($"c1".cast("decimal(38,0)") * $"c2").as("num"))
        .crossJoin(broadcast(den))
        .withColumn("term", expr(
          """(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
             * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
             / (CAST(n AS DOUBLE) - CAST(lag AS DOUBLE))"""))
      nums.groupBy($"n")
        .agg(count(lit(1)).as("m_lags"),
          collect_list(struct($"lag", $"term")).as("ts"))
        .withColumn("q_lb", expr(
          """CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) *
             aggregate(array_sort(ts), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"""))
        .select($"n", $"m_lags", $"q_lb")
    }, Some("""
      WITH daily AS (SELECT
          CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS epd,
          CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sv
        FROM daily),
      ct AS (SELECT epd, n * y - sv AS c FROM daily, m),
      den AS (SELECT sum(CAST(c AS DECIMAL(38,0)) * c) AS den FROM ct),
      nums AS (SELECT lag, sum(CAST(a.c AS DECIMAL(38,0)) * b.c) AS num
        FROM ct a, range(1, 8) t(lag), ct b
        WHERE b.epd = a.epd + t.lag GROUP BY lag),
      tm AS (SELECT lag,
          (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
            * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
            / (CAST(n AS DOUBLE) - CAST(lag AS DOUBLE)) AS term
        FROM nums, den, m),
      f AS (SELECT CAST(count(*) AS BIGINT) AS m_lags,
          list_reduce(list(term ORDER BY lag), (a, b) -> a + b) AS s FROM tm)
      SELECT n, m_lags,
        CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * s AS q_lb
      FROM f, m""")),

    // ----- Brown–Forsythe variance-equality test --------------------------
    // The assumption-checker q364's Welch ANOVA dodges: are the
    // per-source length variances even equal? Levene's test with
    // MEDIAN centers (the robust Brown–Forsythe form), computed
    // entirely on the per-source value grid: the median order
    // statistics come from the grid's per-source cumulative (window
    // partitioned BY SOURCE — parallel, bounded by the value domain),
    // and the absolute deviations never materialize per row: Σ|2v−m2|
    // and Σ(2v−m2)² fold the GRID counts. 2·median keeps everything
    // integer (odd/even groups alike); the ANOVA-on-deviations F is
    // scale-invariant so the factor 2 cancels.
    ("q369_brown_forsythe", (s: SparkSession, dir: String) => {
      import s.implicits._
      val grid = Tables.t(s, dir, "documents")
        .groupBy($"source", $"n_chars").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum($"c").over(
          Window.partitionBy($"source").orderBy($"n_chars")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .localCheckpoint()
      val nj = grid.groupBy($"source").agg(sum($"c").as("nj"))
      val wMed = grid.join(broadcast(nj), Seq("source"))
        .withColumn("lo", expr("(nj + 1) div 2"))
        .withColumn("hi", expr("(nj + 2) div 2"))
      val med2 = wMed.groupBy($"source").agg(
        sum(when($"cum" >= $"lo" && $"cum" - $"c" < $"lo",
          $"n_chars").otherwise(0L)).as("vlo"),
        sum(when($"cum" >= $"hi" && $"cum" - $"c" < $"hi",
          $"n_chars").otherwise(0L)).as("vhi"))
        .select($"source", ($"vlo" + $"vhi").as("m2"))
      val devs = grid.join(broadcast(med2), Seq("source"))
        .withColumn("z2", abs(lit(2) * $"n_chars" - $"m2"))
        .groupBy($"source").agg(
          sum($"c").as("nj"),
          sum($"c".cast("decimal(38,0)") * $"z2").as("s1"),
          sum($"c".cast("decimal(38,0)") * $"z2" * $"z2").as("q4"))
      val tot = devs.agg(sum($"nj").as("n"), count(lit(1)).as("k"),
        sum($"s1").as("s1tot"))
      val terms = devs.crossJoin(broadcast(tot))
        .withColumn("mj", expr("CAST(s1 AS DOUBLE) / CAST(nj AS DOUBLE)"))
        .withColumn("gm", expr("CAST(s1tot AS DOUBLE) / CAST(n AS DOUBLE)"))
        .withColumn("aj", expr("CAST(nj AS DOUBLE) * (mj - gm) * (mj - gm)"))
        .withColumn("bj", expr(
          "CAST(q4 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/CAST(nj AS DOUBLE)"))
      terms.groupBy($"n", $"k")
        .agg(collect_list(struct($"source", $"aj", $"bj")).as("ts"))
        .withColumn("suma", expr(
          "aggregate(array_sort(ts), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.aj)"))
        .withColumn("sumb", expr(
          "aggregate(array_sort(ts), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.bj)"))
        .select($"n", $"k",
          expr("""(suma / (CAST(k AS DOUBLE) - 1.0)) /
            (sumb / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))""").as("f_bf"),
          ($"k" - 1).as("df1"), ($"n" - $"k").as("df2"))
    }, Some("""
      WITH g AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2),
      g2 AS (SELECT *, sum(c) OVER (PARTITION BY source ORDER BY n_chars
          ROWS UNBOUNDED PRECEDING) AS cum FROM g),
      nj AS (SELECT source, CAST(sum(c) AS BIGINT) AS nj FROM g GROUP BY 1),
      md AS (SELECT g2.source,
          CAST(sum(CASE WHEN cum >= (nj + 1) // 2 AND cum - c < (nj + 1) // 2
            THEN n_chars ELSE 0 END) AS BIGINT)
          + CAST(sum(CASE WHEN cum >= (nj + 2) // 2 AND cum - c < (nj + 2) // 2
            THEN n_chars ELSE 0 END) AS BIGINT) AS m2
        FROM g2 JOIN nj USING (source) GROUP BY g2.source),
      dv AS (SELECT g.source, CAST(sum(c) AS BIGINT) AS nj,
          sum(CAST(c AS DECIMAL(38,0)) * abs(2*n_chars - m2)) AS s1,
          sum(CAST(c AS DECIMAL(38,0)) * abs(2*n_chars - m2) * abs(2*n_chars - m2)) AS q4
        FROM g JOIN md USING (source) GROUP BY g.source),
      tot AS (SELECT CAST(sum(nj) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
          sum(s1) AS s1tot FROM dv),
      tm AS (SELECT source,
          CAST(nj AS DOUBLE) * (CAST(s1 AS DOUBLE)/CAST(nj AS DOUBLE) - CAST(s1tot AS DOUBLE)/CAST(n AS DOUBLE))
            * (CAST(s1 AS DOUBLE)/CAST(nj AS DOUBLE) - CAST(s1tot AS DOUBLE)/CAST(n AS DOUBLE)) AS aj,
          CAST(q4 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/CAST(nj AS DOUBLE) AS bj
        FROM dv, tot),
      f AS (SELECT
          list_reduce(list(aj ORDER BY source), (a, b) -> a + b) AS suma,
          list_reduce(list(bj ORDER BY source), (a, b) -> a + b) AS sumb
        FROM tm)
      SELECT n, k,
        (suma / (CAST(k AS DOUBLE) - 1.0)) /
          (sumb / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) AS f_bf,
        k - 1 AS df1, n - k AS df2
      FROM f, tot""")),

    // ----- McNemar's paired-gate test -------------------------------------
    // Two quality gates applied to the SAME documents — a length
    // floor and langID-agrees-with-metadata (q352's gate pair) —
    // McNemar asks whether they disagree symmetrically (would
    // swapping gates change the kept set's size?). Only the
    // discordant counts matter: b = length-only passes, c =
    // langID-only passes, χ²_cc = (|b−c|−1)²/(b+c) with continuity
    // correction. One map-only scan (the langID scores are q18's
    // stopword argmax), three integer counts, one double division.
    ("q370_mcnemar", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
      val scored = TA.langScores(docs, "doc_id", "text")
      val scores = TA.Stopwords.map { case (l, _) => l -> col(s"score_$l") }
      val flags = scored
        .withColumn("ga", $"n_chars" >= 150)
        .withColumn("gb", TA.langPredict(scores) === $"lang")
      flags.agg(count(lit(1)).as("n"),
          sum(($"ga" && !$"gb").cast("long")).as("b_ct"),
          sum((!$"ga" && $"gb").cast("long")).as("c_ct"))
        .select($"n", $"b_ct", $"c_ct",
          expr("""CASE WHEN b_ct + c_ct = 0 THEN NULL ELSE
            (abs(CAST(b_ct AS DOUBLE) - CAST(c_ct AS DOUBLE)) - 1.0)
            * (abs(CAST(b_ct AS DOUBLE) - CAST(c_ct AS DOUBLE)) - 1.0)
            / (CAST(b_ct AS DOUBLE) + CAST(c_ct AS DOUBLE)) END""").as("chi2_cc"))
    }, Some {
      val scoreSql = TA.Stopwords.map { case (l, ws) =>
        val inList = ws.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t IN ($inList))) AS score_$l"
      }.mkString(",\n          ")
      val langs = TA.Stopwords.map(_._1).sorted
      val maxExpr = s"greatest(${langs.map("score_" + _).mkString(", ")})"
      val predChain = langs.map(l => s"WHEN score_$l = $maxExpr THEN '$l'").mkString(" ")
      s"""
      WITH sc AS (SELECT doc_id, n_chars, lang,
          $scoreSql
        FROM documents),
      fl AS (SELECT (n_chars >= 150) AS ga,
          ((CASE WHEN $maxExpr = 0 THEN 'und' $predChain ELSE 'und' END) = lang) AS gb
        FROM sc),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END) AS BIGINT) AS b_ct,
          CAST(sum(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END) AS BIGINT) AS c_ct
        FROM fl)
      SELECT n, b_ct, c_ct,
        CASE WHEN b_ct + c_ct = 0 THEN NULL ELSE
          (abs(CAST(b_ct AS DOUBLE) - CAST(c_ct AS DOUBLE)) - 1.0)
          * (abs(CAST(b_ct AS DOUBLE) - CAST(c_ct AS DOUBLE)) - 1.0)
          / (CAST(b_ct AS DOUBLE) + CAST(c_ct AS DOUBLE)) END AS chi2_cc
      FROM a"""
    }),

    // ----- Cochran's Q over the Gopher rule battery -----------------------
    // Do q355's six rules flag the same documents, or do some rules
    // carry all the rejection weight? Cochran's Q — the k-treatment
    // binary Friedman — over the SHARED per-document flag table
    // (Round11bQueries.gopherDoc / GopherDocSql, the same definition
    // q355 aggregates): Q = ((k−1)·(k·ΣC_j² − T²)) / (k·T − ΣR_i²)
    // with C_j = per-rule pass counts, R_i = per-doc pass counts,
    // T = ΣC = ΣR. Every term is an exact integer sum — the whole
    // statistic is ONE double division at the end.
    ("q371_cochran_q", (s: SparkSession, dir: String) => {
      import s.implicits._
      val rules = Seq("r_wc", "r_mwl", "r_alpha", "r_stop", "r_rep", "r_sym")
      val f = Round11bQueries.gopherDoc(s, dir)
        .withColumn("ri", rules.map(c => col(c).cast("long")).reduce(_ + _))
      val aggExprs = Seq(
        count(lit(1)).as("n"),
        sum($"ri").as("t"),
        sum($"ri" * $"ri").as("sr2")) ++
        rules.map(c => sum(col(c).cast("long")).as(s"c_$c"))
      val agg = f.agg(aggExprs.head, aggExprs.tail: _*)
      val cSq = rules.map(c => col(s"c_$c") * col(s"c_$c")).reduce(_ + _)
      agg.withColumn("sc2", cSq)
        .select($"n", lit(6L).as("k"),
          expr("""CASE WHEN 6 * t - sr2 = 0 THEN NULL ELSE
            CAST(5 * (6 * sc2 - t * t) AS DOUBLE) / CAST(6 * t - sr2 AS DOUBLE)
            END""").as("q_cochran"),
          lit(5L).as("df"))
    }, Some(s"""
      WITH ${Round11bQueries.GopherDocSql},
      fr AS (SELECT
          (CASE WHEN r_wc THEN 1 ELSE 0 END + CASE WHEN r_mwl THEN 1 ELSE 0 END
           + CASE WHEN r_alpha THEN 1 ELSE 0 END + CASE WHEN r_stop THEN 1 ELSE 0 END
           + CASE WHEN r_rep THEN 1 ELSE 0 END + CASE WHEN r_sym THEN 1 ELSE 0 END) AS ri,
          r_wc, r_mwl, r_alpha, r_stop, r_rep, r_sym
        FROM f),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(ri) AS BIGINT) AS t,
          CAST(sum(ri * ri) AS BIGINT) AS sr2,
          CAST(sum(CASE WHEN r_wc THEN 1 ELSE 0 END) AS BIGINT) AS c1,
          CAST(sum(CASE WHEN r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS c2,
          CAST(sum(CASE WHEN r_alpha THEN 1 ELSE 0 END) AS BIGINT) AS c3,
          CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS c4,
          CAST(sum(CASE WHEN r_rep THEN 1 ELSE 0 END) AS BIGINT) AS c5,
          CAST(sum(CASE WHEN r_sym THEN 1 ELSE 0 END) AS BIGINT) AS c6
        FROM fr)
      SELECT n, CAST(6 AS BIGINT) AS k,
        CASE WHEN 6 * t - sr2 = 0 THEN NULL ELSE
          CAST(5 * (6 * (c1*c1 + c2*c2 + c3*c3 + c4*c4 + c5*c5 + c6*c6) - t * t) AS DOUBLE)
          / CAST(6 * t - sr2 AS DOUBLE) END AS q_cochran,
        CAST(5 AS BIGINT) AS df
      FROM a"""))
  )
}
