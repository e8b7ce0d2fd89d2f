package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.GridCumulative

/** Round-11 batch 5: the association / effect-size / reliability layer
  * — the coefficients a curation team quotes AFTER the round-11b/d
  * hypothesis tests reject: ordinal association with tie treatment
  * (Goodman–Kruskal γ, Somers' D, Stuart τ-c), binary-gate agreement
  * (Matthews correlation), epidemiological 2×2 effect (Haldane odds
  * ratio with log CI), ordered-alternative trend tests (Page over
  * weekday blocks, Jonckheere–Terpstra over ordered sources), nominal
  * dependence (Theil's U), internal consistency (Cronbach's α over the
  * Gopher rule battery), residual serial correlation (Durbin–Watson),
  * and standardized mean difference (Cohen's d / Hedges' g).
  *
  * House float discipline as in Round11b: every data-scale aggregate
  * is exact integer/DECIMAL (pair masses, rank sums, centered moments);
  * doubles appear only in final bounded-cardinality expression chains
  * whose SQL text is SHARED verbatim between the Spark plan and the
  * DuckDB oracle, so IEEE op order is identical. Shapes: contingency /
  * value grids with broadcast self-joins or partitioned windows —
  * shuffles carry cells and moments, never rows.
  */
object Round11eQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** γ, Somers' D (both directions) and Stuart τ-c from the exact pair
    * masses — one shared double chain per coefficient. Inputs: cpairs,
    * dpairs, n0 = C(n,2), tx = pairs tied on x (incl. both-tied), ty
    * likewise, n, m = min(#rows, #cols).
    */
  private[operators] val GammaSql =
    """CASE WHEN cpairs + dpairs = 0 THEN NULL ELSE
       (CAST(cpairs AS DOUBLE) - CAST(dpairs AS DOUBLE)) /
       (CAST(cpairs AS DOUBLE) + CAST(dpairs AS DOUBLE)) END"""
  private[operators] val DyxSql =
    """CASE WHEN n0 = tx THEN NULL ELSE
       (CAST(cpairs AS DOUBLE) - CAST(dpairs AS DOUBLE)) /
       (CAST(n0 AS DOUBLE) - CAST(tx AS DOUBLE)) END"""
  private[operators] val DxySql =
    """CASE WHEN n0 = ty THEN NULL ELSE
       (CAST(cpairs AS DOUBLE) - CAST(dpairs AS DOUBLE)) /
       (CAST(n0 AS DOUBLE) - CAST(ty AS DOUBLE)) END"""
  private[operators] val TauCSql =
    """CASE WHEN m <= 1 THEN NULL ELSE
       2.0 * CAST(m AS DOUBLE) *
       (CAST(cpairs AS DOUBLE) - CAST(dpairs AS DOUBLE)) /
       (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(m AS DOUBLE) - 1.0)) END"""

  /** MCC from the 2×2 gate counts — NULL when any margin is empty
    * (the correlation is undefined, and sqrt(0) denominators would
    * otherwise divide by zero).
    */
  private[operators] val MccSql =
    """CASE WHEN (a + b) * (a + c) = 0 OR (b + d) * (c + d) = 0 THEN NULL ELSE
       (CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) /
       sqrt((CAST(a AS DOUBLE) + CAST(b AS DOUBLE)) * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE)) *
            (CAST(b AS DOUBLE) + CAST(d AS DOUBLE)) * (CAST(c AS DOUBLE) + CAST(d AS DOUBLE))) END"""

  /** Haldane–Anscombe odds ratio and the log-scale Wald SE — the +0.5
    * continuity correction makes every cell strictly positive, so the
    * chain is total (no zero-cell guards needed).
    */
  private[operators] val OrSql =
    """((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5)) /
       ((CAST(b AS DOUBLE) + 0.5) * (CAST(c AS DOUBLE) + 0.5))"""
  private[operators] val OrSeSql =
    """sqrt(1.0/(CAST(a AS DOUBLE) + 0.5) + 1.0/(CAST(b AS DOUBLE) + 0.5)
          + 1.0/(CAST(c AS DOUBLE) + 0.5) + 1.0/(CAST(d AS DOUBLE) + 0.5))"""

  /** Page's L z under the no-tie null: E[L] = b·k(k+1)²/4, Var(L) =
    * b·k²(k+1)(k²−1)/144; with k = 7 weekdays and l2 = 2L this is
    * (l2 − 224b)/2 over sqrt(18816·b/144). Tie-uncorrected (ties in
    * daily counts are rare and shrink Var, making |z| conservative^-1 —
    * reported as the classical statistic, like q378's JT z).
    */
  private[operators] val PageZSql =
    """(CAST(l2 AS DOUBLE) - 224.0 * CAST(b AS DOUBLE)) /
       (2.0 * sqrt(18816.0 * CAST(b AS DOUBLE) / 144.0))"""

  /** Jonckheere–Terpstra z from 2J, 4E[J] = n² − Σn_j² and the no-tie
    * variance numerator vnum = n²(2n+3) − Σ n_j²(2n_j+3) (J − E =
    * (2·j2 − ej4)/4, Var = vnum/72).
    */
  private[operators] val JtZSql =
    """CASE WHEN vnum = 0 THEN NULL ELSE
       (2.0 * CAST(j2 AS DOUBLE) - CAST(ej4 AS DOUBLE)) /
       (4.0 * sqrt(CAST(vnum AS DOUBLE) / 72.0)) END"""

  /** Durbin–Watson from exact integers: n·Σ(Δc)² over n·Σc² − (Σc)²
    * (differencing cancels the mean, so no fractional residual ever
    * materializes).
    */
  private[operators] val DwSql =
    """CASE WHEN n * scc = sc * sc THEN NULL ELSE
       CAST(n AS DOUBLE) * CAST(sd2 AS DOUBLE) /
       (CAST(n AS DOUBLE) * CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) END"""

  /** Cohen's d from the five exact moments; pooled variance written as
    * (A1 + A2)/(n1+n2−2) with A_i = (n_i·Σx² − (Σx)²)/n_i so each term
    * is one division of exact DECIMALs.
    */
  private[operators] val CohenDSql =
    """(CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE) - CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE)) /
       sqrt(((CAST(n1 AS DOUBLE)*CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE))/CAST(n1 AS DOUBLE)
           + (CAST(n2 AS DOUBLE)*CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE)*CAST(s2 AS DOUBLE))/CAST(n2 AS DOUBLE))
          / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0))"""

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- ordinal association: γ, Somers' D, Stuart τ-c ------------------
    // q358 ships τ-b; these are the other three coefficients quoted
    // over the SAME concordant/discordant pair masses, each answering
    // a different tie question: γ ignores all ties (C−D over C+D),
    // Somers' D is the asymmetric regression-flavored form (denominator
    // drops only pairs tied on the INDEPENDENT margin — both
    // directions reported), τ-c corrects for a non-square grid via
    // m = min(rows, cols). Scorers: quantity vs price bucket on
    // lineitem — a B×B contingency grid (≤ 50×11 cells), one count
    // aggregate, one broadcast grid self-join; every pair mass exact
    // DECIMAL; four shared double chains at the end. Shuffle carries
    // cells, never rows — flat at any corpus scale.
    ("q372_ordinal_association", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.t(s, dir, "lineitem")
        .select($"l_quantity".cast("long").as("x"),
          floor($"l_extendedprice" / 10000).cast("long").as("y"))
      val grid = d.groupBy($"x", $"y").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val g2 = grid.select($"x".as("x2"), $"y".as("y2"), $"cnt".as("cnt2"))
      val pairs = grid.crossJoin(broadcast(g2)).agg(
        sum(when($"x2" > $"x" && $"y2" > $"y",
          $"cnt".cast("decimal(38,0)") * $"cnt2")
          .otherwise(lit(0).cast("decimal(38,0)"))).as("cpairs"),
        sum(when($"x2" > $"x" && $"y2" < $"y",
          $"cnt".cast("decimal(38,0)") * $"cnt2")
          .otherwise(lit(0).cast("decimal(38,0)"))).as("dpairs"))
      val tx = grid.groupBy($"x").agg(sum($"cnt").as("rx"))
        .agg(sum($"rx".cast("decimal(38,0)") * ($"rx" - 1) / 2).as("tx"))
      val ty = grid.groupBy($"y").agg(sum($"cnt").as("ry"))
        .agg(sum($"ry".cast("decimal(38,0)") * ($"ry" - 1) / 2).as("ty"))
      val tot = grid.agg(sum($"cnt").as("n"),
          countDistinct($"x").as("nx"), countDistinct($"y").as("ny"))
        .withColumn("n0", $"n".cast("decimal(38,0)") * ($"n" - 1) / 2)
        .withColumn("m", least($"nx", $"ny"))
      pairs.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
        .crossJoin(broadcast(tot))
        .select($"n", $"m",
          $"cpairs".cast("double").as("c_pairs"),
          $"dpairs".cast("double").as("d_pairs"),
          expr(GammaSql).as("gamma"),
          expr(DyxSql).as("somers_d_yx"),
          expr(DxySql).as("somers_d_xy"),
          expr(TauCSql).as("tau_c"))
    }, Some(s"""
      WITH d AS (SELECT CAST(l_quantity AS BIGINT) AS x,
          CAST(floor(l_extendedprice / 10000) AS BIGINT) AS y FROM lineitem),
      g AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY 1, 2),
      p AS (SELECT
          sum(CASE WHEN g2.x > g.x AND g2.y > g.y
            THEN CAST(g.cnt AS DECIMAL(38,0)) * g2.cnt ELSE CAST(0 AS DECIMAL(38,0)) END) AS cpairs,
          sum(CASE WHEN g2.x > g.x AND g2.y < g.y
            THEN CAST(g.cnt AS DECIMAL(38,0)) * g2.cnt ELSE CAST(0 AS DECIMAL(38,0)) END) AS dpairs
        FROM g, g AS g2),
      txx AS (SELECT sum(CAST(rx AS DECIMAL(38,0)) * (rx - 1) / 2) AS tx
        FROM (SELECT x, CAST(sum(cnt) AS BIGINT) AS rx FROM g GROUP BY 1)),
      tyy AS (SELECT sum(CAST(ry AS DECIMAL(38,0)) * (ry - 1) / 2) AS ty
        FROM (SELECT y, CAST(sum(cnt) AS BIGINT) AS ry FROM g GROUP BY 1)),
      tn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
          CAST(sum(cnt) AS DECIMAL(38,0)) * (sum(cnt) - 1) / 2 AS n0,
          least(CAST(count(DISTINCT x) AS BIGINT),
                CAST(count(DISTINCT y) AS BIGINT)) AS m
        FROM g)
      SELECT n, m, CAST(cpairs AS DOUBLE) AS c_pairs,
        CAST(dpairs AS DOUBLE) AS d_pairs,
        $GammaSql AS gamma, $DyxSql AS somers_d_yx,
        $DxySql AS somers_d_xy, $TauCSql AS tau_c
      FROM p, txx, tyy, tn""")),

    // ----- Matthews correlation between two quality gates -----------------
    // Do the mean-word-length rule and the repetition rule fire on the
    // SAME documents? q253's κ measures chance-corrected agreement and
    // q370's McNemar tests marginal symmetry; MCC is the
    // ±1-normalized CORRELATION of the two gates (the binary Pearson
    // φ), the number quoted when one gate is a cheap proxy candidate
    // for the other. Consumes the literally shared gopherDoc flag
    // table; one map-only 2×2 count aggregate; the ad−bc product runs
    // in doubles only inside the final shared chain (exact DECIMAL
    // would overflow at 1e12 docs where doubles lose nothing that
    // matters for a correlation).
    ("q373_mcc_gates", (s: SparkSession, dir: String) => {
      import s.implicits._
      Round11bQueries.gopherDoc(s, dir).agg(
          sum(($"r_mwl" && $"r_rep").cast("long")).as("a"),
          sum(($"r_mwl" && !$"r_rep").cast("long")).as("b"),
          sum((!$"r_mwl" && $"r_rep").cast("long")).as("c"),
          sum((!$"r_mwl" && !$"r_rep").cast("long")).as("d"))
        .select($"a", $"b", $"c", $"d", expr(MccSql).as("mcc"))
    }, Some(s"""
      WITH ${Round11bQueries.GopherDocSql},
      ct AS (SELECT
          CAST(sum(CASE WHEN r_mwl AND r_rep THEN 1 ELSE 0 END) AS BIGINT) AS a,
          CAST(sum(CASE WHEN r_mwl AND NOT r_rep THEN 1 ELSE 0 END) AS BIGINT) AS b,
          CAST(sum(CASE WHEN NOT r_mwl AND r_rep THEN 1 ELSE 0 END) AS BIGINT) AS c,
          CAST(sum(CASE WHEN NOT r_mwl AND NOT r_rep THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM f)
      SELECT a, b, c, d, $MccSql AS mcc FROM ct""")),

    // ----- Haldane odds ratio with log-scale Wald CI ----------------------
    // How much more likely is source src0 to pass the repetition gate
    // than src1, as an ODDS RATIO with a defensible interval? q224's
    // two-proportion z answers "different?"; the OR is the
    // epidemiological effect size whose log-scale CI stays valid at
    // extreme rates, and the Haldane +0.5 correction keeps it total
    // when a cell is empty (sf0.001's 2-doc sources). One filtered
    // 2×2 count aggregate over the shared gopherDoc flags. The OR
    // itself is pure ×/÷ (IEEE-deterministic); everything through
    // ln/exp rounds to integer micro first — Spark's JIT'd Math.log
    // and DuckDB's libm ln disagree in the last ulp (caught live on
    // this very query: identical 2×2 counts, ln_or off by 1 ulp).
    ("q374_odds_ratio", (s: SparkSession, dir: String) => {
      import s.implicits._
      Round11bQueries.gopherDoc(s, dir)
        .filter($"source".isin("src0", "src1"))
        .agg(
          sum(($"source" === "src0" && $"r_rep").cast("long")).as("a"),
          sum(($"source" === "src0" && !$"r_rep").cast("long")).as("b"),
          sum(($"source" === "src1" && $"r_rep").cast("long")).as("c"),
          sum(($"source" === "src1" && !$"r_rep").cast("long")).as("d"))
        .select($"a", $"b", $"c", $"d",
          expr(OrSql).as("or_hat"),
          expr(s"CAST(floor(ln($OrSql) * 1e6 + 0.5) AS BIGINT)").as("ln_or_micro"),
          expr(s"CAST(floor(exp(ln($OrSql) - 1.96 * $OrSeSql) * 1e6 + 0.5) AS BIGINT)")
            .as("ci_lo_micro"),
          expr(s"CAST(floor(exp(ln($OrSql) + 1.96 * $OrSeSql) * 1e6 + 0.5) AS BIGINT)")
            .as("ci_hi_micro"))
    }, Some(s"""
      WITH ${Round11bQueries.GopherDocSql},
      ct AS (SELECT
          CAST(sum(CASE WHEN source = 'src0' AND r_rep THEN 1 ELSE 0 END) AS BIGINT) AS a,
          CAST(sum(CASE WHEN source = 'src0' AND NOT r_rep THEN 1 ELSE 0 END) AS BIGINT) AS b,
          CAST(sum(CASE WHEN source = 'src1' AND r_rep THEN 1 ELSE 0 END) AS BIGINT) AS c,
          CAST(sum(CASE WHEN source = 'src1' AND NOT r_rep THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM f WHERE source IN ('src0', 'src1'))
      SELECT a, b, c, d, $OrSql AS or_hat,
        CAST(floor(ln($OrSql) * 1e6 + 0.5) AS BIGINT) AS ln_or_micro,
        CAST(floor(exp(ln($OrSql) - 1.96 * $OrSeSql) * 1e6 + 0.5) AS BIGINT) AS ci_lo_micro,
        CAST(floor(exp(ln($OrSql) + 1.96 * $OrSeSql) * 1e6 + 0.5) AS BIGINT) AS ci_hi_micro
      FROM ct""")),

    // ----- Page's trend test over weekday blocks --------------------------
    // q367's Friedman asks "do weekdays differ AT ALL"; Page's L asks
    // the sharper ORDERED question — does volume trend monotonically
    // across the weekday position? Same complete-week blocks and
    // doubled within-block average ranks (2·avgrank = 2(rank−1)+ceq+1,
    // exact integers over ties); L2 = Σ (dow+1)·R2_j is one 7-row
    // weighted sum, and the z uses the classical no-tie null
    // (documented in PageZSql). Block ranking windows partition by
    // week — thousands of independent 7-row tasks at any scale.
    ("q375_page_trend", (s: SparkSession, dir: String) => {
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
      val b = ranked.agg((count(lit(1)) / 7).cast("long").as("b"))
      perDow
        .agg(sum(($"dow" + 1) * $"rsum2").as("l2"))
        .crossJoin(broadcast(b))
        .select($"b", $"l2", expr(PageZSql).as("z_page"))
    }, Some(s"""
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
      bt AS (SELECT CAST(count(*) // 7 AS BIGINT) AS b FROM r2t),
      lt AS (SELECT CAST(sum((dow + 1) * rsum2) AS BIGINT) AS l2 FROM pd)
      SELECT b, l2, $PageZSql AS z_page FROM lt, bt""")),

    // ----- Theil's uncertainty coefficient U(lang | source) ---------------
    // What fraction of language entropy does knowing the source
    // remove? q235 reports the raw mutual information in nats; U is
    // the [0,1]-NORMALIZED asymmetric form H(L)−H(L|S) over H(L) — the
    // number that says "source determines language 40%, not 0.4 nats".
    // One (source × lang) count aggregate (≤ 100 cells at any corpus
    // size). Each ln rounds to integer MICRO-nats first (the q235
    // rule: the two engines' libm ln differ in the last ulp, and the
    // first validation run caught exactly that), so both entropies
    // are exact integer sums and U is one integer-ratio double.
    ("q376_theils_u", (s: SparkSession, dir: String) => {
      import s.implicits._
      def mln(x: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
        floor(log(x.cast("double") / n.cast("double")) * 1e6 + 0.5).cast("long")
      val cells = Tables.t(s, dir, "documents")
        .groupBy($"source", $"lang").agg(count(lit(1)).as("nsl"))
        .localCheckpoint()
      val n = cells.agg(sum($"nsl").as("n"))
      val hl = cells.groupBy($"lang").agg(sum($"nsl").as("nl"))
        .crossJoin(broadcast(n))
        .select($"n", $"nl", mln($"nl", $"n").as("ll"))
        .groupBy($"n")
        .agg(sum($"nl".cast("decimal(38,0)") * $"ll").as("sl"))
        .select($"n", expr("(-sl) div n").as("h_l_micro"))
      val ns = cells.groupBy($"source").agg(sum($"nsl").as("ns"))
      val hc = cells.join(broadcast(ns), Seq("source"))
        .crossJoin(broadcast(n))
        .select($"n", $"nsl", mln($"nsl", $"ns").as("lc"))
        .groupBy($"n")
        .agg(sum($"nsl".cast("decimal(38,0)") * $"lc").as("sc"))
        .select(expr("(-sc) div n").as("h_cond_micro"))
      hl.crossJoin(hc)
        .select($"h_l_micro", $"h_cond_micro",
          expr("""CASE WHEN h_l_micro = 0 THEN NULL ELSE
            CAST(h_l_micro - h_cond_micro AS DOUBLE) / CAST(h_l_micro AS DOUBLE) END""")
            .as("u"))
    }, Some("""
      WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS nsl
        FROM documents GROUP BY 1, 2),
      nt AS (SELECT CAST(sum(nsl) AS BIGINT) AS n FROM cells),
      hlt AS (SELECT CAST((-sum(CAST(nl AS HUGEINT) *
            CAST(floor(ln(CAST(nl AS DOUBLE)/CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)))
            // max(n) AS BIGINT) AS h_l_micro
        FROM (SELECT lang, CAST(sum(nsl) AS BIGINT) AS nl FROM cells GROUP BY 1), nt),
      nst AS (SELECT source, CAST(sum(nsl) AS BIGINT) AS ns FROM cells GROUP BY 1),
      hct AS (SELECT CAST((-sum(CAST(nsl AS HUGEINT) *
            CAST(floor(ln(CAST(nsl AS DOUBLE)/CAST(ns AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)))
            // max(n) AS BIGINT) AS h_cond_micro
        FROM cells JOIN nst USING (source), nt)
      SELECT h_l_micro, h_cond_micro,
        CASE WHEN h_l_micro = 0 THEN NULL ELSE
          CAST(h_l_micro - h_cond_micro AS DOUBLE) / CAST(h_l_micro AS DOUBLE) END AS u
      FROM hlt, hct""")),

    // ----- Cronbach's α over the Gopher rule battery ----------------------
    // Do the six quality rules measure ONE latent "document quality"
    // construct, or six unrelated things? q362's Fleiss κ scores
    // rater agreement on one item; α is the internal-consistency
    // coefficient over the six-item battery: k/(k−1)·(1 − Σσ²ᵢ/σ²_T).
    // Bernoulli items make every variance a function of integer sums
    // (Σxᵢ² = Σxᵢ), and the per-doc total t ∈ [0,6] bounds Σt² — one
    // map-only aggregate over the shared flag table, then a single
    // double chain whose six item terms appear in fixed textual order
    // on both engines.
    ("q377_cronbach_alpha", (s: SparkSession, dir: String) => {
      import s.implicits._
      val flags = Seq("r_wc", "r_mwl", "r_alpha", "r_stop", "r_rep", "r_sym")
      val f = Round11bQueries.gopherDoc(s, dir)
        .select(flags.map(c => col(c).cast("long").as(c)): _*)
        .withColumn("t", flags.map(col).reduce(_ + _))
      val aggExprs = Seq(count(lit(1)).as("n"),
        sum($"t").as("st"), sum($"t" * $"t").as("stt")) ++
        flags.zipWithIndex.map { case (c, i) => sum(col(c)).as(s"s${i + 1}") }
      val aggs = f.agg(aggExprs.head, aggExprs.tail: _*)
      val ivar = (1 to 6).map(i =>
        s"""(CAST(s$i AS DOUBLE)/CAST(n AS DOUBLE)
            - (CAST(s$i AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s$i AS DOUBLE)/CAST(n AS DOUBLE)))""")
        .mkString(" + ")
      val tvar =
        """(CAST(stt AS DOUBLE)/CAST(n AS DOUBLE)
            - (CAST(st AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(st AS DOUBLE)/CAST(n AS DOUBLE)))"""
      aggs.select($"n",
        expr(ivar).as("sum_item_var"),
        expr(tvar).as("total_var"),
        expr(s"CASE WHEN $tvar = 0.0 THEN NULL ELSE 1.2 * (1.0 - ($ivar) / $tvar) END")
          .as("alpha"))
    }, Some {
      val ivar = (1 to 6).map(i =>
        s"""(CAST(s$i AS DOUBLE)/CAST(n AS DOUBLE)
            - (CAST(s$i AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s$i AS DOUBLE)/CAST(n AS DOUBLE)))""")
        .mkString(" + ")
      val tvar =
        """(CAST(stt AS DOUBLE)/CAST(n AS DOUBLE)
            - (CAST(st AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(st AS DOUBLE)/CAST(n AS DOUBLE)))"""
      val items = Seq("r_wc", "r_mwl", "r_alpha", "r_stop", "r_rep", "r_sym")
        .zipWithIndex.map { case (c, i) =>
          s"CAST(sum(CASE WHEN $c THEN 1 ELSE 0 END) AS BIGINT) AS s${i + 1}" }
        .mkString(", ")
      s"""
      WITH ${Round11bQueries.GopherDocSql},
      tt AS (SELECT *,
          CAST((CASE WHEN r_wc THEN 1 ELSE 0 END) + (CASE WHEN r_mwl THEN 1 ELSE 0 END)
             + (CASE WHEN r_alpha THEN 1 ELSE 0 END) + (CASE WHEN r_stop THEN 1 ELSE 0 END)
             + (CASE WHEN r_rep THEN 1 ELSE 0 END) + (CASE WHEN r_sym THEN 1 ELSE 0 END) AS BIGINT) AS t
        FROM f),
      ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(t) AS BIGINT) AS st, CAST(sum(t * t) AS BIGINT) AS stt,
          $items
        FROM tt)
      SELECT n, $ivar AS sum_item_var, $tvar AS total_var,
        CASE WHEN $tvar = 0.0 THEN NULL ELSE 1.2 * (1.0 - ($ivar) / $tvar) END AS alpha
      FROM ag"""
    }),

    // ----- Jonckheere–Terpstra ordered-groups trend ------------------------
    // Does document length trend UPWARD across the source index
    // src0 < src1 < … < src19? q357 (Kruskal–Wallis) is omnibus —
    // any difference, any pattern; JT accumulates the k(k−1)/2
    // pairwise Mann–Whitney masses in the GROUP ORDER, buying power
    // exactly when the alternative is monotone. The pair masses come
    // from a 2D dominance count over the (source, value) grid:
    // densify to |grid values| × 20 cells, one ≤20-row window per
    // value (mass in lower-indexed sources at the same value), one
    // per-source prefix window over the value grid (mass strictly
    // below in lower-indexed sources) — shuffles carry grid cells
    // only, and 2J stays an exact DECIMAL. z uses the classical
    // no-tie null (JtZSql).
    ("q378_jonckheere", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.t(s, dir, "documents")
        .select(expr("CAST(substring(source, 4) AS BIGINT)").as("so"),
          $"n_chars".as("v"))
      val cells = d.groupBy($"so", $"v").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val dense = cells.select($"v").distinct()
        .crossJoin(broadcast(cells.select($"so").distinct()))
        .join(cells, Seq("so", "v"), "left")
        .withColumn("c", coalesce($"c", lit(0L)))
      val wP = Window.partitionBy($"v").orderBy($"so")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wD = Window.partitionBy($"so").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val masses = dense
        .withColumn("pp", coalesce(sum($"c").over(wP), lit(0L)))
        .withColumn("dd", coalesce(sum($"pp").over(wD), lit(0L)))
      val j2t = masses.agg(sum($"c".cast("decimal(38,0)") *
        (lit(2) * $"dd" + $"pp")).as("j2"))
      val sizes = cells.groupBy($"so").agg(sum($"c").as("nj"))
        .agg(sum($"nj").as("n"), count(lit(1)).as("k"),
          sum($"nj".cast("decimal(38,0)") * $"nj").as("snj2"),
          sum($"nj".cast("decimal(38,0)") * $"nj" * (lit(2) * $"nj" + 3)).as("snj3"))
        .withColumn("ej4", $"n".cast("decimal(38,0)") * $"n" - $"snj2")
        .withColumn("vnum",
          $"n".cast("decimal(38,0)") * $"n" * (lit(2) * $"n" + 3) - $"snj3")
      j2t.crossJoin(broadcast(sizes))
        .select($"n", $"k",
          $"j2".cast("double").as("j2_pairs"),
          $"ej4".cast("double").as("ej4"),
          expr(JtZSql).as("z_jt"))
    }, Some(s"""
      WITH d AS (SELECT CAST(substr(source, 4) AS BIGINT) AS so,
          n_chars AS v FROM documents),
      cells AS (SELECT so, v, CAST(count(*) AS BIGINT) AS c
        FROM d GROUP BY 1, 2),
      dense AS (SELECT vg.v, st.so, COALESCE(cells.c, 0) AS c
        FROM (SELECT DISTINCT v FROM cells) vg
        CROSS JOIN (SELECT DISTINCT so FROM cells) st
        LEFT JOIN cells ON cells.so = st.so AND cells.v = vg.v),
      m1 AS (SELECT *, COALESCE(sum(c) OVER (PARTITION BY v ORDER BY so
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pp
        FROM dense),
      m2 AS (SELECT *, COALESCE(sum(pp) OVER (PARTITION BY so ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS dd
        FROM m1),
      jt AS (SELECT sum(CAST(c AS DECIMAL(38,0)) * (2 * dd + pp)) AS j2
        FROM m2),
      sz AS (SELECT CAST(sum(nj) AS BIGINT) AS n,
          CAST(count(*) AS BIGINT) AS k,
          CAST(sum(nj) AS DECIMAL(38,0)) * sum(nj)
            - sum(CAST(nj AS DECIMAL(38,0)) * nj) AS ej4,
          CAST(sum(nj) AS DECIMAL(38,0)) * sum(nj) * (2 * sum(nj) + 3)
            - sum(CAST(nj AS DECIMAL(38,0)) * nj * (2 * nj + 3)) AS vnum
        FROM (SELECT so, CAST(sum(c) AS BIGINT) AS nj FROM cells GROUP BY 1))
      SELECT n, k, CAST(j2 AS DOUBLE) AS j2_pairs,
        CAST(ej4 AS DOUBLE) AS ej4, $JtZSql AS z_jt
      FROM jt, sz""")),

    // ----- Durbin–Watson on the daily count series ------------------------
    // Residual serial correlation of daily event volume around its
    // mean — the classical regression diagnostic whose ≈2(1−ρ₁) value
    // q287's lag-1 ACF approximates but does not equal (DW keeps the
    // exact first/last boundary terms and the uncentered difference
    // numerator). Differencing cancels the mean, so Σ(Δc)² is an
    // exact integer straight off the counts and the whole statistic
    // is one shared double chain over four exact aggregates. The lag
    // window runs on the bounded day grid (the lit(0) single-task
    // convention, ≤ a few thousand rows at any corpus scale).
    ("q379_durbin_watson", (s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.t(s, dir, "events")
        .select(datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("epd"))
        .groupBy($"epd").agg(count(lit(1)).as("cd"))
      val w = Window.partitionBy(lit(0)).orderBy($"epd")
      daily.withColumn("prev", lag($"cd", 1).over(w))
        .agg(count(lit(1)).as("n"), sum($"cd").as("sc"),
          sum($"cd".cast("decimal(38,0)") * $"cd").as("scc"),
          sum(when($"prev".isNotNull,
            ($"cd" - $"prev").cast("decimal(38,0)") * ($"cd" - $"prev"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("sd2"))
        .select($"n".as("n_days"), $"sd2".cast("double").as("sdiff2"),
          expr(DwSql).as("dw"))
    }, Some(s"""
      WITH daily AS (SELECT
          CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS epd,
          CAST(count(*) AS BIGINT) AS cd
        FROM events GROUP BY 1),
      lg AS (SELECT epd, cd, lag(cd, 1) OVER (ORDER BY epd) AS prev FROM daily),
      ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(cd) AS BIGINT) AS sc,
          sum(CAST(cd AS DECIMAL(38,0)) * cd) AS scc,
          sum(CASE WHEN prev IS NOT NULL
            THEN CAST(cd - prev AS DECIMAL(38,0)) * (cd - prev)
            ELSE CAST(0 AS DECIMAL(38,0)) END) AS sd2
        FROM lg)
      SELECT n AS n_days, CAST(sd2 AS DOUBLE) AS sdiff2,
        $DwSql AS dw
      FROM ag""")),

    // ----- Cohen's d / Hedges' g between two sources ----------------------
    // HOW FAR apart are src0's and src1's length distributions, in
    // pooled-SD units? q356 tests whether they differ (rank z),
    // q364 tests k means at once; d is the standardized effect size
    // the power calculation and the meta-analysis consume, and g is
    // its small-sample-debiased form (J = 1 − 3/(4·df − 1)). Five
    // exact integer/DECIMAL moments from one filtered aggregate; the
    // entire statistic is the shared CohenDSql chain.
    ("q380_cohens_d", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "documents")
        .filter($"source".isin("src0", "src1"))
        .select(($"source" === "src0").as("g1"), $"n_chars".as("v"))
        .agg(
          sum($"g1".cast("long")).as("n1"),
          sum((!$"g1").cast("long")).as("n2"),
          sum(when($"g1", $"v").otherwise(0L)).as("s1"),
          sum(when(!$"g1", $"v").otherwise(0L)).as("s2"),
          sum(when($"g1", $"v".cast("decimal(38,0)") * $"v")
            .otherwise(lit(0).cast("decimal(38,0)"))).as("ss1"),
          sum(when(!$"g1", $"v".cast("decimal(38,0)") * $"v")
            .otherwise(lit(0).cast("decimal(38,0)"))).as("ss2"))
        .select($"n1", $"n2",
          expr("CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE) - CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE)")
            .as("mean_diff"),
          expr(CohenDSql).as("cohen_d"),
          expr(s"""(1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0) - 1.0))
            * ($CohenDSql)""").as("hedges_g"))
    }, Some(s"""
      WITH d AS (SELECT source = 'src0' AS g1, n_chars AS v
        FROM documents WHERE source IN ('src0', 'src1')),
      ag AS (SELECT
          CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          CAST(sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS n2,
          CAST(sum(CASE WHEN g1 THEN v ELSE 0 END) AS BIGINT) AS s1,
          CAST(sum(CASE WHEN g1 THEN 0 ELSE v END) AS BIGINT) AS s2,
          sum(CASE WHEN g1 THEN CAST(v AS DECIMAL(38,0)) * v
            ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss1,
          sum(CASE WHEN g1 THEN CAST(0 AS DECIMAL(38,0))
            ELSE CAST(v AS DECIMAL(38,0)) * v END) AS ss2
        FROM d)
      SELECT n1, n2,
        CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE) - CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE) AS mean_diff,
        $CohenDSql AS cohen_d,
        (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0) - 1.0))
          * ($CohenDSql) AS hedges_g
      FROM ag"""))
  )
}
