package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-11 batch 6: agreement, calibration and stratified-effect
  * operators that close out the association layer — Lin's concordance
  * correlation (measure agreement, not association), Krippendorff's α
  * (agreement under MISSING ratings, where q362's Fleiss requires a
  * complete panel), a grouped Hosmer–Lemeshow calibration test with
  * out-of-sample expected rates, Goodman–Kruskal λ (modal-prediction
  * PRE, the counting dual of q376's entropy-based U), linear-weighted
  * Cohen's κ over ordinal deciles, and the Mantel–Haenszel pooled
  * odds ratio (the Simpson-safe adjusted form of q374's crude OR).
  *
  * Float discipline: every statistic here reduces to exact integer /
  * DECIMAL aggregates — including Krippendorff's per-unit rational
  * (cleared by the lcm 12) and Hosmer–Lemeshow's per-stratum term
  * (cleared to (O·ntr − nte·xt)² / (nte·xt·(ntr−xt))) — with one
  * shared double chain, or a key-sorted fold over ≤20 stratum terms,
  * at the very end.
  */
object Round11fQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** Lin CCC / Pearson r over exact cent-integer moments, evaluated in
    * doubles with shared text: both coefficients from n, A=Σx, B=Σy,
    * XX=Σx², YY=Σy², XY=Σxy.
    */
  private[operators] val CccSql =
    """2.0 * (CAST(n AS DOUBLE)*CAST(xy AS DOUBLE) - CAST(a AS DOUBLE)*CAST(b AS DOUBLE)) /
       ((CAST(n AS DOUBLE)*CAST(xx AS DOUBLE) - CAST(a AS DOUBLE)*CAST(a AS DOUBLE))
        + (CAST(n AS DOUBLE)*CAST(yy AS DOUBLE) - CAST(b AS DOUBLE)*CAST(b AS DOUBLE))
        + (CAST(a AS DOUBLE) - CAST(b AS DOUBLE)) * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE)))"""
  private[operators] val PearsonSql =
    """(CAST(n AS DOUBLE)*CAST(xy AS DOUBLE) - CAST(a AS DOUBLE)*CAST(b AS DOUBLE)) /
       sqrt((CAST(n AS DOUBLE)*CAST(xx AS DOUBLE) - CAST(a AS DOUBLE)*CAST(a AS DOUBLE))
          * (CAST(n AS DOUBLE)*CAST(yy AS DOUBLE) - CAST(b AS DOUBLE)*CAST(b AS DOUBLE)))"""

  /** Krippendorff binary-nominal α from the cleared integers: n total
    * ratings, n1/n0 value margins, s12 = Σ_u 12·x_u(m_u−x_u)/(m_u−1).
    */
  private[operators] val KripSql =
    """CASE WHEN n1 = 0 OR n0 = 0 THEN NULL ELSE
       1.0 - (CAST(n AS DOUBLE) - 1.0) * CAST(s12 AS DOUBLE) /
       (12.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) END"""

  /** Weighted κ from the exact grid integers: sum of |i−j|-weighted
    * observed mass (wo), expected mass (we = Σ|i−j|·r_i·c_j), n.
    */
  private[operators] val WKappaSql =
    """CASE WHEN we = 0 THEN NULL ELSE
       1.0 - CAST(n AS DOUBLE) * CAST(wo AS DOUBLE) / CAST(we AS DOUBLE) END"""

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- Lin's concordance correlation ----------------------------------
    // Does the order header price AGREE with the lineitem revenue sum
    // — not merely correlate with it? q80's Pearson is invariant to
    // location/scale shift; CCC penalizes both (ρ·accuracy), so a
    // systematic bias between the two measures shows up that Pearson
    // hides. Money goes to exact cent integers first (DECIMAL(12,2)
    // ×100, the q01 cast discipline); the orderkey join is
    // co-partitioned sort-merge (both sides keyed by l_orderkey /
    // o_orderkey — at cluster scale this is the bucketed-join shape);
    // five moments in DECIMAL(38,0); both coefficients one shared
    // double chain.
    ("q381_lin_ccc", (s: SparkSession, dir: String) => {
      import s.implicits._
      val x = Tables.t(s, dir, "orders")
        .select($"o_orderkey".as("k"),
          ($"o_totalprice".cast(DecimalType(12, 2)) * 100).cast("long").as("xc"))
      val y = Tables.t(s, dir, "lineitem")
        .groupBy($"l_orderkey".as("k"))
        .agg(sum(($"l_extendedprice".cast(DecimalType(12, 2)) * 100).cast("long"))
          .as("yc"))
      x.join(y, Seq("k"))
        .agg(count(lit(1)).as("n"),
          sum($"xc".cast("decimal(38,0)")).as("a"),
          sum($"yc".cast("decimal(38,0)")).as("b"),
          sum($"xc".cast("decimal(38,0)") * $"xc").as("xx"),
          sum($"yc".cast("decimal(38,0)") * $"yc").as("yy"),
          sum($"xc".cast("decimal(38,0)") * $"yc").as("xy"))
        .select($"n", expr(CccSql).as("ccc"), expr(PearsonSql).as("pearson_r"))
    }, Some(s"""
      WITH x AS (SELECT o_orderkey AS k,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS xc
        FROM orders),
      y AS (SELECT l_orderkey AS k,
          CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS yc
        FROM lineitem GROUP BY 1),
      ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
          sum(CAST(xc AS DECIMAL(38,0))) AS a,
          sum(CAST(yc AS DECIMAL(38,0))) AS b,
          sum(CAST(xc AS DECIMAL(38,0)) * xc) AS xx,
          sum(CAST(yc AS DECIMAL(38,0)) * yc) AS yy,
          sum(CAST(xc AS DECIMAL(38,0)) * yc) AS xy
        FROM x JOIN y USING (k))
      SELECT n, $CccSql AS ccc, $PearsonSql AS pearson_r FROM ag""")),

    // ----- Krippendorff's α with missing ratings --------------------------
    // The agreement coefficient that survives an INCOMPLETE rating
    // panel: each of the 5 threshold raters rates only the ~60% of
    // documents its md5 gate selects (q362's Fleiss requires every
    // rater on every doc). Per-unit disagreement x_u(m_u−x_u)/(m_u−1)
    // is a rational with denominator ∈ {1..4}, cleared exactly by the
    // lcm 12 — so the whole statistic is four integer aggregates and
    // one shared double chain, map-only over the documents scan.
    ("q382_krippendorff_alpha", (s: SparkSession, dir: String) => {
      import s.implicits._
      val rated = Tables.t(s, dir, "documents")
        .select($"doc_id", $"n_chars")
      val withRatings = (0 to 4).foldLeft(rated) { (df, r) =>
        df.withColumn(s"p$r", expr(
          s"""CAST(conv(substring(md5(CAST(doc_id AS STRING) || '_r$r'), 1, 8),
              16, 10) AS BIGINT) % 10 < 6"""))
          .withColumn(s"v$r", ($"n_chars" >= 150 + 10 * r).cast("long"))
      }
      val perDoc = withRatings
        .withColumn("m", (0 to 4).map(r => col(s"p$r").cast("long")).reduce(_ + _))
        .withColumn("x", (0 to 4).map(r =>
          (col(s"p$r") && col(s"v$r") === 1L).cast("long")).reduce(_ + _))
        .filter($"m" >= 2)
      perDoc.agg(
          count(lit(1)).as("n_units"),
          sum($"m").as("n"),
          sum($"x").as("n1"),
          sum($"m" - $"x").as("n0"),
          // integral div: 12/(m−1) is exact for m ∈ {2..5}
          sum(expr("12 * x * (m - x) div (m - 1)")).as("s12"))
        .select($"n_units", $"n", $"n1", $"n0", $"s12",
          expr(KripSql).as("alpha"))
    }, Some {
      val pres = (0 to 4).map(r =>
        s"""(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_r$r'), 1, 8))::BIGINT % 10 < 6)""")
      val vals = (0 to 4).map(r => s"(n_chars >= ${150 + 10 * r})")
      val m = (0 to 4).map(r => s"CASE WHEN ${pres(r)} THEN 1 ELSE 0 END").mkString(" + ")
      val x = (0 to 4).map(r =>
        s"CASE WHEN ${pres(r)} AND ${vals(r)} THEN 1 ELSE 0 END").mkString(" + ")
      s"""
      WITH pd AS (SELECT CAST($m AS BIGINT) AS m, CAST($x AS BIGINT) AS x
        FROM documents),
      pd2 AS (SELECT * FROM pd WHERE m >= 2),
      ag AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
          CAST(sum(m) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS n1,
          CAST(sum(m - x) AS BIGINT) AS n0,
          CAST(sum(12 * x * (m - x) // (m - 1)) AS BIGINT) AS s12
        FROM pd2)
      SELECT n_units, n, n1, n0, s12, $KripSql AS alpha FROM ag"""
    }),

    // ----- grouped Hosmer–Lemeshow with out-of-sample expected rates ------
    // Is the per-source English rate LEARNED ON THE TRAIN SPLIT still
    // calibrated on the test split? q310 decomposes the Brier score
    // of one model; this is the χ²-shaped CALIBRATION TEST over g
    // strata with honestly out-of-sample expectations (an md5 gate
    // splits train/test — doc_id PARITY is confounded with source in
    // the synthetic layout, which would degenerate every stratum; and
    // in-sample HL is identically 0 by construction). The per-stratum
    // term clears to the exact integer ratio
    // (O·ntr − nte·xt)² / (nte·xt·(ntr−xt)); strata where the train
    // rate is degenerate (xt = 0 or xt = ntr) are excluded and
    // counted. One count aggregate, a ≤20-row fold sorted by source;
    // zero usable strata → NULL on both engines.
    ("q383_hosmer_lemeshow", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.t(s, dir, "documents")
        .select($"source", ($"lang" === "en").cast("long").as("y"),
          expr("""CAST(conv(substring(md5(CAST(doc_id AS STRING) || '_hl'), 1, 8),
              16, 10) AS BIGINT) % 2 = 0""").as("train"))
      val strata = d.groupBy($"source").agg(
        sum(when($"train", 1L).otherwise(0L)).as("ntr"),
        sum(when($"train", $"y").otherwise(0L)).as("xt"),
        sum(when(!$"train", 1L).otherwise(0L)).as("nte"),
        sum(when(!$"train", $"y").otherwise(0L)).as("o"))
      val terms = strata
        .withColumn("ok",
          $"xt" > 0 && $"xt" < $"ntr" && $"nte" > 0)
        .withColumn("num",
          ($"o".cast("decimal(38,0)") * $"ntr" - $"nte".cast("decimal(38,0)") * $"xt"))
        .withColumn("term", when($"ok", expr(
          """CAST(num AS DOUBLE) * CAST(num AS DOUBLE) /
             (CAST(nte AS DOUBLE) * CAST(xt AS DOUBLE) * (CAST(ntr AS DOUBLE) - CAST(xt AS DOUBLE)))"""))
          .otherwise(lit(null).cast("double")))
      terms.agg(
          sum($"ok".cast("long")).as("g_used"),
          sum((!$"ok").cast("long")).as("g_skipped"),
          collect_list(when($"ok", struct($"source", $"term"))).as("ts"))
        .select($"g_used", $"g_skipped",
          expr("""CASE WHEN size(ts) = 0 THEN NULL ELSE
            aggregate(array_sort(ts), CAST(0.0 AS DOUBLE), (acc, t) -> acc + t.term) END""")
            .as("hl_chi2"))
    }, Some("""
      WITH d AS (SELECT source, CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_hl'), 1, 8))::BIGINT % 2 = 0 AS train
        FROM documents),
      st AS (SELECT source,
          CAST(sum(CASE WHEN train THEN 1 ELSE 0 END) AS BIGINT) AS ntr,
          CAST(sum(CASE WHEN train THEN y ELSE 0 END) AS BIGINT) AS xt,
          CAST(sum(CASE WHEN NOT train THEN 1 ELSE 0 END) AS BIGINT) AS nte,
          CAST(sum(CASE WHEN NOT train THEN y ELSE 0 END) AS BIGINT) AS o
        FROM d GROUP BY 1),
      tm AS (SELECT source,
          (xt > 0 AND xt < ntr AND nte > 0) AS ok,
          CAST(o AS DECIMAL(38,0)) * ntr - CAST(nte AS DECIMAL(38,0)) * xt AS num,
          ntr, xt, nte
        FROM st),
      tm2 AS (SELECT source, ok,
          CASE WHEN ok THEN
            CAST(num AS DOUBLE) * CAST(num AS DOUBLE) /
            (CAST(nte AS DOUBLE) * CAST(xt AS DOUBLE) * (CAST(ntr AS DOUBLE) - CAST(xt AS DOUBLE)))
          ELSE NULL END AS term
        FROM tm)
      SELECT CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS g_used,
        CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS g_skipped,
        list_reduce(list(term ORDER BY source) FILTER (WHERE ok), (a, b) -> a + b) AS hl_chi2
      FROM tm2""")),

    // ----- Goodman–Kruskal λ(lang | source) -------------------------------
    // How much better does the MODAL language guess get when you know
    // the source? The proportional-reduction-in-error dual of q376's
    // entropy-based U: λ = (Σ_s max_l n_sl − max_l n_l)/(n − max_l n_l)
    // — pure integer counting over the bounded contingency grid, no
    // double until the single final ratio. λ = 0 when every source's
    // modal language is the global one (which entropy-based U can
    // still score > 0 — reporting both is the point).
    ("q384_gk_lambda", (s: SparkSession, dir: String) => {
      import s.implicits._
      val cells = Tables.t(s, dir, "documents")
        .groupBy($"source", $"lang").agg(count(lit(1)).as("nsl"))
        .localCheckpoint()
      val modal = cells.groupBy($"source").agg(max($"nsl").as("mx"))
        .agg(sum($"mx").as("sum_modal"))
      val overall = cells.groupBy($"lang").agg(sum($"nsl").as("nl"))
        .agg(max($"nl").as("modal_overall"), sum($"nl").as("n"))
      modal.crossJoin(broadcast(overall))
        .select($"n", $"sum_modal", $"modal_overall",
          expr("""CASE WHEN n = modal_overall THEN NULL ELSE
            CAST(sum_modal - modal_overall AS DOUBLE) /
            CAST(n - modal_overall AS DOUBLE) END""").as("lambda"))
    }, Some("""
      WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS nsl
        FROM documents GROUP BY 1, 2),
      md AS (SELECT CAST(sum(mx) AS BIGINT) AS sum_modal
        FROM (SELECT source, max(nsl) AS mx FROM cells GROUP BY 1)),
      ov AS (SELECT CAST(max(nl) AS BIGINT) AS modal_overall,
          CAST(sum(nl) AS BIGINT) AS n
        FROM (SELECT lang, sum(nsl) AS nl FROM cells GROUP BY 1))
      SELECT n, sum_modal, modal_overall,
        CASE WHEN n = modal_overall THEN NULL ELSE
          CAST(sum_modal - modal_overall AS DOUBLE) /
          CAST(n - modal_overall AS DOUBLE) END AS lambda
      FROM md, ov""")),

    // ----- linear-weighted Cohen's κ over ordinal deciles -----------------
    // Two ordinal scorers (length decile vs stopword-density decile,
    // q358's scorer pair mapped to a shared 0..9 scale): unweighted κ
    // (q253) would call a one-decile miss as wrong as a nine-decile
    // miss. Linear weights make κ_w = 1 − n·Σ|i−j|·o_ij / Σ|i−j|·rᵢ·cⱼ
    // — ENTIRELY exact integers off the 10×10 grid (the |i−j| weights
    // clear the usual 1−|i−j|/(R−1) normalization), one double at the
    // end. Same one-scan shape as q358; margins from the grid.
    ("q385_weighted_kappa", (s: SparkSession, dir: String) => {
      import s.implicits._
      // fused WordStopStats kernel: ONE primitive pass over the raw
      // text replaces normText's two regexes + the replace pass + the
      // stopword-alternation regexp_count (the ×100 probe priced that
      // chain at 134 s / 500k docs — proportional to passes per byte)
      val base = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"n_chars",
          graft.functions.WordStopStats($"text",
            Round11bQueries.GopherStops).as("st"))
        .select($"n_chars", $"st".getItem(0).as("wc"), $"st".getItem(1).as("ns"))
        .filter($"wc" > 0)
        .select(least(expr("CAST(n_chars AS BIGINT) * 2 div 100"), lit(9L)).as("ra"),
          least(expr("10 * ns div wc"), lit(9L)).as("rb"))
      val grid = base.groupBy($"ra", $"rb").agg(count(lit(1)).as("o"))
        .localCheckpoint()
      val wo = grid.agg(sum(abs($"ra" - $"rb").cast("decimal(38,0)") * $"o").as("wo"),
        sum($"o").as("n"))
      val rt = grid.groupBy($"ra").agg(sum($"o").as("ri"))
      val ct = grid.groupBy($"rb").agg(sum($"o").as("cj"))
      val we = rt.crossJoin(broadcast(ct))
        .agg(sum(abs($"ra" - $"rb").cast("decimal(38,0)") * $"ri" * $"cj").as("we"))
      wo.crossJoin(broadcast(we))
        .select($"n", $"wo".cast("double").as("w_observed"),
          $"we".cast("double").as("w_expected"),
          expr(WKappaSql).as("kappa_w"))
    }, Some {
      val norm = graft.ext.TextAnalysis.normTextSql
      val inList = Round11bQueries.GopherStops.mkString("|")
      s"""
      WITH b AS (SELECT doc_id, n_chars, $norm AS nt FROM documents),
      b2 AS (SELECT n_chars,
          CAST(CASE WHEN nt = '' THEN 0
            ELSE len(nt) - len(replace(nt, ' ', '')) + 1 END AS BIGINT) AS wc,
          CAST(len(regexp_extract_all(nt, '\\b($inList)\\b')) AS BIGINT) AS ns
        FROM b),
      b3 AS (SELECT least(CAST(n_chars AS BIGINT) * 2 // 100, 9) AS ra,
          least(10 * ns // wc, 9) AS rb
        FROM b2 WHERE wc > 0),
      g AS (SELECT ra, rb, CAST(count(*) AS BIGINT) AS o FROM b3 GROUP BY 1, 2),
      woc AS (SELECT sum(CAST(abs(ra - rb) AS DECIMAL(38,0)) * o) AS wo,
          CAST(sum(o) AS BIGINT) AS n FROM g),
      rt AS (SELECT ra, CAST(sum(o) AS BIGINT) AS ri FROM g GROUP BY 1),
      ct AS (SELECT rb, CAST(sum(o) AS BIGINT) AS cj FROM g GROUP BY 1),
      wec AS (SELECT sum(CAST(abs(ra - rb) AS DECIMAL(38,0)) * ri * cj) AS we
        FROM rt, ct)
      SELECT n, CAST(wo AS DOUBLE) AS w_observed,
        CAST(we AS DOUBLE) AS w_expected, $WKappaSql AS kappa_w
      FROM woc, wec"""
    }),

    // ----- Mantel–Haenszel pooled odds ratio ------------------------------
    // q374's crude OR can reverse under aggregation when source is a
    // confounder (the q238 Simpson failure mode); MH pools the
    // per-source 2×2s (exposure = mean-word-length rule, outcome =
    // repetition rule, strata = 20 sources) into the adjusted
    // estimator Σ(aᵢdᵢ/nᵢ)/Σ(bᵢcᵢ/nᵢ). Each stratum term is one
    // double from exact integers; the two ≤20-term sums fold sorted
    // by source on both engines. One pass over the shared gopherDoc
    // flags, stratum-grid scale after.
    ("q386_mantel_haenszel", (s: SparkSession, dir: String) => {
      import s.implicits._
      val strata = Round11bQueries.gopherDoc(s, dir)
        .groupBy($"source").agg(
          sum(($"r_mwl" && $"r_rep").cast("long")).as("a"),
          sum(($"r_mwl" && !$"r_rep").cast("long")).as("b"),
          sum((!$"r_mwl" && $"r_rep").cast("long")).as("c"),
          sum((!$"r_mwl" && !$"r_rep").cast("long")).as("d"))
        .withColumn("nst", $"a" + $"b" + $"c" + $"d")
        .withColumn("tad", expr(
          "CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / CAST(nst AS DOUBLE)"))
        .withColumn("tbc", expr(
          "CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / CAST(nst AS DOUBLE)"))
      strata.agg(
          count(lit(1)).as("k_strata"),
          collect_list(struct($"source", $"tad", $"tbc")).as("ts"))
        .withColumn("sad", expr(
          "aggregate(array_sort(ts), CAST(0.0 AS DOUBLE), (acc, t) -> acc + t.tad)"))
        .withColumn("sbc", expr(
          "aggregate(array_sort(ts), CAST(0.0 AS DOUBLE), (acc, t) -> acc + t.tbc)"))
        .select($"k_strata", $"sad".as("sum_ad_n"), $"sbc".as("sum_bc_n"),
          expr("CASE WHEN sbc = 0.0 THEN NULL ELSE sad / sbc END").as("or_mh"))
    }, Some(s"""
      WITH ${Round11bQueries.GopherDocSql},
      st AS (SELECT source,
          CAST(sum(CASE WHEN r_mwl AND r_rep THEN 1 ELSE 0 END) AS BIGINT) AS a,
          CAST(sum(CASE WHEN r_mwl AND NOT r_rep THEN 1 ELSE 0 END) AS BIGINT) AS b,
          CAST(sum(CASE WHEN NOT r_mwl AND r_rep THEN 1 ELSE 0 END) AS BIGINT) AS c,
          CAST(sum(CASE WHEN NOT r_mwl AND NOT r_rep THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM f GROUP BY 1),
      tm AS (SELECT source,
          CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / CAST(a + b + c + d AS DOUBLE) AS tad,
          CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / CAST(a + b + c + d AS DOUBLE) AS tbc
        FROM st),
      ag AS (SELECT CAST(count(*) AS BIGINT) AS k_strata,
          list_reduce(list(tad ORDER BY source), (x, y) -> x + y) AS sad,
          list_reduce(list(tbc ORDER BY source), (x, y) -> x + y) AS sbc
        FROM tm)
      SELECT k_strata, sad AS sum_ad_n, sbc AS sum_bc_n,
        CASE WHEN sbc = 0.0 THEN NULL ELSE sad / sbc END AS or_mh
      FROM ag"""))
  )
}
