package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{GridCumulative, TextAnalysis => TA}

/** Round-11 batch 2: the classical-statistics layer a curation team
  * runs ON TOP of the per-document signals the battery already
  * computes — rank tests (Mann–Whitney, Kruskal–Wallis), association
  * (Kendall τ-b, Cramér's V), multiplicity control (Benjamini–Hochberg
  * over permutation p-values), cascade-model retrieval eval (ERR), and
  * the Gopher-style document rule battery. House float discipline
  * throughout: every data-scale aggregate is exact integer/DECIMAL;
  * doubles appear only in the FINAL bounded-cardinality expression
  * chain, and any sum of more than two doubles folds a sorted list
  * (Spark `aggregate(array_sort(...))` ↔ DuckDB
  * `list_reduce(list(... ORDER BY ...))`) so both engines add in the
  * same order — the correctness gate compares float reprs exactly.
  * Scale notes sit on each query; shapes are grid/aggregate-bounded
  * (shuffles carry per-value/per-cell counts, never rows) except where
  * a scan-side expansion is the point and dialed (q359's seed fan-out).
  */
object Round11bQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** Permutation count for q359's null distribution (p granularity
    * 1/(S+1)). A dial: the scan fans out S× before the map-side
    * combine, and the shuffle carries only S × cells partial rows.
    */
  val FdrSeeds = 99

  /** Shared permutation p-value table (source, nx, t_obs, p) for the
    * multiplicity-control family — q359's BH step-up and q400's Holm
    * step-down consume the SAME pipeline so the two procedures can
    * never desynchronize their p-values. p-values are exact
    * permutation ranks over md5-relabeled cells; the scan fans out
    * FdrSeeds× but map-side combine reduces to seeds × cells partial
    * sums before the shuffle.
    */
  private[operators] def fdrPvals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.spread(Tables.t(s, dir, "documents"))
      .select($"doc_id", $"source", $"n_chars")
    val obs = d.groupBy($"source")
      .agg(sum($"n_chars").as("sx"), count(lit(1)).as("nx"))
    val tot = obs.agg(sum($"sx").as("stot"), sum($"nx").as("ntot"))
    val obsT = obs.crossJoin(broadcast(tot))
      .withColumn("t_obs", expr(
        "abs(CAST(sx AS DOUBLE)/CAST(nx AS DOUBLE) - CAST(stot AS DOUBLE)/CAST(ntot AS DOUBLE))"))
      .withColumn("cell", expr("CAST(substring(source, 4) AS BIGINT) % 20"))
    val perm = d
      .select($"doc_id", $"n_chars",
        explode(expr(s"sequence(1, $FdrSeeds)")).as("seed"))
      .withColumn("cell", expr(
        """CAST(conv(substring(md5(CAST(doc_id AS STRING) || '_' ||
           CAST(seed AS STRING)), 1, 8), 16, 10) AS BIGINT) % 20"""))
      .groupBy($"seed", $"cell")
      .agg(sum($"n_chars").as("px"), count(lit(1)).as("pn"))
      .crossJoin(broadcast(tot))
      .withColumn("t_perm", expr(
        "abs(CAST(px AS DOUBLE)/CAST(pn AS DOUBLE) - CAST(stot AS DOUBLE)/CAST(ntot AS DOUBLE))"))
      .select($"cell", $"t_perm")
    obsT.join(perm, Seq("cell"))
      .groupBy($"source", $"nx", $"t_obs")
      .agg(sum(($"t_perm" >= $"t_obs").cast("long")).as("n_ge"))
      .withColumn("p", expr(s"CAST(1 + n_ge AS DOUBLE) / ${FdrSeeds + 1}.0"))
  }

  /** DuckDB CTE chain ending in `pv(source, nx, t_obs, p)` — the
    * oracle rendering of [[fdrPvals]], shared by q359 and q400. */
  private[operators] val FdrPvalSql: String = s"""d AS (SELECT doc_id, source, n_chars FROM documents),
      obs AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS sx,
          CAST(count(*) AS BIGINT) AS nx FROM d GROUP BY 1),
      tot AS (SELECT CAST(sum(sx) AS BIGINT) AS stot,
          CAST(sum(nx) AS BIGINT) AS ntot FROM obs),
      ob2 AS (SELECT source, nx,
          abs(CAST(sx AS DOUBLE)/CAST(nx AS DOUBLE) - CAST(stot AS DOUBLE)/CAST(ntot AS DOUBLE)) AS t_obs,
          CAST(substr(source, 4) AS BIGINT) % 20 AS cell
        FROM obs, tot),
      pm AS (SELECT seed,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_' ||
            CAST(seed AS VARCHAR)), 1, 8))::BIGINT % 20 AS cell, n_chars
        FROM d, range(1, ${FdrSeeds + 1}) t(seed)),
      pc AS (SELECT seed, cell, CAST(sum(n_chars) AS BIGINT) AS px,
          CAST(count(*) AS BIGINT) AS pn FROM pm GROUP BY 1, 2),
      pt AS (SELECT cell,
          abs(CAST(px AS DOUBLE)/CAST(pn AS DOUBLE) - CAST(stot AS DOUBLE)/CAST(ntot AS DOUBLE)) AS t_perm
        FROM pc, tot),
      pv AS (SELECT source, nx, t_obs,
          CAST(1 + sum(CASE WHEN t_perm >= t_obs THEN 1 ELSE 0 END) AS DOUBLE)
            / ${FdrSeeds + 1}.0 AS p
        FROM ob2 JOIN pt USING (cell) GROUP BY 1, 2, 3)"""

  /** Mann–Whitney z from the exact integer grid aggregates — shared
    * verbatim between the Spark plan and the DuckDB oracle so the
    * IEEE op order is identical. Inputs: u1x2 = 2·U1 (exact), n1, n2,
    * tsum = Σ(t³−t) over tied groups.
    */
  private[operators] val MwZSql =
    """CAST(u1x2 - n1*n2 AS DOUBLE) / (2.0 * sqrt(
       (CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE)/12.0) *
       ((CAST(n1+n2 AS DOUBLE)+1.0) - CAST(tsum AS DOUBLE) /
        (CAST(n1+n2 AS DOUBLE)*(CAST(n1+n2 AS DOUBLE)-1.0)))))"""

  /** Fleiss κ chain from the integer rating-count aggregates (n docs,
    * sx = Σ x_i raters-say-long, spp = Σ x_i²+(R−x_i)², R = 5 raters).
    * Shared text, double ops only.
    */
  private[operators] val FleissSql = Seq(
    "CAST(sx AS DOUBLE)/(5.0*CAST(n AS DOUBLE)) AS p_long",
    """(CAST(spp AS DOUBLE) - 5.0*CAST(n AS DOUBLE)) /
       (20.0*CAST(n AS DOUBLE)) AS p_bar""",
    """((CAST(spp AS DOUBLE) - 5.0*CAST(n AS DOUBLE)) / (20.0*CAST(n AS DOUBLE))
       - (CAST(sx AS DOUBLE)/(5.0*CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE)/(5.0*CAST(n AS DOUBLE)))
          + (1.0 - CAST(sx AS DOUBLE)/(5.0*CAST(n AS DOUBLE))) * (1.0 - CAST(sx AS DOUBLE)/(5.0*CAST(n AS DOUBLE)))))
       / (1.0
       - (CAST(sx AS DOUBLE)/(5.0*CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE)/(5.0*CAST(n AS DOUBLE)))
          + (1.0 - CAST(sx AS DOUBLE)/(5.0*CAST(n AS DOUBLE))) * (1.0 - CAST(sx AS DOUBLE)/(5.0*CAST(n AS DOUBLE)))))
       AS kappa""")

  // canonical definition lives with the kernel so the SQL registration
  // (GraftExtensions) and this battery share ONE stop set
  private[graft] val GopherStops = graft.functions.GopherTextStats.GopherStops

  /** Per-document Gopher rule flags (see q355) — shared with q371's
    * Cochran Q so both sides of both queries compute the rules from
    * ONE definition. Returns (doc_id, source, r_wc..r_sym).
    *
    * One fused primitive scan per document (GopherTextStats): the
    * round-11 form was already shuffle-free but still paid three regex
    * passes plus a split + array_sort fold — ~84 s at ×100 docs, the
    * text battery's measured ceiling. The kernel computes the same six
    * integers in one pass (bit-equality with that expression chain
    * pinned in GopherTextStatsSpec on the whole corpus + adversarial
    * edges). The DuckDB oracle keeps the definitional
    * normalize+unnest+group form — same values, different physical
    * plan, which is the point.
    */
  private[graft] def gopherDoc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.spread(Tables.t(s, dir, "documents"))
    docs
      .select($"doc_id", $"source",
        graft.functions.GopherTextStats($"text", GopherStops).as("g"))
      .select($"doc_id", $"source",
        $"g".getItem(0).as("wc"),
        $"g".getItem(1).as("sumlen"),
        ($"g".getItem(0) - $"g".getItem(2)).as("n_alpha"),
        $"g".getItem(3).as("n_stopkinds"),
        $"g".getItem(4).as("maxw"),
        $"g".getItem(5).as("n_sym"))
      .filter($"wc" > 0)
      .withColumn("r_wc", $"wc" >= 50 && $"wc" <= 100000)
      .withColumn("r_mwl",
        $"sumlen" >= lit(3) * $"wc" && $"sumlen" <= lit(10) * $"wc")
      .withColumn("r_alpha", lit(5) * $"n_alpha" >= lit(4) * $"wc")
      .withColumn("r_stop", $"n_stopkinds" >= 2)
      .withColumn("r_rep", lit(10) * $"maxw" <= $"wc")
      .withColumn("r_sym", lit(10) * $"n_sym" <= $"wc")
      .select($"doc_id", $"source", $"r_wc", $"r_mwl", $"r_alpha",
        $"r_stop", $"r_rep", $"r_sym")
  }

  /** DuckDB CTE chain ending in `f(doc_id, source, r_wc..r_sym)` —
    * the oracle rendering of [[gopherDoc]], shared by q355 and q371.
    */
  private[operators] val GopherDocSql: String = {
    val norm = TA.normTextSql
    val stopSum = GopherStops.map(w =>
      s"CASE WHEN list_contains(a, '$w') THEN 1 ELSE 0 END").mkString(" + ")
    s"""b AS (SELECT doc_id, source, text, $norm AS nt FROM documents),
      b2 AS (SELECT doc_id, source, text, nt, string_split(nt, ' ') AS a,
          CAST(CASE WHEN nt = '' THEN 0 ELSE len(string_split(nt, ' ')) END AS BIGINT) AS wc
        FROM b),
      b3 AS (SELECT doc_id, source, a, wc,
          CAST(len(nt) - (wc - 1) AS BIGINT) AS sumlen,
          CAST(len(list_filter(a, w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS n_alpha,
          CAST($stopSum AS BIGINT) AS n_stopkinds,
          CAST(len(text) - len(replace(text, '#', '')) AS BIGINT)
            + CAST((len(text) - len(replace(text, '...', ''))) / 3 AS BIGINT) AS n_sym
        FROM b2 WHERE wc > 0),
      rep AS (SELECT doc_id, max(c) AS maxw FROM (
          SELECT doc_id, w, count(*) AS c
          FROM (SELECT doc_id, unnest(a) AS w FROM b3) GROUP BY 1, 2)
        GROUP BY 1),
      f AS (SELECT b3.doc_id, b3.source,
          (wc >= 50 AND wc <= 100000) AS r_wc,
          (sumlen >= 3*wc AND sumlen <= 10*wc) AS r_mwl,
          (5*n_alpha >= 4*wc) AS r_alpha,
          (n_stopkinds >= 2) AS r_stop,
          (10*maxw <= wc) AS r_rep,
          (10*n_sym <= wc) AS r_sym
        FROM b3 JOIN rep USING (doc_id))"""
  }

  /** Grid-derived rank-sum tables over (source, n_chars) — shared by
    * q357 (Kruskal–Wallis) and q366 (Dunn post-hoc): per-source
    * (nj, rj2 = 2·rank-sum as DECIMAL) and the scalar (n, tsum =
    * Σ(t³−t)) totals. Ranks come from the distinct-value grid via
    * GridCumulative — no global sort anywhere.
    */
  private[operators] def sourceRankTables(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import s.implicits._
    val d = Tables.t(s, dir, "documents").select($"source", $"n_chars")
    val grid = d.groupBy($"n_chars").agg(count(lit(1)).as("c"))
    val cum = GridCumulative.withRunningTotal(grid, "n_chars", "c", "cumc")
      .withColumn("ar2", lit(2) * ($"cumc" - $"c") + $"c" + 1)
    val totals = cum.agg(
      sum($"c").as("n"),
      sum($"c".cast("decimal(38,0)") * $"c" * $"c" - $"c").as("tsum"))
    val rj = d.groupBy($"source", $"n_chars")
      .agg(count(lit(1)).as("cs"))
      .join(broadcast(cum.select($"n_chars", $"ar2")), Seq("n_chars"))
      .groupBy($"source").agg(
        sum($"cs").as("nj"),
        sum($"cs".cast("decimal(38,0)") * $"ar2").as("rj2"))
    (rj, totals)
  }

  /** DuckDB CTE chain ending in `rj(source, nj, rj2)` and `tot(n,
    * tsum)` — the oracle rendering of [[sourceRankTables]].
    */
  private[operators] val SourceRankSql: String = """
      d AS (SELECT source, n_chars FROM documents),
      g AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1),
      g2 AS (SELECT *,
          sum(c) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cumc
        FROM g),
      g3 AS (SELECT n_chars, c, 2*(cumc - c) + c + 1 AS ar2 FROM g2),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
          sum(CAST(c AS DECIMAL(38,0)) * c * c - c) AS tsum FROM g3),
      ps AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS cs
        FROM d GROUP BY 1, 2),
      rj AS (SELECT source, CAST(sum(cs) AS BIGINT) AS nj,
          sum(CAST(cs AS DECIMAL(38,0)) * ar2) AS rj2
        FROM ps JOIN g3 USING (n_chars) GROUP BY source)"""

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- Gopher-style document rule battery -----------------------------
    // The named per-document quality rules (Rae et al.'s Gopher filter
    // family, re-expressed on this corpus): word-count bounds, mean
    // word length bounds, alphabetic-word fraction, ≥2 distinct
    // stopwords, top-word repetition cap, symbol-to-word cap. q17 is a
    // scalar quality SCORE; this is the production boolean rule
    // battery with per-rule pass accounting, and every rule compares
    // CROSS-MULTIPLIED INTEGERS (e.g. 5·n_alpha ≥ 4·wc) so no float
    // ratio exists anywhere. Shape: one normalize+split scan, one
    // (doc, word)-count shuffle for the repetition rule (bounded by
    // corpus token count, same as q16's), one per-source rollup.
    ("q355_gopher_rules", (s: SparkSession, dir: String) => {
      import s.implicits._
      gopherDoc(s, dir)
        .groupBy($"source").agg(
          count(lit(1)).as("n_docs"),
          sum($"r_wc".cast("long")).as("p_wc"),
          sum($"r_mwl".cast("long")).as("p_mwl"),
          sum($"r_alpha".cast("long")).as("p_alpha"),
          sum($"r_stop".cast("long")).as("p_stop"),
          sum($"r_rep".cast("long")).as("p_rep"),
          sum($"r_sym".cast("long")).as("p_sym"),
          sum(($"r_wc" && $"r_mwl" && $"r_alpha" && $"r_stop" && $"r_rep" &&
            $"r_sym").cast("long")).as("p_all"))
        .orderBy($"source")
    }, Some {
      s"""
      WITH $GopherDocSql
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN r_wc THEN 1 ELSE 0 END) AS BIGINT) AS p_wc,
        CAST(sum(CASE WHEN r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS p_mwl,
        CAST(sum(CASE WHEN r_alpha THEN 1 ELSE 0 END) AS BIGINT) AS p_alpha,
        CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS p_stop,
        CAST(sum(CASE WHEN r_rep THEN 1 ELSE 0 END) AS BIGINT) AS p_rep,
        CAST(sum(CASE WHEN r_sym THEN 1 ELSE 0 END) AS BIGINT) AS p_sym,
        CAST(sum(CASE WHEN r_wc AND r_mwl AND r_alpha AND r_stop AND r_rep
          AND r_sym THEN 1 ELSE 0 END) AS BIGINT) AS p_all
      FROM f GROUP BY source ORDER BY source"""
    }),

    // ----- Mann–Whitney U (tie-corrected) ---------------------------------
    // Rank-sum drift test between two sources' length distributions.
    // The classical formulation sorts all N values — a global sort.
    // Here ranks come from the VALUE GRID: one count-per-distinct-value
    // aggregate, the two-level GridCumulative running total (bounded
    // per-task state at any grid size), and 2·avg-rank for a tied
    // value as the exact integer 2·(cum−c)+c+1. Everything through
    // 2·U1 and the tie mass Σ(t³−t) is exact DECIMAL; z is one shared
    // double expression. The shuffle carries distinct values, not
    // rows — at 100 TB the grid is domain-bounded (document lengths).
    ("q356_mann_whitney", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.t(s, dir, "documents")
        .filter($"source".isin("src0", "src1"))
        .select($"source", $"n_chars")
      val grid = d.groupBy($"n_chars").agg(
        sum(when($"source" === "src0", 1L).otherwise(0L)).as("c1"),
        sum(when($"source" === "src1", 1L).otherwise(0L)).as("c2"))
        .withColumn("c", $"c1" + $"c2")
      val cum = GridCumulative.withRunningTotal(grid, "n_chars", "c", "cumc")
      cum.agg(
          sum($"c1").as("n1"), sum($"c2").as("n2"),
          sum($"c1".cast("decimal(38,0)") *
            (lit(2) * ($"cumc" - $"c") + $"c" + 1)).as("r1x2"),
          sum($"c".cast("decimal(38,0)") * $"c" * $"c" - $"c").as("tsum"))
        .withColumn("u1x2",
          $"r1x2" - $"n1".cast("decimal(38,0)") * ($"n1" + 1))
        .select($"n1", $"n2", $"u1x2".cast("double").as("u1x2"),
          $"tsum".cast("double").as("tie_mass"),
          expr(MwZSql).as("z"))
    }, Some(s"""
      WITH d AS (SELECT source, n_chars FROM documents
        WHERE source IN ('src0', 'src1')),
      g AS (SELECT n_chars,
          CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
          CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM d GROUP BY 1),
      g2 AS (SELECT *, c1 + c2 AS c,
          sum(c1 + c2) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cumc
        FROM g),
      a AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
          sum(CAST(c1 AS DECIMAL(38,0)) * (2*(cumc - c) + c + 1)) AS r1x2,
          sum(CAST(c AS DECIMAL(38,0)) * c * c - c) AS tsum
        FROM g2),
      b AS (SELECT n1, n2,
          r1x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS u1x2, tsum FROM a)
      SELECT n1, n2, CAST(u1x2 AS DOUBLE) AS u1x2,
        CAST(tsum AS DOUBLE) AS tie_mass,
        $MwZSql AS z
      FROM b""")),

    // ----- Kruskal–Wallis H (tie-corrected) -------------------------------
    // The k-sample generalization over ALL sources. Same grid-rank
    // machinery as q356; per-source rank sums come from one broadcast
    // join of (source, value)-counts against the 2·avg-rank grid. The
    // only float sum — Σ_j (2R_j)²/n_j over k sources — folds a
    // source-sorted list identically in both engines. H is reported
    // raw and tie-adjusted.
    ("q357_kruskal_wallis", (s: SparkSession, dir: String) => {
      import s.implicits._
      val (rj, totals) = sourceRankTables(s, dir)
      val perSrc = rj.withColumn("term",
        expr("CAST(rj2 AS DOUBLE) * CAST(rj2 AS DOUBLE) / CAST(nj AS DOUBLE)"))
      perSrc.agg(
          count(lit(1)).as("k"),
          collect_list(struct($"source", $"term")).as("ts"))
        .crossJoin(broadcast(totals))
        .withColumn("sumterm", expr(
          "aggregate(array_sort(ts), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"))
        .withColumn("h", expr(
          """3.0 * sumterm / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
             - 3.0 * (CAST(n AS DOUBLE) + 1.0)"""))
        .select($"k", $"n", $"h",
          expr("""h / (1.0 - CAST(tsum AS DOUBLE) /
            (CAST(n AS DOUBLE)*CAST(n AS DOUBLE)*CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))""")
            .as("h_tie_adj"))
    }, Some(s"""
      WITH $SourceRankSql,
      tm AS (SELECT source,
          CAST(rj2 AS DOUBLE) * CAST(rj2 AS DOUBLE) / CAST(nj AS DOUBLE) AS term
        FROM rj),
      f AS (SELECT CAST(count(*) AS BIGINT) AS k,
          list_reduce(list(term ORDER BY source), (a, b) -> a + b) AS sumterm
        FROM tm),
      h0 AS (SELECT k, n, tsum,
          3.0 * sumterm / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
            - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h
        FROM f, tot)
      SELECT k, n, h,
        h / (1.0 - CAST(tsum AS DOUBLE) /
          (CAST(n AS DOUBLE)*CAST(n AS DOUBLE)*CAST(n AS DOUBLE) - CAST(n AS DOUBLE))) AS h_tie_adj
      FROM h0""")),

    // ----- Kendall τ-b via the contingency grid ---------------------------
    // Rank correlation between two discrete scorers (length bucket vs
    // stopword-density bucket). The textbook form enumerates N² pairs;
    // bucketed scorers reduce it to the B×B contingency grid — one
    // count aggregate, then concordant/discordant mass from the grid's
    // self-join (bounded cells, broadcast). All pair counts are exact
    // DECIMAL; τ-b is one double expression. q244 fits Spearman ρ on
    // the same scorer idea — this is the pair-concordance coefficient
    // with proper tie treatment, the one you quote when scorer scales
    // are ordinal, not interval.
    ("q358_kendall_tau", (s: SparkSession, dir: String) => {
      import s.implicits._
      // fused WordStopStats kernel: one primitive pass for (wc, ns) —
      // no normText string, no regex engine on the corpus-scan path
      // (bit-equality with the regex chain pinned in WordStopStatsSpec)
      val base = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"n_chars",
          graft.functions.WordStopStats($"text", GopherStops).as("st"))
        .select($"n_chars", $"st".getItem(0).as("wc"), $"st".getItem(1).as("ns"))
        .filter($"wc" > 0)
        .select(expr("CAST(n_chars AS BIGINT) * 2 div 100").as("la"),
          expr("10 * ns div wc").as("lb"))
      val grid = base.groupBy($"la", $"lb").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val g2 = grid.select($"la".as("la2"), $"lb".as("lb2"), $"cnt".as("cnt2"))
      val pairs = grid.crossJoin(broadcast(g2)).agg(
        sum(when($"la2" > $"la" && $"lb2" > $"lb",
          $"cnt".cast("decimal(38,0)") * $"cnt2").otherwise(lit(0).cast("decimal(38,0)"))).as("cpairs"),
        sum(when($"la2" > $"la" && $"lb2" < $"lb",
          $"cnt".cast("decimal(38,0)") * $"cnt2").otherwise(lit(0).cast("decimal(38,0)"))).as("dpairs"))
      val rowT = grid.groupBy($"la").agg(sum($"cnt").as("ra"))
        .agg(sum($"ra".cast("decimal(38,0)") * ($"ra" - 1) / 2).as("ties_a"))
      val colT = grid.groupBy($"lb").agg(sum($"cnt").as("rb"))
        .agg(sum($"rb".cast("decimal(38,0)") * ($"rb" - 1) / 2).as("ties_b"))
      val tot = grid.agg(sum($"cnt").as("n"))
        .withColumn("n0",
          $"n".cast("decimal(38,0)") * ($"n" - 1) / 2)
      pairs.crossJoin(broadcast(rowT)).crossJoin(broadcast(colT))
        .crossJoin(broadcast(tot))
        .select($"n",
          $"cpairs".cast("double").as("c_pairs"),
          $"dpairs".cast("double").as("d_pairs"),
          $"ties_a".cast("double").as("t_a"),
          $"ties_b".cast("double").as("t_b"),
          expr("""(CAST(cpairs AS DOUBLE) - CAST(dpairs AS DOUBLE)) /
            sqrt((CAST(n0 AS DOUBLE) - CAST(ties_a AS DOUBLE)) *
                 (CAST(n0 AS DOUBLE) - CAST(ties_b AS DOUBLE)))""").as("tau_b"))
    }, Some {
      val norm = TA.normTextSql
      val inList = GopherStops.map(w => s"'$w'").mkString(", ")
      s"""
      WITH b AS (SELECT doc_id, n_chars, $norm AS nt FROM documents),
      b2 AS (SELECT doc_id, n_chars, string_split(nt, ' ') AS a,
          CAST(CASE WHEN nt = '' THEN 0 ELSE len(string_split(nt, ' ')) END AS BIGINT) AS wc
        FROM b),
      b3 AS (SELECT
          CAST(CAST(n_chars AS BIGINT) * 2 // 100 AS BIGINT) AS la,
          CAST(10 * CAST(len(list_filter(a, w -> w IN ($inList))) AS BIGINT) // wc AS BIGINT) AS lb
        FROM b2 WHERE wc > 0),
      g AS (SELECT la, lb, CAST(count(*) AS BIGINT) AS cnt FROM b3 GROUP BY 1, 2),
      p AS (SELECT
          sum(CASE WHEN g2.la > g.la AND g2.lb > g.lb
            THEN CAST(g.cnt AS DECIMAL(38,0)) * g2.cnt ELSE CAST(0 AS DECIMAL(38,0)) END) AS cpairs,
          sum(CASE WHEN g2.la > g.la AND g2.lb < g.lb
            THEN CAST(g.cnt AS DECIMAL(38,0)) * g2.cnt ELSE CAST(0 AS DECIMAL(38,0)) END) AS dpairs
        FROM g, g AS g2),
      ta AS (SELECT sum(CAST(ra AS DECIMAL(38,0)) * (ra - 1) / 2) AS ties_a
        FROM (SELECT la, CAST(sum(cnt) AS BIGINT) AS ra FROM g GROUP BY 1)),
      tb AS (SELECT sum(CAST(rb AS DECIMAL(38,0)) * (rb - 1) / 2) AS ties_b
        FROM (SELECT lb, CAST(sum(cnt) AS BIGINT) AS rb FROM g GROUP BY 1)),
      tn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
          CAST(sum(cnt) AS DECIMAL(38,0)) * (sum(cnt) - 1) / 2 AS n0 FROM g)
      SELECT n, CAST(cpairs AS DOUBLE) AS c_pairs, CAST(dpairs AS DOUBLE) AS d_pairs,
        CAST(ties_a AS DOUBLE) AS t_a, CAST(ties_b AS DOUBLE) AS t_b,
        (CAST(cpairs AS DOUBLE) - CAST(dpairs AS DOUBLE)) /
          sqrt((CAST(n0 AS DOUBLE) - CAST(ties_a AS DOUBLE)) *
               (CAST(n0 AS DOUBLE) - CAST(ties_b AS DOUBLE))) AS tau_b
      FROM p, ta, tb, tn"""
    }),

    // ----- Benjamini–Hochberg over permutation p-values -------------------
    // Multiplicity-controlled per-source mean-length drift screen: the
    // missing step between q320's per-cell rate audits and a defensible
    // "which sources actually shifted" claim at 20 simultaneous tests.
    // p-values are EXACT permutation ranks — no normal approximation,
    // no erf: for each of FdrSeeds hash-derived re-labelings the cell
    // stat |mean_cell − mean_all| is recomputed and p = (1 + #{perm ≥
    // obs}) / (S+1), all integer counting over deterministic doubles.
    // Shape: the scan fans out S× (a dial) but map-side combine
    // reduces to S × cells partial sums before the shuffle; BH's
    // step-up runs on the m=20-row table. The md5-prefix relabeling is
    // the engine-portable hash both q110 and q352 validated.
    ("q359_bh_fdr", (s: SparkSession, dir: String) => {
      import s.implicits._
      val wRank = Window.partitionBy(lit(0)).orderBy($"p", $"source")
      val wAll = Window.partitionBy(lit(0))
      fdrPvals(s, dir)
        .withColumn("krank", row_number().over(wRank).cast("long"))
        .withColumn("m", count(lit(1)).over(wAll))
        .withColumn("pass",
          expr("CASE WHEN p <= CAST(krank AS DOUBLE) * 0.1 / CAST(m AS DOUBLE) THEN krank ELSE CAST(0 AS BIGINT) END"))
        .withColumn("kmax", max($"pass").over(wAll))
        .select($"source", $"nx".as("n_docs"), $"t_obs", $"p", $"krank",
          ($"krank" <= $"kmax").as("rejected"))
        .orderBy($"source")
    }, Some(s"""
      WITH $FdrPvalSql,
      rk AS (SELECT *,
          CAST(row_number() OVER (ORDER BY p, source) AS BIGINT) AS krank,
          CAST(count(*) OVER () AS BIGINT) AS m
        FROM pv),
      km AS (SELECT *, max(CASE WHEN p <= CAST(krank AS DOUBLE) * 0.1 / CAST(m AS DOUBLE)
            THEN krank ELSE CAST(0 AS BIGINT) END) OVER () AS kmax
        FROM rk)
      SELECT source, nx AS n_docs, t_obs, p, krank, (krank <= kmax) AS rejected
      FROM km ORDER BY source""")),

    // ----- Expected Reciprocal Rank (cascade model) -----------------------
    // The cascade-click retrieval metric over per-customer order
    // rankings with hash-derived graded relevance g ∈ {0..3}. The
    // satisfaction probabilities R = (2^g−1)/8 are exact dyadic
    // rationals, so the cascade products are EXACT floats (≤30
    // mantissa bits over 10 ranks) and engine-order-independent; the
    // per-query sum folds in rank order on both sides. Output is the
    // bounded ERR histogram — per-query metrics never leave the
    // executor as a float reduction. nDCG/MRR/AP (q293/q294) are
    // position-discount metrics; ERR is the dependent-judgment cascade
    // (a doc's credit is gated by everything ranked above it).
    ("q360_err_ranking", (s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      val ranked = Tables.t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
        .withColumn("r", row_number().over(w)).filter($"r" <= 10)
        .withColumn("g", expr(
          "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 8), 16, 10) AS BIGINT) % 4"))
        .withColumn("rr", expr(
          "CASE WHEN g = 0 THEN 0.0 WHEN g = 1 THEN 0.125 WHEN g = 2 THEN 0.375 ELSE 0.875 END"))
      ranked.groupBy($"o_custkey")
        .agg(collect_list(struct($"r", $"rr")).as("xs"))
        .withColumn("err", expr(
          """aggregate(array_sort(xs),
               named_struct('e', CAST(0.0 AS DOUBLE), 'p', CAST(1.0 AS DOUBLE)),
               (acc, x) -> named_struct(
                 'e', acc.e + acc.p * x.rr / CAST(x.r AS DOUBLE),
                 'p', acc.p * (1.0 - x.rr)),
               acc -> acc.e)"""))
        .groupBy(floor($"err" * 20).cast("long").as("err_bin"))
        .agg(count(lit(1)).as("n_queries"),
          min($"err").as("err_min"), max($"err").as("err_max"))
        .orderBy($"err_bin")
    }, Some("""
      WITH ranked AS (SELECT o_custkey, o_orderkey,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS r
        FROM orders),
      g AS (SELECT o_custkey, r,
          ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 4 AS gr
        FROM ranked WHERE r <= 10),
      rr AS (SELECT o_custkey, r,
          CASE WHEN gr = 0 THEN 0.0 WHEN gr = 1 THEN 0.125
               WHEN gr = 2 THEN 0.375 ELSE 0.875 END AS rv
        FROM g),
      pb AS (SELECT o_custkey, r, rv,
          COALESCE(product(1.0 - rv) OVER (PARTITION BY o_custkey ORDER BY r
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 1.0) AS pprod
        FROM rr),
      c AS (SELECT o_custkey, r, pprod * rv / CAST(r AS DOUBLE) AS contrib
        FROM pb),
      e AS (SELECT o_custkey,
          list_reduce(list(contrib ORDER BY r), (a, b) -> a + b) AS err
        FROM c GROUP BY o_custkey)
      SELECT CAST(floor(err * 20) AS BIGINT) AS err_bin,
        CAST(count(*) AS BIGINT) AS n_queries,
        min(err) AS err_min, max(err) AS err_max
      FROM e GROUP BY 1 ORDER BY 1"""))
  )
}
