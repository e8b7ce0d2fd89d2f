package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 12: distribution-free prediction sets (split
  * conformal), metadata dependence (mutual information), topic
  * segmentation (TextTiling), storage-order compression economics,
  * aggregation-bias auditing (Simpson reversal), and corpus
  * concentration (Gini/Lorenz).
  *
  * House rules as elsewhere: micro-ln for transcendentals, integer
  * arithmetic at every gate, 128-bit cross-products where sums reach
  * n², identical aliases both sides, total ORDER BY.
  */
object Round8lQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- split-conformal threshold + conditional coverage ---------------
    // The distribution-free complement of q204's calibration audit:
    // split conformal prediction over the q191 hashed linear scorer.
    // The calibration half (md5 split — exchangeable by construction)
    // yields the ceil(0.9·(n+1))-th smallest score as the 90% threshold;
    // the eval half then reads MARGINAL coverage (guaranteed ≥ 90% in
    // expectation) and PER-SOURCE conditional coverage — the guarantee
    // conformal does NOT make, and exactly where a shifted source shows
    // up. The rank threshold is one ordered window over the calibration
    // set only — bounded because calibration sets are fixed-size samples
    // BY DESIGN at any corpus scale; the eval side is one rollup
    // aggregate under a broadcast scalar threshold.
    ("q234_conformal_coverage", (s: SparkSession, dir: String) => {
      import s.implicits._
      val scored = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"source", explode(split(TA.normText($"text"), " ")).as("tok"))
        .withColumn("w",
          conv(substring(md5(concat(lit("w|"),
              (conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long") % 1024)
                .cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2001 - 1000)
        .groupBy($"doc_id", $"source").agg(sum($"w").as("logit"))
        .withColumn("is_cal",
          conv(substring(md5(concat(lit("cal|"), $"doc_id".cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2 === 0)
        .localCheckpoint() // threshold pass + coverage pass
      val cal = scored.filter($"is_cal")
      val nCal = cal.agg(count(lit(1)).as("n_cal"))
      val thr = graft.ext.GridRank
        .withRowNumber(cal, "logit", Seq($"doc_id"), "rn") // two-level global rank
        .crossJoin(broadcast(nCal))
        .filter($"rn" === expr("(9 * (n_cal + 1) + 9) div 10"))
        .select($"logit".as("thr"))
      scored.filter(!$"is_cal")
        .crossJoin(broadcast(thr))
        .rollup($"source")
        .agg(count(lit(1)).as("n_eval"),
          sum(when($"logit" <= $"thr", 1L).otherwise(0L)).as("n_covered"))
        .select(coalesce($"source", lit("ALL")).as("source"), $"n_eval", $"n_covered",
          expr("(1000000 * n_covered) div n_eval").as("cov_micro"),
          lit(900000L).as("target_micro"))
        .orderBy($"source")
    }, Some(s"""
      WITH toks AS (SELECT doc_id, source, unnest(string_split($normSql, ' ')) AS tok FROM documents),
      scored AS (SELECT doc_id, source,
          CAST(sum(('0x' || substr(md5('w|' || CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) AS BIGINT) AS logit,
          ('0x' || substr(md5('cal|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0 AS is_cal
        FROM toks GROUP BY doc_id, source),
      nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM scored WHERE is_cal),
      ranked AS (SELECT logit, row_number() OVER (ORDER BY logit, doc_id) AS rn
        FROM scored WHERE is_cal),
      thr AS (SELECT logit AS thr FROM ranked CROSS JOIN nc
        WHERE rn = (9 * (n_cal + 1) + 9) // 10),
      ev AS (SELECT coalesce(source, 'ALL') AS source,
          CAST(count(*) AS BIGINT) AS n_eval,
          CAST(sum(CASE WHEN logit <= thr.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        FROM scored CROSS JOIN thr WHERE NOT is_cal
        GROUP BY ROLLUP(source))
      SELECT source, n_eval, n_covered,
        (1000000 * n_covered) // n_eval AS cov_micro,
        CAST(900000 AS BIGINT) AS target_micro
      FROM ev ORDER BY source""")),

    // ----- mutual information between metadata columns --------------------
    // The redundancy audit for stratification keys: MI(a;b) =
    // Σ p(ab)·(ln p(ab) − ln p(a) − ln p(b)) over three column pairs of
    // the documents table, stacked into ONE generic pipeline (pair is
    // just another group key, so adding pairs costs rows, not stages).
    // High NMI between two keys means stratifying on both buys nothing
    // (q220's question, answered pairwise); near-zero means independent
    // dials. Cell and margin tables are |values|-bounded aggregates;
    // the ln terms are micro-lns of integer-count ratios; the weighted
    // sums clear to integers through one final div. NMI normalizes by
    // min(H_a, H_b), the tight bound for MI.
    ("q235_mi_metadata", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.t(s, dir, "documents")
        .select($"source", $"lang",
          least(expr("n_chars div 500"), lit(4L)).cast("string").as("lb"))
      val stacked = d.select(lit("source|lang").as("pair"), $"source".as("a"), $"lang".as("b"))
        .unionByName(d.select(lit("source|lenb").as("pair"), $"source".as("a"), $"lb".as("b")))
        .unionByName(d.select(lit("lang|lenb").as("pair"), $"lang".as("a"), $"lb".as("b")))
      val cells = stacked.groupBy($"pair", $"a", $"b").agg(count(lit(1)).as("n_ab"))
      val ma = stacked.groupBy($"pair", $"a").agg(count(lit(1)).as("n_a"))
      val mb = stacked.groupBy($"pair", $"b").agg(count(lit(1)).as("n_b"))
      val tot = stacked.groupBy($"pair").agg(count(lit(1)).as("n"))
      def mln(x: Column, n: Column): Column =
        floor(log(x.cast("double") / n.cast("double")) * 1e6 + 0.5).cast("long")
      val joined = cells.join(ma, Seq("pair", "a")).join(mb, Seq("pair", "b"))
        .join(broadcast(tot), Seq("pair"))
        .select($"pair", $"n_ab", $"n_a", $"n_b", $"n",
          (mln($"n_ab", $"n") - mln($"n_a", $"n") - mln($"n_b", $"n")).as("l_mi"),
          mln($"n_a", $"n").as("l_a"), mln($"n_b", $"n").as("l_b"))
      // MI cell sums are SIGNED (independent pairs round to ±noise):
      // floored double division both sides (q227 rule; sums bounded
      // ~1e11 here, orders inside double's 2^53 exactness). Entropy
      // sums are ≤ 0 by construction, so negating first keeps those
      // divisions in non-negative integer `div` territory.
      joined.groupBy($"pair")
        .agg(count(lit(1)).as("n_cells"),
          expr("CAST(floor(sum(n_ab * l_mi) / CAST(max(n) AS DOUBLE)) AS BIGINT)").as("mi_micro"),
          expr("(-sum(n_ab * l_a)) div max(n)").as("h_a_micro"),
          expr("(-sum(n_ab * l_b)) div max(n)").as("h_b_micro"))
        .select($"pair", $"n_cells", $"mi_micro", $"h_a_micro", $"h_b_micro",
          expr("CAST(floor((1000000.0 * mi_micro) / (CASE WHEN h_a_micro < h_b_micro THEN h_a_micro ELSE h_b_micro END)) AS BIGINT)")
            .as("nmi_micro"))
        .orderBy($"pair")
    }, Some("""
      WITH d AS (SELECT source, lang,
          CAST(least(n_chars // 500, 4) AS VARCHAR) AS lb FROM documents),
      stacked AS (
        SELECT 'source|lang' AS pair, source AS a, lang AS b FROM d
        UNION ALL SELECT 'source|lenb', source, lb FROM d
        UNION ALL SELECT 'lang|lenb', lang, lb FROM d),
      cells AS (SELECT pair, a, b, CAST(count(*) AS BIGINT) AS n_ab
        FROM stacked GROUP BY 1, 2, 3),
      ma AS (SELECT pair, a, CAST(count(*) AS BIGINT) AS n_a FROM stacked GROUP BY 1, 2),
      mb AS (SELECT pair, b, CAST(count(*) AS BIGINT) AS n_b FROM stacked GROUP BY 1, 2),
      tot AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM stacked GROUP BY 1),
      j AS (SELECT c.pair, c.n_ab, t.n,
          CAST(floor(ln(CAST(c.n_ab AS DOUBLE) / t.n) * 1e6 + 0.5) AS BIGINT)
            - CAST(floor(ln(CAST(ma.n_a AS DOUBLE) / t.n) * 1e6 + 0.5) AS BIGINT)
            - CAST(floor(ln(CAST(mb.n_b AS DOUBLE) / t.n) * 1e6 + 0.5) AS BIGINT) AS l_mi,
          CAST(floor(ln(CAST(ma.n_a AS DOUBLE) / t.n) * 1e6 + 0.5) AS BIGINT) AS l_a,
          CAST(floor(ln(CAST(mb.n_b AS DOUBLE) / t.n) * 1e6 + 0.5) AS BIGINT) AS l_b
        FROM cells c JOIN ma ON c.pair = ma.pair AND c.a = ma.a
        JOIN mb ON c.pair = mb.pair AND c.b = mb.b
        JOIN tot t ON c.pair = t.pair)
      SELECT pair, CAST(count(*) AS BIGINT) AS n_cells,
        CAST(floor(sum(n_ab * l_mi) / CAST(max(n) AS DOUBLE)) AS BIGINT) AS mi_micro,
        CAST((-sum(n_ab * l_a)) // max(n) AS BIGINT) AS h_a_micro,
        CAST((-sum(n_ab * l_b)) // max(n) AS BIGINT) AS h_b_micro,
        CAST(floor((1000000.0 * CAST(floor(sum(n_ab * l_mi) / CAST(max(n) AS DOUBLE)) AS BIGINT))
          / (CASE WHEN (-sum(n_ab * l_a)) // max(n) < (-sum(n_ab * l_b)) // max(n)
                THEN (-sum(n_ab * l_a)) // max(n) ELSE (-sum(n_ab * l_b)) // max(n) END)) AS BIGINT) AS nmi_micro
      FROM j GROUP BY pair ORDER BY pair""")),

    // ----- TextTiling topic segmentation ----------------------------------
    // Per-document topic-boundary detection (Hearst's TextTiling, the
    // block-comparison form): adjacent 10-token windows compared by
    // vocabulary Jaccard at every full-window boundary; a boundary with
    // sim < 0.1 is a topic shift. Everything keys on (doc_id, win) —
    // window sets are distinct-token aggregates, the adjacency is a
    // TRUE (doc_id, win+1) equi-join (the q232 discipline), and the
    // boundary table reduces per doc. No global state: every shuffle
    // key includes doc_id, so 100 TB of documents segment
    // embarrassingly parallel. Chunking (q118) cuts at fixed offsets;
    // this cuts where the VOCABULARY says to — the difference between
    // packing and understanding.
    ("q236_text_tiling", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", posexplode(split(TA.normText($"text"), " ")).as(Seq("pos", "tok")))
        .withColumn("win", expr("pos div 10"))
      val winsz = toks.groupBy($"doc_id", $"win").agg(count(lit(1)).as("n_pos"))
        .filter($"n_pos" === 10)
      val wt = toks.select($"doc_id", $"win", $"tok").distinct()
        .join(winsz.select($"doc_id", $"win"), Seq("doc_id", "win"))
      val sz = wt.groupBy($"doc_id", $"win").agg(count(lit(1)).as("sz"))
      val inter = wt.toDF("doc_id", "w2", "tok")
        .select($"doc_id", ($"w2" - 1).as("win"), $"tok")
        .join(wt, Seq("doc_id", "win", "tok"))
        .groupBy($"doc_id", $"win").agg(count(lit(1)).as("inter"))
      val bounds = sz.toDF("doc_id", "win", "sz_a")
        .join(sz.toDF("doc_id", "w2", "sz_b")
          .select($"doc_id", ($"w2" - 1).as("win"), $"sz_b"), Seq("doc_id", "win"))
        .join(inter, Seq("doc_id", "win"), "left").na.fill(0L, Seq("inter"))
        .select($"doc_id", $"win",
          expr("(1000000 * inter) div (sz_a + sz_b - inter)").as("sim_micro"))
      bounds.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bounds"),
          expr("sum(sim_micro) div count(1)").as("mean_sim_micro"),
          sum(when($"sim_micro" < 100000, 1L).otherwise(0L)).as("n_shifts"))
        .orderBy($"doc_id")
    }, Some(s"""
      WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS a FROM documents),
      toks AS (SELECT doc_id, a[i] AS tok, (i - 1) // 10 AS win
        FROM base, unnest(range(1, len(a) + 1)) AS t(i)),
      winsz AS (SELECT doc_id, win FROM toks GROUP BY 1, 2 HAVING count(*) = 10),
      wt AS (SELECT DISTINCT t.doc_id, t.win, t.tok FROM toks t
        JOIN winsz w ON t.doc_id = w.doc_id AND t.win = w.win),
      sz AS (SELECT doc_id, win, CAST(count(*) AS BIGINT) AS sz FROM wt GROUP BY 1, 2),
      inter AS (SELECT l.doc_id, l.win, CAST(count(*) AS BIGINT) AS inter
        FROM (SELECT doc_id, win - 1 AS win, tok FROM wt) l
        JOIN wt r ON l.doc_id = r.doc_id AND l.win = r.win AND l.tok = r.tok
        GROUP BY 1, 2),
      bounds AS (SELECT a.doc_id, a.win,
          (1000000 * coalesce(i.inter, 0)) // (a.sz + b.sz - coalesce(i.inter, 0)) AS sim_micro
        FROM sz a JOIN (SELECT doc_id, win - 1 AS win, sz FROM sz) b
          ON a.doc_id = b.doc_id AND a.win = b.win
        LEFT JOIN inter i ON a.doc_id = i.doc_id AND a.win = i.win)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bounds,
        CAST(sum(sim_micro) // count(*) AS BIGINT) AS mean_sim_micro,
        CAST(sum(CASE WHEN sim_micro < 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_shifts
      FROM bounds GROUP BY doc_id ORDER BY doc_id""")),

    // ----- sort-order compression estimator -------------------------------
    // The storage-layout question z-order (q147) answers for SCANS,
    // answered for BYTES: how much run-length encoding does each
    // candidate column get from the table's write order, vs the best
    // case (sorted by that column, where runs = distinct values)? Runs
    // under write order count value changes inside each (l_orderkey,
    // l_linenumber) block — a window partitioned by (column, order), so
    // no global sort; cross-order boundaries are ≤ |orders| and counted
    // as run starts, which is exact for the row-group-per-order layout
    // this models. The three candidate columns stack into one melted
    // pipeline (the q235 trick) — auditing a wider table adds rows,
    // not stages. The gap between gain_natural and gain_sorted is the
    // re-sort's payoff in storage — the number a compaction policy
    // (q163) should be reading.
    ("q237_rle_estimate", (s: SparkSession, dir: String) => {
      import s.implicits._
      val li = Tables.t(s, dir, "lineitem")
      val melted = li.select($"l_orderkey".as("ok"), $"l_linenumber".as("ln"),
          explode(expr(
            "array(struct('l_partkey' AS col, CAST(l_partkey AS STRING) AS v)," +
            " struct('l_suppkey' AS col, CAST(l_suppkey AS STRING) AS v)," +
            " struct('l_returnflag' AS col, l_returnflag AS v))")).as("x"))
        .select($"ok", $"ln", $"x.col".as("col"), $"x.v".as("v"))
      // the generator duplicates (ok, ln), so the value joins the sort
      // key to make the modeled write order TOTAL — equal values sort
      // adjacent inside a tie group, deterministically on both sides
      val runs = melted
        .withColumn("prev", lag($"v", 1).over(
          Window.partitionBy($"col", $"ok").orderBy($"ln", $"v")))
        .groupBy($"col")
        .agg(count(lit(1)).as("n"),
          sum(when($"prev".isNull || $"prev" =!= $"v", 1L).otherwise(0L)).as("runs_natural"))
      val nd = melted.groupBy($"col").agg(countDistinct($"v").as("n_distinct"))
      runs.join(nd, Seq("col"))
        .select($"col", $"n", $"n_distinct", $"runs_natural",
          expr("(1000000 * (n - runs_natural)) div n").as("rle_gain_natural_micro"),
          expr("(1000000 * (n - n_distinct)) div n").as("rle_gain_sorted_micro"))
        .orderBy($"col")
    }, Some("""
      WITH melted AS (
        SELECT l_orderkey AS ok, l_linenumber AS ln, 'l_partkey' AS col,
          CAST(l_partkey AS VARCHAR) AS v FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_suppkey',
          CAST(l_suppkey AS VARCHAR) FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_returnflag',
          l_returnflag FROM lineitem),
      lagged AS (SELECT col, v,
          lag(v) OVER (PARTITION BY col, ok ORDER BY ln, v) AS prev
        FROM melted),
      runs AS (SELECT col, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN prev IS NULL OR prev <> v THEN 1 ELSE 0 END) AS BIGINT) AS runs_natural
        FROM lagged GROUP BY col),
      nd AS (SELECT col, CAST(count(DISTINCT v) AS BIGINT) AS n_distinct
        FROM melted GROUP BY col)
      SELECT r.col, r.n, nd.n_distinct, r.runs_natural,
        (1000000 * (r.n - r.runs_natural)) // r.n AS rle_gain_natural_micro,
        (1000000 * (r.n - nd.n_distinct)) // r.n AS rle_gain_sorted_micro
      FROM runs r JOIN nd ON r.col = nd.col ORDER BY r.col""")),

    // ----- Simpson's-paradox audit (pooled vs per-segment trend) ----------
    // The aggregation-bias check every corpus-level correlation should
    // ship with: the sign of cov(acctbal, totalprice) pooled over all
    // orders vs within each market segment. A reversal (segment signs
    // disagreeing with the pooled sign) means the pooled trend is a
    // composition artifact — Simpson's paradox — and any mixing/
    // weighting decision read off the pooled number inverts inside the
    // strata it actually acts on. Covariance clears to the integer
    // n·Σxy − Σx·Σy with per-term 128-bit casts (Σxy alone reaches
    // 9e18 at sf0.1 — past Int64 exactly where it matters); each
    // segment is one aggregate row, the pooled sign one broadcast
    // scalar.
    ("q238_simpson_audit", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.t(s, dir, "orders")
        .join(Tables.t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment".as("segment"),
          floor($"c_acctbal" * 100 + lit(0.5)).cast("long").as("x"),
          floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("y"))
      def covSign(g: org.apache.spark.sql.RelationalGroupedDataset) = g
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
          sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
          sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"))
        .withColumn("cov_scaled", expr("n * sxy - sx * sy"))
        .withColumn("sign", when($"cov_scaled" > 0, 1L)
          .when($"cov_scaled" < 0, -1L).otherwise(0L))
      val pooled = covSign(d.groupBy()).select($"sign".as("pooled_sign"))
      covSign(d.groupBy($"segment"))
        .crossJoin(broadcast(pooled))
        .select($"segment", $"n".as("n_orders"), $"sign".as("cov_sign"),
          $"pooled_sign",
          when($"sign" =!= $"pooled_sign", 1L).otherwise(0L).as("is_reversal"))
        .orderBy($"segment")
    }, Some("""
      WITH d AS (SELECT c.c_mktsegment AS segment,
          CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS x,
          CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      seg AS (SELECT segment, CAST(count(*) AS BIGINT) AS n,
          CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
            - sum(CAST(x AS HUGEINT)) * sum(CAST(y AS HUGEINT)) AS cov_scaled
        FROM d GROUP BY segment),
      pooled AS (SELECT CASE
          WHEN CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
            - sum(CAST(x AS HUGEINT)) * sum(CAST(y AS HUGEINT)) > 0 THEN 1
          WHEN CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
            - sum(CAST(x AS HUGEINT)) * sum(CAST(y AS HUGEINT)) < 0 THEN -1
          ELSE 0 END AS pooled_sign FROM d)
      SELECT seg.segment, seg.n AS n_orders,
        (CASE WHEN seg.cov_scaled > 0 THEN 1 WHEN seg.cov_scaled < 0 THEN -1
          ELSE 0 END)::BIGINT AS cov_sign,
        CAST(pooled.pooled_sign AS BIGINT) AS pooled_sign,
        (CASE WHEN (CASE WHEN seg.cov_scaled > 0 THEN 1
            WHEN seg.cov_scaled < 0 THEN -1 ELSE 0 END) <> pooled.pooled_sign
          THEN 1 ELSE 0 END)::BIGINT AS is_reversal
      FROM seg CROSS JOIN pooled ORDER BY seg.segment""")),

    // ----- Gini concentration (Lorenz) ------------------------------------
    // How concentrated is the corpus? Two Gini coefficients from the
    // same rank-sum identity G = (2·Σi·x_i − (n+1)·Σx_i)/(n·Σx_i) over
    // ascending-ranked unit sizes: source-level (docs per source — the
    // mixing-table inequality) and token-level (frequency per token —
    // the Zipf mass concentration q119 fits a slope to, read here as a
    // single inequality number). Σi·x_i is invariant under tie order,
    // so the rank window (|sources| / |vocab|-bounded, the documented
    // q195 grid bound) needs no tie rule for correctness — row_number
    // gets one anyway for plan determinism. G→0 is uniform; G→1 is
    // winner-take-all: the one number that says whether a dedup or cap
    // policy (q197) is even needed.
    ("q239_gini", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
      val bySource = docs.groupBy($"source").agg(count(lit(1)).as("x"))
        .select(lit("source_docs").as("dim"), $"source".as("unit"), $"x")
      val byToken = docs
        .select(explode(split(TA.normText($"text"), " ")).as("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("x"))
        .select(lit("token_freq").as("dim"), $"tok".as("unit"), $"x")
      bySource.unionByName(byToken)
        .withColumn("i", row_number().over(
          Window.partitionBy($"dim").orderBy($"x", $"unit")))
        .groupBy($"dim")
        .agg(count(lit(1)).as("n_units"), sum($"x").as("total"),
          sum($"i" * $"x").as("ranksum"))
        .select($"dim", $"n_units", $"total",
          expr("(1000000 * (2 * ranksum - (n_units + 1) * total)) div (n_units * total)")
            .as("gini_micro"))
        .orderBy($"dim")
    }, Some(s"""
      WITH src AS (SELECT 'source_docs' AS dim, source AS unit,
          CAST(count(*) AS BIGINT) AS x FROM documents GROUP BY 2),
      tok AS (SELECT 'token_freq' AS dim, tok AS unit, CAST(count(*) AS BIGINT) AS x
        FROM (SELECT unnest(string_split($normSql, ' ')) AS tok FROM documents)
        GROUP BY 2),
      u AS (SELECT * FROM src UNION ALL SELECT * FROM tok),
      ranked AS (SELECT dim, x,
          CAST(row_number() OVER (PARTITION BY dim ORDER BY x, unit) AS BIGINT) AS i
        FROM u)
      SELECT dim, CAST(count(*) AS BIGINT) AS n_units,
        CAST(sum(x) AS BIGINT) AS total,
        CAST((1000000 * (2 * sum(i * x) - (count(*) + 1) * sum(x)))
          // (count(*) * sum(x)) AS BIGINT) AS gini_micro
      FROM ranked GROUP BY dim ORDER BY dim"""))
  )
}
