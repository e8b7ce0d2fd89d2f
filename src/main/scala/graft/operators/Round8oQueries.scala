package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 15: graph traversal (multi-source BFS layers, bounded
  * Bellman–Ford SSSP), inter-annotator agreement (Cohen's kappa),
  * broadcast-gazetteer entity matching, and a columnar encoding
  * advisor — traversal and annotation-quality surface the battery
  * lacked, plus the storage-decision layer on top of q237's run
  * statistics.
  *
  * House rules as elsewhere: integer arithmetic at every gate, 128-bit
  * (DECIMAL(38,0)/HUGEINT) where corpus-count products appear,
  * identical aliases both sides, total ORDER BY.
  */
object Round8oQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  /** The q153 bipartite part–supplier graph: nodes 2·partkey (even) and
    * 2·suppkey+1 (odd), one undirected edge per distinct lineitem pair. */
  private val edgeSql =
    """e0 AS (SELECT DISTINCT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v
      |        FROM lineitem),
      |      e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0)"""
      .stripMargin

  /** One BFS round as a DuckDB CTE block: expand the current distance
    * table over the edge list, min-combine with what's known. */
  private def bfsRoundSql(r: Int): String = {
    val p = s"d${r - 1}"
    s"""
      x$r AS (SELECT d.seed, e.v AS node, d.dist + 1 AS dist
        FROM $p d JOIN e ON d.node = e.u),
      d$r AS (SELECT seed, node, CAST(min(dist) AS BIGINT) AS dist FROM
        (SELECT * FROM $p UNION ALL SELECT * FROM x$r) GROUP BY 1, 2)"""
  }

  /** One Bellman–Ford relaxation round: dist' = min(dist, dist[u]+w). */
  private def bfRoundSql(r: Int): String = {
    val p = s"t${r - 1}"
    s"""
      y$r AS (SELECT e.v AS node, d.dist + e.w AS dist
        FROM $p d JOIN e ON d.node = e.u),
      t$r AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM
        (SELECT * FROM $p UNION ALL SELECT * FROM y$r) GROUP BY 1)"""
  }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- multi-source BFS distance layers -------------------------------
    // The traversal primitive the graph family lacked: breadth-first
    // distance layers from 4 seeds, run as ONE batched computation —
    // the distance table keys on (seed, node), so all four traversals
    // share every edge-list join (the batched-BFS trick that makes
    // landmark-distance and closeness estimation affordable at scale).
    // Each round is the Pregel step as relational algebra: expand the
    // known table over the edge list, min-combine — the table never
    // exceeds |seeds|·|V| rows and the round count is the fixed hop
    // bound k = 4, driver-composed with a localCheckpoint barrier per
    // round. On the bipartite part–supplier graph layer parity is a
    // built-in sanity check: even-id seeds sit at even distance from
    // part nodes only. At 100 TB the edge list shuffles once per round
    // on its join key — the same co-partitioned shape as q153's
    // PageRank, with |seeds| a dial that amortizes it.
    ("q251_multi_source_bfs", (s: SparkSession, dir: String) => {
      import s.implicits._
      val e0 = Tables.t(s, dir, "lineitem")
        .select(($"l_partkey" * 2).as("u"), ($"l_suppkey" * 2 + 1).as("v"))
        .distinct()
      val e = e0.unionByName(e0.select($"v".as("u"), $"u".as("v")))
        .localCheckpoint() // 4 rounds reuse it
      val seeds = e.select($"u").distinct().orderBy($"u").limit(4)
      var dist = seeds.select($"u".as("seed"), $"u".as("node"),
        lit(0L).as("dist")).localCheckpoint()
      for (_ <- 1 to 4) {
        val expand = dist.join(e, dist("node") === e("u"))
          .select(dist("seed"), e("v").as("node"), (dist("dist") + 1L).as("dist"))
        dist = dist.unionByName(expand)
          .groupBy($"seed", $"node").agg(min($"dist").as("dist"))
          .localCheckpoint()
      }
      dist.groupBy($"seed", $"dist")
        .agg(count(lit(1)).as("n_nodes"), sum($"node").as("checksum"))
        .orderBy($"seed", $"dist")
    }, Some(s"""
      WITH $edgeSql,
      seeds AS (SELECT u AS seed FROM (SELECT DISTINCT u FROM e)
        ORDER BY u LIMIT 4),
      d0 AS (SELECT seed, seed AS node, CAST(0 AS BIGINT) AS dist FROM seeds),
      ${bfsRoundSql(1)},
      ${bfsRoundSql(2)},
      ${bfsRoundSql(3)},
      ${bfsRoundSql(4)}
      SELECT seed, dist, CAST(count(*) AS BIGINT) AS n_nodes,
        CAST(sum(node) AS BIGINT) AS checksum
      FROM d4 GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ----- bounded Bellman–Ford single-source shortest paths --------------
    // The weighted companion to q251: min-plus relaxation instead of
    // frontier expansion. Edge weight = the smallest shipment quantity
    // ever moved over a part–supplier pair (an integer, so every path
    // length is exact); 3 relaxation rounds give exact ≤3-hop shortest
    // distances — the bounded-hop form that's the production compromise
    // (full Bellman–Ford is |V| rounds; landmark systems cap hops and
    // document the bound, as here). Same relational Pregel shape as
    // q251: expand + min-combine per round over the once-checkpointed
    // edge list; the distance table is |V|-bounded. Output folds to a
    // distance histogram (÷10 buckets) so the answer is stable however
    // many nodes tie.
    ("q252_sssp_bellman_ford", (s: SparkSession, dir: String) => {
      import s.implicits._
      val e0 = Tables.t(s, dir, "lineitem")
        .groupBy(($"l_partkey" * 2).as("u"), ($"l_suppkey" * 2 + 1).as("v"))
        .agg(min($"l_quantity".cast("long")).as("w"))
      val e = e0.unionByName(e0.select($"v".as("u"), $"u".as("v"), $"w"))
        .localCheckpoint()
      val seed = e.select($"u").distinct().orderBy($"u").limit(1)
      var dist = seed.select($"u".as("node"), lit(0L).as("dist"))
        .localCheckpoint()
      for (_ <- 1 to 3) {
        val relax = dist.join(e, dist("node") === e("u"))
          .select(e("v").as("node"), (dist("dist") + e("w")).as("dist"))
        dist = dist.unionByName(relax)
          .groupBy($"node").agg(min($"dist").as("dist"))
          .localCheckpoint()
      }
      dist.groupBy(expr("dist div 10").as("dist_bucket"))
        .agg(count(lit(1)).as("n_nodes"), sum($"dist").as("dist_sum"),
          min($"dist").as("dist_min"), max($"dist").as("dist_max"))
        .orderBy($"dist_bucket")
    }, Some(s"""
      WITH e0 AS (SELECT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v,
          CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem GROUP BY 1, 2),
      e AS (SELECT u, v, w FROM e0 UNION ALL SELECT v AS u, u AS v, w FROM e0),
      seed AS (SELECT u FROM (SELECT DISTINCT u FROM e) ORDER BY u LIMIT 1),
      t0 AS (SELECT u AS node, CAST(0 AS BIGINT) AS dist FROM seed),
      ${bfRoundSql(1)},
      ${bfRoundSql(2)},
      ${bfRoundSql(3)}
      SELECT dist // 10 AS dist_bucket, CAST(count(*) AS BIGINT) AS n_nodes,
        CAST(sum(dist) AS BIGINT) AS dist_sum,
        CAST(min(dist) AS BIGINT) AS dist_min,
        CAST(max(dist) AS BIGINT) AS dist_max
      FROM t3 GROUP BY 1 ORDER BY 1""")),

    // ----- Cohen's kappa inter-annotator agreement ------------------------
    // The labeling-pipeline QA gate: two annotators rate every document
    // against a quality bar; raw agreement p_o flatters them whenever
    // the classes are imbalanced, kappa subtracts the chance-agreement
    // floor p_e = Σ_c p_A(c)·p_B(c). Here the annotators are the shared
    // signal (n_chars ≥ 250) with independent deterministic error
    // channels (md5 flips at 10% and 20%), so the expected kappa is
    // high-but-not-1 — exactly the regime the statistic exists for.
    // One corpus scan builds the 2×2 confusion matrix; p_e's products
    // of marginal counts go through 128-bit so corpus-scale n² can't
    // wrap. At 100 TB this is a single map-side classification plus a
    // 4-cell aggregate — the cheapest possible audit of an annotation
    // vendor before trusting a million labels.
    ("q253_cohens_kappa", (s: SparkSession, dir: String) => {
      import s.implicits._
      val ann = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", ($"n_chars" >= 250).as("sig"))
        .withColumn("fa",
          conv(substring(md5(concat(lit("annA|"), $"doc_id".cast("string"))), 1, 8), 16, 10)
            .cast("long") % 10 === 0)
        .withColumn("fb",
          conv(substring(md5(concat(lit("annB|"), $"doc_id".cast("string"))), 1, 8), 16, 10)
            .cast("long") % 5 === 0)
        .select($"doc_id", ($"sig" =!= $"fa").as("a"), ($"sig" =!= $"fb").as("b"))
      val cm = ann.agg(count(lit(1)).as("n"),
        sum(when($"a" && $"b", 1L).otherwise(0L)).as("n11"),
        sum(when($"a" && !$"b", 1L).otherwise(0L)).as("n10"),
        sum(when(!$"a" && $"b", 1L).otherwise(0L)).as("n01"),
        sum(when(!$"a" && !$"b", 1L).otherwise(0L)).as("n00"))
      cm.select($"n", $"n11", $"n10", $"n01", $"n00",
          expr("1000000 * (n11 + n00) div n").as("po_micro"),
          expr("""CAST((1000000 * (CAST(n11 + n10 AS DECIMAL(38,0)) * (n11 + n01)
            + CAST(n01 + n00 AS DECIMAL(38,0)) * (n10 + n00)))
            div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""").as("pe_micro"))
        .select($"n", $"n11", $"n10", $"n01", $"n00", $"po_micro", $"pe_micro",
          expr("1000000 * (po_micro - pe_micro) div (1000000 - pe_micro)")
            .as("kappa_micro"))
    }, Some("""
      WITH ann AS (SELECT doc_id, (n_chars >= 250) AS sig,
          ('0x' || substr(md5('annA|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            % 10 = 0 AS fa,
          ('0x' || substr(md5('annB|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            % 5 = 0 AS fb
        FROM documents),
      ab AS (SELECT doc_id, (sig <> fa) AS a, (sig <> fb) AS b FROM ann),
      cm AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
          CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
          CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
          CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
        FROM ab),
      p AS (SELECT *, 1000000 * (n11 + n00) // n AS po_micro,
          CAST((1000000 * (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
            + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)))
            // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_micro
        FROM cm)
      SELECT n, n11, n10, n01, n00, po_micro, pe_micro,
        1000000 * (po_micro - pe_micro) // (1000000 - pe_micro) AS kappa_micro
      FROM p""")),

    // ----- broadcast-gazetteer entity matching ----------------------------
    // Dictionary-driven entity tagging — the NER-without-a-model pass
    // every curation pipeline runs (gazetteer/keyword matching against
    // a controlled vocabulary): the dictionary is built from ANOTHER
    // table (the distinct words of part names), broadcast, and matched
    // against the token stream — so the corpus-sized side never
    // shuffles on content, only the per-source aggregate moves. Per
    // source: mention count, distinct entities hit, mention density,
    // and the dominant entity. At 100 TB the gazetteer (thousands to
    // millions of terms) still broadcasts or at worst bucket-joins on
    // the token — the corpus never re-partitions. The plan is pinned
    // to a broadcast join in the batch spec.
    ("q254_gazetteer_match", (s: SparkSession, dir: String) => {
      import s.implicits._
      val gaz = Tables.t(s, dir, "part")
        .select(explode(split(lower($"p_name"), " ")).as("entity"))
        .filter(length($"entity") > 0).distinct()
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", explode(split(TA.normText($"text"), " ")).as("tok"))
        .filter(length($"tok") > 0)
      val tot = toks.groupBy($"source").agg(count(lit(1)).as("n_tokens"))
      val hits = toks.join(broadcast(gaz), $"tok" === $"entity")
        .groupBy($"source", $"entity").agg(count(lit(1)).as("n"))
      val per = hits.groupBy($"source")
        .agg(sum($"n").as("n_mentions"), count(lit(1)).as("n_entities"))
      val top = hits.withColumn("rn", row_number().over(
          Window.partitionBy($"source").orderBy(desc("n"), $"entity")))
        .filter($"rn" === 1).select($"source", $"entity".as("top_entity"))
      tot.join(per, Seq("source"), "left").join(top, Seq("source"), "left")
        .select($"source", $"n_tokens",
          coalesce($"n_mentions", lit(0L)).as("n_mentions"),
          coalesce($"n_entities", lit(0L)).as("n_entities"),
          expr("1000000 * coalesce(n_mentions, 0) div n_tokens")
            .as("density_micro"),
          coalesce($"top_entity", lit("")).as("top_entity"))
        .orderBy($"source")
    }, Some(s"""
      WITH gaz AS (SELECT DISTINCT w AS entity FROM
          (SELECT unnest(string_split(lower(p_name), ' ')) AS w FROM part)
        WHERE len(w) > 0),
      toks AS (SELECT source, tok FROM
          (SELECT source, unnest(string_split($normSql, ' ')) AS tok
           FROM documents) WHERE len(tok) > 0),
      tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
        FROM toks GROUP BY 1),
      hits AS (SELECT t.source, g.entity, CAST(count(*) AS BIGINT) AS n
        FROM toks t JOIN gaz g ON t.tok = g.entity GROUP BY 1, 2),
      per AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_mentions,
          CAST(count(*) AS BIGINT) AS n_entities FROM hits GROUP BY 1),
      top AS (SELECT source, entity AS top_entity FROM (
          SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY n DESC, entity) AS rn FROM hits) WHERE rn = 1)
      SELECT t.source, t.n_tokens,
        coalesce(p.n_mentions, 0) AS n_mentions,
        coalesce(p.n_entities, 0) AS n_entities,
        1000000 * coalesce(p.n_mentions, 0) // t.n_tokens AS density_micro,
        coalesce(tp.top_entity, '') AS top_entity
      FROM tot t LEFT JOIN per p ON t.source = p.source
      LEFT JOIN top tp ON t.source = tp.source
      ORDER BY t.source""")),

    // ----- columnar encoding advisor --------------------------------------
    // The decision layer on top of q237's run statistics: for each
    // candidate column, estimate bytes under PLAIN, DICT (index width
    // from NDV: 1/2/4 bytes), RLE (runs × (width + 4-byte run length)),
    // and DELTA (bit-packed non-negative deltas under the write order —
    // numeric, monotone-friendly columns only), then pick the cheapest
    // — what a format writer (Parquet/ORC encoding chooser) does per
    // column chunk. All four estimates come from ONE melted pass:
    // per-column NDV + lag-window runs + max delta under the explicit
    // (l_orderkey, l_linenumber) write order (the q237 determinism
    // rule: never trust implicit file order). Bit widths via binary
    // string length — integer-exact on both engines. At 100 TB this
    // runs per column chunk inside the writer, metadata-scale output.
    ("q255_encoding_advisor", (s: SparkSession, dir: String) => {
      import s.implicits._
      val li = Tables.t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          $"l_returnflag", $"l_linestatus",
          $"l_quantity".cast("long").as("qty"),
          datediff($"l_shipdate".cast("date"), lit("1970-01-01").cast("date"))
            .cast("long").as("shipday"))
      val melted = li.select($"l_orderkey", $"l_linenumber", expr(
        """stack(4,
           'c1_orderkey', CAST(l_orderkey AS STRING), l_orderkey, CAST(8 AS BIGINT),
           'c2_returnflag', l_returnflag, CAST(NULL AS BIGINT), CAST(1 AS BIGINT),
           'c3_quantity', CAST(qty AS STRING), qty, CAST(8 AS BIGINT),
           'c4_shipday', CAST(shipday AS STRING), shipday, CAST(4 AS BIGINT)
           ) AS (cname, vs, vn, width)"""))
      // (l_orderkey, l_linenumber) is NOT unique in the generator — the
      // q237 determinism rule: the value itself joins the sort key so
      // both engines see the same total order. Run/delta statistics are
      // sequential, so they're computed DISTRIBUTED: bucket partials
      // (the bucket is a prefix of the sort key, so buckets are
      // contiguous runs of the total order) + boundary stitching — a
      // per-cname window would drag the whole column through 4 window
      // partitions; the bucketed form keeps |columns|·|buckets|-way
      // parallelism and only the bucket-summary table (metadata-scale)
      // sees a small window. Same pattern as q106's distributed prefix
      // sum; the single-window form remains the oracle.
      val bWin = Window.partitionBy($"cname", $"bkt")
        .orderBy($"l_orderkey", $"l_linenumber", $"vs")
      val bWinDesc = Window.partitionBy($"cname", $"bkt")
        .orderBy(desc("l_orderkey"), desc("l_linenumber"), desc("vs"))
      val marked = melted.withColumn("bkt", expr("l_orderkey div 256"))
        .withColumn("pv", lag($"vs", 1).over(bWin))
        .withColumn("pn", lag($"vn", 1).over(bWin))
        .withColumn("isrun", when($"pv".isNull || $"pv" =!= $"vs", 1L).otherwise(0L))
        .withColumn("delta", $"vn" - $"pn")
        .withColumn("ra", row_number().over(bWin))
        .withColumn("rd", row_number().over(bWinDesc))
      val summary = marked.groupBy($"cname", $"bkt")
        .agg(count(lit(1)).as("bn"), sum($"isrun").as("runs_l"),
          min($"delta").as("mind_l"), max($"delta").as("maxd_l"),
          max(when($"ra" === 1, $"vs")).as("first_vs"),
          max(when($"ra" === 1, $"vn")).as("first_vn"),
          max(when($"rd" === 1, $"vs")).as("last_vs"),
          max(when($"rd" === 1, $"vn")).as("last_vn"))
        .withColumn("rnb", row_number().over(
          Window.partitionBy($"cname").orderBy($"bkt")))
        .localCheckpoint() // consumed twice: partial totals + boundary join
      val a = summary.select($"cname", $"rnb", $"last_vs", $"last_vn")
      val b = summary.select($"cname", ($"rnb" - 1).as("rnb"),
        $"first_vs".as("nfirst_vs"), $"first_vn".as("nfirst_vn"))
      val bounds = a.join(b, Seq("cname", "rnb"))
        .groupBy($"cname")
        .agg(sum(when($"last_vs" === $"nfirst_vs", 1L).otherwise(0L)).as("bmatches"),
          min($"nfirst_vn" - $"last_vn").as("bmind"),
          max($"nfirst_vn" - $"last_vn").as("bmaxd"))
      val partials = summary.groupBy($"cname")
        .agg(sum($"runs_l").as("runs_p"), min($"mind_l").as("mind_p"),
          max($"maxd_l").as("maxd_p"))
      val ndvs = melted.groupBy($"cname")
        .agg(count(lit(1)).as("n"), countDistinct($"vs").as("ndv"),
          max($"width").as("width"))
      val stats = ndvs.join(partials, Seq("cname"))
        .join(bounds, Seq("cname"), "left")
        .select($"cname", $"n", $"ndv",
          ($"runs_p" - coalesce($"bmatches", lit(0L))).as("runs"), $"width",
          greatest($"maxd_p", $"bmaxd").as("max_delta"),
          least($"mind_p", $"bmind").as("min_delta"))
      val est = stats
        .withColumn("est_plain", $"n" * $"width")
        .withColumn("dict_ix",
          when($"ndv" <= 256, 1L).when($"ndv" <= 65536, 2L).otherwise(4L))
        .withColumn("est_dict", $"n" * $"dict_ix" + $"ndv" * $"width")
        .withColumn("est_rle", $"runs" * ($"width" + 4L))
        .withColumn("est_delta",
          when($"min_delta".isNull || $"min_delta" < 0, lit(null).cast("long"))
            .otherwise(expr("n * length(bin(greatest(max_delta, 1))) div 8 + 8")))
      est.select($"cname", $"n", $"ndv", $"runs",
          $"est_plain", $"est_dict", $"est_rle", $"est_delta",
          expr("""CASE
            WHEN est_delta IS NOT NULL AND est_delta <= est_dict
              AND est_delta <= est_rle AND est_delta <= est_plain THEN 'delta'
            WHEN est_dict <= est_rle AND est_dict <= est_plain THEN 'dict'
            WHEN est_rle <= est_plain THEN 'rle'
            ELSE 'plain' END""").as("choice"))
        .orderBy($"cname")
    }, Some("""
      WITH li AS (SELECT l_orderkey, l_linenumber, l_returnflag,
          CAST(l_quantity AS BIGINT) AS qty,
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(l_shipdate AS DATE)) AS BIGINT) AS shipday
        FROM lineitem),
      melted AS (
        SELECT l_orderkey, l_linenumber, 'c1_orderkey' AS cname,
          CAST(l_orderkey AS VARCHAR) AS vs, l_orderkey AS vn,
          CAST(8 AS BIGINT) AS width FROM li
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'c2_returnflag', l_returnflag,
          CAST(NULL AS BIGINT), CAST(1 AS BIGINT) FROM li
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'c3_quantity',
          CAST(qty AS VARCHAR), qty, CAST(8 AS BIGINT) FROM li
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'c4_shipday',
          CAST(shipday AS VARCHAR), shipday, CAST(4 AS BIGINT) FROM li),
      rd AS (SELECT *,
          lag(vs) OVER (PARTITION BY cname ORDER BY l_orderkey, l_linenumber, vs) AS pv,
          lag(vn) OVER (PARTITION BY cname ORDER BY l_orderkey, l_linenumber, vs) AS pn
        FROM melted),
      rd2 AS (SELECT *,
          CASE WHEN pv IS NULL OR pv <> vs THEN 1 ELSE 0 END AS isrun,
          vn - pn AS delta FROM rd),
      stats AS (SELECT cname, CAST(count(*) AS BIGINT) AS n,
          CAST(count(DISTINCT vs) AS BIGINT) AS ndv,
          CAST(sum(isrun) AS BIGINT) AS runs,
          CAST(max(width) AS BIGINT) AS width,
          CAST(max(delta) AS BIGINT) AS max_delta,
          CAST(min(delta) AS BIGINT) AS min_delta
        FROM rd2 GROUP BY 1),
      est AS (SELECT *, n * width AS est_plain,
          CASE WHEN ndv <= 256 THEN 1 WHEN ndv <= 65536 THEN 2 ELSE 4 END AS dict_ix,
          n * (CASE WHEN ndv <= 256 THEN 1 WHEN ndv <= 65536 THEN 2 ELSE 4 END)
            + ndv * width AS est_dict,
          runs * (width + 4) AS est_rle,
          CASE WHEN min_delta IS NULL OR min_delta < 0 THEN NULL
            ELSE n * len(bin(greatest(max_delta, 1))) // 8 + 8 END AS est_delta
        FROM stats)
      SELECT cname, n, ndv, runs, est_plain,
        CAST(est_dict AS BIGINT) AS est_dict,
        CAST(est_rle AS BIGINT) AS est_rle,
        CAST(est_delta AS BIGINT) AS est_delta,
        CASE
          WHEN est_delta IS NOT NULL AND est_delta <= est_dict
            AND est_delta <= est_rle AND est_delta <= est_plain THEN 'delta'
          WHEN est_dict <= est_rle AND est_dict <= est_plain THEN 'dict'
          WHEN est_rle <= est_plain THEN 'rle'
          ELSE 'plain' END AS choice
      FROM est ORDER BY cname"""))
  )
}
