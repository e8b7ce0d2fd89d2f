package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, TextAnalysis => TA}

/** Round-8 batch 19: similarity-graph quality — transitivity of the
  * near-dup relation, modularity of the blocking scheme against the
  * near-dup graph, and a bond-percolation robustness curve. All three
  * consume the SAME q21 MinHash+LSH pair pipeline (`ext/Dedup`), so
  * the batch is also a composition test of the shared machinery.
  *
  * House rules as elsewhere: integer arithmetic at every gate, 128-bit
  * (DECIMAL(38,0)/HUGEINT) where count products appear, identical
  * aliases both sides, total ORDER BY.
  */
object Round8sQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  /** The q21 oracle template (ExtQueries.minhashPairsCte construction,
    * shared helpers from ext/Dedup): ends in
    * `verified(id_a, id_b, jaccard)`; `pairs` filters to ≥ 0.5. */
  private def pairsCte: String = {
    val mhDefs = (0 until 8).map(s => s"${Dedup.minhashSql(s)} AS m$s")
      .mkString(",\n        ")
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band_idx, md5(CAST(m${2 * b} AS VARCHAR) || '|' || CAST(m${2 * b + 1} AS VARCHAR)) AS band_key FROM mh")
      .mkString("\n        UNION ALL ")
    s"""d AS (SELECT doc_id, string_split($normSql, ' ') AS arr FROM documents),
      sh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(arr) - 2, 1) + 1),
        i -> array_to_string(arr[i:i+2], ' '))) AS sh FROM d),
      hst AS (SELECT doc_id, list_distinct(list_transform(sh,
        g -> ('0x' || substr(md5(g), 1, 8))::BIGINT)) AS hs FROM sh),
      mh AS (SELECT doc_id,
        $mhDefs
        FROM hst),
      bands AS ($bandSelects),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING (band_idx, band_key)
        WHERE a.doc_id < b.doc_id),
      verified AS (SELECT id_a, id_b,
        len(list_intersect(ha.hs, hb.hs)) / len(list_distinct(list_concat(ha.hs, hb.hs))) AS jaccard
        FROM cand
        JOIN hst ha ON ha.doc_id = id_a
        JOIN hst hb ON hb.doc_id = id_b),
      pairs AS (SELECT id_a, id_b FROM verified WHERE jaccard >= 0.5)"""
  }

  /** The q21 pair list as a DataFrame (id_a < id_b). */
  private def lshPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.spread(Tables.t(s, dir, "documents"))
      .select($"doc_id".as("id"),
        graft.functions.WordShingleHash32(TA.normText($"text"), 3).as("hs"))
    Dedup.minhashLshPairsHashed(docs, nBands = 4, threshold = 0.5)
      .select($"id_a", $"id_b")
  }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- transitivity of the near-dup relation --------------------------
    // Near-duplication is used as if it were an equivalence relation
    // (cluster, keep one representative) — but Jaccard ≥ t is NOT
    // transitive, and every open wedge (A~B~C with A≁C) is a document
    // the cluster policy silently over- or under-merges. The audit
    // counts wedges (both-ways adjacency self-joined on the center,
    // a < b kills mirror double-count) and closes them with one
    // semi-join against the edge list — the q160 wedge shape on the
    // similarity graph. Low transitivity is the signal to lower the
    // threshold or switch to containment (q162) before trusting CC
    // clusters. At 100 TB the wedge join is bounded by Σ deg² of the
    // dup graph — tiny relative to the corpus, since dup components
    // are small by construction.
    ("q267_dup_transitivity", (s: SparkSession, dir: String) => {
      import s.implicits._
      val pairs = lshPairs(s, dir).localCheckpoint() // edges + wedge closure
      val adj = pairs.unionByName(
        pairs.select($"id_b".as("id_a"), $"id_a".as("id_b")))
      val wedges = adj.toDF("c", "a").join(adj.toDF("c", "b"), Seq("c"))
        .filter($"a" < $"b")
        .select($"a", $"b")
      val closed = wedges.join(pairs.toDF("a", "b"), Seq("a", "b"), "left_semi")
      val m = pairs.agg(count(lit(1)).as("n_edges"))
      val w = wedges.agg(count(lit(1)).as("n_wedges"))
      val c = closed.agg(count(lit(1)).as("n_closed"))
      m.crossJoin(w).crossJoin(c)
        .select($"n_edges", $"n_wedges", $"n_closed",
          ($"n_wedges" - $"n_closed").as("n_open"),
          expr("CASE WHEN n_wedges = 0 THEN 1000000 " +
            "ELSE 1000000 * n_closed div n_wedges END").as("transitivity_micro"))
    }, Some(s"""
      WITH ${pairsCte},
      adj AS (SELECT id_a AS c, id_b AS n FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
      wedges AS (SELECT x.n AS a, y.n AS b FROM adj x JOIN adj y ON x.c = y.c
        WHERE x.n < y.n),
      closed AS (SELECT w.a, w.b FROM wedges w
        WHERE EXISTS (SELECT 1 FROM pairs p WHERE p.id_a = w.a AND p.id_b = w.b)),
      agg AS (SELECT
          (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
          (SELECT CAST(count(*) AS BIGINT) FROM wedges) AS n_wedges,
          (SELECT CAST(count(*) AS BIGINT) FROM closed) AS n_closed)
      SELECT n_edges, n_wedges, n_closed,
        n_wedges - n_closed AS n_open,
        CASE WHEN n_wedges = 0 THEN 1000000
          ELSE 1000000 * n_closed // n_wedges END AS transitivity_micro
      FROM agg""")),

    // ----- modularity of the blocking scheme ------------------------------
    // Does the (lang, length-band) blocking actually respect the
    // near-dup graph? Newman modularity of the blocking partition:
    // Q = intra/m − Σ_c (d_c/2m)² — positive when blocks capture more
    // edge mass than a degree-preserving random graph would, ~0 when
    // blocking is no better than chance. q179 measures blocking RECALL
    // (pairs caught); modularity is the graph-normalized version that
    // also punishes oversized blocks. Degree sums per block come from
    // one aggregate; the Σd² term is 128-bit. At 100 TB the entire
    // computation lives on the pair list + one doc-to-block projection.
    ("q268_block_modularity", (s: SparkSession, dir: String) => {
      import s.implicits._
      val pairs = lshPairs(s, dir).localCheckpoint()
      val blocks = Tables.t(s, dir, "documents")
        .select($"doc_id", concat($"lang", lit("_"), expr("n_chars div 100"))
          .as("bucket"))
      val withB = pairs
        .join(blocks.select($"doc_id".as("id_a"), $"bucket".as("ba")), Seq("id_a"))
        .join(blocks.select($"doc_id".as("id_b"), $"bucket".as("bb")), Seq("id_b"))
      val m = withB.agg(count(lit(1)).as("m"),
        sum(($"ba" === $"bb").cast("long")).as("intra"))
      val deg = withB.select($"ba".as("bucket")).unionByName(
          withB.select($"bb".as("bucket")))
        .groupBy($"bucket").agg(count(lit(1)).as("d"))
      val sd2 = deg.agg(sum(expr("CAST(d AS DECIMAL(38,0)) * d")).as("sd2"),
        count(lit(1)).as("n_buckets"))
      m.crossJoin(sd2)
        .select($"m".as("n_edges"), $"intra".as("intra_edges"), $"n_buckets",
          (expr("1000000 * intra div m") -
            expr("CAST(1000000 * sd2 div (CAST(4 AS DECIMAL(38,0)) * m * m) AS BIGINT)"))
            .as("q_modularity_micro"))
    }, Some(s"""
      WITH ${pairsCte},
      blocks AS (SELECT doc_id, lang || '_' || (n_chars // 100) AS bucket
        FROM documents),
      wb AS (SELECT p.id_a, p.id_b, ba.bucket AS ba, bb.bucket AS bb
        FROM pairs p JOIN blocks ba ON p.id_a = ba.doc_id
        JOIN blocks bb ON p.id_b = bb.doc_id),
      mm AS (SELECT CAST(count(*) AS BIGINT) AS m,
          CAST(sum(CASE WHEN ba = bb THEN 1 ELSE 0 END) AS BIGINT) AS intra
        FROM wb),
      deg AS (SELECT bucket, CAST(count(*) AS BIGINT) AS d FROM
          (SELECT ba AS bucket FROM wb UNION ALL SELECT bb FROM wb)
        GROUP BY 1),
      s2 AS (SELECT CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS sd2,
          CAST(count(*) AS BIGINT) AS n_buckets FROM deg)
      SELECT mm.m AS n_edges, mm.intra AS intra_edges, s2.n_buckets,
        1000000 * mm.intra // mm.m
          - CAST(1000000 * s2.sd2 // (CAST(4 AS HUGEINT) * mm.m * mm.m) AS BIGINT)
          AS q_modularity_micro
      FROM mm CROSS JOIN s2""")),

    // ----- bond-percolation robustness curve ------------------------------
    // How fragile is the near-dup clustering to missed pairs? Sample
    // the edge list at p = 25% / 50% / 100% (md5-Bernoulli on the
    // pair key — deterministic, the q110 rule) and re-run connected
    // components (the q161 large-star/small-star contraction) on each
    // sample: component count, touched nodes, and largest-component
    // size trace how clusters shatter as recall drops — the
    // quantitative answer to "can we afford fewer bands?". Components
    // here are labeled by their MIN member id, so sizes and checksums
    // are order-free. At 100 TB each sample is a filter over the pair
    // list (tiny next to the corpus) and the contraction is the
    // O(log n)-round algorithm the repo already runs at q161.
    ("q269_percolation_curve", (s: SparkSession, dir: String) => {
      import s.implicits._
      val pairs = lshPairs(s, dir)
        .withColumn("h", conv(substring(md5(concat($"id_a".cast("string"),
          lit("|"), $"id_b".cast("string"))), 1, 8), 16, 10).cast("long") % 4)
        .localCheckpoint()
      val levels = Seq(("p25", 1L), ("p50", 2L), ("p100", 4L))
      levels.map { case (nm, keep) =>
        val sample = pairs.filter($"h" < keep).select($"id_a", $"id_b")
        val labels = Dedup.connectedComponentsStar(sample)
        val comp = labels.groupBy($"label").agg(count(lit(1)).as("sz"))
        val stats = comp.agg(count(lit(1)).as("n_components"),
          coalesce(sum($"sz"), lit(0L)).as("n_nodes"),
          coalesce(max($"sz"), lit(0L)).as("largest"))
        sample.agg(count(lit(1)).as("n_edges")).crossJoin(broadcast(stats))
          .select(lit(nm).as("p"), $"n_edges", $"n_nodes", $"n_components",
            $"largest")
      }.reduce(_ unionByName _).orderBy($"p")
    }, Some(s"""
      WITH RECURSIVE ${pairsCte},
      hp AS (SELECT id_a, id_b,
          ('0x' || substr(md5(CAST(id_a AS VARCHAR) || '|' ||
            CAST(id_b AS VARCHAR)), 1, 8))::BIGINT % 4 AS h
        FROM pairs),
      lv AS (SELECT 'p25' AS p, CAST(1 AS BIGINT) AS keep
        UNION ALL SELECT 'p50', 2 UNION ALL SELECT 'p100', 4),
      se AS (SELECT lv.p, hp.id_a, hp.id_b FROM hp JOIN lv ON hp.h < lv.keep),
      edges AS (SELECT p, id_a AS src, id_b AS dst FROM se
        UNION SELECT p, id_b, id_a FROM se),
      cc(p, id, label) AS (
        SELECT DISTINCT p, src, src FROM edges
        UNION
        SELECT e.p, e.src, cc.label FROM edges e
          JOIN cc ON cc.p = e.p AND cc.id = e.dst),
      comp AS (SELECT p, id, min(label) AS label FROM cc GROUP BY 1, 2),
      sizes AS (SELECT p, label, CAST(count(*) AS BIGINT) AS sz
        FROM comp GROUP BY 1, 2),
      stats AS (SELECT p, CAST(count(*) AS BIGINT) AS n_components,
          CAST(sum(sz) AS BIGINT) AS n_nodes, CAST(max(sz) AS BIGINT) AS largest
        FROM sizes GROUP BY 1),
      ne AS (SELECT p, CAST(count(*) AS BIGINT) AS n_edges FROM se GROUP BY 1)
      SELECT ne.p, ne.n_edges, st.n_nodes, st.n_components, st.largest
      FROM ne JOIN stats st USING (p) ORDER BY ne.p"""))
  )
}
