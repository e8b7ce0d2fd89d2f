package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity

/** Round-8 batch 29: Wasserstein-1 distribution shift (the
  * magnitude-aware companion to q127's KL and q195's KS), maximal
  * marginal relevance re-ranking (diversified retrieval — the
  * serving-side counterpart of q197's corpus diversity cap), and a
  * consistent-hash ring rebalance audit (how many keys move when a
  * node joins — the sharding-layer read q253-style layout planning
  * never measured).
  *
  * House rules as elsewhere: integer/decimal arithmetic at every gate,
  * doubles only where both engines evaluate the identical IEEE
  * expression (cosines, the MMR combination), identical aliases both
  * sides, total ORDER BY.
  */
object Round8acQueries {

  private val AnnProjs = Similarity.OracleProjs
  private val annPrepSql = Similarity.prepareSql
  private val annBucketSql = Similarity.lshBucketSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- Wasserstein-1 length-distribution shift ------------------------
    // KL (q127) blows up on support mismatch and KS (q195) reads only
    // the worst single gap; W1 = ∫|F_s − F_corpus| dv is the
    // earth-mover read that weighs BOTH how often and HOW FAR a
    // source's length distribution sits from the corpus — the
    // drift statistic reweighting policies (q190) actually want.
    // Same grid-cumulative shape as q195: per-source CDFs ride
    // partitioned windows over the DISTINCT value grid (bounded by
    // value cardinality — bucket first for unbounded domains); the
    // integrand |cum_s·n − cum_c·n_s| · gap runs in DECIMAL(38,0)/
    // HUGEINT (cum·n reaches n², past Int64 at ~3e9 rows), and the
    // one division lands on the final 20 rows. W1 is in value units
    // (chars), micro-scaled.
    ("q303_wasserstein_drift", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", $"n_chars".as("v"))
      val ns = d.groupBy($"source").agg(count(lit(1)).as("n_s"))
      val tot = d.agg(count(lit(1)).as("n"))
      val cv = d.groupBy($"v").agg(count(lit(1)).as("c"))
        .withColumn("cum_c", sum($"c").over(
          Window.orderBy($"v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("gap", coalesce(
          lead($"v", 1).over(Window.orderBy($"v")) - $"v", lit(0L)))
        .select($"v", $"cum_c", $"gap")
      val sv = d.groupBy($"source", $"v").agg(count(lit(1)).as("c"))
      val grid = d.select($"source").distinct()
        .crossJoin(d.select($"v").distinct())
      val cums = grid.join(sv, Seq("source", "v"), "left")
        .na.fill(0L, Seq("c"))
        .withColumn("cum_s", sum($"c").over(
          Window.partitionBy($"source").orderBy($"v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      cums.join(cv, Seq("v"))
        .join(ns, Seq("source"))
        .crossJoin(broadcast(tot))
        .groupBy($"source")
        .agg(max($"n_s").as("n_docs"),
          sum(abs(expr("CAST(cum_s AS DECIMAL(38,0)) * n") -
                  expr("CAST(cum_c AS DECIMAL(38,0)) * n_s")) * $"gap")
            .as("area"),
          max(expr("CAST(n_s AS DECIMAL(38,0)) * n")).as("den"))
        .select($"source", $"n_docs",
          expr("CAST((1000000 * area) div den AS BIGINT)")
            .as("w1_micro_chars"))
        .orderBy($"source")
    }, Some("""
      WITH d AS (SELECT source, n_chars AS v FROM documents),
      ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM d GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
      cv AS (SELECT v,
          CAST(sum(count(*)) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_c,
          coalesce(lead(v, 1) OVER (ORDER BY v) - v, 0) AS gap
        FROM d GROUP BY v),
      sv AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c
        FROM d GROUP BY 1, 2),
      grid AS (SELECT s.source, g.v
        FROM (SELECT DISTINCT source FROM d) s
        CROSS JOIN (SELECT DISTINCT v FROM d) g),
      cums AS (SELECT grid.source, grid.v,
          CAST(sum(coalesce(sv.c, 0)) OVER (PARTITION BY grid.source
            ORDER BY grid.v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_s
        FROM grid LEFT JOIN sv ON grid.source = sv.source AND grid.v = sv.v),
      m AS (SELECT c.source, max(ns.n_s) AS n_docs,
          sum(abs(CAST(c.cum_s AS HUGEINT) * tot.n
                  - CAST(cv.cum_c AS HUGEINT) * ns.n_s) * cv.gap) AS area,
          max(CAST(ns.n_s AS HUGEINT) * tot.n) AS den
        FROM cums c JOIN cv ON c.v = cv.v JOIN ns ON c.source = ns.source
        CROSS JOIN tot GROUP BY 1)
      SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        CAST((1000000 * area) // den AS BIGINT) AS w1_micro_chars
      FROM m ORDER BY source""")),

    // ----- maximal marginal relevance re-ranking --------------------------
    // q197 diversifies the CORPUS; this diversifies the RESULT LIST:
    // MMR (Carbonell & Goldstein) greedily picks
    // argmax 0.7·rel(d) − 0.3·max_{s∈picked} sim(d, s), trading
    // relevance against redundancy — the standard fix when a nearest-
    // neighbor list returns three near-copies. Per probe: LSH-bucket
    // top-10 candidates (the q299 candidate bound — never all-pairs),
    // a ≤10×10 within-probe pairwise-sim table, and the k=3 greedy
    // unrolled into three rank-1 windows (a production k loops the
    // same step over a localCheckpoint). Every stage after candidate
    // generation is |probes|·100-bounded. Cosines and the 0.7/0.3
    // combination are the identical IEEE expression in both engines;
    // ties break on c_id.
    ("q304_mmr_rerank", (s: SparkSession, dir: String) => {
      import s.implicits._
      val b = Similarity.prepare(
          Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
        .withColumn("bucket", Similarity.lshBucket(col("qvec"), AnnProjs))
        .localCheckpoint() // probe + candidate sides of the bucket join
      val q = b.filter($"id" % 100 === 0)
        .select($"bucket", $"id".as("q_id"), $"qvec".as("q_vec"),
          $"n2".as("q_n2"))
      val c = b.select($"bucket", $"id".as("c_id"), $"qvec".as("c_vec"),
        $"n2".as("c_n2"))
      val wq = Window.partitionBy($"q_id").orderBy(desc("rel"), $"c_id")
      val cands = c.join(broadcast(q), "bucket")
        .filter($"q_id" =!= $"c_id")
        .select($"q_id", $"c_id", $"c_vec", $"c_n2",
          Similarity.cosine(Similarity.dot($"q_vec", $"c_vec"), $"q_n2",
            $"c_n2").as("rel"))
        .withColumn("rn", row_number().over(wq)).filter($"rn" <= 10)
        .drop("rn")
        .localCheckpoint() // reused by every greedy step + the sim table
      val sims = cands.select($"q_id", $"c_id".as("d_id"),
          $"c_vec".as("d_vec"), $"c_n2".as("d_n2"))
        .join(cands.select($"q_id", $"c_id".as("s_id"),
          $"c_vec".as("s_vec"), $"c_n2".as("s_n2")), Seq("q_id"))
        .filter($"d_id" =!= $"s_id")
        .select($"q_id", $"d_id", $"s_id",
          Similarity.cosine(Similarity.dot($"d_vec", $"s_vec"), $"d_n2",
            $"s_n2").as("sim"))
        .localCheckpoint() // reused by greedy steps 2 and 3
      val p1 = cands.withColumn("rn", row_number().over(wq))
        .filter($"rn" === 1)
        .select($"q_id", $"c_id".as("p1"), $"rel".as("mmr1"))
      val w2 = Window.partitionBy($"q_id").orderBy(desc("mmr"), $"c_id")
      val p2 = cands.join(broadcast(p1), Seq("q_id"))
        .filter($"c_id" =!= $"p1")
        .join(sims.select($"q_id", $"d_id".as("c_id"), $"s_id", $"sim"),
          Seq("q_id", "c_id"))
        .filter($"s_id" === $"p1")
        .select($"q_id", $"c_id", $"p1",
          expr("0.7 * rel - 0.3 * sim").as("mmr"))
        .withColumn("rn", row_number().over(w2)).filter($"rn" === 1)
        .select($"q_id", $"p1", $"c_id".as("p2"), $"mmr".as("mmr2"))
      val p3 = cands.join(broadcast(p2.select($"q_id", $"p1", $"p2")),
          Seq("q_id"))
        .filter($"c_id" =!= $"p1" && $"c_id" =!= $"p2")
        .join(sims.select($"q_id", $"d_id".as("c_id"), $"s_id", $"sim"),
          Seq("q_id", "c_id"))
        .filter($"s_id" === $"p1" || $"s_id" === $"p2")
        .groupBy($"q_id", $"c_id").agg(max($"rel").as("rel"),
          max($"sim").as("ms"))
        .select($"q_id", $"c_id", expr("0.7 * rel - 0.3 * ms").as("mmr"))
        .withColumn("rn", row_number().over(w2)).filter($"rn" === 1)
        .select($"q_id", $"c_id".as("p3"), $"mmr".as("mmr3"))
      p1.select($"q_id", lit(1L).as("pick"), $"p1".as("c_id"),
          $"mmr1".as("mmr"))
        .unionByName(p2.select($"q_id", lit(2L).as("pick"),
          $"p2".as("c_id"), $"mmr2".as("mmr")))
        .unionByName(p3.select($"q_id", lit(3L).as("pick"),
          $"p3".as("c_id"), $"mmr3".as("mmr")))
        .orderBy($"q_id", $"pick")
    }, Some(s"""
      WITH $annPrepSql,
      b AS (SELECT vec_id, qvec, n2, $annBucketSql AS bucket FROM n),
      cand0 AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
          c.qvec AS c_vec, c.n2 AS c_n2,
          list_dot_product(q.qvec, c.qvec) / sqrt(q.n2 * c.n2) AS rel,
          row_number() OVER (PARTITION BY q.vec_id
            ORDER BY list_dot_product(q.qvec, c.qvec) / sqrt(q.n2 * c.n2)
              DESC, c.vec_id) AS rn
        FROM b q JOIN b c USING (bucket)
        WHERE q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id),
      cands AS (SELECT q_id, c_id, c_vec, c_n2, rel FROM cand0
        WHERE rn <= 10),
      sims AS (SELECT a.q_id, a.c_id AS d_id, s.c_id AS s_id,
          list_dot_product(a.c_vec, s.c_vec) / sqrt(a.c_n2 * s.c_n2) AS sim
        FROM cands a JOIN cands s ON a.q_id = s.q_id
        WHERE a.c_id <> s.c_id),
      p1 AS (SELECT q_id, c_id AS p1, rel AS mmr1 FROM
        (SELECT q_id, c_id, rel,
           row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, c_id)
             AS rn FROM cands) WHERE rn = 1),
      p2 AS (SELECT q_id, p1, c_id AS p2, mmr AS mmr2 FROM
        (SELECT c.q_id, p1.p1, c.c_id, 0.7 * c.rel - 0.3 * s.sim AS mmr,
           row_number() OVER (PARTITION BY c.q_id
             ORDER BY 0.7 * c.rel - 0.3 * s.sim DESC, c.c_id) AS rn
         FROM cands c JOIN p1 ON c.q_id = p1.q_id AND c.c_id <> p1.p1
         JOIN sims s ON s.q_id = c.q_id AND s.d_id = c.c_id
           AND s.s_id = p1.p1) WHERE rn = 1),
      p3 AS (SELECT q_id, c_id AS p3, mmr AS mmr3 FROM
        (SELECT g.q_id, g.c_id, 0.7 * g.rel - 0.3 * g.ms AS mmr,
           row_number() OVER (PARTITION BY g.q_id
             ORDER BY 0.7 * g.rel - 0.3 * g.ms DESC, g.c_id) AS rn
         FROM (SELECT c.q_id, c.c_id, max(c.rel) AS rel, max(s.sim) AS ms
           FROM cands c JOIN p2 ON c.q_id = p2.q_id
             AND c.c_id <> p2.p1 AND c.c_id <> p2.p2
           JOIN sims s ON s.q_id = c.q_id AND s.d_id = c.c_id
             AND (s.s_id = p2.p1 OR s.s_id = p2.p2)
           GROUP BY 1, 2) g) WHERE rn = 1)
      SELECT q_id, CAST(1 AS BIGINT) AS pick, p1 AS c_id, mmr1 AS mmr
        FROM p1
      UNION ALL SELECT q_id, CAST(2 AS BIGINT), p2, mmr2 FROM p2
      UNION ALL SELECT q_id, CAST(3 AS BIGINT), p3, mmr3 FROM p3
      ORDER BY q_id, pick""")),

    // ----- consistent-hash ring rebalance audit ---------------------------
    // The sharding question behind every "add a node to the fleet"
    // change: how many keys MOVE? A 32-bit md5 ring with 10 nodes ×
    // 8 vnodes, keys assigned to the clockwise-successor marker; the
    // audit adds node10 and measures per-node populations before and
    // after plus the moved-in count. Consistent hashing's defining
    // property — only keys landing on the NEW node's arcs move —
    // falls out as moved_in = 0 for every old node (spec-pinned).
    // Scale shape: the ring is 88 markers — it travels as ONE sorted
    // array in a broadcast row, successor lookup is a map-side
    // array filter (no join blowup, no per-key shuffle), and the two
    // pos→node resolutions are broadcast joins against the marker
    // table. One corpus pass, three tiny aggregates.
    ("q305_consistent_hash_rebalance", (s: SparkSession, dir: String) => {
      import s.implicits._
      val markers = s.range(88).select(
          concat(lit("node"), expr("id div 8").cast("string")).as("node"),
          expr("id div 8").as("i"),
          conv(substring(md5(concat(lit("ring|node"),
            expr("id div 8").cast("string"), lit("|v"),
            expr("id % 8").cast("string"))), 1, 8), 16, 10)
            .cast("long").as("pos"))
        .localCheckpoint() // array collect + two pos→node resolutions
      val arrB = markers.filter($"i" < 10)
        .agg(sort_array(collect_list($"pos")).as("arr_b"))
      val arrA = markers.agg(sort_array(collect_list($"pos")).as("arr_a"))
      val keys = Tables.spread(Tables.t(s, dir, "documents"))
        .select(conv(substring(md5(concat(lit("key|"),
          $"doc_id".cast("string"))), 1, 8), 16, 10).cast("long").as("kpos"))
        .crossJoin(broadcast(arrB)).crossJoin(broadcast(arrA))
        .select($"kpos",
          expr("""coalesce(array_min(filter(arr_b, p -> p >= kpos)),
                  array_min(arr_b))""").as("pos_b"),
          expr("""coalesce(array_min(filter(arr_a, p -> p >= kpos)),
                  array_min(arr_a))""").as("pos_a"))
      val resolved = keys
        .join(broadcast(markers.filter($"i" < 10)
          .select($"pos".as("pos_b"), $"node".as("node_b"))), Seq("pos_b"))
        .join(broadcast(markers
          .select($"pos".as("pos_a"), $"node".as("node_a"))), Seq("pos_a"))
        .localCheckpoint() // three per-node aggregates below
      val tot = resolved.agg(count(lit(1)).as("n"))
      val before = resolved.groupBy($"node_b".as("node"))
        .agg(count(lit(1)).as("n_before"))
      val after = resolved.groupBy($"node_a".as("node"))
        .agg(count(lit(1)).as("n_after"))
      val moved = resolved.filter($"node_b" =!= $"node_a")
        .groupBy($"node_a".as("node")).agg(count(lit(1)).as("moved_in"))
      markers.select($"node").distinct()
        .join(before, Seq("node"), "left")
        .join(after, Seq("node"), "left")
        .join(moved, Seq("node"), "left")
        .na.fill(0L, Seq("n_before", "n_after", "moved_in"))
        .crossJoin(broadcast(tot))
        .select($"node", $"n_before", $"n_after", $"moved_in",
          expr("1000000 * moved_in div n").as("moved_frac_micro"))
        .orderBy($"node")
    }, Some("""
      WITH mk AS (SELECT 'node' || CAST(id // 8 AS VARCHAR) AS node,
          id // 8 AS i,
          ('0x' || substr(md5('ring|node' || CAST(id // 8 AS VARCHAR)
            || '|v' || CAST(id % 8 AS VARCHAR)), 1, 8))::BIGINT AS pos
        FROM (SELECT unnest(range(88)) AS id)),
      arrs AS (SELECT
          (SELECT list_sort(list(pos)) FROM mk WHERE i < 10) AS arr_b,
          (SELECT list_sort(list(pos)) FROM mk) AS arr_a),
      keys AS (SELECT kpos,
          coalesce(list_min(list_filter(arr_b, p -> p >= kpos)),
            list_min(arr_b)) AS pos_b,
          coalesce(list_min(list_filter(arr_a, p -> p >= kpos)),
            list_min(arr_a)) AS pos_a
        FROM (SELECT ('0x' || substr(md5('key|' || CAST(doc_id AS VARCHAR)),
            1, 8))::BIGINT AS kpos FROM documents)
        CROSS JOIN arrs),
      res AS (SELECT k.kpos, mb.node AS node_b, ma.node AS node_a
        FROM keys k
        JOIN mk mb ON mb.pos = k.pos_b AND mb.i < 10
        JOIN mk ma ON ma.pos = k.pos_a),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM res),
      bef AS (SELECT node_b AS node, CAST(count(*) AS BIGINT) AS n_before
        FROM res GROUP BY 1),
      aft AS (SELECT node_a AS node, CAST(count(*) AS BIGINT) AS n_after
        FROM res GROUP BY 1),
      mv AS (SELECT node_a AS node, CAST(count(*) AS BIGINT) AS moved_in
        FROM res WHERE node_b <> node_a GROUP BY 1)
      SELECT g.node, CAST(coalesce(bef.n_before, 0) AS BIGINT) AS n_before,
        CAST(coalesce(aft.n_after, 0) AS BIGINT) AS n_after,
        CAST(coalesce(mv.moved_in, 0) AS BIGINT) AS moved_in,
        CAST(1000000 * coalesce(mv.moved_in, 0) // tot.n AS BIGINT)
          AS moved_frac_micro
      FROM (SELECT DISTINCT node FROM mk) g
      LEFT JOIN bef ON g.node = bef.node
      LEFT JOIN aft ON g.node = aft.node
      LEFT JOIN mv ON g.node = mv.node
      CROSS JOIN tot ORDER BY g.node"""))
  )
}
