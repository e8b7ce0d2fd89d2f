package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Similarity, TextAnalysis => TA}

/** Round-8 batch 2: the curation-policy surface a labeled/audited corpus
  * needs — semi-supervised label spread, classifier calibration, coreset
  * selection, re-identification risk — plus deterministic random-walk
  * corpus generation for graph-embedding training.
  *
  * House rules as elsewhere: md5-derived determinism, integer arithmetic
  * at every gate (micro units; clamp before `div` — Spark truncates,
  * DuckDB floors), identical aliases both sides, total ORDER BY.
  */
object Round8bQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  /** Shared DuckDB CTE chain: the q158 single-probe kNN top-3 graph over
    * the embeddings table, ending in `knn(q_id, c_id, cos_sim)`. */
  private def knnCte: String =
    s"""WITH ${Similarity.prepareSql},
      b AS (SELECT vec_id, qvec, n2, ${Similarity.lshBucketSql} AS bucket FROM n),
      scored AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        list_dot_product(q.qvec, c.qvec) / sqrt(q.n2 * c.n2) AS cos_sim
        FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
      r AS (SELECT q_id, c_id, cos_sim,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk
        FROM scored),
      knn AS (SELECT q_id, c_id FROM r WHERE rnk <= 3)"""

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- label propagation over the kNN graph ---------------------------
    // The semi-supervised curation move: a small audited seed set (here
    // every 5th vector keeps its label; the rest start unlabeled) spread
    // over the mutual-similarity structure, so one human-labeled shard
    // prices the whole corpus. Graph = the q158 kNN top-3 edges,
    // symmetrized; two synchronous rounds of majority vote (ties to the
    // smallest label; a node labeled in round r is frozen for r+1 — the
    // standard LP freeze that makes the fixpoint order-independent).
    // Every round is one co-partitioned equi-join (edges ⋈ labels on the
    // neighbor key) + a count aggregate + a top-1 window — exactly the
    // shape Pregel lowers to, no driver-side state, labels table stays
    // (id, lbl)-narrow. At 100 TB the kNN build is the dominant cost and
    // is already bucketed (q158/q200); the propagation rounds are linear
    // in |E|. `agree` audits the spread against the held-out truth —
    // the number that decides whether the seed budget was enough.
    ("q203_label_propagation", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      val b = prepared.withColumn("bucket",
        Similarity.lshBucket(col("qvec"), Similarity.OracleProjs))
      val q = b.select($"bucket", $"id".as("q_id"), $"qvec".as("q_vec"), $"n2".as("q_n2"))
      val c = b.select($"bucket", $"id".as("c_id"), $"qvec".as("c_vec"), $"n2".as("c_n2"))
      val scored = q.join(c, "bucket").filter($"q_id" =!= $"c_id")
        .select($"q_id", $"c_id",
          Similarity.cosine(Similarity.dot($"q_vec", $"c_vec"), $"q_n2", $"c_n2")
            .as("cos_sim"))
      val w = Window.partitionBy($"q_id").orderBy(desc("cos_sim"), $"c_id")
      val knn = scored.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
        .select($"q_id", $"c_id")
      val edges = knn.select($"q_id".as("u"), $"c_id".as("v"))
        .unionByName(knn.select($"c_id".as("u"), $"q_id".as("v")))
        .distinct()
        .localCheckpoint() // consumed once per propagation round
      val emb = Tables.t(s, dir, "embeddings")
      val l0 = emb.select($"vec_id".as("id"),
        when($"vec_id" % 5 === 0, $"label".cast("long")).otherwise(lit(-1L)).as("lbl"),
        when($"vec_id" % 5 === 0, 0L).otherwise(lit(-1L)).as("rnd"))
      def propagate(curL: DataFrame, r: Int): DataFrame = {
        val votes = edges
          .join(curL.filter($"lbl" >= 0).select($"id".as("v"), $"lbl".as("nlbl")), "v")
          .groupBy($"u", $"nlbl").agg(count(lit(1)).as("votes"))
        val wv = Window.partitionBy($"u").orderBy(desc("votes"), $"nlbl")
        val pick = votes.withColumn("rn", row_number().over(wv)).filter($"rn" === 1)
          .select($"u".as("id"), $"nlbl")
        curL.join(pick, Seq("id"), "left").select($"id",
          when($"lbl" >= 0, $"lbl").otherwise(coalesce($"nlbl", lit(-1L))).as("lbl"),
          when($"lbl" >= 0, $"rnd")
            .otherwise(when($"nlbl".isNotNull, lit(r.toLong)).otherwise(lit(-1L))).as("rnd"))
      }
      val l2 = propagate(propagate(l0, 1), 2)
      l2.join(emb.select($"vec_id", $"label".cast("long").as("truth")),
          l2("id") === col("vec_id"))
        .select($"vec_id", $"lbl".as("label_pred"), $"rnd".as("round_labeled"),
          when($"lbl" >= 0 && $"lbl" === $"truth", 1L).otherwise(0L).as("agree"))
        .orderBy("vec_id")
    }, Some(s"""
      $knnCte,
      edges AS (SELECT q_id AS u, c_id AS v FROM knn
                UNION SELECT c_id, q_id FROM knn),
      l0 AS (SELECT vec_id AS id,
          CASE WHEN vec_id % 5 = 0 THEN CAST(label AS BIGINT) ELSE -1 END AS lbl,
          CASE WHEN vec_id % 5 = 0 THEN 0 ELSE -1 END AS rnd
        FROM embeddings),
      v1 AS (SELECT e.u, l.lbl AS nlbl, CAST(count(*) AS BIGINT) AS votes
        FROM edges e JOIN l0 l ON l.id = e.v AND l.lbl >= 0 GROUP BY 1, 2),
      p1 AS (SELECT u AS id, nlbl FROM (SELECT u, nlbl,
          row_number() OVER (PARTITION BY u ORDER BY votes DESC, nlbl) AS rn FROM v1)
        WHERE rn = 1),
      l1 AS (SELECT l0.id,
          CASE WHEN l0.lbl >= 0 THEN l0.lbl ELSE coalesce(p1.nlbl, -1) END AS lbl,
          CASE WHEN l0.lbl >= 0 THEN l0.rnd
               WHEN p1.nlbl IS NOT NULL THEN 1 ELSE -1 END AS rnd
        FROM l0 LEFT JOIN p1 USING (id)),
      v2 AS (SELECT e.u, l.lbl AS nlbl, CAST(count(*) AS BIGINT) AS votes
        FROM edges e JOIN l1 l ON l.id = e.v AND l.lbl >= 0 GROUP BY 1, 2),
      p2 AS (SELECT u AS id, nlbl FROM (SELECT u, nlbl,
          row_number() OVER (PARTITION BY u ORDER BY votes DESC, nlbl) AS rn FROM v2)
        WHERE rn = 1),
      l2 AS (SELECT l1.id,
          CASE WHEN l1.lbl >= 0 THEN l1.lbl ELSE coalesce(p2.nlbl, -1) END AS lbl,
          CASE WHEN l1.lbl >= 0 THEN l1.rnd
               WHEN p2.nlbl IS NOT NULL THEN 2 ELSE -1 END AS rnd
        FROM l1 LEFT JOIN p2 USING (id))
      SELECT e.vec_id, l2.lbl AS label_pred, CAST(l2.rnd AS BIGINT) AS round_labeled,
        CAST(CASE WHEN l2.lbl >= 0 AND l2.lbl = CAST(e.label AS BIGINT)
          THEN 1 ELSE 0 END AS BIGINT) AS agree
      FROM l2 JOIN embeddings e ON e.vec_id = l2.id
      ORDER BY e.vec_id""")),

    // ----- scorer calibration audit (reliability table + ECE) -------------
    // Model-based filtering at corpus scale is only as good as its
    // calibration: a scorer whose top decile is not actually better data
    // silently skews the mixture. This audits q191's map-side hashed
    // linear scorer against the held-out `lang='en'` label. Predicted
    // probability is RANK-based (the midrank fraction of the doc's logit
    // in the corpus), computed scale-safely: the window runs over the
    // DISTINCT-LOGIT VALUE GRID (bounded by the score's integer range,
    // orders below the corpus — the q195 grid convention), never over
    // rows; docs join back to the grid by logit equi-join (grid
    // broadcastable). Bins are midrank deciles; per-bin predicted-vs-
    // observed (micro) plus the expected calibration error
    // ECE = Σ_b n_b·|pred_b − obs_b| / N. Everything after the q191 scan
    // touches only the grid and 10 bin rows.
    ("q204_score_calibration", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"lang", explode(split(TA.normText($"text"), " ")).as("tok"))
      val scored = toks
        .withColumn("w",
          conv(substring(md5(concat(lit("w|"),
              (conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long") % 1024)
                .cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2001 - 1000)
        .groupBy($"doc_id", $"lang").agg(sum($"w").as("logit"))
        .select($"doc_id", $"logit",
          when($"lang" === "en", 1L).otherwise(0L).as("y"))
      val grid = scored.groupBy($"logit").agg(count(lit(1)).as("n_l"))
      // the logit grid is NOT domain-bounded (distinct sums grow with
      // the corpus) — two-level running total instead of a global window
      val g2 = graft.ext.GridCumulative
        .withRunningTotal(grid, "logit", "n_l", "__cum")
        .withColumn("cum_prev", $"__cum" - $"n_l").drop("__cum")
      val tot = scored.agg(count(lit(1)).as("n"))
      val g3 = g2.crossJoin(broadcast(tot))
        .select($"logit",
          expr("((2 * cum_prev + n_l) * 500000) div n").as("predv_micro"),
          expr("least(9, ((2 * cum_prev + n_l) * 5) div n)").as("bin"))
      val perBin = scored.join(broadcast(g3), Seq("logit"))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"y").as("n_pos"),
          sum($"predv_micro").as("sp"))
        .select($"bin", $"n_docs", $"n_pos",
          expr("sp div n_docs").as("pred_micro"),
          expr("(1000000 * n_pos) div n_docs").as("obs_micro"))
        .withColumn("gap_micro", abs($"pred_micro" - $"obs_micro"))
      val ece = perBin.agg(sum($"n_docs" * $"gap_micro").as("wg"))
        .crossJoin(broadcast(tot)).select(expr("wg div n").as("ece_micro"))
      perBin.crossJoin(broadcast(ece)).orderBy("bin")
    }, Some(s"""
      WITH toks AS (SELECT doc_id, lang, unnest(string_split($normSql, ' ')) AS tok FROM documents),
      tw AS (SELECT doc_id, lang,
          ('0x' || substr(md5('w|' || CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000 AS w
        FROM toks),
      scored AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS logit,
          CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
        FROM tw GROUP BY doc_id, lang),
      grid AS (SELECT logit, CAST(count(*) AS BIGINT) AS n_l FROM scored GROUP BY 1),
      g2 AS (SELECT logit, n_l, CAST(coalesce(sum(n_l) OVER (ORDER BY logit
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_prev
        FROM grid),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
      g3 AS (SELECT logit, ((2 * cum_prev + n_l) * 500000) // n AS predv_micro,
          least(9, ((2 * cum_prev + n_l) * 5) // n) AS bin
        FROM g2 CROSS JOIN tot),
      pb AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(s.y) AS BIGINT) AS n_pos, CAST(sum(predv_micro) AS BIGINT) AS sp
        FROM scored s JOIN g3 USING (logit) GROUP BY 1),
      pb2 AS (SELECT bin, n_docs, n_pos, sp // n_docs AS pred_micro,
          (1000000 * n_pos) // n_docs AS obs_micro,
          abs(sp // n_docs - (1000000 * n_pos) // n_docs) AS gap_micro
        FROM pb),
      e AS (SELECT CAST(sum(n_docs * gap_micro) AS BIGINT) // tot.n AS ece_micro
        FROM pb2 CROSS JOIN tot GROUP BY tot.n)
      SELECT bin, n_docs, n_pos, pred_micro, obs_micro, gap_micro, e.ece_micro
      FROM pb2 CROSS JOIN e ORDER BY bin""")),

    // ----- k-center coreset (Gonzalez farthest-point traversal) -----------
    // Diversity-first subset selection: the 2-approximation to the
    // k-center problem picks, k−1 times, the point farthest from the
    // chosen set — the classic coreset seed for clustering / active
    // labeling / eval-set construction. The running min-distance column
    // makes each round ONE broadcast of the single new center + a
    // map-side `least(mind2, d²(p, c_t))` + a TakeOrdered(1) argmax —
    // O(kN) total distance evaluations, never the O(k²N) recompute, no
    // shuffle except the 1-row argmax. Distances are exact integers
    // (quantized vectors: d² = n2a + n2b − 2·dot), so the traversal is
    // engine-deterministic; ties break to the smaller id. The driver
    // holds only the k-row center list (loop CONTROL, the cc_star
    // pattern); per-center assignment + radius is the coverage audit the
    // selection is judged by.
    ("q205_kcenter_coreset", (s: SparkSession, dir: String) => {
      import s.implicits._
      val pts = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
        .localCheckpoint() // scanned once per round + once for assignment
      def d2(n2a: org.apache.spark.sql.Column, n2b: org.apache.spark.sql.Column,
             va: org.apache.spark.sql.Column, vb: org.apache.spark.sql.Column) =
        (n2a + n2b - lit(2) * Similarity.dot(va, vb)).cast("long")
      val c1 = pts.orderBy($"id").limit(1)
      var cents = c1.withColumn("ord", lit(1L)).localCheckpoint()
      var state = pts.crossJoin(broadcast(
          c1.select($"qvec".as("c_vec"), $"n2".as("c_n2"))))
        .select($"id", $"qvec", $"n2",
          d2($"n2", $"c_n2", $"qvec", $"c_vec").as("mind2"))
        .localCheckpoint()
      for (t <- 2 to 4) {
        val far = state.orderBy(desc("mind2"), $"id").limit(1)
          .select($"id", $"qvec", $"n2").localCheckpoint()
        cents = cents.unionByName(far.withColumn("ord", lit(t.toLong)))
          .localCheckpoint()
        state = state.crossJoin(broadcast(
            far.select($"qvec".as("c_vec"), $"n2".as("c_n2"))))
          .select($"id", $"qvec", $"n2",
            least($"mind2", d2($"n2", $"c_n2", $"qvec", $"c_vec")).as("mind2"))
          .localCheckpoint()
      }
      val asg = pts.crossJoin(broadcast(cents.select($"id".as("center_id"),
          $"qvec".as("c_vec"), $"n2".as("c_n2"), $"ord")))
        .select($"id", $"center_id", $"ord",
          d2($"n2", $"c_n2", $"qvec", $"c_vec").as("dd"))
      val w = Window.partitionBy($"id").orderBy($"dd", $"ord")
      asg.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .groupBy($"ord", $"center_id")
        .agg(count(lit(1)).as("n_assigned"), max($"dd").as("radius_d2"),
          sum($"id").as("idsum"))
        .select($"ord", $"center_id", $"n_assigned", $"radius_d2", $"idsum")
        .orderBy("ord")
    }, Some(s"""
      WITH ${Similarity.prepareSql},
      c1 AS (SELECT vec_id, qvec, n2 FROM n ORDER BY vec_id LIMIT 1),
      d1 AS (SELECT n.vec_id, n.qvec, n.n2,
          CAST(n.n2 + c.n2 - 2 * list_dot_product(n.qvec, c.qvec) AS BIGINT) AS mind2
        FROM n CROSS JOIN c1 c),
      c2 AS (SELECT vec_id, qvec, n2 FROM d1 ORDER BY mind2 DESC, vec_id LIMIT 1),
      d2 AS (SELECT d.vec_id, d.qvec, d.n2, least(d.mind2,
          CAST(d.n2 + c.n2 - 2 * list_dot_product(d.qvec, c.qvec) AS BIGINT)) AS mind2
        FROM d1 d CROSS JOIN c2 c),
      c3 AS (SELECT vec_id, qvec, n2 FROM d2 ORDER BY mind2 DESC, vec_id LIMIT 1),
      d3 AS (SELECT d.vec_id, d.qvec, d.n2, least(d.mind2,
          CAST(d.n2 + c.n2 - 2 * list_dot_product(d.qvec, c.qvec) AS BIGINT)) AS mind2
        FROM d2 d CROSS JOIN c3 c),
      c4 AS (SELECT vec_id, qvec, n2 FROM d3 ORDER BY mind2 DESC, vec_id LIMIT 1),
      cents AS (SELECT 1 AS ord, vec_id, qvec, n2 FROM c1
        UNION ALL SELECT 2, vec_id, qvec, n2 FROM c2
        UNION ALL SELECT 3, vec_id, qvec, n2 FROM c3
        UNION ALL SELECT 4, vec_id, qvec, n2 FROM c4),
      asg AS (SELECT p.vec_id, c.ord, c.vec_id AS center_id,
          CAST(p.n2 + c.n2 - 2 * list_dot_product(p.qvec, c.qvec) AS BIGINT) AS dd,
          row_number() OVER (PARTITION BY p.vec_id ORDER BY
            CAST(p.n2 + c.n2 - 2 * list_dot_product(p.qvec, c.qvec) AS BIGINT), c.ord) AS rn
        FROM n p CROSS JOIN cents c)
      SELECT CAST(ord AS BIGINT) AS ord, center_id,
        CAST(count(*) AS BIGINT) AS n_assigned, max(dd) AS radius_d2,
        CAST(sum(vec_id) AS BIGINT) AS idsum
      FROM asg WHERE rn = 1 GROUP BY ord, center_id ORDER BY ord""")),

    // ----- k-anonymity re-identification risk ladder ----------------------
    // The privacy audit that gates releasing (or training on) tabular
    // user data: group by the quasi-identifier tuple (nation, market
    // segment, account-balance band) and read off, for each k in
    // {2, 5, 10, 20}, how many rows sit in groups smaller than k — the
    // rows a linker with that background knowledge could single out.
    // Two aggregates total: group sizes, then the SIZE HISTOGRAM; the
    // ladder is computed over the histogram (cardinality = distinct
    // group sizes, trivially bounded), so the k sweep never rescans
    // rows — the shape that makes the audit free at any corpus size.
    // Balance band uses floor() explicitly: c_acctbal is signed, and
    // integer `div` on negatives truncates in Spark but floors in
    // DuckDB — floor() is the portable band.
    ("q206_k_anonymity", (s: SparkSession, dir: String) => {
      import s.implicits._
      val qi = Tables.t(s, dir, "customer")
        .select($"c_nationkey", $"c_mktsegment",
          floor($"c_acctbal" / 1000).cast("long").as("bal_b"))
      val gs = qi.groupBy($"c_nationkey", $"c_mktsegment", $"bal_b")
        .agg(count(lit(1)).as("g"))
      val hist = gs.groupBy($"g").agg(count(lit(1)).as("n_groups"))
      val tot = hist.agg(sum($"g" * $"n_groups").as("n_rows"),
        sum($"n_groups").as("n_groups_total"))
      hist.select(explode(array(Seq(2L, 5L, 10L, 20L).map(lit): _*)).as("k"),
          $"g", $"n_groups")
        .groupBy($"k")
        .agg(sum(when($"g" < $"k", $"n_groups").otherwise(0L)).as("n_groups_small"),
          sum(when($"g" < $"k", $"g" * $"n_groups").otherwise(0L)).as("n_rows_at_risk"))
        .crossJoin(broadcast(tot))
        .select($"k", $"n_groups_total", $"n_groups_small", $"n_rows_at_risk",
          expr("(1000000 * n_rows_at_risk) div n_rows").as("risk_micro"))
        .orderBy("k")
    }, Some("""
      WITH qi AS (SELECT c_nationkey, c_mktsegment,
          CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_b FROM customer),
      gs AS (SELECT CAST(count(*) AS BIGINT) AS g FROM qi
        GROUP BY c_nationkey, c_mktsegment, bal_b),
      hist AS (SELECT g, CAST(count(*) AS BIGINT) AS n_groups FROM gs GROUP BY g),
      tot AS (SELECT CAST(sum(g * n_groups) AS BIGINT) AS n_rows,
          CAST(sum(n_groups) AS BIGINT) AS n_groups_total FROM hist),
      k AS (SELECT unnest([2, 5, 10, 20]) AS k),
      r AS (SELECT k.k,
          CAST(sum(CASE WHEN h.g < k.k THEN h.n_groups ELSE 0 END) AS BIGINT) AS n_groups_small,
          CAST(sum(CASE WHEN h.g < k.k THEN h.g * h.n_groups ELSE 0 END) AS BIGINT) AS n_rows_at_risk
        FROM hist h CROSS JOIN k GROUP BY 1)
      SELECT CAST(r.k AS BIGINT) AS k, t.n_groups_total, r.n_groups_small,
        r.n_rows_at_risk, (1000000 * r.n_rows_at_risk) // t.n_rows AS risk_micro
      FROM r CROSS JOIN tot t ORDER BY k""")),

    // ----- deterministic random-walk corpus (graph-embedding input) -------
    // DeepWalk/node2vec training data: one fixed-length walk per node
    // over the item co-occurrence graph (q151/q160's edges), with the
    // next hop chosen by argmin of md5(walk || step || neighbor) — an
    // approximately-uniform choice that is REPRODUCIBLE and resumable
    // (no RNG state; re-running any shard regenerates identical walks,
    // the property a 100 TB corpus build needs for retries and
    // incremental extension). Each step is one co-partitioned equi-join
    // of the frontier against the edge list (partitioned by source) and
    // a top-1 window (rank ≤ 1 → WindowGroupLimit: losers never leave
    // the map side); per-step cost ∝ Σ deg(cur), walks shard by wid.
    // `n_unique` profiles revisit behavior — the walk-quality signal
    // (a hub-trapped walk revisits; a healthy one explores).
    ("q207_random_walks", (s: SparkSession, dir: String) => {
      import s.implicits._
      val items = Tables.t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      val e0 = items.toDF("ok", "a").join(items.toDF("ok", "b"), Seq("ok"))
        .filter($"a" < $"b").select($"a", $"b").distinct()
      val e = e0.select($"a".as("u"), $"b".as("v"))
        .unionByName(e0.select($"b".as("u"), $"a".as("v")))
        .localCheckpoint() // consumed once per step
      var walk = e.select($"u".as("wid")).distinct().withColumn("cur", $"wid")
      for (t <- 1 to 3) {
        val j = walk.join(e.toDF("cur", "nb"), Seq("cur"))
          .withColumn("h", md5(concat_ws("|", lit("rw"), $"wid".cast("string"),
            lit(t.toString), $"nb".cast("string"))))
        val w = Window.partitionBy($"wid").orderBy($"h", $"nb")
        walk = j.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
          .drop("cur", "h", "rn")
          .withColumnRenamed("nb", s"s$t")
          .withColumn("cur", col(s"s$t"))
      }
      walk.select($"wid", $"s1", $"s2", $"s3",
          size(array_distinct(array($"wid", $"s1", $"s2", $"s3"))).cast("long")
            .as("n_unique"))
        .orderBy("wid")
    }, Some("""
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      e0 AS (SELECT DISTINCT a.pk AS a, b.pk AS b
        FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk),
      e AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0),
      w0 AS (SELECT DISTINCT u AS wid FROM e),
      s1 AS (SELECT wid, v AS s1 FROM (SELECT w.wid, e.v,
          row_number() OVER (PARTITION BY w.wid ORDER BY
            md5('rw|' || CAST(w.wid AS VARCHAR) || '|1|' || CAST(e.v AS VARCHAR)), e.v) AS rn
        FROM w0 w JOIN e ON e.u = w.wid) WHERE rn = 1),
      s2 AS (SELECT wid, s1, v AS s2 FROM (SELECT s.wid, s.s1, e.v,
          row_number() OVER (PARTITION BY s.wid ORDER BY
            md5('rw|' || CAST(s.wid AS VARCHAR) || '|2|' || CAST(e.v AS VARCHAR)), e.v) AS rn
        FROM s1 s JOIN e ON e.u = s.s1) WHERE rn = 1),
      s3 AS (SELECT wid, s1, s2, v AS s3 FROM (SELECT s.wid, s.s1, s.s2, e.v,
          row_number() OVER (PARTITION BY s.wid ORDER BY
            md5('rw|' || CAST(s.wid AS VARCHAR) || '|3|' || CAST(e.v AS VARCHAR)), e.v) AS rn
        FROM s2 s JOIN e ON e.u = s.s2) WHERE rn = 1)
      SELECT wid, s1, s2, s3,
        CAST(len(list_distinct([wid, s1, s2, s3])) AS BIGINT) AS n_unique
      FROM s3 ORDER BY wid"""))
  )
}
