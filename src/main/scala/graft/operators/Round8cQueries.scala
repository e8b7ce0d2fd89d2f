package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity

/** Round-8 batch 3: the ANN index-engineering surface — product
  * quantization with asymmetric-distance scoring (the memory-bound form
  * every 100 TB vector index converges on), embedding-space drift
  * monitoring between corpus snapshots, and recall certification of the
  * LSH search against its exact oracle.
  *
  * Numeric house rules: quantized integer-valued vectors (exact dot
  * products), L2 distances cleared to Int64 before any comparison,
  * centroid means per-dimension ROUNDED so codebooks stay integer and
  * engine-identical (the q47 Lloyd convention).
  */
object Round8cQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** One Lloyd-L2 pass: assign each point (id, sv, sn2) to its nearest
    * centroid (ties to the lowest cent_id), then per-dimension rounded
    * mean. Centroid count K is bounded (broadcast), so assignment is a
    * map pass; the mean is one aggregate on (cent, pos). */
  private def lloydL2(pts: DataFrame, init: DataFrame, iters: Int): DataFrame = {
    var cents = init
    for (_ <- 1 to iters) {
      val asg = pts.crossJoin(broadcast(cents))
        .withColumn("d2",
          (col("sn2") + col("cn2") - lit(2) * Similarity.dot(col("sv"), col("cvec")))
            .cast("long"))
      val w = Window.partitionBy(col("id")).orderBy(col("d2"), col("cent_id"))
      val a = asg.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      cents = a.select(col("cent_id"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("cent_id"), col("pos"))
        .agg(round(sum(col("v")) / count(lit(1))).as("m"))
        .groupBy(col("cent_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cent_id"), transform(col("pm"), x => x("m")).as("cvec"))
        .withColumn("cn2", Similarity.dot(col("cvec"), col("cvec")))
        // K-bounded rows, but the PLAN doubles per iteration and every
        // consumer (next pass, encode, LUT) builds its broadcast by
        // re-running the whole training subtree — measured at sf0.1 this
        // re-execution was ~all of q208's cost. Materialize per pass.
        .localCheckpoint()
    }
    cents
  }

  /** Nearest-centroid code per point under the final codebook. */
  private def encode(pts: DataFrame, cents: DataFrame, codeCol: String): DataFrame = {
    val asg = pts.crossJoin(broadcast(cents))
      .withColumn("d2",
        (col("sn2") + col("cn2") - lit(2) * Similarity.dot(col("sv"), col("cvec")))
          .cast("long"))
    val w = Window.partitionBy(col("id")).orderBy(col("d2"), col("cent_id"))
    asg.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("id"), col("cent_id").as(codeCol))
  }

  /** DuckDB Lloyd-L2 template for one subspace `t` (sv-tables must exist
    * as sv$t(vec_id, sv, sn2)); produces c${t}_$iters. */
  private def lloydSql(t: Int, iters: Int, initMod: Int): String = {
    def iter(i: Int): String = s"""
      a${t}_$i AS (SELECT vec_id, sv, sn2, cent_id FROM (
        SELECT p.vec_id, p.sv, p.sn2, c.cent_id,
          row_number() OVER (PARTITION BY p.vec_id ORDER BY
            CAST(p.sn2 + c.cn2 - 2 * list_dot_product(p.sv, c.cvec) AS BIGINT), c.cent_id) AS r
        FROM sv$t p, c${t}_${i - 1} c) WHERE r = 1),
      m${t}_$i AS (SELECT cent_id, pos, round(sum(v) / count(*)) AS m FROM (
        SELECT cent_id, unnest(sv) AS v, unnest(range(1, len(sv) + 1)) AS pos FROM a${t}_$i)
        GROUP BY cent_id, pos),
      c${t}_$i AS (SELECT cent_id, cvec, list_dot_product(cvec, cvec) AS cn2 FROM (
        SELECT cent_id, list(m ORDER BY pos) AS cvec FROM m${t}_$i GROUP BY cent_id))"""
    s"""c${t}_0 AS (SELECT vec_id AS cent_id, sv AS cvec, sn2 AS cn2
        FROM sv$t WHERE vec_id % $initMod = 0),
      ${(1 to iters).map(iter).mkString(",")}"""
  }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- product quantization + asymmetric distance (ADC) --------------
    // The representation a 100 TB vector index actually serves from:
    // vectors stored as m=2 sub-space codebook CODES (here 2×~8 centroids
    // → 2 small ints per vector, a ~128× compression of the 64-dim
    // payload), queries scored WITHOUT decoding — each query precomputes
    // a LUT of exact distances to every centroid per subspace (|Q|·K·m
    // rows, broadcastable), and candidate scoring becomes a hash join of
    // the code table against the LUT + a 2-term sum: NO vector math in
    // the corpus-sized loop, which is the whole point of ADC. Codebooks
    // are trained with 2 Lloyd-L2 rounds per subspace from deterministic
    // seeds (per-dim rounded means keep them integer — the q47
    // convention); `in_exact` audits each ADC top-3 hit against the
    // exact-L2 top-3, pricing the compression in recall.
    ("q208_pq_adc", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
        .localCheckpoint() // scanned by 2 subspace pipelines + exact oracle
      def sub(lo: Int): DataFrame = prepared
        .select($"id", slice($"qvec", lo, 32).as("sv"))
        .withColumn("sn2", graft.functions.Lambda.bind1($"sv")(a =>
          Similarity.dot(a, a)))
      val sv1 = sub(1).localCheckpoint()
      val sv2 = sub(33).localCheckpoint()
      val c1 = lloydL2(sv1, sv1.filter($"id" % 64 === 0)
        .select($"id".as("cent_id"), $"sv".as("cvec"), $"sn2".as("cn2")), 2)
      val c2 = lloydL2(sv2, sv2.filter($"id" % 64 === 0)
        .select($"id".as("cent_id"), $"sv".as("cvec"), $"sn2".as("cn2")), 2)
      val codes = encode(sv1, c1, "code1")
        .join(encode(sv2, c2, "code2"), "id")
      def lut(sv: DataFrame, cents: DataFrame): DataFrame =
        sv.filter($"id" % 100 === 0)
          .select($"id".as("q_id"), $"sv".as("q_sv"), $"sn2".as("q_sn2"))
          .crossJoin(broadcast(cents))
          .select($"q_id", $"cent_id",
            ($"q_sn2" + $"cn2" - lit(2) * Similarity.dot($"q_sv", $"cvec"))
              .cast("long").as("pd2"))
      val l1 = lut(sv1, c1)
      val l2 = lut(sv2, c2)
      val adc = codes
        .join(broadcast(l1.toDF("q_id", "code1", "pd1")), Seq("code1"))
        .join(broadcast(l2.toDF("q_id", "code2", "pd2")), Seq("q_id", "code2"))
        .filter($"q_id" =!= $"id")
        .select($"q_id", $"id".as("c_id"), ($"pd1" + $"pd2").as("adc_d2"))
      val w = Window.partitionBy($"q_id").orderBy($"adc_d2", $"c_id")
      val top3 = adc.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
      val qf = prepared.filter($"id" % 100 === 0)
        .select($"id".as("q_id"), $"qvec".as("q_vec"), $"n2".as("q_n2"))
      val exact = prepared.crossJoin(broadcast(qf)).filter($"q_id" =!= $"id")
        .select($"q_id", $"id".as("c_id"),
          ($"q_n2" + $"n2" - lit(2) * Similarity.dot($"q_vec", $"qvec"))
            .cast("long").as("ed2"))
      val we = Window.partitionBy($"q_id").orderBy($"ed2", $"c_id")
      val ex3 = exact.withColumn("ernk", row_number().over(we)).filter($"ernk" <= 3)
        .select($"q_id", $"c_id").withColumn("hit", lit(1L))
      top3.join(ex3, Seq("q_id", "c_id"), "left")
        .select($"q_id", $"rnk".cast("long").as("rnk"), $"c_id", $"adc_d2",
          coalesce($"hit", lit(0L)).as("in_exact"))
        .orderBy("q_id", "rnk")
    }, Some(s"""
      WITH ${Similarity.prepareSql},
      sv1 AS (SELECT vec_id, qvec[1:32] AS sv,
        list_dot_product(qvec[1:32], qvec[1:32]) AS sn2 FROM n),
      sv2 AS (SELECT vec_id, qvec[33:64] AS sv,
        list_dot_product(qvec[33:64], qvec[33:64]) AS sn2 FROM n),
      ${lloydSql(1, 2, 64)},
      ${lloydSql(2, 2, 64)},
      codes1 AS (SELECT vec_id, cent_id AS code1 FROM (
        SELECT p.vec_id, c.cent_id,
          row_number() OVER (PARTITION BY p.vec_id ORDER BY
            CAST(p.sn2 + c.cn2 - 2 * list_dot_product(p.sv, c.cvec) AS BIGINT), c.cent_id) AS r
        FROM sv1 p, c1_2 c) WHERE r = 1),
      codes2 AS (SELECT vec_id, cent_id AS code2 FROM (
        SELECT p.vec_id, c.cent_id,
          row_number() OVER (PARTITION BY p.vec_id ORDER BY
            CAST(p.sn2 + c.cn2 - 2 * list_dot_product(p.sv, c.cvec) AS BIGINT), c.cent_id) AS r
        FROM sv2 p, c2_2 c) WHERE r = 1),
      lut1 AS (SELECT q.vec_id AS q_id, c.cent_id,
          CAST(q.sn2 + c.cn2 - 2 * list_dot_product(q.sv, c.cvec) AS BIGINT) AS pd1
        FROM sv1 q CROSS JOIN c1_2 c WHERE q.vec_id % 100 = 0),
      lut2 AS (SELECT q.vec_id AS q_id, c.cent_id,
          CAST(q.sn2 + c.cn2 - 2 * list_dot_product(q.sv, c.cvec) AS BIGINT) AS pd2
        FROM sv2 q CROSS JOIN c2_2 c WHERE q.vec_id % 100 = 0),
      adc AS (SELECT l1.q_id, cd1.vec_id AS c_id, l1.pd1 + l2.pd2 AS adc_d2
        FROM codes1 cd1 JOIN codes2 cd2 ON cd2.vec_id = cd1.vec_id
        JOIN lut1 l1 ON l1.cent_id = cd1.code1
        JOIN lut2 l2 ON l2.cent_id = cd2.code2 AND l2.q_id = l1.q_id
        WHERE l1.q_id <> cd1.vec_id),
      top3 AS (SELECT q_id, c_id, adc_d2,
          row_number() OVER (PARTITION BY q_id ORDER BY adc_d2, c_id) AS rnk
        FROM adc),
      qf AS (SELECT vec_id AS q_id, qvec, n2 FROM n WHERE vec_id % 100 = 0),
      ex3 AS (SELECT q_id, c_id FROM (
        SELECT q.q_id, c.vec_id AS c_id,
          row_number() OVER (PARTITION BY q.q_id ORDER BY
            CAST(q.n2 + c.n2 - 2 * list_dot_product(q.qvec, c.qvec) AS BIGINT), c.vec_id) AS ernk
        FROM n c JOIN qf q ON c.vec_id <> q.q_id) WHERE ernk <= 3)
      SELECT t.q_id, CAST(t.rnk AS BIGINT) AS rnk, t.c_id, t.adc_d2,
        CAST(CASE WHEN e.c_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_exact
      FROM top3 t LEFT JOIN ex3 e ON e.q_id = t.q_id AND e.c_id = t.c_id
      WHERE t.rnk <= 3 ORDER BY t.q_id, t.rnk""")),

    // ----- embedding-space drift between corpus snapshots -----------------
    // q127/q195 watch DISTRIBUTIONS drift; this watches the embedding
    // SPACE: per label, the centroid of the old snapshot (even ids) vs
    // the new (odd ids) — squared centroid displacement in exact integer
    // units plus the population share shift. The monitor an embedding
    // pipeline re-runs per ingest to catch encoder or upstream-content
    // drift before it poisons the ANN index (centroid moves) or the
    // class balance (share moves). Cost: one posexplode aggregate per
    // (label, snapshot, dim) — corpus-linear, output |labels| rows;
    // rounded integer centroids make the drift engine-exact.
    ("q209_embedding_drift", (s: SparkSession, dir: String) => {
      import s.implicits._
      val e = Tables.spread(Tables.t(s, dir, "embeddings"))
        .select($"vec_id", $"label".cast("long").as("label"),
          Similarity.quantize($"embedding").as("qvec"),
          ($"vec_id" % 2).as("snap"))
      val cent = e.select($"label", $"snap", posexplode($"qvec").as(Seq("pos", "v")))
        .groupBy($"label", $"snap", $"pos")
        .agg(round(sum($"v") / count(lit(1))).as("m"))
        .groupBy($"label", $"snap")
        .agg(sort_array(collect_list(struct($"pos", $"m"))).as("pm"))
        .select($"label", $"snap", transform($"pm", x => x("m")).as("cvec"))
      val co = cent.filter($"snap" === 0).select($"label", $"cvec".as("c_old"))
      val cn = cent.filter($"snap" === 1).select($"label", $"cvec".as("c_new"))
      val counts = e.groupBy($"label", $"snap").agg(count(lit(1)).as("n"))
      val no = counts.filter($"snap" === 0).select($"label", $"n".as("n_old"))
      val nn = counts.filter($"snap" === 1).select($"label", $"n".as("n_new"))
      val tots = e.groupBy($"snap").agg(count(lit(1)).as("t"))
      val to = tots.filter($"snap" === 0).select($"t".as("t_old"))
      val tn = tots.filter($"snap" === 1).select($"t".as("t_new"))
      co.join(cn, "label").join(no, "label").join(nn, "label")
        .crossJoin(broadcast(to)).crossJoin(broadcast(tn))
        .select($"label", $"n_old", $"n_new",
          expr("(1000000 * n_old) div t_old").as("share_old_micro"),
          expr("(1000000 * n_new) div t_new").as("share_new_micro"),
          (graft.functions.Lambda.bind1(zip_with($"c_old", $"c_new", (a, b) => a - b))(
            d => Similarity.dot(d, d))).cast("long").as("centroid_d2"))
        .orderBy("label")
    }, Some("""
      WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
          list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 10000)) AS qvec,
          vec_id % 2 AS snap
        FROM embeddings),
      cent AS (SELECT label, snap, list(m ORDER BY pos) AS cvec FROM (
          SELECT label, snap, pos, round(sum(v) / count(*)) AS m FROM (
            SELECT label, snap, unnest(qvec) AS v,
              unnest(range(1, len(qvec) + 1)) AS pos FROM e)
          GROUP BY label, snap, pos)
        GROUP BY label, snap),
      counts AS (SELECT label, snap, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
      tots AS (SELECT snap, CAST(count(*) AS BIGINT) AS t FROM e GROUP BY 1)
      SELECT co.label, no_.n AS n_old, nn_.n AS n_new,
        (1000000 * no_.n) // to_.t AS share_old_micro,
        (1000000 * nn_.n) // tn_.t AS share_new_micro,
        CAST(list_dot_product(co.cvec, co.cvec) + list_dot_product(cn.cvec, cn.cvec)
          - 2 * list_dot_product(co.cvec, cn.cvec) AS BIGINT) AS centroid_d2
      FROM cent co JOIN cent cn ON cn.label = co.label AND co.snap = 0 AND cn.snap = 1
      JOIN counts no_ ON no_.label = co.label AND no_.snap = 0
      JOIN counts nn_ ON nn_.label = co.label AND nn_.snap = 1
      CROSS JOIN (SELECT t FROM tots WHERE snap = 0) to_
      CROSS JOIN (SELECT t FROM tots WHERE snap = 1) tn_
      ORDER BY co.label""")),

    // ----- ANN recall certification (LSH vs exact) ------------------------
    // The number an approximate index must publish before anyone trusts
    // it: per probe query, how many of the exact cosine top-3 the q25
    // LSH search returns (recall@3) and the reciprocal rank at which it
    // surfaces the TRUE nearest neighbor (0 when missed). Both searches
    // are existing operators composed — the exact side runs only on the
    // 1-in-100 probe set (broadcast against the corpus scan, the q24
    // shape), so certification costs a probe-sized fraction of a full
    // brute force; the per-query rows are the audit trail a recall SLO
    // is graded on.
    ("q210_ann_recall_cert", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
        .localCheckpoint() // consumed by the LSH and the exact searches
      val lsh = Similarity.lshTopK(prepared, col("id") % 100 === 0,
          Similarity.OracleProjs, k = 3)
        .select($"q_id", $"rank", $"c_id")
      val exact = Similarity.bruteForceTopK(
          prepared.filter($"id" % 100 === 0), prepared, 3)
        .select($"q_id", $"rank".as("erank"), $"c_id")
      val hits = exact.join(lsh.select($"q_id", $"c_id", lit(1L).as("found")),
          Seq("q_id", "c_id"), "left")
        .groupBy($"q_id").agg(sum(coalesce($"found", lit(0L))).as("n_hits"))
      val nn = exact.filter($"erank" === 1).select($"q_id", $"c_id")
      val rr = nn.join(lsh, Seq("q_id", "c_id"), "left")
        .select($"q_id",
          coalesce(expr("1000000 div rank"), lit(0L)).as("rr_micro"))
      hits.join(rr, "q_id")
        .select($"q_id", $"n_hits", $"rr_micro")
        .orderBy("q_id")
    }, Some(s"""
      WITH ${Similarity.prepareSql},
      b AS (SELECT vec_id, qvec, n2, ${Similarity.lshBucketSql} AS bucket FROM n),
      lscored AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
          list_dot_product(q.qvec, c.qvec) / sqrt(q.n2 * c.n2) AS cos_sim
        FROM b c JOIN b q ON c.bucket = q.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id % 100 = 0),
      lsh AS (SELECT q_id, c_id, rank FROM (SELECT q_id, c_id,
          row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rank
        FROM lscored) WHERE rank <= 3),
      escored AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
          list_dot_product(q.qvec, c.qvec) / sqrt(q.n2 * c.n2) AS cos_sim
        FROM n c JOIN n q ON q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id),
      exact AS (SELECT q_id, c_id, erank FROM (SELECT q_id, c_id,
          row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS erank
        FROM escored) WHERE erank <= 3),
      hits AS (SELECT e.q_id,
          CAST(sum(CASE WHEN l.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
        FROM exact e LEFT JOIN lsh l ON l.q_id = e.q_id AND l.c_id = e.c_id
        GROUP BY e.q_id),
      rr AS (SELECT e.q_id,
          CAST(coalesce(1000000 // l.rank, 0) AS BIGINT) AS rr_micro
        FROM exact e LEFT JOIN lsh l ON l.q_id = e.q_id AND l.c_id = e.c_id
        WHERE e.erank = 1)
      SELECT h.q_id, h.n_hits, rr.rr_micro
      FROM hits h JOIN rr ON rr.q_id = h.q_id ORDER BY h.q_id"""))
  )
}
