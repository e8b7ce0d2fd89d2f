package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.ext.{Similarity, TextAnalysis => TA}

/** Round-8 batch 25: padding-waste batching economics, cross-table
  * money reconciliation, and graded retrieval evaluation (nDCG@10 +
  * MRR) — inference batching, financial data quality, and the IR-eval
  * completion of the ANN family.
  *
  * House rules as elsewhere: integer arithmetic at every gate, money
  * in DECIMAL(12,2) cents, log₂ discounts as Scala-precomputed micro
  * constants shared by both engines. Identical aliases both sides,
  * total ORDER BY.
  */
object Round8yQueries {

  private val normSql = TA.normTextSql
  private val prepSql = Similarity.prepareSql
  private val bucketSql = Similarity.lshBucketSql
  private val Projs = Similarity.OracleProjs

  type QFn = (SparkSession, String) => DataFrame

  /** log₂(i+1) in micro for ranks 1..10 — the nDCG discount ladder,
    * precomputed once so both engines share the exact constants. */
  private val Lg2: Seq[Long] =
    (1 to 10).map(i => math.floor(math.log(i + 1) / math.log(2) * 1e6 + 0.5).toLong)

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- padding-waste batching audit -----------------------------------
    // The OTHER batching economics (q246 is concat-and-chunk; this is
    // pad-to-max): inference and non-packing training pad every
    // sequence in a batch of 32 to the batch max, so waste =
    // Σ(batch_max − len). Compared for arrival-order batches (doc_id)
    // vs length-sorted batches (the standard bucketing trick) — batch
    // ids from rank arithmetic, batch maxes from one window each, and
    // the waste ratio is the number that justifies a sort stage before
    // the GPU. Two |corpus| windows ordered by different keys, then a
    // batch-level rollup; at 100 TB the sort is per shard, exactly as
    // serving systems bucket.
    ("q291_padding_waste", (s: SparkSession, dir: String) => {
      import s.implicits._
      val lens = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", TA.normText($"text").as("nt"))
        .select($"doc_id", when($"nt" === "", lit(0L))
          .otherwise(size(split($"nt", " ")).cast("long")).as("len"))
        .filter($"len" > 0)
      val byArrival = lens.withColumn("bk",
        expr("CAST((row_number() OVER (ORDER BY doc_id) - 1) div 32 AS BIGINT)"))
      val bySorted = lens.withColumn("bk",
        expr("CAST((row_number() OVER (ORDER BY len, doc_id) - 1) div 32 AS BIGINT)"))
      def waste(df: DataFrame, nm: String) = df
        .groupBy($"bk").agg(count(lit(1)).as("bn"), max($"len").as("mx"),
          sum($"len").as("sl"))
        .agg(count(lit(1)).as("n_batches"), sum($"sl").as("tokens"),
          sum($"bn" * $"mx" - $"sl").as("padding"),
          sum($"bn" * $"mx").as("padded_total"))
        .select(lit(nm).as("scheme"), $"n_batches", $"tokens", $"padding",
          expr("1000000 * padding div padded_total").as("waste_micro"))
      waste(byArrival, "a_arrival").unionByName(waste(bySorted, "b_sorted"))
        .orderBy($"scheme")
    }, Some(s"""
      WITH lens AS (SELECT doc_id,
          CASE WHEN $normSql = '' THEN 0
            ELSE CAST(len(string_split($normSql, ' ')) AS BIGINT) END AS len
        FROM documents),
      f AS (SELECT * FROM lens WHERE len > 0),
      ba AS (SELECT len,
          CAST((row_number() OVER (ORDER BY doc_id) - 1) // 32 AS BIGINT) AS bk
        FROM f),
      bs AS (SELECT len,
          CAST((row_number() OVER (ORDER BY len, doc_id) - 1) // 32 AS BIGINT) AS bk
        FROM f),
      wa AS (SELECT 'a_arrival' AS scheme, CAST(count(*) AS BIGINT) AS n_batches,
          CAST(sum(sl) AS BIGINT) AS tokens,
          CAST(sum(bn * mx - sl) AS BIGINT) AS padding,
          CAST(sum(bn * mx) AS BIGINT) AS padded_total
        FROM (SELECT bk, CAST(count(*) AS BIGINT) AS bn, max(len) AS mx,
            CAST(sum(len) AS BIGINT) AS sl FROM ba GROUP BY 1)),
      ws AS (SELECT 'b_sorted', CAST(count(*) AS BIGINT), CAST(sum(sl) AS BIGINT),
          CAST(sum(bn * mx - sl) AS BIGINT), CAST(sum(bn * mx) AS BIGINT)
        FROM (SELECT bk, CAST(count(*) AS BIGINT) AS bn, max(len) AS mx,
            CAST(sum(len) AS BIGINT) AS sl FROM bs GROUP BY 1)),
      u AS (SELECT * FROM wa UNION ALL SELECT * FROM ws)
      SELECT scheme, n_batches, tokens, padding,
        1000000 * padding // padded_total AS waste_micro
      FROM u ORDER BY scheme""")),

    // ----- cross-table money reconciliation -------------------------------
    // The finance-grade consistency audit q07/q92/q93 don't cover:
    // does each order's header total equal the sum of its line items
    // (extended price, discounted and taxed)? Every term stays in
    // DECIMAL cents — the charged amount per line is
    // round(extprice·(1−disc)·(1+tax)) computed in DECIMAL so both
    // engines round identically — and the audit reports, per order
    // status, the orders whose header disagrees with the recomputed
    // body plus the total absolute drift. On this generator the header
    // is NOT derived from the lines, so the audit flags everything —
    // which is the honest read: reconciliation exists to FIND such
    // pipelines. One join on the natural key, two rollups.
    ("q292_money_reconciliation", (s: SparkSession, dir: String) => {
      import s.implicits._
      val li = Tables.t(s, dir, "lineitem")
        .select($"l_orderkey",
          expr("""CAST(floor(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(4,2)))
            * (1 + CAST(l_tax AS DECIMAL(4,2))) * 100 + 0.5)
            AS BIGINT)""").as("line_cents"))
        .groupBy($"l_orderkey").agg(sum($"line_cents").as("body_cents"))
      val o = Tables.t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus",
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("head_cents"))
      o.join(li, $"o_orderkey" === $"l_orderkey", "left")
        .select($"o_orderstatus",
          coalesce($"body_cents", lit(0L)).as("body_cents"), $"head_cents")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(when($"head_cents" =!= $"body_cents", 1L).otherwise(0L))
            .as("n_mismatch"),
          sum(abs($"head_cents" - $"body_cents")).as("abs_drift_cents"),
          sum(when($"body_cents" === 0L, 1L).otherwise(0L)).as("n_headless"))
        .select($"o_orderstatus", $"n_orders", $"n_mismatch",
          expr("1000000 * n_mismatch div n_orders").as("mismatch_micro"),
          $"abs_drift_cents", $"n_headless")
        .orderBy($"o_orderstatus")
    }, Some("""
      WITH li AS (SELECT l_orderkey,
          CAST(sum(CAST(floor(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(4,2)))
            * (1 + CAST(l_tax AS DECIMAL(4,2))) * 100 + 0.5)
            AS BIGINT)) AS BIGINT) AS body_cents
        FROM lineitem GROUP BY 1),
      o AS (SELECT o_orderkey, o_orderstatus,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS head_cents
        FROM orders),
      j AS (SELECT o.o_orderstatus, coalesce(li.body_cents, 0) AS body_cents,
          o.head_cents
        FROM o LEFT JOIN li ON o.o_orderkey = li.l_orderkey)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(CASE WHEN head_cents <> body_cents THEN 1 ELSE 0 END) AS BIGINT)
          AS n_mismatch,
        CAST(1000000 * sum(CASE WHEN head_cents <> body_cents THEN 1 ELSE 0 END)
          // count(*) AS BIGINT) AS mismatch_micro,
        CAST(sum(abs(head_cents - body_cents)) AS BIGINT) AS abs_drift_cents,
        CAST(sum(CASE WHEN body_cents = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_headless
      FROM j GROUP BY 1 ORDER BY 1""")),

    // ----- graded retrieval evaluation: nDCG@10 + MRR ---------------------
    // The graded complement to q210's recall certificate: score the
    // single-probe LSH retriever (q25's shape, k = 10) against the
    // exact top-10 (q24's brute force) with relevance grades
    // rel = 11 − exact_rank. nDCG@10 uses the log₂ discount ladder as
    // shared micro constants (rel·10¹²/lg₂ per hit, so each term is an
    // exact integer); MRR finds the reciprocal rank of the TRUE
    // nearest neighbor in the retrieved list. Reported as micro means
    // over the probe set plus the top-1-found count — the eval triple
    // (recall, nDCG, MRR) a retrieval system actually publishes. Both
    // lists are WindowGroupLimit top-10s; the grade join keys on
    // (q_id, c_id).
    ("q293_ndcg_mrr", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      val exact = Similarity.bruteForceTopK(
          prepared.filter($"id" % 100 === 0), prepared, k = 10)
        .select($"q_id", $"c_id", $"rank".as("ex_rank"))
        .localCheckpoint() // grades + ideal + MRR target reuse it
      val got10 = Similarity.lshTopK(prepared, col("id") % 100 === 0, Projs, k = 10)
        .select($"q_id", $"c_id", $"rank".as("r_rank"))
      val lg2 = Lg2.zipWithIndex.map { case (l, i) => (i + 1L, l) }
        .toDF("rnk", "lg2_micro")
      val graded = got10
        .join(exact, Seq("q_id", "c_id"), "left")
        .withColumn("rel", when($"ex_rank".isNotNull, lit(11L) - $"ex_rank")
          .otherwise(lit(0L)))
        .join(broadcast(lg2), $"r_rank" === $"rnk")
        .withColumn("g", expr("rel * 1000000000000 div lg2_micro"))
      val dcg = graded.groupBy($"q_id").agg(sum($"g").as("dcg"))
      val idcg = Lg2.zipWithIndex
        .map { case (l, i) => (11L - (i + 1)) * 1000000000000L / l }.sum
      val mrr = got10.join(exact.filter($"ex_rank" === 1)
          .select($"q_id", $"c_id"), Seq("q_id", "c_id"), "left_semi")
        .select($"q_id", expr("1000000 div r_rank").as("rr_micro"))
      val nq = exact.select($"q_id").distinct().agg(count(lit(1)).as("n_probes"))
      val aggD = dcg.agg(sum($"dcg").as("sum_dcg"), count(lit(1)).as("nd"))
      val aggM = mrr.groupBy($"q_id").agg(max($"rr_micro").as("rr"))
        .agg(sum($"rr").as("sum_rr"), count(lit(1)).as("n_top1_found"))
      nq.crossJoin(broadcast(aggD)).crossJoin(broadcast(aggM))
        .select($"n_probes",
          expr(s"CAST(1000000 * CAST(sum_dcg AS DECIMAL(38,0)) div ($idcg * n_probes) AS BIGINT)")
            .as("mean_ndcg_micro"),
          expr("coalesce(sum_rr, 0) div n_probes").as("mean_mrr_micro"),
          coalesce($"n_top1_found", lit(0L)).as("n_top1_found"))
    }, Some {
      val lg2Rows = Lg2.zipWithIndex
        .map { case (l, i) => s"(${i + 1}, $l)" }.mkString(", ")
      val idcg = Lg2.zipWithIndex
        .map { case (l, i) => (11L - (i + 1)) * 1000000000000L / l }.sum
      s"""
      WITH $prepSql,
      b AS (SELECT vec_id, qvec, n2, $bucketSql AS bucket FROM n),
      qp AS (SELECT * FROM b WHERE vec_id % 100 = 0),
      exact AS (SELECT q_id, c_id, rnk AS ex_rank FROM (
          SELECT q.vec_id AS q_id, c.vec_id AS c_id,
            row_number() OVER (PARTITION BY q.vec_id ORDER BY
              list_dot_product(q.qvec, c.qvec) / sqrt(q.n2 * c.n2) DESC,
              c.vec_id) AS rnk
          FROM n c, qp q WHERE q.vec_id <> c.vec_id) WHERE rnk <= 10),
      got10 AS (SELECT q_id, c_id, rnk AS r_rank FROM (
          SELECT q.vec_id AS q_id, c.vec_id AS c_id,
            row_number() OVER (PARTITION BY q.vec_id ORDER BY
              list_dot_product(q.qvec, c.qvec) / sqrt(q.n2 * c.n2) DESC,
              c.vec_id) AS rnk
          FROM b c JOIN qp q ON c.bucket = q.bucket AND q.vec_id <> c.vec_id)
        WHERE rnk <= 10),
      lg2(rnk, lg2_micro) AS (VALUES $lg2Rows),
      graded AS (SELECT g.q_id,
          (CASE WHEN e.ex_rank IS NOT NULL THEN 11 - e.ex_rank ELSE 0 END)
            * 1000000000000 // l.lg2_micro AS g
        FROM got10 g LEFT JOIN exact e ON g.q_id = e.q_id AND g.c_id = e.c_id
        JOIN lg2 l ON g.r_rank = l.rnk),
      dcg AS (SELECT q_id, CAST(sum(g) AS BIGINT) AS dcg FROM graded GROUP BY 1),
      mrr AS (SELECT g.q_id, CAST(max(1000000 // g.r_rank) AS BIGINT) AS rr
        FROM got10 g JOIN exact e ON g.q_id = e.q_id AND g.c_id = e.c_id
        WHERE e.ex_rank = 1 GROUP BY 1),
      nq AS (SELECT CAST(count(DISTINCT q_id) AS BIGINT) AS n_probes FROM exact),
      ad AS (SELECT CAST(sum(dcg) AS BIGINT) AS sum_dcg FROM dcg),
      am AS (SELECT CAST(coalesce(sum(rr), 0) AS BIGINT) AS sum_rr,
          CAST(count(*) AS BIGINT) AS n_top1_found FROM mrr)
      SELECT nq.n_probes,
        CAST(1000000 * CAST(ad.sum_dcg AS HUGEINT) // ($idcg * nq.n_probes) AS BIGINT)
          AS mean_ndcg_micro,
        CAST(am.sum_rr // nq.n_probes AS BIGINT) AS mean_mrr_micro,
        am.n_top1_found
      FROM nq CROSS JOIN ad CROSS JOIN am"""
    })
  )
}
