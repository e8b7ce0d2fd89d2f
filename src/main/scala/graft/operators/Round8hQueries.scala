package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, TextAnalysis => TA}

/** Round-8 batch 8: sampling design, contrastive-pair hygiene, and
  * declarative data-quality contracts — the eval/ingest governance
  * surface of a corpus pipeline.
  */
object Round8hQueries {

  private val normSql = TA.normTextSql
  private val P = Dedup.HashPrime

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- stratification gain (survey-sampling design effect) ------------
    // Should an eval sample be drawn stratified-by-source or uniformly?
    // The answer is the variance decomposition: proportional-allocation
    // stratified sampling removes the BETWEEN-strata variance, so the
    // gain is 1 − SSW/SST — the R² of source on the metric. Computed
    // exactly from three integer sums per stratum (n, Σx, Σx²; x =
    // n_chars); sums-of-squares use the n·Σx² − (Σx)² form and clear to
    // integers with one floor division (identical both engines). One
    // aggregate over the corpus, |sources| rows after — the cheapest
    // possible answer to a design question usually settled by opinion.
    ("q220_stratification_gain", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.t(s, dir, "documents").select($"source", $"n_chars")
      val per = d.groupBy($"source").agg(count(lit(1)).as("n_s"),
        sum($"n_chars").as("sx"), sum($"n_chars" * $"n_chars").as("sxx"))
        .select($"source", $"n_s", $"sx", $"sxx",
          expr("(n_s * sxx - sx * sx) div n_s").as("ssw_part"),
          expr("(1000000 * sx) div n_s").as("mean_micro"))
      val tot = per.agg(sum($"n_s").as("n"), sum($"sx").as("tsx"),
          sum($"sxx").as("tsxx"), sum($"ssw_part").as("ssw"))
        .select($"ssw", expr("(n * tsxx - tsx * tsx) div n").as("sst"))
        .select($"ssw", $"sst",
          expr("(1000000 * (sst - ssw)) div sst").as("gain_micro"))
      per.crossJoin(broadcast(tot))
        .select($"source", $"n_s".as("n_docs"), $"mean_micro", $"ssw_part",
          $"ssw", $"sst", $"gain_micro")
        .orderBy("source")
    }, Some("""
      WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s,
          CAST(sum(n_chars) AS BIGINT) AS sx,
          CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
        FROM documents GROUP BY source),
      p2 AS (SELECT source, n_s, sx, sxx,
          (n_s * sxx - sx * sx) // n_s AS ssw_part,
          (1000000 * sx) // n_s AS mean_micro
        FROM per),
      tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n, CAST(sum(sx) AS BIGINT) AS tsx,
          CAST(sum(sxx) AS BIGINT) AS tsxx, CAST(sum(ssw_part) AS BIGINT) AS ssw
        FROM p2),
      t2 AS (SELECT ssw, (n * tsxx - tsx * tsx) // n AS sst FROM tot),
      t3 AS (SELECT ssw, sst, (1000000 * (sst - ssw)) // sst AS gain_micro FROM t2)
      SELECT p2.source, p2.n_s AS n_docs, p2.mean_micro, p2.ssw_part,
        t3.ssw, t3.sst, t3.gain_micro
      FROM p2 CROSS JOIN t3 ORDER BY p2.source""")),

    // ----- dedup-aware negative sampling ----------------------------------
    // Contrastive training needs negatives that are actually negative: a
    // sampled "negative" that is a near-duplicate of its anchor is a
    // FALSE negative and poisons the loss. Proposals are md5-uniform
    // over the contiguous id space (5 per anchor, seedless — any retry
    // regenerates the same pairs); the near-dup screen joins both sides'
    // LSH BAND-KEY arrays (the q21 4-band signature, the persisted dedup
    // index at scale) and rejects any proposal sharing a band — the
    // exclusion costs a bounded 4×4 array intersect per proposal, plus
    // two id equi-joins against the signature table. Proposals mix the
    // two production sources: 5 md5-uniform draws per anchor AND, where
    // the anchor has a band-0 bucket partner, one HARD proposal from its
    // own LSH bucket (j = 6, the smallest partner id) — hard negatives
    // mined from the ANN index are exactly the draws most likely to be
    // secret positives, and the screen provably rejects every one of
    // them (band-0 equality holds by construction). Self-draws are
    // counted separately (a sampling artifact, not a dedup catch).
    // Per-anchor accounting pins the kept set by id-sum.
    ("q221_negative_sampling", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id",
          graft.functions.WordShingleHash32(TA.normText($"text"), 3).as("hs"))
      val mh = docs.select(($"doc_id" +: (0 until 8).map(k =>
        Dedup.minhashInt($"hs", k).as(s"m$k"))): _*)
      val bk = mh.select($"doc_id", array((0 until 4).map(b =>
          md5(concat_ws("|", col(s"m${2 * b}").cast("string"),
            col(s"m${2 * b + 1}").cast("string")))): _*).as("bands"))
        .localCheckpoint() // joined twice (anchor side + negative side)
      val n = Tables.t(s, dir, "documents").agg(count(lit(1)).as("n"))
      val uniform = bk.select($"doc_id".as("anchor"), $"bands".as("bands_a"))
        .crossJoin(broadcast(n))
        .select($"anchor", $"bands_a",
          explode(array((1 to 5).map(lit): _*)).as("j"), $"n")
        .select($"anchor", $"bands_a", $"j",
          (conv(substring(md5(concat_ws("|", lit("neg"), $"anchor".cast("string"),
            $"j".cast("string"))), 1, 8), 16, 10).cast("long") % $"n").as("neg"))
      val b0 = bk.select($"doc_id", element_at($"bands", 1).as("b0"))
      val hard = b0.toDF("anchor", "k").join(b0.toDF("p", "k"), Seq("k"))
        .filter($"anchor" =!= $"p")
        .groupBy($"anchor").agg(min($"p").as("neg"))
        .join(bk.select($"doc_id".as("anchor"), $"bands".as("bands_a")), Seq("anchor"))
        .select($"anchor", $"bands_a", lit(6).as("j"), $"neg")
      val props = uniform.drop("n").unionByName(hard)
      val scored = props
        .join(bk.select($"doc_id".as("neg"), $"bands".as("bands_b")), Seq("neg"))
        .select($"anchor", $"neg",
          when($"neg" === $"anchor", 1L).otherwise(0L).as("is_self"),
          when($"neg" =!= $"anchor" && arrays_overlap($"bands_a", $"bands_b"), 1L)
            .otherwise(0L).as("is_banddup"))
      scored.groupBy($"anchor")
        .agg(count(lit(1)).as("n_proposed"), sum($"is_self").as("n_self"),
          sum($"is_banddup").as("n_banddup"),
          sum(when($"is_self" === 0 && $"is_banddup" === 0, 1L).otherwise(0L))
            .as("n_kept"),
          sum(when($"is_self" === 0 && $"is_banddup" === 0, $"neg").otherwise(0L))
            .as("kept_negsum"))
        .orderBy("anchor")
    }, Some {
      val mhDefs = (0 until 8).map(k => s"${Dedup.minhashSql(k)} AS m$k")
        .mkString(",\n        ")
      val bandsList = (0 until 4).map(b =>
        s"md5(CAST(m${2 * b} AS VARCHAR) || '|' || CAST(m${2 * b + 1} AS VARCHAR))")
        .mkString("[", ", ", "]")
      s"""
      WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS arr FROM documents),
      sh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(arr) - 2, 1) + 1),
        i -> array_to_string(arr[i:i+2], ' '))) AS sh FROM d),
      hst AS (SELECT doc_id, list_distinct(list_transform(sh,
        g -> ('0x' || substr(md5(g), 1, 8))::BIGINT)) AS hs FROM sh),
      mh AS (SELECT doc_id,
        $mhDefs
        FROM hst),
      bk AS (SELECT doc_id, $bandsList AS bands FROM mh),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      uniform AS (SELECT a.doc_id AS anchor, a.bands AS bands_a, j.j,
          ('0x' || substr(md5('neg|' || CAST(a.doc_id AS VARCHAR) || '|' || CAST(j.j AS VARCHAR)), 1, 8))::BIGINT % n.n AS neg
        FROM bk a CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5]) AS j) j CROSS JOIN n),
      hard AS (SELECT x.doc_id AS anchor, bk2.bands AS bands_a, 6 AS j, min(y.doc_id) AS neg
        FROM bk x JOIN bk y ON x.bands[1] = y.bands[1] AND x.doc_id <> y.doc_id
        JOIN bk bk2 ON bk2.doc_id = x.doc_id
        GROUP BY x.doc_id, bk2.bands),
      props AS (SELECT anchor, bands_a, j, neg FROM uniform
        UNION ALL SELECT anchor, bands_a, j, neg FROM hard),
      scored AS (SELECT p.anchor, p.neg,
          CASE WHEN p.neg = p.anchor THEN 1 ELSE 0 END AS is_self,
          CASE WHEN p.neg <> p.anchor
            AND len(list_intersect(p.bands_a, b.bands)) > 0 THEN 1 ELSE 0 END AS is_banddup
        FROM props p JOIN bk b ON b.doc_id = p.neg)
      SELECT anchor, CAST(count(*) AS BIGINT) AS n_proposed,
        CAST(sum(is_self) AS BIGINT) AS n_self,
        CAST(sum(is_banddup) AS BIGINT) AS n_banddup,
        CAST(sum(CASE WHEN is_self = 0 AND is_banddup = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(sum(CASE WHEN is_self = 0 AND is_banddup = 0 THEN neg ELSE 0 END) AS BIGINT) AS kept_negsum
      FROM scored GROUP BY anchor ORDER BY anchor"""
    }),

    // ----- declarative data-quality contract suite ------------------------
    // The Deequ/dbt-test family: a table's ingestion contract evaluated
    // as one row per constraint — completeness, uniqueness, referential
    // integrity, ranges, freshness — each an acceptance fraction in
    // micro units against its threshold, `pass` the decision bit a
    // pipeline gate reads. Every metric is one aggregate (uniqueness is
    // distinct/count; the two FK checks are anti-join counts); the suite
    // is a union of 8 tiny results, so the whole contract costs a
    // constant number of scans regardless of how many constraints it
    // carries per scan-shape. The discount constraint FAILS on this
    // corpus by design of the contract (the generator draws discounts
    // uniformly to 0.10, the contract demands ≤ 0.08 for 99%) — a
    // quality gate that can never fail verifies nothing.
    ("q222_quality_contract", (s: SparkSession, dir: String) => {
      import s.implicits._
      val orders = Tables.t(s, dir, "orders")
      val li = Tables.t(s, dir, "lineitem")
      val cust = Tables.t(s, dir, "customer")
      val docs = Tables.t(s, dir, "documents")
      def c(name: String, metric: DataFrame, threshold: Long): DataFrame =
        metric.select(lit(name).as("check_name"), col("m").as("metric_micro"),
          lit(threshold).as("threshold_micro"),
          when(col("m") >= threshold, 1L).otherwise(0L).as("pass"))
      val suite = Seq(
        c("c1_orders_pk_unique", orders.agg(
          expr("(1000000 * count(DISTINCT o_orderkey)) div count(*)").as("m")), 1000000L),
        c("c2_lineitem_fk_orders", li.join(orders.select($"o_orderkey"),
            li("l_orderkey") === $"o_orderkey", "left_anti")
          .agg(count(lit(1)).as("orphans"))
          .crossJoin(li.agg(count(lit(1)).as("t")))
          .select(expr("(1000000 * (t - orphans)) div t").as("m")), 1000000L),
        c("c3_orders_fk_customer", orders.join(cust.select($"c_custkey"),
            orders("o_custkey") === $"c_custkey", "left_anti")
          .agg(count(lit(1)).as("orphans"))
          .crossJoin(orders.agg(count(lit(1)).as("t")))
          .select(expr("(1000000 * (t - orphans)) div t").as("m")), 1000000L),
        c("c4_quantity_in_1_50", li.agg(expr(
          "(1000000 * sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 1 ELSE 0 END)) div count(*)")
          .as("m")), 1000000L),
        c("c5_discount_le_8pct_99", li.agg(expr(
          "(1000000 * sum(CASE WHEN l_discount <= 0.08 THEN 1 ELSE 0 END)) div count(*)")
          .as("m")), 990000L),
        c("c6_totalprice_positive", orders.agg(expr(
          "(1000000 * sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)) div count(*)")
          .as("m")), 1000000L),
        // CAST tolerates both parquet encodings of o_orderdate (NTZ at
        // some SFs, TIMESTAMP at others — the events-table gotcha)
        c("c7_orders_since_1996", orders.agg(expr(
          "(1000000 * sum(CASE WHEN CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01' THEN 1 ELSE 0 END)) div count(*)")
          .as("m")), 750000L),
        c("c8_docs_nonempty", docs.agg(expr(
          "(1000000 * sum(CASE WHEN n_chars >= 1 THEN 1 ELSE 0 END)) div count(*)")
          .as("m")), 1000000L))
      suite.reduce(_ unionByName _).orderBy("check_name")
    }, Some("""
      SELECT * FROM (
      SELECT 'c1_orders_pk_unique' AS check_name,
        (1000000 * CAST(count(DISTINCT o_orderkey) AS BIGINT)) // CAST(count(*) AS BIGINT) AS metric_micro,
        CAST(1000000 AS BIGINT) AS threshold_micro,
        CAST(CASE WHEN (1000000 * CAST(count(DISTINCT o_orderkey) AS BIGINT)) // CAST(count(*) AS BIGINT) >= 1000000 THEN 1 ELSE 0 END AS BIGINT) AS pass
      FROM orders
      UNION ALL
      SELECT 'c2_lineitem_fk_orders',
        (1000000 * CAST(sum(CASE WHEN o.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)) // CAST(count(*) AS BIGINT),
        1000000,
        CASE WHEN (1000000 * CAST(sum(CASE WHEN o.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)) // CAST(count(*) AS BIGINT) >= 1000000 THEN 1 ELSE 0 END
      FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o ON o.o_orderkey = l.l_orderkey
      UNION ALL
      SELECT 'c3_orders_fk_customer',
        (1000000 * CAST(sum(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)) // CAST(count(*) AS BIGINT),
        1000000,
        CASE WHEN (1000000 * CAST(sum(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)) // CAST(count(*) AS BIGINT) >= 1000000 THEN 1 ELSE 0 END
      FROM orders o2 LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c ON c.c_custkey = o2.o_custkey
      UNION ALL
      SELECT 'c4_quantity_in_1_50',
        (1000000 * CAST(sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 1 ELSE 0 END) AS BIGINT)) // CAST(count(*) AS BIGINT),
        1000000,
        CASE WHEN (1000000 * CAST(sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 1 ELSE 0 END) AS BIGINT)) // CAST(count(*) AS BIGINT) >= 1000000 THEN 1 ELSE 0 END
      FROM lineitem
      UNION ALL
      SELECT 'c5_discount_le_8pct_99',
        (1000000 * CAST(sum(CASE WHEN l_discount <= 0.08 THEN 1 ELSE 0 END) AS BIGINT)) // CAST(count(*) AS BIGINT),
        990000,
        CASE WHEN (1000000 * CAST(sum(CASE WHEN l_discount <= 0.08 THEN 1 ELSE 0 END) AS BIGINT)) // CAST(count(*) AS BIGINT) >= 990000 THEN 1 ELSE 0 END
      FROM lineitem
      UNION ALL
      SELECT 'c6_totalprice_positive',
        (1000000 * CAST(sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS BIGINT)) // CAST(count(*) AS BIGINT),
        1000000,
        CASE WHEN (1000000 * CAST(sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS BIGINT)) // CAST(count(*) AS BIGINT) >= 1000000 THEN 1 ELSE 0 END
      FROM orders
      UNION ALL
      SELECT 'c7_orders_since_1996',
        (1000000 * CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01' THEN 1 ELSE 0 END) AS BIGINT)) // CAST(count(*) AS BIGINT),
        750000,
        CASE WHEN (1000000 * CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01' THEN 1 ELSE 0 END) AS BIGINT)) // CAST(count(*) AS BIGINT) >= 750000 THEN 1 ELSE 0 END
      FROM orders
      UNION ALL
      SELECT 'c8_docs_nonempty',
        (1000000 * CAST(sum(CASE WHEN n_chars >= 1 THEN 1 ELSE 0 END) AS BIGINT)) // CAST(count(*) AS BIGINT),
        1000000,
        CASE WHEN (1000000 * CAST(sum(CASE WHEN n_chars >= 1 THEN 1 ELSE 0 END) AS BIGINT)) // CAST(count(*) AS BIGINT) >= 1000000 THEN 1 ELSE 0 END
      FROM documents
      ) ORDER BY check_name"""))
  )
}
