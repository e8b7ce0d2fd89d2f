package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, TextAnalysis => TA}

/** Round-7 continuation: fingerprint selection, skew-mitigation,
  * profiling-statistics, and curation-policy operators, each with a
  * DuckDB oracle.
  *
  * House rules as elsewhere in the battery: deterministic md5-derived
  * hashes shared verbatim between the Spark plan and the oracle SQL,
  * integer (micro-unit) arithmetic wherever float summation order could
  * diverge between engines, and every aggregate aliased identically on
  * both sides.
  */
object Round7bQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- winnowing fingerprint selection (Schleimer et al. 2003) ------
    // Robust local document fingerprinting: hash every 3-word shingle,
    // slide a w=4 window over consecutive shingle positions, and keep the
    // RIGHTMOST MINIMAL hash of each window. The guarantee: any shared
    // run of >= w+k-1 tokens between two documents shares at least one
    // selected fingerprint, at ~2/(w+1) the storage of full shingling.
    //
    // The rightmost-min selection is one window aggregate: minimizing
    // v = h*M + (M-1-pos) (M = 2^20 > any in-doc position) picks the
    // smallest hash and, among ties, the largest position — both
    // components recovered exactly by div/mod. Everything after the
    // explode is partition-local to the doc (one shuffle on doc_id for
    // the window sort, no joins), so 100 TB costs one pass; the selected
    // fingerprints are the compact join key a downstream plagiarism /
    // near-dup stage would bucket on.
    ("q174_winnowing", (s: SparkSession, dir: String) => {
      import s.implicits._
      val W = 4; val M = 1048576L
      val grams = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", split(TA.normText($"text"), " ").as("a"))
        .filter(size($"a") >= W + 2) // need >= W shingles for one full window
        .select($"doc_id", (size($"a") - 2).cast("long").as("m"),
          explode(expr("sequence(1, size(a) - 2)")).as("j"), $"a")
        .select($"doc_id", $"m", $"j",
          conv(substring(md5(expr("array_join(slice(a, j, 3), ' ')")), 1, 8), 16, 10)
            .cast("long").as("h"))
      val frame = Window.partitionBy($"doc_id").orderBy($"j")
        .rowsBetween(Window.currentRow, W - 1)
      grams
        .withColumn("vmin", min($"h" * M + (lit(M - 1) - $"j")).over(frame))
        .withColumn("cnt", count(lit(1)).over(frame))
        .filter($"cnt" === W) // full windows only
        .select($"doc_id", $"m",
          expr(s"vmin div $M").as("selh"),
          (lit(M - 1) - ($"vmin" % M)).as("selpos"))
        .distinct()
        .groupBy($"doc_id", $"m")
        .agg(count(lit(1)).as("n_fp"), sum($"selh").as("fp_hash_sum"))
        .select($"doc_id", $"m".as("n_grams"), $"n_fp", $"fp_hash_sum",
          expr("(1000000 * n_fp) div m").as("fp_density_micro"))
        .orderBy($"doc_id")
    }, Some(s"""
      WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS a FROM documents),
      g AS (SELECT doc_id, CAST(len(a) - 2 AS BIGINT) AS m, j,
          ('0x' || substr(md5(array_to_string(list_slice(a, CAST(j AS INT), CAST(j + 2 AS INT)), ' ')), 1, 8))::BIGINT AS h
        FROM base, unnest(range(1, len(a) - 1)) AS t(j) WHERE len(a) >= 6),
      wv AS (SELECT doc_id, m,
          min(h * 1048576 + (1048575 - j)) OVER fr AS vmin,
          count(*) OVER fr AS cnt
        FROM g WINDOW fr AS (PARTITION BY doc_id ORDER BY j ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
      sel AS (SELECT DISTINCT doc_id, m, vmin // 1048576 AS selh,
          1048575 - (vmin % 1048576) AS selpos
        FROM wv WHERE cnt = 4)
      SELECT doc_id, m AS n_grams, CAST(count(*) AS BIGINT) AS n_fp,
        CAST(sum(selh) AS BIGINT) AS fp_hash_sum,
        CAST((1000000 * count(*)) // m AS BIGINT) AS fp_density_micro
      FROM sel GROUP BY doc_id, m ORDER BY doc_id""")),

    // ----- cross-source duplicate leakage matrix ------------------------
    // Inter-source contamination audit: how many duplicate PAIRS connect
    // each (source_a, source_b) — the full source×source matrix, where
    // q108's screen is one benchmark vs one corpus. Clusters come from
    // the 10-token-prefix blocking key; per-cluster per-source counts are
    // one aggregate, and the pair matrix is a self-join ON THE CLUSTER
    // KEY — cluster-sized groups, never a corpus-scale cross join. The
    // combinatorics stay integer-exact: n_a·n_b across sources,
    // n·(n-1)/2 within one. At 100 TB the cluster-count table is orders
    // of magnitude smaller than the corpus, so the matrix is nearly free
    // once the blocking aggregate is paid.
    ("q175_source_leakage", (s: SparkSession, dir: String) => {
      import s.implicits._
      val cs = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source",
          md5(array_join(slice(split(TA.normText($"text"), " "), 1, 10), " ")).as("ck"))
        .groupBy($"ck", $"source").agg(count(lit(1)).as("n"))
      val a = cs.select($"ck", $"source".as("source_a"), $"n".as("na"))
      val b = cs.select($"ck", $"source".as("source_b"), $"n".as("nb"))
      a.join(b, Seq("ck"))
        .filter($"source_a" < $"source_b" ||
          ($"source_a" === $"source_b" && $"na" > 1))
        .select($"ck", $"source_a", $"source_b",
          when($"source_a" === $"source_b", expr("na * (na - 1) div 2"))
            .otherwise($"na" * $"nb").as("pairs"))
        .groupBy($"source_a", $"source_b")
        .agg(sum($"pairs").as("n_pairs"), countDistinct($"ck").as("n_clusters"))
        .orderBy($"source_a", $"source_b")
    }, Some(s"""
      WITH pk AS (SELECT doc_id, source,
          md5(array_to_string(list_slice(string_split($normSql, ' '), 1, 10), ' ')) AS ck
        FROM documents),
      cs AS (SELECT ck, source, CAST(count(*) AS BIGINT) AS n FROM pk GROUP BY 1, 2)
      SELECT a.source AS source_a, b.source AS source_b,
        CAST(sum(CASE WHEN a.source = b.source THEN a.n * (a.n - 1) // 2
          ELSE a.n * b.n END) AS BIGINT) AS n_pairs,
        CAST(count(DISTINCT a.ck) AS BIGINT) AS n_clusters
      FROM cs a JOIN cs b ON a.ck = b.ck
        AND (a.source < b.source OR (a.source = b.source AND a.n > 1))
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ----- functional-dependency discovery (schema profiling) -----------
    // Metanome-style FD audit: does LHS determine RHS? For each candidate
    // dependency, one two-phase aggregate — group by LHS, count distinct
    // RHS — then a scalar rollup: how many LHS groups exist, how many
    // violate (|RHS|>1), the worst fan-out, and the violation rate in
    // micro units. Each audit scans exactly two columns (pruned at the
    // parquet reader) with map-side partials, so the candidate set can be
    // widened linearly at 100 TB; there are no joins at all. Violation
    // counts are the repair-cost signal a schema-inference or
    // normalization pass acts on.
    ("q176_fd_discovery", (s: SparkSession, dir: String) => {
      import s.implicits._
      def audit(df: DataFrame, fd: String, lhs: String, rhs: String): DataFrame =
        df.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("rhs_card"))
          .agg(count(lit(1)).as("lhs_groups"),
            sum(when($"rhs_card" > 1, 1L).otherwise(0L)).as("violating_groups"),
            max($"rhs_card").as("max_rhs_card"))
          .select(lit(fd).as("fd"), $"lhs_groups", $"violating_groups",
            $"max_rhs_card",
            expr("(1000000 * violating_groups) div lhs_groups").as("violation_micro"))
      val part = Tables.t(s, dir, "part")
      audit(part, "part: p_brand -> p_type", "p_brand", "p_type")
        .unionByName(audit(part, "part: p_partkey -> p_brand", "p_partkey", "p_brand"))
        .unionByName(audit(Tables.t(s, dir, "customer"),
          "customer: c_nationkey -> c_mktsegment", "c_nationkey", "c_mktsegment"))
        .unionByName(audit(Tables.t(s, dir, "orders"),
          "orders: o_orderstatus -> o_orderpriority", "o_orderstatus", "o_orderpriority"))
        .orderBy($"fd")
    }, Some("""
      WITH
      f1 AS (SELECT 'part: p_brand -> p_type' AS fd, g.* FROM (
        SELECT CAST(count(*) AS BIGINT) AS lhs_groups,
          CAST(sum(CASE WHEN rhs_card > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
          CAST(max(rhs_card) AS BIGINT) AS max_rhs_card,
          (1000000 * CAST(sum(CASE WHEN rhs_card > 1 THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS violation_micro
        FROM (SELECT p_brand, count(DISTINCT p_type) AS rhs_card FROM part GROUP BY 1)) g),
      f2 AS (SELECT 'part: p_partkey -> p_brand' AS fd, g.* FROM (
        SELECT CAST(count(*) AS BIGINT) AS lhs_groups,
          CAST(sum(CASE WHEN rhs_card > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
          CAST(max(rhs_card) AS BIGINT) AS max_rhs_card,
          (1000000 * CAST(sum(CASE WHEN rhs_card > 1 THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS violation_micro
        FROM (SELECT p_partkey, count(DISTINCT p_brand) AS rhs_card FROM part GROUP BY 1)) g),
      f3 AS (SELECT 'customer: c_nationkey -> c_mktsegment' AS fd, g.* FROM (
        SELECT CAST(count(*) AS BIGINT) AS lhs_groups,
          CAST(sum(CASE WHEN rhs_card > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
          CAST(max(rhs_card) AS BIGINT) AS max_rhs_card,
          (1000000 * CAST(sum(CASE WHEN rhs_card > 1 THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS violation_micro
        FROM (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS rhs_card FROM customer GROUP BY 1)) g),
      f4 AS (SELECT 'orders: o_orderstatus -> o_orderpriority' AS fd, g.* FROM (
        SELECT CAST(count(*) AS BIGINT) AS lhs_groups,
          CAST(sum(CASE WHEN rhs_card > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
          CAST(max(rhs_card) AS BIGINT) AS max_rhs_card,
          (1000000 * CAST(sum(CASE WHEN rhs_card > 1 THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS violation_micro
        FROM (SELECT o_orderstatus, count(DISTINCT o_orderpriority) AS rhs_card FROM orders GROUP BY 1)) g)
      SELECT * FROM f1 UNION ALL SELECT * FROM f2
      UNION ALL SELECT * FROM f3 UNION ALL SELECT * FROM f4
      ORDER BY fd""")),

    // ----- dedup survivor selection (canonicalization policy) -----------
    // Dup clusters keep their BEST member, not an arbitrary one: cluster
    // on the 10-token normalized prefix hash (the boilerplate/near-dup
    // blocking key — full-content md5 is the degenerate exact case) and
    // pick the LONGEST member as canonical (ties → lowest doc_id) — the
    // keep-the-richest-variant policy, vs q137's keep-first. One window
    // rank + one aggregate per cluster key — the same shuffle the dedup
    // groupBy already pays, so the policy is free at 100 TB. bytes_saved
    // quantifies what dropping the non-canonical members reclaims; the
    // (cluster_key → canonical_id) mapping is the lookup a rewrite stage
    // applies.
    ("q177_dedup_survivors", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"n_chars",
          md5(array_join(slice(split(TA.normText($"text"), " "), 1, 10), " ")).as("ck"))
      val rn = row_number().over(
        Window.partitionBy($"ck").orderBy(desc("n_chars"), $"doc_id"))
      d.withColumn("rn", rn)
        .groupBy($"ck")
        .agg(count(lit(1)).as("members"),
          sum($"n_chars").as("bytes_total"),
          max(when($"rn" === 1, $"doc_id")).as("canonical_id"),
          max(when($"rn" === 1, $"n_chars")).as("canonical_chars"))
        .filter($"members" > 1)
        .select($"ck".as("cluster_key"), $"canonical_id", $"members",
          $"bytes_total", ($"bytes_total" - $"canonical_chars").as("bytes_saved"))
        .orderBy($"canonical_id")
    }, Some(s"""
      WITH pk AS (SELECT doc_id, n_chars,
          md5(array_to_string(list_slice(string_split($normSql, ' '), 1, 10), ' ')) AS ck
        FROM documents),
      d AS (SELECT doc_id, n_chars, ck,
          row_number() OVER (PARTITION BY ck
            ORDER BY n_chars DESC, doc_id) AS rn
        FROM pk),
      a AS (SELECT ck, CAST(count(*) AS BIGINT) AS members,
          CAST(sum(n_chars) AS BIGINT) AS bytes_total,
          max(CASE WHEN rn = 1 THEN doc_id END) AS canonical_id,
          max(CASE WHEN rn = 1 THEN n_chars END) AS canonical_chars
        FROM d GROUP BY ck)
      SELECT ck AS cluster_key, canonical_id, members, bytes_total,
        bytes_total - canonical_chars AS bytes_saved
      FROM a WHERE members > 1 ORDER BY canonical_id""")),

    // ----- per-class balanced downsampling (training-set rebalancing) ---
    // Equalize class sizes by downsampling every class to the MINORITY
    // class count: deterministic per-class bottom-k by md5(vec_id) — a
    // seedless uniform sample any engine reproduces bit-for-bit. The
    // class-count aggregate and its min stay in the DAG (broadcast scalar,
    // no driver collect); the per-class rank is one window sort over the
    // class partition. kept_idsum pins the exact selected membership, not
    // just its size.
    ("q178_class_rebalance", (s: SparkSession, dir: String) => {
      import s.implicits._
      val e = Tables.t(s, dir, "embeddings").select($"vec_id", $"label")
      val counts = e.groupBy($"label").agg(count(lit(1)).as("n_orig"))
      val kmin = counts.agg(min($"n_orig").as("kmin"))
      val ranked = e
        .withColumn("h",
          conv(substring(md5($"vec_id".cast("string")), 1, 8), 16, 10).cast("long"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"label").orderBy($"h", $"vec_id")))
      ranked.crossJoin(broadcast(kmin)).filter($"rn" <= $"kmin")
        .groupBy($"label")
        .agg(count(lit(1)).as("n_kept"), sum($"vec_id").as("kept_idsum"))
        .join(counts, Seq("label"))
        .select($"label".cast("long").as("label"), $"n_orig", $"n_kept", $"kept_idsum")
        .orderBy($"label")
    }, Some("""
      WITH c AS (SELECT label, CAST(count(*) AS BIGINT) AS n_orig
        FROM embeddings GROUP BY 1),
      k AS (SELECT min(n_orig) AS kmin FROM c),
      r AS (SELECT label, vec_id, row_number() OVER (PARTITION BY label
          ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT, vec_id) AS rn
        FROM embeddings),
      kept AS (SELECT label, CAST(count(*) AS BIGINT) AS n_kept,
          CAST(sum(vec_id) AS BIGINT) AS kept_idsum
        FROM r, k WHERE rn <= kmin GROUP BY label)
      SELECT CAST(c.label AS BIGINT) AS label, c.n_orig, kept.n_kept, kept.kept_idsum
      FROM c JOIN kept USING (label) ORDER BY label""")),

    // ----- blocking-strategy recall/cost audit --------------------------
    // Candidate-generation engineering: three blockers over the same
    // corpus — 10-token-prefix hash, 64-char length band, and a MinHash
    // LSH band (the q21 pipeline's band 0, same shared permutation
    // template) — and the pair-count breakdown by provenance bitmap:
    // which pairs only ONE blocker finds, which all three agree on. The
    // per-cell counts are exactly the recall-vs-join-cost tradeoff a
    // blocking designer tunes (length banding, notably, buys little
    // unique recall for its quadratic-in-band cost — visible in its
    // exclusive cell). Every blocker is an equi-join on its key; the
    // union dedup is one aggregate on the pair id — no cross joins
    // anywhere, and each doc carries exactly one key per blocker so the
    // per-blocker join emits each pair once.
    ("q179_blocking_recall", (s: SparkSession, dir: String) => {
      import s.implicits._
      val keys = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"n_chars",
          md5(array_join(slice(split(TA.normText($"text"), " "), 1, 10), " ")).as("k_prefix"),
          expr("n_chars div 64").as("k_len"),
          graft.functions.WordShingleHash32(TA.normText($"text"), 3).as("hs"))
        .withColumn("k_band",
          Dedup.bandKey(Seq(Dedup.minhashInt($"hs", 0), Dedup.minhashInt($"hs", 1))))
        .drop("hs").localCheckpoint() // three self-joins read it; hash once
      def bPairs(key: String, fp: Long, fl: Long, fb: Long): DataFrame = {
        val a = keys.select(col(key).as("k"), $"doc_id".as("id_a"))
        val b = keys.select(col(key).as("k"), $"doc_id".as("id_b"))
        a.join(b, Seq("k")).filter($"id_a" < $"id_b")
          .select($"id_a", $"id_b", lit(fp).as("b_prefix"),
            lit(fl).as("b_length"), lit(fb).as("b_band"))
      }
      bPairs("k_prefix", 1, 0, 0)
        .unionByName(bPairs("k_len", 0, 1, 0))
        .unionByName(bPairs("k_band", 0, 0, 1))
        .groupBy($"id_a", $"id_b")
        .agg(max($"b_prefix").as("b_prefix"), max($"b_length").as("b_length"),
          max($"b_band").as("b_band"))
        .groupBy($"b_prefix", $"b_length", $"b_band")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy($"b_prefix", $"b_length", $"b_band")
    }, Some(s"""
      WITH d AS (SELECT doc_id, n_chars, string_split($normSql, ' ') AS arr FROM documents),
      sh AS (SELECT doc_id, n_chars, arr,
          list_distinct(list_transform(range(1, greatest(len(arr) - 2, 1) + 1),
            i -> array_to_string(arr[i:i+2], ' '))) AS shl FROM d),
      hst AS (SELECT doc_id, n_chars, arr,
          list_distinct(list_transform(shl, g -> ('0x' || substr(md5(g), 1, 8))::BIGINT)) AS hs
        FROM sh),
      mh AS (SELECT doc_id, n_chars, arr,
          ${Dedup.minhashSql(0)} AS m0, ${Dedup.minhashSql(1)} AS m1 FROM hst),
      keys AS (SELECT doc_id,
          md5(array_to_string(list_slice(arr, 1, 10), ' ')) AS k_prefix,
          n_chars // 64 AS k_len,
          md5(CAST(m0 AS VARCHAR) || '|' || CAST(m1 AS VARCHAR)) AS k_band
        FROM mh),
      p1 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, 1 AS b_prefix, 0 AS b_length, 0 AS b_band
        FROM keys a JOIN keys b ON a.k_prefix = b.k_prefix AND a.doc_id < b.doc_id),
      p2 AS (SELECT a.doc_id, b.doc_id, 0, 1, 0
        FROM keys a JOIN keys b ON a.k_len = b.k_len AND a.doc_id < b.doc_id),
      p3 AS (SELECT a.doc_id, b.doc_id, 0, 0, 1
        FROM keys a JOIN keys b ON a.k_band = b.k_band AND a.doc_id < b.doc_id),
      u AS (SELECT id_a, id_b, max(b_prefix) AS b_prefix, max(b_length) AS b_length,
          max(b_band) AS b_band
        FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3)
        GROUP BY 1, 2)
      SELECT CAST(b_prefix AS BIGINT) AS b_prefix, CAST(b_length AS BIGINT) AS b_length,
        CAST(b_band AS BIGINT) AS b_band, CAST(count(*) AS BIGINT) AS n_pairs
      FROM u GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // ----- cluster-aware k-fold split (GroupKFold) audit ----------------
    // The near-dup leakage trap in evaluation splits: hashing DOC ids
    // into folds scatters duplicate-cluster members across folds — every
    // scattered pair is train/test contamination. Hashing the CLUSTER key
    // instead keeps whole clusters in one fold, so its leaky-pair count
    // is STRUCTURALLY zero. Both schemes are audited from one per-
    // (cluster, fold) aggregate — leaky pairs = C(n,2) − Σ_fold C(n_f,2),
    // pure combinatorics, no pair enumeration and no joins — so the
    // audit costs one aggregate even when the pair count would be
    // quadratic. The fold_min/max columns show the price of grouping:
    // slightly less balanced folds, bounded by the largest cluster.
    ("q180_grouped_kfold", (s: SparkSession, dir: String) => {
      import s.implicits._
      val K = 5
      val d = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id",
          md5(array_join(slice(split(TA.normText($"text"), " "), 1, 10), " ")).as("ck"))
        .withColumn("fold_doc",
          conv(substring(md5(concat(lit("fd|"), $"doc_id".cast("string"))), 1, 8), 16, 10)
            .cast("long") % K)
        .withColumn("fold_grp",
          conv(substring(md5(concat(lit("fg|"), $"ck")), 1, 8), 16, 10)
            .cast("long") % K)
      def scheme(foldCol: String, name: String): DataFrame = {
        val perCkFold = d.groupBy($"ck", col(foldCol).as("fold"))
          .agg(count(lit(1)).as("nf"))
        val perCk = perCkFold.groupBy($"ck")
          .agg(sum($"nf").as("n"), sum(expr("nf * (nf - 1) div 2")).as("same_pairs"))
        val pairAgg = perCk.agg(
          sum(expr("n * (n - 1) div 2")).as("dup_pairs"),
          sum(expr("n * (n - 1) div 2 - same_pairs")).as("leaky_pairs"))
        val foldAgg = d.groupBy(col(foldCol)).agg(count(lit(1)).as("nd"))
          .agg(min($"nd").as("fold_min_docs"), max($"nd").as("fold_max_docs"))
        pairAgg.crossJoin(foldAgg)
          .select(lit(name).as("scheme"), $"dup_pairs", $"leaky_pairs",
            $"fold_min_docs", $"fold_max_docs")
      }
      scheme("fold_doc", "doc_hash").unionByName(scheme("fold_grp", "group_hash"))
        .orderBy("scheme")
    }, Some {
      def schemeSql(fold: String, name: String): String = s"""
      ${name}_cf AS (SELECT ck, $fold AS fold, count(*) AS nf FROM f GROUP BY 1, 2),
      ${name}_ck AS (SELECT ck, sum(nf) AS n, sum(nf * (nf - 1) // 2) AS same_pairs
        FROM ${name}_cf GROUP BY 1),
      ${name}_p AS (SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) AS dup_pairs,
          CAST(sum(n * (n - 1) // 2 - same_pairs) AS BIGINT) AS leaky_pairs
        FROM ${name}_ck),
      ${name}_f AS (SELECT CAST(min(nd) AS BIGINT) AS fold_min_docs,
          CAST(max(nd) AS BIGINT) AS fold_max_docs
        FROM (SELECT $fold, count(*) AS nd FROM f GROUP BY 1)),
      ${name}_row AS (SELECT '$name' AS scheme, dup_pairs, leaky_pairs,
          fold_min_docs, fold_max_docs FROM ${name}_p, ${name}_f)"""
      s"""
      WITH d AS (SELECT doc_id,
          md5(array_to_string(list_slice(string_split($normSql, ' '), 1, 10), ' ')) AS ck
        FROM documents),
      f AS (SELECT doc_id, ck,
          ('0x' || substr(md5('fd|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 5 AS fold_doc,
          ('0x' || substr(md5('fg|' || ck), 1, 8))::BIGINT % 5 AS fold_grp
        FROM d),
      ${schemeSql("fold_doc", "doc_hash")},
      ${schemeSql("fold_grp", "group_hash")}
      SELECT * FROM doc_hash_row UNION ALL SELECT * FROM group_hash_row
      ORDER BY scheme"""
    }),

    // ----- dedup-deflated token budget ----------------------------------
    // What a source REALLY contributes to a training mix: raw token
    // counts overstate sources full of duplicates, so weight every doc's
    // tokens by 1/cluster_size (uniform survivor probability) and report
    // the deflated budget next to the raw one. Micro-integer division
    // keeps both engines bit-identical. One aggregate for cluster sizes,
    // one equi-join back, one per-source rollup — the mixing-weight
    // planner (q107) would consume eff_tokens_micro instead of raw
    // counts, closing the dedup → mixing loop.
    ("q181_effective_tokens", (s: SparkSession, dir: String) => {
      import s.implicits._
      val nt = TA.normText($"text")
      val t = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"source",
          md5(array_join(slice(split(nt, " "), 1, 10), " ")).as("ck"),
          when(nt === "", 0L).otherwise(size(split(nt, " "))).cast("long").as("tokens"))
      val cs = t.groupBy($"ck").agg(count(lit(1)).as("csize"))
      t.join(cs, Seq("ck"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"tokens").as("raw_tokens"),
          sum(expr("(1000000 * tokens) div csize")).as("eff_tokens_micro"))
        .select($"source", $"n_docs", $"raw_tokens", $"eff_tokens_micro",
          expr("eff_tokens_micro div raw_tokens").as("deflation_micro"))
        .orderBy("source")
    }, Some(s"""
      WITH t AS (SELECT doc_id, source,
          md5(array_to_string(list_slice(string_split($normSql, ' '), 1, 10), ' ')) AS ck,
          CAST(CASE WHEN $normSql = '' THEN 0
            ELSE len(string_split($normSql, ' ')) END AS BIGINT) AS tokens
        FROM documents),
      cs AS (SELECT ck, CAST(count(*) AS BIGINT) AS csize FROM t GROUP BY 1),
      a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(tokens) AS BIGINT) AS raw_tokens,
          CAST(sum((1000000 * tokens) // csize) AS BIGINT) AS eff_tokens_micro
        FROM t JOIN cs USING (ck) GROUP BY 1)
      SELECT source, n_docs, raw_tokens, eff_tokens_micro,
        eff_tokens_micro // raw_tokens AS deflation_micro
      FROM a ORDER BY source"""))
  )
}
