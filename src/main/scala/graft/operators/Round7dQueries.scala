package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Similarity, TextAnalysis => TA}

/** Round-7 continuation: embedding-space curation (semantic dedup,
  * label-noise auditing), training-loader order auditing, and tokenizer
  * economics — each with a DuckDB oracle.
  *
  * House rules as elsewhere: integer-quantized vector math (the q101
  * rule — every product and sum exact in IEEE double at any aggregation
  * order), md5-derived determinism shared verbatim with the oracle,
  * micro-integer outputs near the gate, identical aliases, total ORDER
  * BY.
  */
object Round7dQueries {

  private val normSql = TA.normTextSql
  private val Projs = Similarity.OracleProjs
  private val prepSql = Similarity.prepareSql
  private val bucketSql = Similarity.lshBucketSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- semantic dedup (SemDeDup-style, cell representative) ---------
    // Embedding-space dedup: partition the space into cells (the q26 LSH
    // sign buckets — a k-means cell assignment plugs into the same
    // shape), elect the minimum-id member of each cell as its
    // representative, and drop every other member whose cosine to the
    // representative clears the threshold. Exactly ONE similarity
    // computation per member (vs q26's within-cell pair join): at 100 TB
    // the work is |corpus| dot products after one bucket shuffle, not
    // |cell|² pairs — the SemDeDup economy. Quantized vectors make every
    // dot exact; cosine is one IEEE expression both engines evaluate
    // bit-identically (house ANN rule). kept_idsum pins the surviving
    // membership exactly.
    ("q186_semantic_dedup", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      val b = prepared.withColumn("bucket", Similarity.lshBucket($"qvec", Projs))
      val rep = b.groupBy($"bucket").agg(min($"id").as("rep_id"))
      val rv = rep.join(b.select($"id".as("rep_id"), $"qvec".as("r_vec"), $"n2".as("r_n2")),
        Seq("rep_id"))
      b.join(rv, Seq("bucket"))
        .withColumn("dropped",
          when($"id" =!= $"rep_id" &&
            Similarity.cosine(Similarity.dot($"qvec", $"r_vec"), $"n2", $"r_n2") >= 0.4,
            1L).otherwise(0L))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_members"), sum($"dropped").as("n_dropped"),
          sum(when($"dropped" === 0L, $"id").otherwise(0L)).as("kept_idsum"))
        .select($"bucket".cast("long").as("bucket"), $"n_members", $"n_dropped",
          $"kept_idsum")
        .orderBy($"bucket")
    }, Some(s"""
      WITH $prepSql,
      b AS (SELECT vec_id, qvec, n2, $bucketSql AS bucket FROM n),
      rep AS (SELECT bucket, min(vec_id) AS rep_id FROM b GROUP BY 1),
      rv AS (SELECT r.bucket, r.rep_id, m.qvec AS r_vec, m.n2 AS r_n2
        FROM rep r JOIN b m ON m.vec_id = r.rep_id),
      d AS (SELECT b.bucket, b.vec_id,
          CASE WHEN b.vec_id <> rv.rep_id
            AND list_dot_product(b.qvec, rv.r_vec) / sqrt(b.n2 * rv.r_n2) >= 0.4
            THEN 1 ELSE 0 END AS dropped
        FROM b JOIN rv ON b.bucket = rv.bucket)
      SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_members,
        CAST(sum(dropped) AS BIGINT) AS n_dropped,
        CAST(sum(CASE WHEN dropped = 0 THEN vec_id ELSE 0 END) AS BIGINT) AS kept_idsum
      FROM d GROUP BY bucket ORDER BY bucket""")),

    // ----- kNN label-agreement audit (label-noise detection) ------------
    // Confident-learning-style noise screen: for each probe vector, how
    // many of its 5 nearest neighbors (exact cosine over the full set —
    // the q24 baseline; the LSH/IVF paths swap in at scale) share its
    // label? Per-label agreement totals plus the suspect count
    // (agreement ≤ 1 — the mislabeled-candidate queue a human review
    // would drain). The probe set is fixed-size (vec_id < 50) so the
    // audit costs |probes|·N dots at any corpus size with the probe side
    // broadcast — the same plan shape q24 pins. Integer outputs only.
    ("q187_label_noise", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      val labels = Tables.t(s, dir, "embeddings").select($"vec_id", $"label")
      val knn = Similarity.bruteForceTopK(prepared.filter($"id" < 50), prepared, 5)
      val agree = knn
        .join(labels.select($"vec_id".as("q_id"), $"label".as("p_label")), Seq("q_id"))
        .join(labels.select($"vec_id".as("c_id"), $"label".as("c_label")), Seq("c_id"))
        .groupBy($"q_id", $"p_label")
        .agg(sum(when($"p_label" === $"c_label", 1L).otherwise(0L)).as("agree"))
      agree.groupBy($"p_label")
        .agg(count(lit(1)).as("n_probes"), sum($"agree").as("sum_agree"),
          sum(when($"agree" <= 1L, 1L).otherwise(0L)).as("n_suspect"))
        .select($"p_label".cast("long").as("label"), $"n_probes", $"sum_agree",
          $"n_suspect")
        .orderBy($"label")
    }, Some(s"""
      WITH $prepSql,
      lbl AS (SELECT vec_id, label FROM embeddings),
      q AS (SELECT vec_id AS q_id, qvec AS q_vec, n2 AS q_n2 FROM n WHERE vec_id < 50),
      sc AS (SELECT q.q_id, c.vec_id AS c_id,
          row_number() OVER (PARTITION BY q.q_id
            ORDER BY list_dot_product(q.q_vec, c.qvec) / sqrt(q.q_n2 * c.n2) DESC,
              c.vec_id) AS rank
        FROM q JOIN n c ON c.vec_id <> q.q_id),
      ag AS (SELECT k.q_id, lp.label AS p_label,
          CAST(sum(CASE WHEN lp.label = lc.label THEN 1 ELSE 0 END) AS BIGINT) AS agree
        FROM sc k JOIN lbl lp ON lp.vec_id = k.q_id
        JOIN lbl lc ON lc.vec_id = k.c_id
        WHERE k.rank <= 5 GROUP BY 1, 2)
      SELECT CAST(p_label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_probes,
        CAST(sum(agree) AS BIGINT) AS sum_agree,
        CAST(sum(CASE WHEN agree <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect
      FROM ag GROUP BY 1 ORDER BY 1""")),

    // ----- epoch-shuffle decorrelation audit ----------------------------
    // The training-loader order check: a seedless md5 permutation per
    // epoch (order by md5('e<epoch>|<id>')) must DECORRELATE between
    // epochs, or the loader replays the same curriculum every pass.
    // Permutations are per-shard (doc_id div 64 — the unit a real loader
    // shuffles within), so every rank window parallelizes across shards
    // and no global sort exists at any corpus size. The audit statistic
    // is Spearman's footrule Σ|r₀−r₁|, whose expectation for independent
    // permutations is Σ(n_s²−1)/3 ≈ Σn_s²/3 — ratio_micro ≈ 1e6 is the
    // pass signal, ~0 would mean the epochs replay. All integer.
    ("q188_epoch_shuffle", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", expr("doc_id div 64").as("shard"),
          conv(substring(md5(concat(lit("e0|"), $"doc_id".cast("string"))), 1, 8), 16, 10)
            .cast("long").as("h0"),
          conv(substring(md5(concat(lit("e1|"), $"doc_id".cast("string"))), 1, 8), 16, 10)
            .cast("long").as("h1"))
      val r = d
        .withColumn("r0", row_number().over(
          Window.partitionBy($"shard").orderBy($"h0", $"doc_id")))
        .withColumn("r1", row_number().over(
          Window.partitionBy($"shard").orderBy($"h1", $"doc_id")))
      val perShard = r.groupBy($"shard")
        .agg(count(lit(1)).as("ns"),
          sum(abs($"r0" - $"r1")).as("footrule"))
      perShard.agg(
          sum($"ns").as("n_docs"), count(lit(1)).as("n_shards"),
          sum($"footrule").as("footrule_sum"),
          sum($"ns" * $"ns").as("sum_ns2"))
        .select($"n_docs", $"n_shards", $"footrule_sum", $"sum_ns2",
          expr("(3000000 * footrule_sum) div sum_ns2").as("ratio_micro"))
    }, Some("""
      WITH d AS (SELECT doc_id, doc_id // 64 AS shard,
          ('0x' || substr(md5('e0|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h0,
          ('0x' || substr(md5('e1|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h1
        FROM documents),
      r AS (SELECT shard,
          row_number() OVER (PARTITION BY shard ORDER BY h0, doc_id) AS r0,
          row_number() OVER (PARTITION BY shard ORDER BY h1, doc_id) AS r1
        FROM d),
      ps AS (SELECT shard, CAST(count(*) AS BIGINT) AS ns,
          CAST(sum(abs(r0 - r1)) AS BIGINT) AS footrule
        FROM r GROUP BY 1)
      SELECT CAST(sum(ns) AS BIGINT) AS n_docs, CAST(count(*) AS BIGINT) AS n_shards,
        CAST(sum(footrule) AS BIGINT) AS footrule_sum,
        CAST(sum(ns * ns) AS BIGINT) AS sum_ns2,
        CAST((3000000 * CAST(sum(footrule) AS BIGINT)) // CAST(sum(ns * ns) AS BIGINT) AS BIGINT) AS ratio_micro
      FROM ps""")),

    // ----- tokenizer fertility (tokens-per-word economics) ---------------
    // The cost model a tokenizer choice sets: BPE-ish tokens per
    // whitespace word ("fertility") and characters per BPE token, per
    // source — the statistics that price a corpus in compute before any
    // training run. Pure map + one aggregate (both token counters are
    // single-pass regex/char kernels); micro-integer ratios at the gate.
    ("q189_tokenizer_fertility", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", TA.wsTokenCount($"text").cast("long").as("ws"),
          TA.bpeTokenCount($"text").cast("long").as("bpe"),
          length($"text").cast("long").as("chars"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"ws").as("ws_tokens"),
          sum($"bpe").as("bpe_tokens"), sum($"chars").as("n_chars"))
        .select($"source", $"n_docs", $"ws_tokens", $"bpe_tokens", $"n_chars",
          expr("(1000000 * bpe_tokens) div ws_tokens").as("fertility_micro"),
          expr("(1000000 * n_chars) div bpe_tokens").as("chars_per_bpe_micro"))
        .orderBy($"source")
    }, Some(s"""
      WITH t AS (SELECT source,
          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws,
          CAST(len(regexp_extract_all(text, '${TA.BpePattern}')) AS BIGINT) AS bpe,
          CAST(length(text) AS BIGINT) AS chars
        FROM documents),
      a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(ws) AS BIGINT) AS ws_tokens, CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
          CAST(sum(chars) AS BIGINT) AS n_chars
        FROM t GROUP BY 1)
      SELECT source, n_docs, ws_tokens, bpe_tokens, n_chars,
        (1000000 * bpe_tokens) // ws_tokens AS fertility_micro,
        (1000000 * n_chars) // bpe_tokens AS chars_per_bpe_micro
      FROM a ORDER BY source"""))
  )
}
