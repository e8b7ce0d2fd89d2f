package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Similarity, TextAnalysis => TA}

/** LLM-training-data pipeline operators (SURVEY §7.1 item 9 / the north
  * star): dedup (exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine), similarity search (brute-force + LSH ANN), text
  * analysis (lang-ID, quality, tokens, fingerprint), multimodal metadata.
  *
  * Oracle strategy: operators whose SQL form needs generated expression
  * pyramids (simhash bit votes, LSH projections) build BOTH the Spark
  * expression and the DuckDB SQL from one template, so the two engines
  * execute the same algorithm by construction.
  */
object ExtQueries {

  /** DuckDB rendering of TextAnalysis.normText. */
  private val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))"""

  type QFn = (SparkSession, String) => DataFrame

  // --- generated SQL fragments (shared shape between engines) -----------

  private def simhashOracle: String = {
    val digits = (1 to 8).map(p => Dedup.md5DigitSql("m", p) + s" AS d$p").mkString(",\n        ")
    val sums = (0 until 32).map(j => Dedup.simhashBitSql(j, "//") + s" AS s$j").mkString(",\n        ")
    val packed = (0 until 32).map(j => s"(CASE WHEN s$j >= 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""
      WITH tk AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents),
      h AS (SELECT doc_id, md5(tok) AS m FROM tk),
      dg AS (SELECT doc_id,
        $digits
        FROM h),
      s AS (SELECT doc_id,
        $sums
        FROM dg GROUP BY doc_id)
      SELECT doc_id, CAST($packed AS BIGINT) AS simhash FROM s ORDER BY doc_id"""
  }

  /** Shared DuckDB CTE chain producing `verified(id_a, id_b, jaccard)` —
    * the MinHash+LSH pipeline (used by q21 and the dedup-apply q41). */
  private[operators] def minhashPairsCte: String = {
    val mhDefs = (0 until 8).map(s => s"${Dedup.minhashSql(s)} AS m$s")
      .mkString(",\n        ")
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band_idx, md5(CAST(m${2 * b} AS VARCHAR) || '|' || CAST(m${2 * b + 1} AS VARCHAR)) AS band_key FROM mh")
      .mkString("\n        UNION ALL ")
    s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS arr FROM documents),
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
        JOIN hst hb ON hb.doc_id = id_b)"""
  }

  private val Projs = Similarity.OracleProjs

  private def projList(p: Seq[Int]): String = Similarity.projListSql(p)

  private def bucketSql: String = Similarity.lshBucketSql

  private val prepSql = Similarity.prepareSql

  val queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- text: token counting ------------------------------------------
    ("q16_text_tokens", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.spread(Tables.t(s, dir, "documents")).select(
          $"doc_id",
          TA.wsTokenCount($"text").as("ws_tokens"),
          TA.bpeTokenCount($"text").cast("long").as("bpe_tokens"),
          length($"text").as("n_chars_calc"))
        .orderBy("doc_id")
    }, Some(s"""
      SELECT doc_id,
        len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '${TA.BpePattern}')) AS BIGINT) AS bpe_tokens,
        length(text) AS n_chars_calc
      FROM documents ORDER BY doc_id""")),

    // ----- text: quality scoring -----------------------------------------
    ("q17_text_quality", (s: SparkSession, dir: String) => {
      import s.implicits._
      val n = length($"text")
      // char-class counts as primitive loops (CharClassCount kernels) —
      // the regex engine per character is scan-path overhead; semantics
      // (incl. multibyte-as-punct) pinned to the regexes in specs
      val alpha = graft.functions.CharClassCounts.alphaCount($"text")
      val punct = graft.functions.CharClassCounts.punctCount($"text")
      val toks = TA.tokens(lower($"text"))
      // stopword hits via the codegen'd join path (score_en), not a
      // per-token interpreted lambda — same counts, corpus-scale shape
      val swHits = col("score_en")
      TA.langScores(Tables.spread(Tables.t(s, dir, "documents")), "doc_id", "text").select(
          $"doc_id",
          n.as("n_chars_calc"),
          (alpha.cast("double") / n).as("alpha_ratio"),
          (punct.cast("double") / n).as("punct_ratio"),
          (swHits.cast("double") / size(toks)).as("stopword_ratio"),
          when(n < 60, "too_short")
            .when(swHits === 0, "no_stopwords")
            .otherwise("ok").as("quality_label"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
        length(text) AS n_chars_calc,
        CAST(len(regexp_extract_all(text, '[a-z]')) AS DOUBLE) / length(text) AS alpha_ratio,
        CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) / length(text) AS punct_ratio,
        CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
          t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
          / len(string_split_regex(trim(lower(text)), '\s+')) AS stopword_ratio,
        CASE WHEN length(text) < 60 THEN 'too_short'
             WHEN len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               t -> t IN ('the','a','of','and','to','in','is'))) = 0 THEN 'no_stopwords'
             ELSE 'ok' END AS quality_label
      FROM documents ORDER BY doc_id""")),

    // ----- text: language ID (stopword-hit heuristic) --------------------
    ("q18_text_langid", (s: SparkSession, dir: String) => {
      import s.implicits._
      val scored = TA.langScores(Tables.spread(Tables.t(s, dir, "documents")), "doc_id", "text")
      val scores = TA.Stopwords.map { case (l, _) => l -> col(s"score_$l") }
      scored.select(
          ($"doc_id" +: scores.map { case (l, c) => c } :+
            TA.langPredict(scores).as("pred_lang") :+ $"lang"): _*)
        .orderBy("doc_id")
    }, Some {
      val scoreSql = TA.Stopwords.map { case (l, ws) =>
        val inList = ws.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t IN ($inList))) AS score_$l"
      }.mkString(",\n        ")
      val langs = TA.Stopwords.map(_._1).sorted
      val maxExpr = s"greatest(${langs.map("score_" + _).mkString(", ")})"
      val chain = langs.map(l => s"WHEN score_$l = $maxExpr THEN '$l'").mkString(" ")
      s"""
      WITH s AS (SELECT doc_id, lang,
        $scoreSql
        FROM documents)
      SELECT doc_id, ${langs.map("score_" + _).mkString(", ")},
        CASE WHEN $maxExpr = 0 THEN 'und' $chain ELSE 'und' END AS pred_lang, lang
      FROM s ORDER BY doc_id"""
    }),

    // ----- text: fingerprinting (md5 + min-shingle-hash) -----------------
    ("q19_text_fingerprint", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.spread(Tables.t(s, dir, "documents")).select(
          $"doc_id",
          TA.fingerprintMd5($"text").as("fp_md5"),
          TA.minShingleHash($"text", 5).as("min_shingle_hash"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH d AS (SELECT doc_id, $normSql AS norm FROM documents),
      a AS (SELECT doc_id, norm, string_split(norm, ' ') AS arr FROM d)
      SELECT doc_id, md5(norm) AS fp_md5,
        list_min(list_transform(range(1, greatest(len(arr) - 4, 1) + 1),
          i -> md5(array_to_string(arr[i:i+4], ' ')))) AS min_shingle_hash
      FROM a ORDER BY doc_id""")),

    // ----- dedup: exact (hash-groupBy over a doubled corpus) -------------
    ("q20_dedup_exact", (s: SparkSession, dir: String) => {
      val docs = Tables.t(s, dir, "documents")
      Dedup.exactDedup(docs.unionByName(docs), "doc_id", "text")
        .orderBy("keep_id")
    }, Some("""
      SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
      FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
      GROUP BY md5(text) ORDER BY keep_id""")),

    // ----- dedup: MinHash + LSH banding + Jaccard verify -----------------
    ("q21_dedup_minhash", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id".as("id"),
          graft.functions.WordShingleHash32(TA.normText($"text"), 3).as("hs"))
      Dedup.minhashLshPairsHashed(docs, nBands = 4, threshold = 0.5)
        .orderBy("id_a", "id_b")
    }, Some(s"""
      $minhashPairsCte
      SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.5
      ORDER BY id_a, id_b""")),

    // ----- dedup: 32-bit SimHash -----------------------------------------
    ("q22_dedup_simhash", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id".as("id"), TA.tokens($"text").as("tokens"))
      Dedup.simhash32(docs).select($"id".as("doc_id"), $"simhash").orderBy("doc_id")
    }, Some(simhashOracle)),

    // ----- dedup: n-gram Jaccard within (lang, length-bucket) blocks -----
    ("q23_dedup_ngram", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents")).select(
        $"doc_id".as("id"),
        concat($"lang", lit("_"), expr("n_chars div 100")).as("bucket"),
        TA.charNgramInts($"text", 3).as("grams"))  // already sorted+distinct
      Dedup.ngramJaccardPairs(docs, threshold = 0.55, broadcastGrams = true)
        .orderBy("id_a", "id_b")
    }, Some("""
      WITH d AS (SELECT doc_id, lang || '_' || (n_chars // 100) AS bucket,
        list_distinct(list_transform(range(1, greatest(length(text) - 2, 1) + 1),
          i -> (CAST(ascii(substr(text, i, 1)) AS BIGINT) * 1114112 + ascii(substr(text, i + 1, 1))) * 1114112 + ascii(substr(text, i + 2, 1)))) AS grams
        FROM documents)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        len(list_intersect(a.grams, b.grams)) / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
      FROM d a JOIN d b USING (bucket)
      WHERE a.doc_id < b.doc_id
        AND len(list_intersect(a.grams, b.grams)) / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.55
      ORDER BY id_a, id_b""")),

    // ----- similarity: brute-force cosine top-k --------------------------
    ("q24_ann_bruteforce", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      Similarity.bruteForceTopK(prepared.filter($"id" % 100 === 0), prepared, k = 5)
        .select($"q_id", $"rank".as("rnk"), $"c_id", $"cos_sim")
        .orderBy("q_id", "rnk")
    }, Some(s"""
      WITH $prepSql,
      q AS (SELECT * FROM n WHERE vec_id % 100 = 0),
      scored AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        list_dot_product(q.qvec, c.qvec) / sqrt(q.n2 * c.n2) AS cos_sim
        FROM n c, q WHERE q.vec_id <> c.vec_id),
      r AS (SELECT q_id, c_id, cos_sim,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk FROM scored)
      SELECT q_id, rnk, c_id, cos_sim FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""")),

    // ----- similarity: LSH-bucketed ANN top-k ----------------------------
    ("q25_ann_lsh", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      Similarity.lshTopK(prepared, col("id") % 100 === 0, Projs, k = 3)
        .select($"q_id", $"rank".as("rnk"), $"c_id", $"cos_sim")
        .orderBy("q_id", "rnk")
    }, Some(s"""
      WITH $prepSql,
      b AS (SELECT vec_id, qvec, n2, $bucketSql AS bucket FROM n),
      q AS (SELECT * FROM b WHERE vec_id % 100 = 0),
      scored AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        list_dot_product(q.qvec, c.qvec) / sqrt(q.n2 * c.n2) AS cos_sim
        FROM b c JOIN q ON c.bucket = q.bucket AND q.vec_id <> c.vec_id),
      r AS (SELECT q_id, c_id, cos_sim,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk FROM scored)
      SELECT q_id, rnk, c_id, cos_sim FROM r WHERE rnk <= 3 ORDER BY q_id, rnk""")),

    // ----- similarity: embedding-cosine near-dup pairs -------------------
    ("q26_embed_neardup", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      Similarity.nearDupPairs(prepared, Projs, threshold = 0.4)
        .orderBy("id_a", "id_b")
    }, Some(s"""
      WITH $prepSql,
      b AS (SELECT vec_id, qvec, n2, $bucketSql AS bucket FROM n)
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
        list_dot_product(a.qvec, c.qvec) / sqrt(a.n2 * c.n2) AS cos_sim
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
      WHERE list_dot_product(a.qvec, c.qvec) / sqrt(a.n2 * c.n2) >= 0.4
      ORDER BY id_a, id_b""")),

    // ----- similarity: multi-probe LSH ANN top-k -------------------------
    ("q34_ann_multiprobe", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      Similarity.lshTopKMultiProbe(prepared, col("id") % 100 === 0, Projs, k = 3)
        .select($"q_id", $"rank".as("rnk"), $"c_id", $"cos_sim")
        .orderBy("q_id", "rnk")
    }, Some(s"""
      WITH $prepSql,
      b AS (SELECT vec_id, qvec, n2, $bucketSql AS bucket FROM n),
      q0 AS (SELECT * FROM b WHERE vec_id % 100 = 0),
      q AS (SELECT xor(bucket, flip) AS bucket, vec_id AS q_id, qvec AS q_vec, n2 AS q_n2
        FROM q0, unnest([0, 1, 2, 4, 8]) AS t(flip)),
      scored AS (SELECT DISTINCT q.q_id, c.vec_id AS c_id,
        list_dot_product(q.q_vec, c.qvec) / sqrt(q.q_n2 * c.n2) AS cos_sim
        FROM b c JOIN q ON c.bucket = q.bucket AND q.q_id <> c.vec_id),
      r AS (SELECT q_id, c_id, cos_sim,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk FROM scored)
      SELECT q_id, rnk, c_id, cos_sim FROM r WHERE rnk <= 3 ORDER BY q_id, rnk""")),

    // ----- similarity: IVF-partitioned ANN top-k -------------------------
    ("q33_ann_ivf", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      Similarity.ivfTopK(prepared, col("id") % 50 === 0, col("id") % 100 === 0, k = 3)
        .select($"q_id", $"rank".as("rnk"), $"c_id", $"cos_sim")
        .orderBy("q_id", "rnk")
    }, Some(s"""
      WITH $prepSql,
      cent AS (SELECT vec_id AS cent_id, qvec AS cent_vec, n2 AS cent_n2
        FROM n WHERE vec_id % 50 = 0),
      scored0 AS (SELECT n.vec_id, n.qvec, n.n2, cent.cent_id,
        list_dot_product(n.qvec, cent.cent_vec) / sqrt(n.n2 * cent.cent_n2) AS cent_cos
        FROM n, cent),
      assigned AS (SELECT vec_id, qvec, n2, cent_id AS cluster_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS r
        FROM scored0) WHERE r = 1),
      q AS (SELECT cluster_id, vec_id AS q_id, qvec AS q_vec, n2 AS q_n2
        FROM assigned WHERE vec_id % 100 = 0),
      scored AS (SELECT q.q_id, c.vec_id AS c_id,
        list_dot_product(q.q_vec, c.qvec) / sqrt(q.q_n2 * c.n2) AS cos_sim
        FROM assigned c JOIN q ON c.cluster_id = q.cluster_id AND q.q_id <> c.vec_id),
      r AS (SELECT q_id, c_id, cos_sim,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk FROM scored)
      SELECT q_id, rnk, c_id, cos_sim FROM r WHERE rnk <= 3 ORDER BY q_id, rnk""")),

    // ----- similarity: IVF multi-probe (nprobe=2) ANN top-k --------------
    ("q112_ann_ivf_multiprobe", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      Similarity.ivfTopKMultiProbe(prepared, col("id") % 50 === 0, nprobe = 2,
        queryPred = col("id") % 100 === 0, k = 3)
        .select($"q_id", $"rank".as("rnk"), $"c_id", $"cos_sim")
        .orderBy("q_id", "rnk")
    }, Some(s"""
      WITH $prepSql,
      cent AS (SELECT vec_id AS cent_id, qvec AS cent_vec, n2 AS cent_n2
        FROM n WHERE vec_id % 50 = 0),
      scored0 AS (SELECT n.vec_id, n.qvec, n.n2, cent.cent_id,
        list_dot_product(n.qvec, cent.cent_vec) / sqrt(n.n2 * cent.cent_n2) AS cent_cos
        FROM n, cent),
      assigned AS (SELECT vec_id, qvec, n2, cent_id AS cluster_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS r
        FROM scored0) WHERE r = 1),
      probes AS (SELECT cent_id AS cluster_id, vec_id AS q_id, qvec AS q_vec, n2 AS q_n2 FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS r
        FROM scored0 WHERE vec_id % 100 = 0) WHERE r <= 2),
      scored AS (SELECT p.q_id, c.vec_id AS c_id,
        list_dot_product(p.q_vec, c.qvec) / sqrt(p.q_n2 * c.n2) AS cos_sim
        FROM assigned c JOIN probes p ON c.cluster_id = p.cluster_id AND p.q_id <> c.vec_id),
      r AS (SELECT q_id, c_id, cos_sim,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk FROM scored)
      SELECT q_id, rnk, c_id, cos_sim FROM r WHERE rnk <= 3 ORDER BY q_id, rnk""")),

    // ----- similarity: k-means-trained IVF ANN top-k ---------------------
    ("q47_ann_ivf_kmeans", (s: SparkSession, dir: String) => {
      import s.implicits._
      // cached: every Lloyd pass + the final assignment re-scans it
      val prepared = Similarity.prepare(Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
        .cache()
      Similarity.ivfTopKKmeans(prepared, col("id") % 250 === 0, iters = 2,
        queryPred = col("id") % 100 === 0, k = 3)
        .select($"q_id", $"rank".as("rnk"), $"c_id", $"cos_sim")
        .orderBy("q_id", "rnk")
    }, Some {
      // Lloyd iterations unrolled from the same template the Spark side
      // executes: assign (max cosine, ties to lowest centroid id) →
      // per-dimension ROUNDED mean (centroids stay integer-valued, so
      // every product/sum below is exact and engine-independent).
      def iter(i: Int): String = s"""
      a$i AS (SELECT vec_id, qvec, n2, cent_id AS cluster_id FROM (
        SELECT n.vec_id, n.qvec, n.n2, c.cent_id,
          row_number() OVER (PARTITION BY n.vec_id ORDER BY
            list_dot_product(n.qvec, c.cvec) / sqrt(n.n2 * c.cn2) DESC, c.cent_id) AS r
        FROM n, c${i - 1} c) WHERE r = 1),
      m$i AS (SELECT cluster_id, pos, round(sum(v) / count(*)) AS m FROM (
        SELECT cluster_id, unnest(qvec) AS v, unnest(range(1, len(qvec) + 1)) AS pos FROM a$i)
        GROUP BY cluster_id, pos),
      c$i AS (SELECT cent_id, cvec, list_dot_product(cvec, cvec) AS cn2 FROM (
        SELECT cluster_id AS cent_id, list(m ORDER BY pos) AS cvec FROM m$i GROUP BY cluster_id))"""
      s"""
      WITH $prepSql,
      c0 AS (SELECT vec_id AS cent_id, qvec AS cvec, n2 AS cn2 FROM n WHERE vec_id % 250 = 0),
      ${iter(1)},
      ${iter(2)},
      afin AS (SELECT vec_id, qvec, n2, cent_id AS cluster_id FROM (
        SELECT n.vec_id, n.qvec, n.n2, c.cent_id,
          row_number() OVER (PARTITION BY n.vec_id ORDER BY
            list_dot_product(n.qvec, c.cvec) / sqrt(n.n2 * c.cn2) DESC, c.cent_id) AS r
        FROM n, c2 c) WHERE r = 1),
      q AS (SELECT cluster_id, vec_id AS q_id, qvec AS q_vec, n2 AS q_n2
        FROM afin WHERE vec_id % 100 = 0),
      scored AS (SELECT q.q_id, c.vec_id AS c_id,
        list_dot_product(q.q_vec, c.qvec) / sqrt(q.q_n2 * c.n2) AS cos_sim
        FROM afin c JOIN q ON c.cluster_id = q.cluster_id AND q.q_id <> c.vec_id),
      r AS (SELECT q_id, c_id, cos_sim,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk FROM scored)
      SELECT q_id, rnk, c_id, cos_sim FROM r WHERE rnk <= 3 ORDER BY q_id, rnk"""
    }),

    // ----- similarity: k-means IVF, multi-probe (nprobe=2) ---------------
    ("q113_ann_ivf_kmeans_multiprobe", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
        .cache()
      Similarity.ivfTopKKmeans(prepared, col("id") % 50 === 0, iters = 2,
        queryPred = col("id") % 100 === 0, k = 3, nprobe = 2)
        .select($"q_id", $"rank".as("rnk"), $"c_id", $"cos_sim")
        .orderBy("q_id", "rnk")
    }, Some {
      // q47's Lloyd template (finer init: ~10 cells) + a probes CTE that
      // ranks each query's trained-centroid scores and keeps the top 2
      def iter(i: Int): String = s"""
      a$i AS (SELECT vec_id, qvec, n2, cent_id AS cluster_id FROM (
        SELECT n.vec_id, n.qvec, n.n2, c.cent_id,
          row_number() OVER (PARTITION BY n.vec_id ORDER BY
            list_dot_product(n.qvec, c.cvec) / sqrt(n.n2 * c.cn2) DESC, c.cent_id) AS r
        FROM n, c${i - 1} c) WHERE r = 1),
      m$i AS (SELECT cluster_id, pos, round(sum(v) / count(*)) AS m FROM (
        SELECT cluster_id, unnest(qvec) AS v, unnest(range(1, len(qvec) + 1)) AS pos FROM a$i)
        GROUP BY cluster_id, pos),
      c$i AS (SELECT cent_id, cvec, list_dot_product(cvec, cvec) AS cn2 FROM (
        SELECT cluster_id AS cent_id, list(m ORDER BY pos) AS cvec FROM m$i GROUP BY cluster_id))"""
      s"""
      WITH $prepSql,
      c0 AS (SELECT vec_id AS cent_id, qvec AS cvec, n2 AS cn2 FROM n WHERE vec_id % 50 = 0),
      ${iter(1)},
      ${iter(2)},
      afin AS (SELECT vec_id, qvec, n2, cent_id AS cluster_id FROM (
        SELECT n.vec_id, n.qvec, n.n2, c.cent_id,
          row_number() OVER (PARTITION BY n.vec_id ORDER BY
            list_dot_product(n.qvec, c.cvec) / sqrt(n.n2 * c.cn2) DESC, c.cent_id) AS r
        FROM n, c2 c) WHERE r = 1),
      probes AS (SELECT cent_id AS cluster_id, vec_id AS q_id, qvec AS q_vec, n2 AS q_n2 FROM (
        SELECT n.vec_id, n.qvec, n.n2, c.cent_id,
          row_number() OVER (PARTITION BY n.vec_id ORDER BY
            list_dot_product(n.qvec, c.cvec) / sqrt(n.n2 * c.cn2) DESC, c.cent_id) AS r
        FROM n, c2 c WHERE n.vec_id % 100 = 0) WHERE r <= 2),
      scored AS (SELECT p.q_id, c.vec_id AS c_id,
        list_dot_product(p.q_vec, c.qvec) / sqrt(p.q_n2 * c.n2) AS cos_sim
        FROM afin c JOIN probes p ON c.cluster_id = p.cluster_id AND p.q_id <> c.vec_id),
      r AS (SELECT q_id, c_id, cos_sim,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk FROM scored)
      SELECT q_id, rnk, c_id, cos_sim FROM r WHERE rnk <= 3 ORDER BY q_id, rnk"""
    }),

    // ----- multimodal: binary payload + typed metadata -------------------
    ("q27_multimodal_meta", (s: SparkSession, dir: String) => {
      import s.implicits._
      // hex only the 8-char payload head — hexing the full payload would
      // double-materialize every document for 16 output characters
      val hhx = "lower(hex(encode(substring(text, 1, 8), 'UTF-8')))"
      val d = (p: Int) => expr(s"instr('0123456789abcdef', substr($hhx, $p, 1)) - 1")
      Tables.spread(Tables.t(s, dir, "documents")).select(
          $"doc_id",
          expr("octet_length(encode(text, 'UTF-8'))").as("n_bytes"),
          md5($"text").as("payload_md5"),
          expr(s"substr($hhx, 1, 16)").as("head_hex"),
          ceil(expr("octet_length(encode(text, 'UTF-8'))") / lit(64.0)).cast("long").as("chunk_count"),
          (lit(32) + (d(1) * 16 + d(2)) % 64).as("fake_w"),
          (lit(32) + (d(3) * 16 + d(4)) % 64).as("fake_h"))
        .orderBy("doc_id")
    }, Some("""
      WITH d AS (SELECT doc_id, text, lower(hex(encode(substr(text, 1, 8)))) AS hx FROM documents)
      SELECT doc_id,
        octet_length(encode(text)) AS n_bytes,
        md5(text) AS payload_md5,
        substr(hx, 1, 16) AS head_hex,
        CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS chunk_count,
        32 + ((instr('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(hx, 2, 1)) - 1)) % 64 AS fake_w,
        32 + ((instr('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(hx, 4, 1)) - 1)) % 64 AS fake_h
      FROM d ORDER BY doc_id""")),

    // ----- dedup: apply — materialize the deduplicated corpus ------------
    ("q41_dedup_apply", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
      val shingled = docs.select($"doc_id".as("id"),
        graft.functions.WordShingleHash32(TA.normText($"text"), 3).as("hs"))
      // drop the higher-id member of every near-dup pair, keep the rest
      val dropIds = Dedup.minhashLshPairsHashed(shingled, nBands = 4, threshold = 0.5)
        .select($"id_b".as("doc_id")).distinct()
      docs.join(dropIds, Seq("doc_id"), "left_anti")
        .select($"doc_id", $"lang")
        .orderBy("doc_id")
    }, Some(s"""
      $minhashPairsCte
      SELECT doc_id, lang FROM documents
      WHERE doc_id NOT IN (SELECT id_b FROM verified WHERE jaccard >= 0.5)
      ORDER BY doc_id""")),

    // ----- sampling: deterministic per-stratum hash sampling -------------
    ("q42_stratified_sample", (s: SparkSession, dir: String) => {
      import s.implicits._
      // hash-gate in [0, 65536): en keeps ~10%, other languages ~50% —
      // reproducible across engines/runs/partitionings (no RNG)
      val gate = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10).cast("long")
      Tables.spread(Tables.t(s, dir, "documents"))
        .filter(gate < when($"lang" === "en", 6554L).otherwise(32768L))
        .select($"doc_id", $"lang")
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id, lang FROM documents
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
            < CASE WHEN lang = 'en' THEN 6554 ELSE 32768 END
      ORDER BY doc_id""")),

    // ----- token statistics: per-language distribution -------------------
    ("q43_token_stats", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.spread(Tables.t(s, dir, "documents"))
        .select($"lang", TA.wsTokenCount($"text").as("ws_tokens"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          min($"ws_tokens").cast("long").as("min_tokens"),
          max($"ws_tokens").cast("long").as("max_tokens"),
          expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ws_tokens) AS BIGINT)").as("p50_tokens"),
          expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY ws_tokens) AS BIGINT)").as("p90_tokens"))
        .orderBy("lang")
    }, Some("""
      WITH t AS (SELECT lang, len(string_split_regex(trim(text), '\s+')) AS ws_tokens FROM documents)
      SELECT lang, count(*) AS n_docs,
        CAST(min(ws_tokens) AS BIGINT) AS min_tokens,
        CAST(max(ws_tokens) AS BIGINT) AS max_tokens,
        CAST(quantile_disc(ws_tokens, 0.5) AS BIGINT) AS p50_tokens,
        CAST(quantile_disc(ws_tokens, 0.9) AS BIGINT) AS p90_tokens
      FROM t GROUP BY lang ORDER BY lang""")),

    // ----- near-dup: edit distance within blocks -------------------------
    ("q44_edit_distance", (s: SparkSession, dir: String) => {
      import s.implicits._
      // same blocking discipline as the other pair operators; levenshtein
      // is exact integer — engine-identical by definition
      val d = Tables.spread(Tables.t(s, dir, "documents"))
        .filter($"n_chars" < 120)
        .select($"doc_id", concat($"lang", lit("_"), expr("n_chars div 40")).as("bucket"), $"text")
      val l = d.select($"bucket", $"doc_id".as("id_a"), $"text".as("t_a"))
      val r = d.select($"bucket", $"doc_id".as("id_b"), $"text".as("t_b"))
      l.join(r, Seq("bucket"))
        .filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b", levenshtein($"t_a", $"t_b").as("edit_dist"))
        .filter($"edit_dist" <= 45)
        .orderBy("id_a", "id_b")
    }, Some("""
      WITH d AS (SELECT doc_id, lang || '_' || (n_chars // 40) AS bucket, text
        FROM documents WHERE n_chars < 120)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        levenshtein(a.text, b.text) AS edit_dist
      FROM d a JOIN d b USING (bucket)
      WHERE a.doc_id < b.doc_id AND levenshtein(a.text, b.text) <= 45
      ORDER BY id_a, id_b""")),

    // ----- as-of join: each event ↔ the user's latest prior order --------
    ("q45_asof_join", (s: SparkSession, dir: String) => {
      import s.implicits._
      // Composed from built-ins (SURVEY §7.3 preference (a)): range-join
      // on (key, time ≤ t) then keep the latest match per event. At scale
      // the join is an equi-join on the key with AQE handling size; the
      // per-event top-1 is a windowed rank over the matches.
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.t(s, dir, "events")
        .filter($"event_id" < 2000)
        .select($"event_id", $"user_id", date_trunc("second", $"ts").as("tsec"))
      val orders = Tables.t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_orderdate")
      val w = Window.partitionBy($"event_id").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      ev.join(orders, $"user_id" === $"o_custkey" && $"o_orderdate" <= $"tsec", "left")
        .withColumn("__r", row_number().over(w))
        .filter($"__r" === 1)
        .select($"event_id", $"user_id", $"o_orderkey".as("latest_orderkey"),
          $"o_orderdate".as("latest_orderdate"))
        .orderBy("event_id")
    }, Some("""
      WITH ev AS (SELECT event_id, user_id, date_trunc('second', ts) AS tsec
        FROM events WHERE event_id < 2000),
      m AS (SELECT ev.event_id, ev.user_id, o.o_orderkey, o.o_orderdate,
        row_number() OVER (PARTITION BY ev.event_id
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS r
        FROM ev LEFT JOIN orders o
          ON ev.user_id = o.o_custkey AND o.o_orderdate <= ev.tsec)
      SELECT event_id, user_id, o_orderkey AS latest_orderkey,
             o_orderdate AS latest_orderdate
      FROM m WHERE r = 1 ORDER BY event_id""")),

    // ----- events: gap-based sessionization ------------------------------
    ("q28_sessionize", (s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.t(s, dir, "events")
        .select($"user_id", $"event_id", unix_timestamp(date_trunc("second", $"ts")).as("tsec"))
      val w = Window.partitionBy($"user_id").orderBy($"tsec", $"event_id")
      val flagged = ev.withColumn("new_sess",
        when(lag($"tsec", 1).over(w).isNull || $"tsec" - lag($"tsec", 1).over(w) > 1800, 1L)
          .otherwise(0L))
      flagged.groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), sum($"new_sess").as("n_sessions"))
        .orderBy("user_id")
    }, Some("""
      WITH e AS (SELECT user_id, event_id,
        CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec FROM events),
      f AS (SELECT user_id,
        CASE WHEN lag(tsec) OVER (PARTITION BY user_id ORDER BY tsec, event_id) IS NULL
               OR tsec - lag(tsec) OVER (PARTITION BY user_id ORDER BY tsec, event_id) > 1800
             THEN 1 ELSE 0 END AS new_sess
        FROM e)
      SELECT user_id, count(*) AS n_events, CAST(sum(new_sess) AS BIGINT) AS n_sessions
      FROM f GROUP BY user_id ORDER BY user_id""")),

    // ----- generator/UDTF surface: lateral explode + re-aggregate --------
    ("q48_explode_tokens", (s: SparkSession, dir: String) => {
      import s.implicits._
      // document-frequency per (lang, token): posexplode is the generator
      // (UDTF-shaped) operator; the re-aggregation counts distinct docs.
      // Filtered to tokens seen in ≥ 25 docs to keep the result small.
      Tables.spread(Tables.t(s, dir, "documents"))
        .select($"lang", $"doc_id", posexplode(TA.tokens(lower($"text"))).as(Seq("pos", "tok")))
        .filter(length($"tok") >= 3)
        .groupBy($"lang", $"tok")
        .agg(countDistinct($"doc_id").as("doc_freq"),
          count(lit(1)).as("n_occurrences"),
          min($"pos").cast("long").as("min_pos"))
        .filter($"doc_freq" >= 25)
        .orderBy("lang", "tok")
    }, Some("""
      WITH t AS (SELECT lang, doc_id, pos - 1 AS pos, tok FROM (
        SELECT lang, doc_id,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok,
          unnest(range(1, len(string_split_regex(trim(lower(text)), '\s+')) + 1)) AS pos
        FROM documents))
      SELECT lang, tok, count(DISTINCT doc_id) AS doc_freq,
        count(*) AS n_occurrences, CAST(min(pos) AS BIGINT) AS min_pos
      FROM t WHERE length(tok) >= 3
      GROUP BY lang, tok HAVING count(DISTINCT doc_id) >= 25
      ORDER BY lang, tok""")),

    // ----- continuous percentiles / median over exact-integer domain -----
    ("q49_percentiles", (s: SparkSession, dir: String) => {
      import s.implicits._
      // percentile_cont interpolates a + (b-a)*frac; over integer-valued
      // doubles both terms are exact, so the result is engine-identical
      Tables.t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("median_qty"),
          expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25_qty"),
          expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY l_quantity)").as("p95_qty"),
          avg($"l_quantity").as("mean_qty"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag,
        quantile_cont(l_quantity, 0.5) AS median_qty,
        quantile_cont(l_quantity, 0.25) AS p25_qty,
        quantile_cont(l_quantity, 0.95) AS p95_qty,
        sum(l_quantity) / count(*) AS mean_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ----- RANGE-frame windows: value-based sliding aggregates -----------
    ("q50_range_window", (s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // orders within ±3 days of each order, per customer: RANGE frames
      // bound by VALUE distance (vs the ROWS frames of q13/q40)
      val days = datediff($"o_orderdate", lit("1992-01-01")).cast("long")
      val w = Window.partitionBy($"o_custkey").orderBy(days)
        .rangeBetween(-3, 3)
      Tables.t(s, dir, "orders")
        .filter($"o_custkey" < 200)
        .select($"o_custkey", $"o_orderkey", days.as("day_no"),
          count(lit(1)).over(w).as("n_near"),
          max($"o_orderkey").over(w).as("max_near_key"))
        .orderBy("o_custkey", "day_no", "o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey,
        CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no,
        count(*) OVER w AS n_near,
        max(o_orderkey) OVER w AS max_near_key
      FROM orders WHERE o_custkey < 200
      WINDOW w AS (PARTITION BY o_custkey
        ORDER BY CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)
        RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      ORDER BY o_custkey, day_no, o_orderkey""")),

    // ----- correlated subqueries (scalar + EXISTS), spark.sql surface ----
    ("q51_correlated_subquery", (s: SparkSession, dir: String) => {
      // the SQL-text path: Catalyst decorrelates the scalar subqueries
      // into left-outer aggregate joins and the EXISTS into a semi-join
      Tables.t(s, dir, "customer").createOrReplaceTempView("customer_v")
      Tables.t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT c_custkey, c_mktsegment,
          (SELECT count(*) FROM orders_v o
           WHERE o.o_custkey = c.c_custkey) AS n_orders,
          (SELECT CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
           FROM orders_v o WHERE o.o_custkey = c.c_custkey) AS total_spend
        FROM customer_v c
        WHERE EXISTS (SELECT 1 FROM orders_v o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        ORDER BY c_custkey""")
    }, Some("""
      SELECT c_custkey, c_mktsegment,
        (SELECT count(*) FROM orders o
         WHERE o.o_custkey = c.c_custkey) AS n_orders,
        (SELECT CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
         FROM orders o WHERE o.o_custkey = c.c_custkey) AS total_spend
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      ORDER BY c_custkey""")),

    // ----- pivot: status columns per priority ----------------------------
    ("q52_pivot", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select($"o_orderpriority",
          coalesce($"F", lit(0L)).as("n_f"),
          coalesce($"O", lit(0L)).as("n_o"),
          coalesce($"P", lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")
    }, Some("""
      SELECT o_orderpriority,
        count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ----- distinct-count sketch: KMV estimate vs exact ------------------
    ("q53_kmv_sketch", (s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // KMV with the shared md5-derived 48-bit hash (the engine-portable
      // twin of functions.KmvDistinct): estimate = (k-1) / r_k where r_k
      // is the k-th smallest normalized hash. The estimate stays DOUBLE —
      // one division both engines compute identically — no rounding seam.
      val k = 64
      val d = Tables.t(s, dir, "lineitem")
        .select($"l_returnflag".as("flag"), $"l_partkey").distinct()
        .withColumn("h", conv(substring(
          md5($"l_partkey".cast("string").cast("binary")), 1, 12), 16, 10).cast("long"))
      val w = Window.partitionBy($"flag").orderBy($"h", $"l_partkey")
      val est = d.withColumn("rn", row_number().over(w)).filter($"rn" === k)
        .select($"flag",
          (lit((k - 1).toDouble) * lit(math.pow(2, 48)) / $"h".cast("double"))
            .as("est_distinct"))
      val exact = d.groupBy($"flag").agg(count(lit(1)).as("n_exact"))
      exact.join(est, Seq("flag")).orderBy("flag")
    }, Some("""
      WITH d AS (SELECT DISTINCT l_returnflag AS flag, l_partkey FROM lineitem),
      h AS (SELECT flag, l_partkey,
        ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 12))::BIGINT AS h FROM d),
      r AS (SELECT flag, h,
        row_number() OVER (PARTITION BY flag ORDER BY h, l_partkey) AS rn FROM h),
      e AS (SELECT flag, 63.0 * 281474976710656 / h AS est_distinct FROM r WHERE rn = 64),
      x AS (SELECT flag, count(*) AS n_exact FROM d GROUP BY flag)
      SELECT x.flag, n_exact, est_distinct FROM x JOIN e USING (flag) ORDER BY flag""")),

    // ----- dedup: connected components over near-dup pairs ---------------
    ("q54_dedup_components", (s: SparkSession, dir: String) => {
      import s.implicits._
      // cluster the q23-style n-gram near-dup pairs into components:
      // transitive closure turns pairwise matches into dedup groups whose
      // id (= min member) is the kept representative
      val docs = Tables.spread(Tables.t(s, dir, "documents")).select(
        $"doc_id".as("id"),
        concat($"lang", lit("_"), expr("n_chars div 100")).as("bucket"),
        TA.charNgramInts($"text", 3).as("grams"))
      val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.55, broadcastGrams = true)
      Dedup.connectedComponentsLocal(pairs)
        .groupBy($"label".as("component"))
        .agg(count(lit(1)).as("n_members"), max($"id").as("max_id"))
        .orderBy("component")
    }, Some("""
      WITH RECURSIVE d AS (SELECT doc_id, lang || '_' || (n_chars // 100) AS bucket,
        list_distinct(list_transform(range(1, greatest(length(text) - 2, 1) + 1),
          i -> (CAST(ascii(substr(text, i, 1)) AS BIGINT) * 1114112 + ascii(substr(text, i + 1, 1))) * 1114112 + ascii(substr(text, i + 2, 1)))) AS grams
        FROM documents),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM d a JOIN d b USING (bucket)
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.grams, b.grams)) / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.55),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      cc(id, label) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.src, cc.label FROM edges e JOIN cc ON cc.id = e.dst),
      comp AS (SELECT id, min(label) AS component FROM cc GROUP BY id)
      SELECT component, count(*) AS n_members, max(id) AS max_id
      FROM comp GROUP BY component ORDER BY component""")),

    // ----- date spine / gap fill: dense daily series ---------------------
    ("q55_date_spine", (s: SparkSession, dir: String) => {
      import s.implicits._
      // dense calendar over the observed range (sequence + explode), left
      // join the per-day aggregate, zero-fill the gaps — the standard
      // time-series densification every reporting pipeline needs
      val daily = Tables.t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1998-01-01"))
        .groupBy($"o_orderdate".as("day")).agg(count(lit(1)).as("n_orders"))
      val bounds = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
      val spine = bounds
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select($"day", coalesce($"n_orders", lit(0L)).as("n_orders"))
        .orderBy("day")
    }, Some("""
      WITH daily AS (SELECT o_orderdate AS day, count(*) AS n_orders
        FROM orders WHERE o_orderdate >= DATE '1998-01-01' GROUP BY 1),
      bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds)
      SELECT spine.day AS day, coalesce(n_orders, 0) AS n_orders
      FROM spine LEFT JOIN daily ON spine.day = daily.day
      ORDER BY spine.day""")),

    // ----- as-of join, native operator (custom LogicalPlan/Strategy) -----
    ("q56_asof_native", (s: SparkSession, dir: String) => {
      import s.implicits._
      // same semantics as q45 but through the custom merge operator
      // (plans.AsOfJoinExec): one forward pass per co-partition instead
      // of range-join row multiplication + windowed top-1
      if (!s.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
        s.experimental.extraStrategies =
          s.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
      val ev = Tables.t(s, dir, "events")
        .filter($"event_id" >= 2000 && $"event_id" < 4000)
        .select($"event_id", $"user_id", date_trunc("second", $"ts").as("tsec"))
      val orders = Tables.t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_orderdate".cast("timestamp").as("o_ts"))
      graft.plans.AsOfJoinOps.asofBackward(ev, orders,
          key = ("user_id", "o_custkey"), time = ("tsec", "o_ts"),
          rightTieBreak = Seq("o_orderkey"))
        .select($"event_id", $"user_id", $"o_orderkey".as("latest_orderkey"),
          $"o_ts".as("latest_orderdate"))
        .orderBy("event_id")
    }, Some("""
      WITH ev AS (SELECT event_id, user_id, date_trunc('second', ts) AS tsec
        FROM events WHERE event_id >= 2000 AND event_id < 4000),
      m AS (SELECT ev.event_id, ev.user_id, o.o_orderkey, o.o_orderdate,
        row_number() OVER (PARTITION BY ev.event_id
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS r
        FROM ev LEFT JOIN orders o
          ON ev.user_id = o.o_custkey AND o.o_orderdate <= ev.tsec)
      SELECT event_id, user_id, o_orderkey AS latest_orderkey,
             o_orderdate AS latest_orderdate
      FROM m WHERE r = 1 ORDER BY event_id""")),

    // ----- incremental sync: src/dst diff by PK + row hash ---------------
    ("q57_incremental_diff", (s: SparkSession, dir: String) => {
      import s.implicits._
      // the incremental form of the reference's full re-migration: rows
      // to INSERT (pk missing at target), UPDATE (pk present, row hash
      // differs), DELETE (target orphans). Target is simulated
      // deterministically: drop every 97th order, stale every 89th price.
      val rowHash = md5(concat_ws("|",
        $"o_orderkey", $"o_custkey", $"o_orderstatus",
        format_number($"o_totalprice", 2), $"o_orderpriority").cast("binary"))
      val src = Tables.t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice", $"o_orderpriority")
      val dst = src.filter($"o_orderkey" % 97 =!= 0)
        .withColumn("o_totalprice",
          when($"o_orderkey" % 89 === 0, $"o_totalprice" + 1.0).otherwise($"o_totalprice"))
        // target-only orphans (deleted upstream): negated every-101st pk
        .unionByName(src.filter($"o_orderkey" % 101 === 0)
          .withColumn("o_orderkey", -$"o_orderkey"))
      val sh = src.select($"o_orderkey".as("pk"), rowHash.as("h"))
      val dh = dst.select($"o_orderkey".as("pk"), rowHash.as("h2"))
      // one full-outer join classifies all three change kinds in a single
      // pass — the anti/semi/inner triple would scan each side three times
      sh.join(dh, Seq("pk"), "full_outer")
        .select($"pk",
          when($"h2".isNull, "insert")
            .when($"h".isNull, "delete")
            .when($"h" =!= $"h2", "update").as("change_type"))
        .filter($"change_type".isNotNull)
        .groupBy($"change_type")
        .agg(count(lit(1)).as("n_rows"), min($"pk").as("min_pk"), max($"pk").as("max_pk"))
        .orderBy("change_type")
    }, Some("""
      WITH src AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders),
      dst AS (SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
          o_orderpriority
        FROM src WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM src WHERE o_orderkey % 101 = 0),
      sh AS (SELECT o_orderkey AS pk, md5(o_orderkey || '|' || o_custkey || '|' || o_orderstatus
          || '|' || format('{:.2f}', o_totalprice) || '|' || o_orderpriority) AS h FROM src),
      dh AS (SELECT o_orderkey AS pk, md5(o_orderkey || '|' || o_custkey || '|' || o_orderstatus
          || '|' || format('{:.2f}', o_totalprice) || '|' || o_orderpriority) AS h FROM dst),
      changes AS (
        SELECT 'insert' AS change_type, pk FROM sh WHERE pk NOT IN (SELECT pk FROM dh)
        UNION ALL
        SELECT 'update', sh.pk FROM sh JOIN dh USING (pk) WHERE sh.h <> dh.h
        UNION ALL
        SELECT 'delete', pk FROM dh WHERE pk NOT IN (SELECT pk FROM sh))
      SELECT change_type, count(*) AS n_rows, min(pk) AS min_pk, max(pk) AS max_pk
      FROM changes GROUP BY change_type ORDER BY change_type""")),

    // ----- skew: salted two-phase aggregation == plain group-by ----------
    ("q58_salted_agg", (s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      // decimal accumulation keeps the salted partial sums exact, so the
      // salt-bucketed result is bit-identical to the direct aggregate
      graft.catalog.Skew.saltedSumCount(
          Tables.t(s, dir, "lineitem"),
          $"l_suppkey", $"l_quantity".cast(DecimalType(18, 2)), buckets = 8)
        .select($"k".as("suppkey"),
          $"sum_value".cast(DecimalType(38, 2)).cast("double").as("sum_qty"),
          $"n_rows")
        .orderBy("suppkey")
    }, Some("""
      SELECT l_suppkey AS suppkey,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
        count(*) AS n_rows
      FROM lineitem GROUP BY l_suppkey ORDER BY suppkey""")),

    // ----- skew: salted join == plain equi-join --------------------------
    ("q59_salted_join", (s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val big = Tables.t(s, dir, "lineitem")
        .select($"l_suppkey".as("suppkey"), $"l_quantity")
      val small = Tables.t(s, dir, "supplier")
        .select($"s_suppkey".as("suppkey"), $"s_name")
      graft.catalog.Skew.saltedJoin(big, small, "suppkey", buckets = 8)
        .groupBy($"s_name")
        .agg(count(lit(1)).as("n_items"),
          sum($"l_quantity".cast(DecimalType(18, 2)))
            .cast(DecimalType(38, 2)).cast("double").as("sum_qty"))
        .orderBy("s_name")
    }, Some("""
      SELECT s_name, count(*) AS n_items,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_name ORDER BY s_name""")),

    // ----- scalar surface: the wider string-function family --------------
    ("q60_string_funcs", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "customer")
        .filter($"c_custkey" <= 200)
        .select(
          $"c_custkey",
          expr("translate(c_name, '#_', '-~')").as("translated"),
          lpad($"c_mktsegment", 12, ".").as("seg_lpad"),
          rpad($"c_mktsegment", 12, ".").as("seg_rpad"),
          reverse($"c_name").as("name_rev"),
          expr("split_part(c_name, '_', 2)").as("seg_part"),
          expr("instr(c_name, '_')").cast("long").as("pos_dash"),
          expr("left(c_name, 3)").as("left3"),
          expr("right(c_name, 3)").as("right3"))
        .orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey,
        translate(c_name, '#_', '-~') AS translated,
        lpad(c_mktsegment, 12, '.') AS seg_lpad,
        rpad(c_mktsegment, 12, '.') AS seg_rpad,
        reverse(c_name) AS name_rev,
        split_part(c_name, '_', 2) AS seg_part,
        CAST(instr(c_name, '_') AS BIGINT) AS pos_dash,
        left(c_name, 3) AS left3,
        right(c_name, 3) AS right3
      FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""")),

    // ----- scalar surface: bitwise operators ------------------------------
    ("q61_bitwise", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "orders")
        .filter($"o_orderkey" <= 500)
        .select(
          $"o_orderkey",
          ($"o_orderkey".bitwiseAND(255L)).as("and255"),
          ($"o_orderkey".bitwiseOR(16L)).as("or16"),
          ($"o_orderkey".bitwiseXOR(255L)).as("xor255"),
          shiftleft($"o_orderkey", 2).as("shl2"),
          shiftright($"o_orderkey", 1).as("shr1"),
          bitwise_not($"o_orderkey").as("inv"),
          bit_count($"o_orderkey").cast("long").as("popcnt"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
        o_orderkey & 255 AS and255,
        o_orderkey | 16 AS or16,
        xor(o_orderkey, 255) AS xor255,
        o_orderkey << 2 AS shl2,
        o_orderkey >> 1 AS shr1,
        ~o_orderkey AS inv,
        CAST(bit_count(o_orderkey) AS BIGINT) AS popcnt
      FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""")),

    // ----- scalar surface: date/time function family ----------------------
    ("q62_datetime_funcs", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "orders")
        .filter($"o_orderkey" <= 500)
        .select(
          $"o_orderkey",
          date_add($"o_orderdate".cast("date"), 30).as("plus30"),
          last_day($"o_orderdate".cast("date")).as("month_end"),
          year($"o_orderdate").cast("long").as("yr"),
          month($"o_orderdate").cast("long").as("mo"),
          dayofmonth($"o_orderdate").cast("long").as("dom"),
          quarter($"o_orderdate").cast("long").as("qtr"),
          dayofweek($"o_orderdate").cast("long").as("dow_sun1"),
          weekofyear($"o_orderdate").cast("long").as("iso_week"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
        (o_orderdate::DATE + INTERVAL 30 DAY)::DATE AS plus30,
        last_day(o_orderdate::DATE) AS month_end,
        CAST(year(o_orderdate) AS BIGINT) AS yr,
        CAST(month(o_orderdate) AS BIGINT) AS mo,
        CAST(day(o_orderdate) AS BIGINT) AS dom,
        CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow_sun1,
        CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week
      FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""")),

    // ----- scalar surface: null-handling family ---------------------------
    ("q63_null_funcs", (s: SparkSession, dir: String) => {
      import s.implicits._
      // lag introduces genuine nulls to exercise the family on
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
      Tables.t(s, dir, "orders")
        .filter($"o_custkey" < 100)
        .withColumn("prev_key", lag($"o_orderkey", 1).over(w))
        .select(
          $"o_custkey", $"o_orderkey",
          coalesce($"prev_key", lit(-1L)).as("prev_or_neg1"),
          $"prev_key".isNull.as("is_first"),
          when($"prev_key".isNotNull, $"o_orderkey" - $"prev_key").as("gap"),
          expr("nvl2(prev_key, 'has_prev', 'first')").as("nvl2_tag"),
          nullif($"o_orderkey" % 10, lit(0)).as("nullif_mod"),
          greatest($"o_orderkey" % 7, $"o_orderkey" % 11).as("gr"),
          least($"o_orderkey" % 7, $"o_orderkey" % 11).as("ls"))
        .orderBy("o_custkey", "o_orderkey")
    }, Some("""
      WITH w AS (SELECT o_custkey, o_orderkey,
        lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_key
        FROM orders WHERE o_custkey < 100)
      SELECT o_custkey, o_orderkey,
        coalesce(prev_key, -1) AS prev_or_neg1,
        prev_key IS NULL AS is_first,
        CASE WHEN prev_key IS NOT NULL THEN o_orderkey - prev_key END AS gap,
        CASE WHEN prev_key IS NOT NULL THEN 'has_prev' ELSE 'first' END AS nvl2_tag,
        nullif(o_orderkey % 10, 0) AS nullif_mod,
        greatest(o_orderkey % 7, o_orderkey % 11) AS gr,
        least(o_orderkey % 7, o_orderkey % 11) AS ls
      FROM w ORDER BY o_custkey, o_orderkey""")),

    // ----- scalar surface: IEEE-exact math family -------------------------
    ("q64_math_funcs", (s: SparkSession, dir: String) => {
      import s.implicits._
      // only IEEE-exact operations (abs/sign/sqrt/floor/ceil/mod/div):
      // transcendentals (exp/ln/pow) are libm-dependent in the last ulp
      // and intentionally excluded from the oracle surface
      val v = $"o_totalprice" - 150000.0
      Tables.t(s, dir, "orders")
        .filter($"o_orderkey" <= 500)
        .select(
          $"o_orderkey",
          abs(v).as("abs_v"),
          signum(v).as("sign_v"),
          sqrt(abs(v)).as("sqrt_v"),
          floor(v).as("floor_v"),
          ceil(v).as("ceil_v"),
          ($"o_orderkey" % 97).as("mod97"),
          ($"o_orderkey" / lit(8)).cast("long").as("div8"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
        abs(o_totalprice - 150000.0) AS abs_v,
        CAST(sign(o_totalprice - 150000.0) AS DOUBLE) AS sign_v,
        sqrt(abs(o_totalprice - 150000.0)) AS sqrt_v,
        CAST(floor(o_totalprice - 150000.0) AS BIGINT) AS floor_v,
        CAST(ceil(o_totalprice - 150000.0) AS BIGINT) AS ceil_v,
        o_orderkey % 97 AS mod97,
        o_orderkey // 8 AS div8
      FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""")),

    // ----- statistical aggregates from exact sums -------------------------
    ("q65_variance_exact", (s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      // built-in stddev/var accumulate doubles in partition order —
      // nondeterministic under re-partitioning. The scale-stable form:
      // exact decimal sums of x and x², then one fixed double formula.
      val x = $"l_quantity".cast(DecimalType(12, 2))
      Tables.t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(x).cast(DecimalType(38, 2)).cast("double").as("sum_x"),
          sum(x * x).cast(DecimalType(38, 4)).cast("double").as("sum_x2"))
        .select($"l_returnflag", $"n",
          (($"sum_x2" - $"sum_x" * $"sum_x" / $"n") / ($"n" - 1)).as("var_samp"),
          sqrt(($"sum_x2" - $"sum_x" * $"sum_x" / $"n") / ($"n" - 1)).as("stddev_samp"),
          ($"sum_x" / $"n").as("mean"))
        .orderBy("l_returnflag")
    }, Some("""
      WITH a AS (SELECT l_returnflag, count(*) AS n,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_x,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_x2
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        (sum_x2 - sum_x * sum_x / n) / (n - 1) AS var_samp,
        sqrt((sum_x2 - sum_x * sum_x / n) / (n - 1)) AS stddev_samp,
        sum_x / n AS mean
      FROM a ORDER BY l_returnflag""")),

    // ----- data profiling: fixed-width histogram --------------------------
    ("q66_histogram", (s: SparkSession, dir: String) => {
      import s.implicits._
      // 20 fixed bins over [0, 600000): bin = floor(x / 30000), clamped —
      // the migration-QA profile of a column's distribution
      val bin = least(floor($"o_totalprice" / 30000.0).cast("long"), lit(19L))
      Tables.t(s, dir, "orders")
        .groupBy(bin.as("bin"))
        .agg(count(lit(1)).as("n_orders"))
        .withColumn("bin_lo", $"bin" * 30000L)
        .orderBy("bin")
    }, Some("""
      SELECT least(CAST(floor(o_totalprice / 30000.0) AS BIGINT), 19) AS bin,
        count(*) AS n_orders,
        least(CAST(floor(o_totalprice / 30000.0) AS BIGINT), 19) * 30000 AS bin_lo
      FROM orders
      GROUP BY 1 ORDER BY bin""")),

    // ----- structured streaming under the batch oracle --------------------
    ("q67_stream_window", (s: SparkSession, dir: String) => {
      import s.implicits._
      // the streaming windowed-count pipeline executed as a real
      // streaming query (file source → watermark → window agg → memory
      // sink), then handed to the gate: Structured Streaming's result is
      // oracle-checked against the same SQL as the batch form
      // the file source wants a directory: expose events.parquet through
      // a temp dir (symlink — no copy)
      val tmp = graft.TempScratch.symlinkDir("q67", "events.parquet",
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val stream = graft.streaming.EventStream
        .streamFromParquetDir(s, tmp.toString)
      val q = graft.streaming.EventStream.windowedCounts(stream)
        .writeStream.format("memory").queryName("q67_mem")
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table("q67_mem")
        .select($"hour_start", $"event_type", $"n_events")
        .orderBy("hour_start", "event_type")
    }, Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start, event_type,
        count(*) AS n_events
      FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""")),

    // ----- scalar surface: regex extraction with groups -------------------
    ("q68_regex_extract", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "customer")
        .filter($"c_custkey" <= 300)
        .select(
          $"c_custkey",
          regexp_extract($"c_name", "([a-zA-Z]+)_?([0-9]*)", 1).as("name_word"),
          regexp_extract($"c_name", "([0-9]+)", 1).as("first_num"),
          ($"c_name" rlike "[0-9]").as("has_digit"),
          regexp_replace($"c_name", "[0-9]+", "#").as("nums_masked"))
        .orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey,
        regexp_extract(c_name, '([a-zA-Z]+)_?([0-9]*)', 1) AS name_word,
        regexp_extract(c_name, '([0-9]+)', 1) AS first_num,
        regexp_matches(c_name, '[0-9]') AS has_digit,
        regexp_replace(c_name, '[0-9]+', '#', 'g') AS nums_masked
      FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey""")),

    // ----- multimodal: per-partition feature extraction ------------------
    ("q69_multimodal_features", (s: SparkSession, dir: String) => {
      import s.implicits._
      // the mapPartitions decode/feature pipeline end-to-end: binary
      // payloads → per-partition stub decode → frame-sampled features.
      // The gate projection keeps the SQL-expressible kernel outputs
      // (frame geometry + sampled header bytes → width/height); the
      // rolling checksum has no SQL form and is pinned in MultimodalSpec.
      // ASCII-only gate filter: the kernel reads UTF-8 BYTES while SQL
      // substr/ascii read characters — identical only where octet_length
      // equals char length, so the comparison is restricted to exactly
      // that set (the kernel itself handles any bytes).
      val media = graft.ext.Multimodal.toMediaDocs(
        Tables.spread(Tables.t(s, dir, "documents"))
          .filter($"doc_id" < 200 && octet_length($"text") === length($"text")),
        "doc_id", "text")
      graft.ext.Multimodal.extractFeatures(media, frameEvery = 2)
        .toDF()
        .select($"doc_id", $"frame_idx".cast("long").as("frame_idx"),
          $"width".cast("long").as("width"), $"height".cast("long").as("height"))
        .orderBy("doc_id", "frame_idx")
    }, Some("""
      WITH d AS (SELECT doc_id, text,
          greatest(1, CAST(ceil(length(text)/64.0) AS BIGINT)) AS chunks
        FROM documents
        WHERE doc_id < 200 AND octet_length(encode(text)) = length(text)),
      idx AS (SELECT doc_id, text, unnest(range(0, chunks, 2)) AS frame_idx FROM d)
      SELECT doc_id, frame_idx,
        32 + (CASE WHEN frame_idx*64 < length(text)
              THEN ascii(substr(text, CAST(frame_idx*64+1 AS INT), 1)) ELSE 0 END) % 64 AS width,
        32 + (CASE WHEN frame_idx*64+1 < length(text)
              THEN ascii(substr(text, CAST(frame_idx*64+2 AS INT), 1)) ELSE 0 END) % 64 AS height
      FROM idx ORDER BY doc_id, frame_idx""")),

    // ----- join family completeness: FULL OUTER + CROSS ------------------
    ("q70_full_outer_join", (s: SparkSession, dir: String) => {
      import s.implicits._
      // two deterministic halves with partial overlap → all three
      // full-outer row classes (left-only / both / right-only)
      val a = Tables.t(s, dir, "customer").filter($"c_custkey" % 3 === 0)
        .select($"c_custkey".as("k"), $"c_mktsegment".as("seg_a"))
      val b = Tables.t(s, dir, "customer").filter($"c_custkey" % 2 === 0)
        .select($"c_custkey".as("k"), $"c_acctbal".as("bal_b"))
      a.join(b, Seq("k"), "full_outer")
        .select($"k", $"seg_a",
          when($"bal_b".isNotNull, lit(1L)).otherwise(lit(0L)).as("has_b"),
          when($"seg_a".isNotNull && $"bal_b".isNotNull, "both")
            .when($"seg_a".isNotNull, "left_only").otherwise("right_only").as("side"))
        .orderBy("k")
    }, Some("""
      WITH a AS (SELECT c_custkey AS k, c_mktsegment AS seg_a FROM customer WHERE c_custkey % 3 = 0),
      b AS (SELECT c_custkey AS k, c_acctbal AS bal_b FROM customer WHERE c_custkey % 2 = 0)
      SELECT coalesce(a.k, b.k) AS k, seg_a,
        CASE WHEN bal_b IS NOT NULL THEN 1 ELSE 0 END AS has_b,
        CASE WHEN seg_a IS NOT NULL AND bal_b IS NOT NULL THEN 'both'
             WHEN seg_a IS NOT NULL THEN 'left_only' ELSE 'right_only' END AS side
      FROM a FULL OUTER JOIN b ON a.k = b.k
      ORDER BY k""")),

    ("q71_cross_join", (s: SparkSession, dir: String) => {
      import s.implicits._
      // explicit cartesian over two provably-small inputs (region 5×5):
      // the one place a cross join is the right plan
      val r1 = Tables.t(s, dir, "region").select($"r_regionkey".as("rk1"), $"r_name".as("n1"))
      val r2 = Tables.t(s, dir, "region").select($"r_regionkey".as("rk2"), $"r_name".as("n2"))
      r1.crossJoin(r2)
        .filter($"rk1" =!= $"rk2")
        .select($"n1", $"n2", concat($"n1", lit("->"), $"n2").as("route"))
        .orderBy("n1", "n2")
    }, Some("""
      SELECT a.r_name AS n1, b.r_name AS n2, a.r_name || '->' || b.r_name AS route
      FROM region a CROSS JOIN region b
      WHERE a.r_regionkey <> b.r_regionkey
      ORDER BY n1, n2""")),

    // ----- window analytics: distribution functions ----------------------
    ("q72_window_distribution", (s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // percent_rank = (rank-1)/(n-1), cume_dist = rows≤x / n: exact
      // rational values both engines compute with one identical division
      val w = Window.partitionBy($"o_orderpriority").orderBy($"o_orderkey")
      Tables.t(s, dir, "orders")
        .filter($"o_custkey" < 50)
        .select($"o_orderpriority", $"o_orderkey",
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          ntile(3).over(w).cast("long").as("tercile"))
        .orderBy("o_orderpriority", "o_orderkey")
    }, Some("""
      SELECT o_orderpriority, o_orderkey,
        percent_rank() OVER w AS pct_rank,
        cume_dist() OVER w AS cume,
        CAST(ntile(3) OVER w AS BIGINT) AS tercile
      FROM orders WHERE o_custkey < 50
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
      ORDER BY o_orderpriority, o_orderkey""")),

    // ----- epoch / timestamp conversion family ----------------------------
    ("q73_epoch_funcs", (s: SparkSession, dir: String) => {
      import s.implicits._
      val tsec = date_trunc("second", $"ts")
      Tables.t(s, dir, "events")
        .filter($"event_id" < 500)
        .select(
          $"event_id",
          unix_timestamp(tsec).as("epoch_s"),
          to_timestamp(unix_timestamp(tsec)).as("roundtrip_ts"),
          date_trunc("minute", $"ts").as("ts_minute"),
          date_trunc("day", $"ts").as("ts_day"),
          to_date($"ts").as("d"))
        .orderBy("event_id")
    }, Some("""
      SELECT event_id,
        CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
        to_timestamp(epoch(date_trunc('second', ts)))::TIMESTAMP AS roundtrip_ts,
        date_trunc('minute', ts) AS ts_minute,
        date_trunc('day', ts) AS ts_day,
        CAST(ts AS DATE) AS d
      FROM events WHERE event_id < 500 ORDER BY event_id"""))
  )
}
