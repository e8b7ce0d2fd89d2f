package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Similarity, TextAnalysis => TA}
import graft.functions.UnicodeNormFns

/** Round-7 additions beyond the reference surface — corpus-QA operators
  * for the training-data pipeline story, each with a DuckDB oracle. */
object Round7Queries {

  /** DuckDB rendering of TextAnalysis.normText (shared template — see
    * ExtQueries.normSql). */
  private val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))"""

  type QFn = (SparkSession, String) => DataFrame

  // the shared oracle renderings of Similarity.prepare / lshBucket —
  // one source (Similarity.prepareSql / lshBucketSql) so the
  // quantization and projection set cannot diverge across files
  private val annPrepSql = Similarity.prepareSql

  private val AnnProjs = Similarity.OracleProjs

  private def annBucketSql: String = Similarity.lshBucketSql

  /** DuckDB CTE chain for the MinHash pipeline ending in
    * `cand(id_a, id_b)` candidate pairs plus the signature table
    * `mh(doc_id, m0..m7)` and hash-set table `hst(doc_id, hs)` —
    * the oracle side of Dedup.minhashLshPairsHashed's shapes (same
    * template as ExtQueries' q21 oracle; repeated here because q136/q139
    * consume the intermediate tables, not just the verified pairs). */
  private[operators] def minhashCandCte: String = {
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
        WHERE a.doc_id < b.doc_id)"""
  }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- tokenizer-coverage QA: top-V vocabulary + per-doc OOV ---------
    ("q114_vocab_oov", (s: SparkSession, dir: String) => {
      import s.implicits._
      TA.vocabOov(Tables.spread(Tables.t(s, dir, "documents")), topV = 16)
        .orderBy("doc_id")
    }, Some(s"""
      WITH toks AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
        FROM documents),
      vocab AS (SELECT tok FROM (
        SELECT tok, count(*) AS freq FROM toks GROUP BY tok
        ORDER BY freq DESC, tok LIMIT 16))
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
      GROUP BY t.doc_id ORDER BY t.doc_id""")),

    // ----- memorization risk: cross-doc duplicated-n-gram rate -----------
    ("q115_dupgram_rate", (s: SparkSession, dir: String) => {
      import s.implicits._
      // per document: how many of its distinct word 3-grams occur in at
      // least one OTHER document — the corpus-level duplication signal
      // (within-doc repetition is q105; cross-set contamination is q108).
      // Both shuffles key on the n-gram itself, so the gram-frequency
      // aggregate and the join back are co-partitioned (one exchange,
      // reused) and there is no cross join at any corpus size; the
      // per-doc rollup is the only doc_id shuffle.
      val n = 3
      val grams = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", split(TA.normText($"text"), " ").as("a"))
        .filter(size($"a") >= n)
        .select($"doc_id", explode(expr(
          s"transform(sequence(1, size(a) - ${n - 1}), j -> array_join(slice(a, j, $n), ' '))"))
          .as("ngram"))
        .distinct()
      val freq = grams.groupBy($"ngram").agg(count(lit(1)).as("n_docs_with"))
      grams.join(freq, Seq("ngram"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).cast("long").as("n_grams"),
          sum(when($"n_docs_with" >= 2, 1L).otherwise(0L)).cast("long").as("n_dup_grams"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS a
        FROM documents WHERE len(string_split($normSql, ' ')) >= 3),
      pos AS (SELECT doc_id, a, unnest(range(1, len(a) - 1)) AS j FROM base),
      grams AS (SELECT DISTINCT doc_id,
          array_to_string(list_slice(a, CAST(j AS INT), CAST(j + 2 AS INT)), ' ') AS ngram
        FROM pos),
      freq AS (SELECT ngram, count(*) AS n_docs_with FROM grams GROUP BY ngram)
      SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        CAST(sum(CASE WHEN f.n_docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
      FROM grams g JOIN freq f ON g.ngram = f.ngram
      GROUP BY g.doc_id ORDER BY g.doc_id""")),

    // ----- unicode canonicalisation: NFC + accent strip ------------------
    // The corpus is ASCII, so the accented/decomposed forms are derived
    // deterministically in-query (translate / an appended combining acute)
    // and each engine normalises with its own kernel: graft's codegen'd
    // java.text.Normalizer expressions vs DuckDB strip_accents /
    // nfc_normalize. Map-only, zero shuffle — scan-rate at any corpus size.
    ("q116_unicode_normalize", (s: SparkSession, dir: String) => {
      import s.implicits._
      val accented = translate($"text", "aeiou", "áéíöü")
      val decomp = concat(substring($"text", 1, 10), lit("á"))
      Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id",
          UnicodeNormFns.stripAccents(accented).as("clean_text"),
          length(UnicodeNormFns.nfcNormalize(decomp)).cast("long").as("nfc_len"),
          length(decomp).cast("long").as("raw_len"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
        strip_accents(translate(text, 'aeiou', 'áéíöü')) AS clean_text,
        CAST(length(nfc_normalize(substring(text, 1, 10) || 'a' || chr(769))) AS BIGINT) AS nfc_len,
        CAST(length(substring(text, 1, 10) || 'a' || chr(769)) AS BIGINT) AS raw_len
      FROM documents ORDER BY doc_id""")),

    // ----- PII redaction: email/phone scrub with match accounting --------
    // PII is injected deterministically from doc_id (the corpus has none),
    // then both engines redact with the same regexes — kept to the
    // Java-regex/RE2 common subset (char classes, bounded repeats; no
    // backrefs or lookaround). Map-only, zero shuffle.
    ("q117_pii_redact", (s: SparkSession, dir: String) => {
      import s.implicits._
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "\\+1-[0-9]{3}-[0-9]{4}"
      Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", concat($"text", lit(" contact user"), $"doc_id",
          lit("@example.com or +1-555-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0")).as("t"))
        .select($"doc_id",
          regexp_count($"t", lit(emailRe)).cast("long").as("n_emails"),
          regexp_count($"t", lit(phoneRe)).cast("long").as("n_phones"),
          regexp_replace(regexp_replace($"t", emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>").as("redacted"))
        .orderBy("doc_id")
    }, Some("""
      WITH aug AS (SELECT doc_id,
        text || ' contact user' || doc_id || '@example.com or +1-555-' ||
          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(t, '\+1-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        regexp_replace(regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
          '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
      FROM aug ORDER BY doc_id""")),

    // ----- context-window chunking with overlap (W=32, S=24) -------------
    // Training-prep chunker: sliding token windows of size W at stride S.
    // Start positions are sequence(1, n, S) minus any window the previous
    // one already covers to end-of-doc (so every token is covered exactly
    // once per pass and no trailing chunk is a subset of its predecessor).
    // Pure per-row explode — map-side, no shuffle; the chunk table is the
    // natural pre-tokenization layout for packing (q106 consumes one).
    ("q118_doc_chunking", (s: SparkSession, dir: String) => {
      import s.implicits._
      val (w, st) = (32, 24)
      Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", split($"text", " ").as("a"))
        .select($"doc_id", $"a", size($"a").as("n"))
        .select($"doc_id", $"a", $"n", explode(expr(
          s"filter(sequence(1, n, $st), j -> j = 1 OR j + ${w - 1} <= n OR j - $st + ${w - 1} < n)"))
          .as("j"))
        .select($"doc_id", $"j".cast("long").as("chunk_start"),
          expr(s"slice(a, j, least($w, n - j + 1))").as("chunk"))
        .select($"doc_id", $"chunk_start",
          size($"chunk").cast("long").as("n_tokens"),
          md5(array_join($"chunk", " ")).as("chunk_hash"))
        .orderBy("doc_id", "chunk_start")
    }, Some("""
      WITH base AS (SELECT doc_id, string_split(text, ' ') AS a,
          len(string_split(text, ' ')) AS n FROM documents),
      starts AS (SELECT doc_id, a, n, unnest(range(1, n + 1, 24)) AS j FROM base),
      keep AS (SELECT * FROM starts WHERE j = 1 OR j + 31 <= n OR j - 24 + 31 < n)
      SELECT doc_id, CAST(j AS BIGINT) AS chunk_start,
        CAST(len(list_slice(a, CAST(j AS INT), CAST(least(j + 31, n) AS INT))) AS BIGINT) AS n_tokens,
        md5(array_to_string(list_slice(a, CAST(j AS INT), CAST(least(j + 31, n) AS INT)), ' ')) AS chunk_hash
      FROM keep ORDER BY doc_id, chunk_start""")),

    // ----- Zipf rank-frequency fit over the token distribution -----------
    // Corpus-health diagnostic: least-squares slope of ln(freq) vs
    // ln(rank) over the top-64 tokens. Token counts are a two-phase hash
    // aggregate; the top-64 is TakeOrderedAndProject; the window runs over
    // a constant-bounded 64 rows. Per the q80 determinism rule, no
    // regr_* builtins (double accumulation order varies): ln values are
    // fixed to integer micro-lns via floor(v*1e6 + 0.5), all sums are
    // integer-exact, and one identical double formula runs on both
    // engines at the end.
    ("q119_zipf_fit", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select(explode(split($"text", " ")).as("tok"))
      val top = toks.groupBy($"tok").agg(count(lit(1)).as("f"))
        .orderBy($"f".desc, $"tok").limit(64)
      top
        .withColumn("r", row_number().over(Window.orderBy($"f".desc, $"tok")))
        .select(
          floor(log($"f".cast("double")) * 1e6 + 0.5).cast("long").as("lf"),
          floor(log($"r".cast("double")) * 1e6 + 0.5).cast("long").as("lr"))
        .agg(count(lit(1)).as("n"), sum($"lr").as("sx"), sum($"lf").as("sy"),
          sum($"lr" * $"lr").as("sxx"), sum($"lr" * $"lf").as("sxy"),
          sum($"lf" * $"lf").as("syy"))
        .select($"n".cast("long").as("n_ranks"),
          round(
            (($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
              ($"n" * $"sxx" - $"sx" * $"sx").cast("double")), 6).as("zipf_slope"),
          round(
            (($"n" * $"sxy" - $"sx" * $"sy").cast("double") *
              ($"n" * $"sxy" - $"sx" * $"sy").cast("double")) /
              (($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
                ($"n" * $"syy" - $"sy" * $"sy").cast("double")), 6).as("zipf_r2"))
    }, Some("""
      WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      freq AS (SELECT tok, count(*) AS f FROM toks GROUP BY tok ORDER BY f DESC, tok LIMIT 64),
      ranked AS (SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r FROM freq),
      fixed AS (SELECT CAST(floor(ln(CAST(f AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lf,
          CAST(floor(ln(CAST(r AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lr FROM ranked),
      sums AS (SELECT count(*) AS n, sum(lr) AS sx, sum(lf) AS sy,
          sum(lr * lr) AS sxx, sum(lr * lf) AS sxy, sum(lf * lf) AS syy FROM fixed)
      SELECT CAST(n AS BIGINT) AS n_ranks,
        round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
        round(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE) /
          (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS zipf_r2
      FROM sums""")),

    // ----- train/val/test split + contamination-style leakage audit ------
    // Docs are assigned splits by the engine-reproducible md5/2^32 hash
    // (the q110 rule: no seed, no RNG), then a val/test doc counts as
    // LEAKED if it shares at least one word 5-gram with any train doc —
    // the shipping-gate audit a split must pass before the corpus trains
    // anything. Every shuffle keys on the 5-gram string (gram dedup, the
    // train-side distinct, the probe join are co-partitioned); no cross
    // join at any corpus size; the per-doc verdict is a doc_id rollup.
    ("q120_split_leakage", (s: SparkSession, dir: String) => {
      import s.implicits._
      val n = 5
      val d = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", split(TA.normText($"text"), " ").as("a"),
          (conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
            .cast("long").cast("double") / 4294967296.0).as("h01"))
        .filter(size($"a") >= n)
        .select($"doc_id", $"a",
          when($"h01" < 0.8, "train").when($"h01" < 0.9, "val")
            .otherwise("test").as("split"))
      val grams = d.select($"doc_id", $"split", explode(expr(
        s"transform(sequence(1, size(a) - ${n - 1}), j -> array_join(slice(a, j, $n), ' '))"))
        .as("g")).distinct()
      val trainGrams = grams.filter($"split" === "train")
        .select($"g").distinct().withColumn("hit", lit(1))
      grams.filter($"split" =!= "train")
        .join(trainGrams, Seq("g"), "left")
        .groupBy($"doc_id", $"split")
        .agg(max(coalesce($"hit", lit(0))).as("leaked"))
        .groupBy($"split")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum($"leaked").cast("long").as("n_leaked"))
        .orderBy("split")
    }, Some(s"""
      WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS a,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            / 4294967296.0 AS h01
        FROM documents),
      split AS (SELECT doc_id, a,
          CASE WHEN h01 < 0.8 THEN 'train' WHEN h01 < 0.9 THEN 'val' ELSE 'test' END AS split
        FROM d WHERE len(a) >= 5),
      grams AS (SELECT DISTINCT doc_id, split,
          array_to_string(list_slice(a, CAST(j AS INT), CAST(j + 4 AS INT)), ' ') AS g
        FROM (SELECT doc_id, split, a, unnest(range(1, len(a) - 3)) AS j FROM split)),
      train_grams AS (SELECT DISTINCT g FROM grams WHERE split = 'train'),
      flags AS (SELECT gr.doc_id, gr.split, max(CASE WHEN t.g IS NULL THEN 0 ELSE 1 END) AS leaked
        FROM grams gr LEFT JOIN train_grams t ON gr.g = t.g
        WHERE gr.split <> 'train'
        GROUP BY gr.doc_id, gr.split)
      SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(leaked) AS BIGINT) AS n_leaked
      FROM flags GROUP BY split ORDER BY split""")),

    // ----- unigram log-likelihood quality score (perplexity filtering) ---
    // CCNet-style signal: each doc's average negative log-likelihood
    // under the corpus's own unigram distribution — repetitive/templated
    // docs score low, rare-token noise scores high. The corpus total is
    // an in-DAG scalar aggregate broadcast into the frequency table (the
    // q86 rule: no driver-side count job); the token→logprob join keys
    // on the token, co-partitioned with the frequency aggregate. Per the
    // q80/q119 determinism rule the per-token ln is fixed to integer
    // micro-lns before the per-doc sum, so both engines aggregate exact
    // integers and divide once at the end.
    ("q121_unigram_logprob", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", explode(split(TA.normText($"text"), " ")).as("tok"))
      val freq = toks.groupBy($"tok").agg(count(lit(1)).as("f"))
      val tot = toks.agg(count(lit(1)).as("n"))
      val lp = freq.crossJoin(broadcast(tot))
        .select($"tok", floor(log($"f".cast("double") / $"n".cast("double")) * 1e6 + 0.5)
          .cast("long").as("lnp"))
      toks.join(lp, Seq("tok"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum($"lnp").as("s"))
        .select($"doc_id", $"n_tokens".cast("long").as("n_tokens"),
          round(-$"s".cast("double") / ($"n_tokens".cast("double") * 1e6), 6).as("avg_nll"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH toks AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok FROM documents),
      freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY tok),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
      lp AS (SELECT tok, CAST(floor(ln(CAST(f AS DOUBLE) / n) * 1e6 + 0.5) AS BIGINT) AS lnp
        FROM freq CROSS JOIN tot),
      per AS (SELECT t.doc_id, count(*) AS n_tokens, sum(l.lnp) AS s
        FROM toks t JOIN lp l ON t.tok = l.tok GROUP BY t.doc_id)
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        round(-CAST(s AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * 1e6), 6) AS avg_nll
      FROM per ORDER BY doc_id""")),

    // ----- sorted-neighborhood near-dup (SNM blocking) -------------------
    // The classic third blocking family next to LSH (q21/q26) and prefix
    // filtering (q97): sort by normalized text, compare each doc only
    // with its w-1 successors. The block key (2-char prefix of the sort
    // key) is what makes it distributed — the window partitions by block
    // and parallelism = |blocks|; lengthen the prefix to widen it at
    // corpus scale (cross-block neighbors are by construction near-misses
    // the other two families still catch). Candidate verdicts are
    // integer-exact: keep iff 2*|intersect| >= |union| (Jaccard >= 0.5
    // without the double division the round-on-double gotcha warns about).
    ("q122_sorted_neighborhood", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", TA.normText($"text").as("nt"))
        .select($"doc_id", $"nt",
          array_distinct(split($"nt", " ")).as("toks"),
          substring($"nt", 1, 2).as("blk"))
      val w = Window.partitionBy($"blk").orderBy($"nt", $"doc_id")
      // both neighbor offsets come out of ONE window pass, then explode —
      // a union of per-offset branches would recompute the scan + block
      // shuffle + window once per offset (observed in the executed plan)
      val nbr = d.select($"doc_id", $"toks",
        lead($"doc_id", 1).over(w).as("n1_id"), lead($"toks", 1).over(w).as("n1_toks"),
        lead($"doc_id", 2).over(w).as("n2_id"), lead($"toks", 2).over(w).as("n2_toks"))
      val pairs = nbr
        .select($"doc_id".as("id_a"), $"toks".as("ta"), explode(array(
          struct($"n1_id".as("id_b"), $"n1_toks".as("tb")),
          struct($"n2_id".as("id_b"), $"n2_toks".as("tb")))).as("nb"))
        .filter($"nb.id_b".isNotNull)
        .select($"id_a", $"nb.id_b".as("id_b"), $"ta", $"nb.tb".as("tb"))
      pairs
        .select($"id_a", $"id_b",
          size(array_intersect($"ta", $"tb")).cast("long").as("n_inter"),
          size(array_union($"ta", $"tb")).cast("long").as("n_union"))
        .filter(lit(2) * $"n_inter" >= $"n_union")
        .orderBy("id_a", "id_b")
    }, Some(s"""
      WITH d AS (SELECT doc_id, $normSql AS nt,
          list_distinct(string_split($normSql, ' ')) AS toks,
          substr($normSql, 1, 2) AS blk
        FROM documents),
      nbr AS (SELECT doc_id, toks,
          lead(doc_id, 1) OVER w AS n1_id, lead(toks, 1) OVER w AS n1_toks,
          lead(doc_id, 2) OVER w AS n2_id, lead(toks, 2) OVER w AS n2_toks
        FROM d WINDOW w AS (PARTITION BY blk ORDER BY nt, doc_id)),
      pairs AS (
        SELECT doc_id AS id_a, n1_id AS id_b, toks AS ta, n1_toks AS tb
          FROM nbr WHERE n1_id IS NOT NULL
        UNION ALL
        SELECT doc_id, n2_id, toks, n2_toks FROM nbr WHERE n2_id IS NOT NULL)
      SELECT id_a, id_b,
        CAST(len(list_intersect(ta, tb)) AS BIGINT) AS n_inter,
        CAST(len(list_distinct(list_concat(ta, tb))) AS BIGINT) AS n_union
      FROM pairs
      WHERE 2 * len(list_intersect(ta, tb)) >= len(list_distinct(list_concat(ta, tb)))
      ORDER BY id_a, id_b""")),

    // ----- streaming exact-dedup under the batch oracle ------------------
    // The streaming form of exact dedup (q20's continuous twin): a real
    // streaming query — file source → watermarked dropDuplicates →
    // aggregate → memory sink — whose result the gate checks against
    // batch count(DISTINCT). See EventStream.distinctUsersByType for the
    // state-bound contract.
    ("q123_stream_dedup", (s: SparkSession, dir: String) => {
      import s.implicits._
      val tmp = graft.TempScratch.symlinkDir("q123", "events.parquet",
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val stream = graft.streaming.EventStream.streamFromParquetDir(s, tmp.toString)
      val q = graft.streaming.EventStream.distinctUsersByType(stream)
        .writeStream.format("memory").queryName("q123_mem")
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table("q123_mem")
        .select($"event_type", $"n_users")
        .orderBy("event_type")
    }, Some("""
      SELECT event_type, count(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1 ORDER BY event_type""")),

    // ----- bigram conditional log-likelihood (order-2 LM scoring) --------
    // q121's order-2 sibling: each doc's average -ln p(tok | prev) under
    // the corpus's own bigram model. The denominator counts prev as a
    // CONTEXT (occurrences followed by anything — i.e. sum over tok of
    // bigram counts), so p is a true conditional distribution and every
    // doc bigram exists in the model by construction (trained on the
    // same corpus — no smoothing term needed). All joins are equi: model
    // assembly keys on the bigram's first token, scoring keys on the
    // bigram string; per the q80/q119 rule the ln is fixed to integer
    // micro-lns before the per-doc sum.
    ("q124_bigram_logprob", (s: SparkSession, dir: String) => {
      import s.implicits._
      val base = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", split(TA.normText($"text"), " ").as("a"))
        .filter(size($"a") >= 2)
      val inst = base.select($"doc_id", explode(expr(
        "transform(sequence(1, size(a) - 1), j -> named_struct(" +
          "'bg', array_join(slice(a, j, 2), ' '), 'prev', element_at(a, j)))")).as("x"))
        .select($"doc_id", $"x.bg".as("bg"), $"x.prev".as("prev"))
      val bfreq = inst.groupBy($"bg").agg(count(lit(1)).as("b"))
      val ufreq = inst.groupBy($"prev").agg(count(lit(1)).as("u"))
      val model = bfreq.join(ufreq, split($"bg", " ")(0) === $"prev")
        .select($"bg", floor(log($"b".cast("double") / $"u".cast("double")) * 1e6 + 0.5)
          .cast("long").as("lnp"))
      inst.join(model, Seq("bg"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum($"lnp").as("s"))
        .select($"doc_id", $"n_bigrams".cast("long").as("n_bigrams"),
          round(-$"s".cast("double") / ($"n_bigrams".cast("double") * 1e6), 6).as("avg_nll2"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS a FROM documents
        WHERE len(string_split($normSql, ' ')) >= 2),
      inst AS (SELECT doc_id,
          array_to_string(list_slice(a, CAST(j AS INT), CAST(j + 1 AS INT)), ' ') AS bg,
          a[CAST(j AS INT)] AS prev
        FROM (SELECT doc_id, a, unnest(range(1, len(a))) AS j FROM base)),
      bfreq AS (SELECT bg, CAST(count(*) AS BIGINT) AS b FROM inst GROUP BY bg),
      ufreq AS (SELECT prev, CAST(count(*) AS BIGINT) AS u FROM inst GROUP BY prev),
      model AS (SELECT bg, CAST(floor(ln(CAST(b AS DOUBLE) / u) * 1e6 + 0.5) AS BIGINT) AS lnp
        FROM bfreq JOIN ufreq ON string_split(bg, ' ')[1] = prev),
      per AS (SELECT i.doc_id, count(*) AS n_bigrams, sum(m.lnp) AS s
        FROM inst i JOIN model m ON i.bg = m.bg GROUP BY i.doc_id)
      SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
        round(-CAST(s AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * 1e6), 6) AS avg_nll2
      FROM per ORDER BY doc_id""")),

    // ----- one-pass per-column table profile (migration QA) --------------
    // The profiling companion to compareDb: row/null/distinct counts and
    // min/max per column in one pass. Deliberately NOT the wide
    // multi-count-distinct aggregate — Spark expands that to |cols|
    // copies of every row before the shuffle (Expand operator, m-times
    // the shuffle volume at 100 TB). Instead: stack-unpivot to
    // (col_name, value), aggregate per value (map-side combinable, this
    // dedups BEFORE the second shuffle), then roll up per column.
    // Values travel as strings so one schema fits every column; binary
    // UTF8 min/max ordering agrees between the engines.
    ("q125_table_profile", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "orders")
        .select(expr(
          "stack(4, " +
            "'o_orderstatus', cast(o_orderstatus as string), " +
            "'o_orderpriority', cast(o_orderpriority as string), " +
            "'o_custkey', cast(o_custkey as string), " +
            "'o_totalprice', cast(o_totalprice as string)) as (col_name, v)"))
        .groupBy($"col_name", $"v").agg(count(lit(1)).as("c"))
        .groupBy($"col_name")
        .agg(sum($"c").cast("long").as("n_rows"),
          sum(when($"v".isNull, $"c").otherwise(0L)).cast("long").as("n_null"),
          count(when($"v".isNotNull, lit(1))).cast("long").as("n_distinct"),
          min($"v").as("min_v"), max($"v").as("max_v"))
        .orderBy("col_name")
    }, Some("""
      WITH up AS (
        SELECT 'o_orderstatus' AS col_name, CAST(o_orderstatus AS VARCHAR) AS v FROM orders
        UNION ALL SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR) FROM orders
        UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        UNION ALL SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR) FROM orders),
      per_val AS (SELECT col_name, v, count(*) AS c FROM up GROUP BY col_name, v)
      SELECT col_name,
        CAST(sum(c) AS BIGINT) AS n_rows,
        CAST(sum(CASE WHEN v IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_null,
        CAST(count(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT) AS n_distinct,
        min(v) AS min_v, max(v) AS max_v
      FROM per_val GROUP BY col_name ORDER BY col_name""")),

    // ----- robust length outliers: exact median/MAD from histograms ------
    // Quality-filter signal: per-source token-length median and MAD and
    // the docs beyond 3 MADs. The medians are EXACT but never buffer a
    // group's values (percentile_cont's sort-buffering aggregate does,
    // which is why q49's shape would not survive a 100 TB group):
    // aggregate to a (source, value, count) histogram — bounded by
    // |sources| x |distinct lengths|, both small — and read the median
    // off the cumulative window. The deviation histogram repeats the
    // trick around the median. Integer values and half-step medians keep
    // every comparison exact in IEEE double on both engines.
    ("q126_robust_outliers", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"source",
          size(split(TA.normText($"text"), " ")).cast("long").as("v"))
      def histMedian(df: DataFrame, valCol: String, out: String): DataFrame = {
        val hist = df.groupBy($"source", col(valCol)).agg(count(lit(1)).as("c"))
        val wCum = Window.partitionBy($"source").orderBy(col(valCol))
        val wTot = Window.partitionBy($"source")
        hist
          .withColumn("cum", sum($"c").over(wCum))
          .withColumn("tot", sum($"c").over(wTot))
          .groupBy($"source")
          .agg(((min(when($"cum" >= floor(($"tot" + 1) / 2), col(valCol))) +
            min(when($"cum" >= floor($"tot" / 2) + 1, col(valCol)))) / 2.0).as(out))
      }
      val med = histMedian(d, "v", "median_v")
      val dev = d.join(med, Seq("source"))
        .select($"source", abs($"v".cast("double") - $"median_v").as("dv"))
      val mad = histMedian(dev, "dv", "mad_v")
      d.join(med, Seq("source")).join(mad, Seq("source"))
        .groupBy($"source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          min($"median_v").as("median_tokens"),
          min($"mad_v").as("mad_tokens"),
          sum(when(abs($"v".cast("double") - $"median_v") > lit(3) * $"mad_v", 1L)
            .otherwise(0L)).cast("long").as("n_outliers"))
        .orderBy("source")
    }, Some(s"""
      WITH d AS (SELECT doc_id, source,
          CAST(len(string_split($normSql, ' ')) AS BIGINT) AS v FROM documents),
      hist AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY source, v),
      win AS (SELECT source, v, c,
          sum(c) OVER (PARTITION BY source ORDER BY v) AS cum,
          sum(c) OVER (PARTITION BY source) AS tot
        FROM hist),
      med AS (SELECT source,
          (min(CASE WHEN cum >= floor((tot + 1) / 2) THEN v END)
           + min(CASE WHEN cum >= floor(tot / 2) + 1 THEN v END)) / 2.0 AS median_v
        FROM win GROUP BY source),
      dev AS (SELECT d.source, abs(CAST(d.v AS DOUBLE) - m.median_v) AS dv,
          CAST(count(*) AS BIGINT) AS c
        FROM d JOIN med m ON d.source = m.source GROUP BY d.source, dv),
      dwin AS (SELECT source, dv, c,
          sum(c) OVER (PARTITION BY source ORDER BY dv) AS cum,
          sum(c) OVER (PARTITION BY source) AS tot
        FROM dev),
      mad AS (SELECT source,
          (min(CASE WHEN cum >= floor((tot + 1) / 2) THEN dv END)
           + min(CASE WHEN cum >= floor(tot / 2) + 1 THEN dv END)) / 2.0 AS mad_v
        FROM dwin GROUP BY source)
      SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        min(m.median_v) AS median_tokens, min(x.mad_v) AS mad_tokens,
        CAST(sum(CASE WHEN abs(CAST(d.v AS DOUBLE) - m.median_v) > 3 * x.mad_v
          THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM d JOIN med m ON d.source = m.source JOIN mad x ON d.source = x.source
      GROUP BY d.source ORDER BY d.source""")),

    // ----- domain drift: per-source KL divergence from the corpus --------
    // Distribution-shift monitor: KL(p_source || p_corpus) over unigram
    // distributions, in nats. Rewritten for exactness as
    // (1/n) * sum_t f_t * [micro_ln(f_t/n) - micro_ln(g_t/m)] — the
    // per-token factor is an INTEGER (count x micro-ln difference), so
    // the shuffle-order-sensitive double sum the naive p*ln(p/q) form
    // would need never appears (the q80/q119 rule). Both aggregates and
    // the join key on (source,) token; the corpus total is an in-DAG
    // broadcast scalar (q86 rule).
    ("q127_kl_drift", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", explode(split(TA.normText($"text"), " ")).as("tok"))
      val src = toks.groupBy($"source", $"tok").agg(count(lit(1)).as("f"))
      val srcn = src.groupBy($"source").agg(sum($"f").as("n"))
      val corp = toks.groupBy($"tok").agg(count(lit(1)).as("g"))
      val m = toks.agg(count(lit(1)).as("m"))
      src.join(srcn, Seq("source")).join(corp, Seq("tok")).crossJoin(broadcast(m))
        .select($"source", $"f",
          (floor(log($"f".cast("double") / $"n".cast("double")) * 1e6 + 0.5).cast("long")
            - floor(log($"g".cast("double") / $"m".cast("double")) * 1e6 + 0.5).cast("long"))
            .as("dln"))
        .groupBy($"source")
        .agg(sum($"f" * $"dln").as("s"), sum($"f").cast("long").as("n_tokens"))
        .select($"source", $"n_tokens",
          round($"s".cast("double") / ($"n_tokens".cast("double") * 1e6), 6).as("kl_nats"))
        .orderBy("source")
    }, Some(s"""
      WITH toks AS (SELECT source, unnest(string_split($normSql, ' ')) AS tok FROM documents),
      src AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY source, tok),
      srcn AS (SELECT source, CAST(sum(f) AS BIGINT) AS n FROM src GROUP BY source),
      corp AS (SELECT tok, CAST(count(*) AS BIGINT) AS g FROM toks GROUP BY tok),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM toks),
      terms AS (SELECT s.source, s.f,
          CAST(floor(ln(CAST(s.f AS DOUBLE) / sn.n) * 1e6 + 0.5) AS BIGINT)
            - CAST(floor(ln(CAST(c.g AS DOUBLE) / m.m) * 1e6 + 0.5) AS BIGINT) AS dln
        FROM src s JOIN srcn sn ON s.source = sn.source
        JOIN corp c ON s.tok = c.tok CROSS JOIN m),
      agg AS (SELECT source, sum(f * dln) AS s, CAST(sum(f) AS BIGINT) AS n FROM terms GROUP BY source)
      SELECT source, n AS n_tokens,
        round(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6) AS kl_nats
      FROM agg ORDER BY source""")),

    // ----- heavy hitters: top-3 values per profiled column ---------------
    // q125's companion: the most frequent values per column with counts,
    // ties broken by value. The rank<=k filter compiles to
    // WindowGroupLimit, so each map task forwards at most k rows per
    // column ahead of the shuffle — the shuffle is |cols| x k rows no
    // matter how large the table (plan-asserted).
    ("q128_heavy_hitters", (s: SparkSession, dir: String) => {
      import s.implicits._
      val cnt = Tables.t(s, dir, "orders")
        .select(expr(
          "stack(3, " +
            "'o_orderstatus', cast(o_orderstatus as string), " +
            "'o_orderpriority', cast(o_orderpriority as string), " +
            "'o_clerk', cast(o_custkey % 100 as string)) as (col_name, v)"))
        .filter($"v".isNotNull)
        .groupBy($"col_name", $"v").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy($"col_name").orderBy($"c".desc, $"v")
      cnt.withColumn("r", row_number().over(w))
        .filter($"r" <= 3)
        .select($"col_name", $"r".cast("long").as("rnk"), $"v".as("value"), $"c".as("n"))
        .orderBy("col_name", "rnk")
    }, Some("""
      WITH up AS (
        SELECT 'o_orderstatus' AS col_name, CAST(o_orderstatus AS VARCHAR) AS v FROM orders
        UNION ALL SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR) FROM orders
        UNION ALL SELECT 'o_clerk', CAST(o_custkey % 100 AS VARCHAR) FROM orders),
      cnt AS (SELECT col_name, v, CAST(count(*) AS BIGINT) AS c FROM up
        WHERE v IS NOT NULL GROUP BY col_name, v),
      rk AS (SELECT col_name, v, c,
          row_number() OVER (PARTITION BY col_name ORDER BY c DESC, v) AS r FROM cnt)
      SELECT col_name, CAST(r AS BIGINT) AS rnk, v AS value, c AS n
      FROM rk WHERE r <= 3 ORDER BY col_name, rnk""")),

    // ----- temporal novelty: first-seen n-gram attribution ---------------
    // The ingest-order twin of q115's symmetric dup-gram rate: treating
    // doc_id as arrival order, how much of each doc's content is NEW —
    // grams whose first-seen doc is this one. The signal an incremental
    // ingestion pipeline thresholds to drop low-novelty arrivals. min()
    // per gram is a two-phase aggregate; the attribution join keys on
    // the gram string and is co-partitioned with it; the only doc_id
    // shuffle is the final rollup.
    ("q129_temporal_novelty", (s: SparkSession, dir: String) => {
      import s.implicits._
      val n = 5
      val grams = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", split(TA.normText($"text"), " ").as("a"))
        .filter(size($"a") >= n)
        .select($"doc_id", explode(expr(
          s"transform(sequence(1, size(a) - ${n - 1}), j -> array_join(slice(a, j, $n), ' '))"))
          .as("g"))
        .distinct()
      val first = grams.groupBy($"g").agg(min($"doc_id").as("first_doc"))
      grams.join(first, Seq("g"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).cast("long").as("n_grams"),
          sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).cast("long").as("n_novel"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS a FROM documents
        WHERE len(string_split($normSql, ' ')) >= 5),
      grams AS (SELECT DISTINCT doc_id,
          array_to_string(list_slice(a, CAST(j AS INT), CAST(j + 4 AS INT)), ' ') AS g
        FROM (SELECT doc_id, a, unnest(range(1, len(a) - 3)) AS j FROM base)),
      first AS (SELECT g, CAST(min(doc_id) AS BIGINT) AS first_doc FROM grams GROUP BY g)
      SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        CAST(sum(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      FROM grams gr JOIN first f ON gr.g = f.g
      GROUP BY gr.doc_id ORDER BY gr.doc_id""")),

    // ----- embedding cluster cohesion (within-label variance) ------------
    // Label-quality metric for the embeddings table: average squared
    // distance to the label centroid, via the exact identity
    // E||x-c||^2 = E||x||^2 - ||c||^2 with ||c||^2 = (sum_d S_d^2)/n^2 —
    // chosen over the direct form because sum_d (S_d/n)^2 is an
    // order-sensitive double sum. Values are quantized to integer-valued
    // doubles (the q101 rule: every sum exact in IEEE double regardless
    // of shuffle order); the only non-integer arithmetic is the final
    // fixed-formula division. One explode + two hash aggregates + a
    // per-label join — no per-vector state, scales to any corpus.
    ("q130_cluster_cohesion", (s: SparkSession, dir: String) => {
      import s.implicits._
      val dims = Tables.spread(Tables.t(s, dir, "embeddings"))
        .select($"vec_id", $"label",
          posexplode($"embedding").as(Seq("j0", "x")))
        .select($"vec_id", $"label", ($"j0" + 1).as("j"),
          round($"x".cast("double") * 10000).as("v"))
      val sd2 = dims.groupBy($"label", $"j").agg(sum($"v").as("sd"))
        .groupBy($"label").agg(sum($"sd" * $"sd").as("sd2"))
      val lab = dims.groupBy($"label")
        .agg(sum($"v" * $"v").as("v2"), (count(lit(1)) / 64).as("n"))
      lab.join(sd2, Seq("label"))
        .select($"label", $"n".cast("long").as("n_vecs"),
          round(($"v2" / $"n" - $"sd2" / ($"n" * $"n")) / 1e8, 4).as("cohesion"))
        .orderBy("label")
    }, Some("""
      WITH q AS (SELECT vec_id, label, j,
          round(CAST(embedding[CAST(j AS INT)] AS DOUBLE) * 10000) AS v
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(j)),
      dims AS (SELECT label, j, sum(v) AS sd FROM q GROUP BY label, j),
      sd2 AS (SELECT label, sum(sd * sd) AS sd2 FROM dims GROUP BY label),
      lab AS (SELECT label, sum(v * v) AS v2, count(*) / 64 AS n FROM q GROUP BY label)
      SELECT l.label, CAST(l.n AS BIGINT) AS n_vecs,
        round((l.v2 / l.n - s.sd2 / (l.n * l.n)) / 1e8, 4) AS cohesion
      FROM lab l JOIN sd2 s ON l.label = s.label ORDER BY l.label""")),

    // ----- embedding cluster separation (pairwise centroid distances) ----
    // q130's companion: squared distance between every pair of label
    // centroids. Centroids are rounded to INTEGER-quantized coordinates
    // first, so the 64-term distance sum is exact in IEEE double in any
    // aggregation order (the raw S_d/n centroids would make it an
    // order-sensitive double sum). The pair join is an equi-join on the
    // dimension index over the |labels| x dims centroid table — bounded
    // regardless of corpus size.
    ("q131_cluster_separation", (s: SparkSession, dir: String) => {
      import s.implicits._
      val cent = Tables.spread(Tables.t(s, dir, "embeddings"))
        .select($"label", posexplode($"embedding").as(Seq("j0", "x")))
        .select($"label", ($"j0" + 1).as("j"),
          round($"x".cast("double") * 10000).as("v"))
        .groupBy($"label", $"j")
        .agg(round(sum($"v") / count(lit(1))).as("c"))
      val a = cent.select($"label".as("la"), $"j", $"c".as("ca"))
      val b = cent.select($"label".as("lb"), $"j", $"c".as("cb"))
      a.join(b, Seq("j")).filter($"la" < $"lb")
        .groupBy($"la", $"lb")
        .agg(sum(($"ca" - $"cb") * ($"ca" - $"cb")).as("d2"))
        .select($"la".as("label_a"), $"lb".as("label_b"),
          round($"d2" / 1e8, 4).as("centroid_dist2"))
        .orderBy("label_a", "label_b")
    }, Some("""
      WITH q AS (SELECT label, j, round(CAST(embedding[CAST(j AS INT)] AS DOUBLE) * 10000) AS v
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(j)),
      cent AS (SELECT label, j, round(sum(v) / count(*)) AS c FROM q GROUP BY label, j),
      pairs AS (SELECT a.label AS la, b.label AS lb,
          sum((a.c - b.c) * (a.c - b.c)) AS d2
        FROM cent a JOIN cent b ON a.j = b.j AND a.label < b.label
        GROUP BY a.label, b.label)
      SELECT la AS label_a, lb AS label_b,
        round(d2 / 1e8, 4) AS centroid_dist2
      FROM pairs ORDER BY label_a, label_b""")),

    // ----- paragraph-level exact dedup (CCNet-style) ---------------------
    // Documents are split into fixed 10-word blocks ("paragraphs" — the
    // corpus has no newline structure); a block that occurs verbatim in
    // MORE THAN ONE document is removed everywhere, and the surviving
    // blocks are reassembled in order. Both heavy steps key on the block
    // text itself — the frequency aggregate and the join back are
    // co-partitioned equi-joins, so there is no cross join at any corpus
    // size; the reassembly collect_list is bounded by a single document's
    // block count. The cleaned text is reported as an md5 so row width
    // stays O(1) regardless of document size.
    ("q132_paragraph_dedup", (s: SparkSession, dir: String) => {
      import s.implicits._
      val B = 10
      val blocks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", split(TA.normText($"text"), " ").as("a"))
        .select($"doc_id", $"a", size($"a").as("n"))
        .select($"doc_id", explode(expr(s"sequence(1, n, $B)")).as("j"), $"a")
        .select($"doc_id", $"j", expr(s"array_join(slice(a, j, $B), ' ')").as("blk"))
      val dup = blocks.groupBy($"blk").agg(countDistinct($"doc_id").as("nd"))
      blocks.join(dup, Seq("blk"))
        .groupBy($"doc_id")
        .agg(
          count(lit(1)).as("n_blocks"),
          sum(when($"nd" > 1, 1L).otherwise(0L)).as("n_removed"),
          // collect_list skips the NULLs the `when` produces for removed
          // blocks; array_sort on struct(j, blk) restores document order
          md5(array_join(
            expr("transform(array_sort(collect_list(CASE WHEN nd <= 1 THEN struct(j, blk) END)), s -> s.blk)"),
            " ")).as("clean_hash"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS a FROM documents),
      blks AS (SELECT doc_id, j,
          array_to_string(list_slice(a, CAST(j AS INT), CAST(least(j + 9, len(a)) AS INT)), ' ') AS blk
        FROM base, unnest(range(1, len(a) + 1, 10)) AS t(j)),
      dup AS (SELECT blk, count(DISTINCT doc_id) AS nd FROM blks GROUP BY blk)
      SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
        CAST(sum(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        md5(coalesce(string_agg(CASE WHEN d.nd <= 1 THEN b.blk END, ' ' ORDER BY b.j), '')) AS clean_hash
      FROM blks b JOIN dup d ON b.blk = d.blk
      GROUP BY b.doc_id ORDER BY doc_id""")),

    // ----- duplicated-span coverage (interval-merge islands) -------------
    // The span-level view of q115: every word 3-gram window that also
    // occurs in another document marks the interval [j, j+2]; per document
    // we report how many token positions the UNION of those intervals
    // covers (overlapping windows are merged via the classic
    // islands-and-gaps running-max, one window pass per document). This is
    // the exact-substring-dedup coverage statistic: q115 counts duplicated
    // grams, this measures how much of each document they blanket.
    ("q133_dup_span_coverage", (s: SparkSession, dir: String) => {
      import s.implicits._
      val base = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", split(TA.normText($"text"), " ").as("a"))
        .select($"doc_id", $"a", size($"a").cast("long").as("n_tokens"))
      val wins = base.filter($"n_tokens" >= 3)
        .select($"doc_id", explode(expr("sequence(1, size(a) - 2)")).as("j"), $"a")
        .select($"doc_id", $"j", ($"j" + 2).as("e"),
          expr("array_join(slice(a, j, 3), ' ')").as("gram"))
      val freq = wins.groupBy($"gram").agg(countDistinct($"doc_id").as("nd"))
      val dupWins = wins.join(freq, Seq("gram")).filter($"nd" > 1)
        .select($"doc_id", $"j", $"e")
      val byDoc = Window.partitionBy($"doc_id").orderBy($"j")
      val prevMax = max($"e").over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
      val islands = dupWins
        .withColumn("ni", when(prevMax.isNull || $"j" > prevMax, 1).otherwise(0))
        .withColumn("iid", sum($"ni").over(byDoc))
        .groupBy($"doc_id", $"iid")
        .agg((max($"e") - min($"j") + 1).as("ilen"))
        .groupBy($"doc_id")
        .agg(sum($"ilen").cast("long").as("covered"))
      base.select($"doc_id", $"n_tokens")
        .join(islands, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tokens",
          coalesce($"covered", lit(0L)).as("covered"),
          (coalesce($"covered", lit(0L)).cast("double") / $"n_tokens").as("dup_coverage"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS a FROM documents),
      docs AS (SELECT doc_id, CAST(len(a) AS BIGINT) AS n_tokens FROM base),
      wins AS (SELECT doc_id, j, j + 2 AS e,
          array_to_string(list_slice(a, CAST(j AS INT), CAST(j + 2 AS INT)), ' ') AS gram
        FROM base, unnest(range(1, len(a) - 1)) AS t(j) WHERE len(a) >= 3),
      freq AS (SELECT gram, count(DISTINCT doc_id) AS nd FROM wins GROUP BY gram),
      dup AS (SELECT w.doc_id, w.j, w.e FROM wins w JOIN freq f ON w.gram = f.gram WHERE f.nd > 1),
      isl AS (SELECT doc_id, j, e, CASE WHEN
          max(e) OVER (PARTITION BY doc_id ORDER BY j ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
          OR j > max(e) OVER (PARTITION BY doc_id ORDER BY j ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          THEN 1 ELSE 0 END AS ni FROM dup),
      isl2 AS (SELECT doc_id, j, e, sum(ni) OVER (PARTITION BY doc_id ORDER BY j) AS iid FROM isl),
      per AS (SELECT doc_id, iid, max(e) - min(j) + 1 AS ilen FROM isl2 GROUP BY doc_id, iid),
      cov AS (SELECT doc_id, CAST(sum(ilen) AS BIGINT) AS covered FROM per GROUP BY doc_id)
      SELECT d.doc_id, d.n_tokens,
        CAST(coalesce(c.covered, 0) AS BIGINT) AS covered,
        CAST(coalesce(c.covered, 0) AS DOUBLE) / d.n_tokens AS dup_coverage
      FROM docs d LEFT JOIN cov c USING (doc_id) ORDER BY doc_id""")),

    // ----- BPE merge-step statistics -------------------------------------
    // One iteration of byte-pair-encoding vocabulary induction: the
    // corpus-wide frequency of every adjacent character pair, weighted by
    // word frequency. The key scale property is the word-frequency
    // aggregate FIRST — pairs explode over the (bounded) vocabulary, not
    // over the corpus, so a 100 TB corpus costs one token aggregate plus
    // work proportional to |vocab|. Top-32 via TakeOrderedAndProject
    // (no global sort).
    ("q134_bpe_pairs", (s: SparkSession, dir: String) => {
      import s.implicits._
      val wf = Tables.spread(Tables.t(s, dir, "documents"))
        .select(explode(split(TA.normText($"text"), " ")).as("w"))
        .filter(length($"w") >= 2)
        .groupBy($"w").agg(count(lit(1)).as("f"))
      wf.select($"f", explode(expr(
          "transform(sequence(1, length(w) - 1), j -> substring(w, j, 2))")).as("pair"))
        .groupBy($"pair").agg(sum($"f").as("pair_count"))
        .orderBy($"pair_count".desc, $"pair")
        .limit(32)
        .select($"pair", $"pair_count")
    }, Some(s"""
      WITH toks AS (SELECT unnest(string_split($normSql, ' ')) AS w FROM documents),
      wf AS (SELECT w, count(*) AS f FROM toks WHERE len(w) >= 2 GROUP BY w),
      pairs AS (SELECT substr(w, CAST(j AS INT), 2) AS pair, f
        FROM wf, unnest(range(1, len(w))) AS t(j))
      SELECT pair, CAST(sum(f) AS BIGINT) AS pair_count FROM pairs
      GROUP BY pair ORDER BY pair_count DESC, pair LIMIT 32""")),

    // ----- hard-negative mining (label-excluded top-k similarity) --------
    // Contrastive-training data prep: for each query vector, the k most
    // cosine-similar vectors with a DIFFERENT label — similar enough to be
    // confused, labeled differently, i.e. hard negatives. Same integer
    // quantization as q24 (exact dot products), query side broadcast so
    // the candidate scan never shuffles, WindowGroupLimit caps the
    // shuffle at |Q|*k rows.
    ("q135_hard_negatives", (s: SparkSession, dir: String) => {
      import s.implicits._
      val p = Tables.spread(Tables.t(s, dir, "embeddings"))
        .select($"vec_id".as("id"), $"label",
          graft.ext.Similarity.quantize($"embedding").as("qvec"))
        .withColumn("n2", graft.functions.Lambda.bind1(col("qvec"))(a =>
          graft.ext.Similarity.norm2(a)))
      val q = p.filter($"id" % 50 === 0)
        .select($"id".as("q_id"), $"label".as("q_label"),
          $"qvec".as("q_vec"), $"n2".as("q_n2"))
      val c = p.select($"id".as("c_id"), $"label".as("c_label"),
        $"qvec".as("c_vec"), $"n2".as("c_n2"))
      val scored = c.crossJoin(broadcast(q))
        .filter($"q_label" =!= $"c_label")
        .select($"q_id", $"c_id", $"c_label",
          graft.ext.Similarity.cosine(
            graft.ext.Similarity.dot($"q_vec", $"c_vec"),
            $"q_n2", $"c_n2").as("cos_sim"))
      val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"c_id")
      scored.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
        .select($"q_id", $"rnk", $"c_id", $"c_label", $"cos_sim")
        .orderBy("q_id", "rnk")
    }, Some("""
      WITH p AS (SELECT vec_id, label,
          list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 10000)) AS qvec
        FROM embeddings),
      n AS (SELECT vec_id, label, qvec, list_dot_product(qvec, qvec) AS n2 FROM p),
      q AS (SELECT * FROM n WHERE vec_id % 50 = 0),
      scored AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id, c.label AS c_label,
          list_dot_product(q.qvec, c.qvec) / sqrt(q.n2 * c.n2) AS cos_sim
        FROM n c, q WHERE q.label <> c.label),
      r AS (SELECT q_id, c_id, c_label, cos_sim,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk FROM scored)
      SELECT q_id, rnk, c_id, c_label, cos_sim FROM r WHERE rnk <= 3 ORDER BY q_id, rnk""")),

    // ----- near-dup graph degree distribution ----------------------------
    // Ops view of the q21 dedup graph: how many documents participate in
    // exactly d near-duplicate relationships. A long-tailed degree
    // distribution is the early-warning signal for a template/boilerplate
    // cluster that will blow up transitive dedup (one degree-10k hub =
    // a 10k-document connected component). Pairs come from the same
    // band equi-join pipeline as q21; the degree rollup is two bounded
    // hash aggregates on top.
    ("q136_dedup_degree_dist", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id".as("id"),
          graft.functions.WordShingleHash32(TA.normText($"text"), 3).as("hs"))
      Dedup.minhashLshPairsHashed(docs, nBands = 4, threshold = 0.5)
        .select(explode(array($"id_a", $"id_b")).as("id"))
        .groupBy($"id").agg(count(lit(1)).as("degree"))
        .groupBy($"degree").agg(count(lit(1)).as("n_docs"))
        .orderBy("degree")
    }, Some(s"""
      $minhashCandCte,
      verified AS (SELECT id_a, id_b FROM cand
        JOIN hst ha ON ha.doc_id = id_a
        JOIN hst hb ON hb.doc_id = id_b
        WHERE len(list_intersect(ha.hs, hb.hs)) / len(list_distinct(list_concat(ha.hs, hb.hs))) >= 0.5),
      deg AS (SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
          SELECT id_a AS id FROM verified UNION ALL SELECT id_b AS id FROM verified)
        GROUP BY id)
      SELECT degree, CAST(count(*) AS BIGINT) AS n_docs FROM deg
      GROUP BY degree ORDER BY degree""")),

    // ----- boilerplate prefix clusters -----------------------------------
    // Crawl-dedup heuristic: documents sharing their first five normalized
    // words verbatim are usually template instances (mirrors, generated
    // pages). One hash aggregate keyed on the prefix string — the prefix
    // IS the blocking key, so the operator is a pure groupBy at any
    // corpus size; no pairwise anything.
    ("q137_prefix_clusters", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id",
          array_join(slice(split(TA.normText($"text"), " "), 1, 5), " ").as("prefix5"))
        .groupBy($"prefix5")
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("keep_id"))
        .filter($"n_docs" > 1)
        .orderBy("keep_id")
    }, Some(s"""
      SELECT array_to_string(list_slice(string_split($normSql, ' '), 1, 5), ' ') AS prefix5,
        CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keep_id
      FROM documents GROUP BY prefix5 HAVING count(*) > 1 ORDER BY keep_id""")),

    // ----- per-source length deciles -------------------------------------
    // Mixture-design input: the n_chars decile boundaries and populations
    // within each source (ntile(10), ties broken by doc_id so the split
    // is engine-deterministic). One window pass + one aggregate; the
    // window is partitioned by source, so at scale each source's sort is
    // its own shuffle partition set.
    ("q138_length_deciles", (s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"n_chars", $"doc_id")
      Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", $"doc_id", $"n_chars", ntile(10).over(w).as("decile"))
        .groupBy($"source", $"decile")
        .agg(count(lit(1)).as("n_docs"),
          min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"))
        .orderBy("source", "decile")
    }, Some("""
      WITH t AS (SELECT source, doc_id, n_chars,
        ntile(10) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS decile
        FROM documents)
      SELECT source, decile, CAST(count(*) AS BIGINT) AS n_docs,
        min(n_chars) AS min_chars, max(n_chars) AS max_chars
      FROM t GROUP BY source, decile ORDER BY source, decile""")),

    // ----- minhash sketch calibration ------------------------------------
    // Sketch-quality audit: for every LSH candidate pair, the Jaccard the
    // 8-component signature ESTIMATES (matching components / 8) next to
    // the exact shingle Jaccard. Systematic est-vs-exact gaps mean the
    // band/seed budget is mis-sized for the corpus before anyone trusts
    // q21's threshold. Same shapes as the q21 pipeline: band equi-join
    // candidates, narrow pair rows, signatures joined back by id.
    ("q139_minhash_calibration", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id".as("id"),
          graft.functions.WordShingleHash32(TA.normText($"text"), 3).as("hs"))
      Dedup.minhashCalibration(docs, nBands = 4).orderBy("id_a", "id_b")
    }, Some(s"""
      $minhashCandCte,
      est AS (SELECT id_a, id_b,
          CAST(${(0 until 8).map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")} AS DOUBLE) / 8 AS est_jaccard
        FROM cand JOIN mh a ON a.doc_id = id_a JOIN mh b ON b.doc_id = id_b)
      SELECT e.id_a, e.id_b, e.est_jaccard,
        len(list_intersect(ha.hs, hb.hs)) / len(list_distinct(list_concat(ha.hs, hb.hs))) AS exact_jaccard
      FROM est e JOIN hst ha ON ha.doc_id = e.id_a JOIN hst hb ON hb.doc_id = e.id_b
      ORDER BY id_a, id_b""")),

    // ----- fixed-size priority sample per source -------------------------
    // Bottom-k (priority) sampling: exactly 5 documents per source, chosen
    // by md5-hash order — the distributed fixed-size-per-group sampler
    // (q42's Bernoulli gate yields a RATE, not a size). The rank<=k filter
    // compiles to WindowGroupLimit, so each map task forwards at most k
    // rows per source into the shuffle regardless of corpus size.
    ("q140_priority_sample", (s: SparkSession, dir: String) => {
      import s.implicits._
      val h = md5($"doc_id".cast("string"))
      val w = Window.partitionBy($"source").orderBy(h, $"doc_id")
      Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", $"doc_id", row_number().over(w).as("pick"))
        .filter($"pick" <= 5)
        .orderBy("source", "pick")
    }, Some("""
      WITH r AS (SELECT source, doc_id,
        row_number() OVER (PARTITION BY source
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick
        FROM documents)
      SELECT source, doc_id, pick FROM r WHERE pick <= 5 ORDER BY source, pick""")),

    // ----- partitioned layout + partition-pruned read --------------------
    // The table-layout story at 100 TB: documents written
    // `partitionBy(source)`, then read back with a partition predicate.
    // The predicate must resolve at PLANNING time from the directory
    // structure (PartitionFilters in the scan, asserted in
    // PlanQualitySpec) — at scale this is the difference between listing
    // one directory and scanning the corpus. The n_chars predicate rides
    // alongside as an ordinary pushed filter.
    ("q141_partition_prune", (s: SparkSession, dir: String) => {
      import s.implicits._
      val tmp = graft.TempScratch.dir("q141").toString
      Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"n_chars", $"source")
        .write.mode("overwrite").partitionBy("source").parquet(tmp)
      s.read.parquet(tmp)
        .filter($"source" === "src3" && $"n_chars" >= 100)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"),
          min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
        .orderBy("source")
    }, Some("""
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM documents WHERE source = 'src3' AND n_chars >= 100
      GROUP BY source ORDER BY source""")),

    // ----- bucketed co-located join (zero-shuffle) -----------------------
    // Both sides written `bucketBy(8, custkey)` into the session catalog;
    // the join then consumes the bucketing as its distribution — NO
    // exchange below the SortMergeJoin (plan-asserted). This is the
    // pre-partitioning answer to the biggest 100 TB cost in the battery:
    // a fact-dimension join that would otherwise shuffle the fact table
    // every run is shuffled ONCE at write time and never again.
    ("q142_bucketed_join", (s: SparkSession, dir: String) => {
      import s.implicits._
      // drop both catalog entry AND location: a previous JVM's managed
      // table survives as a directory this session's in-memory catalog
      // has never heard of, and CTAS refuses an occupied location
      Seq("g_orders_bkt", "g_customer_bkt").foreach { name =>
        s.sql(s"DROP TABLE IF EXISTS $name")
        val p = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), name)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      Tables.t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey")
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("g_orders_bkt")
      Tables.t(s, dir, "customer")
        .select($"c_custkey", $"c_mktsegment")
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("g_customer_bkt")
      s.table("g_orders_bkt").hint("merge")
        .join(s.table("g_customer_bkt"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct($"o_custkey").as("n_custs"),
          min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"))
        .orderBy("c_mktsegment")
    }, Some("""
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
        min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ----- ORC sink/source round trip ------------------------------------
    // The second columnar format the engine speaks natively: lineitem
    // written to ORC, read back with a pushed predicate (asserted), and
    // aggregated under the q01 decimal-exact sum rule. The values survive
    // the round trip bit-identically (same IEEE doubles in both formats),
    // so the oracle reads the original parquet.
    ("q143_orc_roundtrip", (s: SparkSession, dir: String) => {
      import s.implicits._
      val tmp = graft.TempScratch.dir("q143").toString
      Tables.t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_quantity", $"l_returnflag")
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .filter($"l_quantity" >= 25)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum($"l_quantity".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast(org.apache.spark.sql.types.DecimalType(38, 2))
            .cast("double").as("sum_qty"),
          min($"l_orderkey").as("min_key"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
        min(l_orderkey) AS min_key
      FROM lineitem WHERE l_quantity >= 25
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ----- native session_window sessionization --------------------------
    // q28 builds sessions by hand (lag + islands); this is Spark's native
    // session_window aggregate — merge-on-overlap semantics where an
    // event landing EXACTLY gap seconds after the previous one still
    // merges (closed right edge; verified empirically — two events
    // 1800 s apart form ONE session), so the island rule is > 1800,
    // identical to q28's. sf0.1 exercises this boundary: an earlier
    // >= 1800 oracle split one real 1800 s gap Spark merges. Two hash
    // aggregates, both keyed on user_id — one shuffle, reused.
    ("q144_session_window_native", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .select($"user_id", date_trunc("second", $"ts").as("tsec"))
        .groupBy($"user_id", session_window($"tsec", "30 minutes"))
        .agg(count(lit(1)).as("sess_events"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"), sum($"sess_events").as("n_events"),
          max($"sess_events").as("max_sess_events"))
        .orderBy("user_id")
    }, Some("""
      WITH e AS (SELECT user_id, event_id,
        CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec FROM events),
      f AS (SELECT user_id, event_id, tsec,
        CASE WHEN lag(tsec) OVER (PARTITION BY user_id ORDER BY tsec, event_id) IS NULL
               OR tsec - lag(tsec) OVER (PARTITION BY user_id ORDER BY tsec, event_id) > 1800
             THEN 1 ELSE 0 END AS ns FROM e),
      g AS (SELECT user_id,
        sum(ns) OVER (PARTITION BY user_id ORDER BY tsec, event_id) AS sid FROM f),
      per AS (SELECT user_id, sid, count(*) AS sess_events FROM g GROUP BY user_id, sid)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        CAST(sum(sess_events) AS BIGINT) AS n_events,
        CAST(max(sess_events) AS BIGINT) AS max_sess_events
      FROM per GROUP BY user_id ORDER BY user_id""")),

    // ----- streaming stream-static enrichment join under the gate --------
    // The streaming star-join: events stream in, the customer dimension
    // is static and broadcast into every micro-batch. Aggregation in
    // complete mode makes the result arrival-order-independent, so the
    // batch join is the exact oracle (q67's pattern, extended from
    // plain aggregation to join + aggregation).
    ("q145_stream_static_join", (s: SparkSession, dir: String) => {
      import s.implicits._
      val tmp = graft.TempScratch.symlinkDir("q145", "events.parquet",
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val stream = graft.streaming.EventStream.streamFromParquetDir(s, tmp.toString)
      val dim = Tables.t(s, dir, "customer").select($"c_custkey", $"c_mktsegment")
      val q = graft.streaming.EventStream.enrichedTypeCounts(stream, dim)
        .writeStream.format("memory").queryName("q145_mem")
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table("q145_mem")
        .select($"c_mktsegment", $"event_type", $"n_events")
        .orderBy("c_mktsegment", "event_type")
    }, Some("""
      SELECT c_mktsegment, event_type, count(*) AS n_events
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY c_mktsegment, event_type ORDER BY c_mktsegment, event_type""")),

    // ----- dynamic partition pruning -------------------------------------
    // The third leg of the layout story (q141 static prune, q142
    // bucketing): the fact table is partitioned by source, and the
    // partitions to read are only known AFTER planning the dim side —
    // Catalyst injects a dynamic-pruning subquery into the fact scan
    // (plan-asserted), so at 100 TB the scan reads 3 of N partitions
    // even though no literal source predicate exists on the fact side.
    ("q146_dynamic_partition_prune", (s: SparkSession, dir: String) => {
      import s.implicits._
      val tmp = graft.TempScratch.dir("q146").toString
      Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"n_chars", $"source")
        .write.mode("overwrite").partitionBy("source").parquet(tmp)
      // the dim must be a real scan with a surviving Filter node — a
      // literal Seq folds into a LocalRelation and DPP's
      // selective-predicate check never sees a filter
      val dimTmp = graft.TempScratch.dir("q146d").toString
      Seq(("src1", 1), ("src5", 2), ("src7", 3), ("src9", 9))
        .toDF("source", "grp").write.mode("overwrite").parquet(dimTmp)
      val dim = s.read.parquet(dimTmp).filter($"grp" <= 3)
      s.read.parquet(tmp).join(dim, Seq("source"))
        .groupBy($"grp")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
        .orderBy("grp")
    }, Some("""
      SELECT CASE source WHEN 'src1' THEN 1 WHEN 'src5' THEN 2 ELSE 3 END AS grp,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents WHERE source IN ('src1', 'src5', 'src7')
      GROUP BY 1 ORDER BY grp""")),

    // ----- z-order curve + zone-map skipping audit -----------------------
    // The data-skipping argument in one operator: documents are assigned a
    // Morton z-value interleaving n_chars (10 bits) with the source id
    // (5 bits); zone maps (per-bucket min/max of both dims) are computed
    // for the natural doc_id layout AND for z-range buckets, and the
    // 2-D predicate n_chars∈[100,200] ∧ src_id∈[4,7] is tested against
    // each bucket's ranges. Linear layout scans every bucket (n_chars and
    // source are uncorrelated with doc_id); the z-order layout skips the
    // large majority — the quantified case for Delta/Iceberg-style
    // OPTIMIZE ZORDER at 100 TB, where a bucket is a parquet file and
    // skipped buckets are files never opened. Everything is integer
    // arithmetic + two groupBys: fully distributed, engine-exact.
    ("q147_zone_map_skipping", (s: SparkSession, dir: String) => {
      import s.implicits._
      val zSpark = ((0 until 10).map(j => s"((n_chars div ${1 << j}) % 2) * ${1L << (2 * j + 1)}") ++
        (0 until 5).map(j => s"((src_id div ${1 << j}) % 2) * ${1L << (2 * j)}")).mkString(" + ")
      val withZ = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"n_chars",
          expr("CAST(substring(source, 4, 4) AS INT)").as("src_id"))
        .withColumn("zval", expr(zSpark))
      def stats(name: String, bucket: Column): DataFrame = withZ
        .groupBy(bucket.as("bucket"))
        .agg(min($"n_chars").as("mn"), max($"n_chars").as("mx"),
          min($"src_id").as("ms"), max($"src_id").as("xs"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(when($"mn" <= 200 && $"mx" >= 100 && $"ms" <= 7 && $"xs" >= 4, 1L)
            .otherwise(0L)).as("scanned_buckets"))
        .select(lit(name).as("layout"), $"n_buckets", $"scanned_buckets",
          (($"n_buckets" - $"scanned_buckets").cast("double") / $"n_buckets").as("skipped_frac"))
      stats("linear", expr("doc_id div 64"))
        .unionByName(stats("zorder", expr("zval div 2048")))
        .orderBy("layout")
    }, Some {
      val zDuck = ((0 until 10).map(j => s"((n_chars // ${1 << j}) % 2) * ${1L << (2 * j + 1)}") ++
        (0 until 5).map(j => s"((src_id // ${1 << j}) % 2) * ${1L << (2 * j)}")).mkString(" + ")
      s"""
      WITH base AS (SELECT doc_id, n_chars, CAST(substr(source, 4) AS INT) AS src_id FROM documents),
      z AS (SELECT doc_id, n_chars, src_id, $zDuck AS zval FROM base),
      lin AS (SELECT doc_id // 64 AS bucket, min(n_chars) AS mn, max(n_chars) AS mx,
          min(src_id) AS ms, max(src_id) AS xs FROM z GROUP BY 1),
      zo AS (SELECT zval // 2048 AS bucket, min(n_chars) AS mn, max(n_chars) AS mx,
          min(src_id) AS ms, max(src_id) AS xs FROM z GROUP BY 1),
      s1 AS (SELECT 'linear' AS layout, CAST(count(*) AS BIGINT) AS n_buckets,
          CAST(sum(CASE WHEN mn <= 200 AND mx >= 100 AND ms <= 7 AND xs >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS scanned_buckets
        FROM lin),
      s2 AS (SELECT 'zorder' AS layout, CAST(count(*) AS BIGINT) AS n_buckets,
          CAST(sum(CASE WHEN mn <= 200 AND mx >= 100 AND ms <= 7 AND xs >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS scanned_buckets
        FROM zo),
      u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
      SELECT layout, n_buckets, scanned_buckets,
        CAST(n_buckets - scanned_buckets AS DOUBLE) / n_buckets AS skipped_frac
      FROM u ORDER BY layout"""
    }),

    // ----- join-key skew diagnosis ---------------------------------------
    // The report you run BEFORE choosing salt factors (q58/q59): for each
    // candidate join key, its cardinality, the hottest key's frequency,
    // and the share of all rows the hottest key carries — the number that
    // decides whether a shuffle on that key melts one executor. Each key
    // costs one two-phase aggregate plus a 1-row rollup; keys are
    // diagnosed independently (a union of bounded aggregates).
    ("q148_skew_diagnosis", (s: SparkSession, dir: String) => {
      import s.implicits._
      val li = Tables.t(s, dir, "lineitem")
      def keyStats(c: String): DataFrame = li
        .groupBy(col(c)).agg(count(lit(1)).as("f"))
        .agg(sum($"f").as("n_rows"), count(lit(1)).as("n_keys"),
          max($"f").as("max_freq"))
        .select(lit(c).as("key_col"), $"n_rows", $"n_keys", $"max_freq",
          ($"max_freq".cast("double") / $"n_rows").as("hot_share"))
      keyStats("l_orderkey")
        .unionByName(keyStats("l_partkey"))
        .unionByName(keyStats("l_suppkey"))
        .orderBy("key_col")
    }, Some("""
      WITH s AS (
        SELECT 'l_orderkey' AS key_col, f FROM (SELECT count(*) AS f FROM lineitem GROUP BY l_orderkey)
        UNION ALL
        SELECT 'l_partkey', f FROM (SELECT count(*) AS f FROM lineitem GROUP BY l_partkey)
        UNION ALL
        SELECT 'l_suppkey', f FROM (SELECT count(*) AS f FROM lineitem GROUP BY l_suppkey))
      SELECT key_col, CAST(sum(f) AS BIGINT) AS n_rows,
        CAST(count(*) AS BIGINT) AS n_keys, CAST(max(f) AS BIGINT) AS max_freq,
        CAST(max(f) AS DOUBLE) / sum(f) AS hot_share
      FROM s GROUP BY key_col ORDER BY key_col""")),

    // ----- CDC changelog compaction (last-writer-wins) -------------------
    // The lakehouse MERGE primitive q88's SCD2 doesn't cover: an ordered
    // changelog (upserts + deletes) collapsed to its final state and
    // applied to a base snapshot. Latest-per-key is a WindowGroupLimit
    // (rank 1 by event time, map tasks forward one row per key); the
    // apply is one full-outer equi-join. 'error' events play the delete
    // tombstone; everything else upserts the event's value.
    ("q149_cdc_compaction", (s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      val latest = Tables.t(s, dir, "events")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"user_id".as("k"),
          when($"event_type" === "error", lit("D")).otherwise(lit("U")).as("op"),
          $"value".as("nv"))
      val base = Tables.t(s, dir, "customer")
        .select($"c_custkey".as("k"), $"c_acctbal".cast("double").as("bv"))
      base.join(latest, Seq("k"), "full_outer")
        .filter($"op".isNull || $"op" === "U")
        .select($"k", coalesce($"nv", $"bv").as("val"),
          when($"op".isNull, "base").when($"bv".isNull, "inserted")
            .otherwise("updated").as("row_state"))
        .orderBy("k")
    }, Some("""
      WITH latest AS (SELECT user_id AS k,
          CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op, value AS nv
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1),
      base AS (SELECT c_custkey AS k, CAST(c_acctbal AS DOUBLE) AS bv FROM customer)
      SELECT COALESCE(b.k, l.k) AS k, COALESCE(l.nv, b.bv) AS val,
        CASE WHEN l.op IS NULL THEN 'base' WHEN b.k IS NULL THEN 'inserted'
             ELSE 'updated' END AS row_state
      FROM base b FULL OUTER JOIN latest l ON b.k = l.k
      WHERE l.op IS NULL OR l.op = 'U'
      ORDER BY k""")),

    // ----- broadcast bloom semi-filter (runtime row-level pruning) -------
    // q146 prunes PARTITIONS at runtime from the dim side; this is the
    // row-level counterpart when the fact table isn't partitioned on the
    // join key: a 64K-bit membership bitmap (2048 words x 32 bits, keyed
    // by an md5-derived bucket) is built from the filtered dim's keys as
    // one tiny aggregate, broadcast, and applied to the fact scan as an
    // equi-join on the word index + a bit test — rows that cannot match
    // never enter the real join. The exact join behind it keeps the
    // result correct regardless of bitmap false positives; the grp=-1
    // stats row (bloom-passed vs exactly-matched counts) pins the bitmap
    // construction bit-for-bit against the oracle. At 100 TB the bitmap
    // plays Spark's injected runtime bloom filter with the FP rate under
    // the operator's control; everything before the final aggregate is
    // map-side.
    ("q150_bloom_runtime_filter", (s: SparkSession, dir: String) => {
      import s.implicits._
      def bucket(c: Column): Column =
        conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % 65536
      val dim = Tables.t(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey", $"c_nationkey")
      val bm = dim.withColumn("h", bucket($"c_custkey"))
        .select(expr("h div 32").as("word"), expr("CAST(h % 32 AS INT)").as("bit"))
        .groupBy($"word")
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("bits"))
      val passed = Tables.t(s, dir, "orders")
        .select($"o_custkey", $"o_totalprice")
        .withColumn("h", bucket($"o_custkey"))
        .withColumn("word", expr("h div 32"))
        .withColumn("bit", expr("CAST(h % 32 AS INT)"))
        .join(broadcast(bm), Seq("word"))
        .filter(expr("(shiftright(bits, bit) & 1) = 1"))
      val joined = passed.join(broadcast(dim), $"o_custkey" === $"c_custkey")
      val agg = joined.groupBy($"c_nationkey".as("grp"))
        .agg(count(lit(1)).as("n_rows"),
          expr("CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)")
            .as("total_cents"))
      val stats = passed.agg(count(lit(1)).as("np"))
        .crossJoin(joined.agg(count(lit(1)).as("ne")))
        .select(lit(-1).as("grp"), $"np".as("n_rows"), $"ne".as("total_cents"))
      agg.unionByName(stats).orderBy("grp")
    }, Some("""
      WITH dim AS (SELECT c_custkey, c_nationkey FROM customer
        WHERE c_mktsegment = 'BUILDING'),
      dh AS (SELECT c_custkey, c_nationkey,
        ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 65536 AS h FROM dim),
      bm AS (SELECT h // 32 AS word,
        bit_or(CAST(1 AS BIGINT) << CAST(h % 32 AS INT)) AS bits FROM dh GROUP BY 1),
      oh AS (SELECT o_custkey, o_totalprice,
        ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT % 65536 AS h FROM orders),
      pass AS (SELECT o.o_custkey, o.o_totalprice FROM oh o
        JOIN bm ON bm.word = o.h // 32
        WHERE ((bm.bits >> CAST(o.h % 32 AS INT)) & 1) = 1),
      agg AS (SELECT d.c_nationkey AS grp, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS total_cents
        FROM pass p JOIN dim d ON p.o_custkey = d.c_custkey GROUP BY 1),
      stats AS (SELECT -1 AS grp,
        CAST((SELECT count(*) FROM pass) AS BIGINT) AS n_rows,
        CAST((SELECT count(*) FROM pass p JOIN dim d ON p.o_custkey = d.c_custkey) AS BIGINT) AS total_cents)
      SELECT grp, n_rows, total_cents FROM agg
      UNION ALL SELECT grp, n_rows, total_cents FROM stats
      ORDER BY grp""")),

    // ----- co-occurrence pair mining (market-basket) ---------------------
    // Which items travel together: distinct (order, part) pairs self-join
    // on the order key — multiplicity bounded by items-per-order squared
    // (~7 items -> <=21 pairs per order at any corpus size, so the
    // equi-join output is linear in orders, never quadratic in the
    // table), two-phase count per pair, TakeOrderedAndProject top-32
    // under a total order. The same shape mines token co-occurrence or
    // doc-pair affinity in a training corpus.
    ("q151_cooccurrence_pairs", (s: SparkSession, dir: String) => {
      import s.implicits._
      val items = Tables.t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      items.toDF("ok", "p1").join(items.toDF("ok", "p2"), Seq("ok"))
        .filter($"p1" < $"p2")
        .groupBy($"p1", $"p2").agg(count(lit(1)).as("n_orders"))
        .orderBy(desc("n_orders"), $"p1", $"p2").limit(32)
    }, Some("""
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
      SELECT a.pk AS p1, b.pk AS p2, CAST(count(*) AS BIGINT) AS n_orders
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2 ORDER BY n_orders DESC, p1, p2 LIMIT 32""")),

    // ----- incremental view maintenance (delta merge, no base rescan) ----
    // The materialized-view refresh primitive: a stored per-nation
    // balance aggregate (base, cents) is brought current by aggregating
    // ONLY the changelog (events joined to the broadcast customer dim,
    // micro-units) and full-outer-merging the two one-row-per-group
    // sides. Work is proportional to |delta|, not |base fact|: at 100 TB
    // the base aggregate is a tiny stored table and the day's events are
    // the only scan. Monetary/base amounts stay in exact decimal cents;
    // delta doubles become integer micros via floor (per-row IEEE op,
    // engine-exact) so no double sum ever crosses the shuffle.
    ("q152_incremental_view", (s: SparkSession, dir: String) => {
      import s.implicits._
      val cust = Tables.t(s, dir, "customer")
      val base = cust.groupBy($"c_nationkey".as("grp"))
        .agg(expr("CAST(sum(CAST(c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT)")
          .as("base_cents"))
      val delta = Tables.t(s, dir, "events")
        .join(broadcast(cust.select($"c_custkey", $"c_nationkey")),
          $"user_id" === $"c_custkey")
        .groupBy($"c_nationkey".as("grp"))
        .agg(expr("sum(CAST(floor(value * 1000000) AS BIGINT))").as("delta_micro"))
      base.join(delta, Seq("grp"), "full_outer")
        .select($"grp",
          coalesce($"base_cents", lit(0L)).as("base_cents"),
          coalesce($"delta_micro", lit(0L)).as("delta_micro"),
          (coalesce($"base_cents", lit(0L)) * 10000 +
            coalesce($"delta_micro", lit(0L))).as("new_micro"))
        .orderBy("grp")
    }, Some("""
      WITH base AS (SELECT c_nationkey AS grp,
          CAST(sum(CAST(c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT) AS base_cents
        FROM customer GROUP BY 1),
      delta AS (SELECT c.c_nationkey AS grp,
          CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS delta_micro
        FROM events e JOIN customer c ON e.user_id = c.c_custkey GROUP BY 1)
      SELECT COALESCE(b.grp, d.grp) AS grp,
        COALESCE(b.base_cents, 0) AS base_cents,
        COALESCE(d.delta_micro, 0) AS delta_micro,
        COALESCE(b.base_cents, 0) * 10000 + COALESCE(d.delta_micro, 0) AS new_micro
      FROM base b FULL OUTER JOIN delta d ON b.grp = d.grp
      ORDER BY grp""")),

    // ----- fixed-iteration PageRank (link analysis) ----------------------
    // Crawl-graph authority for corpus quality weighting: the
    // part<->supplier bipartite graph from lineitem (node ids disjoint by
    // parity), 3 synchronous PageRank iterations at damping 0.85. Ranks
    // live in integer MICRO-units: each edge contributes rank div degree
    // (integer division, per-row deterministic), so every shuffle sums
    // integers and the result is exact in any aggregation order — the
    // q101/q130 quantization rule applied to an iterative algorithm.
    // Edges+degrees are localCheckpointed once (the q47 pattern): each
    // iteration is one co-partitioned equi-join + one two-phase
    // aggregate on the node id, the textbook distributed-PageRank shape
    // that scales to billions of edges.
    ("q153_pagerank", (s: SparkSession, dir: String) => {
      import s.implicits._
      val e0 = Tables.t(s, dir, "lineitem")
        .select(($"l_partkey" * 2).as("u"), ($"l_suppkey" * 2 + 1).as("v"))
        .distinct()
      val e = e0.unionByName(e0.select($"v".as("u"), $"u".as("v")))
      val deg = e.groupBy($"u").agg(count(lit(1)).as("d"))
      val ed = e.join(deg, Seq("u")).localCheckpoint()
      var ranks = deg.select($"u".as("n"), lit(1000000L).as("r"))
      for (_ <- 1 to 3) {
        ranks = ed.as("e").join(ranks.as("rk"), col("e.u") === col("rk.n"))
          .groupBy(col("e.v").as("n"))
          .agg(expr("CAST(150000 + (85 * sum(rk.r div e.d)) div 100 AS BIGINT)").as("r"))
      }
      ranks.select($"n".as("node_id"),
          when($"n" % 2 === 0, "part").otherwise("supplier").as("kind"),
          $"r".as("rank_micro"))
        .orderBy(desc("rank_micro"), $"node_id").limit(32)
    }, Some("""
      WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v FROM lineitem),
      e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
      deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY u),
      r0 AS (SELECT u AS n, CAST(1000000 AS BIGINT) AS r FROM deg),
      r1 AS (SELECT e.v AS n, CAST(150000 + (85 * sum(r0.r // deg.d)) // 100 AS BIGINT) AS r
        FROM e JOIN deg USING (u) JOIN r0 ON r0.n = e.u GROUP BY e.v),
      r2 AS (SELECT e.v AS n, CAST(150000 + (85 * sum(r1.r // deg.d)) // 100 AS BIGINT) AS r
        FROM e JOIN deg USING (u) JOIN r1 ON r1.n = e.u GROUP BY e.v),
      r3 AS (SELECT e.v AS n, CAST(150000 + (85 * sum(r2.r // deg.d)) // 100 AS BIGINT) AS r
        FROM e JOIN deg USING (u) JOIN r2 ON r2.n = e.u GROUP BY e.v)
      SELECT n AS node_id,
        CASE WHEN n % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
        r AS rank_micro
      FROM r3 ORDER BY rank_micro DESC, node_id LIMIT 32""")),

    // ----- JSON-lines roundtrip (schema-on-read + column pruning) --------
    // Completes the source-format matrix (parquet everywhere, CSV q104,
    // ORC q143): documents written as JSON lines — the interchange format
    // most raw training corpora actually arrive in — and read back with
    // an EXPLICIT schema (no inference pass over 100 TB) selecting 3 of
    // the 5 written fields. Column pruning must reach the scan: the JSON
    // parser only materializes the ReadSchema fields (asserted — `text`,
    // the wide column, is never parsed), which is the difference between
    // parsing 5% and 100% of every line at scale.
    ("q154_json_roundtrip", (s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      val tmp = graft.TempScratch.dir("q154").toString
      Tables.t(s, dir, "documents")
        .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
        .write.mode("overwrite").json(tmp)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      s.read.schema(schema).json(tmp)
        .filter($"n_chars" >= 120)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"),
          min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
        .orderBy("lang")
    }, Some("""
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM documents WHERE n_chars >= 120
      GROUP BY lang ORDER BY lang""")),

    // ----- count-min sketch (mergeable frequency estimation) -------------
    // The frequency counterpart to the KMV distinct sketch (q53): a
    // 4x1024 count-min sketch over the token stream, built as ONE
    // two-phase hash aggregate on (row, bucket) — the sketch is 4096
    // integers regardless of corpus size, so the reduce side is
    // constant and the merged sketch broadcasts for probing. The audit
    // joins the 16 hottest tokens (exact counts) against the broadcast
    // sketch and reports estimate minus exact — CMS never undercounts,
    // so overshoot >= 0 is a structural invariant the oracle pins
    // per-token. Hashes are md5-derived (row-salted), deterministic
    // cross-engine.
    ("q155_countmin_sketch", (s: SparkSession, dir: String) => {
      import s.implicits._
      def bkt(r: Int, t: Column): Column =
        conv(substring(md5(concat(lit(r.toString), lit("|"), t)), 1, 8), 16, 10)
          .cast("long") % 1024
      val buckets = (0 until 4).map(r => bkt(r, $"t"))
      val tok = Tables.spread(Tables.t(s, dir, "documents"))
        .select(explode(split(TA.normText($"text"), " ")).as("t"))
        .filter(length($"t") > 0)
      val sk = tok.select(posexplode(array(buckets: _*)).as(Seq("r", "b")))
        .groupBy($"r", $"b").agg(count(lit(1)).as("c"))
      val top = tok.groupBy($"t").agg(count(lit(1)).as("exact_n"))
        .orderBy(desc("exact_n"), $"t").limit(16)
      top.select($"t", $"exact_n", posexplode(array(buckets: _*)).as(Seq("r", "b")))
        .join(broadcast(sk), Seq("r", "b"))
        .groupBy($"t", $"exact_n").agg(min($"c").as("cms_est"))
        .select($"t".as("token"), $"exact_n", $"cms_est",
          ($"cms_est" - $"exact_n").as("overshoot"))
        .orderBy(desc("exact_n"), $"token")
    }, Some(s"""
      WITH d AS (SELECT $normSql AS norm FROM documents),
      tok AS (SELECT t FROM (SELECT unnest(string_split(norm, ' ')) AS t FROM d)
        WHERE len(t) > 0),
      hx AS (SELECT t, r,
          ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || t), 1, 8))::BIGINT % 1024 AS b
        FROM tok, (SELECT unnest(range(4)) AS r) _),
      sk AS (SELECT r, b, CAST(count(*) AS BIGINT) AS c FROM hx GROUP BY 1, 2),
      top AS (SELECT t, CAST(count(*) AS BIGINT) AS exact_n FROM tok
        GROUP BY 1 ORDER BY exact_n DESC, t LIMIT 16),
      pb AS (SELECT top.t, top.exact_n, r,
          ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || top.t), 1, 8))::BIGINT % 1024 AS b
        FROM top, (SELECT unnest(range(4)) AS r) _)
      SELECT pb.t AS token, pb.exact_n, min(sk.c) AS cms_est,
        min(sk.c) - pb.exact_n AS overshoot
      FROM pb JOIN sk ON sk.r = pb.r AND sk.b = pb.b
      GROUP BY 1, 2 ORDER BY exact_n DESC, token""")),

    // ----- inverted index construction (token -> posting list) ----------
    // The retrieval-side primitive a corpus pipeline feeds: per token,
    // document frequency, total term frequency, and the head of the
    // doc-id-sorted posting list (truncated to 5 — posting heads are
    // what skip-pointer layouts materialize first). One explode + one
    // aggregate keyed on the token: collect_set is partial-aggregable
    // (ObjectHashAggregate), so map tasks emit per-token partial
    // postings and only token-grouped sets cross the shuffle; the
    // top-32-by-df report is TakeOrderedAndProject, never a global
    // sort. At 100 TB the same plan writes the full index
    // bucketBy(token) instead of taking the head.
    ("q156_inverted_index", (s: SparkSession, dir: String) => {
      import s.implicits._
      val tok = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", explode(split(TA.normText($"text"), " ")).as("t"))
        .filter(length($"t") > 0)
      tok.groupBy($"t")
        .agg(countDistinct($"doc_id").as("df"), count(lit(1)).as("tf"),
          array_join(slice(sort_array(collect_set($"doc_id")), 1, 5), ",")
            .as("postings_head"))
        .orderBy(desc("df"), $"t").limit(32)
        .select($"t".as("token"), $"df", $"tf", $"postings_head")
    }, Some(s"""
      WITH d AS (SELECT doc_id, $normSql AS norm FROM documents),
      tok AS (SELECT doc_id, t FROM
        (SELECT doc_id, unnest(string_split(norm, ' ')) AS t FROM d)
        WHERE len(t) > 0)
      SELECT t AS token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
        CAST(count(*) AS BIGINT) AS tf,
        array_to_string(list_sort(list(DISTINCT doc_id))[1:5], ',') AS postings_head
      FROM tok GROUP BY 1 ORDER BY df DESC, token LIMIT 32""")),

    // ----- weighted sampling without replacement (A-ES) ------------------
    // q140's weighted sibling: Efraimidis-Spirakis exponential races —
    // each doc draws u from its md5 (deterministic, seedless, the
    // q110/q120 rule) and competes on -ln(u)/weight, so selection
    // probability is proportional to n_chars. The ln is quantized to
    // integer micro-lns (q119 rule) and the division is integer
    // nano-keys ((micro * 1e6) div weight), so the race order is exact
    // integer comparison in both engines. Per-source top-5 via
    // row_number compiles to WindowGroupLimit: map tasks forward at
    // most 5 candidates per source ahead of the shuffle — the full
    // corpus never sorts.
    ("q157_weighted_sample", (s: SparkSession, dir: String) => {
      import s.implicits._
      val h = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
        .cast("long")
      val u = (h + 1).cast("double") / lit(4294967296.0)
      val base = Tables.spread(Tables.t(s, dir, "documents"))
        .filter($"n_chars" > 0)
        .select($"source", $"doc_id", $"n_chars",
          floor(-log(u) * 1e6 + 0.5).cast("long").as("micro"))
        .withColumn("key_nano", expr("(micro * 1000000) div n_chars"))
      val w = Window.partitionBy($"source").orderBy($"key_nano", $"doc_id")
      base.select($"source", $"doc_id", $"n_chars", $"key_nano",
          row_number().over(w).as("pick"))
        .filter($"pick" <= 5)
        .orderBy("source", "pick")
    }, Some("""
      WITH b AS (SELECT source, doc_id, n_chars,
          CAST(floor(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
            / 4294967296.0) * 1000000 + 0.5) AS BIGINT) AS micro
        FROM documents WHERE n_chars > 0),
      k AS (SELECT source, doc_id, n_chars,
          (micro * 1000000) // n_chars AS key_nano FROM b),
      r AS (SELECT source, doc_id, n_chars, key_nano,
          row_number() OVER (PARTITION BY source ORDER BY key_nano, doc_id) AS pick
        FROM k)
      SELECT source, doc_id, n_chars, key_nano, pick FROM r
      WHERE pick <= 5 ORDER BY source, pick""")),

    // ----- kNN-graph construction (mutual-kNN edges) ---------------------
    // The backbone of density-based dedup clustering and diversity
    // mining: EVERY node gets its k=3 nearest neighbors (not just a
    // query subset, which is q25's shape), plus the mutuality flag —
    // mutual-kNN edges are the high-precision subset graph-cluster
    // pipelines keep. Candidate generation is the LSH-bucket self-join
    // — an equi-join on the b-bit signature scoring Θ(N²/2^b) pairs,
    // i.e. all-pairs cut by the constant 2^b (b=4 here): at scale b
    // must GROW with the corpus (more projections, or q34's multi-probe
    // over finer buckets) to hold per-bucket population bounded. Top-3
    // is a windowed rank per node, and mutuality is a self-equi-join of
    // the kNN edge list on the reversed key — every shuffle is keyed.
    ("q158_knn_graph", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      val b = prepared.withColumn("bucket", Similarity.lshBucket(col("qvec"), AnnProjs))
      val q = b.select($"bucket", $"id".as("q_id"), $"qvec".as("q_vec"), $"n2".as("q_n2"))
      val c = b.select($"bucket", $"id".as("c_id"), $"qvec".as("c_vec"), $"n2".as("c_n2"))
      val scored = q.join(c, "bucket").filter($"q_id" =!= $"c_id")
        .select($"q_id", $"c_id",
          Similarity.cosine(Similarity.dot($"q_vec", $"c_vec"), $"q_n2", $"c_n2")
            .as("cos_sim"))
      val w = Window.partitionBy($"q_id").orderBy(desc("cos_sim"), $"c_id")
      val knn = scored.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
      val rev = knn.select($"c_id".as("q_id"), $"q_id".as("c_id"), lit(1).as("m"))
      knn.join(rev, Seq("q_id", "c_id"), "left")
        .select($"q_id", $"rnk", $"c_id", $"cos_sim",
          coalesce($"m", lit(0)).cast("long").as("mutual"))
        .orderBy("q_id", "rnk")
    }, Some(s"""
      WITH $annPrepSql,
      b AS (SELECT vec_id, qvec, n2, $annBucketSql AS bucket FROM n),
      scored AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        list_dot_product(q.qvec, c.qvec) / sqrt(q.n2 * c.n2) AS cos_sim
        FROM b q JOIN b c USING (bucket) WHERE q.vec_id <> c.vec_id),
      r AS (SELECT q_id, c_id, cos_sim,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk
        FROM scored),
      knn AS (SELECT q_id, rnk, c_id, cos_sim FROM r WHERE rnk <= 3)
      SELECT k.q_id, k.rnk, k.c_id, k.cos_sim,
        CAST(CASE WHEN m.q_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS mutual
      FROM knn k LEFT JOIN knn m ON m.q_id = k.c_id AND m.c_id = k.q_id
      ORDER BY k.q_id, k.rnk""")),

    // ----- Z-order layout clustering (multi-dim zone-map win) -----------
    // The OPTIMIZE ZORDER primitive: interleave the bits of two
    // quantized dimensions (customer, order day) into a Z-value, lay
    // rows out into 64 equal "files" along that curve, and measure the
    // zone-map skip rate for a 2-D box predicate against the same
    // predicate on a date-sorted layout. Z-order keeps BOTH per-file
    // min/max ranges narrow, so a 1/16-of-the-grid box touches a
    // fraction of the files where the 1-D sort scans nearly all of
    // them — this delta is the entire justification for the layout.
    // All arithmetic is integer (bit interleave, div-binning with
    // in-DAG bounds per the q86 rule); ntile stands in for the
    // repartitionByRange(z) a 100 TB write would use — the stats and
    // skip logic are identical under either partitioner.
    ("q159_zorder_layout", (s: SparkSession, dir: String) => {
      import s.implicits._
      val sparkZ = (0 until 8).map(i =>
        s"shiftleft(shiftright(x_bin, $i) & 1, ${2 * i}) + shiftleft(shiftright(y_bin, $i) & 1, ${2 * i + 1})")
        .mkString(" + ")
      val o = Tables.t(s, dir, "orders").select($"o_orderkey", $"o_custkey",
        datediff($"o_orderdate", lit("1992-01-01")).as("d"))
      val bounds = o.agg(min($"o_custkey").as("xmin"), max($"o_custkey").as("xmax"),
        min($"d").as("ymin"), max($"d").as("ymax"))
      val files = o.crossJoin(broadcast(bounds)).select($"o_orderkey",
          expr("((o_custkey - xmin) * 256) div (xmax - xmin + 1)").as("x_bin"),
          expr("((d - ymin) * 256) div (ymax - ymin + 1)").as("y_bin"))
        .withColumn("z", expr(sparkZ))
      // two-level ntile (GridRank): the orders-scale layout assignment
      // never single-tasks; bit-identical to the window ntile
      val zf = graft.ext.GridRank
        .withNtile(files, 64, "z", Seq($"o_orderkey"), "file_id")
        .withColumn("layout", lit("zorder"))
      val ds = graft.ext.GridRank
        .withNtile(files, 64, "y_bin", Seq($"o_orderkey"), "file_id")
        .withColumn("layout", lit("datesort"))
      val stats = zf.unionByName(ds).groupBy($"layout", $"file_id")
        .agg(count(lit(1)).as("n_rows"),
          min($"x_bin").as("x_lo"), max($"x_bin").as("x_hi"),
          min($"y_bin").as("y_lo"), max($"y_bin").as("y_hi"))
      val miss = $"x_hi" < 96 || $"x_lo" > 159 || $"y_hi" < 96 || $"y_lo" > 159
      stats.groupBy($"layout").agg(
          count(lit(1)).as("n_files"),
          sum(when(miss, 0L).otherwise(1L)).as("files_scanned"),
          sum(when(miss, 0L).otherwise($"n_rows")).as("rows_scanned"))
        .orderBy("layout")
    }, Some {
      val duckZ = (0 until 8).map(i =>
        s"(((x_bin >> $i) & 1) << ${2 * i}) + (((y_bin >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""
      WITH o AS (SELECT o_orderkey, o_custkey,
        datediff('day', DATE '1992-01-01', o_orderdate) AS d FROM orders),
      bo AS (SELECT min(o_custkey) AS xmin, max(o_custkey) AS xmax,
        min(d) AS ymin, max(d) AS ymax FROM o),
      binned AS (SELECT o_orderkey,
        ((o_custkey - xmin) * 256) // (xmax - xmin + 1) AS x_bin,
        ((d - ymin) * 256) // (ymax - ymin + 1) AS y_bin FROM o, bo),
      f AS (SELECT o_orderkey, x_bin, y_bin, $duckZ AS z FROM binned),
      u AS (
        SELECT 'zorder' AS layout,
          ntile(64) OVER (ORDER BY z, o_orderkey) AS file_id, x_bin, y_bin
        FROM f
        UNION ALL
        SELECT 'datesort' AS layout,
          ntile(64) OVER (ORDER BY y_bin, o_orderkey) AS file_id, x_bin, y_bin
        FROM f),
      st AS (SELECT layout, file_id, count(*) AS n_rows,
        min(x_bin) AS x_lo, max(x_bin) AS x_hi,
        min(y_bin) AS y_lo, max(y_bin) AS y_hi
        FROM u GROUP BY 1, 2)
      SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
        CAST(sum(CASE WHEN x_hi < 96 OR x_lo > 159 OR y_hi < 96 OR y_lo > 159
          THEN 0 ELSE 1 END) AS BIGINT) AS files_scanned,
        CAST(sum(CASE WHEN x_hi < 96 OR x_lo > 159 OR y_hi < 96 OR y_lo > 159
          THEN 0 ELSE n_rows END) AS BIGINT) AS rows_scanned
      FROM st GROUP BY layout ORDER BY layout"""
    }),

    // ----- triangle counting (degree-ordered wedge join) -----------------
    // Graph-shape profiling for the co-occurrence graph (q151's edges):
    // triangle and wedge counts give the global clustering coefficient,
    // the standard density diagnostic for item graphs. The Spark side
    // runs the MapReduce-canonical degree-ordered algorithm: each edge
    // is oriented from its lower-(degree, id) endpoint to the higher, so
    // per-node out-degree is O(√m) and the wedge self-join (the only
    // quadratic step) is bounded by Σ d_out² — never the Σ deg² a naive
    // orientation pays on hub nodes. The closing-edge check is an
    // equi-join of the wedge list against the oriented edges. Triangle
    // and wedge counts are orientation-invariant, so the oracle uses the
    // simple a<b<c form; all outputs are exact integers.
    ("q160_triangle_count", (s: SparkSession, dir: String) => {
      import s.implicits._
      val items = Tables.t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      val e = items.toDF("ok", "a").join(items.toDF("ok", "b"), Seq("ok"))
        .filter($"a" < $"b").select($"a", $"b").distinct()
        .localCheckpoint() // 3 consumers (deg, orientation, count) — one materialization
      val deg = e.select($"a".as("v")).unionByName(e.select($"b".as("v")))
        .groupBy($"v").agg(count(lit(1)).as("deg"))
      // orientation key: lexicographic (deg, id) as a struct — ordered
      // comparison on structs is exact at any id domain (no packed-long
      // overflow trap at large key spaces)
      val keyed = e
        .join(deg.select($"v".as("a"), struct($"deg", $"v".as("id")).as("ka")), "a")
        .join(deg.select($"v".as("b"), struct($"deg", $"v".as("id")).as("kb")), "b")
      val ed = keyed.select(
          when($"ka" < $"kb", $"a").otherwise($"b").as("src"),
          when($"ka" < $"kb", $"b").otherwise($"a").as("dst"),
          when($"ka" < $"kb", $"kb").otherwise($"ka").as("dkey"))
        .localCheckpoint() // consumed by the wedge join twice + closing probe
      val wedges = ed.select($"src", $"dst".as("v"), $"dkey".as("k1"))
        .join(ed.select($"src", $"dst".as("w"), $"dkey".as("k2")), Seq("src"))
        .filter($"k1" < $"k2").select($"v", $"w")
      // the closing probe joins the Σd_out²-bounded wedge stream (the big
      // side) against the |E| oriented edges: broadcast the measured-small
      // edge set so the wedge stream is never shuffled/sorted (guide §3.1)
      val closed = wedges.join(
        AdaptiveJoin.broadcastIfSmall(ed.select($"src".as("v"), $"dst".as("w"))),
        Seq("v", "w"))
      deg.agg(count(lit(1)).as("n_nodes"),
          expr("CAST(sum((deg * (deg - 1)) div 2) AS BIGINT)").as("n_wedges"))
        .crossJoin(e.agg(count(lit(1)).as("n_edges")))
        .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
        .select($"n_nodes", $"n_edges", $"n_wedges", $"n_triangles")
    }, Some("""
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      e AS (SELECT DISTINCT a.pk AS a, b.pk AS b
        FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk),
      deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM
        (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY v),
      tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
        (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        (SELECT CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) FROM deg) AS n_wedges,
        (SELECT n_triangles FROM tri) AS n_triangles""")),

    // ----- connected components: large-star/small-star -------------------
    // q54's component summary computed by the O(log n)-round star
    // contraction instead of min-label propagation — the form that
    // survives long transitive near-dup CHAINS, where label propagation
    // needs diameter rounds. Same pair generation and the q54 oracle
    // verbatim: two algorithms, one fixpoint — that equality is the test.
    ("q161_cc_star", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents")).select(
        $"doc_id".as("id"),
        concat($"lang", lit("_"), expr("n_chars div 100")).as("bucket"),
        TA.charNgramInts($"text", 3).as("grams"))
      val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.55, broadcastGrams = true)
      Dedup.connectedComponentsStar(pairs)
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

    // ----- containment (asymmetric near-dup) ------------------------------
    // Subset duplication detection: a short doc quoted wholesale inside
    // a long one has Jaccard ≈ |A|/|B| (invisible to q21's threshold)
    // but containment |A∩B|/|A| ≈ 1. Candidates come from the same
    // banded-minhash equi-join as q21; the keep filter is the integer
    // inequality 10·|A∩B| ≥ 7·min(|A|,|B|), so no float crosses the
    // gate — the emitted ratios are single divisions of exact integers.
    ("q162_containment", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id".as("id"),
          graft.functions.WordShingleHash32(TA.normText($"text"), 3).as("hs"))
      Dedup.minhashLshContainment(docs, nBands = 4, minContainTenths = 7)
        .orderBy("id_a", "id_b")
    }, Some(s"""
      $minhashCandCte,
      j AS (SELECT c.id_a, c.id_b,
          CAST(len(a.hs) AS BIGINT) AS n_a, CAST(len(b.hs) AS BIGINT) AS n_b,
          CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS inter_n
        FROM cand c JOIN hst a ON a.doc_id = c.id_a JOIN hst b ON b.doc_id = c.id_b)
      SELECT id_a, id_b, n_a, n_b, inter_n,
        inter_n / n_a AS cont_a, inter_n / n_b AS cont_b
      FROM j WHERE inter_n * 10 >= least(n_a, n_b) * 7
      ORDER BY id_a, id_b""")),

    // ----- small-file compaction planner (bin packing) -------------------
    // The OPTIMIZE/compaction primitive every table format needs: given
    // per-file sizes (here: synthetic "files" of 20 docs each, sized by
    // their text bytes), pack append-ordered files into ~64 KB target
    // bins per source partition via a running-sum split — the planner
    // shape Delta/Iceberg compaction actually uses (bins may overflow by
    // at most one file, which real planners accept). The plan is
    // metadata-scale: one aggregate over the manifest + one window per
    // partition key; the rewrite it drives is embarrassingly parallel
    // per bin. All integer arithmetic.
    ("q163_compaction_plan", (s: SparkSession, dir: String) => {
      import s.implicits._
      val files = Tables.spread(Tables.t(s, dir, "documents"))
        .groupBy($"source", expr("doc_id div 20").as("file_no"))
        .agg(sum($"n_chars").as("bytes"), count(lit(1)).as("n_docs"))
      val w = Window.partitionBy($"source").orderBy($"file_no")
        .rowsBetween(Window.unboundedPreceding, -1)
      files
        .withColumn("cum_before", coalesce(sum($"bytes").over(w), lit(0L)))
        .withColumn("bin_id", expr("cum_before div 65536"))
        .groupBy($"source", $"bin_id")
        .agg(count(lit(1)).as("n_files"), sum($"n_docs").as("n_docs"),
          sum($"bytes").as("bin_bytes"))
        .orderBy("source", "bin_id")
    }, Some("""
      WITH f AS (SELECT source, doc_id // 20 AS file_no,
          CAST(sum(n_chars) AS BIGINT) AS bytes, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1, 2),
      c AS (SELECT source, file_no, bytes, n_docs,
          COALESCE(CAST(sum(bytes) OVER (PARTITION BY source ORDER BY file_no
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before
        FROM f)
      SELECT source, cum_before // 65536 AS bin_id,
        CAST(count(*) AS BIGINT) AS n_files, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        CAST(sum(bytes) AS BIGINT) AS bin_bytes
      FROM c GROUP BY 1, 2 ORDER BY source, bin_id""")),

    // ----- HyperLogLog distinct sketch (relational register form) --------
    // The register-table rendering of HLL (Flajolet et al. 2007): a
    // 60-bit engine-portable hash (md5 prefix, the q110 rule), 8-bit
    // bucket index, rho = leading-one position of the remaining 52 bits
    // via bin()-string length (exact integers in both engines). The
    // register table is m=256 rows per group — constant reduce-side
    // state at any corpus size, and max(rho) is partial-aggregable, so
    // this two-phase plan IS the mergeable-sketch plan. The raw-HLL
    // harmonic sum stays integer by scaling: S = Σ 2^(53-M_j) over used
    // buckets + 2^53 per empty bucket (≤ 256·2^53 = 2^61, exact), and
    // the estimate is ONE double division of exact integers (q80 rule).
    // Linear-counting correction (the n << m regime this table is in)
    // uses the micro-ln convention (q119 rule). Exact distinct rides
    // along as the audit column. KMV (q53) is the k-th-order-statistic
    // sketch; this is the register one — the pair covers both families.
    ("q164_hll_sketch", (s: SparkSession, dir: String) => {
      import s.implicits._
      // alpha_256 * m^2 * 2^53, one literal shared with the SQL text
      val hllC = 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 9007199254740992.0
      val ev = Tables.t(s, dir, "events")
      val b = ev.select($"event_type",
          expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
        .select($"event_type", expr("shiftright(h, 52)").as("bucket"),
          // bin() emits no leading zeros in either engine, so the
          // leading-one position of the 52-bit remainder is 53 - length
          expr("""CASE WHEN (h & 4503599627370495) = 0 THEN 53
                  ELSE 53 - length(bin(h & 4503599627370495)) END""").as("rho"))
      val regs = b.groupBy($"event_type", $"bucket").agg(max($"rho").as("m"))
      val sk = regs.groupBy($"event_type").agg(
          count(lit(1)).as("n_buckets_used"),
          sum($"m").as("register_sum"),
          (sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 53 - m) AS BIGINT)")) +
            (lit(256L) - count(lit(1))) * lit(9007199254740992L)).as("s_scaled"))
      val exact = ev.groupBy($"event_type")
        .agg(countDistinct($"user_id").as("exact_distinct"))
      sk.join(exact, Seq("event_type"))
        .select($"event_type", $"n_buckets_used", $"register_sum", $"s_scaled",
          (lit(hllC) / $"s_scaled").as("est_raw"),
          when($"n_buckets_used" < 256,
            (lit(256L) * expr("CAST(floor(ln(256.0 / (256 - n_buckets_used)) * 1000000 + 0.5) AS BIGINT)")))
            .otherwise(lit(-1L)).as("lc_micro"),
          $"exact_distinct")
        .orderBy("event_type")
    }, Some {
      val hllC = 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 9007199254740992.0
      s"""
      WITH h AS (SELECT event_type,
          CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events),
      b AS (SELECT event_type, h >> 52 AS bucket,
          CASE WHEN (h & 4503599627370495) = 0 THEN 53
               ELSE 53 - length(bin(h & 4503599627370495)) END AS rho
        FROM h),
      r AS (SELECT event_type, bucket, max(rho) AS m FROM b GROUP BY 1, 2),
      sk AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets_used,
          CAST(sum(m) AS BIGINT) AS register_sum,
          CAST(sum(CAST(1 AS BIGINT) << (53 - m)) AS BIGINT)
            + (256 - CAST(count(*) AS BIGINT)) * 9007199254740992 AS s_scaled
        FROM r GROUP BY 1),
      x AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events GROUP BY 1)
      SELECT sk.event_type, n_buckets_used, register_sum, s_scaled,
        $hllC / s_scaled AS est_raw,
        CASE WHEN n_buckets_used < 256 THEN
          256 * CAST(floor(ln(256.0 / (256 - n_buckets_used)) * 1000000 + 0.5) AS BIGINT)
        ELSE -1 END AS lc_micro,
        exact_distinct
      FROM sk JOIN x USING (event_type) ORDER BY event_type"""
    }),

    // ----- join-size forecast from per-key frequency vectors -------------
    // The planner primitive behind every join-reorder and broadcast
    // decision: for an equi-join, output cardinality is EXACTLY
    // Σ_k cnt_a(k)·cnt_b(k) — computable from two per-key count
    // aggregates and a key-table join, never touching the row-level
    // join itself. At 100 TB this is the pre-flight that decides
    // whether a self-join is feasible at all (q148 diagnoses shuffle
    // skew; this forecasts the OUTPUT, which can explode even with no
    // skew). Full-outer on the key tables yields matched/unmatched key
    // counts in the same pass; hot_share_ppm (integer div) shows how
    // much of the output one key contributes. All exact integers.
    ("q165_join_size_forecast", (s: SparkSession, dir: String) => {
      import s.implicits._
      def freq(df: DataFrame, key: String) =
        df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
      def forecast(name: String, fa: DataFrame, fb: DataFrame): DataFrame =
        fa.select($"k", $"c".as("ca")).join(
            fb.select($"k", $"c".as("cb")), Seq("k"), "full_outer")
          .agg(
            sum(when($"ca".isNotNull, 1L).otherwise(0L)).as("keys_left"),
            sum(when($"cb".isNotNull, 1L).otherwise(0L)).as("keys_right"),
            sum(when($"ca".isNotNull && $"cb".isNotNull, 1L).otherwise(0L)).as("keys_matched"),
            coalesce(sum($"ca" * $"cb"), lit(0L)).as("est_rows"),
            coalesce(max($"ca" * $"cb"), lit(0L)).as("hot_key_rows"))
          .select(lit(name).as("join_name"), $"keys_left", $"keys_right",
            $"keys_matched", $"est_rows", $"hot_key_rows",
            expr("CASE WHEN est_rows > 0 THEN (hot_key_rows * 1000000) div est_rows ELSE 0 END")
              .as("hot_share_ppm"))
      val li = Tables.t(s, dir, "lineitem")
      val liPart = freq(li, "l_partkey").localCheckpoint() // reused on both sides of the self-join forecast
      forecast("lineitem_self_partkey", liPart, liPart)
        .unionByName(forecast("orders_lineitem_orderkey",
          freq(Tables.t(s, dir, "orders"), "o_orderkey"), freq(li, "l_orderkey")))
        .unionByName(forecast("customer_orders_custkey",
          freq(Tables.t(s, dir, "customer"), "c_custkey"),
          freq(Tables.t(s, dir, "orders"), "o_custkey")))
        .orderBy("join_name")
    }, Some("""
      WITH lp AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1),
      lo AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1),
      oo AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c FROM orders GROUP BY 1),
      oc AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS c FROM orders GROUP BY 1),
      cc AS (SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS c FROM customer GROUP BY 1),
      f AS (
        SELECT 'lineitem_self_partkey' AS join_name, a.c AS ca, b.c AS cb
          FROM lp a FULL OUTER JOIN lp b USING (k)
        UNION ALL
        SELECT 'orders_lineitem_orderkey', a.c, b.c
          FROM oo a FULL OUTER JOIN lo b USING (k)
        UNION ALL
        SELECT 'customer_orders_custkey', a.c, b.c
          FROM cc a FULL OUTER JOIN oc b USING (k))
      SELECT join_name,
        CAST(sum(CASE WHEN ca IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS keys_left,
        CAST(sum(CASE WHEN cb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS keys_right,
        CAST(sum(CASE WHEN ca IS NOT NULL AND cb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS keys_matched,
        COALESCE(CAST(sum(ca * cb) AS BIGINT), 0) AS est_rows,
        COALESCE(CAST(max(ca * cb) AS BIGINT), 0) AS hot_key_rows,
        CAST(CASE WHEN COALESCE(sum(ca * cb), 0) > 0
          THEN (max(ca * cb) * 1000000) // sum(ca * cb) ELSE 0 END AS BIGINT) AS hot_share_ppm
      FROM f GROUP BY join_name ORDER BY join_name""")),

    // ----- k-core decomposition (fixed-round peeling) ---------------------
    // Graph-QA beyond q160's clustering coefficient: the k-core is the
    // maximal subgraph where every node keeps degree ≥ k — the standard
    // "dense kernel vs loose periphery" split for co-occurrence and
    // near-dup graphs (peripheral nodes are the safe-to-prune ones).
    // Peeling is iterative; BOTH engines run exactly 8 rounds, so the
    // per-round survivor counts are equal whether or not the peel has
    // converged — the fixed-round trick that makes an iterative
    // algorithm oracle-comparable. k=80 sits below the co-purchase
    // graph's k-core phase transition (median degree ≈ 115; k≳90
    // collapses the whole graph, the classic random-graph cliff), so
    // the trajectory shows a real cascade settling into a stable
    // nonempty core by round ~5. Spark-side each round is one
    // two-phase degree aggregate + two semi-joins against the kept-node
    // set, with the edge list localCheckpointed per round so lineage
    // stays flat; the oracle unrolls the same 8 rounds as chained CTEs.
    ("q166_kcore_peel", (s: SparkSession, dir: String) => {
      import s.implicits._
      val k = 80
      val items = Tables.t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      var edges = items.toDF("ok", "a").join(items.toDF("ok", "b"), Seq("ok"))
        .filter($"a" < $"b").select($"a", $"b").distinct().localCheckpoint()
      // peeling is monotone (survivor sets only shrink), so equal
      // (n_nodes, n_edges) across a round proves the fixpoint — the
      // remaining rounds are identities and re-emit the last summary
      // for free. The driver-side counts are loop CONTROL over
      // already-checkpointed blocks (the cc_star checksum pattern);
      // the emitted cells stay in-DAG aggregates (the q86 rule).
      var prevN = -1L
      var prevM = -1L
      var converged = false
      var lastSummary: DataFrame = null
      val summaries = (1 to 8).map { round =>
        if (!converged) {
          val deg = edges.select($"a".as("v")).unionByName(edges.select($"b".as("v")))
            .groupBy($"v").agg(count(lit(1)).as("deg"))
          val keep = deg.filter($"deg" >= k).select($"v").localCheckpoint()
          edges = edges
            .join(keep.select($"v".as("a")), Seq("a"), "left_semi")
            .join(keep.select($"v".as("b")), Seq("b"), "left_semi")
            .select($"a", $"b").localCheckpoint()
          lastSummary = keep.agg(count(lit(1)).as("n_nodes"))
            .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
            .localCheckpoint()
          // loop control reads the checkpointed one-row summary: one
          // cheap local-block read (head) replaces the two full count()
          // jobs per round it used to launch (guide §1.2: fewer passes)
          val row = lastSummary.head()
          val n = row.getLong(0)
          val m = row.getLong(1)
          converged = n == prevN && m == prevM
          prevN = n
          prevM = m
        }
        lastSummary.select(lit(round).as("round"), $"n_nodes", $"n_edges")
      }
      summaries.reduce(_ unionByName _).orderBy("round")
    }, Some {
      val k = 80
      // MATERIALIZED is load-bearing: each round references the prior
      // round's CTEs three times, so default inlining would expand e8
      // into 3^8 copies of the base scan
      val rounds = (1 to 8).map { r =>
        s"""n$r AS MATERIALIZED (SELECT v FROM (SELECT a AS v FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1})
             GROUP BY v HAVING count(*) >= $k),
           e$r AS MATERIALIZED (SELECT e.a, e.b FROM e${r - 1} e
             JOIN n$r x ON e.a = x.v JOIN n$r y ON e.b = y.v)"""
      }.mkString(",\n")
      val sel = (1 to 8).map { r =>
        s"""SELECT $r AS round, (SELECT CAST(count(*) AS BIGINT) FROM n$r) AS n_nodes,
             (SELECT CAST(count(*) AS BIGINT) FROM e$r) AS n_edges"""
      }.mkString("\nUNION ALL\n")
      s"""
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS a, b.pk AS b
        FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk),
      $rounds
      $sel
      ORDER BY round"""
    }),

    // ----- embedding dimension-truncation recall audit (MRL) --------------
    // The Matryoshka question: if the index stores only the first 32 of
    // 64 dimensions (half the memory, half the dot-product cost at
    // 100 TB), how much of the exact top-5 survives? Both top-5 sets are
    // brute-force exact over the quantized integer vectors (full = q24's
    // shape, truncated = the same with slice(qvec, 1, 32)), so the
    // overlap is a pure integer per query — no ANN noise in the
    // measurement. The query side broadcasts in both passes; the
    // per-query overlap join is an equi-join on (q_id, c_id).
    ("q167_mrl_truncation", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
        .localCheckpoint() // two brute-force passes + truncation read it
      val trunc = prepared.select($"id", slice($"qvec", 1, 32).as("qvec"))
        .withColumn("n2", graft.functions.Lambda.bind1($"qvec")(a => Similarity.norm2(a)))
      val isQuery = col("id") % 100 === 0
      val full = Similarity.bruteForceTopK(prepared.filter(isQuery), prepared, k = 5)
      val half = Similarity.bruteForceTopK(trunc.filter(isQuery), trunc, k = 5)
        .select($"q_id", $"c_id", lit(1).as("hit"))
      full.join(half, Seq("q_id", "c_id"), "left")
        .groupBy($"q_id")
        .agg(sum(coalesce($"hit", lit(0))).cast("long").as("n_overlap"),
          max(when($"rank" === 1, coalesce($"hit", lit(0))).otherwise(0))
            .cast("long").as("top1_kept"))
        .orderBy("q_id")
    }, Some(s"""
      WITH $annPrepSql,
      t AS (SELECT vec_id, qvec[1:32] AS tvec,
          list_dot_product(qvec[1:32], qvec[1:32]) AS tn2 FROM n),
      qf AS (SELECT * FROM n WHERE vec_id % 100 = 0),
      qt AS (SELECT * FROM t WHERE vec_id % 100 = 0),
      sf AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
          list_dot_product(q.qvec, c.qvec) / sqrt(q.n2 * c.n2) AS cos_sim
        FROM n c, qf q WHERE q.vec_id <> c.vec_id),
      st AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
          list_dot_product(q.tvec, c.tvec) / sqrt(q.tn2 * c.tn2) AS cos_sim
        FROM t c, qt q WHERE q.vec_id <> c.vec_id),
      rf AS (SELECT q_id, c_id,
          row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk
        FROM sf),
      rt AS (SELECT q_id, c_id,
          row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk
        FROM st),
      ff AS (SELECT q_id, c_id, rnk FROM rf WHERE rnk <= 5),
      tt AS (SELECT q_id, c_id FROM rt WHERE rnk <= 5)
      SELECT ff.q_id,
        CAST(sum(CASE WHEN tt.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
        CAST(max(CASE WHEN ff.rnk = 1 AND tt.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS top1_kept
      FROM ff LEFT JOIN tt ON tt.q_id = ff.q_id AND tt.c_id = ff.c_id
      GROUP BY ff.q_id ORDER BY ff.q_id""")),

    // ----- seasonal anomaly monitor (hour-of-day baseline) ----------------
    // Ingest monitoring for the event feed: per (event_type, hour-of-day)
    // the median daily count is the seasonal baseline, and a day is
    // anomalous when its count deviates from that median by more than
    // the median itself (|c - med| > med). Exactness trick: med2 =
    // 2·median is an exact integer for integer counts (the even-n
    // midpoint average doubles back to an integer — both engines'
    // interpolating percentile agrees bit-for-bit on (a+b)/2 of longs),
    // so the flag is the integer inequality |2c - med2| > med2 and no
    // float crosses the gate; max deviation is emitted in ppm by
    // integer division. Output is the bounded per-slot monitor table
    // (types × 24 rows), never per-event — at 100 TB the hourly count
    // aggregate is the only full scan and everything after it is
    // metadata-scale.
    ("q168_seasonal_anomaly", (s: SparkSession, dir: String) => {
      import s.implicits._
      val c = Tables.t(s, dir, "events")
        .groupBy($"event_type", to_date($"ts").as("day"), hour($"ts").as("hod"))
        .agg(count(lit(1)).as("c"))
      val base = c.groupBy($"event_type", $"hod")
        .agg(expr("CAST(2 * percentile(c, 0.5D) AS BIGINT)").as("med2"))
      c.join(base, Seq("event_type", "hod"))
        .groupBy($"event_type", $"hod")
        .agg(count(lit(1)).as("n_days"), max($"med2").as("med2"),
          sum(when(abs($"c" * 2 - $"med2") > $"med2", 1L).otherwise(0L)).as("n_anomalous"),
          max(expr("(abs(c * 2 - med2) * 1000000) div med2")).as("max_dev_ppm"))
        .orderBy("event_type", "hod")
    }, Some("""
      WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(extract(hour FROM ts) AS INTEGER) AS hod, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2, 3),
      base AS (SELECT event_type, hod, CAST(2 * median(c) AS BIGINT) AS med2
        FROM c GROUP BY 1, 2)
      SELECT c.event_type, c.hod, CAST(count(*) AS BIGINT) AS n_days,
        max(med2) AS med2,
        CAST(sum(CASE WHEN abs(c * 2 - med2) > med2 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous,
        CAST(max((abs(c * 2 - med2) * 1000000) // med2) AS BIGINT) AS max_dev_ppm
      FROM c JOIN base USING (event_type, hod)
      GROUP BY 1, 2 ORDER BY event_type, hod""")),

    // ----- character-entropy quality signal --------------------------------
    // The compression-proxy quality filter (low character entropy =
    // boilerplate / repetition / key-mashing; used alongside q17's
    // ratio signals and q105's repetition rates): per-doc Shannon
    // entropy over the character distribution, H = ln n − (1/n)·Σ c·ln c,
    // kept integral by the micro-ln convention (q119 rule) and emitted
    // UNNORMALIZED as h_scaled = n·⌊ln n·10⁶⌉ − Σ c·⌊ln c·10⁶⌉ plus the
    // per-char integer division — exact integers end to end. One
    // explode + one two-phase (doc, char) aggregate + one per-doc
    // aggregate, all partitioned by doc id; nothing global. (The corpus
    // is BMP-only, so Spark's code-unit split and DuckDB's codepoint
    // split segment identically — the q23 precedent.)
    ("q169_char_entropy", (s: SparkSession, dir: String) => {
      import s.implicits._
      val lnMicro = (c: Column) =>
        floor(log(c.cast("double")) * 1000000 + 0.5).cast("long")
      val cnt = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", explode(split($"text", "")).as("ch"))
        .filter(length($"ch") > 0)
        .groupBy($"doc_id", $"ch").agg(count(lit(1)).as("c"))
      cnt.groupBy($"doc_id")
        .agg(sum($"c").as("n"), count(lit(1)).as("n_distinct_chars"),
          sum($"c" * lnMicro($"c")).as("sum_c_lnc"))
        // clamped at 0: exact entropy is ≥ 0 but the ±0.5µ ln rounding
        // could dip a degenerate doc below it, and Spark's div truncates
        // where DuckDB's // floors — non-negative operands sidestep that
        .select($"doc_id", $"n", $"n_distinct_chars",
          greatest($"n" * lnMicro($"n") - $"sum_c_lnc", lit(0L)).as("h_scaled"))
        .withColumn("h_micro_per_char", expr("h_scaled div n"))
        .orderBy("doc_id")
    }, Some("""
      WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
      cnt AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        FROM ch WHERE length(ch) > 0 GROUP BY 1, 2),
      agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
          CAST(count(*) AS BIGINT) AS n_distinct_chars,
          CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_c_lnc
        FROM cnt GROUP BY 1),
      h AS (SELECT doc_id, n, n_distinct_chars,
          greatest(n * CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) - sum_c_lnc,
            0) AS h_scaled
        FROM agg)
      SELECT doc_id, n, n_distinct_chars, h_scaled,
        CAST(h_scaled // n AS BIGINT) AS h_micro_per_char
      FROM h ORDER BY doc_id""")),

    // ----- frequent triple mining (market-basket, order-bounded) ----------
    // q151's pair mining extended to 3-itemsets. The classic Apriori
    // worry — candidate explosion — is structurally excluded here the
    // same way q151 excludes it for pairs: triples are generated by a
    // per-order 3-way self-equi-join on the order key, so output is
    // Σ C(items_o, 3) ≈ linear in orders (items-per-order is bounded by
    // the basket, not the catalog), never C(|parts|, 3). Support filter
    // + total-ordered top-32 via TakeOrderedAndProject.
    ("q170_frequent_triples", (s: SparkSession, dir: String) => {
      import s.implicits._
      val items = Tables.t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      items.toDF("ok", "a")
        .join(items.toDF("ok", "b"), Seq("ok")).filter($"a" < $"b")
        .join(items.toDF("ok", "c"), Seq("ok")).filter($"b" < $"c")
        .groupBy($"a", $"b", $"c").agg(count(lit(1)).as("support"))
        .filter($"support" >= 2)
        .orderBy(desc("support"), $"a", $"b", $"c")
        .limit(32)
    }, Some("""
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      t AS (SELECT a.pk AS a, b.pk AS b, c.pk AS c
        FROM items a JOIN items b ON b.ok = a.ok AND a.pk < b.pk
                     JOIN items c ON c.ok = a.ok AND b.pk < c.pk),
      f AS (SELECT a, b, c, CAST(count(*) AS BIGINT) AS support
        FROM t GROUP BY 1, 2, 3 HAVING count(*) >= 2)
      SELECT a, b, c, support FROM f
      ORDER BY support DESC, a, b, c LIMIT 32""")),

    // ----- behavioral path mining (event trigrams) ------------------------
    // Sequence mining over the event feed: per (user, day) the ordered
    // event-type sequence yields its length-3 paths via two lead()
    // windows — one shuffle on the session key, no joins, no explode of
    // anything unbounded (paths per user-day = events − 2). The path
    // distribution table is the bounded output (≤ |types|³ rows); at
    // 100 TB the window partitions by the session key exactly as here.
    // Event order inside a user is total (ts is unique per user in this
    // feed; the ts, event_id tie-break makes it total regardless).
    ("q171_path_mining", (s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"day").orderBy($"ts", $"event_id")
      Tables.t(s, dir, "events")
        .select($"user_id", to_date($"ts").as("day"), $"ts", $"event_id", $"event_type")
        .withColumn("e2", lead($"event_type", 1).over(w))
        .withColumn("e3", lead($"event_type", 2).over(w))
        .filter($"e3".isNotNull)
        .select(concat_ws("->", $"event_type", $"e2", $"e3").as("path"))
        .groupBy($"path").agg(count(lit(1)).as("n_paths"))
        .orderBy("path")
    }, Some("""
      WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, event_type,
          lead(event_type, 1) OVER (PARTITION BY user_id, CAST(ts AS DATE)
            ORDER BY ts, event_id) AS e2,
          lead(event_type, 2) OVER (PARTITION BY user_id, CAST(ts AS DATE)
            ORDER BY ts, event_id) AS e3
        FROM events)
      SELECT event_type || '->' || e2 || '->' || e3 AS path,
        CAST(count(*) AS BIGINT) AS n_paths
      FROM e WHERE e3 IS NOT NULL
      GROUP BY 1 ORDER BY path""")),

    // ----- time-decayed popularity (power-of-two decay) -------------------
    // Recency-weighted counts — the freshness prior every sampling/
    // ranking pipeline wants — with the decay kept EXACT: weight =
    // 2^(29 − age_days) for age ≤ 29 (one shiftleft per row, zero
    // beyond), so the "half-life of one day" sum is pure integer
    // arithmetic and engine-identical; no exp()/pow() float touches the
    // gate. The anchor date is an in-DAG broadcast scalar (q86 rule).
    // Weighted sums fit comfortably: N·2^29 at any per-day volume this
    // side of 2^33 events/day.
    ("q172_decayed_popularity", (s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables.t(s, dir, "events")
      val anchor = ev.agg(max(to_date($"ts")).as("mx"))
      ev.crossJoin(broadcast(anchor))
        .select($"event_type", datediff($"mx", to_date($"ts")).as("age"))
        .select($"event_type", $"age",
          when($"age" <= 29, expr("shiftleft(CAST(1 AS BIGINT), 29 - age)"))
            .otherwise(lit(0L)).as("w"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when($"age" <= 7, 1L).otherwise(0L)).as("n_last_week"),
          sum($"w").as("decayed_weight"))
        .orderBy("event_type")
    }, Some("""
      WITH mx AS (SELECT max(CAST(ts AS DATE)) AS mx FROM events),
      a AS (SELECT event_type, datediff('day', CAST(ts AS DATE), mx) AS age
        FROM events, mx),
      w AS (SELECT event_type, age,
          CASE WHEN age <= 29 THEN CAST(1 AS BIGINT) << (29 - age) ELSE 0 END AS w
        FROM a)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        CAST(sum(CASE WHEN age <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_last_week,
        CAST(sum(w) AS BIGINT) AS decayed_weight
      FROM w GROUP BY 1 ORDER BY event_type"""))
  ) ++ Seq(

    // ----- hybrid retrieval: reciprocal rank fusion -----------------------
    // The modern RAG-retrieval primitive: fuse a keyword ranking and a
    // vector ranking by RRF score Σ 1/(60 + rank), computed over the
    // TRUNCATED top-20 of each list — the form real systems fuse (a
    // full-corpus global rank would be a single-partition sort; top-k
    // per list is TakeOrderedAndProject, so each side collapses
    // map-side before any global step). The keyword query is the
    // corpus's top-3 tokens (in-DAG, deterministic ties), the vector
    // query is doc 0's embedding (vec_id aligns 1:1 with doc_id);
    // fusion is a full-outer equi-join of two ≤20-row lists and the
    // RRF contributions are exact integers: ⌊10⁶/(60+r)⌋.
    ("q173_hybrid_rrf", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
      val toks = docs
        .select($"doc_id", explode(split(TA.normText($"text"), " ")).as("tok"))
        .filter($"tok" =!= "")
      val qterms = toks.groupBy($"tok").agg(count(lit(1)).as("ct"))
        .orderBy(desc("ct"), $"tok").limit(3).select($"tok")
      val kwTop = toks.join(broadcast(qterms), Seq("tok"))
        .filter($"doc_id" =!= 0)
        .groupBy($"doc_id").agg(count(lit(1)).as("kw_score"))
        .orderBy(desc("kw_score"), $"doc_id").limit(20)
        .withColumn("kw_rank",
          row_number().over(Window.orderBy(desc("kw_score"), $"doc_id")))
      val prepared = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      val qv = prepared.filter($"id" === 0)
        .select($"qvec".as("q_vec"), $"n2".as("q_n2"))
      val vecTop = prepared.filter($"id" =!= 0).crossJoin(broadcast(qv))
        .select($"id".as("doc_id"),
          Similarity.cosine(Similarity.dot($"qvec", $"q_vec"), $"n2", $"q_n2")
            .as("cos_sim"))
        .orderBy(desc("cos_sim"), $"doc_id").limit(20)
        .withColumn("vec_rank",
          row_number().over(Window.orderBy(desc("cos_sim"), $"doc_id")))
      kwTop.select($"doc_id", $"kw_rank")
        .join(vecTop.select($"doc_id", $"vec_rank"), Seq("doc_id"), "full_outer")
        .select($"doc_id",
          coalesce($"kw_rank", lit(0)).cast("long").as("kw_rank"),
          coalesce($"vec_rank", lit(0)).cast("long").as("vec_rank"),
          (coalesce(expr("1000000 div (60 + kw_rank)"), lit(0)) +
            coalesce(expr("1000000 div (60 + vec_rank)"), lit(0)))
            .cast("long").as("rrf_micro"))
        .orderBy(desc("rrf_micro"), $"doc_id")
    }, Some(s"""
      WITH toks AS (SELECT doc_id, unnest(string_split(${TA.normTextSql}, ' ')) AS tok
        FROM documents),
      tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
      qt AS (SELECT tok FROM (SELECT tok, count(*) AS ct FROM tk
        GROUP BY 1 ORDER BY ct DESC, tok LIMIT 3)),
      kw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kw_score
        FROM tk JOIN qt USING (tok) WHERE doc_id <> 0 GROUP BY 1),
      kwt AS (SELECT doc_id, row_number() OVER (ORDER BY kw_score DESC, doc_id) AS kw_rank
        FROM (SELECT * FROM kw ORDER BY kw_score DESC, doc_id LIMIT 20)),
      ${Similarity.prepareSql},
      qv AS (SELECT qvec AS q_vec, n2 AS q_n2 FROM n WHERE vec_id = 0),
      vt AS (SELECT vec_id AS doc_id,
          list_dot_product(qvec, q_vec) / sqrt(n2 * q_n2) AS cos_sim
        FROM n, qv WHERE vec_id <> 0
        ORDER BY cos_sim DESC, vec_id LIMIT 20),
      vtr AS (SELECT doc_id, row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS vec_rank
        FROM vt),
      f AS (SELECT COALESCE(k.doc_id, v.doc_id) AS doc_id, k.kw_rank, v.vec_rank
        FROM kwt k FULL OUTER JOIN vtr v ON v.doc_id = k.doc_id)
      SELECT doc_id,
        CAST(COALESCE(kw_rank, 0) AS BIGINT) AS kw_rank,
        CAST(COALESCE(vec_rank, 0) AS BIGINT) AS vec_rank,
        CAST(COALESCE(1000000 // (60 + kw_rank), 0)
          + COALESCE(1000000 // (60 + vec_rank), 0) AS BIGINT) AS rrf_micro
      FROM f ORDER BY rrf_micro DESC, doc_id"""))
  )
}
