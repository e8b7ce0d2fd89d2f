package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-6 operator surface: the pretraining-corpus curation family —
  * repetition-based quality signals (the Gopher/C4-style duplicate-token
  * and top-n-gram fractions), concat-and-chunk sequence packing as a
  * distributed two-level prefix sum, domain temperature-mixing weights,
  * and a benchmark-contamination screen via an 8-gram equi-join.
  *
  * Determinism rules as in Round3Queries: integer/exact arithmetic inside
  * aggregates, IEEE-correctly-rounded ops only (division, sqrt) at the
  * double boundary, total ORDER BY, identical aliases both engines.
  */
object Round6Queries {

  type QFn = (SparkSession, String) => DataFrame

  /** DuckDB rendering of TextAnalysis.normText (same as ExtQueries).
    * Shared with Round11Queries' composed pipeline oracle. */
  private[operators] val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))"""

  /** Whitespace token count of the normalized text, empty-safe.
    * Shared with Round11Queries' composed pipeline. */
  private[operators] def tokCount(norm: Column): Column =
    when(norm === "", lit(0L)).otherwise(size(split(norm, " ")).cast("long"))

  private[operators] val tokCountSql =
    s"CASE WHEN $normSql = '' THEN 0 ELSE len(string_split($normSql, ' ')) END"

  val queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- corpus quality: repetition signals (Gopher/C4 family) ---------
    ("q105_repetition_signals", (s: SparkSession, dir: String) => {
      import s.implicits._
      // duplicate-token fraction, top-token fraction and top-bigram
      // fraction per document: explode → two-phase hash aggregate; the
      // bigram stream is a lead() window partitioned per doc (parallel
      // across docs, no global state). All fractions are single IEEE
      // divisions of exact integer counts — bit-identical on any engine.
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
      val toks = docs
        .select($"doc_id", posexplode(split(TA.normText($"text"), " ")).as(Seq("pos", "tok")))
        .filter($"tok" =!= "")
      val tf = toks.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("cnt"))
      val tokStats = tf.groupBy($"doc_id").agg(
        sum($"cnt").as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        max($"cnt").as("top_tok_cnt"))
      val w = Window.partitionBy($"doc_id").orderBy($"pos")
      val bg = toks
        .withColumn("nxt", lead($"tok", 1).over(w))
        .filter($"nxt".isNotNull)
        .select($"doc_id", concat_ws(" ", $"tok", $"nxt").as("bg"))
        .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("cnt"))
      val bgStats = bg.groupBy($"doc_id").agg(
        sum($"cnt").as("n_bigrams"), max($"cnt").as("top_bg_cnt"))
      tokStats.join(bgStats, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tokens", $"n_distinct_tokens",
          (($"n_tokens" - $"n_distinct_tokens").cast("double") / $"n_tokens")
            .as("dup_token_frac"),
          ($"top_tok_cnt".cast("double") / $"n_tokens").as("top_token_frac"),
          coalesce($"top_bg_cnt".cast("double") / $"n_bigrams", lit(0.0))
            .as("top_bigram_frac"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH t0 AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok,
          generate_subscripts(string_split($normSql, ' '), 1) AS pos
        FROM documents),
      toks AS (SELECT doc_id, pos, tok FROM t0 WHERE tok <> ''),
      tf AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
      ts AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
          count(*) AS n_distinct_tokens, max(cnt) AS top_tok_cnt
        FROM tf GROUP BY doc_id),
      led AS (SELECT doc_id, tok,
          lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM toks),
      bgf AS (SELECT doc_id, tok || ' ' || nxt AS bg, count(*) AS cnt
        FROM led WHERE nxt IS NOT NULL GROUP BY 1, 2),
      bs AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
          max(cnt) AS top_bg_cnt FROM bgf GROUP BY doc_id)
      SELECT doc_id, n_tokens, n_distinct_tokens,
        CAST(n_tokens - n_distinct_tokens AS DOUBLE) / n_tokens AS dup_token_frac,
        CAST(top_tok_cnt AS DOUBLE) / n_tokens AS top_token_frac,
        COALESCE(CAST(top_bg_cnt AS DOUBLE) / n_bigrams, 0.0) AS top_bigram_frac
      FROM ts LEFT JOIN bs USING (doc_id)
      ORDER BY doc_id""")),

    // ----- sequence packing: concat-and-chunk as a 2-level prefix sum ----
    ("q106_sequence_packing", (s: SparkSession, dir: String) => {
      import s.implicits._
      // the packing step of a pretraining pipeline: documents are
      // concatenated in doc_id order and chunked into fixed 512-token
      // context windows. The global token offset is a DISTRIBUTED prefix
      // sum: cumsum within doc_id/2^16 groups (parallel windows) + a
      // running offset over the per-group totals — the output is
      // group-width-invariant, and 2^16 keeps BOTH levels bounded at
      // corpus scale (1e9 docs → 65k-row windows × 15k groups, with the
      // offset window over just those 15k rows; nest a third level the
      // same way if docs outgrow width²). 512 = 2^9 keeps the bin math
      // exact in doubles (floor of an exact power-of-two division).
      val C = 512
      val perDoc = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", tokCount(TA.normText($"text")).as("n_tokens"),
          floor($"doc_id" / 65536).cast("long").as("grp"))
      val wIn = Window.partitionBy($"grp").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val withCum = perDoc.withColumn("cum_in_grp", sum($"n_tokens").over(wIn))
      val grpTotals = perDoc.groupBy($"grp").agg(sum($"n_tokens").as("grp_tot"))
      val wG = Window.orderBy($"grp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offsets = grpTotals
        .withColumn("grp_off", sum($"grp_tot").over(wG) - $"grp_tot")
        .select($"grp", $"grp_off")
      withCum.join(broadcast(offsets), Seq("grp"))
        .select($"doc_id", $"n_tokens",
          ($"grp_off" + $"cum_in_grp" - $"n_tokens").as("start_tok"))
        .select($"doc_id", $"n_tokens", $"start_tok",
          floor($"start_tok" / C).cast("long").as("bin_first"),
          when($"n_tokens" === 0, floor($"start_tok" / C))
            .otherwise(floor(($"start_tok" + $"n_tokens" - 1) / C))
            .cast("long").as("bin_last"))
        .withColumn("n_bins", $"bin_last" - $"bin_first" + 1)
        .orderBy("doc_id")
    }, Some(s"""
      WITH d AS (SELECT doc_id, CAST($tokCountSql AS BIGINT) AS n_tokens
        FROM documents),
      c AS (SELECT doc_id, n_tokens,
          CAST(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_tok
        FROM d)
      SELECT doc_id, n_tokens, start_tok,
        CAST(floor(start_tok / 512.0) AS BIGINT) AS bin_first,
        CAST(CASE WHEN n_tokens = 0 THEN floor(start_tok / 512.0)
             ELSE floor((start_tok + n_tokens - 1) / 512.0) END AS BIGINT) AS bin_last,
        CAST(CASE WHEN n_tokens = 0 THEN floor(start_tok / 512.0)
             ELSE floor((start_tok + n_tokens - 1) / 512.0) END
           - floor(start_tok / 512.0) + 1 AS BIGINT) AS n_bins
      FROM c ORDER BY doc_id""")),

    // ----- domain mixing: temperature-weighted sampling ------------------
    ("q107_domain_mixing", (s: SparkSession, dir: String) => {
      import s.implicits._
      // per-source token shares and a temperature-α=0.5 sampling weight.
      // Normalizing by the LARGEST domain's weight (max, order-
      // independent) instead of the sum keeps the output bit-exact across
      // engines: share division and sqrt are IEEE-correctly-rounded; a
      // cross-group float sum would depend on aggregation order.
      val perSrc = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", tokCount(TA.normText($"text")).as("n_tokens"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"))
      // corpus totals as an unbounded window over the POST-aggregate rows
      // (one per source — tiny), so the corpus scans exactly once
      val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      perSrc
        .withColumn("tot_tokens", sum($"n_tokens").over(wAll))
        .withColumn("max_tokens", max($"n_tokens").over(wAll))
        .select($"source", $"n_docs", $"n_tokens",
          ($"n_tokens".cast("double") / $"tot_tokens").as("tok_share"),
          (sqrt($"n_tokens".cast("double") / $"tot_tokens") /
            sqrt($"max_tokens".cast("double") / $"tot_tokens")).as("mix_weight"))
        .orderBy("source")
    }, Some(s"""
      WITH d AS (SELECT source, CAST($tokCountSql AS BIGINT) AS n_tokens
        FROM documents),
      s AS (SELECT source, count(*) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM d GROUP BY source),
      t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
          CAST(max(n_tokens) AS BIGINT) AS max_tokens FROM s)
      SELECT source, n_docs, n_tokens,
        CAST(n_tokens AS DOUBLE) / tot_tokens AS tok_share,
        sqrt(CAST(n_tokens AS DOUBLE) / tot_tokens)
          / sqrt(CAST(max_tokens AS DOUBLE) / tot_tokens) AS mix_weight
      FROM s CROSS JOIN t ORDER BY source""")),

    // ----- curation funnel: staged filters with survivor counts ----------
    ("q109_curation_funnel", (s: SparkSession, dir: String) => {
      import s.implicits._
      // the end-to-end corpus-cleaning funnel: length floor → repetition
      // ceilings → exact dedup (keep-first among survivors), reported as
      // survivors per stage. One pass computes all per-doc signals; the
      // dedup stage is a keep-first window over the md5 fingerprint OF
      // THE SURVIVORS (funnel semantics — dedup sees only what earlier
      // filters let through). The stage report is a 5-row aggregate of
      // cumulative conjunctions — no per-stage rescans.
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
      val toks = docs
        .select($"doc_id", explode(split(TA.normText($"text"), " ")).as("tok"))
        .filter($"tok" =!= "")
      val tf = toks.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("cnt"))
      val sig = tf.groupBy($"doc_id").agg(
        sum($"cnt").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max($"cnt").as("top_cnt"))
      val flagged = docs.select($"doc_id", md5(TA.normText($"text")).as("fp"))
        .join(sig, Seq("doc_id"), "left")
        .select($"doc_id", $"fp",
          coalesce($"n_tokens", lit(0L)).as("n_tokens"),
          coalesce($"n_distinct", lit(0L)).as("n_distinct"),
          coalesce($"top_cnt", lit(0L)).as("top_cnt"))
        .select($"doc_id", $"fp",
          // thresholds as pure integer inequalities (dup_frac <= 0.7 ↔
          // 10·dup <= 7·n; top_frac <= 0.2 ↔ 5·top <= n): bit-exact on
          // any engine, immune to decimal-vs-double literal semantics
          ($"n_tokens" >= 10).as("p1"),
          ($"n_tokens" >= 10 &&
            ($"n_tokens" - $"n_distinct") * 10 <= $"n_tokens" * 7).as("p2"),
          ($"n_tokens" >= 10 &&
            ($"n_tokens" - $"n_distinct") * 10 <= $"n_tokens" * 7 &&
            $"top_cnt" * 5 <= $"n_tokens").as("p3"))
      val wFp = Window.partitionBy($"fp").orderBy($"doc_id")
      val dedup = flagged.filter($"p3")
        .withColumn("keep", row_number().over(wFp) === 1)
      val counts = flagged.agg(
        count(lit(1)).as("s0_all"),
        sum(when($"p1", 1L).otherwise(0L)).as("s1_len"),
        sum(when($"p2", 1L).otherwise(0L)).as("s2_dupfrac"),
        sum(when($"p3", 1L).otherwise(0L)).as("s3_toptok"))
      val kept = dedup.agg(sum(when($"keep", 1L).otherwise(0L)).as("s4_dedup"))
      counts.crossJoin(kept)
        .select(explode(map(
          lit("s0_all"), $"s0_all", lit("s1_len"), $"s1_len",
          lit("s2_dupfrac"), $"s2_dupfrac", lit("s3_toptok"), $"s3_toptok",
          lit("s4_dedup"), $"s4_dedup")).as(Seq("stage", "n_docs")))
        .orderBy("stage")
    }, Some(s"""
      WITH toks AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
        FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS cnt FROM toks WHERE tok <> '' GROUP BY 1, 2),
      sig AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
          count(*) AS n_distinct, max(cnt) AS top_cnt FROM tf GROUP BY doc_id),
      flagged AS (SELECT d.doc_id, md5($normSql) AS fp,
          COALESCE(n_tokens, 0) AS n_tokens, COALESCE(n_distinct, 0) AS n_distinct,
          COALESCE(top_cnt, 0) AS top_cnt
        FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id),
      p AS (SELECT doc_id, fp,
          n_tokens >= 10 AS p1,
          n_tokens >= 10 AND (n_tokens - n_distinct) * 10 <= n_tokens * 7 AS p2,
          n_tokens >= 10 AND (n_tokens - n_distinct) * 10 <= n_tokens * 7
            AND top_cnt * 5 <= n_tokens AS p3
        FROM flagged),
      dedup AS (SELECT doc_id,
          row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1 AS keep
        FROM p WHERE p3),
      c AS (SELECT count(*) AS s0_all,
          CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS s1_len,
          CAST(sum(CASE WHEN p2 THEN 1 ELSE 0 END) AS BIGINT) AS s2_dupfrac,
          CAST(sum(CASE WHEN p3 THEN 1 ELSE 0 END) AS BIGINT) AS s3_toptok
        FROM p),
      k AS (SELECT CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS s4_dedup
        FROM dedup)
      SELECT stage, n_docs FROM (
        SELECT 's0_all' AS stage, s0_all AS n_docs FROM c
        UNION ALL SELECT 's1_len', s1_len FROM c
        UNION ALL SELECT 's2_dupfrac', s2_dupfrac FROM c
        UNION ALL SELECT 's3_toptok', s3_toptok FROM c
        UNION ALL SELECT 's4_dedup', s4_dedup FROM k)
      ORDER BY stage""")),

    // ----- contamination screen: n-gram overlap vs a held-out set --------
    ("q108_contamination", (s: SparkSession, dir: String) => {
      import s.implicits._
      // benchmark-contamination check: every corpus document is screened
      // against a held-out eval slice (doc_id % 97 = 0) by exact word-
      // n-gram overlap. Candidate generation is an equi-join ON THE
      // N-GRAM STRING — the n-gram is its own blocking key, so there is
      // no cross join at any corpus size. No broadcast hint: a real
      // benchmark set is fixed-size and AQE will broadcast it when it
      // fits, but this demo slice grows with the corpus, so the strategy
      // choice is left to the planner. Output: distinct shared n-grams
      // per (corpus, eval) pair and the contaminated fraction of the
      // eval doc. Real screens use 8-13-gram windows; n=3 here because
      // the synthetic corpus has no verbatim 8-gram collisions to
      // demonstrate on — the plan shape is identical for any n.
      val n = 3
      def ngrams(df: DataFrame): DataFrame = df
        .select($"doc_id", split(TA.normText($"text"), " ").as("a"))
        .filter(size($"a") >= n)
        .select($"doc_id", explode(expr(
          s"transform(sequence(1, size(a) - ${n - 1}), j -> array_join(slice(a, j, $n), ' '))"))
          .as("ngram"))
        .distinct()
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
      val corpus = ngrams(docs.filter($"doc_id" % 97 =!= 0))
      val eval = ngrams(docs.filter($"doc_id" % 97 === 0))
        .withColumnRenamed("doc_id", "eval_doc_id")
      val evalSizes = eval.groupBy($"eval_doc_id")
        .agg(count(lit(1)).as("n_eval_ngrams"))
      corpus.join(eval, Seq("ngram"))
        .groupBy($"doc_id", $"eval_doc_id")
        .agg(count(lit(1)).as("n_shared"))
        .join(evalSizes, Seq("eval_doc_id"))
        .select($"doc_id", $"eval_doc_id", $"n_shared",
          ($"n_shared".cast("double") / $"n_eval_ngrams").as("contam_frac"))
        .orderBy("doc_id", "eval_doc_id")
    }, Some(s"""
      WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS a
        FROM documents WHERE len(string_split($normSql, ' ')) >= 3),
      pos AS (SELECT doc_id, a, unnest(range(1, len(a) - 1)) AS j FROM base),
      grams AS (SELECT DISTINCT doc_id,
          array_to_string(list_slice(a, CAST(j AS INT), CAST(j + 2 AS INT)), ' ') AS ngram
        FROM pos),
      corpus AS (SELECT * FROM grams WHERE doc_id % 97 <> 0),
      ev AS (SELECT doc_id AS eval_doc_id, ngram FROM grams WHERE doc_id % 97 = 0),
      es AS (SELECT eval_doc_id, count(*) AS n_eval_ngrams FROM ev GROUP BY 1),
      shared AS (SELECT c.doc_id, e.eval_doc_id, count(*) AS n_shared
        FROM corpus c JOIN ev e USING (ngram) GROUP BY 1, 2)
      SELECT doc_id, eval_doc_id, n_shared,
        CAST(n_shared AS DOUBLE) / n_eval_ngrams AS contam_frac
      FROM shared JOIN es USING (eval_doc_id)
      ORDER BY doc_id, eval_doc_id""")),

    // ----- mixing APPLY: deterministic hash-Bernoulli sampling -----------
    ("q110_mix_sampling_apply", (s: SparkSession, dir: String) => {
      import s.implicits._
      // q107 computes the temperature weights; this applies them — each
      // doc is kept iff md5(doc_id)/2^32 < its source's weight, so the
      // sample is deterministic, seedless, and reproducible on any
      // engine. Two passes by design: pass 1 aggregates the 20-row
      // weight table (broadcast), pass 2 applies it row-wise — the only
      // one-pass alternative is a corpus-wide unpartitioned window.
      // The hash fraction is an exact 2^32 division; the weight chain is
      // the q107-verified sqrt/division form.
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"source", tokCount(TA.normText($"text")).as("n_tokens"))
      val perSrc = docs.groupBy($"source").agg(sum($"n_tokens").as("src_tokens"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val weights = perSrc
        .withColumn("tot_tokens", sum($"src_tokens").over(wAll))
        .withColumn("max_tokens", max($"src_tokens").over(wAll))
        .select($"source",
          (sqrt($"src_tokens".cast("double") / $"tot_tokens") /
            sqrt($"max_tokens".cast("double") / $"tot_tokens")).as("mix_weight"))
      val hashed = docs.join(broadcast(weights), Seq("source"))
        .withColumn("h01",
          conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
            .cast("long").cast("double") / 4294967296.0)
      hashed.groupBy($"source")
        .agg(count(lit(1)).as("n_total"),
          sum(when($"h01" < $"mix_weight", 1L).otherwise(0L)).as("n_kept"),
          sum(when($"h01" < $"mix_weight", $"n_tokens").otherwise(lit(0L))).as("kept_tokens"))
        .orderBy("source")
    }, Some(s"""
      WITH d AS (SELECT doc_id, source, CAST($tokCountSql AS BIGINT) AS n_tokens
        FROM documents),
      s AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
        FROM d GROUP BY source),
      t AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS tot_tokens,
          CAST(max(src_tokens) AS BIGINT) AS max_tokens FROM s),
      w AS (SELECT source,
          sqrt(CAST(src_tokens AS DOUBLE) / tot_tokens)
            / sqrt(CAST(max_tokens AS DOUBLE) / tot_tokens) AS mix_weight
        FROM s CROSS JOIN t),
      h AS (SELECT d.doc_id, d.source, d.n_tokens, w.mix_weight,
          CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            / 4294967296.0 AS h01
        FROM d JOIN w USING (source))
      SELECT source, count(*) AS n_total,
        CAST(sum(CASE WHEN h01 < mix_weight THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(sum(CASE WHEN h01 < mix_weight THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
      FROM h GROUP BY source ORDER BY source""")),

    // ----- decontamination APPLY: drop flagged docs ----------------------
    ("q111_decontaminate_apply", (s: SparkSession, dir: String) => {
      import s.implicits._
      // the apply step over q108's screen: a corpus doc is removed when
      // it shares >= 2 distinct n-grams with ANY eval doc (integer
      // threshold — no fraction compare). Output is the full corpus
      // verdict list: every non-eval doc with its eval-hit count and
      // removed flag, so the surviving corpus is `removed = 0`.
      val n = 3
      def ngrams(df: DataFrame): DataFrame = df
        .select($"doc_id", split(TA.normText($"text"), " ").as("a"))
        .filter(size($"a") >= n)
        .select($"doc_id", explode(expr(
          s"transform(sequence(1, size(a) - ${n - 1}), j -> array_join(slice(a, j, $n), ' '))"))
          .as("ngram"))
        .distinct()
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
      val corpus = docs.filter($"doc_id" % 97 =!= 0)
      val evalGrams = ngrams(docs.filter($"doc_id" % 97 === 0))
        .withColumnRenamed("doc_id", "eval_doc_id")
      val hits = ngrams(corpus).join(evalGrams, Seq("ngram"))
        .groupBy($"doc_id", $"eval_doc_id").agg(count(lit(1)).as("n_shared"))
        .filter($"n_shared" >= 2)
        .groupBy($"doc_id").agg(count(lit(1)).as("n_eval_hits"))
      corpus.select($"doc_id")
        .join(hits, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_eval_hits", lit(0L)).as("n_eval_hits"),
          when(coalesce($"n_eval_hits", lit(0L)) > 0, 1L).otherwise(0L).as("removed"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS a
        FROM documents WHERE len(string_split($normSql, ' ')) >= 3),
      pos AS (SELECT doc_id, a, unnest(range(1, len(a) - 1)) AS j FROM base),
      grams AS (SELECT DISTINCT doc_id,
          array_to_string(list_slice(a, CAST(j AS INT), CAST(j + 2 AS INT)), ' ') AS ngram
        FROM pos),
      corpus AS (SELECT * FROM grams WHERE doc_id % 97 <> 0),
      ev AS (SELECT doc_id AS eval_doc_id, ngram FROM grams WHERE doc_id % 97 = 0),
      pairs AS (SELECT c.doc_id, e.eval_doc_id, count(*) AS n_shared
        FROM corpus c JOIN ev e USING (ngram) GROUP BY 1, 2),
      hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_eval_hits
        FROM pairs WHERE n_shared >= 2 GROUP BY doc_id)
      SELECT d.doc_id,
        CAST(COALESCE(h.n_eval_hits, 0) AS BIGINT) AS n_eval_hits,
        CAST(CASE WHEN COALESCE(h.n_eval_hits, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS removed
      FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
      WHERE d.doc_id % 97 <> 0
      ORDER BY d.doc_id"""))
  )
}
