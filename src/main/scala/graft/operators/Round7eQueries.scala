package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-7 continuation: data-selection operators — importance
  * reweighting toward a target domain, hashed-feature linear scoring,
  * distribution-matching resampling, and windowed lexical diversity —
  * each with a DuckDB oracle.
  *
  * House rules as elsewhere: md5-derived determinism shared verbatim
  * with the oracle, the micro-ln rule for transcendentals, integer
  * arithmetic near the gate, identical aliases, total ORDER BY.
  */
object Round7eQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- DSIR-style importance reweighting toward a target domain -----
    // Data Selection via Importance Resampling, unigram form: score each
    // doc by its average per-token log-likelihood RATIO between a target
    // domain's token distribution and the corpus distribution, then keep
    // the top-100. The target domain is data-derived (the largest source,
    // ties to the smallest name) so the oracle reproduces it; both
    // distributions are add-one smoothed over the corpus vocabulary so
    // out-of-target tokens score finitely. Per-token factors are integer
    // micro-ln DIFFERENCES (the q127 rule — the shuffle-order-sensitive
    // double sum never appears); the per-doc normalization divides once
    // at the end. Every join keys on the token; the target choice, vocab
    // size, and token totals are in-DAG broadcast scalars (q86 rule);
    // selection is one TakeOrdered. At 100 TB this prices exactly like
    // q127's drift monitor plus a top-k.
    ("q190_importance_reweighting", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"source", explode(split(TA.normText($"text"), " ")).as("tok"))
      val srcCounts = toks.groupBy($"source").agg(count(lit(1)).as("n_src"))
      val target = srcCounts.orderBy(desc("n_src"), $"source").limit(1)
        .select($"source".as("t_src"), $"n_src".as("n_t"))
      val corpus = toks.groupBy($"tok").agg(count(lit(1)).as("f_c"))
      val vocabTot = corpus.agg(count(lit(1)).as("v"), sum($"f_c").as("n_c"))
      val tgtFreq = toks.join(broadcast(target), $"source" === $"t_src")
        .groupBy($"tok").agg(count(lit(1)).as("f_t"))
      val lp = corpus.join(tgtFreq, Seq("tok"), "left")
        .na.fill(0L, Seq("f_t"))
        .crossJoin(broadcast(target.select($"n_t")))
        .crossJoin(broadcast(vocabTot))
        .select($"tok",
          (floor(log(($"f_t" + 1).cast("double") / ($"n_t" + $"v").cast("double")) * 1e6 + 0.5).cast("long")
            - floor(log(($"f_c" + 1).cast("double") / ($"n_c" + $"v").cast("double")) * 1e6 + 0.5).cast("long"))
            .as("dln"))
      val scored = toks.join(lp, Seq("tok"))
        .groupBy($"doc_id", $"source")
        .agg(count(lit(1)).as("n_tokens"), sum($"dln").as("sdln"))
        .select($"doc_id", $"source", $"n_tokens",
          expr("sdln div n_tokens").as("score_micro"))
      val selected = scored.orderBy(desc("score_micro"), $"doc_id").limit(100)
        .select($"doc_id").withColumn("sel", lit(1L))
      scored.join(selected, Seq("doc_id"), "left")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"sel" === 1L, 1L).otherwise(0L)).as("n_selected"),
          sum(when($"sel" === 1L, $"n_tokens").otherwise(0L)).as("sel_tokens"),
          sum(when($"sel" === 1L, $"doc_id").otherwise(0L)).as("sel_idsum"))
        .orderBy($"source")
    }, Some(s"""
      WITH toks AS (SELECT doc_id, source, unnest(string_split($normSql, ' ')) AS tok FROM documents),
      srcc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM toks GROUP BY 1),
      tgt AS (SELECT source AS t_src, n_src AS n_t FROM srcc ORDER BY n_src DESC, source LIMIT 1),
      corpus AS (SELECT tok, CAST(count(*) AS BIGINT) AS f_c FROM toks GROUP BY 1),
      vt AS (SELECT CAST(count(*) AS BIGINT) AS v, CAST(sum(f_c) AS BIGINT) AS n_c FROM corpus),
      tf AS (SELECT t.tok, CAST(count(*) AS BIGINT) AS f_t FROM toks t JOIN tgt ON t.source = tgt.t_src GROUP BY 1),
      lp AS (SELECT c.tok,
          CAST(floor(ln(CAST(coalesce(tf.f_t, 0) + 1 AS DOUBLE) / (tgt.n_t + vt.v)) * 1e6 + 0.5) AS BIGINT)
            - CAST(floor(ln(CAST(c.f_c + 1 AS DOUBLE) / (vt.n_c + vt.v)) * 1e6 + 0.5) AS BIGINT) AS dln
        FROM corpus c LEFT JOIN tf ON c.tok = tf.tok CROSS JOIN tgt CROSS JOIN vt),
      scored AS (SELECT t.doc_id, t.source, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(l.dln) AS BIGINT) // CAST(count(*) AS BIGINT) AS score_micro
        FROM toks t JOIN lp l ON t.tok = l.tok GROUP BY 1, 2),
      sel AS (SELECT doc_id FROM scored ORDER BY score_micro DESC, doc_id LIMIT 100)
      SELECT s.source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN sel.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
        CAST(sum(CASE WHEN sel.doc_id IS NOT NULL THEN s.n_tokens ELSE 0 END) AS BIGINT) AS sel_tokens,
        CAST(sum(CASE WHEN sel.doc_id IS NOT NULL THEN s.doc_id ELSE 0 END) AS BIGINT) AS sel_idsum
      FROM scored s LEFT JOIN sel ON s.doc_id = sel.doc_id
      GROUP BY s.source ORDER BY s.source""")),

    // ----- hashed-feature linear quality scorer (zero-join) -------------
    // The fastText-shaped serving path: hash every token into one of
    // 1024 feature buckets and score with a per-bucket weight — here
    // md5-derived (centered on 0, range ±1000) so both engines
    // regenerate any weight from the bucket id alone; a trained model
    // swaps in a broadcast weight map with the identical plan. The whole
    // scorer is MAP-SIDE: the weight is a pure expression of the token's
    // own hash, so no join, no broadcast, no shuffle before the per-doc
    // aggregate — the cheapest possible classifier shape at 100 TB.
    // Decision = sign of the summed logit.
    ("q191_hashed_linear_score", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"source", explode(split(TA.normText($"text"), " ")).as("tok"))
      val scored = toks
        .withColumn("b", conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long") % 1024)
        .withColumn("w",
          conv(substring(md5(concat(lit("w|"), $"b".cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2001 - 1000)
        .groupBy($"doc_id", $"source")
        .agg(count(lit(1)).as("n_tokens"), sum($"w").as("logit"))
      scored.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"logit" >= 0L, 1L).otherwise(0L)).as("n_kept"),
          sum($"logit").as("logit_sum"),
          sum(when($"logit" >= 0L, $"doc_id").otherwise(0L)).as("kept_idsum"))
        .select($"source", $"n_docs", $"n_kept", $"kept_idsum",
          expr("logit_sum div n_docs").as("mean_logit"))
        .orderBy($"source")
    }, Some(s"""
      WITH toks AS (SELECT doc_id, source, unnest(string_split($normSql, ' ')) AS tok FROM documents),
      tw AS (SELECT doc_id, source,
          ('0x' || substr(md5('w|' || CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000 AS w
        FROM toks),
      scored AS (SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(w) AS BIGINT) AS logit
        FROM tw GROUP BY 1, 2)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN logit >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(sum(CASE WHEN logit >= 0 THEN doc_id ELSE 0 END) AS BIGINT) AS kept_idsum,
        CAST(sum(logit) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_logit
      FROM scored GROUP BY source ORDER BY source""")),

    // ----- length-distribution matching resample ------------------------
    // Distribution matching: resample every source so its length-bucket
    // histogram matches the corpus-wide one. Acceptance probability per
    // (source, bucket) is min(1, p_corpus(b) / p_source(b)); the
    // hash-Bernoulli accept clears to ONE integer inequality
    //   u · n · n_sb < 1e6 · n_b · n_s   (u = md5(doc)%1e6)
    // with the min(1,·) absorbed (u < 1e6 always). The three-factor
    // products pass Int64 once n approaches ~1e9 docs, so the gate
    // compares in 128-bit integers (DECIMAL(38,0) / HUGEINT) — exact
    // to n ≈ 1e15 docs. Two bounded
    // histograms, one equi-join back on (source, bucket), seedless and
    // engine-reproducible like q110 — the corpus never sorts, the
    // histograms broadcast.
    ("q192_length_matching", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"source", expr("n_chars div 256").as("b"))
      val sb = d.groupBy($"source", $"b").agg(count(lit(1)).as("n_sb"))
      val cb = d.groupBy($"b").agg(count(lit(1)).as("n_b"))
      val sn = d.groupBy($"source").agg(count(lit(1)).as("n_s"))
      val tot = d.agg(count(lit(1)).as("n"))
      d.withColumn("u",
          conv(substring(md5(concat(lit("r|"), $"doc_id".cast("string"))), 1, 8), 16, 10)
            .cast("long") % 1000000)
        .join(sb, Seq("source", "b"))
        .join(broadcast(cb), Seq("b"))
        .join(broadcast(sn), Seq("source"))
        .crossJoin(broadcast(tot))
        .withColumn("acc",
          when(expr("CAST(u AS DECIMAL(38,0)) * n * n_sb") <
               expr("CAST(1000000 AS DECIMAL(38,0)) * n_b * n_s"), 1L).otherwise(0L))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"acc").as("n_accepted"),
          sum(when($"acc" === 1L, $"doc_id").otherwise(0L)).as("accepted_idsum"))
        .orderBy($"source")
    }, Some("""
      WITH d AS (SELECT doc_id, source, n_chars // 256 AS b FROM documents),
      sb AS (SELECT source, b, CAST(count(*) AS BIGINT) AS n_sb FROM d GROUP BY 1, 2),
      cb AS (SELECT b, CAST(count(*) AS BIGINT) AS n_b FROM d GROUP BY 1),
      sn AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM d GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
      acc AS (SELECT d.doc_id, d.source,
          CASE WHEN CAST(('0x' || substr(md5('r|' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000 AS HUGEINT)
            * tot.n * sb.n_sb < CAST(1000000 AS HUGEINT) * cb.n_b * sn.n_s THEN 1 ELSE 0 END AS a
        FROM d JOIN sb ON d.source = sb.source AND d.b = sb.b
        JOIN cb ON d.b = cb.b JOIN sn ON d.source = sn.source CROSS JOIN tot)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(a) AS BIGINT) AS n_accepted,
        CAST(sum(CASE WHEN a = 1 THEN doc_id ELSE 0 END) AS BIGINT) AS accepted_idsum
      FROM acc GROUP BY source ORDER BY source""")),

    // ----- windowed type-token ratio (lexical diversity) ----------------
    // The vocabulary-richness quality signal raw TTR can't give (it
    // decays with length): TTR per NON-OVERLAPPING 50-token window,
    // full windows only (the q118 subset-free tail rule), averaged per
    // doc in micro units. One explode with positions, one (doc, window)
    // aggregate, one per-doc rollup — every shuffle keys on the doc, so
    // the operator runs at token-scan cost at any corpus size. Docs
    // shorter than one full window drop out (they have no defined
    // windowed TTR).
    ("q193_window_ttr", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", posexplode(split(TA.normText($"text"), " ")))
        .select($"doc_id", expr("pos div 50").as("win"), $"col".as("tok"))
      toks.groupBy($"doc_id", $"win")
        .agg(count(lit(1)).as("n_toks"), countDistinct($"tok").as("n_types"))
        .filter($"n_toks" === 50)
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_windows"), sum($"n_types").as("types_sum"))
        .select($"doc_id", $"n_windows", $"types_sum",
          expr("(1000000 * types_sum) div (50 * n_windows)").as("ttr_micro"))
        .orderBy($"doc_id")
    }, Some(s"""
      WITH toks AS (SELECT doc_id, (t.i - 1) // 50 AS win, arr[t.i] AS tok
        FROM (SELECT doc_id, string_split($normSql, ' ') AS arr FROM documents),
          unnest(range(1, len(arr) + 1)) AS t(i)),
      w AS (SELECT doc_id, win, CAST(count(*) AS BIGINT) AS n_toks,
          CAST(count(DISTINCT tok) AS BIGINT) AS n_types
        FROM toks GROUP BY 1, 2)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        CAST(sum(n_types) AS BIGINT) AS types_sum,
        (1000000 * CAST(sum(n_types) AS BIGINT)) // (50 * CAST(count(*) AS BIGINT)) AS ttr_micro
      FROM w WHERE n_toks = 50 GROUP BY doc_id ORDER BY doc_id"""))
  )
}
