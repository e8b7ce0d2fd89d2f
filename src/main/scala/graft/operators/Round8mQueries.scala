package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 13: cross-source language-model distance, submodular
  * coverage selection, distribution alignment (quantile
  * normalization), behavioral Markov analysis, and scorer rank
  * agreement (Spearman).
  *
  * House rules as elsewhere: micro-ln for transcendentals, integer
  * arithmetic at every gate, value-grid windows where a cumulative is
  * needed, identical aliases both sides, total ORDER BY.
  */
object Round8mQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  /** Epoch-micros column for events.ts, tolerant of both parquet
    * timestamp encodings (the TESTDATA gotcha). */
  private def tusOf(raw: DataFrame) =
    raw.schema("ts").dataType.typeName match {
      case "timestamp_ntz" => unix_micros(col("ts").cast("timestamp"))
      case _ => unix_micros(col("ts"))
    }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- cross-source LM cross-entropy matrix ---------------------------
    // The LM-space complement of q194's set-space source matrix: train
    // an add-one-smoothed unigram model on every source, evaluate every
    // source under every model — H(B‖A) = −Σ_t p_B(t)·ln p̂_A(t), the
    // cross-entropy a CCNet-style perplexity filter would read. The
    // matrix keys on (model, corpus) pairs but the join is TOKEN-wise:
    // B's count rows × |sources| grid, left-joined to A's counts (B
    // tokens unseen by A take the smoothing floor 1/(n_A+V)). Work is
    // |vocab|·|sources|² at worst — vocab-bounded, never corpus² — and
    // the models are count aggregates, so at 100 TB they maintain
    // incrementally. The diagonal is each source's self-entropy; a row
    // whose off-diagonal dips BELOW its diagonal has found a source
    // that compresses it better than itself — the duplication smell.
    ("q240_lm_cross_entropy", (s: SparkSession, dir: String) => {
      import s.implicits._
      val st = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", explode(split(TA.normText($"text"), " ")).as("tok"))
      val cnt = st.groupBy($"source", $"tok").agg(count(lit(1)).as("n"))
        .localCheckpoint() // grid side + model side + totals
      val totals = cnt.groupBy($"source").agg(sum($"n").as("nt"))
      val vocab = cnt.agg(countDistinct($"tok").as("v"))
      val grid = cnt.toDF("src_b", "tok", "n_b")
        .crossJoin(totals.select($"source".as("src_a"), $"nt".as("nt_a")))
        .crossJoin(broadcast(vocab))
      val withModel = grid
        .join(cnt.toDF("src_a", "tok", "n_a"), Seq("src_a", "tok"), "left")
        .na.fill(0L, Seq("n_a"))
        .withColumn("l_a",
          floor(log(($"n_a" + 1).cast("double") / ($"nt_a" + $"v").cast("double"))
            * 1e6 + 0.5).cast("long"))
      withModel.groupBy($"src_a", $"src_b")
        .agg(sum($"n_b" * $"l_a").as("s"), count(lit(1)).as("n_terms"))
        .join(totals.select($"source".as("src_b"), $"nt".as("nt_b")), Seq("src_b"))
        .select($"src_a".as("model_src"), $"src_b".as("eval_src"), $"n_terms",
          expr("(-s) div nt_b").as("ce_micro"))
        .orderBy($"model_src", $"eval_src")
    }, Some(s"""
      WITH st AS (SELECT source, unnest(string_split($normSql, ' ')) AS tok FROM documents),
      cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n FROM st GROUP BY 1, 2),
      totals AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt FROM cnt GROUP BY 1),
      vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM cnt),
      grid AS (SELECT b.source AS src_b, b.tok, b.n AS n_b,
          ta.source AS src_a, ta.nt AS nt_a, vocab.v
        FROM cnt b CROSS JOIN totals ta CROSS JOIN vocab),
      wm AS (SELECT g.src_a, g.src_b, g.n_b,
          CAST(floor(ln(CAST(coalesce(a.n, 0) + 1 AS DOUBLE)
            / CAST(g.nt_a + g.v AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS l_a
        FROM grid g LEFT JOIN cnt a ON g.src_a = a.source AND g.tok = a.tok)
      SELECT wm.src_a AS model_src, wm.src_b AS eval_src,
        CAST(count(*) AS BIGINT) AS n_terms,
        CAST((-sum(wm.n_b * wm.l_a)) // max(tb.nt) AS BIGINT) AS ce_micro
      FROM wm JOIN totals tb ON wm.src_b = tb.source
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ----- greedy max-coverage document selection -------------------------
    // Submodular selection, the vocabulary-coverage form: five greedy
    // rounds, each picking the document covering the most still-
    // uncovered tokens (ties to the smaller doc_id). The classic
    // (1−1/e) guarantee makes this the standard seed-set chooser for
    // eval anchors and annotation budgets. Each round is one anti-join
    // (uncovered tokens) + one count aggregate + one TakeOrdered(1) —
    // the round count is the fixed k, never data-driven, and the
    // covered set stays a token-keyed DataFrame the next anti-join
    // consumes (the q166 loop discipline: driver composes, data never
    // leaves the DAG). A round with nothing left to cover contributes
    // zero rows on both sides — no special-casing. Coverage units are
    // BIGRAMS: the generator's unigram vocabulary is small enough that
    // one document covers it, and a universe a single pick exhausts
    // exercises nothing — bigrams keep the greedy frontier real.
    ("q241_coverage_selection", (s: SparkSession, dir: String) => {
      import s.implicits._
      val dt = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", split(TA.normText($"text"), " ").as("a"))
        .filter(size($"a") >= 2)
        .select($"doc_id", explode(expr(
          "transform(sequence(1, size(a) - 1), i -> concat(element_at(a, i), '|', element_at(a, i + 1)))"))
          .as("tok"))
        .distinct()
        .localCheckpoint() // k anti-join rounds reuse it
      var covered = dt.select($"tok").filter(lit(false)) // empty token set
      var out: DataFrame = null
      for (round <- 1 to 5) {
        val gains = dt.join(covered, Seq("tok"), "left_anti")
          .groupBy($"doc_id").agg(count(lit(1)).as("gain"))
        val pick = gains.orderBy(desc("gain"), $"doc_id").limit(1)
        covered = covered
          .unionByName(dt.join(pick.select($"doc_id"), Seq("doc_id")).select($"tok"))
          .distinct().localCheckpoint()
        val row = pick.crossJoin(broadcast(covered.agg(count(lit(1)).as("covered_total"))))
          .select(lit(round.toLong).as("round"), $"doc_id", $"gain", $"covered_total")
        out = if (out == null) row else out.unionByName(row)
      }
      out.orderBy($"round")
    }, Some(s"""
      WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS a FROM documents
        WHERE len(string_split($normSql, ' ')) >= 2),
      dt AS (SELECT DISTINCT doc_id, a[i] || '|' || a[i + 1] AS tok
        FROM base, unnest(range(1, len(a))) AS t(i)),
      g1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM dt GROUP BY 1),
      p1 AS (SELECT doc_id, gain FROM g1 ORDER BY gain DESC, doc_id LIMIT 1),
      c1 AS (SELECT DISTINCT tok FROM dt JOIN p1 USING (doc_id)),
      g2 AS (SELECT dt.doc_id, CAST(count(*) AS BIGINT) AS gain FROM dt
        ANTI JOIN c1 USING (tok) GROUP BY 1),
      p2 AS (SELECT doc_id, gain FROM g2 ORDER BY gain DESC, doc_id LIMIT 1),
      c2 AS (SELECT tok FROM c1 UNION SELECT dt.tok FROM dt JOIN p2 USING (doc_id)),
      g3 AS (SELECT dt.doc_id, CAST(count(*) AS BIGINT) AS gain FROM dt
        ANTI JOIN c2 USING (tok) GROUP BY 1),
      p3 AS (SELECT doc_id, gain FROM g3 ORDER BY gain DESC, doc_id LIMIT 1),
      c3 AS (SELECT tok FROM c2 UNION SELECT dt.tok FROM dt JOIN p3 USING (doc_id)),
      g4 AS (SELECT dt.doc_id, CAST(count(*) AS BIGINT) AS gain FROM dt
        ANTI JOIN c3 USING (tok) GROUP BY 1),
      p4 AS (SELECT doc_id, gain FROM g4 ORDER BY gain DESC, doc_id LIMIT 1),
      c4 AS (SELECT tok FROM c3 UNION SELECT dt.tok FROM dt JOIN p4 USING (doc_id)),
      g5 AS (SELECT dt.doc_id, CAST(count(*) AS BIGINT) AS gain FROM dt
        ANTI JOIN c4 USING (tok) GROUP BY 1),
      p5 AS (SELECT doc_id, gain FROM g5 ORDER BY gain DESC, doc_id LIMIT 1),
      c5 AS (SELECT tok FROM c4 UNION SELECT dt.tok FROM dt JOIN p5 USING (doc_id))
      SELECT CAST(1 AS BIGINT) AS round, doc_id, gain,
        (SELECT CAST(count(*) AS BIGINT) FROM c1) AS covered_total FROM p1
      UNION ALL SELECT 2, doc_id, gain,
        (SELECT CAST(count(*) AS BIGINT) FROM c2) FROM p2
      UNION ALL SELECT 3, doc_id, gain,
        (SELECT CAST(count(*) AS BIGINT) FROM c3) FROM p3
      UNION ALL SELECT 4, doc_id, gain,
        (SELECT CAST(count(*) AS BIGINT) FROM c4) FROM p4
      UNION ALL SELECT 5, doc_id, gain,
        (SELECT CAST(count(*) AS BIGINT) FROM c5) FROM p5
      ORDER BY round""")),

    // ----- quantile normalization onto the corpus distribution ------------
    // The distribution-alignment transform: map every document's length
    // to the corpus value at the same within-source quantile, so every
    // source's length distribution becomes the corpus's (the
    // microarray-era quantile normalization, here as the length-bias
    // equalizer q192's matched resampling only approximates by
    // dropping). Per-source midpoint ranks come from source-partitioned
    // windows; the corpus inverse-ECDF is the VALUE GRID with
    // cumulative counts (q195 bound — value-cardinality, not corpus,
    // wide), and the lookup is a broadcast range join against that
    // grid: cum_prev < idx ≤ cum. Integer throughout — the midpoint
    // index is ceil((2r−1)·N / 2n_s) done as one div.
    ("q242_quantile_norm", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.t(s, dir, "documents")
        .select($"doc_id", $"source", $"n_chars".as("v"))
      val ns = d.groupBy($"source").agg(count(lit(1)).as("n_s"))
      val tot = d.agg(count(lit(1)).as("n"))
      val grid = d.groupBy($"v").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum($"c").over(
          Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("cum_prev", $"cum" - $"c")
        .select($"v".as("norm_v"), $"cum_prev", $"cum")
      val ranked = d
        .withColumn("r", row_number().over(
          Window.partitionBy($"source").orderBy($"v", $"doc_id")))
        .join(ns, Seq("source")).crossJoin(broadcast(tot))
        .withColumn("idx", expr("((2 * r - 1) * n + 2 * n_s - 1) div (2 * n_s)"))
      ranked.join(broadcast(grid), $"idx" > $"cum_prev" && $"idx" <= $"cum")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(v) div count(1)").as("mean_raw"),
          expr("sum(norm_v) div count(1)").as("mean_norm"))
        .orderBy($"source")
    }, Some("""
      WITH d AS (SELECT doc_id, source, n_chars AS v FROM documents),
      ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM d GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
      grid AS (SELECT v AS norm_v,
          CAST(sum(count(*)) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
          CAST(sum(count(*)) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - count(*) AS BIGINT) AS cum_prev
        FROM d GROUP BY v),
      ranked AS (SELECT d.source, d.v,
          ((2 * CAST(row_number() OVER (PARTITION BY d.source ORDER BY d.v, d.doc_id) AS BIGINT) - 1)
            * tot.n + 2 * ns.n_s - 1) // (2 * ns.n_s) AS idx
        FROM d JOIN ns ON d.source = ns.source CROSS JOIN tot)
      SELECT r.source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(r.v) // count(*) AS BIGINT) AS mean_raw,
        CAST(sum(g.norm_v) // count(*) AS BIGINT) AS mean_norm
      FROM ranked r JOIN grid g ON r.idx > g.cum_prev AND r.idx <= g.cum
      GROUP BY 1 ORDER BY 1""")),

    // ----- behavioral Markov chain (transitions + stationary) -------------
    // The model behind q171's path mining: the event-type transition
    // matrix (lag pairs per user, row-normalized to micro
    // probabilities) plus the 2-step power-iteration stationary
    // distribution — where user attention settles, the number a
    // capacity planner multiplies by traffic. Both matrix and vector
    // live in integer micro; each power step is one broadcast-size
    // join + aggregate on the |states|² matrix (states are event
    // types — bounded — so iteration cost is independent of corpus
    // size; the corpus-sized work is the single lag pass). Stationary
    // rows append under kind='pi2' with the same schema.
    ("q243_markov_transitions", (s: SparkSession, dir: String) => {
      import s.implicits._
      val raw = Tables.t(s, dir, "events")
      val ev = raw.select($"user_id", $"event_id", $"event_type".as("et"),
        tusOf(raw).as("tus"))
      val trans = ev
        .withColumn("prev", lag($"et", 1).over(
          Window.partitionBy($"user_id").orderBy($"tus", $"event_id")))
        .filter($"prev".isNotNull)
        .groupBy($"prev".as("from_type"), $"et".as("to_type"))
        .agg(count(lit(1)).as("n_trans"))
        .localCheckpoint() // matrix reused by both power steps
      val rowTot = trans.groupBy($"from_type").agg(sum($"n_trans").as("rt"))
      val p = trans.join(rowTot, Seq("from_type"))
        .select($"from_type", $"to_type", $"n_trans",
          expr("(1000000 * n_trans) div rt").as("p_micro"))
      val states = p.select($"from_type".as("st")).distinct()
      val k = states.agg(count(lit(1)).as("k"))
      val pi0 = states.crossJoin(broadcast(k))
        .select($"st", expr("1000000 div k").as("pi"))
      def step(pi: DataFrame) = p.join(pi.toDF("from_type", "pi"), Seq("from_type"))
        .groupBy($"to_type".as("st"))
        .agg(expr("sum(pi * p_micro) div 1000000").as("pi"))
      val pi2 = step(step(pi0))
      p.select($"from_type", $"to_type", $"n_trans", $"p_micro")
        .unionByName(pi2.select(lit("pi2").as("from_type"), $"st".as("to_type"),
          lit(0L).as("n_trans"), $"pi".as("p_micro")))
        .orderBy($"from_type", $"to_type")
    }, Some("""
      WITH ev AS (SELECT user_id, event_id, event_type AS et,
          epoch_us(ts) AS tus FROM events),
      lagged AS (SELECT et, lag(et) OVER (PARTITION BY user_id
          ORDER BY tus, event_id) AS prev FROM ev),
      trans AS (SELECT prev AS from_type, et AS to_type,
          CAST(count(*) AS BIGINT) AS n_trans
        FROM lagged WHERE prev IS NOT NULL GROUP BY 1, 2),
      rt AS (SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS rt
        FROM trans GROUP BY 1),
      p AS (SELECT t.from_type, t.to_type, t.n_trans,
          (1000000 * t.n_trans) // rt.rt AS p_micro
        FROM trans t JOIN rt ON t.from_type = rt.from_type),
      states AS (SELECT DISTINCT from_type AS st FROM p),
      k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM states),
      pi0 AS (SELECT st, 1000000 // k.k AS pi FROM states CROSS JOIN k),
      pi1 AS (SELECT p.to_type AS st,
          CAST(sum(pi0.pi * p.p_micro) // 1000000 AS BIGINT) AS pi
        FROM p JOIN pi0 ON p.from_type = pi0.st GROUP BY 1),
      pi2 AS (SELECT p.to_type AS st,
          CAST(sum(pi1.pi * p.p_micro) // 1000000 AS BIGINT) AS pi
        FROM p JOIN pi1 ON p.from_type = pi1.st GROUP BY 1)
      SELECT from_type, to_type, n_trans, CAST(p_micro AS BIGINT) AS p_micro FROM p
      UNION ALL SELECT 'pi2', st, CAST(0 AS BIGINT), pi FROM pi2
      ORDER BY from_type, to_type""")),

    // ----- Spearman rank agreement between scorers ------------------------
    // Do two quality scorers AGREE on ordering? Spearman's ρ between
    // the q191 hashed-logit scorer and raw length, via the exact
    // rank-difference identity ρ = 1 − 6Σd²/(n(n²−1)) — rank windows
    // tie-broken by doc_id so both sides rank identically, Σd² in
    // 128-bit (it reaches n³). The two global sorts ARE the exact
    // algorithm at any scale (range-partitioned sort + partition-offset
    // ranks on a cluster — same identity); ρ near +1e6 means the cheap
    // scorer is a length proxy and buys nothing over the trivial one —
    // the redundancy check before paying for a second scorer.
    ("q244_spearman_scorers", (s: SparkSession, dir: String) => {
      import s.implicits._
      val scored = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"n_chars", explode(split(TA.normText($"text"), " ")).as("tok"))
        .withColumn("w",
          conv(substring(md5(concat(lit("w|"),
              (conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long") % 1024)
                .cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2001 - 1000)
        .groupBy($"doc_id").agg(max($"n_chars").as("len"), sum($"w").as("logit"))
      // two-level global ranks (GridRank): the doc-scale total orders
      // never pass through one task; bit-identical to the single-window
      // form the oracle keeps
      val ranked = graft.ext.GridRank.withRowNumber(
        graft.ext.GridRank.withRowNumber(scored, "logit", Seq($"doc_id"), "r1"),
        "len", Seq($"doc_id"), "r2")
      ranked
        .select(expr("CAST(r1 - r2 AS DECIMAL(38,0))").as("d"), lit(1L).as("one"))
        .agg(count($"one").as("n"), sum(expr("d * d")).as("sd2"))
        .select(lit("hash_logit").as("scorer_a"), lit("n_chars").as("scorer_b"),
          $"n", $"sd2".cast("long").as("sum_d2"),
          (lit(1000000L) - expr("CAST((6000000 * sd2) div (n * (CAST(n AS DECIMAL(38,0)) * n - 1)) AS BIGINT)"))
            .as("rho_micro"))
    }, Some(s"""
      WITH toks AS (SELECT doc_id, n_chars, unnest(string_split($normSql, ' ')) AS tok FROM documents),
      scored AS (SELECT doc_id, max(n_chars) AS len,
          CAST(sum(('0x' || substr(md5('w|' || CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) AS BIGINT) AS logit
        FROM toks GROUP BY doc_id),
      ranked AS (SELECT
          CAST(row_number() OVER (ORDER BY logit, doc_id) AS HUGEINT)
            - CAST(row_number() OVER (ORDER BY len, doc_id) AS HUGEINT) AS d
        FROM scored)
      SELECT 'hash_logit' AS scorer_a, 'n_chars' AS scorer_b,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(d * d) AS BIGINT) AS sum_d2,
        1000000 - CAST((6000000 * sum(d * d))
          // (count(*) * (CAST(count(*) AS HUGEINT) * count(*) - 1)) AS BIGINT) AS rho_micro
      FROM ranked"""))
  )
}
