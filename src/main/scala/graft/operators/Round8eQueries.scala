package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 5: bounded-summary aggregation — distributed top-k with
  * a deterministic error certificate (the Misra-Gries/shard-summary
  * merge every 100 TB "top terms" dashboard actually runs on), and the
  * vocabulary-size coverage curve (the tokenizer-sizing table).
  */
object Round8eQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  /** Every 3-gram shingle occurrence (TA.shingles minus the distinct —
    * these operators count FREQUENCY, so within-doc repeats must
    * survive; the clipped-tail rule matches the arr[i:i+2] oracle). */
  private def shingleOccurrences(text: org.apache.spark.sql.Column) =
    graft.functions.Lambda.bind1(split(TA.normText(text), " ")) { a =>
      transform(sequence(lit(1), greatest(size(a) - 2, lit(1))),
        i => concat_ws(" ", try_element_at(a, i), try_element_at(a, i + 1),
          try_element_at(a, i + 2)))
    }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- pruned top-k merge with deterministic error bound --------------
    // Exact global GROUP BY on a 100 TB token stream is a full shuffle;
    // the production shape keeps only each shard's top-k summary
    // (map-side bounded — WindowGroupLimit) and merges those. The price
    // is bounded, not unknown: a token absent from shard s's summary has
    // true shard count ≤ th_s (the k-th kept count there), so
    //   est(t) ≤ exact(t) ≤ est(t) + Σ_{s ∉ kept(t)} th_s
    //         = est(t) + (Σ_s th_s − Σ_{s ∈ kept(t)} th_s).
    // This operator computes the merged estimate AND that certificate
    // next to the exact count for the global top-10 — the audit that
    // tells an operator whether k=32 was big enough (within_bound is
    // the invariant; ub − est is the useful slack number). The merge
    // stage touches Σ_s k rows, never the corpus; shards with fewer
    // than k distinct items contribute th_s = 0 (their summary is
    // lossless), which keeps the bound tight. Items are 3-gram SHINGLES
    // (the q202 universe, ~16k types at sf0.01) — the word vocabulary
    // of the synthetic corpus is ~31 types, which every shard summary
    // holds losslessly and the certificate would never be exercised.
    ("q214_pruned_topk_merge", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", explode(shingleOccurrences($"text")).as("tok"))
        .localCheckpoint() // summary branch + exact-audit branch
      val local = toks.groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy($"source").orderBy(desc("c"), $"tok")
      val kept = local.withColumn("rn", row_number().over(w)).filter($"rn" <= 32)
      val ths = kept.groupBy($"source")
        .agg(coalesce(min(when($"rn" === 32, $"c")), lit(0L)).as("th"))
      val tsum = ths.agg(sum($"th").as("tsum"))
      val merged = kept.join(broadcast(ths), "source")
        .groupBy($"tok")
        .agg(sum($"c").as("est"), sum($"th").as("th_kept"))
      val exactTop = toks.groupBy($"tok").agg(count(lit(1)).as("exact"))
        .orderBy(desc("exact"), $"tok").limit(10)
      exactTop.join(merged, Seq("tok"), "left")
        .na.fill(0L, Seq("est", "th_kept"))
        .crossJoin(broadcast(tsum))
        .select($"tok", $"exact", $"est",
          ($"est" + $"tsum" - $"th_kept").as("ub"),
          when($"est" <= $"exact" && $"exact" <= $"est" + $"tsum" - $"th_kept", 1L)
            .otherwise(0L).as("within_bound"))
        .orderBy(desc("exact"), $"tok")
    }, Some(s"""
      WITH d AS (SELECT source, string_split($normSql, ' ') AS arr FROM documents),
      toks AS (SELECT source, unnest(list_transform(range(1, greatest(len(arr) - 2, 1) + 1),
        i -> array_to_string(arr[i:i+2], ' '))) AS tok FROM d),
      local_c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        FROM toks GROUP BY 1, 2),
      ranked AS (SELECT source, tok, c,
          row_number() OVER (PARTITION BY source ORDER BY c DESC, tok) AS rn
        FROM local_c),
      kept AS (SELECT source, tok, c, rn FROM ranked WHERE rn <= 32),
      ths AS (SELECT source,
          CAST(coalesce(min(CASE WHEN rn = 32 THEN c END), 0) AS BIGINT) AS th
        FROM kept GROUP BY 1),
      tsum AS (SELECT CAST(sum(th) AS BIGINT) AS tsum FROM ths),
      merged AS (SELECT k.tok, CAST(sum(k.c) AS BIGINT) AS est,
          CAST(sum(t.th) AS BIGINT) AS th_kept
        FROM kept k JOIN ths t ON t.source = k.source GROUP BY 1),
      exact_top AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact
        FROM toks GROUP BY 1 ORDER BY exact DESC, tok LIMIT 10)
      SELECT e.tok, e.exact, CAST(coalesce(m.est, 0) AS BIGINT) AS est,
        CAST(coalesce(m.est, 0) + ts.tsum - coalesce(m.th_kept, 0) AS BIGINT) AS ub,
        CAST(CASE WHEN coalesce(m.est, 0) <= e.exact
          AND e.exact <= coalesce(m.est, 0) + ts.tsum - coalesce(m.th_kept, 0)
          THEN 1 ELSE 0 END AS BIGINT) AS within_bound
      FROM exact_top e LEFT JOIN merged m ON m.tok = e.tok CROSS JOIN tsum ts
      ORDER BY e.exact DESC, e.tok""")),

    // ----- vocabulary-size coverage curve ---------------------------------
    // The phrase-table/cache-sizing table: what fraction of corpus
    // occurrences the top V types cover, for V in {1k, 2k, 4k, 8k}.
    // q114 audits ONE fixed vocabulary; this emits the CURVE a size
    // decision is read off of (coverage saturates where the Zipf tail
    // begins — q119's fit says where). Types are 3-gram shingles (the
    // only universe in the synthetic corpus rich enough to show a
    // curve; for a real corpus the same query runs over BPE types).
    // Ranking runs over the VOCABULARY (distinct types, orders below
    // the corpus — the value-grid convention), never over token rows;
    // the V sweep is a conditional aggregate over that grid. At
    // 100 TB: one count aggregate + a vocab-sized sort, the same cost
    // class as building the vocabulary at all.
    ("q215_vocab_coverage_curve", (s: SparkSession, dir: String) => {
      import s.implicits._
      val freq = Tables.spread(Tables.t(s, dir, "documents"))
        .select(explode(shingleOccurrences($"text")).as("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("f"))
      // distributed vocab rank (r14; was a single-partition window over
      // the whole vocabulary): GridRank range-buckets on f and produces
      // bit-identical row numbers with bounded per-task state
      val ranked = graft.ext.GridRank.withRowNumber(
        freq, "f", Seq($"tok"), "rnk", descending = true)
      val tot = freq.agg(sum($"f").as("total"), count(lit(1)).as("n_vocab"))
      ranked.select(explode(array(Seq(1000L, 2000L, 4000L, 8000L).map(lit): _*))
          .as("vocab_size"), $"rnk", $"f")
        .groupBy($"vocab_size")
        .agg(sum(when($"rnk" <= $"vocab_size", $"f").otherwise(0L)).as("covered"))
        .crossJoin(broadcast(tot))
        .select($"vocab_size", $"n_vocab", $"total", $"covered",
          expr("(1000000 * covered) div total").as("coverage_micro"))
        .orderBy("vocab_size")
    }, Some(s"""
      WITH d AS (SELECT string_split($normSql, ' ') AS arr FROM documents),
      toks AS (SELECT unnest(list_transform(range(1, greatest(len(arr) - 2, 1) + 1),
        i -> array_to_string(arr[i:i+2], ' '))) AS tok FROM d),
      freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY 1),
      ranked AS (SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS rnk FROM freq),
      tot AS (SELECT CAST(sum(f) AS BIGINT) AS total,
          CAST(count(*) AS BIGINT) AS n_vocab FROM freq),
      v AS (SELECT unnest([1000, 2000, 4000, 8000]) AS vocab_size)
      SELECT CAST(v.vocab_size AS BIGINT) AS vocab_size, t.n_vocab, t.total,
        CAST(sum(CASE WHEN r.rnk <= v.vocab_size THEN r.f ELSE 0 END) AS BIGINT) AS covered,
        (1000000 * CAST(sum(CASE WHEN r.rnk <= v.vocab_size THEN r.f ELSE 0 END) AS BIGINT)) // t.total AS coverage_micro
      FROM ranked r CROSS JOIN v CROSS JOIN tot t
      GROUP BY v.vocab_size, t.n_vocab, t.total ORDER BY vocab_size"""))
  )
}
