package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Similarity, TextAnalysis => TA}

/** Round-8 batch 28: external clustering evaluation (adjusted Rand +
  * B-cubed of the LSH bucketing against the embeddings' ground-truth
  * labels), exact Shapley-value source valuation via the coverage-game
  * closed form, and Efraimidis–Spirakis weighted reservoir sampling —
  * the metric layer q21/q54's clusterings have never been scored with,
  * the game-theoretically fair upgrade of q227's leave-one-out
  * valuation, and the weight-proportional sampler the battery's
  * Bernoulli/balanced samplers (q178 and friends) cannot express.
  *
  * House rules as elsewhere: integer arithmetic at every gate, micro-ln
  * (floor(ln·1e6 + 0.5)) per transcendental term with the identical
  * expression in both engines, any double op only on final bounded
  * rows. Identical aliases both sides, total ORDER BY.
  */
object Round8abQueries {

  private val normSql = TA.normTextSql
  private val AnnProjs = Similarity.OracleProjs
  private val annPrepSql = Similarity.prepareSql
  private val annBucketSql = Similarity.lshBucketSql

  type QFn = (SparkSession, String) => DataFrame

  /** q300's ARI closed form over (n, ix, sa, sb). Spark's `div` always
    * returns BIGINT, so the halved C(n,2) is re-cast to DECIMAL(38,0)
    * before the `· ix` / `· (sa+sb)` multiplies — at n ~ 2e6 those
    * products reach ~2e24 and the un-recast form wraps (or throws
    * under ANSI). Shared with Round8abSpec's int64-boundary pin so the
    * spec can never desync from the shipped expression.
    */
  private[graft] val AriExprSql = """CAST(floor(
      CAST(2 * CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) div 2
             AS DECIMAL(38,0)) * ix
           - 2 * CAST(sa AS DECIMAL(38,0)) * sb AS DOUBLE)
      / CAST(CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) div 2
             AS DECIMAL(38,0)) * (sa + sb)
           - 2 * CAST(sa AS DECIMAL(38,0)) * sb AS DOUBLE)
      * 1000000 + 0.5) AS BIGINT)"""

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- adjusted Rand + B-cubed clustering evaluation ------------------
    // The battery produces clusterings everywhere (LSH buckets q25,
    // dup components q54/q161, label propagation q203) but has never
    // SCORED one against ground truth. This evaluates the 4-bit LSH
    // bucketing as a clustering of the embeddings against their label
    // column: ARI (pair-counting, chance-corrected) and B-cubed
    // precision/recall/F1 (the per-item average the entity-resolution
    // literature prefers — Bagga & Baldwin). Everything flows from ONE
    // contingency aggregate groupBy(bucket, label): all later joins and
    // scalars are |buckets|·|labels|-bounded (≤ 160 cells here), so the
    // evaluation costs one corpus pass regardless of corpus size.
    // Arithmetic: per-cell pair counts and B³ terms are exact int64
    // (Σij·1e6 < 2^63 is annotation-bounded by nature), but the ARI
    // num/den multiply three pair-count sums — C(n,2)·Σij and sa·sb
    // reach ~n⁴/1000, past int64 around n ~ 1e5 per stratum — so both
    // are accumulated in DECIMAL(38,0)/HUGEINT before the ONE double
    // division, on a single row (floor semantics match across engines
    // for doubles, unlike integer div vs // on negatives). Spark's
    // `div` ALWAYS returns BIGINT regardless of operand type, so the
    // halved C(n,2) is re-cast to DECIMAL(38,0) before the ·Σij and
    // ·(sa+sb) multiplies — C(n,2) itself fits int64 to n ~ 4e9, and
    // the re-cast keeps the products exact to ~1e38 (n ≲ 1e9 items);
    // Round8abSpec pins the n ~ 1e6 regime against the int64-overflow
    // form.
    ("q300_clustering_ari", (s: SparkSession, dir: String) => {
      import s.implicits._
      val e = Tables.spread(Tables.t(s, dir, "embeddings"))
      val prepared = Similarity.prepare(e, "vec_id", "embedding")
      val pairs = prepared
        .withColumn("bucket", Similarity.lshBucket(col("qvec"), AnnProjs))
        .select($"id", $"bucket")
        .join(e.select($"vec_id".as("id"), $"label".cast("long").as("lbl")),
          Seq("id"))
      val cells = pairs.groupBy($"bucket", $"lbl")
        .agg(count(lit(1)).as("nij"))
        .localCheckpoint() // reused: row/col margins, index, both B³ sides
      val ai = cells.groupBy($"bucket").agg(sum($"nij").as("a"))
      val bj = cells.groupBy($"lbl").agg(sum($"nij").as("b"))
      val tot = cells.agg(sum($"nij").as("n"),
        sum(expr("nij * (nij - 1) div 2")).as("ix"))
      val sa = ai.agg(sum(expr("a * (a - 1) div 2")).as("sa"),
        count(lit(1)).as("n_pred"))
      val sb = bj.agg(sum(expr("b * (b - 1) div 2")).as("sb"),
        count(lit(1)).as("n_true"))
      val prec = cells.join(broadcast(ai), Seq("bucket"))
        .agg(sum(expr("1000000 * nij * nij div a")).as("pp"))
      val rec = cells.join(broadcast(bj), Seq("lbl"))
        .agg(sum(expr("1000000 * nij * nij div b")).as("rr"))
      tot.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
        .crossJoin(broadcast(prec)).crossJoin(broadcast(rec))
        .select($"n".as("n_items"), $"n_pred", $"n_true",
          expr(AriExprSql).as("ari_micro"),
          expr("pp div n").as("b3_precision_micro"),
          expr("rr div n").as("b3_recall_micro"),
          expr("2 * (pp div n) * (rr div n) div ((pp div n) + (rr div n))")
            .as("b3_f1_micro"))
    }, Some(s"""
      WITH $annPrepSql,
      pairs AS (SELECT n.vec_id AS id, $annBucketSql AS bucket,
          CAST(e.label AS BIGINT) AS lbl
        FROM n JOIN embeddings e ON n.vec_id = e.vec_id),
      cells AS (SELECT bucket, lbl, CAST(count(*) AS BIGINT) AS nij
        FROM pairs GROUP BY 1, 2),
      ai AS (SELECT bucket, CAST(sum(nij) AS BIGINT) AS a
        FROM cells GROUP BY 1),
      bj AS (SELECT lbl, CAST(sum(nij) AS BIGINT) AS b FROM cells GROUP BY 1),
      tot AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
          CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS ix FROM cells),
      sa AS (SELECT CAST(sum(a * (a - 1) // 2) AS BIGINT) AS sa,
          CAST(count(*) AS BIGINT) AS n_pred FROM ai),
      sb AS (SELECT CAST(sum(b * (b - 1) // 2) AS BIGINT) AS sb,
          CAST(count(*) AS BIGINT) AS n_true FROM bj),
      prec AS (SELECT CAST(sum(1000000 * nij * nij // a) AS BIGINT) AS pp
        FROM cells JOIN ai USING (bucket)),
      rec AS (SELECT CAST(sum(1000000 * nij * nij // b) AS BIGINT) AS rr
        FROM cells JOIN bj USING (lbl))
      SELECT tot.n AS n_items, sa.n_pred, sb.n_true,
        CAST(floor(
          CAST(2 * (CAST(tot.n AS HUGEINT) * (tot.n - 1) // 2) * tot.ix
              - 2 * CAST(sa.sa AS HUGEINT) * sb.sb AS DOUBLE)
          / CAST((CAST(tot.n AS HUGEINT) * (tot.n - 1) // 2) * (sa.sa + sb.sb)
              - 2 * CAST(sa.sa AS HUGEINT) * sb.sb AS DOUBLE)
          * 1000000 + 0.5) AS BIGINT) AS ari_micro,
        prec.pp // tot.n AS b3_precision_micro,
        rec.rr // tot.n AS b3_recall_micro,
        2 * (prec.pp // tot.n) * (rec.rr // tot.n)
          // ((prec.pp // tot.n) + (rec.rr // tot.n)) AS b3_f1_micro
      FROM tot CROSS JOIN sa CROSS JOIN sb
      CROSS JOIN prec CROSS JOIN rec""")),

    // ----- exact Shapley source valuation (coverage-game closed form) -----
    // Leave-one-out valuation (q227) undervalues redundant sources: two sources carrying the same rare
    // vocabulary each get ~zero marginal value. The Shapley value fixes
    // that by averaging the marginal contribution over ALL 2^K source
    // orderings — normally hopeless (2^20 subsets here), but for
    // COVERAGE games it has an exact closed form: each covered unit's
    // value splits equally among the sources covering it, so
    // φ(src) = Σ_{tok ∈ src} 1 / m(tok) with m = #sources containing
    // the token (symmetry + efficiency axioms applied per token).
    // Distributed shape: one distinct (source, token) aggregate over
    // the corpus, a vocab-bounded m(tok) aggregate, and one broadcast
    // equi-join on the token — no subset enumeration, no all-pairs.
    // Per-token credit is the integer 1000000 div m (exact both
    // engines); efficiency holds as Σ_src φ ∈ (1e6·V − K·V, 1e6·V].
    ("q301_shapley_coverage", (s: SparkSession, dir: String) => {
      import s.implicits._
      val st = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source",
          explode(split(TA.normText($"text"), " ")).as("tok"))
        .distinct()
        .localCheckpoint() // reused: m(tok) aggregate + the credit join
      val mt = st.groupBy($"tok").agg(count(lit(1)).as("m"))
      st.join(broadcast(mt), Seq("tok"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when($"m" === 1, 1L).otherwise(0L)).as("n_unique"),
          sum(expr("1000000 div m")).as("shapley_micro"))
        .orderBy($"source")
    }, Some(s"""
      WITH st AS (SELECT DISTINCT source, tok FROM
        (SELECT source, unnest(string_split($normSql, ' ')) AS tok
         FROM documents)),
      mt AS (SELECT tok, CAST(count(*) AS BIGINT) AS m FROM st GROUP BY 1)
      SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        CAST(sum(1000000 // m) AS BIGINT) AS shapley_micro
      FROM st JOIN mt USING (tok) GROUP BY source ORDER BY source""")),

    // ----- weighted reservoir sampling (Efraimidis–Spirakis A-ES) ---------
    // The battery's samplers are uniform (md5-Bernoulli) or
    // stratified-balanced (q178); neither draws documents with
    // probability PROPORTIONAL TO A WEIGHT without replacement — the
    // shape quality-weighted corpus subsampling actually needs. A-ES:
    // draw u ~ U(0,1] per item, keep the k items with largest
    // u^(1/w) — equivalently the k SMALLEST −ln(u)/w, the monotone
    // form used here. Determinism: u = (h+1)/2^32 from md5, and the
    // key is the integer nano-ratio (lnm(2^32) − lnm(h+1)) · 1000
    // div w (separate micro-ln terms per the house rule; ties broken
    // by doc_id). Zero-weight docs are filtered out FIRST: in A-ES a
    // w = 0 item has selection probability 0 (u^(1/w) → 0), and
    // leaving it in would divide by zero — NULL in Spark, an error in
    // DuckDB. k = 40 per lang stratum. Scale shape: the
    // filter(rk ≤ 40) sits DIRECTLY above the window, so it compiles
    // to WindowGroupLimit — each map task forwards at most 40 rows per
    // stratum and the shuffle carries O(k · partitions), not the
    // corpus (Round8abSpec pins the plan).
    ("q302_weighted_reservoir", (s: SparkSession, dir: String) => {
      import s.implicits._
      val keyed = Tables.spread(Tables.t(s, dir, "documents"))
        .filter($"n_chars" > 0)
        .select($"lang", $"doc_id", $"n_chars".as("w"),
          conv(substring(md5(concat(lit("wrs|"), $"doc_id".cast("string"))),
            1, 8), 16, 10).cast("long").as("h"))
        .select($"lang", $"doc_id", $"w",
          expr("""(CAST(floor(ln(CAST(4294967296 AS DOUBLE)) * 1000000 + 0.5)
                     AS BIGINT)
                   - CAST(floor(ln(CAST(h + 1 AS DOUBLE)) * 1000000 + 0.5)
                     AS BIGINT)) * 1000 div w""").as("key_nano"))
      val wl = Window.partitionBy($"lang").orderBy($"key_nano", $"doc_id")
      keyed.withColumn("rk", row_number().over(wl))
        .filter($"rk" <= 40) // WindowGroupLimit: ≤40 rows/stratum per task
        .select($"lang", $"rk".cast("long").as("rk"), $"doc_id", $"w",
          $"key_nano")
        .orderBy($"lang", $"rk")
    }, Some("""
      WITH d AS (SELECT lang, doc_id, n_chars AS w,
          ('0x' || substr(md5('wrs|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            AS h
        FROM documents WHERE n_chars > 0),
      k AS (SELECT lang, doc_id, w,
          (CAST(floor(ln(CAST(4294967296 AS DOUBLE)) * 1000000 + 0.5)
             AS BIGINT)
           - CAST(floor(ln(CAST(h + 1 AS DOUBLE)) * 1000000 + 0.5)
             AS BIGINT)) * 1000 // w AS key_nano
        FROM d),
      r AS (SELECT lang, doc_id, w, key_nano,
          row_number() OVER (PARTITION BY lang ORDER BY key_nano, doc_id)
            AS rk FROM k)
      SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, CAST(w AS BIGINT) AS w,
        key_nano
      FROM r WHERE rk <= 40 ORDER BY lang, rk"""))
  )
}
