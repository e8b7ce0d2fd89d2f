package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, TextAnalysis => TA}

/** Round-7 continuation: ranked retrieval, incremental dedup against a
  * reference corpus, sketch-based quantiles, and random-projection
  * dimensionality reduction — each with a DuckDB oracle.
  *
  * House rules as elsewhere: md5-derived determinism shared verbatim
  * between the Spark plan and the oracle SQL, micro-integer arithmetic
  * wherever float summation order could diverge, identical aliases on
  * both sides, a total ORDER BY everywhere.
  */
object Round7cQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- BM25 ranked retrieval ---------------------------------------
    // The ranking function TF-IDF (q86) approximates: Okapi BM25 with
    // k1=1.2, b=0.75 and the Lucene idf ln(1 + (N-df+.5)/(df+.5)).
    // Exactness trick: both constants are small rationals, so the whole
    // per-term score clears to ONE integer division —
    //   (2N+2)/(2df+1) is the idf ratio with the halves multiplied out,
    //   and tf·(k1+1) / (tf + k1(1-b+b·dl/avgdl)) with avgdl = S/N
    //   cross-multiplies to 22·tf·S / (10·S·tf + 3·S + 9·dl·N).
    // Only the idf ln is transcendental, handled by the shared micro-ln
    // rule (q127): floor(ln(ratio)·1e6 + 0.5) on identical doubles.
    // The cross-multiplied products (idf_micro·22·f·S and 9·dl·N) exceed
    // Int64 once S·N passes ~1e19, so the gate runs in 128-bit integer
    // arithmetic — DECIMAL(38,0) here, HUGEINT in the oracle — which
    // holds exactly to S,N ≈ 1e15 (beyond 100 TB of tokens).
    // The query terms are the corpus's three RAREST tokens (df asc) —
    // data-derived, so the oracle reproduces them — and broadcast; the
    // per-doc length and the (N, S) corpus scalars ride one in-DAG
    // aggregate each (the q86 rule: no driver-side counts). Shuffles:
    // the tf/df/dl aggregates all hash-partition on doc or token keys —
    // the same passes an inverted-index build (q156) already pays, so
    // at 100 TB BM25 costs nothing beyond the index statistics.
    ("q182_bm25", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", explode(split(TA.normText($"text"), " ")).as("tok"))
      val tf = toks.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("f"))
      val dl = toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
      val sc = dl.agg(count(lit(1)).as("n"), sum($"dl").as("s"))
      val dfre = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
      val qt = dfre.orderBy($"df", $"tok").limit(3)
      tf.join(broadcast(qt), Seq("tok"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(sc))
        .withColumn("idf_micro",
          floor(log((lit(2.0) * $"n" + 2) / (lit(2.0) * $"df" + 1)) * 1e6 + 0.5)
            .cast("long"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_terms"),
          sum(expr("CAST((CAST(idf_micro AS DECIMAL(38,0)) * 22 * f * s) div " +
              "(CAST(10 AS DECIMAL(38,0))*s*f + 3*s + 9*dl*n) AS BIGINT)"))
            .as("score_micro"))
        .orderBy(desc("score_micro"), $"doc_id")
        .limit(20)
    }, Some(s"""
      WITH toks AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok FROM documents),
      tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
      sc AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS s FROM dl),
      dfre AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      qt AS (SELECT tok, df FROM dfre ORDER BY df, tok LIMIT 3),
      terms AS (SELECT tf.doc_id, tf.f, dl.dl, qt.df, sc.n, sc.s,
          CAST(floor(ln((2.0*sc.n + 2) / (2.0*qt.df + 1)) * 1e6 + 0.5) AS BIGINT) AS idf_micro
        FROM tf JOIN qt USING (tok) JOIN dl USING (doc_id) CROSS JOIN sc)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
        CAST(sum((CAST(idf_micro AS HUGEINT) * 22 * f * s)
          // (CAST(10 AS HUGEINT)*s*f + 3*s + 9*dl*n)) AS BIGINT) AS score_micro
      FROM terms GROUP BY doc_id
      ORDER BY score_micro DESC, doc_id LIMIT 20""")),

    // ----- incremental dedup against a reference corpus -----------------
    // The production dedup shape self-dedup (q21/q41) never exercises:
    // a NEW BATCH arrives and must be deduped against everything already
    // ingested, without rescanning old-vs-old pairs. Docs split 20/80
    // (doc_id % 5) into batch/corpus; both sides carry two MinHash LSH
    // band keys (seeds 0..3, the q21 permutation template, band label
    // folded into the key so bands can't cross-match); a batch doc drops
    // iff ANY of its band keys appears in the corpus key set — one
    // semi-join on the key, one distinct. At 100 TB the corpus key set
    // is the persisted index a real pipeline maintains incrementally;
    // the per-batch cost is hashing the batch plus an equi-join whose
    // build side is key-count-sized, never corpus-content-sized, and
    // old-old pairs are structurally never generated. kept_idsum pins
    // exact membership.
    ("q183_incremental_dedup", (s: SparkSession, dir: String) => {
      import s.implicits._
      val mh = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"source",
          graft.functions.WordShingleHash32(TA.normText($"text"), 3).as("hs"))
        .select($"doc_id", $"source",
          Dedup.minhashInt($"hs", 0).as("m0"), Dedup.minhashInt($"hs", 1).as("m1"),
          Dedup.minhashInt($"hs", 2).as("m2"), Dedup.minhashInt($"hs", 3).as("m3"))
      val keys = mh.select($"doc_id", explode(array(
        md5(concat_ws("|", lit("b0"), $"m0".cast("string"), $"m1".cast("string"))),
        md5(concat_ws("|", lit("b1"), $"m2".cast("string"), $"m3".cast("string")))))
        .as("bk"))
      val corpusKeys = keys.filter($"doc_id" % 5 =!= 0).select($"bk").distinct()
      val dropped = keys.filter($"doc_id" % 5 === 0)
        .join(corpusKeys, Seq("bk"), "left_semi")
        .select($"doc_id").distinct().withColumn("isdrop", lit(1L))
      mh.filter($"doc_id" % 5 === 0).select($"doc_id", $"source")
        .join(dropped, Seq("doc_id"), "left")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_batch"),
          sum(when($"isdrop" === 1L, 1L).otherwise(0L)).as("n_dropped"),
          sum(when($"isdrop".isNull, $"doc_id").otherwise(0L)).as("kept_idsum"))
        .select($"source", $"n_batch", $"n_dropped",
          ($"n_batch" - $"n_dropped").as("n_kept"), $"kept_idsum")
        .orderBy($"source")
    }, Some(s"""
      WITH d AS (SELECT doc_id, source, string_split($normSql, ' ') AS arr FROM documents),
      sh AS (SELECT doc_id, source,
          list_distinct(list_transform(range(1, greatest(len(arr) - 2, 1) + 1),
            i -> array_to_string(arr[i:i+2], ' '))) AS shl FROM d),
      hst AS (SELECT doc_id, source,
          list_distinct(list_transform(shl, g -> ('0x' || substr(md5(g), 1, 8))::BIGINT)) AS hs
        FROM sh),
      mh AS (SELECT doc_id, source, ${Dedup.minhashSql(0)} AS m0, ${Dedup.minhashSql(1)} AS m1,
          ${Dedup.minhashSql(2)} AS m2, ${Dedup.minhashSql(3)} AS m3 FROM hst),
      keys AS (
        SELECT doc_id, md5('b0|' || CAST(m0 AS VARCHAR) || '|' || CAST(m1 AS VARCHAR)) AS bk FROM mh
        UNION ALL
        SELECT doc_id, md5('b1|' || CAST(m2 AS VARCHAR) || '|' || CAST(m3 AS VARCHAR)) AS bk FROM mh),
      ck AS (SELECT DISTINCT bk FROM keys WHERE doc_id % 5 <> 0),
      dropped AS (SELECT DISTINCT k.doc_id FROM keys k JOIN ck USING (bk) WHERE k.doc_id % 5 = 0)
      SELECT m.source, CAST(count(*) AS BIGINT) AS n_batch,
        CAST(sum(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        CAST(count(*) - sum(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(sum(CASE WHEN dr.doc_id IS NULL THEN m.doc_id ELSE 0 END) AS BIGINT) AS kept_idsum
      FROM mh m LEFT JOIN dropped dr ON m.doc_id = dr.doc_id
      WHERE m.doc_id % 5 = 0
      GROUP BY m.source ORDER BY m.source""")),

    // ----- mergeable bottom-k quantile sketch + rank-error audit --------
    // Quantiles at 100 TB without a global sort: a bottom-256-by-md5
    // sample IS a mergeable sketch (the union's bottom-k is the bottom-k
    // of the unioned bottom-ks — the KMV/q140 property), collected here
    // by TakeOrdered (distributed top-k, no single-partition pass over
    // the data). Estimated quantiles read the sorted 256-row sample;
    // the EXACT side — the audit, priced for validation runs, not the
    // scale path — uses the q126 cumulative-count form over grouped
    // values. rank_err_micro is the true rank error of each estimate,
    // |rank(est)/n − p/100|, the quantity sketch error bounds promise
    // (~1/sqrt(k) ≈ 6% here); everything after the two aggregates is
    // arithmetic over single-row scalars, all integer.
    ("q184_quantile_sketch", (s: SparkSession, dir: String) => {
      import s.implicits._
      val vals = Tables.t(s, dir, "lineitem")
        .select(floor($"l_extendedprice" * 100 + 0.5).cast("long").as("cents"),
          conv(substring(md5(concat_ws("|", $"l_orderkey".cast("string"),
            $"l_linenumber".cast("string"))), 1, 8), 16, 10).cast("long").as("h"),
          $"l_orderkey".as("okey"), $"l_linenumber".as("lnum"))
      val samp = vals.orderBy($"h", $"okey", $"lnum").limit(256)
      val srn = samp.withColumn("rn",
        row_number().over(Window.orderBy($"cents", $"h", $"okey", $"lnum")))
      val k = samp.agg(count(lit(1)).as("k"))
      val n = vals.agg(count(lit(1)).as("n"))
      val ps = Seq(25, 50, 75, 90).toDF("p")
      val dwin = graft.ext.GridCumulative.withRunningTotal(
        vals.groupBy($"cents").agg(count(lit(1)).as("c")), "cents", "c", "cum")
      val est = ps.crossJoin(broadcast(k))
        .withColumn("idx", expr("(p * k + 99) div 100"))
        .join(srn, $"rn" === $"idx")
        .select($"p", $"cents".as("est_cents"))
      val exact = ps.crossJoin(broadcast(n))
        .withColumn("r", expr("(p * n + 99) div 100"))
        .join(dwin, $"cum" >= $"r")
        .groupBy($"p").agg(min($"cents").as("exact_cents"))
      est.join(exact, Seq("p"))
        .join(dwin.select($"cents", $"cum"), $"cents" === $"est_cents")
        .crossJoin(broadcast(n))
        .select($"p".cast("long").as("p"), $"est_cents", $"exact_cents",
          $"cum".as("est_rank"),
          abs(expr("(1000000 * cum) div n") - lit(10000) * $"p").as("rank_err_micro"))
        .orderBy($"p")
    }, Some("""
      WITH vals AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
          ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT AS h,
          l_orderkey AS okey, l_linenumber AS lnum
        FROM lineitem),
      samp AS (SELECT cents, h, okey, lnum FROM vals ORDER BY h, okey, lnum LIMIT 256),
      srn AS (SELECT cents, row_number() OVER (ORDER BY cents, h, okey, lnum) AS rn FROM samp),
      k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM samp),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
      ps AS (SELECT p FROM (VALUES (25), (50), (75), (90)) AS t(p)),
      dwin AS (SELECT cents, sum(c) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM (SELECT cents, count(*) AS c FROM vals GROUP BY 1)),
      est AS (SELECT p, cents AS est_cents FROM ps, k, srn WHERE rn = (p * k + 99) // 100),
      exact AS (SELECT p, min(cents) AS exact_cents FROM ps, n, dwin
        WHERE cum >= (p * n + 99) // 100 GROUP BY p)
      SELECT CAST(est.p AS BIGINT) AS p, est.est_cents, exact.exact_cents,
        CAST(d.cum AS BIGINT) AS est_rank,
        CAST(abs((1000000 * d.cum) // n.n - 10000 * est.p) AS BIGINT) AS rank_err_micro
      FROM est JOIN exact ON est.p = exact.p
      JOIN dwin d ON d.cents = est.est_cents CROSS JOIN n
      ORDER BY p""")),

    // ----- random-projection (JL) dimensionality reduction + audit ------
    // Johnson-Lindenstrauss with an Achlioptas ±1 matrix: project the
    // 64-d embeddings to 16-d where the sign s(j,k) comes from one md5
    // bit — the matrix is never materialized or shipped, both engines
    // regenerate any entry from (j,k) alone, and for ±1 entries
    // E[d_proj²] = m·d_orig² exactly. Vectors are micro-quantized first
    // (the q101 floor(x·1000+0.5) rule) so every dot product is integer
    // math with NO float summation order to diverge. The projection is
    // per-row map-side (nested higher-order exprs, no explode, no
    // shuffle) — at 100 TB this is the embedding-compression pass before
    // an ANN build, 4× cheaper distance math downstream. The audit joins
    // the first 20 vectors' 190 pairs (a fixed-size probe set at any
    // corpus size) and reports the distortion ratio 1e6·d_proj²/(m·d_orig²),
    // concentrating around 1e6 as JL promises.
    ("q185_random_projection", (s: SparkSession, dir: String) => {
      import s.implicits._
      val e = Tables.t(s, dir, "embeddings").filter($"vec_id" < 20)
        .select($"vec_id",
          expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))").as("q"))
        .withColumn("proj", expr("""
          transform(sequence(1, 16), k -> aggregate(sequence(1, 64), CAST(0 AS BIGINT),
            (acc, j) -> acc + element_at(q, j) *
              (CASE WHEN CAST(conv(substring(md5(concat(CAST(j AS STRING), '|', CAST(k AS STRING))), 1, 1), 16, 10) AS INT) % 2 = 0
                THEN 1 ELSE -1 END)))"""))
      val a = e.select($"vec_id".as("id_a"), $"q".as("qa"), $"proj".as("pa"))
      val b = e.select($"vec_id".as("id_b"), $"q".as("qb"), $"proj".as("pb"))
      a.crossJoin(b).filter($"id_a" < $"id_b")
        .withColumn("d_orig_sq",
          expr("aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
        .withColumn("d_proj_sq",
          expr("aggregate(zip_with(pa, pb, (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
        .select($"id_a", $"id_b", $"d_orig_sq", $"d_proj_sq",
          expr("CASE WHEN d_orig_sq = 0 THEN NULL ELSE (1000000 * d_proj_sq) div (16 * d_orig_sq) END")
            .as("ratio_micro"))
        .orderBy($"id_a", $"id_b")
    }, Some("""
      WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
        FROM embeddings WHERE vec_id < 20),
      p AS (SELECT vec_id, q,
          list_transform(range(1, 17), k -> CAST(list_sum(list_transform(range(1, 65),
            j -> q[j] * (CASE WHEN ('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || CAST(k AS VARCHAR)), 1, 1))::INT % 2 = 0
              THEN 1 ELSE -1 END))) AS BIGINT)) AS proj
        FROM e),
      pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.q AS qa, b.q AS qb,
          a.proj AS pa, b.proj AS pb
        FROM p a JOIN p b ON a.vec_id < b.vec_id),
      d AS (SELECT id_a, id_b,
          CAST(list_sum(list_transform(range(1, 65), j -> (qa[j] - qb[j]) * (qa[j] - qb[j]))) AS BIGINT) AS d_orig_sq,
          CAST(list_sum(list_transform(range(1, 17), k -> (pa[k] - pb[k]) * (pa[k] - pb[k]))) AS BIGINT) AS d_proj_sq
        FROM pairs)
      SELECT id_a, id_b, d_orig_sq, d_proj_sq,
        CASE WHEN d_orig_sq = 0 THEN NULL
          ELSE (1000000 * d_proj_sq) // (16 * d_orig_sq) END AS ratio_micro
      FROM d ORDER BY id_a, id_b"""))
  )
}
