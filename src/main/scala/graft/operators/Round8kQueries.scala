package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 11: numeric-integrity auditing (Benford), change-point
  * detection (CUSUM), the third privacy metric (t-closeness, completing
  * q206 k-anonymity / q219 l-diversity), probabilistic record linkage
  * (Fellegi–Sunter u-weights), exact phrase queries over a positional
  * inverted index, and HITS hubs/authorities.
  *
  * House rules as elsewhere: micro-ln for transcendentals, integer
  * arithmetic at every gate, 128-bit (DECIMAL(38,0)/HUGEINT) for
  * cross-products that reach n², identical aliases both sides, total
  * ORDER BY.
  */
object Round8kQueries {

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

    // ----- Benford first-digit audit --------------------------------------
    // The numeric-integrity screen auditors run on money columns: the
    // observed first-significant-digit distribution of o_totalprice vs
    // Benford's law p(d) = log10(1 + 1/d). Fabricated or truncated
    // figures drift from the curve; a natural multiplicative process
    // follows it. One digit-histogram aggregate (map-side combinable to
    // 9 rows) joined to a 9-row expectation grid — corpus-linear with a
    // constant-size result at any SF. Prices quantize to cents first
    // (the money rule) so the digit extraction is integer-string exact;
    // the expectation uses log10 on the 9 constant ratios (micro-ln
    // rule: identical inputs → identical IEEE doubles both sides).
    ("q228_benford", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.t(s, dir, "orders")
        .select(substring(floor($"o_totalprice" * 100 + lit(0.5))
          .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("n_d"))
      val tot = d.agg(sum($"n_d").as("n"))
      val grid = s.range(1, 10).select($"id".as("digit"))
      grid.join(d, Seq("digit"), "left").na.fill(0L, Seq("n_d"))
        .crossJoin(broadcast(tot))
        .select($"digit", $"n_d",
          expr("(1000000 * n_d) div n").as("obs_micro"),
          floor(log10(($"digit" + 1).cast("double") / $"digit".cast("double"))
            * 1e6 + 0.5).cast("long").as("exp_micro"))
        .withColumn("dev_micro", abs($"obs_micro" - $"exp_micro"))
        .orderBy($"digit")
    }, Some("""
      WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
          CAST(count(*) AS BIGINT) AS n_d
        FROM orders GROUP BY 1),
      tot AS (SELECT CAST(sum(n_d) AS BIGINT) AS n FROM d),
      grid AS (SELECT CAST(range AS BIGINT) AS digit FROM range(1, 10))
      SELECT g.digit, CAST(coalesce(d.n_d, 0) AS BIGINT) AS n_d,
        (1000000 * CAST(coalesce(d.n_d, 0) AS BIGINT)) // tot.n AS obs_micro,
        CAST(floor(log10(CAST(g.digit + 1 AS DOUBLE) / CAST(g.digit AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS exp_micro,
        abs((1000000 * CAST(coalesce(d.n_d, 0) AS BIGINT)) // tot.n
          - CAST(floor(log10(CAST(g.digit + 1 AS DOUBLE) / CAST(g.digit AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS dev_micro
      FROM grid g LEFT JOIN d ON g.digit = d.digit CROSS JOIN tot
      ORDER BY g.digit""")),

    // ----- CUSUM change-point detection -----------------------------------
    // The level-shift detector the seasonal monitor (q168 family) can't
    // see: the classical CUSUM statistic S_t = Σ_{i≤t}(c_i − mean) over
    // the daily event-count series, computed entirely in integers by
    // scaling through the day count (n·c_i − total — same algebra, no
    // division). The change point is the argmax of |S_t|: the day the
    // series' level shifted, flagged in-DAG via a window max (no
    // driver-side argmax). The cumulative window is single-partition by
    // construction but bounded by |days| — a 100 TB corpus still has
    // thousands of days, not billions; the corpus-sized work is the one
    // daily aggregate below it.
    ("q229_cusum_changepoint", (s: SparkSession, dir: String) => {
      import s.implicits._
      val raw = Tables.t(s, dir, "events")
      val daily = raw.select((tusOf(raw) / 86400000000L).cast("long").as("day"))
        .groupBy($"day").agg(count(lit(1)).as("y"))
      val tot = daily.agg(count(lit(1)).as("nd"), sum($"y").as("ty"))
      val cum = daily.crossJoin(broadcast(tot))
        .withColumn("s_scaled", sum($"nd" * $"y" - $"ty").over(
          Window.orderBy($"day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      cum.withColumn("mx", max(abs($"s_scaled")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select($"day", $"y", $"s_scaled",
          when(abs($"s_scaled") === $"mx", 1L).otherwise(0L).as("is_changepoint"))
        .orderBy($"day")
    }, Some("""
      WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(y) AS BIGINT) AS ty FROM daily),
      cum AS (SELECT day, y,
          CAST(sum(tot.nd * y - tot.ty) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s_scaled
        FROM daily CROSS JOIN tot)
      SELECT day, y, s_scaled,
        CASE WHEN abs(s_scaled) = max(abs(s_scaled)) OVER () THEN 1 ELSE 0 END
          ::BIGINT AS is_changepoint
      FROM cum ORDER BY day""")),

    // ----- t-closeness (EMD of sensitive attribute per QI group) ----------
    // Completes the release-audit trio: q206 k-anonymity (group sizes),
    // q219 l-diversity (distinct sensitive values), and now t-closeness —
    // how far each quasi-identifier group's SENSITIVE-value distribution
    // sits from the corpus's, as the Earth Mover's Distance over the
    // ordered value scale. For 1-D ordered buckets EMD is the sum of
    // |ECDF_g − ECDF_corpus| over the bucket grid; normalized by the
    // (k−1)-step maximum it lands in [0,1]. A group can be large (k-anon
    // passes) and diverse (l-div passes) and STILL leak — when its
    // distribution skews hard from the corpus, which is exactly what t
    // measures. All integer: cross-products in DECIMAL(38,0)/HUGEINT
    // (cum·N reaches N² — past Int64 at ~3e9 rows, the q195 rule). QI =
    // (source, lang); sensitive = length quintile (fixed 500-char
    // buckets — no global sort to form them). The grid is |groups|×5;
    // per-group cumulatives ride their own window partitions.
    ("q230_t_closeness", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.t(s, dir, "documents")
        .select($"source", $"lang",
          least(expr("n_chars div 500"), lit(4L)).as("b"))
      val gTot = d.groupBy($"source", $"lang").agg(count(lit(1)).as("n_g"))
      val tot = d.agg(count(lit(1)).as("n"))
      val gb = d.groupBy($"source", $"lang", $"b").agg(count(lit(1)).as("c"))
      val cb = d.groupBy($"b").agg(count(lit(1)).as("c"))
        .withColumn("cum_c", sum($"c").over(
          Window.orderBy($"b").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"b", $"cum_c")
      val grid = d.select($"source", $"lang").distinct()
        .crossJoin(s.range(0, 5).select($"id".as("b")))
      val cums = grid.join(gb, Seq("source", "lang", "b"), "left")
        .na.fill(0L, Seq("c"))
        .withColumn("cum_g", sum($"c").over(
          Window.partitionBy($"source", $"lang").orderBy($"b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      cums.filter($"b" <= 3) // ECDFs agree at the last bucket by construction
        .join(cb, Seq("b"))
        .join(gTot, Seq("source", "lang"))
        .crossJoin(broadcast(tot))
        .groupBy($"source", $"lang")
        .agg(max($"n_g").as("n_docs"),
          sum(abs(expr("CAST(cum_g AS DECIMAL(38,0)) * n") -
                  expr("CAST(cum_c AS DECIMAL(38,0)) * n_g"))).as("emd_scaled"),
          max(expr("CAST(n_g AS DECIMAL(38,0)) * n")).as("den"))
        .select($"source", $"lang", $"n_docs",
          expr("CAST((1000000 * emd_scaled) div (4 * den) AS BIGINT)").as("t_micro"))
        .orderBy(desc("t_micro"), $"source", $"lang")
    }, Some("""
      WITH d AS (SELECT source, lang, least(n_chars // 500, 4) AS b FROM documents),
      gt AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_g FROM d GROUP BY 1, 2),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
      gb AS (SELECT source, lang, b, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2, 3),
      cb AS (SELECT b, CAST(sum(count(*)) OVER (ORDER BY b
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c
        FROM d GROUP BY b),
      grid AS (SELECT g.source, g.lang, CAST(r.range AS BIGINT) AS b
        FROM (SELECT DISTINCT source, lang FROM d) g CROSS JOIN range(0, 5) r),
      cums AS (SELECT grid.source, grid.lang, grid.b,
          CAST(sum(coalesce(gb.c, 0)) OVER (PARTITION BY grid.source, grid.lang
            ORDER BY grid.b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_g
        FROM grid LEFT JOIN gb ON grid.source = gb.source AND grid.lang = gb.lang AND grid.b = gb.b)
      SELECT c.source, c.lang, CAST(max(gt.n_g) AS BIGINT) AS n_docs,
        CAST((1000000 * sum(abs(CAST(c.cum_g AS HUGEINT) * tot.n
            - CAST(cb.cum_c AS HUGEINT) * gt.n_g)))
          // (4 * max(CAST(gt.n_g AS HUGEINT) * tot.n)) AS BIGINT) AS t_micro
      FROM cums c JOIN cb ON c.b = cb.b
      JOIN gt ON c.source = gt.source AND c.lang = gt.lang
      CROSS JOIN tot
      WHERE c.b <= 3
      GROUP BY 1, 2
      ORDER BY t_micro DESC, c.source, c.lang""")),

    // ----- Fellegi–Sunter record-linkage weights --------------------------
    // Probabilistic record linkage: candidate pairs from blocking, scored
    // by the sum of per-field agreement weights w_f = −ln(u_f), where
    // u_f = Σ_v n_v²/N² is the corpus-estimated chance-agreement
    // probability of field f (the Fellegi–Sunter u-probability; the
    // m≈1 simplification drops the disagreement term — the standard
    // upper-bound scorer when no labeled matches exist to estimate m).
    // A rare-valued field agreeing is worth more than a common one —
    // that asymmetry is the whole method: the ~100-value cents field
    // outweighs the ~11-value balance bucket, and the weights come from
    // the data, not hand tuning. Blocks are (nation, segment)
    // equi-join keys, so pair generation is block-bounded, never
    // all-pairs; u-weights are three tiny value-frequency aggregates
    // folded to in-DAG broadcast scalars. At 100 TB the blocking key is
    // the dial: tighten it (add fields) until max block size is
    // bounded, exactly the q179 blocking-recall tradeoff.
    ("q231_fs_linkage", (s: SparkSession, dir: String) => {
      import s.implicits._
      val c = Tables.t(s, dir, "customer")
        .select($"c_custkey".as("k"), $"c_nationkey".as("blk1"),
          $"c_mktsegment".as("blk2"),
          expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").as("f1"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) % 100").as("f2"),
          substring($"c_name", -1, 1).as("f3"))
        .localCheckpoint() // three u-aggregates + pair self-join
      val nTot = c.agg(count(lit(1)).as("n"))
      def uWeight(field: String) =
        c.groupBy(col(field)).agg(count(lit(1)).as("nv"))
          .crossJoin(broadcast(nTot))
          .agg(expr("CAST(-floor(ln(CAST(sum(nv * nv) AS DOUBLE)" +
            " / (CAST(max(n) AS DOUBLE) * max(n))) * 1e6 + 0.5) AS BIGINT)")
            .as(s"w_$field"))
      val a = c.toDF(c.columns.map(x => s"a_$x"): _*)
      val b = c.toDF(c.columns.map(x => s"b_$x"): _*)
      a.join(b, $"a_blk1" === $"b_blk1" && $"a_blk2" === $"b_blk2" &&
          $"a_k" < $"b_k")
        .crossJoin(broadcast(uWeight("f1")))
        .crossJoin(broadcast(uWeight("f2")))
        .crossJoin(broadcast(uWeight("f3")))
        .select($"a_k".as("key_a"), $"b_k".as("key_b"),
          (when($"a_f1" === $"b_f1", $"w_f1").otherwise(0L)
            + when($"a_f2" === $"b_f2", $"w_f2").otherwise(0L)
            + when($"a_f3" === $"b_f3", $"w_f3").otherwise(0L)).as("score_micro"),
          (when($"a_f1" === $"b_f1", 4L).otherwise(0L)
            + when($"a_f2" === $"b_f2", 2L).otherwise(0L)
            + when($"a_f3" === $"b_f3", 1L).otherwise(0L)).as("agree_mask"))
        .orderBy(desc("score_micro"), $"key_a", $"key_b")
        .limit(20)
    }, Some("""
      WITH c AS (SELECT c_custkey AS k, c_nationkey AS blk1, c_mktsegment AS blk2,
          CAST(floor(c_acctbal / 1000) AS BIGINT) AS f1,
          CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) % 100 AS f2,
          substr(c_name, -1, 1) AS f3
        FROM customer),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
      w1 AS (SELECT CAST(-floor(ln(CAST(sum(nv * nv) AS DOUBLE)
          / (CAST(n.n AS DOUBLE) * n.n)) * 1e6 + 0.5) AS BIGINT) AS w_f1
        FROM (SELECT f1, CAST(count(*) AS BIGINT) AS nv FROM c GROUP BY 1) CROSS JOIN n
        GROUP BY n.n),
      w2 AS (SELECT CAST(-floor(ln(CAST(sum(nv * nv) AS DOUBLE)
          / (CAST(n.n AS DOUBLE) * n.n)) * 1e6 + 0.5) AS BIGINT) AS w_f2
        FROM (SELECT f2, CAST(count(*) AS BIGINT) AS nv FROM c GROUP BY 1) CROSS JOIN n
        GROUP BY n.n),
      w3 AS (SELECT CAST(-floor(ln(CAST(sum(nv * nv) AS DOUBLE)
          / (CAST(n.n AS DOUBLE) * n.n)) * 1e6 + 0.5) AS BIGINT) AS w_f3
        FROM (SELECT f3, CAST(count(*) AS BIGINT) AS nv FROM c GROUP BY 1) CROSS JOIN n
        GROUP BY n.n)
      SELECT a.k AS key_a, b.k AS key_b,
        (CASE WHEN a.f1 = b.f1 THEN w1.w_f1 ELSE 0 END
          + CASE WHEN a.f2 = b.f2 THEN w2.w_f2 ELSE 0 END
          + CASE WHEN a.f3 = b.f3 THEN w3.w_f3 ELSE 0 END) AS score_micro,
        (CASE WHEN a.f1 = b.f1 THEN 4 ELSE 0 END
          + CASE WHEN a.f2 = b.f2 THEN 2 ELSE 0 END
          + CASE WHEN a.f3 = b.f3 THEN 1 ELSE 0 END)::BIGINT AS agree_mask
      FROM c a JOIN c b ON a.blk1 = b.blk1 AND a.blk2 = b.blk2 AND a.k < b.k
      CROSS JOIN w1 CROSS JOIN w2 CROSS JOIN w3
      ORDER BY score_micro DESC, key_a, key_b LIMIT 20""")),

    // ----- exact phrase query via positional inverted index ---------------
    // The retrieval primitive BM25 (q182) can't express: EXACT phrase
    // match. The index is the postings table (tok, doc_id, pos) —
    // posexplode of the token array; a phrase query is an equi-join of
    // postings on (doc_id, pos+1 = pos) — each extra phrase word adds
    // one more join, always on the same co-partitioned (doc_id, pos)
    // key. The targets here are the corpus's top-3 bigrams (support
    // floor 5, the q196 guard), selected IN-DAG by a TakeOrdered over
    // the adjacency counts and broadcast into the postings join — so
    // the expensive side scans once whatever the phrase list is. The
    // spec cross-checks the index path against the direct
    // array-adjacency count: same numbers, two plans.
    ("q232_phrase_query", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", split(TA.normText($"text"), " ").as("a"))
        .filter(size($"a") >= 2)
        .localCheckpoint() // feeds both the target miner and the postings
      val post = toks.select($"doc_id", posexplode($"a").as(Seq("pos", "tok")))
      val targets = toks.select(explode(expr(
          "transform(sequence(1, size(a) - 1), i -> struct(element_at(a, i) AS t1, element_at(a, i + 1) AS t2))"))
          .as("b"))
        .groupBy($"b.t1".as("t1"), $"b.t2".as("t2"))
        .agg(count(lit(1)).as("f12")).filter($"f12" >= 5)
        .orderBy(desc("f12"), $"t1", $"t2").limit(3)
      // phrase adjacency as a TRUE equi-join on (doc_id, pos) — a join
      // on doc_id alone with a residual pos filter would hash-match
      // whole documents against themselves (|tokens/doc|² comparisons);
      // keying on the successor position keeps it |tokens|-linear. The
      // broadcast target filters cut each postings side BEFORE the join.
      val tset1 = targets.select($"t1").distinct()
      val tset2 = targets.select($"t2").distinct()
      val lhs = post.toDF("doc_id", "p", "t1")
        .join(broadcast(tset1), Seq("t1"))
        .select($"doc_id", ($"p" + 1).as("pos"), $"t1")
      val rhs = post.toDF("doc_id", "pos", "t2")
        .join(broadcast(tset2), Seq("t2"))
      val hits = lhs.join(rhs, Seq("doc_id", "pos"))
        .join(broadcast(targets.select($"t1", $"t2")), Seq("t1", "t2"))
      hits.groupBy($"t1", $"t2")
        .agg(countDistinct($"doc_id").as("n_docs"), count(lit(1)).as("n_occ"))
        .orderBy(desc("n_occ"), $"t1", $"t2")
    }, Some(s"""
      WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS a FROM documents
        WHERE len(string_split($normSql, ' ')) >= 2),
      post AS (SELECT doc_id, a[i] AS tok, i AS pos
        FROM base, unnest(range(1, len(a) + 1)) AS t(i)),
      targets AS (SELECT a[i] AS t1, a[i + 1] AS t2, CAST(count(*) AS BIGINT) AS f12
        FROM base, unnest(range(1, len(a))) AS t(i)
        GROUP BY 1, 2 HAVING count(*) >= 5
        ORDER BY f12 DESC, t1, t2 LIMIT 3),
      hits AS (SELECT p1.tok AS t1, p2.tok AS t2, p1.doc_id
        FROM post p1 JOIN post p2 ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
        JOIN targets tg ON p1.tok = tg.t1 AND p2.tok = tg.t2)
      SELECT t1, t2, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        CAST(count(*) AS BIGINT) AS n_occ
      FROM hits GROUP BY 1, 2 ORDER BY n_occ DESC, t1, t2""")),

    // ----- HITS hubs & authorities ----------------------------------------
    // The bipartite complement of q153's PageRank: on the part→supplier
    // procurement graph, a GOOD HUB (part) is one sourced from good
    // authorities, a GOOD AUTHORITY (supplier) one backing good hubs —
    // the mutual recursion a(v)=Σh(u), h(u)=Σa(v), two rounds. Each
    // half-step is one co-partitioned equi-join + aggregate on the
    // checkpointed edge list (the q153 discipline); normalization
    // divides by the step's max via an in-DAG broadcast scalar, keeping
    // every score an exact integer in [0, 1e6] — no floating
    // renormalization to drift between sides. Converged scores rank
    // supply-chain criticality: the suppliers whose failure hits the
    // most well-connected parts.
    ("q233_hits", (s: SparkSession, dir: String) => {
      import s.implicits._
      val e = Tables.t(s, dir, "lineitem")
        .select($"l_partkey".as("u"), $"l_suppkey".as("v")).distinct()
        .localCheckpoint() // four half-step joins reuse the edge list
      def normalize(df: DataFrame, node: String, sc: String): DataFrame = {
        val mx = df.agg(max(col(sc)).as("mx"))
        df.crossJoin(broadcast(mx))
          .select(col(node), expr(s"(1000000 * $sc) div mx").as(sc))
      }
      val h0 = e.select($"u").distinct().select($"u", lit(1000000L).as("h"))
      def authStep(h: DataFrame) = normalize(
        e.join(h, Seq("u")).groupBy($"v").agg(sum($"h").as("a")), "v", "a")
      def hubStep(a: DataFrame) = normalize(
        e.join(a, Seq("v")).groupBy($"u").agg(sum($"a").as("h")), "u", "h")
      val a1 = authStep(h0); val h1 = hubStep(a1)
      val a2 = authStep(h1); val h2 = hubStep(a2)
      a2.select(lit("authority").as("kind"), $"v".as("node_id"), $"a".as("score_micro"))
        .orderBy(desc("score_micro"), $"node_id").limit(12)
        .unionAll(
          h2.select(lit("hub").as("kind"), $"u".as("node_id"), $"h".as("score_micro"))
            .orderBy(desc("score_micro"), $"node_id").limit(12))
        .orderBy($"kind", desc("score_micro"), $"node_id")
    }, Some("""
      WITH e AS (SELECT DISTINCT l_partkey AS u, l_suppkey AS v FROM lineitem),
      h0 AS (SELECT DISTINCT u, CAST(1000000 AS BIGINT) AS h FROM e),
      a1r AS (SELECT v, CAST(sum(h) AS BIGINT) AS a FROM e JOIN h0 USING (u) GROUP BY v),
      a1 AS (SELECT v, (1000000 * a) // (SELECT max(a) FROM a1r) AS a FROM a1r),
      h1r AS (SELECT u, CAST(sum(a) AS BIGINT) AS h FROM e JOIN a1 USING (v) GROUP BY u),
      h1 AS (SELECT u, (1000000 * h) // (SELECT max(h) FROM h1r) AS h FROM h1r),
      a2r AS (SELECT v, CAST(sum(h) AS BIGINT) AS a FROM e JOIN h1 USING (u) GROUP BY v),
      a2 AS (SELECT v, (1000000 * a) // (SELECT max(a) FROM a2r) AS a FROM a2r),
      h2r AS (SELECT u, CAST(sum(a) AS BIGINT) AS h FROM e JOIN a2 USING (v) GROUP BY u),
      h2 AS (SELECT u, (1000000 * h) // (SELECT max(h) FROM h2r) AS h FROM h2r),
      top AS (
        (SELECT 'authority' AS kind, v AS node_id, a AS score_micro FROM a2
          ORDER BY score_micro DESC, node_id LIMIT 12)
        UNION ALL
        (SELECT 'hub' AS kind, u AS node_id, h AS score_micro FROM h2
          ORDER BY score_micro DESC, node_id LIMIT 12))
      SELECT kind, node_id, score_micro FROM top
      ORDER BY kind, score_micro DESC, node_id"""))
  )
}
