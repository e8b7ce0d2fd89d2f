package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, TextAnalysis => TA}

/** Round-7 continuation: corpus-comparison statistics (MinHash source
  * similarity, KS drift), collocation mining, and diversity capping —
  * each with a DuckDB oracle.
  *
  * House rules as elsewhere: shared md5/permutation templates, the
  * micro-ln rule for transcendentals, integer arithmetic near the gate,
  * identical aliases, total ORDER BY.
  */
object Round7fQueries {

  private val normSql = TA.normTextSql
  private val P = Dedup.HashPrime

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- pairwise source similarity: MinHash signatures + exact audit -
    // The corpus-comparison matrix a mixing planner reads: per-source
    // token-SET MinHash signatures (8 permutations from the q21
    // template, each one min() AGGREGATE — the signature is mergeable,
    // so at 100 TB it maintains incrementally and the pairwise stage
    // touches only |sources|² signature rows, never content). The exact
    // Jaccard audit joins distinct (source, token) pairs on the token —
    // |vocab|-bounded, the measure of what the 8-component estimate
    // (resolution 1/8 = 125000 micro) trades away.
    ("q194_source_similarity", (s: SparkSession, dir: String) => {
      import s.implicits._
      val st = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", explode(split(TA.normText($"text"), " ")).as("tok"))
        .distinct()
      val h = st.withColumn("h",
        conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long"))
      val minCols: Seq[Column] = (0 until 8).map { k =>
        val (a, b) = Dedup.permConsts(k)
        min(($"h" * a + b) % P).as(s"m$k")
      }
      val sigs = h.groupBy($"source")
        .agg(count(lit(1)).as("n_toks"), minCols: _*)
      val a = sigs.toDF(sigs.columns.map(c => s"a_$c"): _*)
      val b = sigs.toDF(sigs.columns.map(c => s"b_$c"): _*)
      val matches = (0 until 8).map(k =>
        when(col(s"a_m$k") === col(s"b_m$k"), 1).otherwise(0)).reduce(_ + _)
      val pairs = a.join(b, col("a_source") < col("b_source"))
        .select(col("a_source").as("source_a"), col("b_source").as("source_b"),
          col("a_n_toks").as("n_a"), col("b_n_toks").as("n_b"),
          matches.cast("long").as("sig_matches"))
      val inter = st.toDF("source_a", "tok")
        .join(st.toDF("source_b", "tok"), Seq("tok"))
        .filter($"source_a" < $"source_b")
        .groupBy($"source_a", $"source_b").agg(count(lit(1)).as("inter"))
      pairs.join(inter, Seq("source_a", "source_b"), "left")
        .na.fill(0L, Seq("inter"))
        .select($"source_a", $"source_b", $"n_a", $"n_b", $"inter",
          ($"sig_matches" * 125000).as("est_micro"),
          expr("(1000000 * inter) div (n_a + n_b - inter)").as("exact_micro"))
        .orderBy($"source_a", $"source_b")
    }, Some {
      val mins = (0 until 8).map { k =>
        val (a, b) = Dedup.permConsts(k)
        s"min((h * $a + $b) % $P) AS m$k"
      }.mkString(", ")
      val eq = (0 until 8).map(k =>
        s"(CASE WHEN a.m$k = b.m$k THEN 1 ELSE 0 END)").mkString(" + ")
      s"""
      WITH st AS (SELECT DISTINCT source, tok
        FROM (SELECT source, unnest(string_split($normSql, ' ')) AS tok FROM documents)),
      h AS (SELECT source, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM st),
      sig AS (SELECT source, CAST(count(*) AS BIGINT) AS n_toks, $mins
        FROM h GROUP BY 1),
      pairs AS (SELECT a.source AS source_a, b.source AS source_b,
          a.n_toks AS n_a, b.n_toks AS n_b, CAST($eq AS BIGINT) AS sig_matches
        FROM sig a JOIN sig b ON a.source < b.source),
      i AS (SELECT x.source AS source_a, y.source AS source_b,
          CAST(count(*) AS BIGINT) AS inter
        FROM st x JOIN st y ON x.tok = y.tok AND x.source < y.source GROUP BY 1, 2)
      SELECT p.source_a, p.source_b, p.n_a, p.n_b,
        CAST(coalesce(i.inter, 0) AS BIGINT) AS inter,
        p.sig_matches * 125000 AS est_micro,
        (1000000 * CAST(coalesce(i.inter, 0) AS BIGINT))
          // (p.n_a + p.n_b - CAST(coalesce(i.inter, 0) AS BIGINT)) AS exact_micro
      FROM pairs p LEFT JOIN i ON p.source_a = i.source_a AND p.source_b = i.source_b
      ORDER BY 1, 2"""
    }),

    // ----- Kolmogorov–Smirnov drift per source --------------------------
    // The distribution-shift complement to q127's KL: the exact
    // two-sample KS statistic between each source's length distribution
    // and the whole corpus — max over the value grid of
    // |ECDF_s − ECDF_corpus|, computed entirely in integers as
    // max|cum_s·n − cum_c·n_s| / (n_s·n) (the denominator is constant
    // per source, so the max moves inside; the cross-products run in
    // 128-bit integers — DECIMAL(38,0)/HUGEINT — since cum·n reaches n²,
    // past Int64 at ~3e9 rows). The grid is the DISTINCT
    // value set (bounded by value cardinality — bucket first for
    // unbounded domains); each source's cumulative rides its own window
    // partition, so sources scan in parallel and nothing global sorts.
    ("q195_ks_drift", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", $"n_chars".as("v"))
      val ns = d.groupBy($"source").agg(count(lit(1)).as("n_s"))
      val tot = d.agg(count(lit(1)).as("n"))
      val sv = d.groupBy($"source", $"v").agg(count(lit(1)).as("c"))
      val cv = graft.ext.GridCumulative.withRunningTotal(
          d.groupBy($"v").agg(count(lit(1)).as("c")), "v", "c", "cum_c")
        .select($"v", $"cum_c")
      val grid = d.select($"source").distinct().crossJoin(d.select($"v").distinct())
      val cums = grid.join(sv, Seq("source", "v"), "left")
        .na.fill(0L, Seq("c"))
        .withColumn("cum_s", sum($"c").over(
          Window.partitionBy($"source").orderBy($"v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      cums.join(cv, Seq("v"))
        .join(ns, Seq("source"))
        .crossJoin(broadcast(tot))
        .groupBy($"source")
        .agg(max($"n_s").as("n_docs"),
          max(abs(expr("CAST(cum_s AS DECIMAL(38,0)) * n") -
                  expr("CAST(cum_c AS DECIMAL(38,0)) * n_s"))).as("mx"),
          max(expr("CAST(n_s AS DECIMAL(38,0)) * n")).as("den"))
        .select($"source", $"n_docs",
          expr("CAST((1000000 * mx) div den AS BIGINT)").as("ks_micro"))
        .orderBy($"source")
    }, Some("""
      WITH d AS (SELECT source, n_chars AS v FROM documents),
      ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM d GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
      sv AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2),
      cv AS (SELECT v, CAST(sum(count(*)) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c
        FROM d GROUP BY v),
      grid AS (SELECT s.source, g.v
        FROM (SELECT DISTINCT source FROM d) s CROSS JOIN (SELECT DISTINCT v FROM d) g),
      cums AS (SELECT grid.source, grid.v,
          CAST(sum(coalesce(sv.c, 0)) OVER (PARTITION BY grid.source ORDER BY grid.v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_s
        FROM grid LEFT JOIN sv ON grid.source = sv.source AND grid.v = sv.v),
      m AS (SELECT c.source, max(ns.n_s) AS n_docs,
          max(abs(CAST(c.cum_s AS HUGEINT) * tot.n - CAST(cv.cum_c AS HUGEINT) * ns.n_s)) AS mx,
          max(CAST(ns.n_s AS HUGEINT) * tot.n) AS den
        FROM cums c JOIN cv ON c.v = cv.v JOIN ns ON c.source = ns.source
        CROSS JOIN tot GROUP BY 1)
      SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        CAST((1000000 * mx) // den AS BIGINT) AS ks_micro
      FROM m ORDER BY source""")),

    // ----- PMI collocations (bigram pointwise mutual information) -------
    // The association statistic under SGNS embeddings: for the corpus's
    // most frequent bigrams, pmi = ln(p(ab)) − ln(p(a)) − ln(p(b)) as
    // three integer micro-lns (the q127 rule). The bigram and unigram
    // aggregates key on the gram; totals are in-DAG broadcast scalars;
    // the top-50 cut is one TakeOrdered. The f12 ≥ 5 support floor is
    // the standard collocation guard against PMI's low-count bias.
    ("q196_pmi_bigrams", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", split(TA.normText($"text"), " ").as("a"))
        .filter(size($"a") >= 2)
      val bi = toks.select(explode(expr(
          "transform(sequence(1, size(a) - 1), i -> struct(element_at(a, i) AS t1, element_at(a, i + 1) AS t2))"))
          .as("b"))
        .select($"b.t1", $"b.t2")
        .groupBy($"t1", $"t2").agg(count(lit(1)).as("f12"))
      val uni = toks.select(explode($"a").as("t"))
        .groupBy($"t").agg(count(lit(1)).as("f"))
      val nBi = bi.agg(sum($"f12").as("n_bi"))
      val nUni = uni.agg(sum($"f").as("n_uni"))
      bi.filter($"f12" >= 5)
        .join(uni.select($"t".as("t1"), $"f".as("f1")), Seq("t1"))
        .join(uni.select($"t".as("t2"), $"f".as("f2")), Seq("t2"))
        .crossJoin(broadcast(nBi)).crossJoin(broadcast(nUni))
        .select($"t1", $"t2", $"f12",
          (floor(log($"f12".cast("double") / $"n_bi".cast("double")) * 1e6 + 0.5).cast("long")
            - floor(log($"f1".cast("double") / $"n_uni".cast("double")) * 1e6 + 0.5).cast("long")
            - floor(log($"f2".cast("double") / $"n_uni".cast("double")) * 1e6 + 0.5).cast("long"))
            .as("pmi_micro"))
        .orderBy(desc("f12"), $"t1", $"t2")
        .limit(50)
    }, Some(s"""
      WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS a FROM documents
        WHERE len(string_split($normSql, ' ')) >= 2),
      bi AS (SELECT a[i] AS t1, a[i + 1] AS t2, CAST(count(*) AS BIGINT) AS f12
        FROM base, unnest(range(1, len(a))) AS t(i) GROUP BY 1, 2),
      uni AS (SELECT tok AS t, CAST(count(*) AS BIGINT) AS f
        FROM (SELECT unnest(a) AS tok FROM base) GROUP BY 1),
      nb AS (SELECT CAST(sum(f12) AS BIGINT) AS n_bi FROM bi),
      nu AS (SELECT CAST(sum(f) AS BIGINT) AS n_uni FROM uni)
      SELECT b.t1, b.t2, b.f12,
        CAST(floor(ln(CAST(b.f12 AS DOUBLE) / nb.n_bi) * 1e6 + 0.5) AS BIGINT)
          - CAST(floor(ln(CAST(u1.f AS DOUBLE) / nu.n_uni) * 1e6 + 0.5) AS BIGINT)
          - CAST(floor(ln(CAST(u2.f AS DOUBLE) / nu.n_uni) * 1e6 + 0.5) AS BIGINT) AS pmi_micro
      FROM bi b JOIN uni u1 ON b.t1 = u1.t JOIN uni u2 ON b.t2 = u2.t
      CROSS JOIN nb CROSS JOIN nu
      WHERE b.f12 >= 5
      ORDER BY b.f12 DESC, b.t1, b.t2 LIMIT 50""")),

    // ----- semantic diversity cap (per-bucket quota) ---------------------
    // The diversity complement of q186's near-rep dropping: cap every
    // LSH band bucket (the q183 b0 key — a semantic neighborhood proxy)
    // at 20 members, keeping a deterministic md5-ordered quota. The
    // kept set is a `filter(rn <= 20)` DIRECTLY above the window, so it
    // compiles to WindowGroupLimit: each map task pre-prunes every
    // bucket to its top-20 before the shuffle, and at 100 TB the
    // overflow of a boilerplate-heavy neighborhood never leaves the map
    // side. The per-source totals ride a SEPARATE plain aggregate (no
    // window — partial map-side combine to |sources| rows); a capped
    // count folded into the window branch would force every row through
    // the bk shuffle and defeat the group limit. Plan pinned in
    // Round7fSpec (WindowGroupLimit present + totals branch window-free).
    ("q197_diversity_cap", (s: SparkSession, dir: String) => {
      import s.implicits._
      val keyed = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"source",
          graft.functions.WordShingleHash32(TA.normText($"text"), 3).as("hs"))
        .select($"doc_id", $"source",
          md5(concat_ws("|", lit("b0"),
            Dedup.minhashInt($"hs", 0).cast("string"),
            Dedup.minhashInt($"hs", 1).cast("string"))).as("bk"),
          conv(substring(md5(concat(lit("c|"), $"doc_id".cast("string"))), 1, 8), 16, 10)
            .cast("long").as("u"))
      val totals = keyed.groupBy($"source").agg(count(lit(1)).as("n_docs"))
      val kept = keyed
        .withColumn("rn", row_number().over(
          Window.partitionBy($"bk").orderBy($"u", $"doc_id")))
        .filter($"rn" <= 20) // WindowGroupLimit: ≤20 rows/bucket leave each map task
        .groupBy($"source")
        .agg(count(lit(1)).as("n_kept"), sum($"doc_id").as("kept_idsum"))
      totals.join(kept, Seq("source"), "left")
        .na.fill(0L, Seq("n_kept", "kept_idsum"))
        .select($"source", $"n_docs", $"n_kept",
          ($"n_docs" - $"n_kept").as("n_capped_out"), $"kept_idsum")
        .orderBy($"source")
    }, Some(s"""
      WITH d AS (SELECT doc_id, source, string_split($normSql, ' ') AS arr FROM documents),
      sh AS (SELECT doc_id, source,
          list_distinct(list_transform(range(1, greatest(len(arr) - 2, 1) + 1),
            i -> array_to_string(arr[i:i+2], ' '))) AS shl FROM d),
      hst AS (SELECT doc_id, source,
          list_distinct(list_transform(shl, g -> ('0x' || substr(md5(g), 1, 8))::BIGINT)) AS hs
        FROM sh),
      keyed AS (SELECT doc_id, source,
          md5('b0|' || CAST(${Dedup.minhashSql(0)} AS VARCHAR) || '|'
            || CAST(${Dedup.minhashSql(1)} AS VARCHAR)) AS bk,
          ('0x' || substr(md5('c|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS u
        FROM hst),
      r AS (SELECT doc_id, source,
          row_number() OVER (PARTITION BY bk ORDER BY u, doc_id) AS rn
        FROM keyed)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN rn <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(count(*) - sum(CASE WHEN rn <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_capped_out,
        CAST(sum(CASE WHEN rn <= 20 THEN doc_id ELSE 0 END) AS BIGINT) AS kept_idsum
      FROM r GROUP BY source ORDER BY source"""))
  )
}
