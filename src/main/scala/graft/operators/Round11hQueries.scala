package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.GridCumulative

/** Round-11 batch 8: dataset-construction and forensic-audit
  * operators — exact-count stratified splitting (the eval-set builder
  * Bernoulli gates can't give you), cross-source quantile
  * normalization (batch-effect alignment on the value grid), and a
  * Benford first-digit audit (synthetic/corrupted-data forensics on
  * money columns).
  *
  * Float discipline: q392/q393 never leave BIGINT; q394 clears the
  * Benford proportions to exact ppm via micro-ln integers (the q235
  * rule) before its one double chi-square chain in digit order.
  */
object Round11hQueries {

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- exact-count stratified split ------------------------------------
    // Hash-Bernoulli gates (q107's shape) give BINOMIAL stratum counts
    // — an eval set built that way is ±√n per stratum, which breaks
    // small strata. This is the exact-count form: within each
    // (source, lang) stratum, rank by an md5 draw (tie-broken by
    // doc_id) and take exactly (7·n_s) div 10 for train. The ranking
    // window partitions by stratum, so parallelism = stratum count
    // and per-task state = one stratum. Membership itself is
    // witnessed by the doc_id sums per side — identical ranks on both
    // engines or the sums split differently.
    ("q392_stratified_split", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.t(s, dir, "documents")
        .select($"source", $"lang", $"doc_id",
          md5(concat($"doc_id".cast("string"), lit("_sp"))).as("h"))
      val w = Window.partitionBy($"source", $"lang").orderBy($"h", $"doc_id")
      val ranked = d.withColumn("rn", row_number().over(w))
      val counts = ranked.groupBy($"source", $"lang").agg(count(lit(1)).as("n"))
      ranked.join(broadcast(counts), Seq("source", "lang"))
        .withColumn("train", $"rn" <= expr("7 * n div 10"))
        .groupBy($"source", $"lang", $"n")
        .agg(sum($"train".cast("long")).as("n_train"),
          sum((!$"train").cast("long")).as("n_test"),
          sum(when($"train", $"doc_id").otherwise(0L)).as("sum_train_ids"),
          sum(when(!$"train", $"doc_id").otherwise(0L)).as("sum_test_ids"))
        .orderBy($"source", $"lang")
    }, Some("""
      WITH d AS (SELECT source, lang, doc_id,
          md5(CAST(doc_id AS VARCHAR) || '_sp') AS h
        FROM documents),
      r AS (SELECT source, lang, doc_id,
          row_number() OVER (PARTITION BY source, lang ORDER BY h, doc_id) AS rn,
          CAST(count(*) OVER (PARTITION BY source, lang) AS BIGINT) AS n
        FROM d),
      t AS (SELECT source, lang, n, doc_id, rn <= 7 * n // 10 AS train FROM r)
      SELECT source, lang, n,
        CAST(sum(CASE WHEN train THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        CAST(sum(CASE WHEN train THEN 0 ELSE 1 END) AS BIGINT) AS n_test,
        CAST(sum(CASE WHEN train THEN doc_id ELSE 0 END) AS BIGINT) AS sum_train_ids,
        CAST(sum(CASE WHEN train THEN 0 ELSE doc_id END) AS BIGINT) AS sum_test_ids
      FROM t GROUP BY 1, 2, 3 ORDER BY source, lang""")),

    // ----- cross-source quantile normalization -----------------------------
    // Per-source length distributions differ systematically (crawl vs
    // curated); quantile normalization maps each source's distribution
    // onto the POOLED one so downstream length gates act uniformly —
    // the batch-effect correction standard in bioinformatics, here on
    // the (source × n_chars) grid so no per-document sort ever runs.
    // Exact integer algebra: within-source cumulative counts off the
    // per-source grid (window partitioned by source — one stratum per
    // task), pooled cumulative via the two-level GridCumulative
    // helper, target position p = (cum_s·N) div n_s, and the pooled
    // order statistic at p found by a broadcast INTERVAL JOIN against
    // the bounded pooled grid (row v covers positions (cum−c, cum],
    // so each p hits exactly one row). The join is the codegen'd
    // BroadcastNestedLoopJoin over grid × grid — measured 10× faster
    // than the array-lambda lookup it replaced, because higher-order
    // filter() runs interpreted per element while the join condition
    // compiles. Reports per source the total absolute displacement
    // and the distinct target count — BIGINT end to end.
    ("q393_quantile_normalization", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.t(s, dir, "documents")
        .select($"source", $"n_chars".cast("long").as("v"))
      val gridS = docs.groupBy($"source", $"v").agg(count(lit(1)).as("c"))
        .localCheckpoint() // reused: per-source cum + pooled grid
      val wS = Window.partitionBy($"source").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cumS = gridS.withColumn("cum_s", sum($"c").over(wS))
      val nS = gridS.groupBy($"source").agg(sum($"c").as("n_s"))
      val pooledGrid = gridS.groupBy($"v").agg(sum($"c").as("c"))
      val pooled = GridCumulative.withRunningTotal(
        pooledGrid, "v", "c", "cum_p")
      val lookup = pooled.select($"v".as("t"),
        ($"cum_p" - $"c").as("lo"), $"cum_p".as("hi"))
      val tot = pooledGrid.agg(sum($"c").as("n"))
      val mapped = cumS
        .join(broadcast(nS), Seq("source"))
        .crossJoin(broadcast(tot))
        // DECIMAL(38,0) widen: cum_s·N is past int64 once the corpus
        // crosses ~3e9 docs
        .withColumn("p", expr(
          "greatest(1L, (CAST(cum_s AS DECIMAL(38,0)) * n) div n_s)"))
        .join(broadcast(lookup), $"p" > $"lo" && $"p" <= $"hi")
      mapped.groupBy($"source")
        .agg(sum($"c").as("n_docs"),
          sum(abs($"t" - $"v") * $"c").as("displacement"),
          countDistinct($"t").as("n_target_values"))
        .orderBy($"source")
    }, Some("""
      WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents),
      gs AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2),
      cs AS (SELECT source, v, c,
          CAST(sum(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum_s
        FROM gs),
      ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM gs GROUP BY 1),
      pg AS (SELECT v, CAST(sum(c) AS BIGINT) AS c FROM gs GROUP BY 1),
      pc AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum_p FROM pg),
      lk AS (SELECT v AS t, cum_p - c AS lo, cum_p AS hi FROM pc),
      tt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pg),
      m AS (SELECT cs.source, cs.v, cs.c,
          greatest(1, CAST(cs.cum_s AS HUGEINT) * tt.n // ns.n_s) AS p
        FROM cs JOIN ns ON cs.source = ns.source, tt),
      m2 AS (SELECT m.source, m.v, m.c, lk.t
        FROM m JOIN lk ON m.p > lk.lo AND m.p <= lk.hi)
      SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
        CAST(sum(abs(t - v) * c) AS BIGINT) AS displacement,
        CAST(count(DISTINCT t) AS BIGINT) AS n_target_values
      FROM m2 GROUP BY 1 ORDER BY source""")),

    // ----- Benford first-digit audit ---------------------------------------
    // Organic money amounts follow Benford's law, P(d) = log10(1+1/d);
    // fabricated or generator-degenerate columns don't — the classic
    // forensic screen, run here over order totals in exact cents. The
    // proportions clear to exact ppm integers via micro-ln (p_ppm =
    // (lnm(d+1) − lnm(d))·10⁶ div lnm(10), the q235 rule, so the two
    // engines' last-ulp ln disagreement cannot reach the output), the
    // expected counts to exact milli-units, and the chi-square is one
    // double chain over the 9-row digit spine in digit order. Digit
    // extraction is the first character of the cent integer's decimal
    // rendering — no float log anywhere near the data.
    ("q394_benford_audit", (s: SparkSession, dir: String) => {
      import s.implicits._
      val cents = Tables.t(s, dir, "orders")
        .select(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"))
        .filter($"cents" > 0)
      val obs = cents
        .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)").as("d"))
        .groupBy($"d").agg(count(lit(1)).as("n_d"))
      val spine = s.range(1, 10).select($"id".as("d"))
      val tot = cents.agg(count(lit(1)).as("n"))
      val dense = broadcast(spine).join(obs, Seq("d"), "left")
        .withColumn("n_d", coalesce($"n_d", lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("p_ppm", expr(
          """(CAST(floor(ln(CAST(d + 1 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
            - CAST(floor(ln(CAST(d AS DOUBLE)) * 1000000 + 0.5) AS BIGINT))
            * 1000000 div CAST(floor(ln(10.0) * 1000000 + 0.5) AS BIGINT)"""))
        .withColumn("e_milli", expr("n * p_ppm div 1000"))
        .withColumn("term", expr(
          """CAST(1000 * n_d - e_milli AS DOUBLE) * CAST(1000 * n_d - e_milli AS DOUBLE)
             / (1000.0 * CAST(e_milli AS DOUBLE))"""))
      val chi2 = dense.agg(
        expr("""aggregate(array_sort(collect_list(struct(d, term))),
            CAST(0.0 AS DOUBLE), (acc, t) -> acc + t.term)""").as("chi2"))
      dense.select($"d", $"n_d", $"p_ppm", $"e_milli")
        .crossJoin(broadcast(chi2))
        .orderBy($"d")
    }, Some("""
      WITH c0 AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM orders),
      c1 AS (SELECT cents FROM c0 WHERE cents > 0),
      obs AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS d,
          CAST(count(*) AS BIGINT) AS n_d
        FROM c1 GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c1),
      dense AS (SELECT s.d, CAST(coalesce(obs.n_d, 0) AS BIGINT) AS n_d, tot.n,
          (CAST(floor(ln(CAST(s.d + 1 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           - CAST(floor(ln(CAST(s.d AS DOUBLE)) * 1000000 + 0.5) AS BIGINT))
           * 1000000 // CAST(floor(ln(10.0) * 1000000 + 0.5) AS BIGINT) AS p_ppm
        FROM (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT) AS d) s
        LEFT JOIN obs ON obs.d = s.d, tot),
      d2 AS (SELECT d, n_d, p_ppm, n * p_ppm // 1000 AS e_milli FROM dense),
      d3 AS (SELECT d, n_d, p_ppm, e_milli,
          CAST(1000 * n_d - e_milli AS DOUBLE) * CAST(1000 * n_d - e_milli AS DOUBLE)
            / (1000.0 * CAST(e_milli AS DOUBLE)) AS term
        FROM d2),
      ch AS (SELECT list_reduce(list(term ORDER BY d), (a, b) -> a + b) AS chi2 FROM d3)
      SELECT d, n_d, p_ppm, e_milli, chi2 FROM d3, ch ORDER BY d"""))
  )
}
