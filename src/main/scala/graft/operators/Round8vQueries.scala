package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Similarity, TextAnalysis => TA}

/** Round-8 batch 22: intrinsic-dimension estimation for embeddings
  * (TwoNN), serpentine shard balancing, fractional-knapsack budget
  * selection with an optimality certificate, and a predicate-ordering
  * advisor — representation diagnostics plus three planning operators.
  *
  * House rules as elsewhere: integer arithmetic at every gate (squared
  * L2 distances are EXACT integers on the quantized vectors — the q101
  * rule), micro-ln for transcendentals, double ratios only as sort
  * keys or single-row scalars (the q250 rationale). Identical aliases
  * both sides, total ORDER BY.
  */
object Round8vQueries {

  private val normSql = TA.normTextSql
  private val prepSql = Similarity.prepareSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- TwoNN intrinsic dimension --------------------------------------
    // Facco et al.'s TwoNN: the intrinsic dimension of an embedding
    // cloud from nothing but each point's two nearest-neighbor
    // distances — ID = 2n / Σ ln(d₂²/d₁²), no density model, no
    // binning. The ratio d₂²/d₁² is scale-free, so the EXACT integer
    // squared distances (n2_q + n2_c − 2·dot on quantized vectors)
    // feed micro-ln directly. Probes are a 1-in-20 md5-stable sample;
    // candidates broadcast-scan as in q24 (the recall-oracle shape);
    // top-2 per probe is a WindowGroupLimit rank. Duplicate-distance
    // probes (d₁ = 0) are excluded, as the estimator requires. ID well
    // below the ambient dimension is the "representation collapse" /
    // compressibility read that decides MRL truncation (q167) and PQ
    // budgets (q208). One candidate scan per probe set — |Q|·N like
    // q24, the honest exact baseline.
    ("q279_twonn_intrinsic_dim", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      val q = prepared.filter($"id" % 20 === 0)
        .select($"id".as("q_id"), $"qvec".as("q_vec"), $"n2".as("q_n2"))
      val c = prepared
        .select($"id".as("c_id"), $"qvec".as("c_vec"), $"n2".as("c_n2"))
      val d2 = c.crossJoin(broadcast(q))
        .filter($"q_id" =!= $"c_id")
        .select($"q_id", $"c_id",
          ($"q_n2" + $"c_n2" - lit(2) * Similarity.dot($"q_vec", $"c_vec"))
            .as("dist2"))
      val top2 = d2
        .withColumn("rnk", row_number().over(
          Window.partitionBy($"q_id").orderBy($"dist2", $"c_id")))
        .filter($"rnk" <= 2)
      val ratios = top2.groupBy($"q_id")
        .agg(max(when($"rnk" === 1, $"dist2")).as("d1"),
          max(when($"rnk" === 2, $"dist2")).as("d2"))
        .filter($"d1" > 0)
        .withColumn("ln_micro",
          floor(log($"d2".cast("double") / $"d1".cast("double")) * 1e6 + 0.5)
            .cast("long"))
      ratios.agg(count(lit(1)).as("n_probes"), sum($"ln_micro").as("sum_ln_micro"))
        .select($"n_probes", $"sum_ln_micro",
          // nullif: a degenerate probe set (all ties, Σln = 0) yields no
          // estimate rather than an engine-divergent division by zero
          expr("2000000 * n_probes * 1000 div nullif(sum_ln_micro, 0)")
            .as("id_milli"))
    }, Some(s"""
      WITH $prepSql,
      q AS (SELECT vec_id AS q_id, qvec AS q_vec, n2 AS q_n2 FROM n
        WHERE vec_id % 20 = 0),
      d2 AS (SELECT q.q_id, c.vec_id AS c_id,
          CAST(q.q_n2 + c.n2 - 2 * list_dot_product(q.q_vec, c.qvec) AS BIGINT)
            AS dist2
        FROM n c, q WHERE q.q_id <> c.vec_id),
      top2 AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY q_id
          ORDER BY dist2, c_id) AS rnk FROM d2) WHERE rnk <= 2),
      ratios AS (SELECT q_id,
          max(CASE WHEN rnk = 1 THEN dist2 END) AS d1,
          max(CASE WHEN rnk = 2 THEN dist2 END) AS d2
        FROM top2 GROUP BY 1),
      lns AS (SELECT q_id,
          CAST(floor(ln(CAST(d2 AS DOUBLE) / CAST(d1 AS DOUBLE)) * 1e6 + 0.5)
            AS BIGINT) AS ln_micro
        FROM ratios WHERE d1 > 0)
      SELECT CAST(count(*) AS BIGINT) AS n_probes,
        CAST(sum(ln_micro) AS BIGINT) AS sum_ln_micro,
        CAST(2000000 * count(*) * 1000 // nullif(sum(ln_micro), 0) AS BIGINT)
          AS id_milli
      FROM lns""")),

    // ----- serpentine shard balancing -------------------------------------
    // The shard planner's closed-form workhorse: rank sources by token
    // mass and deal them to 8 shards in serpentine (boustrophedon)
    // order — pass 0 left-to-right, pass 1 right-to-left — which
    // pairs heavy items with light ones and needs NO sequential
    // greedy loop (pure rank arithmetic, unlike LPT). Reported against
    // naive round-robin on the same ranking: per-shard loads for both,
    // plus both balance ratios (max/ideal, micro) riding along as
    // cross-joined scalars. At 100 TB the per-source mass aggregate is
    // the only corpus pass; the dealing is |sources|-bounded
    // arithmetic — this is exactly how training-shard composers
    // balance token mass without a solver.
    ("q280_serpentine_sharding", (s: SparkSession, dir: String) => {
      import s.implicits._
      val mass = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", TA.normText($"text").as("nt"))
        .select($"source",
          when($"nt" === "", lit(0L))
            .otherwise(size(split($"nt", " ")).cast("long")).as("len"))
        .groupBy($"source").agg(sum($"len").as("tokens"))
      val ranked = mass.withColumn("rnk",
          (row_number().over(Window.orderBy(desc("tokens"), $"source")) - 1)
            .cast("long"))
        .withColumn("shard_serp", expr(
          "CASE WHEN (rnk div 8) % 2 = 0 THEN rnk % 8 ELSE 7 - rnk % 8 END"))
        .withColumn("shard_rr", expr("rnk % 8"))
      val serp = ranked.groupBy($"shard_serp".as("shard"))
        .agg(count(lit(1)).as("n_src_serp"), sum($"tokens").as("tokens_serp"))
      val rr = ranked.groupBy($"shard_rr".as("shard"))
        .agg(sum($"tokens").as("tokens_rr"))
      val tot = ranked.agg(sum($"tokens").as("tt"))
      val bal = serp.join(rr, Seq("shard")).crossJoin(broadcast(tot))
      val summary = bal.agg(
        max($"tokens_serp").as("mx_serp"), max($"tokens_rr").as("mx_rr"),
        max($"tt").as("tt2"))
      bal.crossJoin(broadcast(summary))
        .select($"shard", $"n_src_serp", $"tokens_serp", $"tokens_rr",
          expr("1000000 * mx_serp div (tt2 div 8)").as("balance_serp_micro"),
          expr("1000000 * mx_rr div (tt2 div 8)").as("balance_rr_micro"))
        .orderBy($"shard")
    }, Some(s"""
      WITH lens AS (SELECT source,
          CASE WHEN $normSql = '' THEN 0
            ELSE CAST(len(string_split($normSql, ' ')) AS BIGINT) END AS len
        FROM documents),
      mass AS (SELECT source, CAST(sum(len) AS BIGINT) AS tokens
        FROM lens GROUP BY 1),
      ranked AS (SELECT *,
          CAST(row_number() OVER (ORDER BY tokens DESC, source) - 1 AS BIGINT)
            AS rnk FROM mass),
      asg AS (SELECT *,
          CASE WHEN (rnk // 8) % 2 = 0 THEN rnk % 8 ELSE 7 - rnk % 8 END
            AS shard_serp,
          rnk % 8 AS shard_rr FROM ranked),
      serp AS (SELECT shard_serp AS shard, CAST(count(*) AS BIGINT) AS n_src_serp,
          CAST(sum(tokens) AS BIGINT) AS tokens_serp FROM asg GROUP BY 1),
      rr AS (SELECT shard_rr AS shard, CAST(sum(tokens) AS BIGINT) AS tokens_rr
        FROM asg GROUP BY 1),
      tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt FROM asg),
      bal AS (SELECT s.shard, s.n_src_serp, s.tokens_serp, r.tokens_rr, t.tt
        FROM serp s JOIN rr r USING (shard) CROSS JOIN tot t),
      summ AS (SELECT max(tokens_serp) AS mx_serp, max(tokens_rr) AS mx_rr,
          max(tt) AS tt2 FROM bal)
      SELECT b.shard, b.n_src_serp, b.tokens_serp, b.tokens_rr,
        1000000 * s.mx_serp // (s.tt2 // 8) AS balance_serp_micro,
        1000000 * s.mx_rr // (s.tt2 // 8) AS balance_rr_micro
      FROM bal b CROSS JOIN summ s ORDER BY b.shard""")),

    // ----- fractional-knapsack budget selection ---------------------------
    // "Spend a 40%-of-corpus token budget where the good documents
    // are": value = count of quality-passing docs per source, cost =
    // tokens; greedy by value density is EXACTLY optimal for the
    // fractional relaxation, so the output doubles as an upper-bound
    // certificate for any integral (whole-source) selection. Density
    // order is the double-ratio sort key (q250 rationale); take-amounts
    // clear to integer micro via one cumulative window over the
    // |sources| grid. Distinct from q250's water-filling: different
    // objective (maximize value, not match temperature weights), same
    // one-corpus-pass + grid-solver scale shape.
    ("q281_knapsack_budget", (s: SparkSession, dir: String) => {
      import s.implicits._
      val src = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", $"n_chars", TA.normText($"text").as("nt"))
        .select($"source", $"n_chars",
          when($"nt" === "", lit(0L))
            .otherwise(size(split($"nt", " ")).cast("long")).as("len"))
        .groupBy($"source").agg(sum($"len").as("cost"),
          sum(when($"n_chars" >= 250, 1L).otherwise(0L)).as("value"))
        .filter($"cost" > 0)
      val tot = src.agg(sum($"cost").as("tc"))
      val g = src.crossJoin(broadcast(tot))
        .withColumn("budget", expr("2 * tc div 5"))
        .withColumn("dens", $"value".cast("double") / $"cost".cast("double"))
      val ord = Window.orderBy(desc("dens"), $"source")
      val cum = g
        .withColumn("prevcost", coalesce(sum($"cost")
          .over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("take_micro", expr("""
          CASE WHEN prevcost + cost <= budget THEN 1000000
               WHEN prevcost >= budget THEN 0
               ELSE 1000000 * (budget - prevcost) div cost END"""))
        .withColumn("value_taken_micro", expr("value * take_micro"))
        .withColumn("cost_taken", expr("cost * take_micro div 1000000"))
      cum.select($"source", $"cost", $"value", $"take_micro",
          $"cost_taken", $"value_taken_micro")
        .orderBy($"source")
    }, Some(s"""
      WITH lens AS (SELECT source, n_chars,
          CASE WHEN $normSql = '' THEN 0
            ELSE CAST(len(string_split($normSql, ' ')) AS BIGINT) END AS len
        FROM documents),
      src AS (SELECT source, CAST(sum(len) AS BIGINT) AS cost,
          CAST(sum(CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END) AS BIGINT) AS value
        FROM lens GROUP BY 1 HAVING sum(len) > 0),
      tot AS (SELECT CAST(sum(cost) AS BIGINT) AS tc FROM src),
      g AS (SELECT src.*, t.tc, 2 * t.tc // 5 AS budget,
          CAST(value AS DOUBLE) / CAST(cost AS DOUBLE) AS dens
        FROM src CROSS JOIN tot t),
      cum AS (SELECT *, coalesce(sum(cost) OVER (ORDER BY dens DESC, source
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prevcost
        FROM g),
      takes AS (SELECT *,
          CASE WHEN prevcost + cost <= budget THEN 1000000
               WHEN prevcost >= budget THEN 0
               ELSE 1000000 * (budget - prevcost) // cost END AS take_micro
        FROM cum)
      SELECT source, cost, value, CAST(take_micro AS BIGINT) AS take_micro,
        CAST(cost * take_micro // 1000000 AS BIGINT) AS cost_taken,
        CAST(value * take_micro AS BIGINT) AS value_taken_micro
      FROM takes ORDER BY source""")),

    // ----- predicate-ordering advisor -------------------------------------
    // The cost-based-optimizer move every hand-written cleaning
    // pipeline forgets: with independent filters of equal per-row
    // cost, the expected rows INSPECTED by a filter chain is
    // n·(1 + s₁ + s₁s₂ + s₁s₂s₃) under order π — minimized by running
    // the most selective filter first. Four realistic document gates
    // (length, language, token count, source screen) are measured in
    // ONE conditional-aggregation scan; both chain costs come from the
    // pivoted one-row grid with micro-scaled cumulative products. The
    // advisor's saving (naive-vs-optimal micro ratio) is the number
    // that justifies reordering a 100 TB cleaning pass — where each
    // avoided inspection is real money.
    ("q282_filter_ordering", (s: SparkSession, dir: String) => {
      import s.implicits._
      val flags = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"n_chars", $"lang", $"source", TA.normText($"text").as("nt"))
        .select(
          ($"n_chars" >= 150).cast("long").as("f_len"),
          ($"lang" === "en").cast("long").as("f_lang"),
          (when($"nt" === "", lit(0L))
            .otherwise(size(split($"nt", " ")).cast("long")) >= 30)
            .cast("long").as("f_tok"),
          ($"source" >= "src1").cast("long").as("f_src"))
      val sel = flags.agg(count(lit(1)).as("n"),
        expr("1000000 * sum(f_len) div count(1)").as("s_len"),
        expr("1000000 * sum(f_lang) div count(1)").as("s_lang"),
        expr("1000000 * sum(f_tok) div count(1)").as("s_tok"),
        expr("1000000 * sum(f_src) div count(1)").as("s_src"))
      val grid = sel.select($"n", explode(map(
          lit("f1_len"), $"s_len", lit("f2_lang"), $"s_lang",
          lit("f3_tok"), $"s_tok", lit("f4_src"), $"s_src"))
          .as(Seq("filter", "sel_micro")))
      val ranked = grid.withColumn("rn_opt",
        row_number().over(Window.orderBy($"sel_micro", $"filter")).cast("long"))
      def chainCost(r1: String, r2: String, r3: String) = // micro, per input row
        s"""1000000 + $r1 + $r1 * $r2 div 1000000
           + ($r1 * $r2 div 1000000) * $r3 div 1000000"""
      val pivot = ranked.agg(
        max(when($"rn_opt" === 1, $"sel_micro")).as("o1"),
        max(when($"rn_opt" === 2, $"sel_micro")).as("o2"),
        max(when($"rn_opt" === 3, $"sel_micro")).as("o3"),
        max(when($"filter" === "f1_len", $"sel_micro")).as("n1"),
        max(when($"filter" === "f2_lang", $"sel_micro")).as("n2"),
        max(when($"filter" === "f3_tok", $"sel_micro")).as("n3"))
        .select(expr(chainCost("o1", "o2", "o3")).as("cost_opt_micro"),
          expr(chainCost("n1", "n2", "n3")).as("cost_naive_micro"))
      ranked.crossJoin(broadcast(pivot))
        .select($"filter", $"sel_micro", $"rn_opt",
          $"cost_naive_micro", $"cost_opt_micro",
          expr("1000000 * cost_naive_micro div cost_opt_micro")
            .as("saving_micro"))
        .orderBy($"filter")
    }, Some(s"""
      WITH flags AS (SELECT
          CAST(CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS BIGINT) AS f_len,
          CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS f_lang,
          CAST(CASE WHEN (CASE WHEN $normSql = '' THEN 0
            ELSE len(string_split($normSql, ' ')) END) >= 30
            THEN 1 ELSE 0 END AS BIGINT) AS f_tok,
          CAST(CASE WHEN source >= 'src1' THEN 1 ELSE 0 END AS BIGINT) AS f_src
        FROM documents),
      sel AS (SELECT CAST(count(*) AS BIGINT) AS n,
          1000000 * sum(f_len) // count(*) AS s_len,
          1000000 * sum(f_lang) // count(*) AS s_lang,
          1000000 * sum(f_tok) // count(*) AS s_tok,
          1000000 * sum(f_src) // count(*) AS s_src
        FROM flags),
      grid AS (
        SELECT n, 'f1_len' AS filter, CAST(s_len AS BIGINT) AS sel_micro FROM sel
        UNION ALL SELECT n, 'f2_lang', CAST(s_lang AS BIGINT) FROM sel
        UNION ALL SELECT n, 'f3_tok', CAST(s_tok AS BIGINT) FROM sel
        UNION ALL SELECT n, 'f4_src', CAST(s_src AS BIGINT) FROM sel),
      ranked AS (SELECT *, CAST(row_number() OVER (ORDER BY sel_micro, filter)
          AS BIGINT) AS rn_opt FROM grid),
      pv AS (SELECT
          max(CASE WHEN rn_opt = 1 THEN sel_micro END) AS o1,
          max(CASE WHEN rn_opt = 2 THEN sel_micro END) AS o2,
          max(CASE WHEN rn_opt = 3 THEN sel_micro END) AS o3,
          max(CASE WHEN filter = 'f1_len' THEN sel_micro END) AS n1,
          max(CASE WHEN filter = 'f2_lang' THEN sel_micro END) AS n2,
          max(CASE WHEN filter = 'f3_tok' THEN sel_micro END) AS n3
        FROM ranked),
      costs AS (SELECT
          1000000 + o1 + o1 * o2 // 1000000
            + (o1 * o2 // 1000000) * o3 // 1000000 AS cost_opt_micro,
          1000000 + n1 + n1 * n2 // 1000000
            + (n1 * n2 // 1000000) * n3 // 1000000 AS cost_naive_micro
        FROM pv)
      SELECT r.filter, r.sel_micro, r.rn_opt,
        CAST(c.cost_naive_micro AS BIGINT) AS cost_naive_micro,
        CAST(c.cost_opt_micro AS BIGINT) AS cost_opt_micro,
        1000000 * c.cost_naive_micro // c.cost_opt_micro AS saving_micro
      FROM ranked r CROSS JOIN costs c ORDER BY r.filter"""))
  )
}
