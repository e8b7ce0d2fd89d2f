package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 23: differential-privacy budget accounting, Neyman
  * audit allocation, sample-size planning, and successive-halving
  * config selection — the planning/accounting layer a data platform
  * runs BEFORE spending compute or privacy budget.
  *
  * House rules as elsewhere: integer arithmetic at every gate;
  * irrational weights (√ of exact integers) floor to integers
  * map-side; analytic constants (z², ln 2/δ, Laplace scales) are
  * Scala-precomputed micro literals embedded identically in both
  * engines. Identical aliases both sides, total ORDER BY.
  */
object Round8wQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  /** Hoeffding audit sizes n = ln(2/δ)/(2e²) at δ = 5%, precomputed per
    * target half-width e — data-independent, shared by both engines. */
  private val HoeffdingN: Map[Long, Long] = {
    val ln2d = math.log(2.0 / 0.05)
    Seq(10000L, 20000L, 50000L).map { em =>
      val e = em / 1e6
      em -> math.ceil(ln2d / (2 * e * e)).toLong
    }.toMap
  }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- differential-privacy budget accounting -------------------------
    // Before releasing per-source document counts under ε-DP, the
    // accounting table every privacy review asks for: k queries of
    // sensitivity 1 under basic composition each get ε/k, so Laplace
    // scale b = k/ε — and the question is WHICH releases survive their
    // own noise. Per (ε, source): the true count, the scale, relative
    // expected error ⌊1e6·b/count⌋, and a usable flag (error < 10%).
    // No noise is drawn (that would break determinism AND the point —
    // accounting happens before release); ε⁻¹ ∈ {10, 1} are integer
    // literals. Completes the privacy family: q206/q219/q230 measure
    // re-identification risk, this prices the mitigation. One count
    // aggregate; the grid is |ε|·|sources|.
    ("q283_dp_budget_accounting", (s: SparkSession, dir: String) => {
      import s.implicits._
      val counts = Tables.t(s, dir, "documents")
        .groupBy($"source").agg(count(lit(1)).as("n_docs"))
      val k = counts.agg(count(lit(1)).as("k"))
      val eps = Seq(("eps_0_1", 10L), ("eps_1_0", 1L))
        .toDF("eps_label", "eps_inv")
      counts.crossJoin(broadcast(k)).crossJoin(broadcast(eps))
        .withColumn("b_scale", $"k" * $"eps_inv")
        .select($"eps_label", $"source", $"n_docs", $"b_scale",
          expr("1000000 * b_scale div n_docs").as("rel_err_micro"))
        .withColumn("usable",
          ($"rel_err_micro" < 100000L).cast("long"))
        .orderBy($"eps_label", $"source")
    }, Some("""
      WITH counts AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1),
      k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM counts),
      eps(eps_label, eps_inv) AS (VALUES ('eps_0_1', CAST(10 AS BIGINT)),
        ('eps_1_0', 1)),
      g AS (SELECT e.eps_label, c.source, c.n_docs, k.k * e.eps_inv AS b_scale
        FROM counts c CROSS JOIN k CROSS JOIN eps e)
      SELECT eps_label, source, n_docs, CAST(b_scale AS BIGINT) AS b_scale,
        1000000 * b_scale // n_docs AS rel_err_micro,
        CAST(CASE WHEN 1000000 * b_scale // n_docs < 100000 THEN 1 ELSE 0 END
          AS BIGINT) AS usable
      FROM g ORDER BY eps_label, source""")),

    // ----- Neyman audit allocation ----------------------------------------
    // Allocating a 1000-document audit across sources: proportional
    // allocation ignores within-source variance, Neyman allocation
    // n_h ∝ N_h·σ_h minimizes the stratified estimator's variance. The
    // weight N_h·σ_h = √(N_h·Σx² − (Σx)²) is the √ of an EXACT integer
    // — so it floors to an integer map-side, no distributed double
    // sums, and the design-variance comparison Σ w²/n_h (where w² is
    // again exact) certifies Neyman ≤ proportional on this corpus —
    // the q220 design-effect answer turned into an actual allocation.
    // One moment-aggregate per source; the solver is grid-sized.
    ("q284_neyman_allocation", (s: SparkSession, dir: String) => {
      import s.implicits._
      val m = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", TA.normText($"text").as("nt"))
        .select($"source",
          when($"nt" === "", lit(0L))
            .otherwise(size(split($"nt", " ")).cast("long")).as("x"))
        .groupBy($"source").agg(count(lit(1)).as("nh"), sum($"x").as("sx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sx2"))
        .withColumn("w2", expr("CAST(nh AS DECIMAL(38,0)) * sx2 - CAST(sx AS DECIMAL(38,0)) * sx"))
        .withColumn("w", floor(sqrt($"w2".cast("double")) + lit(0.5)).cast("long"))
      val tot = m.agg(sum($"w").as("tw"), sum($"nh").as("tn"))
      val alloc = m.crossJoin(broadcast(tot))
        .withColumn("n_neyman", expr("greatest(1000 * w div tw, 1)"))
        .withColumn("n_prop", expr("greatest(1000 * nh div tn, 1)"))
      val vars = alloc.agg(
        sum(expr("w2 div n_neyman")).cast("long").as("var_neyman_scaled"),
        sum(expr("w2 div n_prop")).cast("long").as("var_prop_scaled"))
      alloc.crossJoin(broadcast(vars))
        .select($"source", $"nh", $"w", $"n_neyman", $"n_prop",
          $"var_neyman_scaled", $"var_prop_scaled")
        .orderBy($"source")
    }, Some(s"""
      WITH lens AS (SELECT source,
          CASE WHEN $normSql = '' THEN 0
            ELSE CAST(len(string_split($normSql, ' ')) AS BIGINT) END AS x
        FROM documents),
      m AS (SELECT source, CAST(count(*) AS BIGINT) AS nh,
          CAST(sum(x) AS BIGINT) AS sx, sum(CAST(x AS HUGEINT) * x) AS sx2
        FROM lens GROUP BY 1),
      w AS (SELECT *, CAST(nh AS HUGEINT) * sx2 - CAST(sx AS HUGEINT) * sx AS w2
        FROM m),
      ww AS (SELECT *, CAST(floor(sqrt(CAST(w2 AS DOUBLE)) + 0.5) AS BIGINT) AS w
        FROM w),
      tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw, CAST(sum(nh) AS BIGINT) AS tn
        FROM ww),
      alloc AS (SELECT ww.*, t.tw, t.tn,
          greatest(1000 * ww.w // t.tw, 1) AS n_neyman,
          greatest(1000 * ww.nh // t.tn, 1) AS n_prop
        FROM ww CROSS JOIN tot t),
      vars AS (SELECT CAST(sum(w2 // n_neyman) AS BIGINT) AS var_neyman_scaled,
          CAST(sum(w2 // n_prop) AS BIGINT) AS var_prop_scaled FROM alloc)
      SELECT a.source, a.nh, a.w, CAST(a.n_neyman AS BIGINT) AS n_neyman,
        CAST(a.n_prop AS BIGINT) AS n_prop,
        v.var_neyman_scaled, v.var_prop_scaled
      FROM alloc a CROSS JOIN vars v ORDER BY a.source""")),

    // ----- audit sample-size planner --------------------------------------
    // "How many documents must we hand-audit to pin the duplicate rate
    // within ±e?" — answered two ways per target half-width: the
    // distribution-free Hoeffding bound (data-independent, Scala-
    // precomputed) and the normal-approximation size z²·p(1−p)/e²,
    // which uses the corpus-MEASURED exact-duplicate rate p (q20's
    // fingerprint) and is therefore much tighter when p is small. The
    // ceil clears to (num + den − 1) div den in 128-bit. When p̂ = 0
    // (this corpus has no exact dups) the normal size degenerates to 0,
    // so the rule-of-three floor n ≥ 3/e — the standard zero-
    // observation 95% bound — backstops it; n_required takes the max.
    // The fraction column is the real decision number: below ~1e4
    // micro, auditing is cheap — just do it. One fingerprint
    // aggregate; everything else is a 3-row grid.
    ("q285_audit_sample_planner", (s: SparkSession, dir: String) => {
      import s.implicits._
      val dup = Tables.spread(Tables.t(s, dir, "documents"))
        .select(TA.fingerprintMd5($"text").as("fp"))
        .groupBy($"fp").agg(count(lit(1)).as("c"))
        .agg(sum($"c").as("n"), sum($"c" - 1).as("dups"))
        .select($"n", expr("1000000 * dups div n").as("p_micro"))
      val es = HoeffdingN.toSeq.sortBy(_._1)
        .map { case (em, nh) => (em, nh) }.toDF("e_micro", "n_hoeffding")
      dup.crossJoin(broadcast(es))
        .withColumn("n_normal", expr(
          """CAST((CAST(3841459 AS DECIMAL(38,0)) * p_micro * (1000000 - p_micro)
             + CAST(1000000 AS DECIMAL(38,0)) * e_micro * e_micro - 1)
             div (CAST(1000000 AS DECIMAL(38,0)) * e_micro * e_micro) AS BIGINT)"""))
        .withColumn("n_rule3", expr("(3000000 + e_micro - 1) div e_micro"))
        .withColumn("n_required", greatest($"n_normal", $"n_rule3"))
        .select($"e_micro", $"p_micro", $"n_hoeffding", $"n_normal", $"n_rule3",
          $"n_required",
          expr("1000000 * n_required div n").as("corpus_fraction_micro"))
        .orderBy($"e_micro")
    }, Some {
      val rows = HoeffdingN.toSeq.sortBy(_._1)
        .map { case (em, nh) => s"($em, $nh)" }.mkString(", ")
      s"""
      WITH fp AS (SELECT md5($normSql) AS fp FROM documents),
      g AS (SELECT fp, CAST(count(*) AS BIGINT) AS c FROM fp GROUP BY 1),
      dup AS (SELECT CAST(sum(c) AS BIGINT) AS n,
          CAST(1000000 * sum(c - 1) // sum(c) AS BIGINT) AS p_micro FROM g),
      es(e_micro, n_hoeffding) AS (VALUES $rows),
      nn AS (SELECT e.e_micro, d.p_micro, e.n_hoeffding, d.n,
          CAST((CAST(3841459 AS HUGEINT) * d.p_micro * (1000000 - d.p_micro)
            + CAST(1000000 AS HUGEINT) * e.e_micro * e.e_micro - 1)
            // (CAST(1000000 AS HUGEINT) * e.e_micro * e.e_micro) AS BIGINT)
            AS n_normal,
          (3000000 + e.e_micro - 1) // e.e_micro AS n_rule3
        FROM dup d CROSS JOIN es e)
      SELECT e_micro, p_micro, n_hoeffding, n_normal,
        CAST(n_rule3 AS BIGINT) AS n_rule3,
        CAST(greatest(n_normal, n_rule3) AS BIGINT) AS n_required,
        CAST(1000000 * greatest(n_normal, n_rule3) // n AS BIGINT)
          AS corpus_fraction_micro
      FROM nn ORDER BY e_micro"""
    }),

    // ----- successive-halving config selection ----------------------------
    // Hyperparameter-search infrastructure as a relational program:
    // 8 candidate configs, each round doubles the evaluation sample
    // and keeps the better half by mean reward — the budget-optimal
    // tournament (Jamieson & Talwalkar) that underlies Hyperband.
    // Rewards are md5-deterministic with a per-arm additive bias, so
    // the ground-truth best arm is KNOWN (arm 7) and the operator's
    // output doubles as a correctness check of the tournament itself.
    // Three driver-composed rounds, each one conditional aggregate
    // over (arm × sampled docs) with the survivors as a broadcast
    // list; everything is |arms|-bounded beyond the reward scan.
    ("q286_successive_halving", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id",
          (conv(substring(md5(concat(lit("shs|"), $"doc_id".cast("string"))),
            1, 8), 16, 10).cast("long") % 4).as("h"))
        .localCheckpoint() // three rounds sample from it
      val arms = (0L until 8L).map(a => (a, a)).toDF("arm", "bias")
      def rewards(sample: DataFrame, live: DataFrame) = sample
        .crossJoin(broadcast(live))
        .withColumn("r",
          conv(substring(md5(concat(lit("sh|"), $"arm".cast("string"),
            lit("|"), $"doc_id".cast("string"))), 1, 8), 16, 10)
            .cast("long") % 1000 + $"bias" * 20)
        .groupBy($"arm", $"bias")
        .agg(count(lit(1)).as("n_docs"), expr("sum(r) div count(1)").as("mean_r"))
      var live = arms
      var out: DataFrame = null
      val gates = Seq((1L, 4L, 4), (2L, 2L, 2), (3L, 1L, 1))
      for ((round, keepMod, keepN) <- gates) {
        val sample = docs.filter($"h" % keepMod === 0).select($"doc_id")
        val scored = rewards(sample, live)
          .withColumn("rnk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(desc("mean_r"), $"arm")))
          .withColumn("kept", ($"rnk" <= keepN).cast("long"))
          .withColumn("round", lit(round))
        out = if (out == null) scored else out.unionByName(scored)
        live = scored.filter($"kept" === 1).select($"arm", $"bias")
          .localCheckpoint()
      }
      out.select($"round", $"arm", $"n_docs", $"mean_r", $"kept")
        .orderBy($"round", desc("kept"), $"arm")
    }, Some("""
      WITH docs AS (SELECT doc_id,
          ('0x' || substr(md5('shs|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            % 4 AS h FROM documents),
      arms(arm, bias) AS (VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT)), (1, 1),
        (2, 2), (3, 3), (4, 4), (5, 5), (6, 6), (7, 7)),
      r1 AS (SELECT a.arm, a.bias, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(('0x' || substr(md5('sh|' || CAST(a.arm AS VARCHAR) || '|'
            || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 + a.bias * 20)
            // count(*) AS BIGINT) AS mean_r
        FROM docs d CROSS JOIN arms a WHERE d.h % 4 = 0 GROUP BY 1, 2),
      k1 AS (SELECT *, row_number() OVER (ORDER BY mean_r DESC, arm) AS rnk FROM r1),
      s1 AS (SELECT arm, bias FROM k1 WHERE rnk <= 4),
      r2 AS (SELECT a.arm, a.bias, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(('0x' || substr(md5('sh|' || CAST(a.arm AS VARCHAR) || '|'
            || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 + a.bias * 20)
            // count(*) AS BIGINT) AS mean_r
        FROM docs d CROSS JOIN s1 a WHERE d.h % 2 = 0 GROUP BY 1, 2),
      k2 AS (SELECT *, row_number() OVER (ORDER BY mean_r DESC, arm) AS rnk FROM r2),
      s2 AS (SELECT arm, bias FROM k2 WHERE rnk <= 2),
      r3 AS (SELECT a.arm, a.bias, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(('0x' || substr(md5('sh|' || CAST(a.arm AS VARCHAR) || '|'
            || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 + a.bias * 20)
            // count(*) AS BIGINT) AS mean_r
        FROM docs d CROSS JOIN s2 a WHERE d.h % 1 = 0 GROUP BY 1, 2),
      k3 AS (SELECT *, row_number() OVER (ORDER BY mean_r DESC, arm) AS rnk FROM r3),
      allr AS (
        SELECT CAST(1 AS BIGINT) AS round, arm, n_docs, mean_r,
          CAST(CASE WHEN rnk <= 4 THEN 1 ELSE 0 END AS BIGINT) AS kept FROM k1
        UNION ALL
        SELECT 2, arm, n_docs, mean_r,
          CAST(CASE WHEN rnk <= 2 THEN 1 ELSE 0 END AS BIGINT) FROM k2
        UNION ALL
        SELECT 3, arm, n_docs, mean_r,
          CAST(CASE WHEN rnk <= 1 THEN 1 ELSE 0 END AS BIGINT) FROM k3)
      SELECT round, arm, n_docs, mean_r, kept FROM allr
      ORDER BY round, kept DESC, arm"""))
  )
}
