package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 batch 18: off-policy policy evaluation (bandit replay),
  * difference-in-differences estimation, Kaplan–Meier survival, and
  * functional-dependency majority repair — counterfactual evaluation,
  * causal analytics, survival, and data-cleaning surface.
  *
  * House rules as elsewhere: integer arithmetic at every gate, micro-ln
  * for transcendentals, money in DECIMAL(12,2) cents, identical
  * aliases both sides, total ORDER BY.
  */
object Round8rQueries {

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- bandit replay (off-policy evaluation) --------------------------
    // The replay method (Li et al. 2011): estimate what reward a NEW
    // action policy would have earned from a log collected under an old
    // one, by keeping exactly the events where the logged action equals
    // the policy's choice — unbiased when logging was uniform. Policies
    // evaluated: p1_hash (a per-user deterministic preference — the
    // md5-argmax over the action set, a stand-in for any learned
    // per-user model), p2_best_global (always the action with the best
    // logged mean reward — computed IN-DAG and broadcast, no driver
    // round-trip), and the logged baseline. Everything is one scan with
    // conditional aggregation; the action set is |event_types|-bounded.
    // At 100 TB this is the standard counterfactual dashboard: map-side
    // policy evaluation, one rollup, no joins except a broadcast scalar.
    ("q263_bandit_replay", (s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables.t(s, dir, "events")
        .select($"user_id", $"event_type".as("action"),
          floor($"value" * 1e6 + 0.5).cast("long").as("r"))
      val actions = ev.select($"action").distinct()
      // p1: per-user md5-argmax over the action set (bounded cross join)
      val p1 = ev.select($"user_id").distinct()
        .crossJoin(broadcast(actions))
        .withColumn("sc", conv(substring(md5(concat(lit("p1|"),
          $"user_id".cast("string"), lit("|"), $"action")), 1, 8), 16, 10)
          .cast("long"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id").orderBy(desc("sc"), $"action")))
        .filter($"rn" === 1).select($"user_id", $"action".as("p1_action"))
      // p2: the single best action by logged mean reward (in-DAG scalar)
      val p2 = ev.groupBy($"action")
        .agg(expr("sum(r) div count(1)").as("mean_r"))
        .orderBy(desc("mean_r"), $"action").limit(1)
        .select($"action".as("p2_action"))
      val joined = ev
        .join(p1, Seq("user_id"))
        .crossJoin(broadcast(p2))
      val rows = Seq(
        ("logged", joined.agg(count(lit(1)).as("nm"), sum($"r").as("sr"),
          count(lit(1)).as("n"))),
        ("p1_hash", joined.filter($"action" === $"p1_action")
          .agg(count(lit(1)).as("nm"), sum($"r").as("sr"))
          .crossJoin(broadcast(joined.agg(count(lit(1)).as("n"))))),
        ("p2_best_global", joined.filter($"action" === $"p2_action")
          .agg(count(lit(1)).as("nm"), sum($"r").as("sr"))
          .crossJoin(broadcast(joined.agg(count(lit(1)).as("n"))))))
      rows.map { case (nm, df) =>
        df.select(lit(nm).as("policy"), $"n".as("n_events"), $"nm".as("n_matched"),
          expr("1000000 * nm div n").as("match_micro"),
          expr("sr div nm").as("reward_micro"))
      }.reduce(_ unionByName _).orderBy($"policy")
    }, Some("""
      WITH ev AS (SELECT user_id, event_type AS action,
          CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS r FROM events),
      actions AS (SELECT DISTINCT action FROM ev),
      p1 AS (SELECT user_id, action AS p1_action FROM (
          SELECT u.user_id, a.action,
            row_number() OVER (PARTITION BY u.user_id ORDER BY
              ('0x' || substr(md5('p1|' || CAST(u.user_id AS VARCHAR) || '|'
                || a.action), 1, 8))::BIGINT DESC, a.action) AS rn
          FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN actions a)
        WHERE rn = 1),
      p2 AS (SELECT action AS p2_action FROM (
          SELECT action, sum(r) // count(*) AS mean_r FROM ev GROUP BY 1)
        ORDER BY mean_r DESC, action LIMIT 1),
      j AS (SELECT ev.*, p1.p1_action, p2.p2_action
        FROM ev JOIN p1 USING (user_id) CROSS JOIN p2),
      n_all AS (SELECT CAST(count(*) AS BIGINT) AS n FROM j),
      rows_ AS (
        SELECT 'logged' AS policy, n.n AS n_events,
          CAST(count(*) AS BIGINT) AS n_matched, CAST(sum(r) AS BIGINT) AS sr
        FROM j CROSS JOIN n_all n GROUP BY n.n
        UNION ALL
        SELECT 'p1_hash', n.n, CAST(count(*) AS BIGINT), CAST(sum(r) AS BIGINT)
        FROM j CROSS JOIN n_all n WHERE action = p1_action GROUP BY n.n
        UNION ALL
        SELECT 'p2_best_global', n.n, CAST(count(*) AS BIGINT), CAST(sum(r) AS BIGINT)
        FROM j CROSS JOIN n_all n WHERE action = p2_action GROUP BY n.n)
      SELECT policy, n_events, n_matched,
        1000000 * n_matched // n_events AS match_micro,
        sr // n_matched AS reward_micro
      FROM rows_ ORDER BY policy""")),

    // ----- difference-in-differences --------------------------------------
    // The workhorse causal estimator for a rollout you couldn't
    // randomize: treated customers (even nation key — the stand-in for
    // "got the feature") vs control, before vs after the 1999-01-01
    // cutoff; DiD = (T_post − T_pre) − (C_post − C_pre) on mean order
    // value cancels both the level difference between groups and the
    // common time trend. One scan, four conditional cells, means in
    // integer cents — plus the parallel-trends ingredient (the pre-gap)
    // reported alongside, because DiD is only as honest as that
    // assumption. At 100 TB: a broadcast dim join + one 4-cell rollup.
    ("q264_diff_in_diff", (s: SparkSession, dir: String) => {
      import s.implicits._
      val cust = Tables.t(s, dir, "customer")
        .select($"c_custkey", ($"c_nationkey" % 2 === 0).as("treated"))
      val o = Tables.t(s, dir, "orders")
        .select($"o_custkey",
          ($"o_orderdate".cast("date") >= lit("1999-01-01").cast("date")).as("post"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      val cells = o.groupBy($"treated", $"post")
        .agg(count(lit(1)).as("n"), expr("sum(cents) div count(1)").as("mean_cents"))
      val wide = cells.agg(
        max(when($"treated" && $"post", $"mean_cents")).as("t_post"),
        max(when($"treated" && !$"post", $"mean_cents")).as("t_pre"),
        max(when(!$"treated" && $"post", $"mean_cents")).as("c_post"),
        max(when(!$"treated" && !$"post", $"mean_cents")).as("c_pre"),
        sum($"n").as("n_orders"))
      wide.select($"n_orders", $"t_pre", $"t_post", $"c_pre", $"c_post",
        (($"t_post" - $"t_pre") - ($"c_post" - $"c_pre")).as("did_cents"),
        ($"t_pre" - $"c_pre").as("pre_gap_cents"))
    }, Some("""
      WITH cust AS (SELECT c_custkey, (c_nationkey % 2 = 0) AS treated
        FROM customer),
      o AS (SELECT
          (CAST(o_orderdate AS DATE) >= DATE '1999-01-01') AS post,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
          c.treated
        FROM orders JOIN cust c ON o_custkey = c.c_custkey),
      cells AS (SELECT treated, post, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents
        FROM o GROUP BY 1, 2),
      wide AS (SELECT
          max(CASE WHEN treated AND post THEN mean_cents END) AS t_post,
          max(CASE WHEN treated AND NOT post THEN mean_cents END) AS t_pre,
          max(CASE WHEN NOT treated AND post THEN mean_cents END) AS c_post,
          max(CASE WHEN NOT treated AND NOT post THEN mean_cents END) AS c_pre,
          CAST(sum(n) AS BIGINT) AS n_orders
        FROM cells)
      SELECT n_orders, t_pre, t_post, c_pre, c_post,
        (t_post - t_pre) - (c_post - c_pre) AS did_cents,
        t_pre - c_pre AS pre_gap_cents
      FROM wide""")),

    // ----- Kaplan–Meier survival curve ------------------------------------
    // Product-limit survival for "customer lifetime" (days from first
    // to last order; customers still ordering in the last 180 days
    // before the data horizon are CENSORED — their lifetime is a lower
    // bound, and simply dropping them is the classic bias KM exists to
    // fix). The estimator works on the |distinct durations| grid:
    // deaths d_t and at-risk counts n_t from ONE duration histogram
    // (risk set = suffix sum, one cumulative window DOWN the grid), and
    // the product Π(1 − d/n) clears to a SUM in micro-ln — reported as
    // ln S(t), monotone nonincreasing by construction. At 100 TB the
    // only corpus pass is the per-entity min/max aggregate; the grid
    // math is value-bounded, the q184/q217 discipline.
    ("q265_kaplan_meier", (s: SparkSession, dir: String) => {
      import s.implicits._
      val horizon = lit("2001-08-01").cast("date")
      val life = Tables.t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(min($"o_orderdate".cast("date")).as("first_d"),
          max($"o_orderdate".cast("date")).as("last_d"))
        .select(
          datediff($"last_d", $"first_d").cast("long").as("t"),
          (datediff(horizon, $"last_d") > 180).cast("long").as("death"))
      val grid = life.groupBy($"t")
        .agg(sum($"death").as("d"), count(lit(1)).as("ending"))
      val w = Window.orderBy($"t") // |distinct durations|-bounded
      val risk = grid
        .withColumn("before", coalesce(sum($"ending")
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .crossJoin(broadcast(life.agg(count(lit(1)).as("total"))))
        .withColumn("n_risk", $"total" - $"before")
        // d == n_risk would put S at exactly 0 (ln undefined) — the
        // standard log-space KM convention stops the curve there
        .filter($"d" > 0 && $"d" < $"n_risk")
        .withColumn("lnf_micro",
          floor(log(lit(1.0) - $"d".cast("double") / $"n_risk".cast("double"))
            * 1e6 + 0.5).cast("long"))
      risk
        .withColumn("ln_s_micro", sum($"lnf_micro").over(w))
        .select($"t", $"d", $"n_risk", $"ln_s_micro")
        .orderBy($"t")
    }, Some("""
      WITH life AS (SELECT
          CAST(date_diff('day', min(CAST(o_orderdate AS DATE)),
            max(CAST(o_orderdate AS DATE))) AS BIGINT) AS t,
          CAST(CASE WHEN date_diff('day', max(CAST(o_orderdate AS DATE)),
            DATE '2001-08-01') > 180 THEN 1 ELSE 0 END AS BIGINT) AS death
        FROM orders GROUP BY o_custkey),
      grid AS (SELECT t, CAST(sum(death) AS BIGINT) AS d,
          CAST(count(*) AS BIGINT) AS ending FROM life GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM life),
      risk AS (SELECT g.t, g.d,
          tot.total - coalesce(sum(g.ending) OVER (ORDER BY g.t
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        FROM grid g CROSS JOIN tot),
      dd AS (SELECT t, d, n_risk,
          CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
            * 1e6 + 0.5) AS BIGINT) AS lnf_micro
        FROM risk WHERE d > 0 AND d < n_risk)
      SELECT t, d, CAST(n_risk AS BIGINT) AS n_risk,
        CAST(sum(lnf_micro) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
          AS BIGINT) AS ln_s_micro
      FROM dd ORDER BY t""")),

    // ----- functional-dependency majority repair --------------------------
    // The repair step after FD discovery: in a denormalized order feed
    // where custkey → mktsegment MUST hold, a deterministic corruption
    // (orderkey % 17 = 3 rows get segment 'CORRUPTED') breaks the
    // dependency; the repair assigns every violating group its MAJORITY
    // segment (ties to the lexicographically smallest — the standard
    // holistic-cleaning vote), and because the clean truth exists, the
    // audit also scores repair ACCURACY — the number real cleaning
    // systems can only estimate. One groupBy builds the vote table, a
    // broadcast-scale join applies it; per-segment rollup. At 100 TB
    // the vote is per-entity (key-partitioned), the apply is map-side
    // against the broadcast repair table — no corpus self-join.
    ("q266_fd_repair", (s: SparkSession, dir: String) => {
      import s.implicits._
      val seg = Tables.t(s, dir, "customer").select($"c_custkey", $"c_mktsegment")
      val feed = Tables.t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey")
        .join(broadcast(seg), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"o_custkey",
          when($"o_orderkey" % 17 === 3, lit("CORRUPTED"))
            .otherwise($"c_mktsegment").as("seg_dirty"),
          $"c_mktsegment".as("seg_true"))
      val votes = feed.groupBy($"o_custkey", $"seg_dirty")
        .agg(count(lit(1)).as("v"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"o_custkey").orderBy(desc("v"), $"seg_dirty")))
        .filter($"rn" === 1)
        .select($"o_custkey", $"seg_dirty".as("seg_repair"))
      feed.join(votes, Seq("o_custkey"))
        .select($"seg_true",
          ($"seg_dirty" === lit("CORRUPTED")).as("dirty"),
          when($"seg_dirty" === lit("CORRUPTED"),
            ($"seg_repair" === $"seg_true").cast("long")).as("fixed"))
        .groupBy($"seg_true")
        .agg(count(lit(1)).as("n_rows"),
          sum(when($"dirty", 1L).otherwise(0L)).as("n_dirty"),
          sum(coalesce($"fixed", lit(0L))).as("n_repaired_ok"))
        .select($"seg_true", $"n_rows", $"n_dirty", $"n_repaired_ok",
          expr("1000000 * n_repaired_ok div n_dirty").as("repair_acc_micro"))
        .orderBy($"seg_true")
    }, Some("""
      WITH feed AS (SELECT o_orderkey, o_custkey,
          CASE WHEN o_orderkey % 17 = 3 THEN 'CORRUPTED'
            ELSE c.c_mktsegment END AS seg_dirty,
          c.c_mktsegment AS seg_true
        FROM orders JOIN customer c ON o_custkey = c.c_custkey),
      votes AS (SELECT o_custkey, seg_dirty AS seg_repair FROM (
          SELECT o_custkey, seg_dirty, count(*) AS v,
            row_number() OVER (PARTITION BY o_custkey
              ORDER BY count(*) DESC, seg_dirty) AS rn
          FROM feed GROUP BY 1, 2) WHERE rn = 1),
      scored AS (SELECT f.seg_true,
          (f.seg_dirty = 'CORRUPTED') AS dirty,
          CASE WHEN f.seg_dirty = 'CORRUPTED'
            THEN CAST(v.seg_repair = f.seg_true AS BIGINT) END AS fixed
        FROM feed f JOIN votes v USING (o_custkey))
      SELECT seg_true, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CASE WHEN dirty THEN 1 ELSE 0 END) AS BIGINT) AS n_dirty,
        CAST(sum(coalesce(fixed, 0)) AS BIGINT) AS n_repaired_ok,
        CAST(1000000 * sum(coalesce(fixed, 0))
          // sum(CASE WHEN dirty THEN 1 ELSE 0 END) AS BIGINT) AS repair_acc_micro
      FROM scored GROUP BY 1 ORDER BY 1"""))
  )
}
