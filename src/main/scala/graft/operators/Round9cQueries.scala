package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 batch 3: the product-analytics trio over the events table —
  * strict sequential funnel conversion (signup → view → click →
  * purchase, each stage strictly after the previous), weekly retention
  * cohorts (the first-seen-week × offset-week activity matrix), and
  * the event-type Markov transition matrix (where does behavior go
  * NEXT). All three are per-user-partitioned shapes: every join and
  * window keys on user_id, so the shuffles co-locate by user and scale
  * with users, never users².
  *
  * Timestamp rule (the q201 TESTDATA gotcha): ts normalizes to epoch
  * micros; every use here is an ORDER or DIFFERENCE, so any constant
  * session-offset a cast introduces cancels. House rules as
  * elsewhere: integer arithmetic at every gate, identical aliases
  * both sides, total ORDER BY.
  */
object Round9cQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** events as (u, et, tm-micros, event_id), ts normalized per q201. */
  private def ev(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val raw = Tables.t(s, dir, "events")
    val tusCol: Column = raw.schema("ts").dataType.typeName match {
      case "timestamp_ntz" => unix_micros($"ts".cast("timestamp"))
      case _ => unix_micros($"ts")
    }
    raw.select($"user_id".as("u"), $"event_type".as("et"),
      tusCol.as("tm"), $"event_id")
  }

  private val evSql =
    """SELECT user_id AS u, event_type AS et,
       epoch_us(CAST(ts AS TIMESTAMP)) AS tm, event_id FROM events"""

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- strict sequential funnel ---------------------------------------
    // Set-intersection "funnels" (did the user EVER do all four?)
    // overcount: a purchase before signup is not a conversion. The
    // strict form chains first-occurrence times — t1 = first signup,
    // t2 = first view AFTER t1, t3 = first click after t2, t4 = first
    // purchase after t3 — so each stage count is users whose events
    // happened in ORDER. Four per-user min-aggregates chained by
    // equi-joins on user_id (stage N's table only carries stage-N
    // survivors — monotonically shrinking, all co-partitioned); the
    // conversion ratios come off the four scalar counts. Degenerate
    // stages (zero survivors) yield NULL ratios in both engines.
    ("q325_funnel_conversion", (s: SparkSession, dir: String) => {
      import s.implicits._
      val e = ev(s, dir).localCheckpoint() // reused by the 4 stage scans
      val s1 = e.filter($"et" === "signup").groupBy($"u")
        .agg(min($"tm").as("t1"))
      val s2 = e.filter($"et" === "view").join(s1, Seq("u"))
        .filter($"tm" > $"t1").groupBy($"u").agg(min($"tm").as("t2"))
      val s3 = e.filter($"et" === "click").join(s2, Seq("u"))
        .filter($"tm" > $"t2").groupBy($"u").agg(min($"tm").as("t3"))
      val s4 = e.filter($"et" === "purchase").join(s3, Seq("u"))
        .filter($"tm" > $"t3").groupBy($"u").agg(min($"tm").as("t4"))
      val c = s1.agg(count(lit(1)).as("c1"))
        .crossJoin(s2.agg(count(lit(1)).as("c2")))
        .crossJoin(s3.agg(count(lit(1)).as("c3")))
        .crossJoin(s4.agg(count(lit(1)).as("c4")))
        .localCheckpoint() // one row; reused by the 4-way unpivot
      def stage(ord: Long, name: String, cur: String, prev: String) =
        c.select(lit(ord).as("stage_ord"), lit(name).as("stage"),
          col(cur).as("n_users"),
          expr(s"CASE WHEN $prev = 0 THEN NULL " +
            s"ELSE 1000000 * $cur div $prev END").as("conv_prev_micro"),
          expr(s"CASE WHEN c1 = 0 THEN NULL " +
            s"ELSE 1000000 * $cur div c1 END").as("conv_start_micro"))
      stage(1, "signup", "c1", "c1")
        .unionByName(stage(2, "view_after_signup", "c2", "c1"))
        .unionByName(stage(3, "click_after_view", "c3", "c2"))
        .unionByName(stage(4, "purchase_after_click", "c4", "c3"))
        .orderBy($"stage_ord")
    }, Some(s"""
      WITH e AS ($evSql),
      s1 AS (SELECT u, min(tm) AS t1 FROM e WHERE et = 'signup' GROUP BY u),
      s2 AS (SELECT e.u, min(e.tm) AS t2 FROM e JOIN s1 ON e.u = s1.u
        WHERE e.et = 'view' AND e.tm > s1.t1 GROUP BY e.u),
      s3 AS (SELECT e.u, min(e.tm) AS t3 FROM e JOIN s2 ON e.u = s2.u
        WHERE e.et = 'click' AND e.tm > s2.t2 GROUP BY e.u),
      s4 AS (SELECT e.u, min(e.tm) AS t4 FROM e JOIN s3 ON e.u = s3.u
        WHERE e.et = 'purchase' AND e.tm > s3.t3 GROUP BY e.u),
      c AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS c1,
        (SELECT CAST(count(*) AS BIGINT) FROM s2) AS c2,
        (SELECT CAST(count(*) AS BIGINT) FROM s3) AS c3,
        (SELECT CAST(count(*) AS BIGINT) FROM s4) AS c4)
      SELECT stage_ord, stage, n_users, conv_prev_micro, conv_start_micro
      FROM (
        SELECT CAST(1 AS BIGINT) AS stage_ord, 'signup' AS stage,
          c1 AS n_users,
          CASE WHEN c1 = 0 THEN NULL ELSE 1000000 * c1 // c1 END
            AS conv_prev_micro,
          CASE WHEN c1 = 0 THEN NULL ELSE 1000000 * c1 // c1 END
            AS conv_start_micro FROM c
        UNION ALL SELECT 2, 'view_after_signup', c2,
          CASE WHEN c1 = 0 THEN NULL ELSE 1000000 * c2 // c1 END,
          CASE WHEN c1 = 0 THEN NULL ELSE 1000000 * c2 // c1 END FROM c
        UNION ALL SELECT 3, 'click_after_view', c3,
          CASE WHEN c2 = 0 THEN NULL ELSE 1000000 * c3 // c2 END,
          CASE WHEN c1 = 0 THEN NULL ELSE 1000000 * c3 // c1 END FROM c
        UNION ALL SELECT 4, 'purchase_after_click', c4,
          CASE WHEN c3 = 0 THEN NULL ELSE 1000000 * c4 // c3 END,
          CASE WHEN c1 = 0 THEN NULL ELSE 1000000 * c4 // c1 END FROM c)
      ORDER BY stage_ord""")),

    // ----- weekly retention cohorts ---------------------------------------
    // The engagement read DAU/WAU (q317) cannot give: of the users who
    // ARRIVED in week W, how many are still active k weeks later?
    // Cohort = epoch-week of a user's first event (epd div 7 — fixed
    // grid, no session-relative weeks); the matrix is cohort_week ×
    // offset ∈ [0, 3] with retention = active div cohort_size. Shape:
    // distinct (user, week) pairs → per-user min (both user-keyed
    // aggregates), one broadcast-join back, one (cohort, offset)
    // aggregate — nothing beyond user-cardinality shuffles. offset 0
    // always reads 1e6 (the definition check rides along).
    ("q326_retention_cohorts", (s: SparkSession, dir: String) => {
      import s.implicits._
      val uw = Tables.t(s, dir, "events")
        .select($"user_id".as("u"),
          expr("""CAST(datediff(to_date(CAST(ts AS TIMESTAMP)),
            DATE '1970-01-01') AS BIGINT) div 7""").as("wk"))
        .distinct()
        .localCheckpoint() // reused: first-week aggregate + activity join
      val first = uw.groupBy($"u").agg(min($"wk").as("cw"))
      val act = uw.join(first, Seq("u"))
        .select($"cw", ($"wk" - $"cw").as("off"), $"u")
        .filter($"off" <= 3)
        .groupBy($"cw", $"off").agg(countDistinct($"u").as("n_active"))
      val sizes = act.filter($"off" === 0)
        .select($"cw", $"n_active".as("cohort_size"))
      act.join(sizes, Seq("cw"))
        .select($"cw".as("cohort_week"), $"off".as("offset_w"),
          $"n_active", $"cohort_size",
          expr("1000000 * n_active div cohort_size").as("retention_micro"))
        .orderBy($"cohort_week", $"offset_w")
    }, Some("""
      WITH uw AS (SELECT DISTINCT user_id AS u,
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) // 7 AS wk
        FROM events),
      first AS (SELECT u, min(wk) AS cw FROM uw GROUP BY u),
      act AS (SELECT f.cw, uw.wk - f.cw AS off,
          CAST(count(DISTINCT uw.u) AS BIGINT) AS n_active
        FROM uw JOIN first f ON uw.u = f.u
        WHERE uw.wk - f.cw <= 3 GROUP BY 1, 2),
      sizes AS (SELECT cw, n_active AS cohort_size FROM act WHERE off = 0)
      SELECT act.cw AS cohort_week, act.off AS offset_w, act.n_active,
        s.cohort_size,
        1000000 * act.n_active // s.cohort_size AS retention_micro
      FROM act JOIN sizes s ON act.cw = s.cw
      ORDER BY cohort_week, offset_w""")),

    // ----- event-type Markov transition matrix ----------------------------
    // Funnels check ONE hypothesized path; the transition matrix reads
    // ALL of them: P(next event type | current), estimated from every
    // consecutive pair within a user's stream. One lag window
    // partitioned by user (total order (tm, event_id) — simultaneous
    // events break ties deterministically), a 5×5-bounded pair
    // aggregate, and a row-normalized micro probability. Cross-user
    // boundaries contribute nothing (lag resets per partition) — the
    // matrix is within-user behavior, not interleaved-stream noise.
    ("q327_markov_transitions", (s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"u").orderBy($"tm", $"event_id")
      val pairs = ev(s, dir)
        .withColumn("nxt", lead($"et", 1).over(w))
        .filter($"nxt".isNotNull)
        .groupBy($"et".as("src_type"), $"nxt".as("dst_type"))
        .agg(count(lit(1)).as("n"))
      val rowTot = pairs.groupBy($"src_type").agg(sum($"n").as("rt"))
      pairs.join(broadcast(rowTot), Seq("src_type"))
        .select($"src_type", $"dst_type", $"n",
          expr("1000000 * n div rt").as("p_micro"))
        .orderBy($"src_type", $"dst_type")
    }, Some(s"""
      WITH e AS ($evSql),
      nx AS (SELECT et, lead(et, 1) OVER (PARTITION BY u
          ORDER BY tm, event_id) AS nxt FROM e),
      pairs AS (SELECT et AS src_type, nxt AS dst_type,
          CAST(count(*) AS BIGINT) AS n
        FROM nx WHERE nxt IS NOT NULL GROUP BY 1, 2),
      rt AS (SELECT src_type, CAST(sum(n) AS BIGINT) AS rt
        FROM pairs GROUP BY 1)
      SELECT p.src_type, p.dst_type, p.n, 1000000 * p.n // rt.rt AS p_micro
      FROM pairs p JOIN rt ON p.src_type = rt.src_type
      ORDER BY p.src_type, p.dst_type"""))
  )
}
