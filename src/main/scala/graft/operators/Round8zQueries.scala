package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 26: 11-point interpolated average precision (the
  * PR-curve companion to q276's ROC AUC), Mann–Kendall trend +
  * Theil–Sen slope over the daily order series, and Adamic–Adar link
  * prediction on the co-purchase graph — model evaluation under class
  * imbalance, nonparametric trend detection, and recommender link
  * prediction.
  *
  * House rules as elsewhere: integer arithmetic at every gate; the one
  * sqrt (Mann–Kendall z) runs map-side on exact integers on the final
  * single row; ln via the micro-ln rule (floor(ln·1e6 + 0.5), the
  * identical expression in both engines). Signed integer division uses
  * `div`/`//`, which BOTH engines truncate toward zero (verified:
  * -7 div 2 = -3 in Spark and DuckDB alike), so negative slopes and
  * deviations divide identically. Identical aliases both sides, total
  * ORDER BY.
  */
object Round8zQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  /** Adamic–Adar over the co-purchase graph with the hub-cap dial.
    *
    * `cap` bounds the wedge-center degree: only centers with
    * 2 ≤ deg(w) ≤ cap enumerate wedges, making the join cost
    * Σ_{deg(w) ≤ cap} deg(w)² instead of Σ deg(w)² — the production
    * dial for hub-skewed graphs, where a handful of promiscuous
    * centers carry most of the quadratic cost while contributing the
    * LEAST-informative wedges (AA already discounts them by
    * 1/ln(deg)). The cap is applied by inner-joining the filtered
    * weight table onto one wedge leg BEFORE the self-join, so capped
    * centers never fan out. cap ≥ max-degree (e.g. Long.MaxValue)
    * reproduces the exact result bit-for-bit (Round8zSpec pins this);
    * measured at sf0.1, cap = 128 halves Σdeg² (3.0e8 → 1.5e8).
    */
  /** Wedge-aggregate sizing (r14, guide §2.2/§5): target rows per
    * aggregate task. At sf0.1 the 32-wide aggregate held ~4 M groups of
    * hash state per task and sort-spilled ~15 GB on each side of the
    * exchange, while the map-side partial pass reduced the wedge stream
    * by only 3.6 % (145.7 M → 140.5 M rows) — the group key (x, x2) is
    * scattered across map tasks, so partial aggregation is pure
    * overhead here. 500 k rows/task keeps both hash maps of the
    * post-exchange partial+final pair ≤ ~25 MB — inside a fair task
    * share of the execution pool at 32 concurrent tasks on the 8 g
    * default heap — and derives the width from the DATA (measured wedge
    * count), not the core count, so the same rule sizes the aggregate
    * at any SF or cluster width.
    */
  private val WedgeRowsPerTask = 500000L

  private[graft] def adamicAdar(s: SparkSession, dir: String,
      cap: Long): DataFrame = {
    import s.implicits._
    val (pairs, sym, wts) = wedgeInputs(s, dir, cap)
    // measured wedge volume Σ C(deg,2) over capped centers — one tiny
    // aggregate over the checkpointed edge list (≤ |V| groups)
    val nWedges = sym.groupBy($"w").agg(count(lit(1)).as("deg"))
      .filter($"deg" >= 2 && $"deg" <= cap)
      .agg(coalesce(sum(expr("deg * (deg - 1) div 2")), lit(0L)))
      .head().getLong(0)
    val aggWidth = math.max(s.sparkContext.defaultParallelism.toLong,
      (nWedges + WedgeRowsPerTask - 1) / WedgeRowsPerTask).toInt
    // repartition on the GROUP key moves the exchange BELOW the
    // aggregation: the map side becomes a pure join + shuffle write (no
    // hash map, no sort-fallback), and the one aggregation runs at a
    // width where per-task state fits (REPARTITION_BY_NUM also keeps
    // AQE from re-coalescing this CPU-dense stage by bytes)
    val wedges = sym.join(wts, Seq("w")) // cap applied BEFORE the fanout
      .join(sym.toDF("w", "x2"), Seq("w"))
      .filter($"x" < $"x2")
      .repartition(aggWidth, $"x", $"x2")
      .groupBy($"x", $"x2")
      .agg(count(lit(1)).as("n_common"), sum($"wm").as("aa_micro"))
    // anti-join strategy picked from the MEASURED edge count: a sort-merge
    // anti here sorts the wedge aggregate (Σdeg²/2 rows — the biggest
    // table in the query) just to subtract the existing-edge set, which
    // is orders of magnitude smaller (guide §3.1)
    wedges.join(
        AdaptiveJoin.broadcastIfSmall(pairs.select($"a".as("x"), $"b".as("x2"))),
        Seq("x", "x2"), "left_anti")
      .select($"x".as("item_a"), $"x2".as("item_b"), $"n_common",
        $"aa_micro")
      .orderBy(desc("aa_micro"), $"item_a", $"item_b").limit(20)
  }

  /** Shared wedge inputs: the deduped co-purchase pair list
    * (checkpointed — reused by both sym legs and the anti-join), its
    * symmetric closure, and the cap-filtered micro-ln weight table.
    */
  private def wedgeInputs(s: SparkSession, dir: String, cap: Long)
      : (DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    val items = Tables.t(s, dir, "lineitem")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val pairs = items.toDF("ok", "a").join(items.toDF("ok", "b"), Seq("ok"))
      .filter($"a" < $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("cab"))
      .localCheckpoint() // reused: sym edges (twice) + the anti-join
    val sym = pairs.select($"a".as("w"), $"b".as("x"))
      .unionByName(pairs.select($"b".as("w"), $"a".as("x")))
    val wts = sym.groupBy($"w").agg(count(lit(1)).as("deg"))
      .filter($"deg" >= 2 && $"deg" <= cap)
      .select($"w", expr(
        """CAST(1000000000000 div
           CAST(floor(ln(CAST(deg AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS BIGINT)""").as("wm"))
    (pairs, sym, wts)
  }

  /** The staged (disk-bounded) form of [[adamicAdar]]: bit-identical
    * result, executed as `slices` SEQUENTIAL sub-jobs. Slice b owns
    * the x2-hash-slice `pmod(hash(x2), slices) = b` of the wedge
    * space: because the slice key is a function of x2 alone, every
    * (x, x2) wedge group lives entirely in one slice, so the
    * per-slice aggregate is exact and the slice's top-20 is a
    * superset of the global top-20's members in that slice — the
    * union of per-slice top-20s re-sorted under the same total order
    * IS the global top-20. Each slice materializes eagerly
    * (localCheckpoint, ≤ 20 rows kept) before the next starts, so
    * peak shuffle/spill disk is Σ_{deg≤cap} deg²/slices instead of
    * the whole wedge volume at once — the per-task state bound that
    * lets the ×30+ scale probes complete on one box where the
    * single-shot form exhausts the spill disk (bench/r09_scale100_*
    * are the failure baselines). The weight table is checkpointed
    * once (≤ |V| rows) so slices don't recompute the degree scan.
    */
  /** One staged slice's chain (wedge fanout → exact per-slice aggregate
    * → anti-join → slice top-20), shared between the staged loop and
    * [[adamicAdarSliceForPlan]] so the committed slice-plan evidence is
    * the executed plan by construction (the staged query's own final
    * plan collapses to checkpointed LogicalRDD scans).
    */
  private def sliceTop(s: SparkSession, leg1: DataFrame, sym: DataFrame,
      pairs: DataFrame, broadcastAnti: Boolean, slices: Int,
      b: Int): DataFrame = {
    import s.implicits._
    val wedges = leg1
      .join(sym.toDF("w", "x2")
        .filter(pmod(hash($"x2"), lit(slices)) === b), Seq("w"))
      .filter($"x" < $"x2")
      .groupBy($"x", $"x2")
      .agg(count(lit(1)).as("n_common"), sum($"wm").as("aa_micro"))
    val anti0 = pairs.filter(pmod(hash($"b"), lit(slices)) === b)
      .select($"a".as("x"), $"b".as("x2"))
    wedges
      .join(AdaptiveJoin.broadcastIf(broadcastAnti, anti0),
        Seq("x", "x2"), "left_anti")
      .select($"x".as("item_a"), $"x2".as("item_b"), $"n_common",
        $"aa_micro")
      .orderBy(desc("aa_micro"), $"item_a", $"item_b").limit(20)
  }

  /** PlanDump evidence entry: slice 0 of the staged form, un-checkpointed,
    * built with the exact inputs (checkpointed weight table, measured
    * anti pick, width-pinned leg) the staged loop uses.
    */
  private[graft] def adamicAdarSliceForPlan(s: SparkSession, dir: String,
      cap: Long, slices: Int): DataFrame = {
    import s.implicits._
    val (pairs, sym, wts0) = wedgeInputs(s, dir, cap)
    val wts = wts0.localCheckpoint()
    val broadcastAnti = AdaptiveJoin.isSmall(pairs)
    val leg1 = sym.join(wts, Seq("w"))
    sliceTop(s, leg1, sym, pairs, broadcastAnti, slices, 0)
  }

  private[graft] def adamicAdarStaged(s: SparkSession, dir: String,
      cap: Long, slices: Int): DataFrame = {
    import s.implicits._
    val (pairs, sym, wts0) = wedgeInputs(s, dir, cap)
    val wts = wts0.localCheckpoint()
    // same measured-size anti-join pick as the single-shot form; the
    // whole edge set bounds every per-slice subset, so one count decides
    // for all slices
    val broadcastAnti = AdaptiveJoin.isSmall(pairs)
    // NOT width-pinned (r14, measured): AQE's byte-based coalescing runs
    // the slice fanout at 16 tasks at sf0.1 (28 MB shuffled in), which
    // looks like the r13 prefix-chain starvation — but pinning sym's
    // exchange to full width (REPARTITION_BY_NUM on w, reused by both
    // join legs) measured NEUTRAL-TO-WORSE in an interleaved A/B
    // (min-of-2: old 19.8 s vs pinned 21.3 s), the wider sort/merge
    // overhead eating the extra cores on this slice volume. And the
    // starvation is a small-bytes artifact: at production volumes the
    // per-slice wedge bytes keep AQE's own coalescing wide. Rejected;
    // see BENCHNOTES r14. (A pin on leg1's OUTPUT was also tried and
    // silently vanished — its child already satisfied hash(w, 32), so
    // EnsureRequirements dropped the redundant exchange.)
    val leg1 = sym.join(wts, Seq("w")) // cap applied BEFORE the fanout
    val parts = (0 until slices).map { b =>
      val top = sliceTop(s, leg1, sym, pairs, broadcastAnti, slices, b)
        .localCheckpoint() // eager: THIS slice's job runs to completion here
      // the finished slice's shuffle lineage is now unreferenced; a GC
      // lets the ContextCleaner drop its shuffle files before the next
      // slice needs the disk (the whole point of staging)
      if (slices > 1) System.gc()
      top
    }
    parts.reduce(_ unionByName _)
      .orderBy(desc("aa_micro"), $"item_a", $"item_b").limit(20)
  }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- 11-point interpolated average precision ------------------------
    // The PR-curve read q276's AUC hides under class imbalance: with
    // 1% positives an AUC of 0.95 can coexist with useless precision,
    // and a corpus-filter decision needs the precision/recall
    // tradeoff, not the ranking statistic. PASCAL-VOC form: collapse
    // the corpus to the distinct-score grid (ties collapse at group
    // boundaries — deterministic, no within-tie ordering), take
    // cumulative (cp, ca) down the score-descending grid, and for each
    // recall level L ∈ {0, 0.1, …, 1.0} report the interpolated
    // precision max{prec at points with recall ≥ L}. AP11 is the mean
    // of the 11 (integer div). One corpus scoring scan; everything
    // after is |distinct scores|-bounded (the q276 grid bound — the
    // window orders the GRID, never the corpus); the level join is an
    // 11-row broadcast nested loop against the grid.
    ("q294_average_precision", (s: SparkSession, dir: String) => {
      import s.implicits._
      val scored = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"n_chars",
          explode(split(TA.normText($"text"), " ")).as("tok"))
        .withColumn("w",
          conv(substring(md5(concat(lit("w|"),
              (conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long") % 1024)
                .cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2001 - 1000)
        .groupBy($"doc_id").agg(max($"n_chars").as("nc"), sum($"w").as("score"))
        .withColumn("pos", ($"nc" >= 250).cast("long"))
      val grid = scored.groupBy($"score")
        .agg(sum($"pos").as("pg"), sum(lit(1L) - $"pos").as("ng"))
      val w = Window.orderBy(desc("score")) // |distinct scores|-bounded
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pts = grid
        .withColumn("cp", sum($"pg").over(w))
        .withColumn("ca", sum($"pg" + $"ng").over(w))
      val tot = pts.agg(max($"cp").as("np"))
      val pr = pts.crossJoin(broadcast(tot))
        .select(expr("1000000 * cp div np").as("recall_micro"),
          expr("1000000 * cp div ca").as("prec_micro"))
      val levels = (0L to 10L).map(i => Tuple1(i * 100000L)).toDF("level_micro")
      val interp = pr.join(broadcast(levels),
          $"recall_micro" >= $"level_micro")
        .groupBy($"level_micro").agg(max($"prec_micro").as("p_interp_micro"))
      val ap = interp.agg(expr("sum(p_interp_micro) div 11").as("ap11_micro"))
      interp.crossJoin(broadcast(ap))
        .select($"level_micro", $"p_interp_micro", $"ap11_micro")
        .orderBy($"level_micro")
    }, Some(s"""
      WITH st AS (SELECT doc_id, n_chars,
          unnest(string_split($normSql, ' ')) AS tok FROM documents),
      sc AS (SELECT doc_id, max(n_chars) AS nc,
          CAST(sum(('0x' || substr(md5('w|' || CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) AS BIGINT) AS score
        FROM st GROUP BY 1),
      lab AS (SELECT score,
          CAST(CASE WHEN nc >= 250 THEN 1 ELSE 0 END AS BIGINT) AS pos FROM sc),
      grid AS (SELECT score, CAST(sum(pos) AS BIGINT) AS pg,
          CAST(sum(1 - pos) AS BIGINT) AS ng FROM lab GROUP BY 1),
      pts AS (SELECT score,
          CAST(sum(pg) OVER (ORDER BY score DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp,
          CAST(sum(pg + ng) OVER (ORDER BY score DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca
        FROM grid),
      tot AS (SELECT max(cp) AS np FROM pts),
      pr AS (SELECT 1000000 * cp // np AS recall_micro,
          1000000 * cp // ca AS prec_micro FROM pts CROSS JOIN tot),
      levels(level_micro) AS (VALUES (CAST(0 AS BIGINT)), (100000), (200000),
        (300000), (400000), (500000), (600000), (700000), (800000),
        (900000), (1000000)),
      interp AS (SELECT level_micro, max(prec_micro) AS p_interp_micro
        FROM levels JOIN pr ON pr.recall_micro >= levels.level_micro
        GROUP BY 1),
      ap AS (SELECT CAST(sum(p_interp_micro) // 11 AS BIGINT) AS ap11_micro
        FROM interp)
      SELECT level_micro, p_interp_micro, ap11_micro
      FROM interp CROSS JOIN ap ORDER BY level_micro""")),

    // ----- Mann–Kendall trend + Theil–Sen slope ---------------------------
    // The nonparametric trend verdict on the daily order series: is
    // there a monotone trend (q229's CUSUM finds level SHIFTS, q270
    // splits structure — neither answers "monotone drift?"). S =
    // Σ_{i<j} sign(c_j − c_i) over the DAY GRID (the corpus collapses
    // to |days| rows first — at 100 TB the grid is time-bounded, not
    // corpus-bounded; the pair join is |days|², ~2.9M cells here,
    // documented as the grid bound). Tie-corrected variance
    // var = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18 from the count-value
    // histogram; z = (S ∓ 1)/√var with the sqrt map-side on the one
    // final row. Theil–Sen: median of the pairwise slopes
    // (c_j−c_i)·1e6 div (d_j−d_i) — the median via the slope VALUE
    // grid (cumulative counts, no global sort of pairs), midpoint of
    // the two straddling ranks.
    ("q295_mann_kendall", (s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.t(s, dir, "orders")
        .select(datediff($"o_orderdate", lit("1992-01-01")).cast("long").as("d"))
        .groupBy($"d").agg(count(lit(1)).as("c"))
        .localCheckpoint() // reused: pairs (both sides), ties, n
      val pairs = daily.toDF("da", "ca")
        .join(daily.toDF("db", "cb"), $"da" < $"db")
        .localCheckpoint() // reused: S-aggregate + slope grid
      val sagg = pairs.agg(count(lit(1)).as("n_pairs"),
        sum(when($"cb" > $"ca", 1L).when($"cb" < $"ca", -1L).otherwise(0L))
          .as("s_stat"),
        sum(when($"cb" > $"ca", 1L).otherwise(0L)).as("n_conc"),
        sum(when($"cb" < $"ca", 1L).otherwise(0L)).as("n_disc"),
        sum(when($"cb" === $"ca", 1L).otherwise(0L)).as("n_tied"))
      val nd = daily.agg(count(lit(1)).as("n_days"))
      val ties = daily.groupBy($"c").agg(count(lit(1)).as("t"))
        .agg(coalesce(sum($"t" * ($"t" - 1) * (lit(2) * $"t" + 5)), lit(0L))
          .as("tsum"))
      val slopes = pairs
        .select(expr("(cb - ca) * 1000000 div (db - da)").as("sl"))
        .groupBy($"sl").agg(count(lit(1)).as("cnt"))
      val wv = Window.orderBy($"sl") // |distinct slopes|-bounded
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = slopes.withColumn("cum", sum($"cnt").over(wv))
        .crossJoin(broadcast(sagg.select($"n_pairs".as("npr"))))
        .agg(min(when($"cum" >= expr("(npr + 1) div 2"), $"sl")).as("v1"),
          min(when($"cum" >= expr("(npr + 2) div 2"), $"sl")).as("v2"))
      sagg.crossJoin(broadcast(nd)).crossJoin(broadcast(ties))
        .crossJoin(broadcast(med))
        .withColumn("var18",
          $"n_days" * ($"n_days" - 1) * (lit(2) * $"n_days" + 5) - $"tsum")
        .select($"n_days", $"n_pairs", $"s_stat", $"n_conc", $"n_disc",
          $"n_tied",
          expr("""CAST(floor(CAST(CASE WHEN s_stat > 0 THEN s_stat - 1
                 WHEN s_stat < 0 THEN s_stat + 1 ELSE 0 END AS DOUBLE)
               / sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1000000 + 0.5)
               AS BIGINT)""").as("z_micro"),
          expr("(v1 + v2) div 2").as("sen_slope_micro"))
    }, Some("""
      WITH daily AS (SELECT
          CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
            AS BIGINT) AS d,
          CAST(count(*) AS BIGINT) AS c
        FROM orders GROUP BY 1),
      pairs AS (SELECT a.d AS da, a.c AS ca, b.d AS db, b.c AS cb
        FROM daily a JOIN daily b ON a.d < b.d),
      sagg AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
          CAST(sum(CASE WHEN cb > ca THEN 1 WHEN cb < ca THEN -1 ELSE 0 END)
            AS BIGINT) AS s_stat,
          CAST(sum(CASE WHEN cb > ca THEN 1 ELSE 0 END) AS BIGINT) AS n_conc,
          CAST(sum(CASE WHEN cb < ca THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
          CAST(sum(CASE WHEN cb = ca THEN 1 ELSE 0 END) AS BIGINT) AS n_tied
        FROM pairs),
      nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
      ties AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
            AS BIGINT) AS tsum
        FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY c)),
      slopes AS (SELECT (cb - ca) * 1000000 // (db - da) AS sl,
          CAST(count(*) AS BIGINT) AS cnt
        FROM pairs GROUP BY 1),
      cums AS (SELECT sl, CAST(sum(cnt) OVER (ORDER BY sl
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM slopes),
      med AS (SELECT
          min(CASE WHEN cum >= (s.n_pairs + 1) // 2 THEN sl END) AS v1,
          min(CASE WHEN cum >= (s.n_pairs + 2) // 2 THEN sl END) AS v2
        FROM cums CROSS JOIN sagg s)
      SELECT nd.n_days, s.n_pairs, s.s_stat, s.n_conc, s.n_disc, s.n_tied,
        CAST(floor(CAST(CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
              WHEN s.s_stat < 0 THEN s.s_stat + 1 ELSE 0 END AS DOUBLE)
            / sqrt(CAST(nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
              - t.tsum AS DOUBLE) / 18.0) * 1000000 + 0.5) AS BIGINT)
          AS z_micro,
        (m.v1 + m.v2) // 2 AS sen_slope_micro
      FROM sagg s CROSS JOIN nd CROSS JOIN ties t CROSS JOIN med m""")),

    // ----- Adamic–Adar link prediction ------------------------------------
    // The recommender question q275 does NOT answer: which item pairs
    // are NOT yet co-purchased but have the strongest shared
    // neighborhoods? AA(a,b) = Σ_{w ∈ N(a)∩N(b)} 1/ln(deg(w)) — the
    // common-neighbor score that discounts promiscuous hubs (a raw
    // common-neighbor count would be dominated by them). The wedge
    // enumeration joins the symmetrized edge list with itself on the
    // CENTER w (cost Σ deg(w)² — AA needs both wedge corners, so the
    // q160 degree orientation cannot halve it). The shared builder
    // `adamicAdar` takes the production hub-cap dial D as a real
    // parameter: the weight table keeps only centers with
    // 2 ≤ deg(w) ≤ D and is inner-joined onto one wedge leg BEFORE the
    // self-join, so capped hub centers never fan out at all — the
    // Σ_{deg≤D} deg² bound is structural, not post-hoc. This exact
    // entry passes cap = ∞ (a cap ≥ max-degree is bit-for-bit the
    // exact result — Round8zSpec proves it); q321 is the capped form
    // under the oracle gate. Wedge weight 1e12 div micro-ln(deg(w))
    // (deg ≥ 2, so the ln is never 0), per-pair aggregate, anti-join
    // of the existing edge set, top-20 via TakeOrderedAndProject.
    ("q296_adamic_adar", (s: SparkSession, dir: String) =>
      adamicAdar(s, dir, Long.MaxValue), Some("""
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        FROM lineitem),
      pairs AS (SELECT a.pk AS a, b.pk AS b, CAST(count(*) AS BIGINT) AS cab
        FROM items a JOIN items b ON a.ok = b.ok WHERE a.pk < b.pk GROUP BY 1, 2),
      sym AS (SELECT a AS w, b AS x FROM pairs
        UNION ALL SELECT b AS w, a AS x FROM pairs),
      wts AS (SELECT w, CAST(1000000000000
            // CAST(floor(ln(CAST(count(*) AS DOUBLE)) * 1000000 + 0.5)
              AS BIGINT) AS BIGINT) AS wm
        FROM sym GROUP BY w HAVING count(*) >= 2),
      wedges AS (SELECT s1.x AS x, s2.x AS x2,
          CAST(count(*) AS BIGINT) AS n_common,
          CAST(sum(w.wm) AS BIGINT) AS aa_micro
        FROM sym s1 JOIN sym s2 ON s1.w = s2.w AND s1.x < s2.x
        JOIN wts w ON s1.w = w.w
        GROUP BY 1, 2),
      pred AS (SELECT wd.* FROM wedges wd
        LEFT JOIN pairs p ON wd.x = p.a AND wd.x2 = p.b
        WHERE p.a IS NULL)
      SELECT x AS item_a, x2 AS item_b, n_common, aa_micro
      FROM pred ORDER BY aa_micro DESC, item_a, item_b LIMIT 20"""))
  )
}
