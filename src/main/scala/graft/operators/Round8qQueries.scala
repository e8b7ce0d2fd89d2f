package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 17: optimal change-point by binary segmentation,
  * weight-of-evidence feature binning, leakage-free K-fold target
  * encoding, and the disparity-filter graph backbone — time-series,
  * feature-engineering, and network-reduction surface.
  *
  * House rules as elsewhere: integer arithmetic at every gate, micro-ln
  * for transcendentals, 128-bit (DECIMAL(38,0)/HUGEINT) where count
  * products appear, identical aliases both sides, total ORDER BY.
  */
object Round8qQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- binary-segmentation change points ------------------------------
    // The optimal-split companion to q229's CUSUM: pick the split s of
    // the daily event-value series that MAXIMIZES the between-segment
    // variance reduction — in prefix-sum form, maximize
    // gain(s) = L(s)·R(s)·(meanL − meanR)², which clears to integers as
    // (R·cumL − L·(tot − cumL))² / (L·R·n) — so the whole search is ONE
    // cumulative window over the day grid plus an argmax, no per-split
    // rescans (the naive form recomputes two means per candidate). Then
    // recurse ONCE on each side — binary segmentation depth 2, giving
    // up to 3 change points. Numerators are squares of value sums ×
    // counts: 128-bit everywhere. The day grid is |days|-bounded — at
    // 100 TB the only corpus pass is the daily pre-aggregate, the
    // segmentation itself is metadata-scale, like q229.
    ("q259_binary_segmentation", (s: SparkSession, dir: String) => {
      import s.implicits._
      val raw = Tables.t(s, dir, "events")
      val daily = raw
        .select(date_format($"ts".cast("timestamp"), "yyyy-MM-dd").as("day"),
          floor($"value" + 0.5).cast("long").as("v"))
        .groupBy($"day").agg(sum($"v").as("dv"), count(lit(1)).as("dn"))
        .localCheckpoint() // three segment searches reuse it
      def bestSplit(seg: DataFrame, lo: String, hi: String): DataFrame = {
        val in = seg.filter($"day" >= lo && $"day" < hi)
        val w = Window.orderBy($"day")
        val tot = in.agg(sum($"dv").as("tv"), count(lit(1)).as("tn"))
        in.withColumn("cum", sum($"dv").over(w))
          .withColumn("k", row_number().over(w).cast("long"))
          .crossJoin(broadcast(tot))
          .filter($"k" < $"tn") // a split needs a non-empty right side
          .withColumn("num", expr(
            """CAST((tn - k) AS DECIMAL(38,0)) * cum
               - CAST(k AS DECIMAL(38,0)) * (tv - cum)"""))
          .withColumn("gain", expr(
            """CAST(num * num div (CAST(k AS DECIMAL(38,0)) * (tn - k) * tn)
               AS DECIMAL(38,0))"""))
          .orderBy(desc("gain"), $"day").limit(1)
          .select($"day", $"gain".cast("long").as("gain"))
      }
      val top = bestSplit(daily, "0000-00-00", "9999-99-99")
        .select($"day".as("split_day"), $"gain", lit("root").as("segment"))
      val topDay = top.select($"split_day")
      // split_day is the LAST day of the left segment: left recursion
      // keeps day <= split_day, right keeps day > split_day (a <
      // boundary would re-search the whole range whenever the root
      // split lands on the first day)
      val left = bestSplit(daily.join(broadcast(topDay),
          $"day" <= $"split_day").select($"day", $"dv", $"dn"),
          "0000-00-00", "9999-99-99")
        .select($"day".as("split_day"), $"gain", lit("left").as("segment"))
      val right = bestSplit(daily.join(broadcast(topDay.select(
          $"split_day".as("sd"))), $"day" > $"sd").select($"day", $"dv", $"dn"),
          "0000-00-00", "9999-99-99")
        .select($"day".as("split_day"), $"gain", lit("right").as("segment"))
      top.unionByName(left).unionByName(right)
        .select($"segment", $"split_day", $"gain")
        .orderBy($"segment")
    }, Some("""
      WITH daily AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
          CAST(sum(CAST(floor(value + 0.5) AS BIGINT)) AS BIGINT) AS dv,
          CAST(count(*) AS BIGINT) AS dn
        FROM events GROUP BY 1),
      r_t AS (SELECT CAST(sum(dv) AS BIGINT) AS tv, CAST(count(*) AS BIGINT) AS tn
        FROM daily),
      r_c AS (SELECT day, sum(dv) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum,
          CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k FROM daily),
      r_g AS (SELECT day,
          CAST((CAST(tn - k AS HUGEINT) * cum - CAST(k AS HUGEINT) * (tv - cum))
            * (CAST(tn - k AS HUGEINT) * cum - CAST(k AS HUGEINT) * (tv - cum))
            // (CAST(k AS HUGEINT) * (tn - k) * tn) AS HUGEINT) AS gain
        FROM r_c CROSS JOIN r_t WHERE k < tn),
      root AS (SELECT 'root' AS segment, day AS split_day,
          CAST(gain AS BIGINT) AS gain
        FROM r_g ORDER BY gain DESC, day LIMIT 1),
      l_d AS (SELECT d.* FROM daily d CROSS JOIN root WHERE d.day <= root.split_day),
      l_t AS (SELECT CAST(sum(dv) AS BIGINT) AS tv, CAST(count(*) AS BIGINT) AS tn
        FROM l_d),
      l_c AS (SELECT day, sum(dv) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum,
          CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k FROM l_d),
      l_g AS (SELECT day,
          CAST((CAST(tn - k AS HUGEINT) * cum - CAST(k AS HUGEINT) * (tv - cum))
            * (CAST(tn - k AS HUGEINT) * cum - CAST(k AS HUGEINT) * (tv - cum))
            // (CAST(k AS HUGEINT) * (tn - k) * tn) AS HUGEINT) AS gain
        FROM l_c CROSS JOIN l_t WHERE k < tn),
      lft AS (SELECT 'left' AS segment, day AS split_day,
          CAST(gain AS BIGINT) AS gain
        FROM l_g ORDER BY gain DESC, day LIMIT 1),
      r_d AS (SELECT d.* FROM daily d CROSS JOIN root WHERE d.day > root.split_day),
      rt_t AS (SELECT CAST(sum(dv) AS BIGINT) AS tv, CAST(count(*) AS BIGINT) AS tn
        FROM r_d),
      rt_c AS (SELECT day, sum(dv) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum,
          CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k FROM r_d),
      rt_g AS (SELECT day,
          CAST((CAST(tn - k AS HUGEINT) * cum - CAST(k AS HUGEINT) * (tv - cum))
            * (CAST(tn - k AS HUGEINT) * cum - CAST(k AS HUGEINT) * (tv - cum))
            // (CAST(k AS HUGEINT) * (tn - k) * tn) AS HUGEINT) AS gain
        FROM rt_c CROSS JOIN rt_t WHERE k < tn),
      rgt AS (SELECT 'right' AS segment, day AS split_day,
          CAST(gain AS BIGINT) AS gain
        FROM rt_g ORDER BY gain DESC, day LIMIT 1)
      SELECT segment, split_day, gain FROM root
      UNION ALL SELECT segment, split_day, gain FROM lft
      UNION ALL SELECT segment, split_day, gain FROM rgt
      ORDER BY segment""")),

    // ----- weight-of-evidence binning + information value -----------------
    // The credit-scoring feature-binning standard: bin a continuous
    // feature (order total price in cents) into 5 equal-depth bins
    // (q217's ntile form), call high-priority orders the "good" class,
    // and score each bin by WoE = ln(good share / bad share) with the
    // total Information Value Σ (g − b)·WoE saying whether the feature
    // separates the classes at all. Shares in parts-per-million, WoE in
    // micro-ln, the IV product in 128-bit. One pass bins, one aggregate
    // scores.
    ("q260_woe_iv", (s: SparkSession, dir: String) => {
      import s.implicits._
      val o0 = Tables.t(s, dir, "orders")
        .select(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"),
          $"o_orderkey".as("okey"),
          (substring($"o_orderpriority", 1, 1) <= "2").as("good"))
      // distributed exact ntile (r14; was a single-partition window over
      // every order row): GridRank.withNtile range-buckets on cents and
      // replays Spark's exact ntile fill rule — bit-identical ranks/bins
      // at any bucket count (GridRankSpec), bounded per-task state at
      // any scale. okey tie-break — the q237 total-order rule.
      val o = graft.ext.GridRank
        .withNtile(o0, 5, "cents", Seq($"okey"), "bin")
        .withColumn("bin", $"bin".cast("long"))
      val tot = o0.agg(
        sum(when($"good", 1L).otherwise(0L)).as("tg"),
        sum(when(!$"good", 1L).otherwise(0L)).as("tb"))
      val bins = o.groupBy($"bin")
        .agg(count(lit(1)).as("n"),
          sum(when($"good", 1L).otherwise(0L)).as("ng"),
          sum(when(!$"good", 1L).otherwise(0L)).as("nb"))
        .crossJoin(broadcast(tot))
        .withColumn("gs", expr("1000000 * ng div tg"))
        .withColumn("bs", expr("1000000 * nb div tb"))
        .withColumn("woe_micro",
          floor(log($"gs".cast("double") / $"bs".cast("double")) * 1e6 + 0.5)
            .cast("long"))
      bins.select($"bin", $"n", $"ng", $"nb", $"gs", $"bs", $"woe_micro",
          expr("CAST(CAST(gs - bs AS DECIMAL(38,0)) * woe_micro div 1000000 AS BIGINT)")
            .as("iv_part_micro"))
        .orderBy($"bin")
    }, Some("""
      WITH o AS (SELECT
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
          o_orderkey AS okey,
          (substr(o_orderpriority, 1, 1) <= '2') AS good FROM orders),
      b AS (SELECT *, CAST(ntile(5) OVER (ORDER BY cents, okey) AS BIGINT) AS bin
        FROM o),
      tot AS (SELECT CAST(sum(CASE WHEN good THEN 1 ELSE 0 END) AS BIGINT) AS tg,
          CAST(sum(CASE WHEN NOT good THEN 1 ELSE 0 END) AS BIGINT) AS tb FROM b),
      bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN good THEN 1 ELSE 0 END) AS BIGINT) AS ng,
          CAST(sum(CASE WHEN NOT good THEN 1 ELSE 0 END) AS BIGINT) AS nb
        FROM b GROUP BY 1),
      sc AS (SELECT bin, n, ng, nb,
          1000000 * ng // tg AS gs, 1000000 * nb // tb AS bs
        FROM bins CROSS JOIN tot),
      woe AS (SELECT *, CAST(floor(ln(CAST(gs AS DOUBLE) / CAST(bs AS DOUBLE))
            * 1e6 + 0.5) AS BIGINT) AS woe_micro FROM sc)
      SELECT bin, n, ng, nb, gs, bs, woe_micro,
        CAST(CAST(gs - bs AS HUGEINT) * woe_micro // 1000000 AS BIGINT)
          AS iv_part_micro
      FROM woe ORDER BY bin""")),

    // ----- leakage-free K-fold target encoding ----------------------------
    // Target encoding done RIGHT: each row's category encoding is the
    // target mean computed from the OTHER four folds — the standard
    // guard against the target leaking into its own feature (the naive
    // global mean memorizes rare categories). The trick that makes it
    // one pass: per-(category, fold) partial sums, then each fold's
    // encoding = (total − own fold) / (n_total − n_own) — no per-fold
    // rescans, K never multiplies the corpus work. Folds are
    // md5-deterministic; target = order price in cents; category =
    // customer market segment reached by a broadcast dim join. Output
    // is the encoding table per (segment, fold) plus its spread — the
    // honest check that fold encodings differ (if they didn't, the
    // leakage guard would be free). At 100 TB: one groupBy + a
    // |categories|·K rollup.
    ("q261_target_encoding", (s: SparkSession, dir: String) => {
      import s.implicits._
      val o = Tables.t(s, dir, "orders")
        .select($"o_custkey",
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("cents"),
          (conv(substring(md5(concat(lit("fold|"), $"o_orderkey".cast("string"))),
            1, 8), 16, 10).cast("long") % 5).as("fold"))
      val seg = Tables.t(s, dir, "customer").select($"c_custkey", $"c_mktsegment")
      val rows = o.join(broadcast(seg), $"o_custkey" === $"c_custkey")
      val pf = rows.groupBy($"c_mktsegment", $"fold")
        .agg(sum($"cents").as("s"), count(lit(1)).as("n"))
      val pt = pf.groupBy($"c_mktsegment")
        .agg(sum($"s").as("ts"), sum($"n").as("tn"))
      val enc = pf.join(pt, Seq("c_mktsegment"))
        .withColumn("enc_cents", expr("(ts - s) div (tn - n)"))
      val spread = enc.groupBy($"c_mktsegment")
        .agg(max($"enc_cents").as("mx"), min($"enc_cents").as("mn"))
      enc.join(spread, Seq("c_mktsegment"))
        .select($"c_mktsegment", $"fold", $"n", $"enc_cents",
          ($"mx" - $"mn").as("spread_cents"))
        .orderBy($"c_mktsegment", $"fold")
    }, Some("""
      WITH o AS (SELECT o_custkey,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
          ('0x' || substr(md5('fold|' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
            % 5 AS fold
        FROM orders),
      rows_ AS (SELECT c.c_mktsegment, o.cents, o.fold
        FROM o JOIN customer c ON o.o_custkey = c.c_custkey),
      pf AS (SELECT c_mktsegment, fold, CAST(sum(cents) AS BIGINT) AS s,
          CAST(count(*) AS BIGINT) AS n FROM rows_ GROUP BY 1, 2),
      pt AS (SELECT c_mktsegment, CAST(sum(s) AS BIGINT) AS ts,
          CAST(sum(n) AS BIGINT) AS tn FROM pf GROUP BY 1),
      enc AS (SELECT pf.c_mktsegment, pf.fold, pf.n,
          (pt.ts - pf.s) // (pt.tn - pf.n) AS enc_cents
        FROM pf JOIN pt ON pf.c_mktsegment = pt.c_mktsegment),
      spread AS (SELECT c_mktsegment, max(enc_cents) AS mx, min(enc_cents) AS mn
        FROM enc GROUP BY 1)
      SELECT e.c_mktsegment, e.fold, e.n, CAST(e.enc_cents AS BIGINT) AS enc_cents,
        CAST(s.mx - s.mn AS BIGINT) AS spread_cents
      FROM enc e JOIN spread s ON e.c_mktsegment = s.c_mktsegment
      ORDER BY e.c_mktsegment, e.fold""")),

    // ----- disparity-filter graph backbone --------------------------------
    // Backbone extraction (Serrano et al. 2009): in the weighted
    // part–supplier co-occurrence graph, keep an edge only if its
    // weight is statistically surprising against the null that a
    // node's strength spreads uniformly over its k neighbors:
    // p = (1 − w/s)^(k−1) < α. In micro-ln form the test clears to
    // (k−1)·ln(1 − w/s) < ln(α) — integer comparison, no powers. The
    // filter runs per edge endpoint with node strength/degree joined
    // from one aggregate; an edge survives if EITHER endpoint finds it
    // significant (the standard OR rule). Output: per-α row of edges
    // kept, weight retained, nodes covered — the sparsification curve
    // that turns a 10¹²-edge co-occurrence graph into something a
    // downstream algorithm can hold. All joins key on the node — the
    // co-partitioned q153 shape.
    ("q262_disparity_backbone", (s: SparkSession, dir: String) => {
      import s.implicits._
      val e0 = Tables.t(s, dir, "lineitem")
        .groupBy(($"l_partkey" * 2).as("u"), ($"l_suppkey" * 2 + 1).as("v"))
        .agg(count(lit(1)).as("w"))
      val e = e0.unionByName(e0.select($"v".as("u"), $"u".as("v"), $"w"))
      val nd = e.groupBy($"u").agg(sum($"w").as("s"), count(lit(1)).as("k"))
      val scored = e.join(nd, Seq("u"))
        .filter($"k" > 1) // a degree-1 node judges nothing
        .withColumn("lnp_micro",
          (($"k" - 1) * floor(log(lit(1.0) - $"w".cast("double") / $"s".cast("double"))
            * 1e6 + 0.5).cast("long")))
        .select(least($"u", $"v").as("a"), greatest($"u", $"v").as("b"),
          $"w", $"lnp_micro")
        .groupBy($"a", $"b").agg(max($"w").as("w"), min($"lnp_micro").as("lnp"))
      val alphas = Seq(("alpha_05", -2995732L), ("alpha_01", -4605170L))
      alphas.map { case (nm, lnA) =>
        scored.agg(
          sum(when($"lnp" < lnA, 1L).otherwise(0L)).as("edges_kept"),
          count(lit(1)).as("edges_total"),
          sum(when($"lnp" < lnA, $"w").otherwise(0L)).as("weight_kept"),
          sum($"w").as("weight_total"))
          .select(lit(nm).as("alpha"), $"edges_kept", $"edges_total",
            expr("1000000 * edges_kept div edges_total").as("edge_share_micro"),
            $"weight_kept", $"weight_total",
            expr("1000000 * weight_kept div weight_total").as("weight_share_micro"))
      }.reduce(_ unionByName _).orderBy($"alpha")
    }, Some("""
      WITH e0 AS (SELECT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v,
          CAST(count(*) AS BIGINT) AS w FROM lineitem GROUP BY 1, 2),
      e AS (SELECT u, v, w FROM e0 UNION ALL SELECT v AS u, u AS v, w FROM e0),
      nd AS (SELECT u, CAST(sum(w) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS k
        FROM e GROUP BY 1),
      sc AS (SELECT e.u, e.v, e.w,
          (nd.k - 1) * CAST(floor(ln(1.0 - CAST(e.w AS DOUBLE) / CAST(nd.s AS DOUBLE))
            * 1e6 + 0.5) AS BIGINT) AS lnp_micro
        FROM e JOIN nd ON e.u = nd.u WHERE nd.k > 1),
      und AS (SELECT least(u, v) AS a, greatest(u, v) AS b,
          CAST(max(w) AS BIGINT) AS w, CAST(min(lnp_micro) AS BIGINT) AS lnp
        FROM sc GROUP BY 1, 2),
      gates AS (SELECT 'alpha_05' AS alpha, CAST(-2995732 AS BIGINT) AS ln_a
        UNION ALL SELECT 'alpha_01', -4605170),
      agg AS (SELECT g.alpha,
          CAST(sum(CASE WHEN u.lnp < g.ln_a THEN 1 ELSE 0 END) AS BIGINT) AS edges_kept,
          CAST(count(*) AS BIGINT) AS edges_total,
          CAST(sum(CASE WHEN u.lnp < g.ln_a THEN u.w ELSE 0 END) AS BIGINT) AS weight_kept,
          CAST(sum(u.w) AS BIGINT) AS weight_total
        FROM und u CROSS JOIN gates g GROUP BY 1)
      SELECT alpha, edges_kept, edges_total,
        1000000 * edges_kept // edges_total AS edge_share_micro,
        weight_kept, weight_total,
        1000000 * weight_kept // weight_total AS weight_share_micro
      FROM agg ORDER BY alpha"""))
  )
}
