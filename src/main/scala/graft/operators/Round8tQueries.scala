package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 20: seasonal-trend decomposition (STL-lite), degree
  * assortativity, per-node clustering-coefficient distribution, a
  * hash-uniformity audit of the house md5 convention, and token
  * burstiness — time-series structure, graph texture, and two
  * statistics the rest of the battery silently relies on.
  *
  * House rules as elsewhere: integer arithmetic at every gate, 128-bit
  * (DECIMAL(38,0)/HUGEINT) where count products appear; where a final
  * SCALAR needs sqrt, exact integer aggregates convert to double only
  * in the last single-row expression (no distributed double sums — the
  * q250 sort-key rationale). Identical aliases both sides, total
  * ORDER BY.
  */
object Round8tQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  /** q272's oracle, shared verbatim by q354's staged form (the staged
    * execution is a pure physical re-plan — the answer is defined to
    * be bit-identical, so both gate against the same SQL).
    */
  private[graft] val LocalCcOracleSql = """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        FROM lineitem),
      e AS (SELECT DISTINCT a.pk AS a, b.pk AS b
        FROM items a JOIN items b ON a.ok = b.ok WHERE a.pk < b.pk),
      deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM
          (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
      keyed AS (SELECT e.a, e.b, da.deg AS da, db.deg AS db
        FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v),
      oriented AS (SELECT
          CASE WHEN (da, a) < (db, b) THEN a ELSE b END AS src,
          CASE WHEN (da, a) < (db, b) THEN b ELSE a END AS dst
        FROM keyed),
      wedge AS (SELECT o1.src, o1.dst AS x, o2.dst AS y
        FROM oriented o1 JOIN oriented o2 ON o1.src = o2.src
        WHERE o1.dst < o2.dst),
      tris AS (SELECT w.src, w.x, w.y FROM wedge w
        WHERE EXISTS (SELECT 1 FROM e WHERE e.a = w.x AND e.b = w.y)),
      pern AS (SELECT v, CAST(count(*) AS BIGINT) AS tri FROM
          (SELECT src AS v FROM tris UNION ALL SELECT x FROM tris
           UNION ALL SELECT y FROM tris) GROUP BY 1),
      cc AS (SELECT d.v, d.deg, coalesce(p.tri, 0) AS tri,
          CAST(1000000 * 2 * coalesce(p.tri, 0)
            // (CAST(d.deg AS HUGEINT) * (d.deg - 1)) AS BIGINT) AS cc_micro
        FROM deg d LEFT JOIN pern p ON d.v = p.v WHERE d.deg >= 2)
      SELECT CASE WHEN cc_micro >= 1000000 THEN 9
          ELSE cc_micro // 100000 END AS cc_bucket,
        CAST(count(*) AS BIGINT) AS n_nodes,
        CAST(sum(tri) AS BIGINT) AS tri_sum,
        CAST(sum(deg) AS BIGINT) AS deg_sum
      FROM cc GROUP BY 1 ORDER BY 1"""

  /** q272's shared graph inputs: the deduped co-purchase edge list
    * (checkpointed — degree, orientation and the closure semi-join
    * all reuse it), per-node degrees, and the degree-ordered
    * orientation (each triangle enumerated once, at its
    * minimal-(deg,id) vertex).
    */
  private def ccInputs(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    val items = Tables.t(s, dir, "lineitem")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val e = items.toDF("ok", "a").join(items.toDF("ok", "b"), Seq("ok"))
      .filter($"a" < $"b").select($"a", $"b").distinct()
      .localCheckpoint() // deg + orientation + closure share it
    val deg = e.select($"a".as("v")).unionByName(e.select($"b".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("deg"))
    val keyed = e
      .join(deg.select($"v".as("a"), $"deg".as("da")), Seq("a"))
      .join(deg.select($"v".as("b"), $"deg".as("db")), Seq("b"))
    val oriented = keyed.select(
      when(struct($"da", $"a") < struct($"db", $"b"), $"a").otherwise($"b").as("src"),
      when(struct($"da", $"a") < struct($"db", $"b"), $"b").otherwise($"a").as("dst"))
    (e, deg, oriented)
  }

  /** q272's tail: per-node cc = 2·tri/(d·(d−1)) from the per-node
    * triangle counts, histogrammed into ten micro-buckets.
    */
  private def ccHistogram(s: SparkSession, deg: DataFrame,
      perNode: DataFrame): DataFrame = {
    import s.implicits._
    val cc = deg.join(perNode, Seq("v"), "left")
      .filter($"deg" >= 2)
      .select($"v", $"deg", coalesce($"tri", lit(0L)).as("tri"))
      .withColumn("cc_micro", expr(
        "CAST(1000000 * 2 * tri div (CAST(deg AS DECIMAL(38,0)) * (deg - 1)) AS BIGINT)"))
    cc.groupBy(expr("CASE WHEN cc_micro >= 1000000 THEN 9 " +
        "ELSE cc_micro div 100000 END").as("cc_bucket"))
      .agg(count(lit(1)).as("n_nodes"), sum($"tri").as("tri_sum"),
        sum($"deg").as("deg_sum"))
      .orderBy($"cc_bucket")
  }

  /** The staged (disk-bounded) form of q272: bit-identical result,
    * executed as `slices` SEQUENTIAL sub-jobs. Slice b owns the
    * wedges whose SECOND leg y falls in `pmod(hash(y), slices) = b`:
    * a triangle is enumerated at exactly one oriented wedge
    * (src, x, y), and that wedge lives in exactly one slice, so the
    * per-slice per-node triangle counts are disjoint partial counts
    * that SUM to the global counts. Each slice reduces to ≤ |V| rows
    * and materializes eagerly before the next slice starts, so peak
    * shuffle/spill disk is Σd_out²/slices instead of the whole wedge
    * volume — the same per-task state bound as
    * Round8zQueries.adamicAdarStaged (bench/r09_scale100_q272.json is
    * the single-shot ×100 failure baseline). Degrees and the
    * orientation are checkpointed once so slices re-scan, not
    * recompute, them.
    */
  private[graft] def localClusteringStaged(s: SparkSession, dir: String,
      slices: Int): DataFrame = {
    import s.implicits._
    val (e, deg0, oriented0) = ccInputs(s, dir)
    val deg = deg0.localCheckpoint()
    val oriented = oriented0.localCheckpoint()
    // same measured-size broadcast pick as the single-shot form (one
    // count decides for every slice's closure semi-join)
    val closure = AdaptiveJoin.broadcastIfSmall(
      e.select($"a".as("x"), $"b".as("y")))
    // NOT width-pinned (r14, measured): the slice wedge join here is a
    // broadcast probe over the 10-partition orientation checkpoint with
    // NO exchange on the probe side — ~9.5 task-s per slice across 10
    // balanced tasks. Repartitioning the probe leg to 32 was tried and
    // made the slice stages 4.5× more expensive (extra shuffle + wider
    // sort/build overhead for tiny per-task work); reverted. The r13
    // pin rule applies to STARVED CPU-dense stages, not balanced ones.
    val parts = (0 until slices).map { b =>
      val wedge = oriented.toDF("src", "x")
        .join(oriented.filter(pmod(hash($"dst"), lit(slices)) === b)
          .toDF("src", "y"), Seq("src"))
        .filter($"x" < $"y")
      val tris = wedge
        .join(closure, Seq("x", "y"), "left_semi")
        .select($"src", $"x", $"y")
      val pn = tris.select(explode(array($"src", $"x", $"y")).as("v"))
        .groupBy($"v").agg(count(lit(1)).as("tri"))
        .localCheckpoint() // eager: THIS slice's job runs to completion here
      // finished slice's shuffle lineage is now unreferenced; a GC lets
      // the ContextCleaner drop its shuffle files before the next slice
      if (slices > 1) System.gc()
      pn
    }
    val perNode = parts.reduce(_ unionByName _)
      .groupBy($"v").agg(sum($"tri").as("tri"))
    ccHistogram(s, deg, perNode)
  }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- STL-lite seasonal decomposition --------------------------------
    // Trend = centered 7-day moving average (full windows only),
    // seasonal = mean detrended value per weekday, remainder = what's
    // left; the variance split between seasonal and remainder says
    // whether the weekly cycle is real structure or noise — the
    // decomposition read q168's hour-of-day monitor and q223's
    // backtest both assume. Weekday indexing is pure arithmetic
    // (days-since-epoch mod 7, 0 = Thursday) so both engines share it
    // without calendar APIs. Every mean is an integer division of
    // exact sums; the two sums of squares are 128-bit and ride along
    // on every weekday row (one cross-joined scalar). |days|-bounded
    // after the daily pre-aggregate — the q229 scale shape.
    ("q270_stl_lite", (s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.t(s, dir, "events")
        .select(datediff(to_date($"ts".cast("timestamp")),
          lit("1970-01-01").cast("date")).cast("long").as("epd"),
          floor($"value" + 0.5).cast("long").as("v"))
        .groupBy($"epd").agg(sum($"v").as("dv"))
      val w = Window.orderBy($"epd").rowsBetween(-3, 3)
      val tr = daily
        .withColumn("wn", count(lit(1)).over(w))
        .withColumn("ts7", sum($"dv").over(w))
        .withColumn("trend", expr("ts7 div 7"))
        .filter($"wn" === 7)
        .withColumn("dt", $"dv" - $"trend")
        .withColumn("dow", $"epd" % 7)
        .localCheckpoint() // seasonal means + both SS rollups reuse it
      val seas = tr.groupBy($"dow")
        .agg(count(lit(1)).as("n_days"), expr("sum(dt) div count(1)").as("seasonal_units"))
      val joined = tr.join(seas.select($"dow", $"seasonal_units"), Seq("dow"))
        .withColumn("rem", $"dt" - $"seasonal_units")
      val ss = joined.agg(
        sum(expr("CAST(dt AS DECIMAL(38,0)) * dt")).cast("long").as("ss_detrended"),
        sum(expr("CAST(rem AS DECIMAL(38,0)) * rem")).cast("long").as("ss_remainder"))
      seas.crossJoin(broadcast(ss))
        .select($"dow", $"n_days", $"seasonal_units", $"ss_detrended", $"ss_remainder")
        .orderBy($"dow")
    }, Some("""
      WITH daily AS (SELECT
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS epd,
          CAST(sum(CAST(floor(value + 0.5) AS BIGINT)) AS BIGINT) AS dv
        FROM events GROUP BY 1),
      tr AS (SELECT epd, dv,
          count(*) OVER w7 AS wn,
          sum(dv) OVER w7 // 7 AS trend
        FROM daily WINDOW w7 AS (ORDER BY epd ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      f AS (SELECT epd, dv, dv - trend AS dt, epd % 7 AS dow FROM tr WHERE wn = 7),
      seas AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
          CAST(sum(dt) // count(*) AS BIGINT) AS seasonal_units
        FROM f GROUP BY 1),
      j AS (SELECT f.dow, f.dt, f.dt - s.seasonal_units AS rem
        FROM f JOIN seas s ON f.dow = s.dow),
      ss AS (SELECT CAST(sum(CAST(dt AS HUGEINT) * dt) AS BIGINT) AS ss_detrended,
          CAST(sum(CAST(rem AS HUGEINT) * rem) AS BIGINT) AS ss_remainder FROM j)
      SELECT s.dow, s.n_days, s.seasonal_units, ss.ss_detrended, ss.ss_remainder
      FROM seas s CROSS JOIN ss ORDER BY s.dow""")),

    // ----- degree assortativity -------------------------------------------
    // Newman's r: do high-degree nodes attach to high-degree nodes?
    // Positive r (social-network-like) and negative r (hub-and-spoke,
    // typical of bipartite supply graphs) demand different partition
    // and skew strategies, so this one number is a planning input for
    // every other graph operator. Computed as the Pearson correlation
    // of endpoint degrees over the directed edge list: five exact
    // integer aggregates (Σx, Σy, Σxy, Σx², Σy²) in 128-bit; the final
    // sqrt happens on ONE row after converting those exact integers to
    // double — never a distributed double sum.
    ("q271_degree_assortativity", (s: SparkSession, dir: String) => {
      import s.implicits._
      val e0 = Tables.t(s, dir, "lineitem")
        .select(($"l_partkey" * 2).as("u"), ($"l_suppkey" * 2 + 1).as("v"))
        .distinct()
      val e = e0.unionByName(e0.select($"v".as("u"), $"u".as("v")))
      val deg = e.groupBy($"u").agg(count(lit(1)).as("d"))
      val xy = e
        .join(deg.select($"u", $"d".as("x")), Seq("u"))
        .join(deg.select($"u".as("v"), $"d".as("y")), Seq("v"))
      val agg = xy.agg(count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sx2"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("sy2"))
      agg.select($"n",
        expr("""CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
          * 1e6 + 0.5) AS BIGINT)""").as("r_micro"))
    }, Some("""
      WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM lineitem),
      e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
      xy AS (SELECT dx.d AS x, dy.d AS y FROM e
        JOIN deg dx ON e.u = dx.u JOIN deg dy ON e.v = dy.u),
      agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
          sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
          sum(CAST(x AS HUGEINT) * y) AS sxy,
          sum(CAST(x AS HUGEINT) * x) AS sx2,
          sum(CAST(y AS HUGEINT) * y) AS sy2
        FROM xy)
      SELECT n,
        CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
          * 1e6 + 0.5) AS BIGINT) AS r_micro
      FROM agg""")),

    // ----- local clustering-coefficient distribution ----------------------
    // q160 reports the GLOBAL clustering coefficient; the per-node
    // distribution is what distinguishes a uniformly-clustered graph
    // from one where a few dense pockets carry everything — the read
    // that decides whether community detection is worth running. Same
    // degree-ordered orientation as q160 (each triangle enumerated
    // once, at its minimal-(deg,id) vertex, wedge join bounded by
    // Σd_out²), then each triangle explodes to its three corners for the
    // per-node counts, and local cc = 2·tri/(d·(d−1)) histograms into
    // ten micro-buckets. The co-purchase projection graph, as q160.
    ("q272_local_clustering", (s: SparkSession, dir: String) => {
      import s.implicits._
      val (e, deg, oriented) = ccInputs(s, dir)
      val wedge = oriented.toDF("src", "x").join(oriented.toDF("src", "y"), Seq("src"))
        .filter($"x" < $"y")
      // closure check: broadcast the measured-small edge set so the
      // Σd_out²-bounded wedge stream is never shuffled/sorted (guide §3.1)
      val tris = wedge
        .join(AdaptiveJoin.broadcastIfSmall(e.select($"a".as("x"), $"b".as("y"))),
          Seq("x", "y"), "left_semi")
        .select($"src", $"x", $"y")
      val perNode = tris.select(explode(array($"src", $"x", $"y")).as("v"))
        .groupBy($"v").agg(count(lit(1)).as("tri"))
      ccHistogram(s, deg, perNode)
    }, Some(LocalCcOracleSql)),

    // ----- hash-uniformity audit (chi-square) -----------------------------
    // The whole battery leans on "md5 buckets are uniform" (folds,
    // samples, salts, policies); this audits the assumption with a
    // chi-square against uniform over 64 buckets, on two key sets of
    // different cardinality (500 doc ids, 15k order keys at sf0.01).
    // Scaled to integers: χ² = (k·Σo² − n²)/n, squares in 128-bit;
    // compared against the χ²(63) 5% critical value as a micro
    // constant. The honest reading matters: a healthy hash EXCEEDS the
    // 5% critical one time in twenty — the dev sweep across salts saw
    // 48–87 around the expected 63 — so one marginal flag across key
    // sets is the statistic working, while a large exceedance would
    // invalidate half the determinism conventions. One scan per key
    // type, 64-cell rollups. (Hashing a key space SMALLER than the
    // bucket count — e.g. this generator's 31-token vocabulary — can
    // never be occurrence-uniform; audit keys, not weighted
    // occurrences.)
    ("q273_hash_uniformity", (s: SparkSession, dir: String) => {
      import s.implicits._
      val crit = 82529000L // chi2(63) at 5%, micro
      val ids = Tables.t(s, dir, "documents")
        .select(conv(substring(md5(concat(lit("u|"), $"doc_id".cast("string"))),
          1, 8), 16, 10).cast("long") % 64)
        .toDF("bucket").withColumn("key_type", lit("doc_id"))
      val oks = Tables.t(s, dir, "orders")
        .select($"o_orderkey").distinct()
        .select((conv(substring(md5(concat(lit("u|"), $"o_orderkey".cast("string"))),
          1, 8), 16, 10).cast("long") % 64).as("bucket"))
        .withColumn("key_type", lit("o_orderkey"))
      val cells = ids.unionByName(oks)
        .groupBy($"key_type", $"bucket").agg(count(lit(1)).as("o"))
      cells.groupBy($"key_type")
        .agg(sum($"o").as("n"), count(lit(1)).as("k_used"),
          sum(expr("CAST(o AS DECIMAL(38,0)) * o")).as("so2"))
        .select($"key_type", $"n", $"k_used",
          // χ² = Σ(o − n/k)²·k/n = (k·Σo² − n²)/n — empty buckets are
          // absorbed by the identity (Σo = n over all k buckets)
          expr("""CAST(1000000 * (CAST(64 AS DECIMAL(38,0)) * so2
            - CAST(n AS DECIMAL(38,0)) * n) div n AS BIGINT)""")
            .as("chi2_micro"),
          lit(crit).as("crit_micro"))
        .withColumn("uniform_ok", ($"chi2_micro" < $"crit_micro").cast("long"))
        .orderBy($"key_type")
    }, Some(s"""
      WITH ids AS (SELECT 'doc_id' AS key_type,
          ('0x' || substr(md5('u|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            % 64 AS bucket
        FROM documents),
      oks AS (SELECT 'o_orderkey' AS key_type,
          ('0x' || substr(md5('u|' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
            % 64 AS bucket
        FROM (SELECT DISTINCT o_orderkey FROM orders)),
      cells AS (SELECT key_type, bucket, CAST(count(*) AS BIGINT) AS o
        FROM (SELECT * FROM ids UNION ALL SELECT * FROM oks)
        GROUP BY 1, 2),
      agg AS (SELECT key_type, CAST(sum(o) AS BIGINT) AS n,
          CAST(count(*) AS BIGINT) AS k_used,
          sum(CAST(o AS HUGEINT) * o) AS so2
        FROM cells GROUP BY 1)
      SELECT key_type, n, k_used,
        CAST(1000000 * (CAST(64 AS HUGEINT) * so2
          - CAST(n AS HUGEINT) * n) // n AS BIGINT) AS chi2_micro,
        CAST(82529000 AS BIGINT) AS crit_micro,
        CAST(CASE WHEN 1000000 * (CAST(64 AS HUGEINT) * so2
          - CAST(n AS HUGEINT) * n) // n < 82529000
          THEN 1 ELSE 0 END AS BIGINT) AS uniform_ok
      FROM agg ORDER BY key_type""")),

    // ----- token burstiness (variance-to-mean ratio) ----------------------
    // Church & Gale: content words are BURSTY (a document that uses a
    // term uses it repeatedly), function words are Poisson-like. The
    // variance-to-mean ratio over per-document counts — zeros included,
    // via the identity VMR = (D·Σc² − T²)/(D·T) needing only the
    // docs-that-contain counts — separates the two, and is the signal
    // behind df-vs-tf weighting choices (q86/q182). Top-20 corpus
    // terms, ratios in micro, 128-bit products. One token aggregate +
    // one |vocab|-bounded rollup; D rides along as a broadcast scalar.
    ("q274_token_burstiness", (s: SparkSession, dir: String) => {
      import s.implicits._
      val perDoc = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", explode(split(TA.normText($"text"), " ")).as("tok"))
        .filter(length($"tok") > 0)
        .groupBy($"tok", $"doc_id").agg(count(lit(1)).as("c"))
      val d = Tables.t(s, dir, "documents").agg(count(lit(1)).as("nd"))
      val terms = perDoc.groupBy($"tok")
        .agg(sum($"c").as("t"), count(lit(1)).as("docs_with"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sc2"))
      terms.crossJoin(broadcast(d))
        .withColumn("vmr_micro", expr(
          """CAST(1000000 * (CAST(nd AS DECIMAL(38,0)) * sc2
             - CAST(t AS DECIMAL(38,0)) * t)
             div (CAST(nd AS DECIMAL(38,0)) * t) AS BIGINT)"""))
        .orderBy(desc("t"), $"tok").limit(20)
        .select($"tok", $"t".as("total"), $"docs_with", $"vmr_micro")
        .orderBy(desc("total"), $"tok")
    }, Some(s"""
      WITH pd AS (SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS c FROM
          (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
           FROM documents)
        WHERE len(tok) > 0 GROUP BY 1, 2),
      d AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
      terms AS (SELECT tok, CAST(sum(c) AS BIGINT) AS t,
          CAST(count(*) AS BIGINT) AS docs_with,
          sum(CAST(c AS HUGEINT) * c) AS sc2
        FROM pd GROUP BY 1),
      top AS (SELECT * FROM terms CROSS JOIN d
        ORDER BY t DESC, tok LIMIT 20)
      SELECT tok, t AS total, docs_with,
        CAST(1000000 * (CAST(nd AS HUGEINT) * sc2 - CAST(t AS HUGEINT) * t)
          // (CAST(nd AS HUGEINT) * t) AS BIGINT) AS vmr_micro
      FROM top ORDER BY total DESC, tok"""))
  )
}
