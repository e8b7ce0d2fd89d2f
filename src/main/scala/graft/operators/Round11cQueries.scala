package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 3: robust-trend, agreement, association, and the
  * heteroscedastic k-sample mean test — plus the squared-scatter
  * Davies–Bouldin clustering validity index over the quantized
  * embedding space. Same float discipline as Round11bQueries: exact
  * integer/DECIMAL aggregates at data scale, doubles only in final
  * bounded-cardinality expression chains, multi-term float sums always
  * folded over an explicitly sorted list so both engines add in the
  * same order.
  */
object Round11cQueries {

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- Theil–Sen robust slope -----------------------------------------
    // Median-of-pairwise-slopes trend estimate of the daily event
    // volume — the robust partner to q295's Mann–Kendall trend TEST
    // (q295 answers "is there a monotone trend", this answers "how
    // steep", both immune to outlier days). Pairs enumerate the DAY
    // GRID, not events: one count-per-day aggregate, then a broadcast
    // grid self-join (G·(G−1)/2 slope rows for G days — bounded by the
    // calendar, not the data). Median = the explicit middle elements
    // of the sorted slope multiset (average of two middles when even —
    // a 2-term float sum, which IEEE addition makes order-proof), same
    // again for the per-day intercepts y − slope·x. The slope window
    // runs single-task over the bounded grid by construction
    // (partitionBy(lit(0)) states the intent, as GridCumulative does).
    ("q361_theilsen_slope", (s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.t(s, dir, "events")
        .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("y"))
        .withColumn("x", datediff($"d", lit("1970-01-01")).cast("long"))
        .select($"x", $"y").localCheckpoint()
      val d2 = daily.select($"x".as("x2"), $"y".as("y2"))
      val slopes = daily.crossJoin(broadcast(d2)).filter($"x2" > $"x")
        .select((($"y2" - $"y").cast("double") /
          ($"x2" - $"x").cast("double")).as("sl"))
      def medianOf(df: DataFrame, c: String): DataFrame = {
        val w = Window.partitionBy(lit(0)).orderBy(col(c))
        val m = df.agg(count(lit(1)).as("m"))
        df.withColumn("rn", row_number().over(w).cast("long"))
          .crossJoin(broadcast(m))
          .filter($"rn" === expr("(m + 1) div 2") ||
            $"rn" === expr("(m + 2) div 2"))
          .agg(avg(col(c)).as(s"${c}_med"), first($"m").as(s"${c}_n"))
      }
      val sm = medianOf(slopes, "sl")
      val betas = daily.crossJoin(broadcast(sm))
        .select(($"y".cast("double") - $"sl_med" * $"x".cast("double"))
          .as("b"))
      medianOf(betas, "b").crossJoin(broadcast(sm))
        .select($"sl_n".as("n_pairs"), $"sl_med".as("slope_med"),
          $"b_med".as("intercept_med"))
    }, Some("""
      WITH daily AS (SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1),
      dx AS (SELECT CAST(d - DATE '1970-01-01' AS BIGINT) AS x, y FROM daily),
      sl AS (SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS sl
        FROM dx a, dx b WHERE b.x > a.x),
      sr AS (SELECT sl, CAST(row_number() OVER (ORDER BY sl) AS BIGINT) AS rn,
          CAST(count(*) OVER () AS BIGINT) AS m FROM sl),
      sm AS (SELECT avg(sl) AS sl_med, first(m) AS n_pairs FROM sr
        WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2),
      bt AS (SELECT CAST(y AS DOUBLE) - sl_med * CAST(x AS DOUBLE) AS b
        FROM dx, sm),
      br AS (SELECT b, CAST(row_number() OVER (ORDER BY b) AS BIGINT) AS rn,
          CAST(count(*) OVER () AS BIGINT) AS m FROM bt),
      bm AS (SELECT avg(b) AS b_med FROM br
        WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2)
      SELECT n_pairs, sl_med AS slope_med, b_med AS intercept_med
      FROM sm, bm""")),

    // ----- Fleiss κ (multi-rater agreement) -------------------------------
    // Chance-corrected agreement among 5 deterministic "raters" (each
    // applies a different length threshold 150+10r to call a doc
    // long), the multi-rater generalization of q253's two-rater Cohen
    // κ. Because the raters are threshold functions, the per-doc
    // "raters saying long" count x is just how many thresholds the doc
    // clears — one map-only pass, three integer sums, and the shared
    // Fleiss expression chain (Round11bQueries.FleissSql) on both
    // engines. Nothing here shuffles more than one row.
    ("q362_fleiss_kappa", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.t(s, dir, "documents").select($"n_chars")
        .withColumn("x", (0 to 4)
          .map(r => ($"n_chars" >= 150 + 10 * r).cast("long")).reduce(_ + _))
      val agg = d.agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"x" * $"x" + (lit(5L) - $"x") * (lit(5L) - $"x")).as("spp"))
      agg.select($"n" +: Round11bQueries.FleissSql.map(expr): _*)
    }, Some(s"""
      WITH d AS (SELECT (CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END
          + CASE WHEN n_chars >= 160 THEN 1 ELSE 0 END
          + CASE WHEN n_chars >= 170 THEN 1 ELSE 0 END
          + CASE WHEN n_chars >= 180 THEN 1 ELSE 0 END
          + CASE WHEN n_chars >= 190 THEN 1 ELSE 0 END) AS x
        FROM documents),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
          CAST(sum(x*x + (5 - x)*(5 - x)) AS BIGINT) AS spp FROM d)
      SELECT n, ${Round11bQueries.FleissSql.mkString(",\n        ")}
      FROM a""")),

    // ----- Cramér's V (lang × source association) -------------------------
    // Effect-size partner to q235's mutual information on the same
    // metadata pair: χ² over the FULL r×c contingency grid (including
    // empty cells, which still carry their expected mass) and
    // V = sqrt(χ² / (N·min(r−1, c−1))). The grid is the complete
    // row-total × col-total cross join (bounded: langs × sources) left
    // joined against observed counts; every χ² term is one double
    // expression over integer aggregates, and the cell sum folds in
    // (lang, source) order on both engines.
    ("q363_cramers_v", (s: SparkSession, dir: String) => {
      import s.implicits._
      val ct = Tables.t(s, dir, "documents")
        .groupBy($"lang", $"source").agg(count(lit(1)).as("o"))
        .localCheckpoint()
      val rowt = ct.groupBy($"lang").agg(sum($"o").as("rt"))
      val colt = ct.groupBy($"source").agg(sum($"o").as("ctt"))
      val tot = ct.agg(sum($"o").as("n"),
        countDistinct($"lang").as("r"), countDistinct($"source").as("c"))
      val full = rowt.crossJoin(colt)
        .join(ct, Seq("lang", "source"), "left")
        .withColumn("o", coalesce($"o", lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("term", expr(
          """(CAST(o AS DOUBLE)*CAST(n AS DOUBLE) - CAST(rt AS DOUBLE)*CAST(ctt AS DOUBLE))
             * (CAST(o AS DOUBLE)*CAST(n AS DOUBLE) - CAST(rt AS DOUBLE)*CAST(ctt AS DOUBLE))
             / (CAST(rt AS DOUBLE)*CAST(ctt AS DOUBLE)*CAST(n AS DOUBLE))"""))
      full.groupBy($"n", $"r", $"c")
        .agg(collect_list(struct($"lang", $"source", $"term")).as("ts"))
        .withColumn("chi2", expr(
          "aggregate(array_sort(ts), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"))
        .select($"n", (($"r" - 1) * ($"c" - 1)).as("dof"), $"chi2",
          expr("""sqrt(chi2 / (CAST(n AS DOUBLE) *
            CAST(least(r - 1, c - 1) AS DOUBLE)))""").as("v"))
    }, Some("""
      WITH ct AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        FROM documents GROUP BY 1, 2),
      rowt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM ct GROUP BY 1),
      colt AS (SELECT source, CAST(sum(o) AS BIGINT) AS ctt FROM ct GROUP BY 1),
      tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
          CAST(count(DISTINCT lang) AS BIGINT) AS r,
          CAST(count(DISTINCT source) AS BIGINT) AS c FROM ct),
      fl AS (SELECT rowt.lang, colt.source, rt, ctt,
          COALESCE(ct.o, 0) AS o
        FROM rowt CROSS JOIN colt
        LEFT JOIN ct ON ct.lang = rowt.lang AND ct.source = colt.source),
      tm AS (SELECT lang, source,
          (CAST(o AS DOUBLE)*CAST(n AS DOUBLE) - CAST(rt AS DOUBLE)*CAST(ctt AS DOUBLE))
            * (CAST(o AS DOUBLE)*CAST(n AS DOUBLE) - CAST(rt AS DOUBLE)*CAST(ctt AS DOUBLE))
            / (CAST(rt AS DOUBLE)*CAST(ctt AS DOUBLE)*CAST(n AS DOUBLE)) AS term
        FROM fl, tot),
      f AS (SELECT list_reduce(list(term ORDER BY lang, source),
          (a, b) -> a + b) AS chi2 FROM tm)
      SELECT n, (r - 1) * (c - 1) AS dof, chi2,
        sqrt(chi2 / (CAST(n AS DOUBLE) * CAST(least(r - 1, c - 1) AS DOUBLE))) AS v
      FROM f, tot""")),

    // ----- Welch's heteroscedastic one-way ANOVA --------------------------
    // Does mean document length differ across the 20 sources WITHOUT
    // assuming equal variances — the k-sample Welch F* with
    // Satterthwaite-style df2. q224 is the two-proportion A/B z-test
    // and q338 trims a single mean; this is the unequal-variance
    // k-group mean comparison. Per-group n, Σx, Σx² are exact (Σx² in
    // DECIMAL — long would wrap at petabyte row counts); the three
    // k-term float reductions (ΣW and Σwm, then the numerator and df
    // sums, which need the weighted grand mean first) fold
    // source-sorted lists on both engines.
    ("q364_welch_anova", (s: SparkSession, dir: String) => {
      import s.implicits._
      val g = Tables.t(s, dir, "documents")
        .groupBy($"source").agg(
          count(lit(1)).as("nj"), sum($"n_chars").as("sx"),
          sum($"n_chars".cast("decimal(38,0)") * $"n_chars").as("sxx"))
        .withColumn("mj", expr("CAST(sx AS DOUBLE) / CAST(nj AS DOUBLE)"))
        .withColumn("s2j", expr(
          """(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(nj AS DOUBLE))
             / (CAST(nj AS DOUBLE) - 1.0)"""))
        .withColumn("wj", expr("CAST(nj AS DOUBLE) / s2j"))
        .withColumn("wmj", expr("wj * mj"))
      val st1 = g.agg(count(lit(1)).as("k"),
          collect_list(struct($"source", $"wj", $"wmj")).as("ts"))
        .withColumn("bigw", expr(
          "aggregate(array_sort(ts), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.wj)"))
        .withColumn("mw", expr(
          "aggregate(array_sort(ts), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.wmj) / bigw"))
        .select($"k", $"bigw", $"mw")
      val terms = g.crossJoin(broadcast(st1))
        .withColumn("aj", expr("wj * (mj - mw) * (mj - mw)"))
        .withColumn("bj", expr(
          """(1.0 - wj/bigw) * (1.0 - wj/bigw) / (CAST(nj AS DOUBLE) - 1.0)"""))
      terms.groupBy($"k")
        .agg(collect_list(struct($"source", $"aj", $"bj")).as("ts"))
        .withColumn("suma", expr(
          "aggregate(array_sort(ts), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.aj)"))
        .withColumn("sumb", expr(
          "aggregate(array_sort(ts), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.bj)"))
        .select($"k",
          expr("""(suma / (CAST(k AS DOUBLE) - 1.0)) /
            (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0) /
             (CAST(k AS DOUBLE)*CAST(k AS DOUBLE) - 1.0) * sumb)""").as("f_welch"),
          ($"k" - 1).as("df1"),
          expr("""(CAST(k AS DOUBLE)*CAST(k AS DOUBLE) - 1.0) / (3.0 * sumb)""")
            .as("df2"))
    }, Some("""
      WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS nj,
          CAST(sum(n_chars) AS BIGINT) AS sx,
          sum(CAST(n_chars AS DECIMAL(38,0)) * n_chars) AS sxx
        FROM documents GROUP BY 1),
      g2 AS (SELECT source, nj,
          CAST(sx AS DOUBLE) / CAST(nj AS DOUBLE) AS mj,
          (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(nj AS DOUBLE))
            / (CAST(nj AS DOUBLE) - 1.0) AS s2j
        FROM g),
      g3 AS (SELECT source, nj, mj, CAST(nj AS DOUBLE) / s2j AS wj FROM g2),
      st1 AS (SELECT CAST(count(*) AS BIGINT) AS k,
          list_reduce(list(wj ORDER BY source), (a, b) -> a + b) AS bigw,
          list_reduce(list(wj * mj ORDER BY source), (a, b) -> a + b) AS swm
        FROM g3),
      st2 AS (SELECT k, bigw, swm / bigw AS mw FROM st1),
      tm AS (SELECT source, wj * (mj - mw) * (mj - mw) AS aj,
          (1.0 - wj/bigw) * (1.0 - wj/bigw) / (CAST(nj AS DOUBLE) - 1.0) AS bj
        FROM g3, st2),
      f AS (SELECT
          list_reduce(list(aj ORDER BY source), (a, b) -> a + b) AS suma,
          list_reduce(list(bj ORDER BY source), (a, b) -> a + b) AS sumb
        FROM tm)
      SELECT k,
        (suma / (CAST(k AS DOUBLE) - 1.0)) /
          (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0) /
           (CAST(k AS DOUBLE)*CAST(k AS DOUBLE) - 1.0) * sumb) AS f_welch,
        k - 1 AS df1,
        (CAST(k AS DOUBLE)*CAST(k AS DOUBLE) - 1.0) / (3.0 * sumb) AS df2
      FROM f, st2""")),

    // ----- Davies–Bouldin index (squared-scatter form) --------------------
    // Clustering validity over the labeled embedding space: for each
    // cluster the mean SQUARED distance to its centroid (S²), for each
    // pair the squared centroid distance (M²), DB* = mean over
    // clusters of max_j (S²_i + S²_j)/M²_ij. The squared form is
    // chosen deliberately: S² = (ΣΣv² − Σ_d (Σ_d v)²/n)/n needs no
    // per-point sqrt, so the whole index derives from per-(label, dim)
    // integer sums over the q130-style ×10⁴-quantized grid — one
    // aggregate pass over points, then label-pair math on a k×d table.
    // Complements q130 (cohesion) / q131 (separation): DB* is the
    // RATIO index that trades them off per worst-case neighbor. All
    // dim sums fold in dim order; pair maxima and the final k-term
    // mean fold over sorted bounded lists.
    ("q365_davies_bouldin", (s: SparkSession, dir: String) => {
      import s.implicits._
      val e = Tables.spread(Tables.t(s, dir, "embeddings"))
        .select($"label", posexplode($"embedding").as(Seq("j0", "x")))
        .select($"label", ($"j0" + 1).as("j"),
          round($"x".cast("double") * 10000).cast("long").as("v"))
      val perLJ = e.groupBy($"label", $"j").agg(
        sum($"v").as("sx"),
        sum($"v".cast("decimal(38,0)") * $"v").as("sxx"),
        count(lit(1)).as("nl")).localCheckpoint()
      val s2 = perLJ.groupBy($"label", $"nl")
        .agg(collect_list(struct($"j", $"sx", $"sxx")).as("ds"))
        .withColumn("s2", expr(
          """aggregate(array_sort(ds), CAST(0.0 AS DOUBLE), (acc, x) ->
               acc + (CAST(x.sxx AS DOUBLE)
                 - CAST(x.sx AS DOUBLE)*CAST(x.sx AS DOUBLE)/CAST(nl AS DOUBLE)))
             / CAST(nl AS DOUBLE)"""))
        .select($"label", $"nl", $"s2")
      val a = perLJ.select($"label".as("li"), $"j", $"sx".as("sxi"), $"nl".as("ni"))
      val b = perLJ.select($"label".as("lj"), $"j", $"sx".as("sxj"), $"nl".as("nj2"))
      val m2 = a.join(b, Seq("j")).filter($"li" < $"lj")
        .withColumn("dterm", expr(
          """(CAST(sxi AS DOUBLE)/CAST(ni AS DOUBLE) - CAST(sxj AS DOUBLE)/CAST(nj2 AS DOUBLE))
             * (CAST(sxi AS DOUBLE)/CAST(ni AS DOUBLE) - CAST(sxj AS DOUBLE)/CAST(nj2 AS DOUBLE))"""))
        .groupBy($"li", $"lj")
        .agg(collect_list(struct($"j", $"dterm")).as("ds"))
        .withColumn("m2", expr(
          "aggregate(array_sort(ds), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.dterm)"))
        .select($"li", $"lj", $"m2")
      val sI = s2.select($"label".as("li"), $"s2".as("s2i"))
      val sJ = s2.select($"label".as("lj"), $"s2".as("s2j"))
      val r = m2.join(broadcast(sI), Seq("li")).join(broadcast(sJ), Seq("lj"))
        .withColumn("rij", expr("(s2i + s2j) / m2"))
      val sym = r.select($"li".as("l"), $"rij")
        .union(r.select($"lj".as("l"), $"rij"))
      val perL = sym.groupBy($"l").agg(max($"rij").as("rmax"))
      perL.agg(count(lit(1)).as("k"),
          collect_list(struct($"l", $"rmax")).as("ts"))
        .select($"k", expr(
          """aggregate(array_sort(ts), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.rmax)
             / CAST(k AS DOUBLE)""").as("db_sq"))
    }, Some("""
      WITH e AS (SELECT label, CAST(j AS BIGINT) AS j,
          CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) AS v
        FROM (SELECT label, unnest(embedding) AS x,
          generate_subscripts(embedding, 1) AS j FROM embeddings)),
      plj AS (SELECT label, j, CAST(sum(v) AS BIGINT) AS sx,
          sum(CAST(v AS DECIMAL(38,0)) * v) AS sxx,
          CAST(count(*) AS BIGINT) AS nl
        FROM e GROUP BY 1, 2),
      s2 AS (SELECT label, nl,
          list_reduce(list(CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(nl AS DOUBLE)
            ORDER BY j), (a, b) -> a + b) / CAST(nl AS DOUBLE) AS s2
        FROM plj GROUP BY label, nl),
      pr AS (SELECT a.label AS li, b.label AS lj, a.j,
          (CAST(a.sx AS DOUBLE)/CAST(a.nl AS DOUBLE) - CAST(b.sx AS DOUBLE)/CAST(b.nl AS DOUBLE))
            * (CAST(a.sx AS DOUBLE)/CAST(a.nl AS DOUBLE) - CAST(b.sx AS DOUBLE)/CAST(b.nl AS DOUBLE)) AS dterm
        FROM plj a JOIN plj b USING (j) WHERE a.label < b.label),
      m2 AS (SELECT li, lj,
          list_reduce(list(dterm ORDER BY j), (a, b) -> a + b) AS m2
        FROM pr GROUP BY 1, 2),
      r AS (SELECT li, lj, (si.s2 + sj.s2) / m2.m2 AS rij
        FROM m2 JOIN s2 si ON si.label = m2.li JOIN s2 sj ON sj.label = m2.lj),
      sym AS (SELECT li AS l, rij FROM r UNION ALL SELECT lj AS l, rij FROM r),
      pl AS (SELECT l, max(rij) AS rmax FROM sym GROUP BY 1),
      f AS (SELECT CAST(count(*) AS BIGINT) AS k,
          list_reduce(list(rmax ORDER BY l), (a, b) -> a + b) AS s FROM pl)
      SELECT k, s / CAST(k AS DOUBLE) AS db_sq FROM f"""))
  )
}
