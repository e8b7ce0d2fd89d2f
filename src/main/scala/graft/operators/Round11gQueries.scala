package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-11 batch 7: the privacy-risk battery a training-data
  * pipeline runs before releasing metadata (k-anonymity ladder,
  * l-diversity, t-closeness — all pure integer counting over bounded
  * equivalence-class grids), and the two classical LM-smoothing
  * estimators that q336's add-one filter stops short of (Good–Turing
  * frequency-of-frequencies re-estimation, interpolated Kneser–Ney
  * with the exact rational discount D = 3/4).
  *
  * Float discipline: k/l ladders never leave BIGINT; t-closeness
  * compares cross-multiplied DECIMAL(38,0) before its one double
  * ratio per class; GT and KN clear every probability to an exact
  * integer-division micro-unit (r* and p_KN are rationals by
  * construction once D = 3/4).
  */
object Round11gQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** Quasi-identifier prep over customer: nation, segment, and the
    * $1000 account-balance band. Balance goes through the money cast
    * (DECIMAL(12,2) cents) and a +100000 shift so the band division
    * never sees a negative operand (Spark `div` truncates toward zero
    * while DuckDB `//` floors — they agree only on non-negatives).
    */
  private def custQi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "customer").select(
      $"c_nationkey".cast("long").as("nat"),
      $"c_mktsegment".as("seg"),
      expr("""(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
              + 100000) div 100000""").as("band"))
  }

  private val CustQiSql =
    """qi AS (SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
        (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 100000) // 100000 AS band
      FROM customer)"""

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- k-anonymity ladder ---------------------------------------------
    // Re-identification risk of the released metadata grid, per
    // quasi-identifier ladder rung: under QI = (nation), (nation,
    // segment), (nation, segment, $1000-balance band), how small do
    // the equivalence classes get? Reports per rung: class count,
    // k_min, rows in classes below k=5, and singleton (unique) rows —
    // the uniqueness curve IS the risk curve. One finest-grid
    // aggregate, then two re-aggregations of the ≤25·5·11-row grid
    // upward (rollup-without-Expand: each coarser rung sums the
    // finest counts, so the scan runs once and no Expand multiplies
    // rows). Pure integer counting.
    ("q387_k_anonymity", (s: SparkSession, dir: String) => {
      import s.implicits._
      val fine = custQi(s, dir)
        .groupBy($"nat", $"seg", $"band").agg(count(lit(1)).as("k"))
        .localCheckpoint() // reused by all three rungs
      def rung(level: Int, df: DataFrame) = df
        .agg(count(lit(1)).as("n_classes"), min($"k").as("k_min"),
          sum(when($"k" < 5, $"k").otherwise(0L)).as("rows_below_5"),
          sum(when($"k" === 1, 1L).otherwise(0L)).as("unique_rows"))
        .select(lit(level.toLong).as("qi_level"), $"n_classes", $"k_min",
          $"rows_below_5", $"unique_rows")
      val l3 = rung(3, fine)
      val l2 = rung(2, fine.groupBy($"nat", $"seg").agg(sum($"k").as("k")))
      val l1 = rung(1, fine.groupBy($"nat").agg(sum($"k").as("k")))
      l1.unionAll(l2).unionAll(l3).orderBy($"qi_level")
    }, Some(s"""
      WITH $CustQiSql,
      fine AS (SELECT nat, seg, band, CAST(count(*) AS BIGINT) AS k
        FROM qi GROUP BY 1, 2, 3),
      l2g AS (SELECT nat, seg, CAST(sum(k) AS BIGINT) AS k FROM fine GROUP BY 1, 2),
      l1g AS (SELECT nat, CAST(sum(k) AS BIGINT) AS k FROM fine GROUP BY 1),
      r3 AS (SELECT CAST(3 AS BIGINT) AS qi_level, CAST(count(*) AS BIGINT) AS n_classes,
          CAST(min(k) AS BIGINT) AS k_min,
          CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS rows_below_5,
          CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS unique_rows
        FROM fine),
      r2 AS (SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT), CAST(min(k) AS BIGINT),
          CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT),
          CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM l2g),
      r1 AS (SELECT CAST(1 AS BIGINT) AS qi_level, CAST(count(*) AS BIGINT) AS n_classes,
          CAST(min(k) AS BIGINT) AS k_min,
          CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS rows_below_5,
          CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS unique_rows FROM l1g)
      SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
      ORDER BY qi_level""")),

    // ----- l-diversity -----------------------------------------------------
    // q387 counts class SIZES; a class can be large yet homogeneous —
    // every member sharing the sensitive value leaks it regardless of
    // k. Distinct-l per equivalence class (QI = nation × balance
    // band, sensitive = market segment), reported as the l histogram
    // plus the min and the count of classes below l = 3. Distinct
    // sensitive values per class come off the (class × segment) grid
    // (≤ 25·11·5 cells), so nothing beyond the grid shuffles.
    ("q388_l_diversity", (s: SparkSession, dir: String) => {
      import s.implicits._
      val cells = custQi(s, dir)
        .groupBy($"nat", $"band", $"seg").agg(count(lit(1)).as("c"))
      val perClass = cells.groupBy($"nat", $"band")
        .agg(count(lit(1)).as("l")) // one cell per distinct segment
        .localCheckpoint()
      val hist = perClass.groupBy($"l").agg(count(lit(1)).as("n_classes"))
      val summary = perClass.agg(min($"l").as("l_min"),
        sum(when($"l" < 3, 1L).otherwise(0L)).as("classes_below_3"))
      hist.crossJoin(broadcast(summary))
        .select($"l", $"n_classes", $"l_min", $"classes_below_3")
        .orderBy($"l")
    }, Some(s"""
      WITH $CustQiSql,
      cells AS (SELECT nat, band, seg, CAST(count(*) AS BIGINT) AS c
        FROM qi GROUP BY 1, 2, 3),
      pc AS (SELECT nat, band, CAST(count(*) AS BIGINT) AS l FROM cells GROUP BY 1, 2),
      hist AS (SELECT l, CAST(count(*) AS BIGINT) AS n_classes FROM pc GROUP BY 1),
      sm AS (SELECT CAST(min(l) AS BIGINT) AS l_min,
          CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS classes_below_3
        FROM pc)
      SELECT l, n_classes, l_min, classes_below_3 FROM hist, sm ORDER BY l""")),

    // ----- t-closeness ------------------------------------------------------
    // q388 counts distinct sensitive values; t-closeness asks whether
    // a class's sensitive DISTRIBUTION drifts from the global one
    // (skew leaks even at high l). Per class, total variation
    // distance to the global segment distribution — for categorical
    // attributes TVD is the standard instantiation of the EMD in the
    // definition. The threshold test is EXACT: TVD_c > 1/5 iff
    // 5·Σ_s|n_cs·N − N_s·n_c| > 2·n_c·N in DECIMAL(38,0) (the full
    // class × segment grid includes absent cells, whose term is
    // N_s·n_c); the reported max TVD is the one double per class.
    ("q389_t_closeness", (s: SparkSession, dir: String) => {
      import s.implicits._
      val rows = custQi(s, dir)
      val cells = rows.groupBy($"nat", $"band", $"seg").agg(count(lit(1)).as("ncs"))
      val classes = cells.groupBy($"nat", $"band").agg(sum($"ncs").as("nc"))
      val global = cells.groupBy($"seg").agg(sum($"ncs").as("ns"))
      val total = rows.agg(count(lit(1)).as("n"))
      val grid = classes.crossJoin(broadcast(global)) // full grid incl. absent cells
        .join(cells, Seq("nat", "band", "seg"), "left")
        .withColumn("ncs", coalesce($"ncs", lit(0L)))
      val perClass = grid.crossJoin(broadcast(total))
        .groupBy($"nat", $"band", $"nc", $"n")
        .agg(sum(abs($"ncs".cast(DecimalType(38, 0)) * $"n"
          - $"ns".cast(DecimalType(38, 0)) * $"nc")).as("sdev"))
        .withColumn("exceed",
          ($"sdev" * 5 > $"nc".cast(DecimalType(38, 0)) * $"n" * 2).cast("long"))
        .withColumn("tvd", expr(
          "CAST(sdev AS DOUBLE) / (2.0 * CAST(nc AS DOUBLE) * CAST(n AS DOUBLE))"))
      perClass.agg(count(lit(1)).as("n_classes"),
        sum($"exceed").as("classes_over_t"), max($"tvd").as("max_tvd"))
    }, Some(s"""
      WITH $CustQiSql,
      cells AS (SELECT nat, band, seg, CAST(count(*) AS BIGINT) AS ncs
        FROM qi GROUP BY 1, 2, 3),
      cl AS (SELECT nat, band, CAST(sum(ncs) AS BIGINT) AS nc FROM cells GROUP BY 1, 2),
      gl AS (SELECT seg, CAST(sum(ncs) AS BIGINT) AS ns FROM cells GROUP BY 1),
      tt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qi),
      grid AS (SELECT cl.nat, cl.band, cl.nc, gl.seg, gl.ns,
          CAST(coalesce(cells.ncs, 0) AS BIGINT) AS ncs
        FROM cl CROSS JOIN gl
        LEFT JOIN cells ON cells.nat = cl.nat AND cells.band = cl.band
          AND cells.seg = gl.seg),
      pc AS (SELECT nat, band, nc, n,
          sum(abs(CAST(ncs AS DECIMAL(38,0)) * n - CAST(ns AS DECIMAL(38,0)) * nc)) AS sdev
        FROM grid, tt GROUP BY 1, 2, 3, 4),
      pc2 AS (SELECT nat, band,
          CASE WHEN sdev * 5 > CAST(nc AS DECIMAL(38,0)) * n * 2 THEN 1 ELSE 0 END AS exceed,
          CAST(sdev AS DOUBLE) / (2.0 * CAST(nc AS DOUBLE) * CAST(n AS DOUBLE)) AS tvd
        FROM pc)
      SELECT CAST(count(*) AS BIGINT) AS n_classes,
        CAST(sum(exceed) AS BIGINT) AS classes_over_t,
        max(tvd) AS max_tvd
      FROM pc2""")),

    // ----- Good–Turing count-of-counts -------------------------------------
    // q336 smooths by ADDING mass; Good–Turing re-estimates the count
    // VALUES themselves from the frequency-of-frequencies curve:
    // r* = (r+1)·N_{r+1}/N_r, with the unseen mass P0 = N_1/N — the
    // estimator every leave-one-out argument reduces to. Exact by
    // construction: counts → count-of-counts (two bounded
    // aggregations), r* and P0 in integer micro-units via BIGINT
    // division. Rows: the 10 SMALLEST observed counts — the
    // low-frequency regime GT exists for, chosen relatively because
    // an absolute r ≤ 10 cut is empty on a pool-vocabulary corpus
    // where every word repeats (and on any corpus it is the relative
    // bottom of the curve that Katz uses unsmoothed).
    ("q390_good_turing", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select(explode(split(TA.normText($"text"), " ")).as("tok"))
        .filter($"tok" =!= "")
      val counts = toks.groupBy($"tok").agg(count(lit(1)).as("r"))
      val coc = counts.groupBy($"r").agg(count(lit(1)).as("nr"))
        .localCheckpoint() // reused: successor join + totals
      val tot = coc.agg(sum($"r".cast(DecimalType(38, 0)) * $"nr")
        .cast("long").as("n"))
      // successor lookup as a broadcast self-join on r+1, NOT a global
      // lead window (no single-partition WindowExec on the count grid)
      val succ = coc.select(($"r" - 1).as("r"), $"nr".as("nr1"))
      val led = coc.orderBy($"r").limit(10) // TakeOrdered: bottom of the curve
        .join(broadcast(succ), Seq("r"), "left")
        .withColumn("nr1", coalesce($"nr1", lit(0L)))
      led.crossJoin(broadcast(tot))
        .select($"r", $"nr", $"nr1".as("nr_next"),
          expr("(r + 1) * nr_next * 1000000 div nr").as("r_star_micro"),
          expr("CASE WHEN r = 1 THEN nr * 1000000 div n ELSE NULL END")
            .as("p0_micro"))
        .orderBy($"r")
    }, Some {
      val norm = TA.normTextSql
      s"""
      WITH t0 AS (SELECT unnest(string_split($norm, ' ')) AS tok FROM documents),
      t1 AS (SELECT tok FROM t0 WHERE tok <> ''),
      cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS r FROM t1 GROUP BY 1),
      coc AS (SELECT r, CAST(count(*) AS BIGINT) AS nr FROM cnt GROUP BY 1),
      tot AS (SELECT CAST(sum(CAST(r AS DECIMAL(38,0)) * nr) AS BIGINT) AS n FROM coc),
      low AS (SELECT r, nr FROM coc ORDER BY r LIMIT 10),
      led AS (SELECT low.r, low.nr,
          CAST(coalesce(s.nr, 0) AS BIGINT) AS nr_next
        FROM low LEFT JOIN coc s ON s.r = low.r + 1)
      SELECT r, nr, nr_next,
        (r + 1) * nr_next * 1000000 // nr AS r_star_micro,
        CASE WHEN r = 1 THEN nr * 1000000 // n ELSE NULL END AS p0_micro
      FROM led, tot ORDER BY r"""
    }),

    // ----- interpolated Kneser–Ney bigram model ----------------------------
    // The production LM smoothing q336's add-one stands in for: each
    // observed bigram is discounted by exactly D = 3/4 and the freed
    // mass backs off to the CONTINUATION probability (how many
    // contexts a word follows — type counts, not token counts; the
    // "San Francisco" correction). D = 3/4 keeps every probability a
    // rational cleared by 4·c(a·)·B:
    //   p_KN(b|a)·4·ca·B = (4·cab − 3)·B + 3·T(a)·cont(b),
    // so p ships as an exact BIGINT micro-unit. Emitted for the
    // top-20 bigrams ordered by the exact integer key (cab desc, a,
    // b) — engine-proof ordering, no double enters the sort. Shapes:
    // one lag window per doc, token-keyed count aggregates,
    // TakeOrdered 20.
    ("q391_kneser_ney", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id",
          posexplode(split(TA.normText($"text"), " ")).as(Seq("pos", "tok")))
        .filter($"tok" =!= "")
      val wd = Window.partitionBy($"doc_id").orderBy($"pos")
      val big = toks.withColumn("nxt", lead($"tok", 1).over(wd))
        .filter($"nxt".isNotNull)
        .select($"tok".as("a"), $"nxt".as("b"))
      val cab = big.groupBy($"a", $"b").agg(count(lit(1)).as("cab"))
        .localCheckpoint() // reused: ca, Ta, cont, B, top-k
      val ca = cab.groupBy($"a").agg(sum($"cab").as("ca"), count(lit(1)).as("ta"))
      val cont = cab.groupBy($"b").agg(count(lit(1)).as("contb"))
      val btot = cab.agg(count(lit(1)).as("bb"))
      cab.join(ca, Seq("a")).join(cont, Seq("b"))
        .crossJoin(broadcast(btot))
        .select($"a", $"b", $"cab", $"ca", $"ta", $"contb",
          expr("""((4 * cab - 3) * CAST(bb AS DECIMAL(38,0))
                  + 3 * CAST(ta AS DECIMAL(38,0)) * contb) * 1000000""").as("num"),
          ($"ca".cast(DecimalType(38, 0)) * $"bb" * 4).as("den"))
        .select($"a", $"b", $"cab", $"ca", $"ta", $"contb",
          expr("CAST(num div den AS BIGINT)").as("p_kn_micro"))
        .orderBy($"cab".desc, $"a", $"b").limit(20)
    }, Some {
      val norm = TA.normTextSql
      s"""
      WITH t0 AS (SELECT doc_id, tok, pos FROM
        (SELECT doc_id, unnest(string_split($norm, ' ')) AS tok,
           generate_subscripts(string_split($norm, ' '), 1) AS pos
         FROM documents) WHERE tok <> ''),
      big AS (SELECT a, b FROM
        (SELECT tok AS a, lead(tok, 1) OVER
           (PARTITION BY doc_id ORDER BY pos) AS b FROM t0)
        WHERE b IS NOT NULL),
      cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cab FROM big GROUP BY 1, 2),
      ca AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca, CAST(count(*) AS BIGINT) AS ta
        FROM cab GROUP BY 1),
      cont AS (SELECT b, CAST(count(*) AS BIGINT) AS contb FROM cab GROUP BY 1),
      bt AS (SELECT CAST(count(*) AS BIGINT) AS bb FROM cab)
      SELECT cab.a, cab.b, cab.cab, ca.ca, ca.ta, cont.contb,
        CAST(((4 * cab.cab - 3) * CAST(bt.bb AS HUGEINT)
              + 3 * CAST(ca.ta AS HUGEINT) * cont.contb) * 1000000
          // (CAST(ca.ca AS HUGEINT) * bt.bb * 4) AS BIGINT) AS p_kn_micro
      FROM cab JOIN ca ON cab.a = ca.a JOIN cont ON cab.b = cont.b, bt
      ORDER BY cab.cab DESC, cab.a, cab.b LIMIT 20"""
    })
  )
}
