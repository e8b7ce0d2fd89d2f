package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-9 batch 6: the decile lift/gains table (the campaign-targeting
  * read of the q309 scorer — how much better than base rate is each
  * score decile), Fellegi–Sunter record-linkage field weights computed
  * WITHOUT materializing a single non-match pair (the scoring step
  * between q328's blocking and q54's clustering), and a per-document
  * bigram LM perplexity filter (the CCNet-style quality gate; q240
  * owns the source×source unigram matrix, this scores DOCUMENTS under
  * a corpus bigram model).
  *
  * House rules as elsewhere: integer micro arithmetic, micro-ln via
  * floor(ln·1e6 + 0.5), md5-deterministic corruption, identical
  * aliases both sides, total ORDER BY.
  */
object Round9fQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  /** q335's blocked agreement statistics — ONE row holding the truth
    * agreements (m_*), the per-field per-value C(cnt,2) agree-pair
    * sums (a_*), the total block-pair count and the corpus size. The
    * whole point of the operator is that these come from group-size
    * combinatorics, never a materialized pair join; exposed
    * pre-checkpoint so PlanQualitySpec can assert exactly that on the
    * optimized plan (the query itself checkpoints this one row, which
    * would otherwise hide the DAG behind a LogicalRDD).
    */
  private[graft] def fsLinkageStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.t(s, dir, "customer")
      .select($"c_custkey".as("id"), $"c_nationkey".as("blk"),
        $"c_name".as("f_name"), $"c_mktsegment".as("f_seg"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("f_bal"))
      .localCheckpoint() // reused: clones, truth compare, block counts
    def corrupt(tag: String, mod: Int) =
      conv(substring(md5(concat(lit(tag), $"id".cast("string"))),
        1, 8), 16, 10).cast("long") % mod === 0
    val clone = c.select(($"id" + 1000000000000L).as("id"), $"blk",
      when(corrupt("fsn|", 4), concat($"f_name", lit("x")))
        .otherwise($"f_name").as("f_name"),
      when(corrupt("fss|", 8), lit("XXX")).otherwise($"f_seg").as("f_seg"),
      when(corrupt("fsb|", 2), $"f_bal" + 1).otherwise($"f_bal").as("f_bal"))
    val corpus = c.unionByName(clone).localCheckpoint()
    val nn = c.agg(count(lit(1)).as("n")) // truth-pair count (1/clone)
    val truth = c.join(clone.select(($"id" - 1000000000000L).as("id"),
        $"f_name".as("g_name"), $"f_seg".as("g_seg"),
        $"f_bal".as("g_bal")), Seq("id"))
      .agg(sum(($"f_name" === $"g_name").cast("long")).as("m_name"),
        sum(($"f_seg" === $"g_seg").cast("long")).as("m_seg"),
        sum(($"f_bal" === $"g_bal").cast("long")).as("m_bal"))
    val tb = corpus.groupBy($"blk").agg(count(lit(1)).as("nb"))
      .agg(sum(expr("nb * (nb - 1) div 2")).as("t_pairs"))
    def agreePairs(fld: String) = corpus
      .groupBy($"blk", col(fld)).agg(count(lit(1)).as("cv"))
      .agg(sum(expr("cv * (cv - 1) div 2")).as(s"a_$fld"))
    agreePairs("f_name").crossJoin(agreePairs("f_seg"))
      .crossJoin(agreePairs("f_bal")).crossJoin(broadcast(tb))
      .crossJoin(broadcast(truth)).crossJoin(broadcast(nn))
  }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- decile lift and cumulative gains -------------------------------
    // ROC (q276) and PR (q294) read ranking quality; the lift table
    // answers the budgeted-action question: if only the top k/10 of
    // documents can be processed, how many positives does each slice
    // buy? Deciles come off the descending score-value grid with all
    // ties in one decile ((rows above) · 10 div n — the q331 tie
    // rule), so the slices are deterministic; per decile: size,
    // positives, response rate, lift vs base rate, and cumulative
    // gains (share of ALL positives captured so far). Grid-bounded
    // windows only; NULL-guarded for a positive-free corpus.
    ("q334_lift_gains", (s: SparkSession, dir: String) => {
      import s.implicits._
      val lab = Round8aeQueries.scoredDocs(s, dir).select($"score", $"pos")
      val tot = lab.agg(count(lit(1)).as("n"), sum($"pos").as("np"))
      val wdesc = Window.orderBy(desc("score"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val grid = lab.groupBy($"score")
        .agg(count(lit(1)).as("cnt"), sum($"pos").as("p"))
        .withColumn("cum", sum($"cnt").over(wdesc))
        .crossJoin(broadcast(tot))
        .select(expr("(cum - cnt) * 10 div n").as("decile"),
          $"cnt", $"p", $"n", $"np")
      val wcum = Window.orderBy($"decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.groupBy($"decile")
        .agg(sum($"cnt").as("n_docs"), sum($"p").as("n_pos"),
          max($"n").as("n"), max($"np").as("np"))
        .withColumn("cum_pos", sum($"n_pos").over(wcum))
        .select($"decile", $"n_docs", $"n_pos",
          expr("1000000 * n_pos div n_docs").as("resp_rate_micro"),
          expr("""CASE WHEN np = 0 THEN NULL
                  ELSE CAST(CAST(1000000 AS DECIMAL(38,0)) * n_pos * n
                       div (CAST(n_docs AS DECIMAL(38,0)) * np) AS BIGINT)
                  END""").as("lift_micro"),
          expr("""CASE WHEN np = 0 THEN NULL
                  ELSE 1000000 * cum_pos div np END""").as("cum_gains_micro"))
        .orderBy($"decile")
    }, Some(s"""
      WITH ${Round8aeQueries.scoredSql},
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(pos) AS BIGINT) AS np FROM lab),
      g AS (SELECT score, CAST(count(*) AS BIGINT) AS cnt,
          CAST(sum(pos) AS BIGINT) AS p,
          CAST(sum(count(*)) OVER (ORDER BY score DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum
        FROM lab GROUP BY score),
      d AS (SELECT (cum - cnt) * 10 // n AS decile, cnt, p, n, np
        FROM g CROSS JOIN tot),
      agg AS (SELECT decile, CAST(sum(cnt) AS BIGINT) AS n_docs,
          CAST(sum(p) AS BIGINT) AS n_pos,
          max(n) AS n, max(np) AS np
        FROM d GROUP BY decile)
      SELECT decile, n_docs, n_pos,
        1000000 * n_pos // n_docs AS resp_rate_micro,
        CASE WHEN np = 0 THEN NULL
          ELSE CAST(CAST(1000000 AS HUGEINT) * n_pos * n
               // (CAST(n_docs AS HUGEINT) * np) AS BIGINT) END AS lift_micro,
        CASE WHEN np = 0 THEN NULL
          ELSE 1000000 * CAST(sum(n_pos) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            // np END AS cum_gains_micro
      FROM agg ORDER BY decile""")),

    // ----- Fellegi–Sunter linkage weights without pair materialization ----
    // Record-linkage scoring needs, per compare field, the agreement
    // probability among true matches (m) and among non-matches (u) —
    // and the naive u estimate enumerates block-pairs, which is
    // exactly what a 100 TB linkage cannot do. Both come from COUNTS:
    // plant a clone per customer with md5-deterministic field
    // corruption (name 1-in-4, segment 1-in-8, balance-cents 1-in-2),
    // block on nationkey (clones co-block by construction); then
    // m_i = truth pairs agreeing on field i / n (a map-side compare),
    // and u_i's numerator Σ_{block, value} C(cnt, 2) − M_i counts
    // agreeing pairs via per-value group sizes — no pair is ever
    // materialized. The field weight is the log-odds
    // lnm(m_micro) − lnm(u_micro) (micro-ln over micro probabilities;
    // NULL-guarded when a field never or always agrees).
    ("q335_fs_linkage_weights", (s: SparkSession, dir: String) => {
      import s.implicits._
      val a = fsLinkageStats(s, dir)
        .localCheckpoint() // one row; reused by the 3-way unpivot
      def fieldRow(name: String, mCol: String, aCol: String) = a.select(
        lit(name).as("field"),
        expr(s"1000000 * $mCol div n").as("m_micro"),
        expr(s"""CASE WHEN t_pairs - n = 0 THEN NULL
                 ELSE 1000000 * ($aCol - $mCol) div (t_pairs - n) END""")
          .as("u_micro"))
        .select($"field", $"m_micro", $"u_micro",
          expr("""CASE WHEN m_micro IS NULL OR u_micro IS NULL
                    OR m_micro = 0 OR u_micro = 0 THEN NULL
                  ELSE CAST(floor(ln(CAST(m_micro AS DOUBLE)) * 1000000 + 0.5)
                      AS BIGINT)
                    - CAST(floor(ln(CAST(u_micro AS DOUBLE)) * 1000000 + 0.5)
                      AS BIGINT) END""").as("weight_micro"))
      fieldRow("balance", "m_bal", "a_f_bal")
        .unionByName(fieldRow("name", "m_name", "a_f_name"))
        .unionByName(fieldRow("segment", "m_seg", "a_f_seg"))
        .orderBy($"field")
    }, Some("""
      WITH c AS (SELECT c_custkey AS id, c_nationkey AS blk,
          c_name AS f_name, c_mktsegment AS f_seg,
          CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS f_bal
        FROM customer),
      clone AS (SELECT c.id + 1000000000000 AS id, c.blk,
          CASE WHEN ('0x' || substr(md5('fsn|' || CAST(c.id AS VARCHAR)), 1, 8))
            ::BIGINT % 4 = 0 THEN c.f_name || 'x' ELSE c.f_name END AS f_name,
          CASE WHEN ('0x' || substr(md5('fss|' || CAST(c.id AS VARCHAR)), 1, 8))
            ::BIGINT % 8 = 0 THEN 'XXX' ELSE c.f_seg END AS f_seg,
          CASE WHEN ('0x' || substr(md5('fsb|' || CAST(c.id AS VARCHAR)), 1, 8))
            ::BIGINT % 2 = 0 THEN c.f_bal + 1 ELSE c.f_bal END AS f_bal
        FROM c),
      corpus AS (SELECT * FROM c UNION ALL SELECT * FROM clone),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
      truth AS (SELECT
          CAST(sum(CASE WHEN c.f_name = g.f_name THEN 1 ELSE 0 END)
            AS BIGINT) AS m_name,
          CAST(sum(CASE WHEN c.f_seg = g.f_seg THEN 1 ELSE 0 END)
            AS BIGINT) AS m_seg,
          CAST(sum(CASE WHEN c.f_bal = g.f_bal THEN 1 ELSE 0 END)
            AS BIGINT) AS m_bal
        FROM c JOIN clone g ON g.id - 1000000000000 = c.id),
      tb AS (SELECT CAST(sum(nb * (nb - 1) // 2) AS BIGINT) AS t_pairs
        FROM (SELECT blk, CAST(count(*) AS BIGINT) AS nb
              FROM corpus GROUP BY 1)),
      an AS (SELECT CAST(sum(cv * (cv - 1) // 2) AS BIGINT) AS a_name
        FROM (SELECT blk, f_name, CAST(count(*) AS BIGINT) AS cv
              FROM corpus GROUP BY 1, 2)),
      ag AS (SELECT CAST(sum(cv * (cv - 1) // 2) AS BIGINT) AS a_seg
        FROM (SELECT blk, f_seg, CAST(count(*) AS BIGINT) AS cv
              FROM corpus GROUP BY 1, 2)),
      ab AS (SELECT CAST(sum(cv * (cv - 1) // 2) AS BIGINT) AS a_bal
        FROM (SELECT blk, f_bal, CAST(count(*) AS BIGINT) AS cv
              FROM corpus GROUP BY 1, 2)),
      j AS (SELECT * FROM truth CROSS JOIN tb CROSS JOIN nn
        CROSS JOIN an CROSS JOIN ag CROSS JOIN ab),
      rows_ AS (
        SELECT 'balance' AS field, 1000000 * m_bal // n AS m_micro,
          CASE WHEN t_pairs - n = 0 THEN NULL
            ELSE 1000000 * (a_bal - m_bal) // (t_pairs - n) END AS u_micro
        FROM j
        UNION ALL SELECT 'name', 1000000 * m_name // n,
          CASE WHEN t_pairs - n = 0 THEN NULL
            ELSE 1000000 * (a_name - m_name) // (t_pairs - n) END FROM j
        UNION ALL SELECT 'segment', 1000000 * m_seg // n,
          CASE WHEN t_pairs - n = 0 THEN NULL
            ELSE 1000000 * (a_seg - m_seg) // (t_pairs - n) END FROM j)
      SELECT field, m_micro, u_micro,
        CASE WHEN m_micro IS NULL OR u_micro IS NULL
          OR m_micro = 0 OR u_micro = 0 THEN NULL
        ELSE CAST(floor(ln(CAST(m_micro AS DOUBLE)) * 1000000 + 0.5)
            AS BIGINT)
          - CAST(floor(ln(CAST(u_micro AS DOUBLE)) * 1000000 + 0.5)
            AS BIGINT) END AS weight_micro
      FROM rows_ ORDER BY field""")),

    // ----- per-document SMOOTHED bigram perplexity filter -----------------
    // q124 scores documents under the corpus's MLE bigram model — a
    // score that is UNDEFINED for any document the model has not seen
    // (an unseen bigram has p = 0), so it cannot gate NEW data. This
    // is the deployable CCNet-style form: add-one smoothing by the
    // unigram vocabulary V, p(b|a) = (c(a,b)+1)/(c(a,·)+V), makes
    // every score finite, and the left-join floor (coalesce to 0
    // counts) is exactly where a fresh document's unseen bigrams land
    // when the frozen model scores an incoming batch. On the training
    // corpus itself the floor never fires — the incremental shape is
    // the point. Per-doc H = Σ (lnm(ca+V) − lnm(cab+1)) div n_bigrams
    // — micro-ln per factor — plus the keep verdict vs the corpus mean
    // (integer div), which q124 stops short of. Shapes: bigrams via
    // one lag window partitioned by doc; model joins are token-keyed
    // aggregates.
    ("q336_doc_perplexity", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id",
          posexplode(split(TA.normText($"text"), " ")).as(Seq("pos", "tok")))
        .filter($"tok" =!= "")
      val wd = Window.partitionBy($"doc_id").orderBy($"pos")
      val big = toks
        .withColumn("nxt", lead($"tok", 1).over(wd))
        .filter($"nxt".isNotNull)
        .select($"doc_id", $"tok".as("a"), $"nxt".as("b"))
        .localCheckpoint() // reused: model counts + per-doc scoring
      val mAb = big.groupBy($"a", $"b").agg(count(lit(1)).as("cab"))
      val mA = big.groupBy($"a").agg(count(lit(1)).as("ca"))
      val v = toks.agg(countDistinct($"tok").as("v"))
      val scored = big
        .join(mAb, Seq("a", "b"), "left")
        .join(mA, Seq("a"), "left")
        .crossJoin(broadcast(v))
        .select($"doc_id", expr(
          """CAST(floor(ln(CAST(coalesce(ca, 0) + v AS DOUBLE)) * 1000000
               + 0.5) AS BIGINT)
           - CAST(floor(ln(CAST(coalesce(cab, 0) + 1 AS DOUBLE)) * 1000000
               + 0.5) AS BIGINT)""").as("nll"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum($"nll").as("snll"))
        .select($"doc_id", $"n_bigrams",
          expr("snll div n_bigrams").as("h_micro"))
        .localCheckpoint() // reused: corpus mean + verdict
      val mean = scored.agg(
        expr("sum(h_micro) div count(1)").as("h_mean"))
      scored.crossJoin(broadcast(mean))
        .select($"doc_id", $"n_bigrams", $"h_micro",
          ($"h_micro" <= $"h_mean").cast("long").as("below_mean"))
        .orderBy($"doc_id")
    }, Some(s"""
      WITH t0 AS (SELECT doc_id, tok, pos FROM
        (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok,
           generate_subscripts(string_split($normSql, ' '), 1) AS pos
         FROM documents) WHERE tok <> ''),
      big AS (SELECT doc_id, a, b FROM
        (SELECT doc_id, tok AS a, lead(tok, 1) OVER
           (PARTITION BY doc_id ORDER BY pos) AS b FROM t0)
        WHERE b IS NOT NULL),
      mab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cab
        FROM big GROUP BY 1, 2),
      ma AS (SELECT a, CAST(count(*) AS BIGINT) AS ca FROM big GROUP BY 1),
      vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM t0),
      scored AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          CAST(sum(
            CAST(floor(ln(CAST(coalesce(ma.ca, 0) + vv.v AS DOUBLE))
              * 1000000 + 0.5) AS BIGINT)
          - CAST(floor(ln(CAST(coalesce(mab.cab, 0) + 1 AS DOUBLE))
              * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS snll
        FROM big
        LEFT JOIN mab ON big.a = mab.a AND big.b = mab.b
        LEFT JOIN ma ON big.a = ma.a
        CROSS JOIN vv
        GROUP BY doc_id),
      sc2 AS (SELECT doc_id, n_bigrams, snll // n_bigrams AS h_micro
        FROM scored),
      mean AS (SELECT CAST(sum(h_micro) AS BIGINT) // count(*) AS h_mean
        FROM sc2)
      SELECT doc_id, n_bigrams, h_micro,
        CAST(CASE WHEN h_micro <= h_mean THEN 1 ELSE 0 END AS BIGINT)
          AS below_mean
      FROM sc2 CROSS JOIN mean ORDER BY doc_id"""))
  )
}
