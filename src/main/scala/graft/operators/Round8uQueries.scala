package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 21: item–item collaborative filtering, exact
  * (tie-corrected) AUC over sample fractions, rank-biased overlap of
  * two rankings, and a postings d-gap varint sizing estimate —
  * recommendation, model-evaluation, and IR-index surface.
  *
  * House rules as elsewhere: integer arithmetic at every gate; where a
  * per-row scalar needs sqrt, it runs map-side on exact integers (no
  * distributed double sums); truncated geometric weights (RBO) are
  * Scala-precomputed integer constants embedded IDENTICALLY in both
  * engines' queries. Identical aliases both sides, total ORDER BY.
  */
object Round8uQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  /** RBO weights (1−p)·p^(d−1) at p = 0.9, micro, depths 1..20 —
    * precomputed once HERE so Spark and DuckDB share the exact
    * constants (no cross-engine pow()). */
  private val RboW: Seq[Long] = {
    var w = 0.1
    (1 to 20).map { _ => val r = math.floor(w * 1e6 + 0.5).toLong; w *= 0.9; r }
  }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- item–item collaborative filtering ------------------------------
    // The classic "customers who bought X also bought Y": cosine
    // similarity over binary co-purchase vectors, sim(a,b) =
    // c_ab / √(c_a·c_b), which needs only the q151 pair counts and the
    // per-item supports — no vectors materialized. The sqrt is a
    // map-side scalar on exact integer counts. Neighbors symmetrize,
    // rank ≤ 3 compiles to WindowGroupLimit (overflow rows never leave
    // the map side — the q197 shape), and output is restricted to the
    // 10 highest-support items so the answer is bounded at any SF. At
    // 100 TB: pair counting is the blocked self-join every recommender
    // runs; everything after is |items|-bounded.
    ("q275_item_item_cf", (s: SparkSession, dir: String) => {
      import s.implicits._
      val items = Tables.t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      val sup = items.groupBy($"pk").agg(count(lit(1)).as("c"))
      val pairs = items.toDF("ok", "a").join(items.toDF("ok", "b"), Seq("ok"))
        .filter($"a" < $"b")
        .groupBy($"a", $"b").agg(count(lit(1)).as("cab"))
      val sym = pairs.unionByName(
        pairs.select($"b".as("a"), $"a".as("b"), $"cab"))
      val scored = sym
        .join(sup.select($"pk".as("a"), $"c".as("ca")), Seq("a"))
        .join(sup.select($"pk".as("b"), $"c".as("cb")), Seq("b"))
        .withColumn("cos_micro", expr(
          """CAST(floor(1000000 * CAST(cab AS DOUBLE)
             / sqrt(CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)) + 0.5) AS BIGINT)"""))
      val top10 = sup.orderBy(desc("c"), $"pk").limit(10)
        .select($"pk".as("a"))
      scored.join(broadcast(top10), Seq("a"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy($"a").orderBy(desc("cos_micro"), $"b")))
        .filter($"rnk" <= 3)
        .select($"a".as("item"), $"b".as("neighbor"), $"cab", $"cos_micro",
          $"rnk".cast("long").as("rnk"))
        .orderBy($"item", $"rnk")
    }, Some("""
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        FROM lineitem),
      sup AS (SELECT pk, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY 1),
      pairs AS (SELECT a.pk AS a, b.pk AS b, CAST(count(*) AS BIGINT) AS cab
        FROM items a JOIN items b ON a.ok = b.ok WHERE a.pk < b.pk GROUP BY 1, 2),
      sym AS (SELECT a, b, cab FROM pairs UNION ALL SELECT b, a, cab FROM pairs),
      scored AS (SELECT s.a, s.b, s.cab,
          CAST(floor(1000000 * CAST(s.cab AS DOUBLE)
            / sqrt(CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) + 0.5) AS BIGINT)
            AS cos_micro
        FROM sym s JOIN sup ca ON s.a = ca.pk JOIN sup cb ON s.b = cb.pk),
      top10 AS (SELECT pk AS a FROM sup ORDER BY c DESC, pk LIMIT 10),
      ranked AS (SELECT sc.*, row_number() OVER (PARTITION BY sc.a
          ORDER BY sc.cos_micro DESC, sc.b) AS rnk
        FROM scored sc JOIN top10 t ON sc.a = t.a)
      SELECT a AS item, b AS neighbor, cab, cos_micro, CAST(rnk AS BIGINT) AS rnk
      FROM ranked WHERE rnk <= 3 ORDER BY item, rnk""")),

    // ----- exact AUC learning curve ---------------------------------------
    // Mann–Whitney AUC of the hashed linear scorer (q191's join-free
    // classifier) against the quality signal, computed EXACTLY with tie
    // correction: group by score, one cumulative window over the score
    // grid gives negatives-below, and U×2 = Σ(2·neg_below·pos_g +
    // pos_g·neg_g) clears the ½-tie term without fractions. Evaluated
    // at 25/50/100% md5-samples — the learning-curve read that says
    // whether more eval data would change the ranking verdict. The
    // corpus pass is one scoring scan; each AUC is |distinct scores|-
    // bounded. 128-bit for the count products.
    ("q276_auc_learning_curve", (s: SparkSession, dir: String) => {
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
        .withColumn("h", conv(substring(md5(concat(lit("lc|"),
          $"doc_id".cast("string"))), 1, 8), 16, 10).cast("long") % 4)
        .localCheckpoint() // three sample fractions reuse it
      val fracs = Seq(("f25", 1L), ("f50", 2L), ("f100", 4L))
      fracs.map { case (nm, keep) =>
        val sm = scored.filter($"h" < keep)
        val grid = sm.groupBy($"score")
          .agg(sum($"pos").as("pg"), sum(lit(1L) - $"pos").as("ng"))
        val w = Window.orderBy($"score") // |distinct scores|-bounded
        val u2 = grid
          .withColumn("nb", coalesce(sum($"ng")
            .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .agg(sum(expr("2 * CAST(nb AS DECIMAL(38,0)) * pg + CAST(pg AS DECIMAL(38,0)) * ng"))
            .as("u2"),
            sum($"pg").as("np"), sum($"ng").as("nn"))
        u2.select(lit(nm).as("fraction"), $"np".as("n_pos"), $"nn".as("n_neg"),
          expr("""CAST(1000000 * u2 div (CAST(2 AS DECIMAL(38,0)) * np * nn)
            AS BIGINT)""").as("auc_micro"))
      }.reduce(_ unionByName _).orderBy($"fraction")
    }, Some(s"""
      WITH st AS (SELECT doc_id, n_chars,
          unnest(string_split($normSql, ' ')) AS tok FROM documents),
      sc AS (SELECT doc_id, max(n_chars) AS nc,
          CAST(sum(('0x' || substr(md5('w|' || CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) AS BIGINT) AS score
        FROM st GROUP BY 1),
      lab AS (SELECT doc_id, score,
          CAST(CASE WHEN nc >= 250 THEN 1 ELSE 0 END AS BIGINT) AS pos,
          ('0x' || substr(md5('lc|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            % 4 AS h
        FROM sc),
      fr AS (SELECT 'f25' AS fraction, CAST(1 AS BIGINT) AS keep
        UNION ALL SELECT 'f50', 2 UNION ALL SELECT 'f100', 4),
      sm AS (SELECT fr.fraction, lab.score, lab.pos
        FROM lab JOIN fr ON lab.h < fr.keep),
      grid AS (SELECT fraction, score, CAST(sum(pos) AS BIGINT) AS pg,
          CAST(sum(1 - pos) AS BIGINT) AS ng
        FROM sm GROUP BY 1, 2),
      cum AS (SELECT *, coalesce(sum(ng) OVER (PARTITION BY fraction
          ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS nb FROM grid),
      agg AS (SELECT fraction,
          sum(CAST(2 AS HUGEINT) * nb * pg + CAST(pg AS HUGEINT) * ng) AS u2,
          CAST(sum(pg) AS BIGINT) AS np, CAST(sum(ng) AS BIGINT) AS nn
        FROM cum GROUP BY 1)
      SELECT fraction, np AS n_pos, nn AS n_neg,
        CAST(1000000 * u2 // (CAST(2 AS HUGEINT) * np * nn) AS BIGINT) AS auc_micro
      FROM agg ORDER BY fraction""")),

    // ----- rank-biased overlap of two rankings ----------------------------
    // RBO (Webber et al.): top-weighted agreement between the hashed
    // scorer's ranking and the length ranking, truncated at depth 20 —
    // the ranking-comparison metric that, unlike Spearman (q244),
    // handles non-conjoint lists and weights the head. Identity used:
    // |A_d ∩ B_d| = #{docs with max(rank_A, rank_B) ≤ d}, so one join
    // of the two top-20 lists + a 20-row depth grid computes every
    // overlap; the geometric weights (1−p)p^(d−1) are Scala-
    // precomputed micro constants embedded in BOTH engines' queries —
    // no cross-engine pow(). Everything after the two TakeOrdered
    // top-20s is constant-size.
    ("q277_rank_biased_overlap", (s: SparkSession, dir: String) => {
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
      val topA = scored.orderBy(desc("score"), $"doc_id").limit(20)
        .withColumn("ra", row_number().over(
          Window.orderBy(desc("score"), $"doc_id")).cast("long"))
        .select($"doc_id", $"ra")
      val topB = scored.orderBy(desc("nc"), $"doc_id").limit(20)
        .withColumn("rb", row_number().over(
          Window.orderBy(desc("nc"), $"doc_id")).cast("long"))
        .select($"doc_id", $"rb")
      val both = topA.join(topB, Seq("doc_id"))
        .select(greatest($"ra", $"rb").as("mr"))
      val depths = RboW.zipWithIndex
        .map { case (wd, i) => (i + 1L, wd) }.toDF("d", "w_micro")
      val xd = depths.join(both, $"mr" <= $"d", "left")
        .groupBy($"d", $"w_micro").agg(count($"mr").as("x_d"))
      xd.agg(
          sum(expr("w_micro * x_d div d")).as("rbo_micro"),
          max(when($"d" === 20, $"x_d")).as("overlap_at_20"))
        .select($"rbo_micro", $"overlap_at_20")
    }, Some {
      val wRows = RboW.zipWithIndex
        .map { case (wd, i) => s"(${i + 1}, $wd)" }.mkString(", ")
      s"""
      WITH st AS (SELECT doc_id, n_chars,
          unnest(string_split($normSql, ' ')) AS tok FROM documents),
      sc AS (SELECT doc_id, max(n_chars) AS nc,
          CAST(sum(('0x' || substr(md5('w|' || CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) AS BIGINT) AS score
        FROM st GROUP BY 1),
      ta AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
          AS BIGINT) AS ra FROM sc ORDER BY score DESC, doc_id LIMIT 20),
      tb AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY nc DESC, doc_id)
          AS BIGINT) AS rb FROM sc ORDER BY nc DESC, doc_id LIMIT 20),
      bth AS (SELECT greatest(ta.ra, tb.rb) AS mr
        FROM ta JOIN tb USING (doc_id)),
      depths(d, w_micro) AS (VALUES $wRows),
      xd AS (SELECT d.d, d.w_micro, CAST(count(b.mr) AS BIGINT) AS x_d
        FROM depths d LEFT JOIN bth b ON b.mr <= d.d GROUP BY 1, 2)
      SELECT CAST(sum(w_micro * x_d // d) AS BIGINT) AS rbo_micro,
        CAST(max(CASE WHEN d = 20 THEN x_d END) AS BIGINT) AS overlap_at_20
      FROM xd"""
    }),

    // ----- postings d-gap varint sizing -----------------------------------
    // The inverted-index storage model (q156 builds postings, this
    // prices them): sorted doc-id postings store DELTAS, and varint
    // bytes per delta depend on gap size — so high-df terms (dense
    // postings, small gaps) compress far better than rare terms. One
    // lag window per token (vocab-bounded partitions), a CASE ladder
    // for varint width, rolled up by df-band: bytes under d-gap varint
    // vs fixed 8-byte ids, the ratio a format/index designer reads
    // before choosing PForDelta vs plain. Companion to q255 (columns)
    // and q237 (runs) — the IR-side member of the storage family.
    ("q278_postings_dgap", (s: SparkSession, dir: String) => {
      import s.implicits._
      val post = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", explode(split(TA.normText($"text"), " ")).as("tok"))
        .filter(length($"tok") > 0)
        .select($"tok", $"doc_id").distinct()
      val w = Window.partitionBy($"tok").orderBy($"doc_id")
      val gaps = post
        .withColumn("prev", lag($"doc_id", 1).over(w))
        .withColumn("gap", coalesce($"doc_id" - $"prev", $"doc_id" + 1))
        .withColumn("vb",
          when($"gap" < 128, 1L).when($"gap" < 16384, 2L)
            .when($"gap" < 2097152, 3L).otherwise(4L))
      val perTok = gaps.groupBy($"tok")
        .agg(count(lit(1)).as("df"), sum($"vb").as("gap_bytes"))
      perTok
        .withColumn("df_band", expr(
          "CASE WHEN df >= 1000 THEN 'a_dense' WHEN df >= 100 THEN 'b_mid' ELSE 'c_rare' END"))
        .groupBy($"df_band")
        .agg(count(lit(1)).as("n_terms"), sum($"df").as("n_postings"),
          sum($"gap_bytes").as("gap_bytes"))
        .select($"df_band", $"n_terms", $"n_postings", $"gap_bytes",
          ($"n_postings" * 8L).as("fixed_bytes"),
          expr("1000000 * gap_bytes div (n_postings * 8)").as("ratio_micro"))
        .orderBy($"df_band")
    }, Some(s"""
      WITH post AS (SELECT DISTINCT tok, doc_id FROM
          (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
           FROM documents) WHERE len(tok) > 0),
      gaps AS (SELECT tok, doc_id,
          coalesce(doc_id - lag(doc_id) OVER (PARTITION BY tok ORDER BY doc_id),
            doc_id + 1) AS gap
        FROM post),
      vb AS (SELECT tok,
          CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
            WHEN gap < 2097152 THEN 3 ELSE 4 END AS vb
        FROM gaps),
      pt AS (SELECT tok, CAST(count(*) AS BIGINT) AS df,
          CAST(sum(vb) AS BIGINT) AS gap_bytes FROM vb GROUP BY 1),
      band AS (SELECT *, CASE WHEN df >= 1000 THEN 'a_dense'
          WHEN df >= 100 THEN 'b_mid' ELSE 'c_rare' END AS df_band FROM pt)
      SELECT df_band, CAST(count(*) AS BIGINT) AS n_terms,
        CAST(sum(df) AS BIGINT) AS n_postings,
        CAST(sum(gap_bytes) AS BIGINT) AS gap_bytes,
        CAST(sum(df) * 8 AS BIGINT) AS fixed_bytes,
        CAST(1000000 * sum(gap_bytes) // (sum(df) * 8) AS BIGINT) AS ratio_micro
      FROM band GROUP BY 1 ORDER BY 1"""))
  )
}
