package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 16: similarity JOIN via deletion neighborhoods
  * (FastSS), a multi-way join-order advisor on top of q165's
  * cardinality-forecast primitive, and a point-in-time feature-leakage
  * audit — fuzzy linkage, planner, and feature-store correctness
  * surface.
  *
  * House rules as elsewhere: integer arithmetic at every gate, 128-bit
  * (DECIMAL(38,0)/HUGEINT) where count products appear, money in
  * DECIMAL(12,2) (the CoreQueries rule), identical aliases both
  * sides, total ORDER BY.
  */
object Round8pQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- FastSS fuzzy join (edit distance ≤ 1) --------------------------
    // The similarity JOIN the linkage family lacked: match the corpus
    // vocabulary against the part-name dictionary at Levenshtein ≤ 1
    // WITHOUT the O(|U|·|V|) cross product. Candidate generation is the
    // FastSS deletion-neighborhood trick (Bocek et al.): every word
    // emits itself plus its |w| delete-one variants; two words within
    // ED 1 are guaranteed to share a variant, so candidates fall out of
    // ONE equi-join on the variant string. The neighborhood overshoots
    // (delete-at-different-positions can collide at ED 2, e.g. ab/ba),
    // so a native levenshtein verify — codegen'd in both engines —
    // filters candidates; the audit reports survivors AND rejects, the
    // blocking-precision read. Work is Σ|w| variants per side and the
    // join is hash-partitioned on the variant — at 100 TB vocabulary
    // this is the standard spell-linkage shape (variants of a 1M-word
    // dictionary broadcast; the corpus side never crosses itself).
    ("q256_fuzzy_join_fastss", (s: SparkSession, dir: String) => {
      import s.implicits._
      def variants(words: DataFrame, col0: String) = words
        .select(col(col0),
          explode(expr(s"""transform(sequence(0, length($col0)),
            i -> IF(i = 0, $col0,
              concat(substring($col0, 1, i - 1), substring($col0, i + 1))))"""))
            .as("var"))
        .distinct()
      val u = Tables.spread(Tables.t(s, dir, "documents"))
        .select(explode(split(TA.normText($"text"), " ")).as("u"))
        .filter(length($"u") > 0).distinct()
      val v = Tables.t(s, dir, "part")
        .select(explode(split(lower($"p_name"), " ")).as("v"))
        .filter(length($"v") > 0).distinct()
      val cand = variants(u, "u").join(variants(v, "v"), Seq("var"))
        .select($"u", $"v").distinct()
        .withColumn("ed", levenshtein($"u", $"v"))
        .withColumn("status",
          when($"ed" === 0, lit("ed0")).when($"ed" === 1, lit("ed1"))
            .otherwise(lit("rejected")))
      cand.groupBy($"status")
        .agg(count(lit(1)).as("n_pairs"),
          sum(conv(substring(md5(concat($"u", lit("|"), $"v")), 1, 8), 16, 10)
            .cast("long") % 1000000).as("pair_checksum"))
        .orderBy($"status")
    }, Some(s"""
      WITH u AS (SELECT DISTINCT w AS u FROM
          (SELECT unnest(string_split($normSql, ' ')) AS w FROM documents)
        WHERE len(w) > 0),
      v AS (SELECT DISTINCT w AS v FROM
          (SELECT unnest(string_split(lower(p_name), ' ')) AS w FROM part)
        WHERE len(w) > 0),
      uv AS (SELECT DISTINCT u, CASE WHEN i = 0 THEN u
          ELSE substr(u, 1, CAST(i - 1 AS INT)) || substr(u, CAST(i + 1 AS INT)) END AS var
        FROM u, unnest(range(0, len(u) + 1)) AS t(i)),
      vv AS (SELECT DISTINCT v, CASE WHEN i = 0 THEN v
          ELSE substr(v, 1, CAST(i - 1 AS INT)) || substr(v, CAST(i + 1 AS INT)) END AS var
        FROM v, unnest(range(0, len(v) + 1)) AS t(i)),
      cand AS (SELECT DISTINCT a.u, b.v FROM uv a JOIN vv b ON a.var = b.var),
      ed AS (SELECT u, v, levenshtein(u, v) AS ed FROM cand),
      st AS (SELECT u, v,
          CASE WHEN ed = 0 THEN 'ed0' WHEN ed = 1 THEN 'ed1'
            ELSE 'rejected' END AS status FROM ed)
      SELECT status, CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(sum(('0x' || substr(md5(u || '|' || v), 1, 8))::BIGINT % 1000000)
          AS BIGINT) AS pair_checksum
      FROM st GROUP BY 1 ORDER BY 1""")),

    // ----- multi-way join-order advisor -----------------------------------
    // The planner decision q165 feeds: for the 3-table chain
    // customer ⋈ orders ⋈ lineitem, forecast BOTH intermediate
    // cardinalities from per-key count aggregates (|A⋈B| on key k =
    // Σ_k c_A(k)·c_B(k), in 128-bit), pick the cheaper start, and then
    // AUDIT the forecast by actually counting each intermediate — the
    // row-level joins run here only because the audit demands ground
    // truth; the advisor itself never touches a row. This is exactly
    // what a cost-based optimizer does with column statistics, made
    // relational and exact. At 100 TB the count aggregates are the
    // only corpus passes and they're reusable across every plan
    // considered — the forecast side scales with |distinct keys|, not
    // rows.
    ("q257_join_order_advisor", (s: SparkSession, dir: String) => {
      import s.implicits._
      val cust = Tables.t(s, dir, "customer").select($"c_custkey")
      val ord = Tables.t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      val li = Tables.t(s, dir, "lineitem").select($"l_orderkey")
      // per-key count tables — the q165 primitive
      val cC = cust.groupBy($"c_custkey".as("k")).agg(count(lit(1)).as("nc"))
      val cOc = ord.groupBy($"o_custkey".as("k")).agg(count(lit(1)).as("no"))
      val cOo = ord.groupBy($"o_orderkey".as("k")).agg(count(lit(1)).as("no"))
      val cL = li.groupBy($"l_orderkey".as("k")).agg(count(lit(1)).as("nl"))
      val predCO = cC.join(cOc, Seq("k"))
        .agg(sum(expr("CAST(nc AS DECIMAL(38,0)) * no")).as("p")).select(
          lit("plan_co_first").as("plan"), $"p".cast("long").as("predicted"))
      val predOL = cOo.join(cL, Seq("k"))
        .agg(sum(expr("CAST(no AS DECIMAL(38,0)) * nl")).as("p")).select(
          lit("plan_ol_first").as("plan"), $"p".cast("long").as("predicted"))
      // ground-truth audit: count the actual intermediates + final
      val actCO = cust.join(ord, $"c_custkey" === $"o_custkey")
        .agg(count(lit(1)).as("actual"))
        .select(lit("plan_co_first").as("plan"), $"actual")
      val actOL = ord.join(li, $"o_orderkey" === $"l_orderkey")
        .agg(count(lit(1)).as("actual"))
        .select(lit("plan_ol_first").as("plan"), $"actual")
      val fin = cust.join(ord, $"c_custkey" === $"o_custkey")
        .join(li, $"o_orderkey" === $"l_orderkey")
        .agg(count(lit(1)).as("final_rows"))
      val pred = predCO.unionByName(predOL)
      val act = actCO.unionByName(actOL)
      val best = pred.agg(min($"predicted").as("bestp"))
      pred.join(act, Seq("plan")).crossJoin(broadcast(fin))
        .crossJoin(broadcast(best))
        .select($"plan", $"predicted", $"actual", $"final_rows",
          when($"predicted" === $"bestp", 1L).otherwise(0L).as("chosen"))
        .orderBy($"plan")
    }, Some("""
      WITH cc AS (SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS nc
        FROM customer GROUP BY 1),
      coc AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS no
        FROM orders GROUP BY 1),
      coo AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS no
        FROM orders GROUP BY 1),
      cl AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS nl
        FROM lineitem GROUP BY 1),
      pred AS (
        SELECT 'plan_co_first' AS plan,
          CAST(sum(CAST(nc AS HUGEINT) * no) AS BIGINT) AS predicted
        FROM cc JOIN coc USING (k)
        UNION ALL
        SELECT 'plan_ol_first',
          CAST(sum(CAST(no AS HUGEINT) * nl) AS BIGINT)
        FROM coo JOIN cl USING (k)),
      act AS (
        SELECT 'plan_co_first' AS plan, CAST(count(*) AS BIGINT) AS actual
        FROM customer JOIN orders ON c_custkey = o_custkey
        UNION ALL
        SELECT 'plan_ol_first', CAST(count(*) AS BIGINT)
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      fin AS (SELECT CAST(count(*) AS BIGINT) AS final_rows
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey),
      best AS (SELECT min(predicted) AS bestp FROM pred)
      SELECT p.plan, p.predicted, a.actual, f.final_rows,
        CAST(CASE WHEN p.predicted = b.bestp THEN 1 ELSE 0 END AS BIGINT) AS chosen
      FROM pred p JOIN act a ON p.plan = a.plan
      CROSS JOIN fin f CROSS JOIN best b
      ORDER BY p.plan""")),

    // ----- point-in-time feature-leakage audit ----------------------------
    // Feature-store correctness: a model served on orders from
    // 1999-01-01 onward must see customer features computed from data
    // BEFORE that date — recomputing the feature over the full history
    // (the lazy backfill bug) leaks the future into training. The audit
    // computes both versions of "customer total spend" in one pass
    // (conditional aggregation — not two scans), then measures, per
    // market segment, how many served customers get an inflated
    // feature and by how much. Money stays in DECIMAL(12,2) end to
    // end (the CoreQueries rule); the inflation ratio clears to one
    // integer division in micro. At 100 TB this is one groupBy per
    // entity plus a broadcast-scale rollup — the cheapest possible
    // point-in-time-correctness gate before a backfill ships.
    ("q258_pit_leakage", (s: SparkSession, dir: String) => {
      import s.implicits._
      val cutoff = lit("1999-01-01").cast("date")
      val o = Tables.t(s, dir, "orders")
        .select($"o_custkey", $"o_orderdate".cast("date").as("d"),
          $"o_totalprice".cast(DecimalType(12, 2)).as("price"))
      val feat = o.groupBy($"o_custkey")
        .agg(sum($"price").as("f_full"),
          sum(when($"d" < cutoff, $"price")
            .otherwise(lit(0).cast(DecimalType(12, 2)))).as("f_pit"),
          sum(when($"d" >= cutoff, 1L).otherwise(0L)).as("n_serving"))
        .filter($"n_serving" > 0)
      feat.join(Tables.t(s, dir, "customer")
          .select($"c_custkey", $"c_mktsegment"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          sum(when($"f_full" > $"f_pit", 1L).otherwise(0L)).as("n_leaky"),
          sum($"f_full").as("spend_full"), sum($"f_pit").as("spend_pit"))
        .select($"c_mktsegment", $"n_customers", $"n_leaky",
          expr("1000000 * n_leaky div n_customers").as("leak_share_micro"),
          expr("CAST(CAST(spend_full * 100 AS DECIMAL(38,0)) AS BIGINT)")
            .as("spend_full_cents"),
          expr("CAST(CAST(spend_pit * 100 AS DECIMAL(38,0)) AS BIGINT)")
            .as("spend_pit_cents"),
          expr("""CAST((1000000 * CAST(spend_full * 100 AS DECIMAL(38,0)))
            div CAST(spend_pit * 100 AS DECIMAL(38,0)) AS BIGINT)""")
            .as("inflation_micro"))
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
          CAST(o_totalprice AS DECIMAL(12,2)) AS price FROM orders),
      feat AS (SELECT o_custkey,
          sum(price) AS f_full,
          sum(CASE WHEN d < DATE '1999-01-01' THEN price
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS f_pit,
          sum(CASE WHEN d >= DATE '1999-01-01' THEN 1 ELSE 0 END) AS n_serving
        FROM o GROUP BY 1),
      served AS (SELECT * FROM feat WHERE n_serving > 0)
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        CAST(sum(CASE WHEN f_full > f_pit THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky,
        CAST(1000000 * sum(CASE WHEN f_full > f_pit THEN 1 ELSE 0 END)
          // count(*) AS BIGINT) AS leak_share_micro,
        CAST(CAST(sum(f_full) * 100 AS HUGEINT) AS BIGINT) AS spend_full_cents,
        CAST(CAST(sum(f_pit) * 100 AS HUGEINT) AS BIGINT) AS spend_pit_cents,
        CAST((1000000 * CAST(sum(f_full) * 100 AS HUGEINT))
          // CAST(sum(f_pit) * 100 AS HUGEINT) AS BIGINT) AS inflation_micro
      FROM served JOIN customer ON o_custkey = c_custkey
      GROUP BY 1 ORDER BY 1"""))
  )
}
