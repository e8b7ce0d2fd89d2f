package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 10: preference queries (skyline), market-basket rule
  * mining on top of the q151 pair counts, and leave-one-out source
  * valuation — what each source contributes to a corpus-level metric.
  */
object Round8jQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- 2-D skyline (Pareto frontier) ----------------------------------
    // The preference query: parts where no other part is both cheaper
    // AND larger — the Pareto frontier of (price ↓, size ↑). The naive
    // form is an O(n²) dominance anti-join; the sort-based form used
    // here is one cumulative window over the PRICE-sorted order: a part
    // is on the skyline iff its size strictly exceeds the max size of
    // every STRICTLY cheaper part (ties in price can't dominate each
    // other on price, so the running max must only cover cheaper rows —
    // a range frame keyed on the price value handles tie groups
    // exactly). Price quantizes to cents first (the money rule), so
    // frame bounds are integer-exact. The prefix-max runs over the
    // distinct-price grid and joins back to the rows, so no corpus-sized
    // single-partition window exists at any scale.
    ("q225_skyline", (s: SparkSession, dir: String) => {
      import s.implicits._
      val p = Tables.t(s, dir, "part")
        .select($"p_partkey", $"p_size".cast("long").as("size"),
          floor($"p_retailprice" * 100 + lit(0.5)).cast("long").as("price_cents"))
      // distributed form (r14; was a single-partition window over every
      // part row): best_cheaper is constant per distinct price, so run
      // the prefix-max over the |distinct prices| VALUE GRID (bounded by
      // the price domain, not the corpus — the house grid convention)
      // and join it back by price. rowsBetween(-1) on the distinct grid
      // ≡ rangeBetween(-1) on raw rows: both see exactly the strictly
      // cheaper prices.
      val grid = p.groupBy($"price_cents").agg(max($"size").as("gmax"))
      val wg = Window.orderBy($"price_cents")
        .rowsBetween(Window.unboundedPreceding, -1)
      val bc = grid.withColumn("best_cheaper", max($"gmax").over(wg))
        .select($"price_cents", $"best_cheaper")
      p.join(bc, Seq("price_cents"))
        .filter($"best_cheaper".isNull || $"size" > $"best_cheaper")
        .select($"p_partkey", $"price_cents", $"size",
          coalesce($"best_cheaper", lit(-1L)).as("best_cheaper_size"))
        .orderBy("price_cents", "p_partkey")
    }, Some("""
      WITH p AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
          CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents
        FROM part),
      m AS (SELECT p_partkey, price_cents, size,
          max(size) OVER (ORDER BY price_cents
            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_cheaper
        FROM p)
      SELECT p_partkey, price_cents, size,
        CAST(coalesce(best_cheaper, -1) AS BIGINT) AS best_cheaper_size
      FROM m WHERE best_cheaper IS NULL OR size > best_cheaper
      ORDER BY price_cents, p_partkey""")),

    // ----- association rules (confidence / lift over q151's pairs) --------
    // The step after pair mining: turn co-occurrence counts into RULES.
    // For each frequent ordered pair a→b (support ≥ 3 baskets — the
    // generator's basket overlap is sparse; a real retail corpus raises
    // the floor with its density):
    // confidence = P(b|a) = n_ab/n_a and lift = N·n_ab/(n_a·n_b), both
    // cleared to micro integers. Inputs are exactly two bounded
    // aggregates (per-item basket counts, per-pair counts — the q151
    // order-bounded self-join); the rule table is pair-sized, ranked by
    // lift with a TakeOrdered top-20. Lift > 1e6 means genuinely
    // associated, not just popular — the number that separates
    // recommendation signal from shelf-position noise.
    ("q226_association_rules", (s: SparkSession, dir: String) => {
      import s.implicits._
      val items = Tables.t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
        .localCheckpoint() // item counts + pair join + basket count
      val nBaskets = items.select($"ok").distinct().agg(count(lit(1)).as("nb"))
      val itemCnt = items.groupBy($"pk").agg(count(lit(1)).as("n_item"))
      val pairs = items.toDF("ok", "a").join(items.toDF("ok", "b"), Seq("ok"))
        .filter($"a" =!= $"b")
        .groupBy($"a", $"b").agg(count(lit(1)).as("n_ab"))
        .filter($"n_ab" >= 3)
      pairs
        .join(itemCnt.toDF("a", "n_a"), Seq("a"))
        .join(itemCnt.toDF("b", "n_b"), Seq("b"))
        .crossJoin(broadcast(nBaskets))
        .select($"a".as("antecedent"), $"b".as("consequent"), $"n_ab",
          expr("(1000000 * n_ab) div n_a").as("confidence_micro"),
          expr("(1000000 * nb * n_ab) div (n_a * n_b)").as("lift_micro"))
        .orderBy(desc("lift_micro"), desc("n_ab"), $"antecedent", $"consequent")
        .limit(20)
    }, Some("""
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS nb FROM items),
      ic AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_item FROM items GROUP BY 1),
      pairs AS (SELECT a.pk AS a, b.pk AS b, CAST(count(*) AS BIGINT) AS n_ab
        FROM items a JOIN items b ON a.ok = b.ok AND a.pk <> b.pk
        GROUP BY 1, 2 HAVING count(*) >= 3)
      SELECT p.a AS antecedent, p.b AS consequent, p.n_ab,
        (1000000 * p.n_ab) // ia.n_item AS confidence_micro,
        (1000000 * nb.nb * p.n_ab) // (ia.n_item * ib.n_item) AS lift_micro
      FROM pairs p JOIN ic ia ON ia.pk = p.a JOIN ic ib ON ib.pk = p.b
      CROSS JOIN nb
      ORDER BY lift_micro DESC, n_ab DESC, antecedent, consequent LIMIT 20""")),

    // ----- leave-one-out source valuation ---------------------------------
    // Data valuation without retraining: each source's contribution to a
    // corpus-level metric, read off as the LEAVE-ONE-OUT delta — what
    // the corpus mean of the q191 quality logit becomes if this source
    // were dropped. The algebra makes it free: one per-source (Σlogit,
    // n) aggregate gives every LOO mean as (total − s_i)/(n − n_i) — NO
    // per-source rescans, |sources| arithmetic rows after one corpus
    // pass. A negative delta means the corpus mean would RISE
    // without the source: the first-order case for down-weighting it in
    // the mixture (q107's input). The same template prices any additive
    // metric — token counts, dedup rates, contamination hits.
    ("q227_loo_source_value", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"source", explode(split(TA.normText($"text"), " ")).as("tok"))
      val scored = toks
        .withColumn("w",
          conv(substring(md5(concat(lit("w|"),
              (conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long") % 1024)
                .cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2001 - 1000)
        .groupBy($"doc_id", $"source").agg(sum($"w").as("logit"))
      val per = scored.groupBy($"source")
        .agg(count(lit(1)).as("n_s"), sum($"logit").as("sl"))
      val tot = per.agg(sum($"n_s").as("n"), sum($"sl").as("tl"))
      // logit sums are SIGNED (weights center on 0): Spark's `div`
      // truncates toward zero while DuckDB's `//` floors, so all four
      // quotients use explicit FLOOR(/) — floored like the oracle, and
      // exact while the operands stay inside double's 2^53 (documented
      // bound; the test corpus is orders inside it)
      per.crossJoin(broadcast(tot))
        .select($"source", $"n_s",
          expr("CAST(floor(sl / n_s) AS BIGINT)").as("own_mean"),
          expr("CAST(floor(tl / n) AS BIGINT)").as("all_mean"),
          expr("CAST(floor((tl - sl) / (n - n_s)) AS BIGINT)").as("loo_mean"),
          (expr("CAST(floor(tl / n) AS BIGINT)") -
            expr("CAST(floor((tl - sl) / (n - n_s)) AS BIGINT)")).as("delta"))
        .orderBy("source")
    }, Some(s"""
      WITH toks AS (SELECT doc_id, source, unnest(string_split($normSql, ' ')) AS tok FROM documents),
      tw AS (SELECT doc_id, source,
          ('0x' || substr(md5('w|' || CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000 AS w
        FROM toks),
      scored AS (SELECT doc_id, source, CAST(sum(w) AS BIGINT) AS logit
        FROM tw GROUP BY 1, 2),
      per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s,
          CAST(sum(logit) AS BIGINT) AS sl FROM scored GROUP BY 1),
      tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n, CAST(sum(sl) AS BIGINT) AS tl FROM per)
      SELECT per.source, per.n_s,
        per.sl // per.n_s AS own_mean,
        tot.tl // tot.n AS all_mean,
        (tot.tl - per.sl) // (tot.n - per.n_s) AS loo_mean,
        tot.tl // tot.n - (tot.tl - per.sl) // (tot.n - per.n_s) AS delta
      FROM per CROSS JOIN tot ORDER BY per.source"""))
  )
}
