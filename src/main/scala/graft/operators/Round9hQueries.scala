package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Similarity, TextAnalysis => TA}

/** Round-9 batch 8: personalized PageRank (teleport to a SEED set —
  * the "related to these items" expansion q153's global walk cannot
  * answer) and per-dimension embedding whitening statistics (the
  * standardization pass before any distance is trustworthy).
  *
  * (This batch's first draft also carried a padding-waste audit; it
  * duplicated q291 — found in the round-9 dedup audit and removed.)
  *
  * House rules as elsewhere: integer micro arithmetic; the per-dim
  * sqrt runs map-side on exact integers over a dim-bounded table
  * (q295's rule); identical aliases both sides, total ORDER BY.
  */
object Round9hQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- personalized PageRank (teleport-to-seeds) ------------------------
    // q153 ranks GLOBAL centrality; the production recommender
    // question is local: which nodes matter relative to THESE seeds?
    // Same bipartite part/supplier graph and micro-mass arithmetic as
    // q153, but the restart mass returns to the seed set (parts with
    // partkey ≡ 0 mod 97 — a fixed, SF-stable rule) instead of
    // everywhere: r₀ = 1e6 on seeds, 0 elsewhere; each of 3 unrolled
    // rounds r' = (seed ? 150000 : 0) + 85%·Σ r/d — the unnormalized
    // teleport iteration (total mass decays; the RANKING is the
    // answer, stated honestly). Rounds are co-partitioned equi-joins
    // on the edge list, the q153/q251 bounded-round shape. Nodes the
    // walk never reaches simply don't appear — locality is the point.
    ("q340_personalized_pagerank", (s: SparkSession, dir: String) => {
      import s.implicits._
      val e0 = Tables.t(s, dir, "lineitem")
        .select(($"l_partkey" * 2).as("u"), ($"l_suppkey" * 2 + 1).as("v"))
        .distinct()
      val e = e0.unionByName(e0.select($"v".as("u"), $"u".as("v")))
      val deg = e.groupBy($"u").agg(count(lit(1)).as("d"))
      val ed = e.join(deg, Seq("u")).localCheckpoint()
      val seeds = deg.select($"u".as("n"),
        when($"u" % 2 === 0 && ($"u" / 2) % 97 === 0, 1L).otherwise(0L)
          .as("is_seed"))
      var ranks = seeds.select($"n", ($"is_seed" * 1000000L).as("r"))
      for (_ <- 1 to 3) {
        val pushed = ed.as("e")
          .join(ranks.filter($"r" > 0).as("rk"), col("e.u") === col("rk.n"))
          .groupBy(col("e.v").as("n"))
          .agg(expr("CAST((85 * sum(rk.r div e.d)) div 100 AS BIGINT)")
            .as("m"))
        ranks = seeds.join(pushed, Seq("n"), "left")
          .select($"n",
            ($"is_seed" * 150000L + coalesce($"m", lit(0L))).as("r"))
      }
      ranks.filter($"r" > 0)
        .join(seeds, Seq("n"))
        .select($"n".as("node_id"),
          when($"n" % 2 === 0, "part").otherwise("supplier").as("kind"),
          $"is_seed", $"r".as("ppr_micro"))
        .orderBy(desc("ppr_micro"), $"node_id").limit(32)
    }, Some("""
      WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM lineitem),
      e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
      deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY u),
      seeds AS (SELECT u AS n,
          CAST(CASE WHEN u % 2 = 0 AND (u // 2) % 97 = 0 THEN 1 ELSE 0 END
            AS BIGINT) AS is_seed
        FROM deg),
      r0 AS (SELECT n, is_seed * 1000000 AS r FROM seeds),
      p1 AS (SELECT e.v AS n,
          CAST((85 * sum(r0.r // deg.d)) // 100 AS BIGINT) AS m
        FROM e JOIN deg USING (u) JOIN r0 ON r0.n = e.u AND r0.r > 0
        GROUP BY e.v),
      r1 AS (SELECT s.n, s.is_seed * 150000 + coalesce(p1.m, 0) AS r
        FROM seeds s LEFT JOIN p1 ON s.n = p1.n),
      p2 AS (SELECT e.v AS n,
          CAST((85 * sum(r1.r // deg.d)) // 100 AS BIGINT) AS m
        FROM e JOIN deg USING (u) JOIN r1 ON r1.n = e.u AND r1.r > 0
        GROUP BY e.v),
      r2 AS (SELECT s.n, s.is_seed * 150000 + coalesce(p2.m, 0) AS r
        FROM seeds s LEFT JOIN p2 ON s.n = p2.n),
      p3 AS (SELECT e.v AS n,
          CAST((85 * sum(r2.r // deg.d)) // 100 AS BIGINT) AS m
        FROM e JOIN deg USING (u) JOIN r2 ON r2.n = e.u AND r2.r > 0
        GROUP BY e.v),
      r3 AS (SELECT s.n, s.is_seed * 150000 + coalesce(p3.m, 0) AS r
        FROM seeds s LEFT JOIN p3 ON s.n = p3.n)
      SELECT r3.n AS node_id,
        CASE WHEN r3.n % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
        s.is_seed, r3.r AS ppr_micro
      FROM r3 JOIN seeds s ON r3.n = s.n WHERE r3.r > 0
      ORDER BY ppr_micro DESC, node_id LIMIT 32""")),

    // ----- per-dimension whitening statistics -------------------------------
    // Cosine and Euclidean distances silently weight dimensions by
    // their variance; whitening (per-dim standardize) is the
    // preprocessing every ANN/clustering stage assumes and nobody
    // checks. Per dimension of the quantized embeddings: mean, the
    // σ in quantized units (ONE sqrt per dim over the 64-row stats
    // table, exact-integer operand via n·Σv² − (Σv)² in DECIMAL), and
    // the VERIFICATION pass — re-scan the corpus with the broadcast
    // stats and confirm the standardized residuals per dim: Σ(v·n−sv)
    // is 0 EXACTLY (the centering identity), max |z| in milli-σ units
    // is the honest outlier read per dim. Constant dims yield NULL z
    // (σ = 0) in both engines.
    ("q341_whitening_stats", (s: SparkSession, dir: String) => {
      import s.implicits._
      val dims = Tables.spread(Tables.t(s, dir, "embeddings"))
        .select(posexplode(Similarity.quantize($"embedding"))
          .as(Seq("j0", "x")))
        .select(($"j0" + 1).as("j"), $"x".cast("long").as("v"))
        .localCheckpoint() // reused: stats + the verification rescan
      val st = dims.groupBy($"j").agg(count(lit(1)).as("n"),
          sum($"v").as("sv"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("svv"))
        .select($"j", $"n", $"sv",
          expr("""CAST(floor(sqrt(
              CAST(n * svv - CAST(sv AS DECIMAL(38,0)) * sv AS DOUBLE))
              / n + 0.5) AS BIGINT)""").as("sigma_q"))
      dims.join(broadcast(st), Seq("j"))
        .groupBy($"j")
        .agg(max($"n").as("n"), max($"sv").as("sv"),
          max($"sigma_q").as("sigma_q"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * n - sv")).as("ssz"),
          max(expr("""CASE WHEN sigma_q = 0 THEN NULL
            ELSE abs(v * n - sv) * 1000 div (n * sigma_q) END"""))
            .as("max_abs_z_milli"))
        .select($"j".as("dim"), $"n",
          expr("sv div n").as("mean_q"), $"sigma_q",
          expr("CAST(ssz AS BIGINT)").as("centering_residual"),
          $"max_abs_z_milli")
        .orderBy($"dim")
    }, Some(s"""
      WITH p AS (SELECT vec_id,
          list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 10000))
            AS qvec FROM embeddings),
      dims AS (SELECT j, CAST(qvec[CAST(j AS INT)] AS BIGINT) AS v
        FROM p, unnest(range(1, len(qvec) + 1)) AS t(j)),
      st AS (SELECT j, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(v) AS BIGINT) AS sv,
          CAST(floor(sqrt(
            CAST(count(*) * sum(CAST(v AS HUGEINT) * v)
              - CAST(sum(v) AS HUGEINT) * sum(v) AS DOUBLE))
            / count(*) + 0.5) AS BIGINT) AS sigma_q
        FROM dims GROUP BY j)
      SELECT d.j AS dim, max(st.n) AS n,
        max(st.sv) // max(st.n) AS mean_q,
        max(st.sigma_q) AS sigma_q,
        CAST(sum(CAST(d.v AS HUGEINT) * st.n - st.sv) AS BIGINT)
          AS centering_residual,
        max(CASE WHEN st.sigma_q = 0 THEN NULL
          ELSE abs(d.v * st.n - st.sv) * 1000 // (st.n * st.sigma_q) END)
          AS max_abs_z_milli
      FROM dims d JOIN st ON d.j = st.j
      GROUP BY d.j ORDER BY dim"""))
  )
}
