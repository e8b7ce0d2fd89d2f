package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Similarity, TextAnalysis => TA}

/** Round-8 batch 4: operational planning/uncertainty surfaces — the LSH
  * banding-scheme planner (pick (bands, rows) BEFORE committing a 100 TB
  * dedup run), scan-once Poisson-bootstrap confidence intervals, and an
  * IVF index-staleness audit (what an ingest does to a trained index).
  *
  * Determinism house rules throughout: md5-derived randomness, exact
  * integer inputs to every double expression (so both engines compute
  * bit-identical doubles), micro-integer emission via floor(x·1e6 + 0.5),
  * total ORDER BY.
  */
object Round8dQueries {

  private val normSql = TA.normTextSql
  private val P = Dedup.HashPrime

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- LSH banding-scheme planner (S-curve, predicted vs observed) ----
    // The (bands b, rows r) choice decides an LSH dedup run's recall AND
    // cost before it starts; the S-curve p(s) = 1 − (1 − s^r)^b is the
    // planning formula, and this operator checks it against reality on
    // the 8-perm source signatures (q194's mergeable index — the
    // pairwise stage touches |sources|² signature rows, never content).
    // For each scheme that partitions 8 perms — (b=8,r=1), (b=4,r=2),
    // (b=2,r=4) — it emits how many pairs the banding would CATCH
    // (some band fully equal) next to the theoretical expectation
    // Σ p(s_exact) over the same pairs. Powers are expanded as explicit
    // products of integer-derived doubles (no pow(), whose libm varies
    // by engine), so predicted values are bit-identical. The table IS
    // the dial: r up → precision up/recall down, and the observed gap
    // from theory prices the 8-perm signature's variance. Sets are
    // 3-gram SHINGLES (the q202 universe): source-level shingle
    // similarities sit in the S-curve's discriminating low tail
    // (s ≈ 0.01–0.08 at test SF), where the three schemes actually
    // separate — word-token sets here are near-identical (s ≈ 1) and
    // every scheme catches everything.
    ("q211_lsh_banding_planner", (s: SparkSession, dir: String) => {
      import s.implicits._
      val st = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", explode(TA.shingles($"text", 3)).as("tok"))
        .distinct()
        .localCheckpoint() // consumed by the signature and the exact branches
      val h = st.withColumn("h",
        conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long"))
      val minCols: Seq[Column] = (0 until 8).map { k =>
        val (a, b) = Dedup.permConsts(k)
        min(($"h" * a + b) % P).as(s"m$k")
      }
      val sigs = h.groupBy($"source")
        .agg(count(lit(1)).as("n_toks"), minCols: _*)
      val a = sigs.toDF(sigs.columns.map(c => s"a_$c"): _*)
      val b = sigs.toDF(sigs.columns.map(c => s"b_$c"): _*)
      val m: Seq[Column] = (0 until 8).map(k =>
        when(col(s"a_m$k") === col(s"b_m$k"), 1L).otherwise(0L))
      val inter = st.toDF("sa", "tok")
        .join(st.toDF("sb", "tok"), Seq("tok"))
        .filter($"sa" < $"sb")
        .groupBy($"sa", $"sb").agg(count(lit(1)).as("inter"))
      val pairs = a.join(b, col("a_source") < col("b_source"))
        .join(inter, col("a_source") === $"sa" && col("b_source") === $"sb", "left")
        .na.fill(0L, Seq("inter"))
      val sCol = $"inter".cast("double") /
        (col("a_n_toks") + col("b_n_toks") - $"inter").cast("double")
      def micro(p: Column): Column = floor(p * 1000000 + lit(0.5)).cast("long")
      // b=8, r=1: catch = any perm equal; p = 1 - (1-s)^8
      val c81 = when(m.reduce(_ + _) >= 1, 1L).otherwise(0L)
      val t1 = lit(1.0) - sCol
      val p81 = micro(lit(1.0) - (((t1 * t1) * (t1 * t1)) * ((t1 * t1) * (t1 * t1))))
      // b=4, r=2: bands (01)(23)(45)(67); p = 1 - (1-s^2)^4
      val c42 = when(greatest(m(0) * m(1), m(2) * m(3), m(4) * m(5), m(6) * m(7)) >= 1,
        1L).otherwise(0L)
      val t2 = lit(1.0) - sCol * sCol
      val p42 = micro(lit(1.0) - ((t2 * t2) * (t2 * t2)))
      // b=2, r=4: bands (0123)(4567); p = 1 - (1-s^4)^2
      val c24 = when(greatest(m(0) * m(1) * m(2) * m(3),
        m(4) * m(5) * m(6) * m(7)) >= 1, 1L).otherwise(0L)
      val t4 = lit(1.0) - (sCol * sCol) * (sCol * sCol)
      val p24 = micro(lit(1.0) - t4 * t4)
      pairs.select(explode(array(
          struct(lit("b2_r4").as("cfg"), c24.as("caught"), p24.as("exp_micro")),
          struct(lit("b4_r2").as("cfg"), c42.as("caught"), p42.as("exp_micro")),
          struct(lit("b8_r1").as("cfg"), c81.as("caught"), p81.as("exp_micro")))).as("x"))
        .select($"x.cfg".as("cfg"), $"x.caught".as("caught"), $"x.exp_micro".as("exp_micro"))
        .groupBy($"cfg")
        .agg(count(lit(1)).as("n_pairs"), sum($"caught").as("n_caught"),
          sum($"exp_micro").as("exp_caught_micro"))
        .orderBy($"cfg")
    }, Some {
      val mins = (0 until 8).map { k =>
        val (a, b) = Dedup.permConsts(k)
        s"min((h * $a + $b) % $P) AS m$k"
      }.mkString(", ")
      val meq = (0 until 8).map(k =>
        s"(CASE WHEN a.m$k = b.m$k THEN 1 ELSE 0 END)")
      s"""
      WITH d AS (SELECT source, string_split($normSql, ' ') AS arr FROM documents),
      st AS (SELECT DISTINCT source, tok
        FROM (SELECT source, unnest(list_transform(range(1, greatest(len(arr) - 2, 1) + 1),
          i -> array_to_string(arr[i:i+2], ' '))) AS tok FROM d)),
      h AS (SELECT source, tok, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM st),
      sig AS (SELECT source, CAST(count(*) AS BIGINT) AS n_toks, $mins
        FROM h GROUP BY 1),
      i AS (SELECT x.source AS sa, y.source AS sb, CAST(count(*) AS BIGINT) AS inter
        FROM st x JOIN st y ON x.tok = y.tok AND x.source < y.source GROUP BY 1, 2),
      pr AS (SELECT ${meq.zipWithIndex.map { case (e, k) => s"$e AS q$k" }.mkString(", ")},
          CAST(coalesce(i.inter, 0) AS DOUBLE)
            / (a.n_toks + b.n_toks - CAST(coalesce(i.inter, 0) AS BIGINT)) AS s
        FROM sig a JOIN sig b ON a.source < b.source
        LEFT JOIN i ON i.sa = a.source AND i.sb = b.source),
      cfgs AS (
        SELECT 'b8_r1' AS cfg,
          CASE WHEN q0 + q1 + q2 + q3 + q4 + q5 + q6 + q7 >= 1 THEN 1 ELSE 0 END AS caught,
          CAST(floor((1 - (((1-s)*(1-s)) * ((1-s)*(1-s))) * (((1-s)*(1-s)) * ((1-s)*(1-s)))) * 1000000 + 0.5) AS BIGINT) AS exp_micro
        FROM pr
        UNION ALL
        SELECT 'b4_r2',
          CASE WHEN greatest(q0*q1, q2*q3, q4*q5, q6*q7) >= 1 THEN 1 ELSE 0 END,
          CAST(floor((1 - ((1-s*s)*(1-s*s)) * ((1-s*s)*(1-s*s))) * 1000000 + 0.5) AS BIGINT)
        FROM pr
        UNION ALL
        SELECT 'b2_r4',
          CASE WHEN greatest(q0*q1*q2*q3, q4*q5*q6*q7) >= 1 THEN 1 ELSE 0 END,
          CAST(floor((1 - (1-(s*s)*(s*s)) * (1-(s*s)*(s*s))) * 1000000 + 0.5) AS BIGINT)
        FROM pr)
      SELECT cfg, CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(sum(caught) AS BIGINT) AS n_caught,
        CAST(sum(exp_micro) AS BIGINT) AS exp_caught_micro
      FROM cfgs GROUP BY cfg ORDER BY cfg"""
    }),

    // ----- Poisson-bootstrap confidence interval (scan-once) --------------
    // Error bars on corpus statistics without resampling the corpus: the
    // Poisson bootstrap draws each row's replicate weight w ~ Poisson(1)
    // independently per (row, replicate) — md5-uniform u against the
    // HARD-CODED Poisson(1) CDF thresholds (×1e9; e⁻¹·Σ 1/k!, exact
    // literals both engines) — so all 8 replicate means of mean(n_chars)
    // come out of ONE corpus scan as 8 parallel conditional aggregates.
    // This is the only bootstrap that works at 100 TB (classic
    // resampling needs n draws from a distributed corpus; Poisson
    // weights are row-local and seedless-deterministic here, so any
    // retry regenerates the identical replicate). The spread of the 8
    // replicate rows against mean_full_micro IS the confidence interval.
    ("q212_poisson_bootstrap", (s: SparkSession, dir: String) => {
      import s.implicits._
      val thresholds = Seq(367879441L, 735758882L, 919698603L, 981011843L,
        996340153L, 999405815L, 999916759L, 999989751L)
      val d = Tables.t(s, dir, "documents").select($"doc_id", $"n_chars")
      val full = d.agg(expr("(1000000 * sum(n_chars)) div count(*)")
        .as("mean_full_micro"))
      val reps = d.select($"doc_id", $"n_chars",
          explode(array((0 to 7).map(lit): _*)).as("rep"))
        .withColumn("u",
          conv(substring(md5(concat_ws("|", lit("bs"), $"doc_id".cast("string"),
            $"rep".cast("string"))), 1, 8), 16, 10).cast("long") % 1000000000L)
        .withColumn("w",
          thresholds.map(t => when($"u" >= t, 1L).otherwise(0L)).reduce(_ + _))
      reps.groupBy($"rep")
        .agg(sum($"w").as("n_eff"), sum($"w" * $"n_chars").as("wsum"))
        .crossJoin(broadcast(full))
        .select($"rep".cast("long").as("rep"), $"n_eff",
          expr("(1000000 * wsum) div n_eff").as("mean_micro"),
          $"mean_full_micro")
        .orderBy("rep")
    }, Some {
      val ts = Seq(367879441L, 735758882L, 919698603L, 981011843L,
        996340153L, 999405815L, 999916759L, 999989751L)
      val wExpr = ts.map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
      s"""
      WITH full_m AS (SELECT (1000000 * CAST(sum(n_chars) AS BIGINT)) // CAST(count(*) AS BIGINT) AS mean_full_micro FROM documents),
      reps AS (SELECT d.doc_id, d.n_chars, r.rep,
          ('0x' || substr(md5('bs|' || CAST(d.doc_id AS VARCHAR) || '|' || CAST(r.rep AS VARCHAR)), 1, 8))::BIGINT % 1000000000 AS u
        FROM documents d CROSS JOIN (SELECT unnest(range(0, 8)) AS rep) r),
      w AS (SELECT rep, n_chars, $wExpr AS w FROM reps)
      SELECT CAST(rep AS BIGINT) AS rep, CAST(sum(w) AS BIGINT) AS n_eff,
        (1000000 * CAST(sum(w * n_chars) AS BIGINT)) // CAST(sum(w) AS BIGINT) AS mean_micro,
        f.mean_full_micro
      FROM w CROSS JOIN full_m f GROUP BY rep, f.mean_full_micro ORDER BY rep"""
    }),

    // ----- IVF index staleness after ingest -------------------------------
    // A trained ANN index degrades as the corpus drifts under it; this
    // is the audit that decides WHEN to retrain. Centroids are k-means
    // trained (2 Lloyd rounds, the q47 template) on the OLD snapshot
    // only (even ids); then the WHOLE corpus — old plus the odd-id
    // "ingest" — is assigned to those frozen cells. Per cell: old/new
    // populations, share of each snapshot, and the mean assignment
    // cosine (micro) per snapshot — new rows fitting systematically
    // worse than old (fit_new < fit_old) or crowding into few cells
    // (share skew) is the retrain signal. Training touches only the old
    // sample; the audit itself is one broadcast-centroid assignment pass
    // + one aggregate — the per-ingest cost is a single corpus map.
    ("q213_ivf_staleness", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
        .localCheckpoint() // training scans + the full assignment pass
      // init pred caps the codebook at 20 cells REGARDLESS of corpus
      // size (id < 2000 bounds the seed set): with K fixed, the
      // broadcast assignment pass stays O(N·K) = linear — the ×10 scale
      // probe measured the uncapped form (K ∝ N → N·K ∝ N²) at 4.4×
      // wall, which is the trap this bound removes; production sizes K
      // by sampling the init set the same way
      val cents = Similarity.kmeansCentroids(
        prepared.filter($"id" % 2 === 0), $"id" % 100 === 0 && $"id" < 2000,
        iters = 2)
        .localCheckpoint()
      val scored = prepared.crossJoin(broadcast(cents))
        .select($"id", $"cent_id",
          Similarity.cosine(Similarity.dot($"qvec", $"cent_vec"), $"n2", $"cent_n2")
            .as("cent_cos"))
      val asg = scored.groupBy($"id")
        .agg(max_by(struct($"cent_id", $"cent_cos"),
          struct($"cent_cos", -$"cent_id")).as("best"))
        .select($"id", $"best.cent_id".as("cluster_id"),
          floor($"best.cent_cos" * 1000000 + lit(0.5)).cast("long").as("fit_micro"),
          ($"id" % 2 === 0).as("is_old"))
      val tots = asg.agg(
        sum(when($"is_old", 1L).otherwise(0L)).as("t_old"),
        sum(when(!$"is_old", 1L).otherwise(0L)).as("t_new"))
      asg.groupBy($"cluster_id")
        .agg(sum(when($"is_old", 1L).otherwise(0L)).as("n_old"),
          sum(when(!$"is_old", 1L).otherwise(0L)).as("n_new"),
          sum(when($"is_old", $"fit_micro").otherwise(0L)).as("fso"),
          sum(when(!$"is_old", $"fit_micro").otherwise(0L)).as("fsn"))
        .crossJoin(broadcast(tots))
        .select($"cluster_id", $"n_old", $"n_new",
          expr("(1000000 * n_old) div t_old").as("share_old_micro"),
          expr("(1000000 * n_new) div t_new").as("share_new_micro"),
          when($"n_old" > 0, expr("fso div n_old")).otherwise(0L).as("fit_old_micro"),
          when($"n_new" > 0, expr("fsn div n_new")).otherwise(0L).as("fit_new_micro"))
        .orderBy("cluster_id")
    }, Some {
      def iter(i: Int): String = s"""
      a$i AS (SELECT vec_id, qvec, n2, cent_id AS cluster_id FROM (
        SELECT ne.vec_id, ne.qvec, ne.n2, c.cent_id,
          row_number() OVER (PARTITION BY ne.vec_id ORDER BY
            list_dot_product(ne.qvec, c.cvec) / sqrt(ne.n2 * c.cn2) DESC, c.cent_id) AS r
        FROM ne, c${i - 1} c) WHERE r = 1),
      m$i AS (SELECT cluster_id, pos, round(sum(v) / count(*)) AS m FROM (
        SELECT cluster_id, unnest(qvec) AS v, unnest(range(1, len(qvec) + 1)) AS pos FROM a$i)
        GROUP BY cluster_id, pos),
      c$i AS (SELECT cent_id, cvec, list_dot_product(cvec, cvec) AS cn2 FROM (
        SELECT cluster_id AS cent_id, list(m ORDER BY pos) AS cvec FROM m$i GROUP BY cluster_id))"""
      s"""
      WITH ${Similarity.prepareSql},
      ne AS (SELECT vec_id, qvec, n2 FROM n WHERE vec_id % 2 = 0),
      c0 AS (SELECT vec_id AS cent_id, qvec AS cvec, n2 AS cn2
        FROM ne WHERE vec_id % 100 = 0 AND vec_id < 2000),
      ${iter(1)},
      ${iter(2)},
      asg AS (SELECT vec_id, cluster_id,
          CAST(floor(fit * 1000000 + 0.5) AS BIGINT) AS fit_micro,
          vec_id % 2 = 0 AS is_old
        FROM (SELECT n.vec_id, c.cent_id AS cluster_id,
          list_dot_product(n.qvec, c.cvec) / sqrt(n.n2 * c.cn2) AS fit,
          row_number() OVER (PARTITION BY n.vec_id ORDER BY
            list_dot_product(n.qvec, c.cvec) / sqrt(n.n2 * c.cn2) DESC, c.cent_id) AS r
        FROM n, c2 c) WHERE r = 1),
      tots AS (SELECT CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS t_old,
          CAST(sum(CASE WHEN is_old THEN 0 ELSE 1 END) AS BIGINT) AS t_new FROM asg)
      SELECT cluster_id,
        CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
        CAST(sum(CASE WHEN is_old THEN 0 ELSE 1 END) AS BIGINT) AS n_new,
        (1000000 * CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT)) // t.t_old AS share_old_micro,
        (1000000 * CAST(sum(CASE WHEN is_old THEN 0 ELSE 1 END) AS BIGINT)) // t.t_new AS share_new_micro,
        CASE WHEN sum(CASE WHEN is_old THEN 1 ELSE 0 END) > 0
          THEN CAST(sum(CASE WHEN is_old THEN fit_micro ELSE 0 END) AS BIGINT)
            // CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) ELSE 0 END AS fit_old_micro,
        CASE WHEN sum(CASE WHEN is_old THEN 0 ELSE 1 END) > 0
          THEN CAST(sum(CASE WHEN is_old THEN 0 ELSE fit_micro END) AS BIGINT)
            // CAST(sum(CASE WHEN is_old THEN 0 ELSE 1 END) AS BIGINT) ELSE 0 END AS fit_new_micro
      FROM asg CROSS JOIN tots t
      GROUP BY cluster_id, t.t_old, t.t_new ORDER BY cluster_id"""
    })
  )
}
