package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Similarity, TextAnalysis => TA}

/** Round-8 batch 27: isotonic calibration (exact PAVA via the minimax
  * identity over a bounded bin grid), a multinomial Naive Bayes
  * classifier trained and evaluated end-to-end, and a kNN hubness
  * audit — the calibration FIX q204's audit motivates, a real
  * generative classifier beyond q191's hashed scorer, and the
  * high-dimensional pathology read on the retrieval graph.
  *
  * House rules as elsewhere: integer arithmetic at every gate,
  * micro-ln (floor(ln·1e6 + 0.5)) for every transcendental with the
  * identical expression in both engines, map-side sqrt only on final
  * bounded rows. Identical aliases both sides, total ORDER BY.
  */
object Round8aaQueries {

  private val normSql = TA.normTextSql
  private val AnnProjs = Similarity.OracleProjs
  private val annPrepSql = Similarity.prepareSql
  private val annBucketSql = Similarity.lshBucketSql

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- isotonic calibration via the minimax identity ------------------
    // q204 AUDITS calibration; this FIXES it: the isotonic (monotone
    // nondecreasing) regression of the positive rate on the score,
    // which is what sklearn's CalibratedClassifier fits. Scores bin to
    // a 256-cell equal-width grid first (the standard calibration
    // preprocessing — and the scale move: the corpus collapses to
    // ≤256 weighted points, so EVERYTHING downstream is bin-bounded
    // regardless of corpus size). PAVA's fixpoint has the closed
    // minimax form iso(i) = max_{j≤i} min_{k≥i} mean(pos over bins
    // j..k); means come from prefix sums as integer-div micro
    // (floor is monotone, so max∘min of floored means == floor of the
    // exact minimax — the spec pins this against an imperative
    // pool-adjacent-violators run), and the (i,j,k) triple join is
    // ≤ B³/6 ≈ 2.8M cells at B=256 — constant, not corpus-scaled.
    ("q297_isotonic_calibration", (s: SparkSession, dir: String) => {
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
      val rng = scored.agg(min($"score").as("mn"), max($"score").as("mx"))
      val bins = scored.crossJoin(broadcast(rng))
        .select(expr("(score - mn) * 256 div (mx - mn + 1)").as("bin"), $"pos")
        .groupBy($"bin").agg(count(lit(1)).as("n"), sum($"pos").as("p"))
      val wb = Window.orderBy($"bin") // ≤256 rows
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pre = bins
        .withColumn("cn", sum($"n").over(wb))
        .withColumn("cp", sum($"p").over(wb))
        .localCheckpoint() // reused: A(j,k) both sides + final output
      // A(j,k) = micro mean of pos over bins j..k, from prefix sums
      val a = pre.select($"bin".as("j"), ($"cn" - $"n").as("cnj"),
          ($"cp" - $"p").as("cpj"))
        .join(pre.select($"bin".as("k"), $"cn".as("cnk"), $"cp".as("cpk")),
          $"j" <= $"k")
        .select($"j", $"k",
          expr("1000000 * (cpk - cpj) div (cnk - cnj)").as("amu"))
      val ji = pre.select($"bin".as("j"))
        .join(pre.select($"bin".as("i")), $"j" <= $"i")
      val iso = ji.join(a, Seq("j")).filter($"k" >= $"i")
        .groupBy($"i", $"j").agg(min($"amu").as("mn_a"))
        .groupBy($"i").agg(max($"mn_a").as("iso_micro"))
      pre.join(iso, $"bin" === $"i")
        .select($"bin", $"n", $"p".as("n_pos"),
          expr("1000000 * p div n").as("raw_micro"), $"iso_micro")
        .orderBy($"bin")
    }, Some(s"""
      WITH st AS (SELECT doc_id, n_chars,
          unnest(string_split($normSql, ' ')) AS tok FROM documents),
      sc AS (SELECT doc_id, max(n_chars) AS nc,
          CAST(sum(('0x' || substr(md5('w|' || CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) AS BIGINT) AS score
        FROM st GROUP BY 1),
      lab AS (SELECT score,
          CAST(CASE WHEN nc >= 250 THEN 1 ELSE 0 END AS BIGINT) AS pos FROM sc),
      rng AS (SELECT min(score) AS mn, max(score) AS mx FROM lab),
      bins AS (SELECT (score - mn) * 256 // (mx - mn + 1) AS bin,
          CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p
        FROM lab CROSS JOIN rng GROUP BY 1),
      pre AS (SELECT bin, n, p,
          CAST(sum(n) OVER (ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
          CAST(sum(p) OVER (ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp
        FROM bins),
      a AS (SELECT pj.bin AS j, pk.bin AS k,
          1000000 * (pk.cp - (pj.cp - pj.p)) // (pk.cn - (pj.cn - pj.n)) AS amu
        FROM pre pj JOIN pre pk ON pj.bin <= pk.bin),
      iso AS (SELECT i, max(mn_a) AS iso_micro FROM (
          SELECT pi.bin AS i, a.j, min(a.amu) AS mn_a
          FROM pre pi JOIN a ON a.j <= pi.bin AND a.k >= pi.bin
          GROUP BY 1, 2) GROUP BY 1)
      SELECT pre.bin, pre.n, pre.p AS n_pos,
        1000000 * pre.p // pre.n AS raw_micro, iso.iso_micro
      FROM pre JOIN iso ON pre.bin = iso.i ORDER BY pre.bin""")),

    // ----- multinomial Naive Bayes, trained and evaluated -----------------
    // A REAL generative classifier over the corpus (q191 is a hashed
    // heuristic; q288 one GLM step): predict each held-out document's
    // quality class (the battery's standard n_chars >= 250 label) from
    // its word distribution. (Source prediction was tried first and
    // landed at the 1/20 chance floor — this generator's sources are
    // lexically exchangeable — so the learnable label is the honest
    // demonstration.) Train on the md5-3/4 split: add-one
    // smoothed token log-likelihoods lnm(c_tc + 1) − lnm(tot_c + V)
    // and log-priors, all as separate micro-ln terms (the q196 rule).
    // The unseen-token identity keeps the model table sparse: since
    // lnm(0 + 1) = 0, score(d,c) = prior_c − n_toks_d·lnm(tot_c + V)
    // + Σ_{t∈d seen in c} lnm(c_tc + 1) — the per-class denominator
    // factors out of the join entirely, so the scoring join touches
    // ONLY (token, class) pairs that exist in the trained table.
    // Per-class test accuracy is the output. At 100 TB: the model is
    // |vocab|×|classes| (broadcastable or bucketed), scoring is one
    // equi-join on the token, argmax is a rank-1 window per doc.
    ("q298_naive_bayes", (s: SparkSession, dir: String) => {
      import s.implicits._
      def lnm(sqlArg: String) =
        expr(s"CAST(floor(ln(CAST(($sqlArg) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)")
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id",
          when($"n_chars" >= 250, "b_long").otherwise("a_short").as("label"),
          explode(split(TA.normText($"text"), " ")).as("tok"))
        .withColumn("h", conv(substring(md5(concat(lit("nb|"),
          $"doc_id".cast("string"))), 1, 8), 16, 10).cast("long") % 4)
        .localCheckpoint() // reused: train counts + test scoring
      val train = toks.filter($"h" < 3)
      val test = toks.filter($"h" === 3)
      val counts = train.groupBy($"label".as("cls"), $"tok")
        .agg(count(lit(1)).as("ctc"))
        .localCheckpoint() // reused: class totals + the scoring join
      val vdf = counts.select($"tok").distinct().agg(count(lit(1)).as("v"))
      val clsTot = counts.groupBy($"cls").agg(sum($"ctc").as("totc"))
      val clsDocs = train.select($"doc_id", $"label".as("cls")).distinct()
        .groupBy($"cls").agg(count(lit(1)).as("ndc"))
      val nTrain = clsDocs.agg(sum($"ndc").as("ntr"))
      val cls = clsTot.join(clsDocs, Seq("cls"))
        .crossJoin(broadcast(vdf)).crossJoin(broadcast(nTrain))
        .select($"cls",
          (lnm("ndc") - lnm("ntr")).as("prior_micro"),
          lnm("totc + v").as("den_micro"))
      val docs = test.groupBy($"doc_id", $"label")
        .agg(count(lit(1)).as("n_toks"))
      val seen = test.select($"doc_id", $"tok")
        .join(counts.select($"cls", $"tok",
          lnm("ctc + 1").as("llt")), Seq("tok"))
        .groupBy($"doc_id", $"cls").agg(sum($"llt").as("sum_ll"))
      val scoresAll = docs.crossJoin(broadcast(cls))
        .join(seen, Seq("doc_id", "cls"), "left")
        .na.fill(0L, Seq("sum_ll"))
        .select($"doc_id", $"label", $"cls",
          ($"prior_micro" - $"n_toks" * $"den_micro" + $"sum_ll").as("score"))
      val wd = Window.partitionBy($"doc_id").orderBy(desc("score"), $"cls")
      val predicted = scoresAll
        .withColumn("rn", row_number().over(wd)).filter($"rn" === 1)
      predicted.groupBy($"label")
        .agg(count(lit(1)).as("n_test"),
          sum(when($"cls" === $"label", 1L).otherwise(0L)).as("n_correct"))
        .select($"label", $"n_test", $"n_correct",
          expr("1000000 * n_correct div n_test").as("acc_micro"))
        .orderBy($"label")
    }, Some(s"""
      WITH toks AS (SELECT doc_id,
          CASE WHEN n_chars >= 250 THEN 'b_long' ELSE 'a_short' END AS label,
          unnest(string_split($normSql, ' ')) AS tok,
          ('0x' || substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            % 4 AS h
        FROM documents),
      train AS (SELECT * FROM toks WHERE h < 3),
      test AS (SELECT * FROM toks WHERE h = 3),
      counts AS (SELECT label AS cls, tok, CAST(count(*) AS BIGINT) AS ctc
        FROM train GROUP BY 1, 2),
      vdf AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM counts),
      clstot AS (SELECT cls, CAST(sum(ctc) AS BIGINT) AS totc
        FROM counts GROUP BY 1),
      clsdocs AS (SELECT label AS cls, CAST(count(DISTINCT doc_id) AS BIGINT)
          AS ndc FROM train GROUP BY 1),
      ntrain AS (SELECT CAST(sum(ndc) AS BIGINT) AS ntr FROM clsdocs),
      cls AS (SELECT t.cls,
          CAST(floor(ln(CAST(d.ndc AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
            - CAST(floor(ln(CAST(n.ntr AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
            AS prior_micro,
          CAST(floor(ln(CAST(t.totc + v.v AS DOUBLE)) * 1000000 + 0.5)
            AS BIGINT) AS den_micro
        FROM clstot t JOIN clsdocs d ON t.cls = d.cls
        CROSS JOIN vdf v CROSS JOIN ntrain n),
      docs AS (SELECT doc_id, label, CAST(count(*) AS BIGINT) AS n_toks
        FROM test GROUP BY 1, 2),
      seen AS (SELECT te.doc_id, c.cls,
          CAST(sum(CAST(floor(ln(CAST(c.ctc + 1 AS DOUBLE)) * 1000000 + 0.5)
            AS BIGINT)) AS BIGINT) AS sum_ll
        FROM test te JOIN counts c ON te.tok = c.tok GROUP BY 1, 2),
      scores AS (SELECT d.doc_id, d.label, c.cls,
          c.prior_micro - d.n_toks * c.den_micro + coalesce(s.sum_ll, 0)
            AS score
        FROM docs d CROSS JOIN cls c
        LEFT JOIN seen s ON s.doc_id = d.doc_id AND s.cls = c.cls),
      pred AS (SELECT doc_id, label, cls,
          row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls)
            AS rn FROM scores)
      SELECT label, CAST(count(*) AS BIGINT) AS n_test,
        CAST(sum(CASE WHEN cls = label THEN 1 ELSE 0 END) AS BIGINT)
          AS n_correct,
        CAST(1000000 * sum(CASE WHEN cls = label THEN 1 ELSE 0 END)
          // count(*) AS BIGINT) AS acc_micro
      FROM pred WHERE rn = 1 GROUP BY label ORDER BY label""")),

    // ----- kNN hubness audit ----------------------------------------------
    // The high-dimensional pathology q158's graph inherits silently:
    // in high dimensions a few "hub" points appear in MANY points'
    // k-NN lists while antihubs appear in none, which biases every
    // kNN-based method downstream (label propagation q203, noise
    // audit q187, CF q275). Measured as the in-degree (k-occurrence)
    // distribution of the directed 3-NN graph — histogram plus the
    // third standardized moment (skewness, THE hubness statistic —
    // Radovanović et al.), computed from exact integer central sums
    // with the one sqrt/pow on the final row. Candidate generation is
    // the same LSH-bucket self-join as q158 (never all-pairs); the
    // histogram and moments are |max in-degree|- and |nodes|-bounded.
    ("q299_knn_hubness", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      val b = prepared.withColumn("bucket",
          Similarity.lshBucket(col("qvec"), AnnProjs))
        .localCheckpoint() // both sides of the bucket self-join
      val q = b.select($"bucket", $"id".as("q_id"), $"qvec".as("q_vec"),
        $"n2".as("q_n2"))
      val c = b.select($"bucket", $"id".as("c_id"), $"qvec".as("c_vec"),
        $"n2".as("c_n2"))
      val scored = q.join(c, "bucket").filter($"q_id" =!= $"c_id")
        .select($"q_id", $"c_id",
          Similarity.cosine(Similarity.dot($"q_vec", $"c_vec"), $"q_n2",
            $"c_n2").as("cos_sim"))
      val w = Window.partitionBy($"q_id").orderBy(desc("cos_sim"), $"c_id")
      val knn = scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
      val indeg = b.select($"id")
        .join(knn.groupBy($"c_id".as("id")).agg(count(lit(1)).as("k_occ")),
          Seq("id"), "left")
        .na.fill(0L, Seq("k_occ"))
      val hist = indeg.groupBy($"k_occ").agg(count(lit(1)).as("n_nodes"))
      val mom = indeg.agg(count(lit(1)).as("n"), sum($"k_occ").as("s1"),
          sum($"k_occ" * $"k_occ").as("s2"),
          sum($"k_occ" * $"k_occ" * $"k_occ").as("s3"))
        // g1 = m3/m2^1.5 = (n²·s3 − 3n·s1·s2 + 2·s1³)/(n·s2 − s1²)^1.5 —
        // the n³ normalizers cancel exactly; integer numerator pieces,
        // one pow on the final single row
        .select(expr("""CAST(floor(
            CAST(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS DOUBLE)
            / pow(CAST(n * s2 - s1 * s1 AS DOUBLE), 1.5)
            * 1000000 + 0.5) AS BIGINT)""")
          .as("skew_micro"))
      hist.crossJoin(broadcast(mom))
        .select($"k_occ", $"n_nodes", $"skew_micro")
        .orderBy($"k_occ")
    }, Some(s"""
      WITH $annPrepSql,
      b AS (SELECT vec_id, qvec, n2, $annBucketSql AS bucket FROM n),
      scored AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
          list_dot_product(q.qvec, c.qvec) / sqrt(q.n2 * c.n2) AS cos_sim
        FROM b q JOIN b c USING (bucket) WHERE q.vec_id <> c.vec_id),
      r AS (SELECT q_id, c_id,
          row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id)
            AS rnk FROM scored),
      occ AS (SELECT b.vec_id AS id,
          CAST(coalesce(k.ko, 0) AS BIGINT) AS k_occ
        FROM b LEFT JOIN (SELECT c_id, CAST(count(*) AS BIGINT) AS ko
          FROM r WHERE rnk <= 3 GROUP BY 1) k ON b.vec_id = k.c_id),
      hist AS (SELECT k_occ, CAST(count(*) AS BIGINT) AS n_nodes
        FROM occ GROUP BY 1),
      mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(k_occ) AS BIGINT) AS s1,
          CAST(sum(k_occ * k_occ) AS BIGINT) AS s2,
          CAST(sum(k_occ * k_occ * k_occ) AS BIGINT) AS s3 FROM occ),
      sk AS (SELECT CAST(floor(
          CAST(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS DOUBLE)
          / pow(CAST(n * s2 - s1 * s1 AS DOUBLE), 1.5)
          * 1000000 + 0.5) AS BIGINT) AS skew_micro
        FROM mom)
      SELECT h.k_occ, h.n_nodes, sk.skew_micro
      FROM hist h CROSS JOIN sk ORDER BY h.k_occ"""))
  )
}
