package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity

/** Round-11 batch 11: embedding-infrastructure health audits — space
  * isotropy indices (is the representation collapsing), LSH bucket
  * balance (the Σocc² candidate-join cost the ANN index actually
  * pays), and scalar-quantization error (the int8-storage decision).
  *
  * Float discipline: q401/q402 aggregate exact quantized integers
  * (participation ratio is the one double chain, folded in dim
  * order); q403 micro-rounds each element's reconstruction error —
  * a pure function of the stored float — before any aggregation.
  */
object Round11kQueries {

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- embedding-space isotropy ----------------------------------------
    // q341 standardizes each dimension; this reduces the same per-dim
    // aggregates to the three SPACE-HEALTH indices: the mean-vector
    // ratio ||μ||²/E||x||² (anisotropy — 0 for a centered isotropic
    // cloud, →1 when everything points one way), the diagonal
    // participation ratio (Σvar)²/Σvar² (effective dimensionality —
    // d when variance is spread evenly, 1 under collapse), and the
    // top dimension's variance share. The ratio and share are exact
    // integer divisions off cleared DECIMAL(38,0) moments; PR folds
    // its 64 exact cvar integers in dim order through one double
    // chain. One exploded scan, a 64-row stats table, scalars out.
    ("q401_embedding_isotropy", (s: SparkSession, dir: String) => {
      import s.implicits._
      val dims = Tables.spread(Tables.t(s, dir, "embeddings"))
        .select(posexplode(Similarity.quantize($"embedding")).as(Seq("j0", "x")))
        .select(($"j0" + 1).as("j"), $"x".cast("long").as("v"))
      val st = dims.groupBy($"j").agg(count(lit(1)).as("n"),
          sum($"v").as("sv"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("svv"))
        .withColumn("cvar", expr(
          "n * svv - CAST(sv AS DECIMAL(38,0)) * sv"))
      st.agg(
          max($"n").as("n"), count(lit(1)).as("d"),
          sum(expr("CAST(sv AS DECIMAL(38,0)) * sv")).as("s2"),
          sum($"svv").as("svtot"),
          sum($"cvar").as("cv1"),
          max($"cvar").as("cvmax"),
          expr("""aggregate(array_sort(collect_list(named_struct(
                'j', j, 'cv', CAST(cvar AS DOUBLE)))),
              CAST(0.0 AS DOUBLE), (acc, t) -> acc + t.cv * t.cv)""").as("cv2"))
        .select($"n", $"d",
          expr("s2 * 1000000 div (n * svtot)").as("mean_norm_ratio_micro"),
          expr("""CAST(floor(CAST(cv1 AS DOUBLE) * CAST(cv1 AS DOUBLE) / cv2
              * 1000000 + 0.5) AS BIGINT)""").as("participation_micro"),
          expr("cvmax * 1000000 div cv1").as("top_var_share_micro"))
    }, Some(s"""
      WITH p AS (SELECT list_transform(embedding,
          x -> round(CAST(x AS DOUBLE) * 10000)) AS qvec FROM embeddings),
      dims AS (SELECT j, CAST(qvec[CAST(j AS INT)] AS BIGINT) AS v
        FROM p, unnest(range(1, len(qvec) + 1)) AS t(j)),
      st AS (SELECT j, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv,
          sum(CAST(v AS HUGEINT) * v) AS svv
        FROM dims GROUP BY 1),
      st2 AS (SELECT *, n * svv - CAST(sv AS HUGEINT) * sv AS cvar FROM st),
      ag AS (SELECT CAST(max(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS d,
          sum(CAST(sv AS HUGEINT) * sv) AS s2, sum(svv) AS svtot,
          sum(cvar) AS cv1, max(cvar) AS cvmax,
          list_reduce(list(CAST(cvar AS DOUBLE) * CAST(cvar AS DOUBLE) ORDER BY j),
            (a, b) -> a + b) AS cv2
        FROM st2)
      SELECT n, d,
        CAST(s2 * 1000000 // (n * svtot) AS BIGINT) AS mean_norm_ratio_micro,
        CAST(floor(CAST(cv1 AS DOUBLE) * CAST(cv1 AS DOUBLE) / cv2
          * 1000000 + 0.5) AS BIGINT) AS participation_micro,
        CAST(cvmax * 1000000 // cv1 AS BIGINT) AS top_var_share_micro
      FROM ag""")),

    // ----- LSH bucket-balance audit ----------------------------------------
    // q25 searches with the sign-projection index; this audits what the
    // index COSTS: Σ occupancy² is exactly the candidate-pair volume
    // of the bucket self-join, and the max bucket is the query-latency
    // tail. Reported against the uniform ideal (n/2^p per bucket):
    // skew = max·2^p/n and cost = Σocc²·2^p/n², both exact integer
    // micro-units. One bucket aggregate over the prepared vectors —
    // the audit costs one groupBy, the thing it predicts costs Σocc².
    ("q402_lsh_bucket_balance", (s: SparkSession, dir: String) => {
      import s.implicits._
      val prepared = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      val nProj = Similarity.OracleProjs.size
      val occ = prepared
        .select(Similarity.lshBucket($"qvec", Similarity.OracleProjs).as("bucket"))
        .groupBy($"bucket").agg(count(lit(1)).as("occ"))
      occ.agg(sum($"occ").as("n"), count(lit(1)).as("buckets_used"),
          max($"occ").as("max_occ"),
          sum(expr("CAST(occ AS DECIMAL(38,0)) * occ")).as("sum_occ2"))
        .select($"n", lit(1L << nProj).as("n_buckets"), $"buckets_used",
          $"max_occ", expr("CAST(sum_occ2 AS BIGINT)").as("sum_occ2"),
          expr(s"max_occ * ${1L << nProj} * 1000000 div n").as("skew_micro"),
          expr(s"""sum_occ2 * ${1L << nProj} * 1000000
            div (CAST(n AS DECIMAL(38,0)) * n)""").as("cost_vs_uniform_micro"))
    }, Some {
      val prepSql = Similarity.prepareSql
      val bucketSql = Similarity.lshBucketSql
      val nb = 1L << Similarity.OracleProjs.size
      s"""
      WITH $prepSql,
      b AS (SELECT vec_id, $bucketSql AS bucket FROM n),
      occ AS (SELECT bucket, CAST(count(*) AS BIGINT) AS occ FROM b GROUP BY 1),
      ag AS (SELECT CAST(sum(occ) AS BIGINT) AS n,
          CAST(count(*) AS BIGINT) AS buckets_used,
          CAST(max(occ) AS BIGINT) AS max_occ,
          sum(CAST(occ AS HUGEINT) * occ) AS sum_occ2
        FROM occ)
      SELECT n, CAST($nb AS BIGINT) AS n_buckets, buckets_used, max_occ,
        CAST(sum_occ2 AS BIGINT) AS sum_occ2,
        max_occ * $nb * 1000000 // n AS skew_micro,
        CAST(sum_occ2 * $nb * 1000000 // (CAST(n AS HUGEINT) * n) AS BIGINT)
          AS cost_vs_uniform_micro
      FROM ag"""
    }),

    // ----- scalar-quantization error audit ----------------------------------
    // q208 compresses with learned codebooks (vector quantization);
    // this audits the SIMPLER decision — store embeddings at int8 /
    // int10 / the index's own 1e4 scale — by measuring exact
    // reconstruction error per element: e = |round(x·s)/s − x|,
    // micro-rounded per element (a pure function of the stored float,
    // identical on both engines), then integer mean/max per scale.
    // The 3-scale spine broadcasts over one exploded scan.
    ("q403_quantization_error", (s: SparkSession, dir: String) => {
      import s.implicits._
      val elems = Tables.spread(Tables.t(s, dir, "embeddings"))
        .select(explode($"embedding").as("x"))
        .select($"x".cast("double").as("x"))
      val scales = Seq(127L, 1023L, 10000L).toDF("s")
      elems.crossJoin(broadcast(scales))
        .select($"s", expr(
          """CAST(floor(abs(round(x * CAST(s AS DOUBLE)) / CAST(s AS DOUBLE) - x)
             * 1000000000 + 0.5) AS BIGINT)""").as("e_nano"))
        .groupBy($"s")
        .agg(count(lit(1)).as("n_elems"),
          expr("sum(e_nano) div count(1)").as("mean_err_nano"),
          max($"e_nano").as("max_err_nano"))
        .orderBy($"s")
    }, Some("""
      WITH e AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
      sc AS (SELECT CAST(unnest([127, 1023, 10000]) AS BIGINT) AS s),
      t AS (SELECT s,
          CAST(floor(abs(round(x * CAST(s AS DOUBLE)) / CAST(s AS DOUBLE) - x)
            * 1000000000 + 0.5) AS BIGINT) AS e_nano
        FROM e, sc)
      SELECT s, CAST(count(*) AS BIGINT) AS n_elems,
        CAST(sum(e_nano) AS BIGINT) // count(*) AS mean_err_nano,
        max(e_nano) AS max_err_nano
      FROM t GROUP BY 1 ORDER BY s"""))
  )
}
