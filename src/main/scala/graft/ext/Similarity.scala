package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k (the exactness
  * baseline) and an LSH-bucketed variant (the scale path).
  *
  * Numeric design: embeddings are quantized to integer-valued doubles
  * (round(x·10⁴)) before any arithmetic. Every product (≤ ~10⁸) and
  * 64-term sum (≤ ~10¹⁰) is then exact in IEEE double regardless of
  * accumulation order, so cosine = dot/sqrt(n2a·n2b) is bit-deterministic
  * across engines and partitionings — a correctness property (hash-stable
  * results) AND a scale property (no reduce-order nondeterminism).
  */
object Similarity {

  /** Quantized copy of a float-array embedding: array<double> with integer
    * values. */
  def quantize(emb: Column, scale: Int = 10000): Column =
    transform(emb, x => round(x.cast("double") * scale))

  /** Exact dot product of two quantized vectors — a codegen'd primitive
    * loop (functions.DoubleDot), not a higher-order-function pipeline:
    * the dot is evaluated once per candidate pair, and an interpreted
    * zip_with/aggregate there dominates every ANN operator's runtime. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.doubleDot(a, b)

  /** Squared norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine from precomputed dot and squared norms — a single deterministic
    * double expression. */
  def cosine(dotAb: Column, n2a: Column, n2b: Column): Column =
    dotAb / sqrt(n2a * n2b)

  /** Add (qvec, n2) columns to an embeddings DataFrame with (id, emb).
    * The quantized vector is bound once (Lambda.bind1) so ProjectCollapse
    * cannot inline its defining transform into the norm's per-element
    * lambda (which would re-quantize the vector once per element). */
  def prepare(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).as("id"), quantize(col(embCol)).as("qvec"))
      .withColumn("n2", graft.functions.Lambda.bind1(col("qvec"))(a => norm2(a)))

  /** Brute-force cosine top-k: every query row scans all candidates.
    * Exact; O(|Q|·N) — the baseline and the recall oracle for ANN.
    * The query side is broadcast so the candidate scan never shuffles;
    * top-k per query is a windowed rank over |Q| partitions. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("q_id"), col("qvec").as("q_vec"), col("n2").as("q_n2"))
    val c = candidates.select(col("id").as("c_id"), col("qvec").as("c_vec"), col("n2").as("c_n2"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine(dot(col("q_vec"), col("c_vec")), col("q_n2"), col("c_n2")).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"), col("cos_sim"))
  }

  /** Deterministic pseudo-random projection vectors for LSH, derived from
    * MD5 so the same literals can be embedded in any engine's SQL:
    * r(j,i) = (first-4-hex-digits of md5("j_i")) mod 2001 − 1000. */
  def projectionVectors(nProj: Int, dim: Int): Seq[Seq[Int]] = {
    val mdThread = java.security.MessageDigest.getInstance("MD5")
    (0 until nProj).map { j =>
      (0 until dim).map { i =>
        val h = mdThread.digest(s"${j}_$i".getBytes("UTF-8"))
          .take(2).map("%02x".format(_)).mkString
        (Integer.parseInt(h, 16) % 2001) - 1000
      }
    }
  }

  /** The projection set the ANN oracle queries share (4 sign bits →
    * 16 buckets at test scale; a 100 TB deployment raises nProj with
    * the corpus so per-bucket population stays bounded). */
  val OracleProjs: Seq[Seq[Int]] = projectionVectors(4, 64)

  /** DuckDB rendering of `prepare` — the single source shared by every
    * operator file's oracle (the md5DigitSql convention from Dedup), so
    * the quantization scale can never diverge between the Spark side
    * and a private SQL copy. */
  val prepareSql: String =
    """p AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 10000)) AS qvec FROM embeddings),
      n AS (SELECT vec_id, qvec, list_dot_product(qvec, qvec) AS n2 FROM p)"""

  /** DuckDB literal for one projection vector. */
  def projListSql(p: Seq[Int]): String =
    p.map(v => s"CAST($v AS DOUBLE)").mkString("[", ", ", "]")

  /** DuckDB rendering of `lshBucket(qvec, OracleProjs)`. */
  def lshBucketSql: String =
    OracleProjs.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_dot_product(qvec, ${projListSql(p)}) >= 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  /** LSH bucket id: sign bits of the projections onto `projs`. Integer
    * dot products (exact), so bucketing is engine-deterministic. */
  def lshBucket(qvec: Column, projs: Seq[Seq[Int]]): Column =
    projs.zipWithIndex.map { case (p, j) =>
      val proj = dot(qvec, array(p.map(v => lit(v.toDouble)): _*))
      when(proj >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed ANN top-k: candidates are restricted to the query's
    * bucket — the cross join becomes an equi-join on bucket, which at
    * scale is the difference between O(N²) and O(N²/2^b) with perfect
    * partition alignment. Approximate (single-probe). */
  def lshTopK(prepared: DataFrame, queryPred: Column, projs: Seq[Seq[Int]], k: Int): DataFrame = {
    val bucketed = prepared.withColumn("bucket", lshBucket(col("qvec"), projs))
    val q = bucketed.filter(queryPred)
      .select(col("bucket"), col("id").as("q_id"), col("qvec").as("q_vec"), col("n2").as("q_n2"))
    val c = bucketed
      .select(col("bucket"), col("id").as("c_id"), col("qvec").as("c_vec"), col("n2").as("c_n2"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine(dot(col("q_vec"), col("c_vec")), col("q_n2"), col("c_n2")).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"), col("cos_sim"))
  }

  /** Multi-probe LSH top-k: each query also probes the buckets at Hamming
    * distance 1 from its own (flip each sign bit), recovering most
    * near-neighbors lost to a single boundary-crossing projection — the
    * standard recall/cost dial: probes × bucket size candidates instead
    * of N. The query side explodes to (1 + nProj) probe rows and the
    * candidate join stays a bucket equi-join. */
  def lshTopKMultiProbe(prepared: DataFrame, queryPred: Column,
                        projs: Seq[Seq[Int]], k: Int): DataFrame = {
    val bucketed = prepared.withColumn("bucket", lshBucket(col("qvec"), projs))
    val probeList = array((lit(0) +: projs.indices.map(j => lit(1 << j))): _*)
    val q = bucketed.filter(queryPred)
      .withColumn("__flip", explode(probeList))
      .select(expr("bucket ^ __flip").as("bucket"),
        col("id").as("q_id"), col("qvec").as("q_vec"), col("n2").as("q_n2"))
    val c = bucketed
      .select(col("bucket"), col("id").as("c_id"), col("qvec").as("c_vec"), col("n2").as("c_n2"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine(dot(col("q_vec"), col("c_vec")), col("q_n2"), col("c_n2")).as("cos_sim"))
      .distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"), col("cos_sim"))
  }

  /** IVF cell assignment: nearest centroid by cosine (ties → lowest
    * centroid id). Centroids here are a deterministic subset of the data
    * (`centroidPred`) so results are engine-reproducible; production would
    * train k-means and broadcast the centroid table the same way. The
    * assignment is a broadcast cross join (N×C scored rows, C small) +
    * per-vector top-1. */
  def ivfAssign(prepared: DataFrame, centroidPred: Column): DataFrame = {
    val cent = prepared.filter(centroidPred)
      .select(col("id").as("cent_id"), col("qvec").as("cent_vec"), col("n2").as("cent_n2"))
    val scored = prepared.crossJoin(broadcast(cent))
      .select(col("id"), col("qvec"), col("n2"), col("cent_id"),
        cosine(dot(col("qvec"), col("cent_vec")), col("n2"), col("cent_n2")).as("cent_cos"))
    val w = Window.partitionBy(col("id")).orderBy(col("cent_cos").desc, col("cent_id"))
    scored.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col("id"), col("qvec"), col("n2"), col("cent_id").as("cluster_id"))
  }

  /** IVF top-k: queries search only their own cell (nprobe=1) — the
    * candidate join is an equi-join on cluster_id, O(N·k/C) work instead
    * of O(N·|Q|). Approximate by construction; recall grows with nprobe. */
  def ivfTopK(prepared: DataFrame, centroidPred: Column, queryPred: Column,
              k: Int): DataFrame = {
    val assigned = ivfAssign(prepared, centroidPred)
    val q = assigned.filter(queryPred)
      .select(col("cluster_id"), col("id").as("q_id"), col("qvec").as("q_vec"), col("n2").as("q_n2"))
    val c = assigned
      .select(col("cluster_id"), col("id").as("c_id"), col("qvec").as("c_vec"), col("n2").as("c_n2"))
    val scored = c.join(broadcast(q), Seq("cluster_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine(dot(col("q_vec"), col("c_vec")), col("q_n2"), col("c_n2")).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"), col("cos_sim"))
  }

  /** IVF multi-probe top-k: each query searches its `nprobe` NEAREST
    * cells instead of only its own — the standard IVF recall/cost dial
    * (a true neighbor near a cell boundary lives in the second-nearest
    * cell more often than not; probing the top-p cells recovers it for
    * p× the candidates, still O(N·k·p/C) total). The query side becomes
    * nprobe (cluster_id, query) probe rows via a rank over the broadcast
    * centroid scores; the candidate side stays the top-1 cell assignment,
    * so the search join remains a cluster_id equi-join and each (q, c)
    * pair appears at most once (a candidate lives in exactly one cell) —
    * no dedup pass needed, unlike multi-probe LSH where buckets overlap. */
  def ivfTopKMultiProbe(prepared: DataFrame, centroidPred: Column, nprobe: Int,
                        queryPred: Column, k: Int): DataFrame = {
    val cent = prepared.filter(centroidPred)
      .select(col("id").as("cent_id"), col("qvec").as("cent_vec"), col("n2").as("cent_n2"))
    val assigned = ivfAssignWith(prepared, cent)
    val qScored = prepared.filter(queryPred).crossJoin(broadcast(cent))
      .select(col("id").as("q_id"), col("qvec").as("q_vec"), col("n2").as("q_n2"),
        col("cent_id"),
        cosine(dot(col("qvec"), col("cent_vec")), col("n2"), col("cent_n2")).as("cent_cos"))
    val wp = Window.partitionBy(col("q_id")).orderBy(col("cent_cos").desc, col("cent_id"))
    val probes = qScored.withColumn("__p", row_number().over(wp))
      .filter(col("__p") <= nprobe)
      .select(col("cent_id").as("cluster_id"), col("q_id"), col("q_vec"), col("q_n2"))
    val c = assigned
      .select(col("cluster_id"), col("id").as("c_id"), col("qvec").as("c_vec"), col("n2").as("c_n2"))
    val scored = c.join(broadcast(probes), Seq("cluster_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine(dot(col("q_vec"), col("c_vec")), col("q_n2"), col("c_n2")).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"), col("cos_sim"))
  }

  /** Deterministic Lloyd k-means over the quantized vectors: centroids
    * initialize from the rows matching `initPred` (the standard seed-
    * by-sample), then `iters` rounds of assign (max cosine, ties to the
    * lowest centroid id) + per-dimension mean. The mean is ROUNDED to an
    * integer-valued double, so centroid arithmetic — like all vector
    * arithmetic here — stays exact in IEEE double and the training is
    * bit-reproducible on any engine/partitioning.
    *
    * Scale shape (the distributed-k-means standard): centroids broadcast
    * (k rows) so assignment is a map-side scored scan + per-row top-1;
    * the recompute shuffles N·dim (cluster, pos, v) rows into k·dim
    * partial means with map-side combine. Returns (cent_id, cent_vec,
    * cent_n2). */
  def kmeansCentroids(prepared: DataFrame, initPred: Column, iters: Int): DataFrame = {
    var cents = prepared.filter(initPred)
      .select(col("id").as("cent_id"), col("qvec").as("cent_vec"), col("n2").as("cent_n2"))
    (1 to iters).foreach { _ =>
      val scored = prepared.crossJoin(broadcast(cents))
        .select(col("id"), col("qvec"), col("cent_id"),
          cosine(dot(col("qvec"), col("cent_vec")), col("n2"), col("cent_n2")).as("cent_cos"))
      // arg-max as a hash aggregate (max_by over (cos, -cent_id): max
      // cosine, ties to the LOWEST centroid id) — no per-id sort
      val assigned = scored.groupBy(col("id"))
        .agg(first(col("qvec")).as("qvec"),
          max_by(col("cent_id"), struct(col("cent_cos"), -col("cent_id"))).as("cluster_id"))
      val perDim = assigned
        .select(col("cluster_id"), posexplode(col("qvec")).as(Seq("pos", "v")))
        .groupBy(col("cluster_id"), col("pos"))
        .agg(round(sum(col("v")) / count(lit(1))).as("m"))
      val rebuilt = perDim.groupBy(col("cluster_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cent_vec"))
      cents = rebuilt.select(col("cluster_id").as("cent_id"), col("cent_vec"),
        graft.functions.VectorOps.doubleDot(col("cent_vec"), col("cent_vec")).as("cent_n2"))
    }
    cents
  }

  /** IVF assignment against an explicit centroid table (trained or
    * sampled): nearest centroid by cosine, ties to lowest id — an
    * arg-max hash aggregate, no per-vector sort. */
  def ivfAssignWith(prepared: DataFrame, cents: DataFrame): DataFrame = {
    val scored = prepared.crossJoin(broadcast(cents))
      .select(col("id"), col("qvec"), col("n2"), col("cent_id"),
        cosine(dot(col("qvec"), col("cent_vec")), col("n2"), col("cent_n2")).as("cent_cos"))
    scored.groupBy(col("id"))
      .agg(first(col("qvec")).as("qvec"), first(col("n2")).as("n2"),
        max_by(col("cent_id"), struct(col("cent_cos"), -col("cent_id"))).as("cluster_id"))
      .select(col("id"), col("qvec"), col("n2"), col("cluster_id"))
  }

  /** k-means-trained IVF top-k: train centroids with `iters` Lloyd
    * rounds, then search the query's `nprobe` nearest cells (nprobe=1 =
    * the assigned cell only; >1 is the same recall/cost dial as
    * ivfTopKMultiProbe, against trained centroids).
    *
    * The trained centroids and the assignment are both localCheckpointed:
    * the materialized RDD cuts the Lloyd-iteration lineage (so the
    * training chain cannot re-execute) and both the query side and the
    * candidate side of the cell join read the SAME materialized blocks —
    * without it the full training + assignment chain runs twice per
    * search, 2× the most expensive stage at any corpus size.
    * localCheckpoint (not persist) because checkpoint blocks are released
    * by the ContextCleaner once the RDD is unreferenced; each invocation
    * builds a distinct plan, so cache entries would accumulate for the
    * session's lifetime. */
  def ivfTopKKmeans(prepared: DataFrame, initPred: Column, iters: Int,
                    queryPred: Column, k: Int, nprobe: Int = 1): DataFrame = {
    val cents = kmeansCentroids(prepared, initPred, iters).localCheckpoint()
    val assigned = ivfAssignWith(prepared, cents).localCheckpoint()
    val q =
      if (nprobe <= 1)
        assigned.filter(queryPred)
          .select(col("cluster_id"), col("id").as("q_id"), col("qvec").as("q_vec"), col("n2").as("q_n2"))
      else {
        // probe rows = rank over the (broadcast, checkpointed) trained
        // centroids; probe 1 equals the assignment's own cell by the
        // same (score desc, cent_id) tie rule
        val qScored = prepared.filter(queryPred).crossJoin(broadcast(cents))
          .select(col("id").as("q_id"), col("qvec").as("q_vec"), col("n2").as("q_n2"),
            col("cent_id"),
            cosine(dot(col("qvec"), col("cent_vec")), col("n2"), col("cent_n2")).as("cent_cos"))
        val wp = Window.partitionBy(col("q_id")).orderBy(col("cent_cos").desc, col("cent_id"))
        qScored.withColumn("__p", row_number().over(wp)).filter(col("__p") <= nprobe)
          .select(col("cent_id").as("cluster_id"), col("q_id"), col("q_vec"), col("q_n2"))
      }
    val c = assigned
      .select(col("cluster_id"), col("id").as("c_id"), col("qvec").as("c_vec"), col("n2").as("c_n2"))
    val scored = c.join(broadcast(q), Seq("cluster_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine(dot(col("q_vec"), col("c_vec")), col("q_n2"), col("c_n2")).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"), col("cos_sim"))
  }

  /** Embedding-cosine near-dup pairs within LSH buckets. */
  def nearDupPairs(prepared: DataFrame, projs: Seq[Seq[Int]], threshold: Double): DataFrame = {
    val bucketed = prepared.withColumn("bucket", lshBucket(col("qvec"), projs))
    val l = bucketed.select(col("bucket"), col("id").as("id_a"),
      col("qvec").as("v_a"), col("n2").as("n2_a"))
    val r = bucketed.select(col("bucket"), col("id").as("id_b"),
      col("qvec").as("v_b"), col("n2").as("n2_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(dot(col("v_a"), col("v_b")), col("n2_a"), col("n2_b")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
