package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe data generator: writes a K-times replica of an existing
  * SF directory for PERF-ONLY runs (never the oracle gate — the gate
  * stays on the driver's parquet verbatim).
  *
  * Replication is key-shifted and content-perturbed so the scaled
  * corpus behaves like MORE DATA, not like K exact copies:
  *  - document texts get a per-replica per-word suffix, so replicas are
  *    not near-duplicates of each other (cross-replica Jaccard ≈ 0) and
  *    the vocabulary grows ~K× like a real corpus; blocking buckets
  *    (bounded key spaces: lang × length-band) grow ~K× in SIZE, which
  *    is exactly what a real K× corpus does to them;
  *  - embedding vectors get a per-replica deterministic SIGN FLIP per
  *    component (md5-derived): dot(a', b') = Σ aᵢbᵢ·sᵢ² = dot(a, b), so
  *    intra-replica geometry — every cosine, every neighbor rank — is
  *    preserved EXACTLY, components stay integer-valued (the q101
  *    rule), and cross-replica vectors decorrelate like fresh draws.
  *    (A constant +k shift, the first attempt, fails here: the shift
  *    dominates every LSH projection's sign and collapses all shifted
  *    replicas into one mega-bucket — the probe then measures the
  *    generator, not the operator.);
  *  - lineitem graph keys are offset per replica, so the co-occurrence /
  *    bipartite graphs become K disjoint copies with degree structure
  *    preserved exactly (the clean scaling for graph-algorithm probes).
  *
  * Remaining tables are copied verbatim (warmup queries read them).
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <outDir> [replicas=10]
  *        [tables=documents,embeddings,lineitem]
  * The optional 4th arg restricts which tables replicate (the rest
  * copy verbatim) — a probe of the documents-only statistics layer
  * has no reason to pay for a 600M-row lineitem replica.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <srcSfDir> <outDir> [replicas] [tables]")
    val src = args(0)
    val out = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    val scaled: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet
      else Set("documents", "embeddings", "lineitem")
    // a typo'd table name would otherwise be silently accepted and the
    // run would "succeed" producing an UNSCALED dataset (r11 ADVICE)
    require(scaled.nonEmpty &&
      scaled.subsetOf(Set("documents", "embeddings", "lineitem")),
      s"tables arg must name replicable tables " +
        s"(documents,embeddings,lineitem); got: ${args(3)}")
    println(s"ScaleGen: replicating ${scaled.toSeq.sorted.mkString(",")} x$k")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def replicate(df: DataFrame, perReplica: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => perReplica(df, i)).reduce(_ unionByName _)

    // documents: shift ids, perturb every word with a replica suffix
    // (normText keeps [a-z0-9], so the digit suffix survives tokenization)
    if (scaled("documents")) {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docOff = docs.agg(max($"doc_id")).head().getLong(0) + 1
    replicate(docs, (d, i) =>
      if (i == 0) d
      else d.select(
        ($"doc_id" + lit(i.toLong * docOff)).as("doc_id"),
        array_join(transform(split($"text", " "),
          w => concat(w, lit(i.toString))), " ").as("text"),
        $"lang", $"source", length(
          array_join(transform(split($"text", " "),
            w => concat(w, lit(i.toString))), " ")).cast("long").as("n_chars")))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }

    // embeddings: shift ids, sign-flip components per replica (md5-keyed,
    // so the flip pattern is deterministic and engine-reproducible)
    if (scaled("embeddings")) {
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embOff = emb.agg(max($"vec_id")).head().getLong(0) + 1
    replicate(emb, (e, i) =>
      if (i == 0) e
      else e.select(
        ($"vec_id" + lit(i.toLong * embOff)).as("vec_id"),
        expr(s"transform(embedding, (x, j) -> CAST(x * (CAST(conv(substr(md5('$i' || '_' || CAST(j AS STRING)), 1, 2), 16, 10) AS LONG) % 2 * 2 - 1) AS FLOAT))")
          .as("embedding"),
        $"label"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }

    // lineitem: offset the graph keys per replica (disjoint graph copies)
    if (scaled("lineitem")) {
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val (okOff, pkOff, skOff) = {
      val r = li.agg(max($"l_orderkey"), max($"l_partkey"), max($"l_suppkey")).head()
      (r.getLong(0) + 1, r.getLong(1) + 1, r.getLong(2) + 1)
    }
    replicate(li, (d, i) =>
      if (i == 0) d
      else d
        .withColumn("l_orderkey", $"l_orderkey" + lit(i * okOff))
        .withColumn("l_partkey", $"l_partkey" + lit(i * pkOff))
        .withColumn("l_suppkey", $"l_suppkey" + lit(i * skOff)))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    }

    // everything else: verbatim copy so warmups and scan-shaped queries run
    for (name <- Tables.All if !(scaled intersect Set("documents", "embeddings", "lineitem")).contains(name)) {
      val from = java.nio.file.Paths.get(s"$src/$name.parquet")
      val to = java.nio.file.Paths.get(s"$out/$name.parquet")
      if (java.nio.file.Files.isRegularFile(from)) {
        java.nio.file.Files.createDirectories(to.getParent)
        java.nio.file.Files.copy(from, to,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    println(s"""{"scalegen":"done","src":"$src","out":"$out","replicas":$k}""")
    spark.stop()
  }
}
