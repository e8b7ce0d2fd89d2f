package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-size histogram of the q21/q411 TEXT dedup indexes — the
  * instrument VERDICT r12 named for attributing q411's superlinear
  * ×300 step (×4.44 wall for ×3 data, exponent ≈ 1.36, while the
  * production sweep q416 over the SAME band index read ×3.15).
  *
  * Two indexes, measured from the exact code paths the queries join:
  *  - `band`: Dedup.bandIndex rows (4-band MinHash over
  *    WordShingleHash32(normText, 3)) — the production candidate
  *    generator (q21/q411-LSH-side/q416). A bucket of size m
  *    contributes m·(m−1)/2 candidate pairs, so the Σpairs column IS
  *    the candidate-join output volume; if its growth beats the
  *    corpus growth, band crowding is real and the dial is more
  *    bands / longer signatures / band-key salting.
  *  - `prefix`: Dedup.prefixIndex token rows at τ=0.5 over the same
  *    shingle-hash universe — the recall-REFERENCE side q411 carries
  *    (the measured-truth enumeration). Same Σ m·(m−1)/2 bound per
  *    token bucket prices the exact side's self-join.
  *
  * Output: one JSON line per index with log2 bucket-size histogram
  * (bucket count, member rows, implied pairs per bin), totals, and
  * the top-5 largest buckets — written to the given out path.
  *
  * Usage: runMain graft.BandHistogram <sfDir> <outPath>
  */
object BandHistogram {

  /** (histogram rows, total buckets, total member rows, total implied
    * pairs, top-5 bucket sizes) for an index grouped by `keyCols`.
    */
  private def bucketStats(index: DataFrame, keyCols: Seq[String])
      : (Array[(Long, Long, Long, Long)], Long, Long, Long, Array[Long]) = {
    val sizes = index.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("m"))
      .select(col("m").cast("long").as("m"))
      .localCheckpoint() // read 3× below; the groupBy runs once
    val hist = sizes
      .withColumn("bin", floor(log2(col("m"))).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("m")).as("rows"),
        sum(col("m") * (col("m") - 1) / 2).cast("long").as("pairs"))
      .orderBy(col("bin"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tot = sizes.agg(count(lit(1)).as("b"), sum(col("m")).as("r"),
        sum(col("m") * (col("m") - 1) / 2).cast("long").as("p")).head()
    val top = sizes.orderBy(col("m").desc).limit(5).collect().map(_.getLong(0))
    (hist, tot.getLong(0), tot.getLong(1), tot.getLong(2), top)
  }

  private def jsonLine(name: String, sfDir: String,
      s: (Array[(Long, Long, Long, Long)], Long, Long, Long, Array[Long])): String = {
    val bins = s._1.map { case (b, n, r, p) =>
      s"""{"log2_size":$b,"n_buckets":$n,"rows":$r,"pairs":$p}"""
    }.mkString("[", ",", "]")
    s"""{"metric":"bucket_histogram","index":"$name","sf":"$sfDir",""" +
      s""""n_buckets":${s._2},"index_rows":${s._3},"implied_pairs":${s._4},""" +
      s""""top_bucket_sizes":[${s._5.mkString(",")}],"bins":$bins}"""
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BandHistogram <sfDir> <outPath>")
    val (dir, outPath) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the EXACT q411/q21 hashed universe
    val hashed = Tables.spread(Tables.t(spark, dir, "documents")).select(
      col("doc_id").as("id"),
      graft.functions.WordShingleHash32(
        graft.ext.TextAnalysis.normText(col("text")), 3).as("hs"))
      .localCheckpoint()

    val bandStats = bucketStats(
      graft.ext.Dedup.bandIndex(hashed, nBands = 4),
      Seq("band_idx", "band_key"))
    val prefixStats = bucketStats(
      graft.ext.Dedup.prefixIndex(
        hashed.withColumnRenamed("hs", "grams"), 500000L),
      Seq("tok"))

    val lines = Seq(jsonLine("band", dir, bandStats),
      jsonLine("prefix", dir, prefixStats))
    lines.foreach(println)
    val p = java.nio.file.Paths.get(outPath)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
