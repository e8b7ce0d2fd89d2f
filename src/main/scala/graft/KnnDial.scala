package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** LSH projection-count dial for the kNN-graph build (q158's shape):
  * the round-8 scale probe measured q158 superlinear at 10× data
  * because the bucket COUNT is fixed (2^4) while membership grows with
  * the corpus — the mitigation is raising nProj with N. This sweep
  * quantifies that: for nProj ∈ {4, 6, 8} it times the full top-3
  * kNN-graph build over SPARK_GRAFT_SF_DIR embeddings and measures
  * edge recall against the brute-force exact top-3 on the id%100
  * probe nodes. Prints one JSON line (BENCHNOTES protocol).
  */
object KnnDial {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val prepared = Similarity.prepare(
      Tables.spread(Tables.t(spark, sfDir, "embeddings")), "vec_id", "embedding")
      .localCheckpoint()
    val probePred = col("id") % 100 === 0
    val exact = Similarity
      .bruteForceTopK(prepared.filter(probePred), prepared, k = 3)
      .select(col("q_id"), col("c_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def scoredPairs(nProj: Int, multiProbe: Boolean) = {
      val projs = Similarity.projectionVectors(nProj, 64)
      val b = prepared.withColumn("bucket", Similarity.lshBucket(col("qvec"), projs))
      val q0 = b.select(col("bucket"), col("id").as("q_id"),
        col("qvec").as("q_vec"), col("n2").as("q_n2"))
      val q = if (!multiProbe) q0 else {
        val probeList = array((lit(0) +: projs.indices.map(j => lit(1 << j))): _*)
        b.withColumn("__flip", explode(probeList))
          .select(expr("bucket ^ __flip").as("bucket"), col("id").as("q_id"),
            col("qvec").as("q_vec"), col("n2").as("q_n2"))
      }
      val c = b.select(col("bucket"), col("id").as("c_id"),
        col("qvec").as("c_vec"), col("n2").as("c_n2"))
      val base = q.join(c, "bucket").filter(col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id"),
          Similarity.cosine(Similarity.dot(col("q_vec"), col("c_vec")),
            col("q_n2"), col("c_n2")).as("cos_sim"))
      if (multiProbe) base.distinct() else base
    }

    def knnEdges(nProj: Int, multiProbe: Boolean) = {
      val w = Window.partitionBy(col("q_id")).orderBy(desc("cos_sim"), col("c_id"))
      scoredPairs(nProj, multiProbe)
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
        .select(col("q_id"), col("c_id"))
    }

    knnEdges(4, multiProbe = false).write.format("noop").mode("overwrite").save() // shape warmup

    val rows = for {
      np <- Seq(4, 6, 8)
      mp <- Seq(false, true)
    } yield {
      val t0 = System.nanoTime()
      knnEdges(np, mp).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val got = knnEdges(np, mp).filter(col("q_id") % 100 === 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recallMicro = 1000000L * got.count(exact.contains) / exact.size
      // the metric that scales: candidate-pair volume entering the window
      val nPairs = scoredPairs(np, mp).count()
      val tag = if (mp) s"nproj${np}_mp" else s"nproj$np"
      s""""$tag":{"sec":$sec,"recall_micro":$recallMicro,"n_pairs":$nPairs}"""
    }
    println(s"""{"metric":"knn_nproj_dial","n_probe_nodes":${exact.map(_._1).size},${rows.mkString(",")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
