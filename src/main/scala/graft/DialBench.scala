package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** nprobe dial sweep for the IVF multi-probe ANN operators (q112/q113's
  * shape): times `ivfTopKMultiProbe` at nprobe ∈ {1, 2, 4} over the
  * SPARK_GRAFT_SF_DIR embeddings and measures recall@3 against the
  * brute-force exact top-3 — the recall/cost tradeoff the multi-probe
  * dial exists for, quantified (BENCHNOTES protocol). Prints one JSON
  * line: per-nprobe seconds and recall in micro units.
  */
object DialBench {
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
      .localCheckpoint() // shared input: time the operator, not the scan
    val queryPred = col("id") % 100 === 0
    val exact = Similarity
      .bruteForceTopK(prepared.filter(queryPred), prepared, k = 3)
      .select(col("q_id"), col("c_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nQ = exact.map(_._1).size

    // untimed warmup of the plan shape
    Similarity.ivfTopKMultiProbe(prepared, col("id") % 50 === 0, 1, queryPred, 3)
      .write.format("noop").mode("overwrite").save()

    val rows = Seq(1, 2, 4).map { np =>
      val t0 = System.nanoTime()
      val got = Similarity
        .ivfTopKMultiProbe(prepared, col("id") % 50 === 0, np, queryPred, 3)
        .select(col("q_id"), col("c_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recallMicro = 1000000L * got.count(exact.contains) / exact.size
      s""""nprobe$np":{"sec":$sec,"recall_micro":$recallMicro}"""
    }
    println(s"""{"metric":"nprobe_dial","n_queries":$nQ,${rows.mkString(",")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
