package graft

import org.apache.spark.sql.SparkSession

/** Dev-only per-query timing harness (not part of the driver contract):
  * `sbt 'runMain graft.DevTimer q21_dedup_minhash q23_dedup_ngram [sfDir]'`
  * times the named queries (all of them if none given) with the same
  * noop-sink evaluation Bench uses, after one warmup pass.
  */
object DevTimer {
  def main(args: Array[String]): Unit = {
    val (names0, dirs) = args.partition(a => !a.startsWith("/"))
    val dir = dirs.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (names0.nonEmpty) names0.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(names.head) // warmup
    names.foreach(n => println(f"TIMER $n%-24s ${run(n)}%8.2fs"))
    spark.stop()
  }
}
