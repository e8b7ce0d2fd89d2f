package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage timing harness (not part of the driver contract). */
object DevTimer {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIMER $name: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }

    val raw = Tables.t(spark, dir, "documents")
    time("norm_only")(raw.select(graft.ext.TextAnalysis.normText($"text").as("n"))
      .agg(sum(length($"n"))).as[Long].head())
    val arr0 = split(graft.ext.TextAnalysis.normText($"text"), " ")
    time("split_only")(raw.select(arr0.as("a")).agg(sum(size($"a"))).as[Long].head())
    val sliceSh = {
      val arr = arr0
      val n = greatest(size(arr) - 2, lit(1))
      array_distinct(transform(sequence(lit(1), n), i => array_join(slice(arr, i, lit(3)), " ")))
    }
    time("shingle_slice")(raw.select(sliceSh.as("s")).agg(sum(size($"s"))).as[Long].head())
    val eaSh = {
      val arr = arr0
      val n = greatest(size(arr) - 2, lit(1))
      array_distinct(transform(sequence(lit(1), n),
        i => concat_ws(" ", element_at(arr, i), element_at(arr, i + 1), element_at(arr, i + 2))))
    }
    time("shingle_element_at")(raw.select(eaSh.as("s")).agg(sum(size($"s"))).as[Long].head())
    val docs = Tables.t(spark, dir, "documents")
      .select($"doc_id".as("id"), graft.ext.TextAnalysis.shingles($"text", 3).as("shingles"))
    time("shingles")(docs.agg(sum(size($"shingles"))).as[Long].head())
    val hs = docs.select($"id", graft.ext.Dedup.shingleHashes($"shingles").as("hs"))
    time("shingleHashes")(hs.agg(sum(size($"hs"))).as[Long].head())
    val mh = hs.select($"id" +: (0 until 8).map(s => graft.ext.Dedup.minhashInt($"hs", s).as(s"m$s")): _*)
    time("minhash")(mh.agg(sum($"m0" + $"m7")).as[Long].head())
    val grams = Tables.t(spark, dir, "documents").select(
      $"doc_id".as("id"),
      concat($"lang", lit("_"), expr("n_chars div 100")).as("bucket"),
      array_sort(graft.ext.TextAnalysis.charNgramInts($"text", 3)).as("grams"))
    time("gramInts")(grams.agg(sum(size($"grams"))).as[Long].head())
    val l = grams.select($"bucket", $"id".as("id_a"), $"grams".as("g_a"))
    val r = grams.select($"bucket", $"id".as("id_b"), $"grams".as("g_b"))
    val joined = l.join(broadcast(r), Seq("bucket")).filter($"id_a" < $"id_b")
    time("q23_join_only")(joined.select($"id_a").count())
    val jac = joined.select($"id_a", $"id_b",
      graft.functions.ArrayJaccard.sortedLongJaccard($"g_a", $"g_b").as("jaccard"))
    time("q23_jaccard_nofilter")(jac.agg(sum($"jaccard")).as[Double].head().toLong)
    time("q23_full_nosort")(jac.filter($"jaccard" >= 0.55).count())
    def noop(name: String) = time(name)(
      { SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save(); 0L })
    noop("q23_dedup_ngram")
    noop("q13_window_topk")
    noop("q21_dedup_minhash")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val orders = Tables.t(spark, dir, "orders")
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val rnOnly = orders.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
    time("q13_rn_only")({ rnOnly.write.format("noop").mode("overwrite").save(); 0L })
    val cum = orders.withColumn("rn", row_number().over(w))
      .withColumn("cum_spend", sum($"o_totalprice".cast(DecimalType(18, 2)))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast(DecimalType(38, 2)))
      .filter($"rn" <= 3)
    time("q13_no_final_sort")({ cum.write.format("noop").mode("overwrite").save(); 0L })
    time("q13_spread")({ Tables.spread(orders).withColumn("rn", row_number().over(w))
      .withColumn("cum_spend", sum($"o_totalprice".cast(DecimalType(18, 2)))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast(DecimalType(38, 2)))
      .filter($"rn" <= 3).orderBy("o_custkey", "rn").write.format("noop").mode("overwrite").save(); 0L })
    spark.stop()
  }
}
