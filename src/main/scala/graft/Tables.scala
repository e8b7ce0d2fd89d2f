package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * At cluster scale these would be catalog tables / JDBC sources; the
  * parquet reader keeps filter pushdown + column pruning (verified via
  * `.explain("formatted")` — `PushedFilters`/`ReadSchema`).
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's TimestampType
      // (micros) rejects by default — read nanos as long, convert.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType.typeName match {
        case "long" => raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
        case _ => raw
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
    df
  }

  /** Spread a scan across all cores before a compute-heavy stage.
    *
    * A single small parquet file scans as ONE split, serializing every
    * downstream map-heavy stage onto one core. Queries whose per-row work
    * dominates (shingling, hashing, vector math) call this on their
    * input; scan-bound queries don't (the shuffle would cost more than it
    * buys). On real multi-file multi-row-group inputs — the 100 TB case —
    * the condition is false and this is a no-op.
    */
  def spread(df: DataFrame): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < slots) df.repartition(slots) else df
  }
}
