package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Round-11 batch 16: the corpus-INGEST gate as a stream — every
  * existing streaming operator monitors the events table; this one
  * watches documents arrive (the curation pipeline's entry stage) and
  * maintains per-source acceptance telemetry: volume, the cheap
  * column gates (length floor, English), and their pass rates in
  * exact ppm. State is one counter row per source (roster-bounded);
  * the oracle is the identical batch aggregation, so the streaming
  * state is proven equal to the batch answer — q67's discipline on a
  * second table and a second pipeline stage.
  */
object Round11pQueries {

  type QFn = (SparkSession, String) => DataFrame

  private val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    ("q415_stream_ingest_gate", (s: SparkSession, dir: String) => {
      import s.implicits._
      // the dataset path can be a flat FILE (driver testdata) or a
      // Spark-written DIRECTORY of part files (ScaleGen replicas), and
      // the file source accepts neither uniformly: pointing at a file
      // fails ("Option 'basePath' must be a directory") while the q67
      // symlink-in-a-parent-dir pattern silently reads ZERO rows from a
      // nested directory. Probe once and pick the shape (both failure
      // modes measured before this fix).
      val p = java.nio.file.Paths.get(s"$dir/documents.parquet")
      val srcPath =
        if (java.nio.file.Files.isDirectory(p)) p.toString
        else graft.TempScratch
          .symlinkDir("q415", "documents.parquet", p).toString
      val stream = s.readStream.schema(DocSchema).parquet(srcPath)
      val q = stream
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(($"n_chars" >= 200).cast("long")).as("n_len_ok"),
          sum(($"lang" === "en").cast("long")).as("n_en"),
          sum(($"n_chars" >= 200 && $"lang" === "en").cast("long"))
            .as("n_pass"))
        .writeStream.format("memory").queryName("q415_mem")
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table("q415_mem")
        .select($"source", $"n_docs", $"n_len_ok", $"n_en", $"n_pass",
          expr("1000000 * n_pass div n_docs").as("pass_ppm"))
        .orderBy("source")
    }, Some("""
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(*) FILTER (WHERE n_chars >= 200) AS BIGINT) AS n_len_ok,
        CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_en,
        CAST(count(*) FILTER (WHERE n_chars >= 200 AND lang = 'en') AS BIGINT)
          AS n_pass,
        1000000 * count(*) FILTER (WHERE n_chars >= 200 AND lang = 'en')
          // count(*) AS pass_ppm
      FROM documents GROUP BY source ORDER BY source"""))
  )
}
