package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wide-SCHEMA scale probe for the column-count-bound operators
  * (q322 typed profile, q331 sampled range partitioner): their cost
  * scales with the number of profiled/planned COLUMNS, which ScaleGen
  * (row replication) never exercises. This probe materializes a
  * W-column parquet variant of lineitem — W derived BIGINT columns
  * with deterministic, distinct-count-varied value domains — and
  * times the two shapes as a function of W:
  *
  *  - profile (q322's shape): ONE stack(W) unpivot → per-(col, value)
  *    map-side dedup → per-column completeness/distinct/min/max. The
  *    unpivot multiplies scan rows by W before the first aggregate,
  *    so the expected scaling is linear in W with a flat per-column
  *    cost — what the probe certifies (a superlinear reading would
  *    mean the shape broke, e.g. fell out of codegen past the 100-arg
  *    stack).
  *  - boundaries (q331's shape at a fixed 5% sample rate): the lane
  *    key is the COLUMN NAME instead of q331's sample rate — cut 31
  *    boundaries per column from the sample grid, assign the full
  *    per-column grid via the interleaved-marker cumulative count,
  *    report the worst partition overfill per column. All windows
  *    partition by col_name, so the W lanes aggregate and window in
  *    parallel; grid size is Σ per-column distinct values.
  *
  * Usage: runMain graft.WideProbe <width> [sfDir]
  * Prints one BENCHNOTES-protocol JSON line; the wide parquet goes to
  * /tmp/graft_wide_<width> (re-used if present — delete to regen).
  */
object WideProbe {
  /** Deterministic derived columns: c_j = (ok * p_j + pk) % m_j with
    * p_j a rotating small prime and m_j CYCLING a fixed 4-step modulus
    * ladder, so per-column distinct counts range from tiny
    * (dictionary-ish) to near-unique (key-ish) — the mix a real wide
    * table has — and, critically, the MIX IS THE SAME AT EVERY WIDTH
    * (a ladder that grew with j would make wider tables also
    * higher-cardinality, biasing the per-column scale reading).
    */
  private val Primes = Seq(31L, 37L, 41L, 43L, 47L, 53L, 59L, 61L)

  private[graft] def wideCols(width: Int): Seq[(String, String)] =
    (0 until width).map { j =>
      val p = Primes(j % Primes.size)
      val m = Seq(97L, 1543L, 24571L, 393209L)(j % 4)
      s"c$j" -> s"(l_orderkey * ${p}L + l_partkey) % ${m}L"
    }

  private[graft] def writeWide(s: SparkSession, sfDir: String, width: Int,
      out: String): Unit = {
    val li = Tables.t(s, sfDir, "lineitem")
    val cols = col("l_orderkey") +:
      wideCols(width).map { case (n, e) => expr(e).as(n) }
    li.select(cols: _*).write.mode("overwrite").parquet(out)
  }

  /** q322's stack-unpivot profile generalized to W columns. */
  private[graft] def profileWide(s: SparkSession, path: String,
      width: Int): DataFrame = {
    import s.implicits._
    val names = wideCols(width).map(_._1)
    val stackArgs = names.map(n => s"'$n', $n").mkString(", ")
    s.read.parquet(path)
      .select(expr(s"stack($width, $stackArgs) AS (col_name, v)"))
      .groupBy($"col_name", $"v").agg(count(lit(1)).as("c"))
      .groupBy($"col_name")
      .agg(sum($"c").as("n_rows"),
        count(when($"v".isNotNull, lit(1))).as("n_distinct"),
        sum(when($"v".isNull, $"c").otherwise(0L)).as("n_null"),
        min($"v").as("min_val"), max($"v").as("max_val"))
      .orderBy($"col_name")
  }

  /** The chunked execution of [[profileWide]]: unpivot + profile
    * `chunk` columns at a time and union the per-chunk aggregates.
    * Output is identical (each column's profile row depends on that
    * column alone); the parquet scan is columnar, so C chunks × W/C
    * columns read exactly the same bytes as one W-wide scan. What
    * changes is the partial-aggregate working set — each chunk's
    * hash map covers W/C lanes' grids instead of all W — the
    * width-direction analogue of the q353/q354 slice dial.
    */
  private[graft] def profileWideChunked(s: SparkSession, path: String,
      width: Int, chunk: Int): DataFrame = {
    import s.implicits._
    val names = wideCols(width).map(_._1)
    val parts = names.grouped(chunk).map { grp =>
      val stackArgs = grp.map(n => s"'$n', $n").mkString(", ")
      s.read.parquet(path)
        .select(expr(s"stack(${grp.size}, $stackArgs) AS (col_name, v)"))
        .groupBy($"col_name", $"v").agg(count(lit(1)).as("c"))
        .groupBy($"col_name")
        .agg(sum($"c").as("n_rows"),
          count(when($"v".isNotNull, lit(1))).as("n_distinct"),
          sum(when($"v".isNull, $"c").otherwise(0L)).as("n_null"),
          min($"v").as("min_val"), max($"v").as("max_val"))
    }
    parts.reduce(_ unionByName _).orderBy($"col_name")
  }

  /** q331's sampled-boundary planner with col_name as the lane key:
    * one 5% row sample feeds every column's boundary cut; assignment
    * is the same interleaved-marker cumulative count, per column.
    */
  private[graft] def boundariesWide(s: SparkSession, path: String,
      width: Int): DataFrame = {
    import s.implicits._
    val names = wideCols(width).map(_._1)
    val stackArgs = names.map(n => s"'$n', $n").mkString(", ")
    val base = s.read.parquet(path)
      .withColumn("h",
        conv(substring(md5(concat(lit("wp|"), $"l_orderkey".cast("string"))),
          1, 8), 16, 10).cast("long") % 100)
    val lanes0 = base
      .select($"h", expr(s"stack($width, $stackArgs) AS (col_name, v)"))
    val samp = lanes0.filter($"h" < 5)
      .groupBy($"col_name", $"v").agg(count(lit(1)).as("scnt"))
    val ws = Window.partitionBy($"col_name").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wtot = Window.partitionBy($"col_name")
    val bnd = samp
      .withColumn("cum", sum($"scnt").over(ws))
      .withColumn("ns", sum($"scnt").over(wtot))
      .withColumn("plo", expr("least(31, 32 * (cum - scnt) div ns)"))
      .withColumn("phi", expr("least(31, 32 * cum div ns)"))
      .filter($"phi" > $"plo")
      .select($"col_name", $"v", explode(expr("sequence(plo + 1, phi)")).as("p"))
    val grid = lanes0.groupBy($"col_name", $"v").agg(count(lit(1)).as("cnt"))
    val marks = grid.select($"col_name", $"v", $"cnt", lit(0L).as("isb"))
      .unionByName(bnd.select($"col_name", $"v", lit(0L).as("cnt"),
        lit(1L).as("isb")))
    val wl = Window.partitionBy($"col_name").orderBy($"v", desc("isb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val assigned = marks.withColumn("pid", sum($"isb").over(wl))
      .filter($"isb" === 0)
      .groupBy($"col_name", $"pid").agg(sum($"cnt").as("pn"))
    val n = base.agg(count(lit(1)).as("n"))
    assigned.groupBy($"col_name")
      .agg(max($"pn").as("max_part_rows"), count(lit(1)).as("n_parts_used"))
      .crossJoin(broadcast(n))
      .select($"col_name", $"n_parts_used", $"max_part_rows",
        expr("1000000 * max_part_rows * 32 div n - 1000000")
          .as("overfill_micro"))
      .orderBy($"col_name")
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: WideProbe <width> [sfDir]")
    val width = args(0).toInt
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = s"/tmp/graft_wide_$width"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      writeWide(spark, sfDir, width, path)

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(profileWide(spark, path, width)) // warmup: JIT + parquet footers
    val tp = time(profileWide(spark, path, width))
    time(profileWideChunked(spark, path, width, 16)) // warmup the union shape
    val tc = time(profileWideChunked(spark, path, width, 16))
    time(boundariesWide(spark, path, width)) // warmup (distinct plan shape)
    val tb = time(boundariesWide(spark, path, width))
    println(s"""{"metric":"wide_w$width","value":${tp + tb},"unit":"sec","queries":{"profile_w$width":$tp,"profile_chunk16_w$width":$tc,"boundaries_w$width":$tb},"width":$width,"sf":"$sfDir"}""")
    spark.stop()
  }
}
