package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed box-calibration workload, emitted next to each round's bench
  * pin.
  *
  * Cross-round bench totals on this project carry a ±30% VM-instance
  * term with a NON-uniform shape profile: the r12 same-code A/B read
  * ×1.34 overall for identical code across box instances, and ~×3 on
  * graph/shuffle-shaped queries specifically (BENCHNOTES "A/B
  * attribution"). So each round close records three shape-pure
  * microqueries over frozen synthetic data — `spark.range` inputs:
  * deterministic by construction, no disk, no parquet — whose
  * per-shape ratios against a reference round let future rounds
  * normalize bench deltas without re-running worktree A/Bs.
  *
  * How to read `bench/rNN_calibration.json`:
  *   ratio_shape = rNN.shapes.X / rMM.shapes.X        (X ∈ scan, shuffle, graph)
  * Before calling a cross-round per-query delta a code effect, divide
  * the query's time by the ratio of its dominant shape; what survives
  * is the code term. Shape assignment: pure scans/projections/kernels →
  * scan; groupBy/join-heavy → shuffle; iterative self-join/fan-out
  * (components, Adamic–Adar, band crowding) → graph.
  *
  * Sizing: each shape targets ~10 s on the 32-core reference box —
  * long enough to swamp JIT and scheduler jitter, short enough that
  * the trio stays ~30 s.
  */
object Calibration {

  /** 64-bit avalanche mix — the codegen'd xxhash64 builtin, so the
    * shapes stay compute-bound inside whole-stage codegen and ANSI
    * mode (Spark 4 default) sees no overflowing arithmetic.
    */
  private def mix(c: Column): Column = xxhash64(c)

  /** Pure CPU scan: codegen'd long arithmetic folded to one row
    * (pmod bounds the summed values so the ANSI sum cannot overflow).
    */
  def scanShape(spark: SparkSession): DataFrame =
    spark.range(0L, 6000000000L, 1L, 64)
      .select(sum(pmod(mix(mix(mix(col("id")))), lit(1000000000L))).as("s"))

  /** One wide hash exchange: 200M rows into 4M groups, two aggregates,
    * folded to a scalar so the sink cost is nil.
    */
  def shuffleShape(spark: SparkSession): DataFrame =
    spark.range(0L, 200000000L, 1L, 64)
      .groupBy(pmod(mix(col("id")), lit(4000000L)).as("k"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
      .agg(sum(col("n")).as("rows"), sum(col("s")).as("chk"))

  /** Graph fan-out: 25M synthetic edges over 1M vertices, wedge count
    * via a dst=src self-join (~E²/V ≈ 625M joined rows),
    * reduced per source vertex then folded. The shape the r12 A/B saw
    * move ~×3 across boxes.
    */
  def graphShape(spark: SparkSession): DataFrame = {
    val v = lit(1000000L)
    val edges = spark.range(0L, 25000000L, 1L, 64)
      .select(pmod(mix(col("id")), v).as("src"),
        pmod(mix(col("id") + lit(7L)), v).as("dst"))
    val hop = edges.select(col("dst").as("mid"), col("src"))
      .join(edges.select(col("src").as("mid"), col("dst")), "mid")
    hop.groupBy("src").agg(count(lit(1)).as("wedges"))
      .agg(sum("wedges").as("total_wedges"), count(lit(1)).as("sources"))
  }

  def shapes: Seq[(String, SparkSession => DataFrame)] = Seq(
    "scan" -> scanShape _,
    "shuffle" -> shuffleShape _,
    "graph" -> graphShape _)

  /** Times each shape (noop sink, min of `reps` after one untimed
    * warmup rep) and writes ONE JSON line to `outPath`.
    */
  def run(outPath: String, reps: Int = 2): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timed = shapes.map { case (name, fn) =>
      val times = (0 to reps).map { rep =>
        val t0 = System.nanoTime()
        fn(spark).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        (rep, dt)
      }
      // rep 0 is the untimed warmup (JIT + codegen compile)
      name -> times.drop(1).map(_._2).min
    }
    val body = timed.map { case (k, v) => s"\"$k\":$v" }.mkString(",")
    val heapGb = Runtime.getRuntime.maxMemory() / (1L << 30)
    val line = s"""{"metric":"calibration","unit":"sec","shapes":{$body},""" +
      s""""cpus":$cpus,"heap_gb":$heapGb}"""
    println(line)
    val p = java.nio.file.Paths.get(outPath)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }

  def main(args: Array[String]): Unit =
    run(if (args.nonEmpty) args(0) else "bench/calibration.json")
}
