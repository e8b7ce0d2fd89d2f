package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Round8tQueries, Round8zQueries, Round9Queries}

/** Scale probe for the staged wedge forms (q353/q354): times ONE
  * staged run at a chosen slice count over SPARK_GRAFT_SF_DIR —
  * built for the ×30/×100 ScaleGen replicas where the single-shot
  * forms exhaust the box's spill disk (bench/r09_scale100_q321.json /
  * _q272.json). Prints one JSON line (BENCHNOTES protocol).
  *
  * Usage: runMain graft.StagedProbe <aa|cc> <slices>
  *
  * The short periodic-GC interval makes the between-slice shuffle-file
  * cleanup (ContextCleaner) prompt even if the driver heap never
  * pressures a GC on its own — the staged form's disk ceiling depends
  * on slice N's files being gone before slice N+1 peaks.
  */
object StagedProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StagedProbe <aa|cc> <slices>")
    val which = args(0)
    val slices = args(1).toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val df = which match {
      case "aa" => Round8zQueries.adamicAdarStaged(
        spark, sfDir, Round9Queries.AaCap, slices)
      case "cc" => Round8tQueries.localClusteringStaged(spark, sfDir, slices)
      case other => sys.error(s"unknown probe: $other")
    }
    val n = df.collect().length
    val sec = (System.nanoTime() - t0) / 1e9
    // format kept parseable by the driver's bench-line scraper
    println(s"""{"metric":"staged_$which","value":$sec,"unit":"sec","queries":{"staged_${which}_s$slices":$sec},"rows":$n,"slices":$slices,"sf":"$sfDir"}""")
    println(s"[staged] Staged.suggestSlices: for this heap " +
      s"(${Runtime.getRuntime.maxMemory() / (1L << 30)} GiB), state estimates " +
      s"{100, 200, 400} GiB -> slices {" +
      Seq(100L, 200L, 400L).map(g =>
        graft.operators.Staged.suggestSlices(g << 30)).mkString(", ") + "}")
    spark.stop()
  }
}
