package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only per-stage profiler (not part of the driver contract):
  * `sbt 'runMain graft.StageProfile q296_adamic_adar [sfDir]'` runs the
  * named queries under the bench's noop-sink protocol with a listener
  * that records, per completed stage: wall time between first task
  * launch and stage completion, summed task time, input bytes, shuffle
  * read/write bytes, spill, and peak task count — the local-mode stand-in
  * for the Spark UI's stage table (the UI is disabled in every bench
  * session), mapping each query's seconds onto its exchanges per
  * optimization-guide §1/§7.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val (names, dirs) = args.partition(a => !a.startsWith("/"))
    val dir = dirs.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(name: String, wallMs: Long, taskMs: Long, tasks: Int,
                  inputMB: Double, srMB: Double, swMB: Double,
                  spillMemMB: Double, spillDiskMB: Double, rows: Long)
    val stages = mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        val wall = (for {s <- i.submissionTime; e <- i.completionTime} yield e - s).getOrElse(-1L)
        stages.synchronized {
          stages += St(
            i.name.linesIterator.next().take(60),
            wall, m.executorRunTime, i.numTasks,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.remoteBytesRead / 1e6 + m.shuffleReadMetrics.localBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.memoryBytesSpilled / 1e6, m.diskBytesSpilled / 1e6,
            m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })

    // one warmup so JIT/codegen/parquet-footer cost doesn't land on stage 0
    try SparkEntry.queries("q01_agg")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    names.foreach { name =>
      stages.synchronized(stages.clear())
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"\n=== $name  total ${dt}%.2f s ===")
      // spill split: spill_m = memoryBytesSpilled (in-memory size of data
      // evicted — the pressure signal), spill_d = diskBytesSpilled (bytes
      // actually written, post-compression — the I/O paid)
      println(f"${"stage"}%-60s ${"wall_s"}%8s ${"task_s"}%8s ${"tasks"}%5s ${"in_MB"}%9s ${"sr_MB"}%9s ${"sw_MB"}%9s ${"spill_m"}%8s ${"spill_d"}%8s ${"sw_rows"}%10s")
      stages.synchronized(stages.toSeq).sortBy(-_.taskMs).foreach { s =>
        println(f"${s.name}%-60s ${s.wallMs / 1e3}%8.2f ${s.taskMs / 1e3}%8.1f ${s.tasks}%5d ${s.inputMB}%9.1f ${s.srMB}%9.1f ${s.swMB}%9.1f ${s.spillMemMB}%8.0f ${s.spillDiskMB}%8.0f ${s.rows}%10d")
      }
    }
    spark.stop()
  }
}
