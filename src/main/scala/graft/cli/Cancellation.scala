package graft.cli

import org.apache.spark.sql.SparkSession

/** Interruptible execution (S11/C11): the reference tags its SQL with a
  * "gomysql2pg" comment marker and kills matching PROCESSLIST entries on
  * Ctrl-C (cmd/app.go:186-216). Spark's native equivalent is job groups: every
  * pipeline phase runs inside a named, interruptible group, and a single
  * cancel call interrupts all its tasks (which in turn cancels in-flight
  * JDBC statements via task interruption).
  */
object Cancellation {

  val GroupId = "gomysql2pgspark"

  /** Run `body` inside the cancellable job group. */
  def interruptible[A](spark: SparkSession, desc: String)(body: => A): A = {
    spark.sparkContext.setJobGroup(GroupId, desc, interruptOnCancel = true)
    try body
    finally spark.sparkContext.clearJobGroup()
  }

  /** Cancel everything the pipeline has in flight (the Ctrl-C hook,
    * root.go:62-64). */
  def cancelAll(spark: SparkSession): Unit =
    spark.sparkContext.cancelJobGroup(GroupId)

  /** Install the reference's signal-hook behavior on the driver JVM. */
  def installShutdownHook(spark: SparkSession): Unit =
    sys.addShutdownHook { cancelAll(spark) }
}
