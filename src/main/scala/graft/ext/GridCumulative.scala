package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running totals over a value grid.
  *
  * `Window.orderBy(v)` with no partition moves the WHOLE grid through
  * one task (Spark logs `WindowExec: No Partition Defined`); tolerable
  * for a domain-bounded grid at test scale, but a wide-open grid
  * (cents, char lengths at 100 TB) deserves the same two-level
  * treatment q106 gives token offsets. This computes the identical
  * running total with bounded per-task state: range-bucket the grid by
  * value (monotone, so bucket order = value order), run the running
  * sum within each bucket's partition, and add each bucket's broadcast
  * prefix offset. All arithmetic is exact integer, so the result is
  * BIT-IDENTICAL to the single-partition window at ANY bucket count
  * (GridCumulativeSpec pins 1/7/32 against the direct window) — the
  * DuckDB oracles keep their one-window SQL; this is a Spark-side
  * physical choice only.
  */
object GridCumulative {

  /** Adds `cumCol` = running sum of `sumCol` over `grid` ordered by
    * `valueCol`. `grid` must hold ONE row per distinct value (the
    * grouped-grid shape every adopter already has), so the ordering is
    * total. `buckets` is the parallelism dial: per-task window state
    * is ~|grid|/buckets rows, and the only cross-bucket step is a
    * window over the `buckets`-row totals table.
    */
  def withRunningTotal(grid: DataFrame, valueCol: String, sumCol: String,
      cumCol: String, buckets: Int = 32): DataFrame = {
    val v = col(valueCol)
    val bounds = grid.agg(min(v).as("__vmin"), max(v).as("__vmax"))
    // monotone range bucket: floor((v − vmin)·B / (span + 1)) ∈ [0, B);
    // the subtraction and multiply run in DECIMAL(38,0) so a full-long
    // span cannot wrap
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val b = grid.crossJoin(broadcast(bounds))
      .withColumn("__bkt",
        when(col("__vmax") === col("__vmin"), lit(0L))
          .otherwise(floor(
            (dec(v) - dec(col("__vmin"))) * buckets /
              (dec(col("__vmax")) - dec(col("__vmin")) + 1)).cast("long")))
      .drop("__vmin", "__vmax")
    val wIn = Window.partitionBy(col("__bkt")).orderBy(v)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = b.withColumn("__cum_in", sum(col(sumCol)).over(wIn))
    val totals = b.groupBy(col("__bkt")).agg(sum(col(sumCol)).as("__tot"))
    // deliberately single-task, but over ≤ `buckets` rows — the
    // constant partition key states the intent (and keeps WindowExec's
    // no-partition warning out of the logs)
    val wB = Window.partitionBy(lit(0)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = totals
      .withColumn("__off", sum(col("__tot")).over(wB) - col("__tot"))
      .select(col("__bkt"), col("__off"))
    withIn.join(broadcast(offs), Seq("__bkt"))
      .withColumn(cumCol, col("__off") + col("__cum_in"))
      .drop("__bkt", "__cum_in", "__off")
  }
}
