package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering — GridCumulative's sibling for the
  * rank family. `row_number().over(Window.orderBy(...))` with no
  * partition moves EVERY row through one task; several operators need
  * a total rank over a data-scale table (per-doc score ranks, layout
  * ntiles), where that is the one non-scalable step in an otherwise
  * bounded plan. The two-level form is the classic distributed sort
  * rank: range-bucket on the leading (numeric) order column — monotone,
  * so bucket order equals value order — rank WITHIN each bucket's
  * partition over the full order, and add the broadcast count of rows
  * in earlier buckets. Requires the full order to be total (callers
  * already carry deterministic tie-break columns — the q237 rule), and
  * produces BIT-IDENTICAL ranks to the single-partition window at any
  * bucket count (GridRankSpec pins 1/7/32, asc and desc, with ties).
  * DuckDB oracles keep their one-window SQL: physical choice only.
  */
object GridRank {

  /** Adds `outCol` = global `row_number()` over (valueCol asc|desc,
    * tieCols...). Per-task state is ~|rows|/buckets; the only
    * cross-bucket step is a window over the `buckets`-row count table.
    *
    * Null `valueCol` rows follow Spark's window semantics exactly:
    * nulls-FIRST ascending, nulls-LAST descending — they get their own
    * bucket at the matching end of the traversal (r11 ADVICE: the first
    * version keyed nulls into a null bucket that the equi-join against
    * the offsets table silently dropped).
    */
  def withRowNumber(df: DataFrame, valueCol: String, tieCols: Seq[Column],
      outCol: String, buckets: Int = 32,
      descending: Boolean = false): DataFrame = {
    val v = col(valueCol)
    val bounds = df.agg(min(v).as("__vmin"), max(v).as("__vmax"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // monotone w.r.t. the traversal order: ascending buckets count up
    // from vmin, descending from vmax — DECIMAL so a full-long span
    // cannot wrap (the GridCumulative formula)
    val dist = if (descending) dec(col("__vmax")) - dec(v)
               else dec(v) - dec(col("__vmin"))
    val b = df.crossJoin(broadcast(bounds))
      .withColumn("__bkt",
        when(v.isNull, lit(if (descending) buckets.toLong else -1L))
          .when(col("__vmax") === col("__vmin"), lit(0L))
          .otherwise(floor(dist * buckets /
            (dec(col("__vmax")) - dec(col("__vmin")) + 1)).cast("long")))
      .drop("__vmin", "__vmax")
    val ord = (if (descending) v.desc else v.asc) +: tieCols
    val wIn = Window.partitionBy(col("__bkt")).orderBy(ord: _*)
    val withIn = b.withColumn("__rn_in", row_number().over(wIn).cast("long"))
    val counts = b.groupBy(col("__bkt")).agg(count(lit(1)).as("__cnt"))
    val wB = Window.partitionBy(lit(0)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = counts
      .withColumn("__off", sum(col("__cnt")).over(wB) - col("__cnt"))
      .select(col("__bkt"), col("__off"))
    withIn.join(broadcast(offs), Seq("__bkt"))
      .withColumn(outCol, col("__off") + col("__rn_in"))
      .drop("__bkt", "__rn_in", "__off")
  }

  /** Adds `outCol` = `ntile(k)` over (valueCol asc, tieCols...) —
    * derived from the two-level global rank by Spark's exact ntile
    * fill rule (the first n mod k tiles take ⌈n/k⌉ rows, the rest
    * ⌊n/k⌋, in rank order). Same bit-identity guarantee.
    */
  def withNtile(df: DataFrame, k: Int, valueCol: String, tieCols: Seq[Column],
      outCol: String, buckets: Int = 32): DataFrame = {
    val rn = "__gr_rn"
    val ranked = withRowNumber(df, valueCol, tieCols, rn, buckets)
    val total = df.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(total))
      .withColumn(outCol, expr(
        s"""CAST(CASE WHEN $rn <= (__n % $k) * (__n div $k + 1)
              THEN ($rn + __n div $k) div (__n div $k + 1)
              ELSE __n % $k + ($rn - (__n % $k) * (__n div $k + 1)
                   + __n div $k - 1) div (__n div $k) END AS INT)"""))
      .drop(rn, "__n")
  }
}
