package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join without a nested-loop plan.
  *
  * Spark plans a pure range predicate (`lo <= p AND p < hi`) with no
  * equi-key as BroadcastNestedLoopJoin — every point row is tested
  * against every interval, O(|P|·|I|) work that stops scaling the moment
  * the interval side outgrows a broadcast. The classic scale rewrite
  * buckets the domain: each point hashes to exactly one bucket of width
  * `bucketWidth`, each interval explodes to the (few) buckets it covers,
  * and the join becomes an equi-join on the bucket id — shuffle-partition
  * parallel, AQE-splittable, no cross product. The exact range predicate
  * is re-applied after the bucket match, so the rewrite is
  * semantics-preserving for ANY bucket width; width only tunes the
  * explode factor (≈ interval length / width) vs. candidate precision.
  *
  * A point falls in exactly one bucket, so no post-join distinct is
  * needed — each qualifying (point, interval) pair is emitted once.
  */
object IntervalJoin {

  /** Inner-join `points` to every interval containing them:
    * lo <= point < hi. `points`/`intervals` may carry any payload
    * columns; the three coordinate columns must be numeric. */
  def pointInterval(points: DataFrame, pointCol: String,
                    intervals: DataFrame, loCol: String, hiCol: String,
                    bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    val p = points.withColumn("__bucket", bucketOf(col(pointCol)))
    // intervals cover [lo, hi): last bucket is the one holding the
    // largest representable value BELOW hi, hence the half-open nudge
    val i = intervals
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(loCol)),
          greatest(bucketOf(col(loCol)), bucketOf(col(hiCol)) -
            when(col(hiCol) === floor(col(hiCol) / bucketWidth) * bucketWidth, 1L)
              .otherwise(0L)))))
    p.join(i, Seq("__bucket"))
      .filter(col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
