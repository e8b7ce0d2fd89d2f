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

  private def bucketOf(c: Column, width: Double): Column =
    floor(c / width).cast("long")

  /** Buckets covered by the half-open interval [lo, hi): the hi bucket
    * is excluded when hi sits exactly on a bucket boundary. */
  private def coveredBuckets(lo: Column, hi: Column, width: Double): Column =
    sequence(bucketOf(lo, width),
      greatest(bucketOf(lo, width), bucketOf(hi, width) -
        when(hi === floor(hi / width) * width, 1L).otherwise(0L)))

  /** Inner-join `points` to every interval containing them:
    * lo <= point < hi. `points`/`intervals` may carry any payload
    * columns; the three coordinate columns must be numeric. */
  def pointInterval(points: DataFrame, pointCol: String,
                    intervals: DataFrame, loCol: String, hiCol: String,
                    bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val p = points.withColumn("__bucket", bucketOf(col(pointCol), bucketWidth))
    val i = intervals.withColumn("__bucket",
      explode(coveredBuckets(col(loCol), col(hiCol), bucketWidth)))
    p.join(i, Seq("__bucket"))
      .filter(col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Inner-join two interval tables on half-open overlap:
    * max(lLo, rLo) < min(lHi, rHi). Both sides explode to their covered
    * buckets and equi-join on the bucket id; a pair overlapping several
    * shared buckets would match once per bucket, so the join keeps only
    * the match in the bucket that contains the overlap's START
    * (max(lLo, rLo)) — each qualifying pair is emitted exactly once
    * with no post-join distinct (which would shuffle the payload).
    * Column names must be distinct across the two inputs. */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
                      right: DataFrame, rLo: String, rHi: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val l = left.withColumn("__bucket",
      explode(coveredBuckets(col(lLo), col(lHi), bucketWidth)))
    val r = right.withColumn("__bucket",
      explode(coveredBuckets(col(rLo), col(rHi), bucketWidth)))
    l.join(r, Seq("__bucket"))
      .filter(greatest(col(lLo), col(rLo)) < least(col(lHi), col(rHi)))
      .filter(col("__bucket") ===
        floor(greatest(col(lLo), col(rLo)) / bucketWidth).cast("long"))
      .drop("__bucket")
  }
}
