package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot keys at scale.
  *
  * AQE's skew-join splitting handles most cases at runtime; these are the
  * explicit forms for when the skew is known (a boilerplate document, a
  * null-heavy join key, one giant customer) and the plan should not depend
  * on runtime detection.
  */
object Skew {

  /** Two-phase salted aggregation: spread each group over `buckets`
    * sub-groups for the wide partial pass, then combine. Result is
    * identical to a direct groupBy-agg (both phases use the same
    * commutative aggregate), but no single reducer ever sees a whole hot
    * key. Supports the sum/count family (re-aggregatable). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     buckets: Int): DataFrame = {
    val salt = pmod(hash(monotonically_increasing_id()), lit(buckets))
    df.select(key.as("k"), value.as("v"), salt.as("s"))
      .groupBy(col("k"), col("s"))
      .agg(sum(col("v")).as("pv"), count(lit(1)).as("pc"))
      .groupBy(col("k"))
      .agg(sum(col("pv")).as("sum_value"), sum(col("pc")).as("n_rows"))
  }

  /** Salted broadcast-free join for one known-hot key set: the big side
    * gets a random salt in [0, buckets); the small side is exploded
    * `buckets`× so every salted partition finds its match. Equivalent to
    * a plain equi-join; the hot key's rows land on `buckets` reducers
    * instead of one. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
