package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.GridRank

/** GridRank must reproduce the single-partition window rank BIT FOR
  * BIT at every bucket count — ascending, descending, heavy ties,
  * negative values, and the ntile fill rule for k that divides n, k
  * that doesn't, and k > n.
  */
class GridRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic skewed sample with ties and negatives
  private lazy val df = (1 to 997).map { i =>
    (i.toLong, ((i * 7919) % 101 - 50).toLong)
  }.toDF("id", "v").repartition(8).cache()

  private def direct(desc: Boolean): Seq[(Long, Long)] = {
    val w = Window.orderBy((if (desc) $"v".desc else $"v".asc), $"id")
    df.withColumn("rn", row_number().over(w).cast("long"))
      .select($"id", $"rn").as[(Long, Long)].collect().toSeq.sortBy(_._1)
  }

  test("row_number matches the global window for buckets in {1, 7, 32}, asc and desc") {
    for (desc <- Seq(false, true); b <- Seq(1, 7, 32)) {
      val got = GridRank.withRowNumber(df, "v", Seq($"id"), "rn", b, desc)
        .select($"id", $"rn").as[(Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got == direct(desc), s"diverged at buckets=$b desc=$desc")
    }
  }

  test("ntile matches Spark's fill rule for k in {5, 64, 1000} at several bucket counts") {
    for (k <- Seq(5, 64, 1000); b <- Seq(1, 7, 32)) {
      val w = Window.orderBy($"v", $"id")
      val want = df.withColumn("t", ntile(k).over(w))
        .select($"id", $"t").as[(Long, Int)].collect().toSeq.sortBy(_._1)
      val got = GridRank.withNtile(df, k, "v", Seq($"id"), "t", b)
        .select($"id", $"t").as[(Long, Int)].collect().toSeq.sortBy(_._1)
      assert(got == want, s"ntile diverged at k=$k buckets=$b")
    }
  }

  test("null values rank exactly like the global window (nulls first asc, last desc)") {
    // r11 ADVICE: the first version dropped null-valueCol rows at the
    // offsets equi-join; now they get the end bucket Spark's window
    // ordering gives them
    val n = (1 to 60).map { i =>
      (i.toLong, if (i % 5 == 0) None else Some(((i * 13) % 7 - 3).toLong))
    }.toDF("id", "v").repartition(4)
    for (desc <- Seq(false, true); b <- Seq(1, 8)) {
      val w = Window.orderBy((if (desc) $"v".desc else $"v".asc), $"id")
      val want = n.withColumn("rn", row_number().over(w).cast("long"))
        .select($"id", $"rn").as[(Long, Long)].collect().toSeq.sortBy(_._1)
      val got = GridRank.withRowNumber(n, "v", Seq($"id"), "rn", b, desc)
        .select($"id", $"rn").as[(Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got == want, s"null handling diverged at buckets=$b desc=$desc")
    }
  }

  test("constant value column degrades to a single bucket but stays correct") {
    val c = (1 to 50).map(i => (i.toLong, 42L)).toDF("id", "v")
    val got = GridRank.withRowNumber(c, "v", Seq($"id"), "rn", 8)
      .select($"id", $"rn").as[(Long, Long)].collect().toSeq.sorted
    assert(got == (1 to 50).map(i => (i.toLong, i.toLong)))
  }
}
