package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the wide-schema probe's two shapes against independent
  * formulations at a small width, so the ×W scale readings in
  * BENCHNOTES measure a CORRECT implementation:
  *  - profileWide (q322's stack shape over W derived columns) must
  *    match a straight per-column aggregate of the same wide table;
  *  - boundariesWide's assignment must be a true partition of each
  *    column (partition sizes sum to n, ≤ 32 partitions) and the
  *    boundary cut must respect the sample: a column with ≥ 32·k
  *    distinct sampled values uses all 32 partitions.
  */
class WideProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"
  private val width = 6

  private lazy val widePath = {
    val p = graft.TempScratch.fresh("graft_wide_spec")
      .resolve("w").toString
    WideProbe.writeWide(spark, sfDir, width, p)
    p
  }

  test("profileWide matches a direct per-column aggregate") {
    import spark.implicits._
    val got = WideProbe.profileWide(spark, widePath, width)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val wide = spark.read.parquet(widePath)
    val n = wide.count()
    assert(got.size === width)
    WideProbe.wideCols(width).foreach { case (name, _) =>
      val d = wide.agg(
        countDistinct(col(name)), min(col(name)), max(col(name))).head()
      val (nRows, nDistinct, nNull, mn, mx) = got(name)
      assert(nRows === n, name)
      assert(nNull === 0L, name)
      assert(nDistinct === d.getLong(0), name)
      assert(mn === d.getLong(1), name)
      assert(mx === d.getLong(2), name)
    }
  }

  test("profileWideChunked is row-identical to profileWide at a non-dividing chunk") {
    val full = WideProbe.profileWide(spark, widePath, width)
      .collect().map(_.toSeq).toSeq
    val chunked = WideProbe.profileWideChunked(spark, widePath, width, 4)
      .collect().map(_.toSeq).toSeq // chunks of 4 + 2 at width 6
    assert(chunked === full)
  }

  test("boundariesWide partitions every column exactly; wide grids fill 32") {
    import spark.implicits._
    val rows = WideProbe.boundariesWide(spark, widePath, width).collect()
    assert(rows.length === width)
    val wide = spark.read.parquet(widePath)
    val n = wide.count()
    rows.foreach { r =>
      val (name, parts, maxRows, overfill) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(parts >= 1L && parts <= 32L, name)
      // max partition must hold at least the even share, and the
      // reported overfill must be exactly the max-vs-ideal excess
      assert(maxRows >= n / 32, name)
      assert(overfill === 1000000L * maxRows * 32 / n - 1000000L, name)
      val distinctSampled = wide
        .withColumn("h", conv(substring(md5(concat(lit("wp|"),
          $"l_orderkey".cast("string"))), 1, 8), 16, 10)
          .cast("long") % 100)
        .filter($"h" < 5).select(countDistinct(col(name))).head().getLong(0)
      if (distinctSampled >= 320) assert(parts === 32L, name)
    }
  }
}
