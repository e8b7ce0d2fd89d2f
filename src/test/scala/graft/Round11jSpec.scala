package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavior pins for the robust-inference battery (q398–q400):
  * BigInt replays for the dispersion algebra, double chains in the
  * shared operation order for Cook's distance, and the Holm ⊆ BH
  * rejection-set containment.
  */
class Round11jSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def dailyCounts(): Map[(String, Long), Long] = {
    import spark.implicits._
    Tables.t(spark, TestSpark.Sf, "events")
      .select($"event_type",
        expr("datediff(to_date(CAST(ts AS TIMESTAMP)), DATE '1970-01-01')")
          .cast("long"))
      .as[(String, Long)].collect().toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("q398 dispersion index equals the cleared-integer replay") {
    val daily = dailyCounts()
    val exp = daily.keys.map(_._1).toSeq.distinct.sorted.map { et =>
      val cs = daily.collect { case ((t, _), c) if t == et => c }.toSeq
      val n = cs.size.toLong
      val s0 = cs.sum
      val q2 = cs.map(c => BigInt(c) * c).sum
      val dMicro = ((BigInt(n) * q2 - BigInt(s0) * s0) * 1000000 /
        (BigInt(n - 1) * s0)).toLong
      (et, n, s0, dMicro, if (dMicro > 1000000L) 1L else 0L)
    }
    val got = q("q398_overdispersion").collect()
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (row, e) =>
      assert((row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4)) == e)
    }
  }

  test("q399 Cook's distance equals the cleared-moment replay") {
    val daily = dailyCounts().toSeq
      .groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val n = daily.size.toLong
    val sx = daily.map(_._1).sum
    val sy = daily.map(_._2).sum
    val cent = daily.map { case (x, y) => (x, y, n * x - sx, n * y - sy) }
    val sxx = cent.map(t => BigInt(t._3) * t._3).sum
    val sxy = cent.map(t => BigInt(t._3) * t._4).sum
    val terms = cent.map { case (x, y, xc, yc) =>
      val e = (BigInt(yc) * sxx - sxy * xc).toDouble /
        (n.toDouble * sxx.toDouble)
      val h = 1.0 / n.toDouble + (BigInt(xc) * xc).toDouble / sxx.toDouble
      (x, y, e, h)
    }
    val sse = terms.sortBy(_._1).map(t => t._3 * t._3).foldLeft(0.0)(_ + _)
    val s2 = sse / (n.toDouble - 2.0)
    val scored = terms.map { case (x, y, e, h) =>
      (x, y, h, e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)))
    }.sortBy(t => (-t._4, t._1)).take(5)
    val got = q("q399_regression_influence").collect()
    assert(got.length == scored.length)
    got.zip(scored).foreach { case (row, e) =>
      assert((row.getLong(0), row.getLong(1)) == ((e._1, e._2)))
      assert(row.getDouble(2) == e._3)
      assert(row.getDouble(3) == e._4)
    }
  }

  test("q400 Holm step-down: first failure stops everything; Holm ⊆ BH") {
    val holm = q("q400_holm_fwer").collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    val bh = q("q359_bh_fdr").collect()
      .map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(holm.keySet == bh.keySet)
    // FWER control is strictly more conservative than FDR at equal alpha
    holm.foreach { case (src, (_, rej)) =>
      if (rej) assert(bh(src), s"$src rejected by Holm but not BH")
    }
    // step-down structure: the rejected set is exactly the ranks below
    // the first failure (contiguous prefix in rank order)
    val byRank = holm.values.toSeq.sortBy(_._1)
    val firstFail = byRank.collectFirst { case (k, false) => k }
    byRank.foreach { case (k, rej) =>
      assert(rej == firstFail.forall(k < _), s"rank $k breaks the prefix rule")
    }
  }
}
