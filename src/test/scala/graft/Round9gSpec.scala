package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Round9gQueries

/** Behavior pins for the Round-9 batch-7 operators (q337–q339): the
  * A/B z replayed user-by-user, trimmed/winsorized means recomputed
  * from a full sort, and Gini recomputed from the ranked-mass formula
  * plus its defining bounds.
  */
class Round9gSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(name: String) =
    Round9gQueries.queries.collectFirst { case (`name`, fn, _) => fn }.get

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h32(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(8), 16)

  private def normText(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9\\s]", "").replaceAll("\\s+", " ").trim

  test("q337 equals an imperative two-proportion replay; md5 split reads null") {
    val rows = Tables.t(spark, TestSpark.Sf, "events")
      .select($"user_id", $"event_type",
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .as[(Long, String, Long)].collect().toSeq
    val conv = rows.groupBy(_._1).view.mapValues(g =>
      if (g.exists(e => e._2 == "purchase" && e._3 >= 15000L)) 1L else 0L)
      .toMap
    val (a, b) = conv.keys.toSeq.partition(u => h32(s"ab|$u") % 2 == 0)
    val na = a.size.toLong; val xa = a.map(conv).sum
    val nb = b.size.toLong; val xb = b.map(conv).sum
    val pa = 1000000L * xa / na; val pb = 1000000L * xb / nb
    val pool = 1000000L * (xa + xb) / (na + nb)
    val z =
      if (pool == 0L || pool == 1000000L) None
      else Some(math.floor(
        (pa - pb).toDouble * 1000 /
          math.sqrt(pool.toDouble * (1000000L - pool) *
            (1.0 / na + 1.0 / nb)) + 0.5).toLong)
    val rej = z.map(v => if (math.abs(v) >= 1960L) 1L else 0L).getOrElse(0L)
    val got = q("q337_ab_proportion_ztest")(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Option[Long], Long)]
      .collect().head
    assert(got == ((na, xa, nb, xb, pa, pb, pool, z, rej)))
    // an md5 split of one population must not reject at 5%
    assert(rej == 0L)
  }

  test("q338 equals a full-sort trimmed/winsorized replay") {
    val vs = Tables.t(spark, TestSpark.Sf, "orders")
      .select($"o_totalprice").as[Double].collect().toSeq
      .map(x => math.floor(x * 100 + 0.5).toLong).sorted
    val n = vs.size.toLong
    val lo = (n + 19) / 20; val hi = n - lo
    val interior = vs.slice(lo.toInt, hi.toInt) // ranks lo+1..hi
    val p05 = vs(lo.toInt) // rank lo+1
    val p95 = vs(hi.toInt - 1) // rank hi
    val mean = vs.sum / n
    val trimmed = interior.sum / interior.size
    val wins = (interior.sum + lo * p05 + (n - hi) * p95) / n
    val got = q("q338_trimmed_mean")(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((n, mean, trimmed, wins, p05, p95)))
    // clamping can only pull the mean toward the interior
    assert(p05 <= p95)
  }

  test("q339 equals the ranked-mass Gini formula; Lorenz is convex-ordered") {
    val m = Tables.t(spark, TestSpark.Sf, "documents")
      .select($"source", $"text").as[(String, String)].collect().toSeq
      .groupBy(_._1).view.mapValues(g =>
        g.map(r => normText(r._2).split(" ").length.toLong).sum)
      .toSeq.sortBy(r => (r._2, r._1))
    val ns = m.size.toLong; val tm = m.map(_._2).sum
    val sxi = m.zipWithIndex.map { case ((_, x), i) => BigInt(i + 1) * x }.sum
    val gini = ((2 * sxi * 1000000 - BigInt(1000000) * (ns + 1) * tm) /
      (BigInt(ns) * tm)).toLong
    var cm = 0L
    val expected = m.zipWithIndex.map { case ((src, mass), i) =>
      cm += mass
      (i + 1L, src, mass, 1000000L * cm / tm, gini)
    }
    val got = q("q339_gini_concentration")(spark, TestSpark.Sf)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(gini >= 0L && gini < 1000000L)
    // Lorenz curve of ascending-ranked masses is below the diagonal
    assert(got.forall(r => r._4 <= 1000000L * r._1 / ns + 1))
  }
}
