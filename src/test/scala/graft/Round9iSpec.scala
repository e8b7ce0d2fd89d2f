package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Round9iQueries

/** Behavior pins for the Round-9 batch-9 operators (q343–q345): the
  * KMV audit replayed hash-by-hash, the skyline checked against the
  * naive O(n²) dominance definition (the check the windowed form must
  * reproduce), and association rules recomputed from basket sets.
  */
class Round9iSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(name: String) =
    Round9iQueries.queries.collectFirst { case (`name`, fn, _) => fn }.get

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h32(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(8), 16)

  private def normText(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9\\s]", "").replaceAll("\\s+", " ").trim

  test("q343 equals a window-by-window KMV replay; small windows are exact") {
    val du = Tables.t(spark, TestSpark.Sf, "events")
      .select(datediff(to_date($"ts".cast("timestamp")),
        lit("1970-01-01").cast("date")).cast("long"), $"user_id")
      .as[(Long, Long)].collect().toSeq.distinct
    val mn = du.map(_._1).min; val mx = du.map(_._1).max
    val expected = (mn + 6 to mx).flatMap { end =>
      val users = du.filter(p => p._1 >= end - 6 && p._1 <= end)
        .map(_._2).distinct
      if (users.isEmpty) None else {
        val exact = users.size.toLong
        val hs = users.map(u => h32(s"wau|$u")).distinct.sorted
        val est =
          if (hs.size < 256) hs.size.toLong
          else 255L * 4294967296L / hs(255)
        val err = math.floor((est - exact).toDouble / exact * 1e6 + 0.5).toLong
        Some((end, exact, est, err))
      }
    }
    val got = q("q343_sliding_kmv_audit")(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == expected)
    // while every window fits in the sketch the audit must read exact
    assert(got.forall(r => r._2 >= 256 || (r._3 == r._2 && r._4 == 0L)))
  }

  test("q344 equals the naive O(n^2) dominance definition") {
    val docs = Tables.t(spark, TestSpark.Sf, "documents")
      .select($"doc_id", $"n_chars", $"text").as[(Long, Long, String)]
      .collect().toSeq.map { case (id, nc, text) =>
        val score = normText(text).split(" ").filter(_.nonEmpty)
          .map(t => h32("w|" + (h32(t) % 1024)) % 2001 - 1000).sum
        (id, score, nc)
      }
    val expected = docs.filter { case (_, s, c) =>
      !docs.exists { case (_, s2, c2) =>
        (s2 >= s && c2 >= c) && (s2 > s || c2 > c) }
    }.sortBy(r => (-r._2, r._1))
    val got = q("q344_skyline")(spark, TestSpark.Sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q345 equals an imperative rule replay; lift is direction-symmetric") {
    val items = Tables.t(spark, TestSpark.Sf, "lineitem")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
      .toSeq.distinct
    val nb = items.map(_._1).distinct.size.toLong
    val supp = items.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairs = items.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2).toSeq
    val rules = pairs.flatMap { case ((a, b), sab) =>
      Seq((a, b, sab), (b, a, sab)) }.map { case (ante, cons, sab) =>
      val sa = supp(ante); val sc = supp(cons)
      (ante, cons, sab, sa, sc, 1000000L * sab / sa,
        (BigInt(1000000) * sab * nb / (BigInt(sa) * sc)).toLong)
    }
    val expected = rules.sortBy(r => (-r._7, -r._6, r._1, r._2)).take(20)
    val got = q("q345_association_rules")(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // lift of A->B and B->A is the same quantity up to integer floors
    val byPair = rules.groupBy(r => Set(r._1, r._2))
    byPair.values.foreach { g =>
      if (g.size == 2) assert(math.abs(g.head._7 - g.last._7) <= 1000)
    }
  }
}
