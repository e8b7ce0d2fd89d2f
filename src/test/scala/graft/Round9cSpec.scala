package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Round9cQueries

/** Behavior pins for the Round-9 batch-3 operators (q325–q327): the
  * strict funnel replayed per user with an imperative stage chain,
  * retention cohorts recomputed from (user, week) pairs, and the
  * Markov matrix recomputed from per-user sorted streams.
  */
class Round9cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(name: String) =
    Round9cQueries.queries.collectFirst { case (`name`, fn, _) => fn }.get

  private def events: Seq[(Long, String, Long, Long)] =
    Tables.t(spark, TestSpark.Sf, "events")
      .select($"user_id", $"event_type",
        unix_micros($"ts".cast("timestamp")), $"event_id")
      .as[(Long, String, Long, Long)].collect().toSeq

  test("q325 equals an imperative per-user strict stage chain") {
    val byU = events.groupBy(_._1)
    def firstAfter(g: Seq[(Long, String, Long, Long)], et: String,
        after: Long): Option[Long] =
      g.filter(e => e._2 == et && e._3 > after).map(_._3).minOption
    val chains = byU.values.toSeq.map { g =>
      val t1 = g.filter(_._2 == "signup").map(_._3).minOption
      val t2 = t1.flatMap(t => firstAfter(g, "view", t))
      val t3 = t2.flatMap(t => firstAfter(g, "click", t))
      val t4 = t3.flatMap(t => firstAfter(g, "purchase", t))
      (t1.isDefined, t2.isDefined, t3.isDefined, t4.isDefined)
    }
    val c1 = chains.count(_._1).toLong; val c2 = chains.count(_._2).toLong
    val c3 = chains.count(_._3).toLong; val c4 = chains.count(_._4).toLong
    def conv(a: Long, b: Long): Option[Long] =
      if (b == 0) None else Some(1000000L * a / b)
    val expected = Seq(
      (1L, "signup", c1, conv(c1, c1), conv(c1, c1)),
      (2L, "view_after_signup", c2, conv(c2, c1), conv(c2, c1)),
      (3L, "click_after_view", c3, conv(c3, c2), conv(c3, c1)),
      (4L, "purchase_after_click", c4, conv(c4, c3), conv(c4, c1)))
    val got = q("q325_funnel_conversion")(spark, TestSpark.Sf)
      .as[(Long, String, Long, Option[Long], Option[Long])].collect().toSeq
    assert(got == expected)
    // the funnel can only narrow
    assert(c1 >= c2 && c2 >= c3 && c3 >= c4)
  }

  test("q326 equals an imperative cohort replay; offset 0 is always 1e6") {
    val uw = Tables.t(spark, TestSpark.Sf, "events")
      .select($"user_id", expr(
        """CAST(datediff(to_date(CAST(ts AS TIMESTAMP)),
           DATE '1970-01-01') AS BIGINT) div 7"""))
      .as[(Long, Long)].collect().toSeq.distinct
    val first = uw.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = uw.map { case (u, w) => (first(u), w - first(u), u) }
      .filter(_._2 <= 3)
      .groupBy(c => (c._1, c._2)).view
      .mapValues(_.map(_._3).distinct.size.toLong).toMap
    val sizes = cells.collect { case ((cw, 0L), n) => cw -> n }
    val expected = cells.toSeq.map { case ((cw, off), n) =>
      (cw, off, n, sizes(cw), 1000000L * n / sizes(cw))
    }.sortBy(r => (r._1, r._2))
    val got = q("q326_retention_cohorts")(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.filter(_._2 == 0L).forall(_._5 == 1000000L))
  }

  test("q327 equals an imperative transition count; rows sum to ~1e6") {
    val pairs = events.groupBy(_._1).values.toSeq.flatMap { g =>
      val s = g.sortBy(e => (e._3, e._4)).map(_._2)
      s.zip(s.drop(1))
    }
    val cnt = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = cnt.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val expected = cnt.toSeq.map { case ((a, b), n) =>
      (a, b, n, 1000000L * n / rowTot(a))
    }.sortBy(r => (r._1, r._2))
    val got = q("q327_markov_transitions")(spark, TestSpark.Sf)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == expected)
    // each row of the matrix is a floored distribution: the micro
    // probabilities sum within |row| of 1e6
    got.groupBy(_._1).foreach { case (_, rs) =>
      val s = rs.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rs.size)
    }
  }
}
