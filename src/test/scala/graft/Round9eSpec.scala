package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Round9eQueries

/** Behavior pins for the Round-9 batch-5 operators (q331–q333): the
  * partition plan replayed from sorted values, Kaplan–Meier recomputed
  * user-by-user with explicit censoring, and the postings budget
  * rebuilt from per-token sorted gap lists.
  */
class Round9eSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(name: String) =
    Round9eQueries.queries.collectFirst { case (`name`, fn, _) => fn }.get

  private def normText(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9\\s]", "").replaceAll("\\s+", " ").trim

  test("q331 equals an imperative equi-depth plan; counts cover n exactly") {
    val vs = Tables.t(spark, TestSpark.Sf, "orders")
      .select($"o_totalprice").as[Double].collect().toSeq
      .map(x => math.floor(x * 100 + 0.5).toLong)
    val n = vs.size.toLong
    val grid = vs.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    var below = 0L
    val assigned = grid.map { case (v, cnt) =>
      val pid = below * 32 / n; below += cnt; (pid, v, cnt)
    }
    val expected = assigned.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (pid, g) =>
        val rows = g.map(_._3).sum
        (pid, g.map(_._2).min, rows, g.size.toLong,
          1000000L * rows / n, 1000000L * rows * 32 / n - 1000000L)
      }
    val got = q("q331_range_partition_plan")(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._3).sum == n) // partitions cover every row once
    // boundaries strictly increase with pid
    assert(got.sliding(2).forall(w => w.head._2 < w.last._2))
  }

  test("q332 equals an imperative KM replay with explicit censoring") {
    val evs = Tables.t(spark, TestSpark.Sf, "events")
      .select($"user_id", $"event_type",
        unix_micros($"ts".cast("timestamp")))
      .as[(Long, String, Long)].collect().toSeq
    val th = evs.map(_._3).max
    val byU = evs.groupBy(_._1)
    val day = 86400000000L
    val uu = byU.values.toSeq.flatMap { g =>
      g.filter(_._2 == "signup").map(_._3).minOption.map { t1 =>
        val tp = g.filter(e => e._2 == "purchase" && e._3 > t1)
          .map(_._3).minOption
        tp match {
          case Some(t) => (1L, (t - t1) / day)
          case None => (0L, (th - t1) / day)
        }
      }
    }
    val grid = uu.groupBy(_._2).toSeq.sortBy(_._1).map { case (d, g) =>
      (d, g.count(_._1 == 1L).toLong, g.size.toLong)
    }
    def lnm(x: Long): Long =
      math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong
    var cum = 0L
    val expected = grid.map { case (d, de, tot) =>
      val risk = grid.filter(_._1 >= d).map(_._3).sum
      (d, de, risk)
    }.filter(_._2 > 0).map { case (d, de, risk) =>
      if (risk != de) cum += lnm(risk - de) - lnm(risk)
      (d, risk, de, 1000000L * de / risk, cum)
    }
    val got = q("q332_kaplan_meier")(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // survival only decays: the cumulative log is non-increasing
    assert(got.sliding(2).forall(w => w.head._5 >= w.last._5))
    // at-risk only shrinks over time
    assert(got.sliding(2).forall(w => w.head._2 >= w.last._2))
  }

  test("q333 equals an imperative postings-gap bit count") {
    val st = Tables.t(spark, TestSpark.Sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .flatMap { case (id, t) =>
        normText(t).split(" ").filter(_.nonEmpty).distinct.map(tok => (tok, id))
      }.distinct
    val lists = st.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val allBits = lists.values.toSeq.flatMap { ds =>
      (Seq(-1L) ++ ds).sliding(2).map { case Seq(a, b) => bits(b - a) }.toSeq
    }
    val nPost = st.size.toLong
    val binBits = allBits.sum
    val gammaBits = allBits.map(_ * 2 - 1).sum
    val got = q("q333_postings_budget")(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((nPost, lists.size.toLong, binBits, gammaBits,
      64L * nPost, 1000000L * gammaBits / (64L * nPost))))
    // delta-gamma must genuinely compress vs raw 64-bit postings
    assert(got._4 < got._5)
  }
}
