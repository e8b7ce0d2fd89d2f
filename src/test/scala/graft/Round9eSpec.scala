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

  test("q331 equals an imperative sampled-partitioner replay") {
    val rows = Tables.t(spark, TestSpark.Sf, "orders")
      .select($"o_orderkey", $"o_totalprice").as[(Long, Double)]
      .collect().toSeq
      .map { case (k, x) => (k, math.floor(x * 100 + 0.5).toLong) }
    val n = rows.size.toLong
    def h(k: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp|$k".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(8), 16) % 100
    }
    val gridAll = rows.groupBy(_._2).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val expected = Seq(1L, 5L, 10L, 100L).map { r =>
      val samp = rows.filter(rc => h(rc._1) < r).map(_._2)
      val ns = samp.size.toLong
      val sgrid = samp.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var cum = 0L
      val bnds = sgrid.flatMap { case (v, cnt) =>
        val plo = math.min(31L, 32 * cum / ns); cum += cnt
        val phi = math.min(31L, 32 * cum / ns)
        if (phi > plo) Seq(v) ++ Seq.fill((phi - plo - 1).toInt)(v) else Nil
      } // boundary value repeated once per p it serves
      val parts = gridAll.groupBy { case (v, _) =>
        bnds.count(_ <= v) }.view.mapValues(_.map(_._2).sum)
      val maxP = parts.values.max
      (r, ns, parts.size.toLong, maxP, 1000000L * maxP * 32 / n - 1000000L)
    }
    val got = q("q331_sampled_range_partitioner")(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // the exact-boundary floor: sampling can only match or worsen the
    // worst partition at this corpus (spec-observed, replay-backed)
    val byR = got.map(r => r._1 -> r._5).toMap
    assert(byR(100L) <= byR(1L) && byR(100L) <= byR(5L)
      && byR(100L) <= byR(10L))
    assert(got.forall(_._5 >= 0L))
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
