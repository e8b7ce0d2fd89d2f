package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.{TextAnalysis => TA}

/** Behavior pins for the curation-dial battery (q407–q409): the epoch
  * waterfill replayed as a Scala fold, the threshold curve replayed
  * from driver-side candidate pairs, and the IDF-weighted screen
  * replayed from driver-side n-gram sets.
  */
class Round11mSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  test("q407 epoch waterfill equals the value-ordered fold; budget exactly spent") {
    import spark.implicits._
    val src = Tables.t(spark, TestSpark.Sf, "documents")
      .groupBy($"source").agg(
        sum(expr("CAST(n_chars AS BIGINT) div 4")).as("supply"),
        count(lit(1)).as("n_docs"),
        sum(($"lang" === "en").cast("long")).as("n_en"))
      .select($"source", $"supply", expr("n_en * 1000000 div n_docs").as("q_ppm"))
      .as[(String, Long, Long)].collect().toSeq
    val tot = src.map(_._2).sum
    val budget = tot * 2
    val decay = Seq(1L -> 1000000L, 2L -> 750000L, 3L -> 562500L, 4L -> 421875L)
    val units = (for {
      (source, supply, qp) <- src; (e, d) <- decay
    } yield (source, e, qp, qp * d / 1000000, supply))
      .sortBy { case (source, e, _, v, _) => (-v, e, source) }
    var cum = 0L
    val expected = units.map { case (source, e, qp, v, supply) =>
      cum += supply
      val alloc = math.max(0L, math.min(supply, budget - (cum - supply)))
      (source, e, qp, v, supply, alloc, alloc * v / 1000000)
    }
    val got = q("q407_epoch_allocation").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
    assert(got.map(_._6).sum == budget, "waterfill must spend the budget exactly")
    // the planner's point: some 2nd epoch outranks some 1st epoch
    val firstEpochValues = got.filter(_._2 == 1L).map(_._4)
    val secondEpochValues = got.filter(_._2 == 2L).map(_._4)
    assert(secondEpochValues.max > firstEpochValues.min)
  }

  /** Driver-side char-3-gram candidate pairs (q23's blocking). */
  private def driverPairs(): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    val d = Tables.t(spark, TestSpark.Sf, "documents").select(
      $"doc_id", concat($"lang", lit("_"), expr("n_chars div 100")).as("bucket"),
      TA.charNgramInts($"text", 3).as("grams"))
      .as[(Long, String, Seq[Long])].collect().toSeq
    for {
      (ia, ba, ga) <- d; (ib, bb, gb) <- d
      if ba == bb && ia < ib
    } yield {
      val inter = ga.toSet.intersect(gb.toSet).size.toLong
      val uni = ga.size + gb.size - inter
      (ia, ib, 1000000L * inter / uni)
    }
  }

  test("q408 threshold curve equals the driver replay; monotone in tau") {
    val pairs = driverPairs()
    val got = q("q408_dedup_threshold_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._1) == Seq(500000L, 600000L, 700000L, 800000L, 900000L))
    got.foreach { case (tau, np, ndocs) =>
      val hits = pairs.filter(_._3 >= tau)
      assert(np == hits.size.toLong, s"tau $tau n_pairs")
      assert(ndocs == hits.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong,
        s"tau $tau n_docs_flagged")
    }
    assert(got.map(_._2) == got.map(_._2).sortBy(-_), "pairs monotone in tau")
    assert(got.map(_._3) == got.map(_._3).sortBy(-_), "docs monotone in tau")
  }

  test("q409 IDF screen equals the driver replay; rarity floor holds") {
    import spark.implicits._
    val grams = Tables.t(spark, TestSpark.Sf, "documents")
      .select($"doc_id", split(TA.normText($"text"), " ").as("a"))
      .filter(size($"a") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(a) - 2), j -> array_join(slice(a, j, 3), ' '))"))
        .as("ngram"))
      .distinct().as[(Long, String)].collect().toSeq
    val corpus = grams.filter(_._1 % 97 != 0)
    val ev = grams.filter(_._1 % 97 == 0)
    val nCorpus = corpus.map(_._1).distinct.size.toLong
    val dfm = corpus.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val evByGram = ev.groupBy(_._2)
    val expected = corpus.flatMap { case (did, g) =>
      evByGram.getOrElse(g, Nil).map { case (eid, _) => ((did, eid), g) }
    }.groupBy(_._1).map { case ((did, eid), gs) =>
      (did, eid, gs.size.toLong, gs.map(x => nCorpus * 1000000L / dfm(x._2)).sum)
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = q("q409_idf_contamination").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // every shared gram scores at least 1e6 micro (df <= n_corpus)
    got.foreach { case (_, _, ns, score) => assert(score >= ns * 1000000L) }
  }
}
