package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{TextAnalysis => TA}

/** Behavior pins for the production threshold sweep (q416): its counts
  * must agree with q411's measured-LSH side cut for cut (same candidate
  * space, same verify), stay dominated by the brute-force all-pairs
  * curve at every τ (banding only loses), and respect the internal
  * sweep laws (monotone in τ, flagged-doc bounds).
  */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private val Taus = Seq(500000L, 600000L, 700000L, 800000L, 900000L)

  private lazy val got: Map[Long, (Long, Long)] =
    q("q416_threshold_sweep_lsh").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("q416 pair counts equal q411's measured LSH side at every cut") {
    val lsh411 = q("q411_lsh_recall_curve").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // (tau, n_lsh)
    Taus.foreach { t =>
      assert(got(t)._1 == lsh411(t),
        s"q416 and q411 disagree on the banded pair count at tau=$t")
    }
  }

  test("q416 is dominated by the brute-force all-pairs curve (banding only loses)") {
    import spark.implicits._
    val sets = Tables.t(spark, TestSpark.Sf, "documents")
      .select($"doc_id",
        graft.functions.WordShingleHash32(TA.normText($"text"), 3))
      .as[(Long, Seq[Long])].collect().toSeq.map { case (i, g) => (i, g.toSet) }
    val brute = (for {
      (ia, ga) <- sets; (ib, gb) <- sets if ia < ib
      inter = ga.intersect(gb).size.toLong
      j = 1000000L * inter / (ga.size + gb.size - inter)
    } yield (ia, ib, j)).filter(_._3 >= 500000L)
    Taus.foreach { t =>
      val exact = brute.count(_._3 >= t).toLong
      assert(got(t)._1 <= exact, s"LSH sweep exceeds the enumeration at tau=$t")
    }
    // the corpus must actually exercise the sweep: at least one cut
    // with survivors, else the dominance pins are vacuous
    assert(got(500000L)._1 > 0L, "sweep found no pairs at the loosest cut")
  }

  test("q416 internal sweep laws: monotone in tau, doc-flag bounds") {
    Taus.sliding(2).foreach { case Seq(a, b) =>
      assert(got(a)._1 >= got(b)._1, s"n_pairs not monotone between $a and $b")
      assert(got(a)._2 >= got(b)._2, s"n_docs not monotone between $a and $b")
    }
    Taus.foreach { t =>
      val (p, d) = got(t)
      if (p > 0) assert(d >= 2 && d <= 2 * p,
        s"flagged docs outside [2, 2*pairs] at tau=$t")
      else assert(d == 0L)
    }
  }
}
