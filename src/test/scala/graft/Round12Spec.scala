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

  // ----- distribution-drift monitors (q417–q419) ------------------------
  // Reference implementation: the same definitions computed directly in
  // Scala over the collected (parity, n_chars) pairs, with the SAME
  // IEEE chains — asserted EXACTLY (integers/BigInt and bit-equal
  // doubles), not approximately.

  private lazy val lens: Seq[(Boolean, Long)] = {
    import spark.implicits._
    Tables.t(spark, TestSpark.Sf, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toSeq
      .map { case (id, v) => (id % 2 == 0, v) }
  }

  private lazy val refDrift: (Long, Long, Seq[(Long, BigInt, BigInt, BigInt)]) = {
    val na = lens.count(_._1).toLong
    val nb = lens.size - na
    val grid = lens.groupBy(_._2).toSeq.sortBy(_._1).map { case (v, rs) =>
      (v, rs.count(_._1).toLong, rs.count(!_._1).toLong)
    }
    var (ca, cb) = (BigInt(0), BigInt(0))
    val cums = grid.map { case (v, a, b) =>
      ca += a; cb += b; (v, ca, cb, ca + cb)
    }
    (na, nb, cums)
  }

  test("q417 KS equals the direct computation exactly") {
    val (na, nb, cums) = refDrift
    val dnum = cums.map { case (_, ca, cb, _) => (ca * nb - cb * na).abs }.max
    val d = dnum.toDouble / (na.toDouble * nb.toDouble)
    val ks = math.sqrt(na.toDouble * nb.toDouble / (na + nb).toDouble) * d
    val r = q("q417_ks_two_sample").collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == na && r.head.getLong(1) == nb)
    assert(BigInt(r.head.getDecimal(2).toBigInteger) == dnum)
    assert(r.head.getDouble(3) == d && r.head.getDouble(4) == ks)
  }

  test("q418 Wasserstein-1 equals the direct computation exactly") {
    val (na, nb, cums) = refDrift
    val w1num = cums.sliding(2).collect { case Seq((v1, ca, cb, _), (v2, _, _, _)) =>
      (ca * nb - cb * na).abs * (v2 - v1)
    }.sum
    val w1 = w1num.toDouble / (na.toDouble * nb.toDouble)
    val r = q("q418_wasserstein_drift").collect()
    assert(r.length == 1)
    assert(BigInt(r.head.getDecimal(2).toBigInteger) == w1num)
    assert(r.head.getDouble(3) == w1)
  }

  test("q419 PSI equals the direct computation exactly") {
    val (na, nb, cums) = refDrift
    val nt = BigInt(na + nb)
    val byBin = cums.zip(
        cums.map { case (_, _, _, cp) => ((cp - 1) * 10 / nt).toLong })
      .groupBy(_._2)
    val grid = lens.groupBy(_._2)
    val bins = byBin.toSeq.sortBy(_._1).map { case (bin, vs) =>
      val a = vs.map { case ((v, _, _, _), _) => grid(v).count(_._1).toLong }.sum
      val b = vs.map { case ((v, _, _, _), _) => grid(v).count(!_._1).toLong }.sum
      (bin, a, b)
    }
    val psi = bins.foldLeft(0.0) { case (acc, (_, a, b)) =>
      if (a == 0 || b == 0) acc
      else {
        val pa = a.toDouble / na.toDouble
        val pb = b.toDouble / nb.toDouble
        acc + (pa - pb) * math.log(pa / pb)
      }
    }
    val used = bins.count { case (_, a, b) => a > 0 && b > 0 }.toLong
    val r = q("q419_psi_deciles").collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == na && r.head.getLong(1) == nb)
    assert(r.head.getLong(2) == bins.size.toLong)
    assert(r.head.getLong(3) == used)
    assert(r.head.getDouble(4) == psi)
  }

  test("drift sanity: the sup term is priced into the transport sum") {
    // law by construction: d_num <= w1_num when every grid gap >= 1
    // (integer lengths) and the sup row is not the last grid value
    val (na, nb, cums) = refDrift
    if (cums.size >= 2) {
      val dnum = cums.map { case (_, ca, cb, _) => (ca * nb - cb * na).abs }.max
      val w1num = cums.sliding(2).collect {
        case Seq((v1, ca, cb, _), (v2, _, _, _)) =>
          (ca * nb - cb * na).abs * (v2 - v1)
      }.sum
      // the sup term appears in the sum unless it is the LAST grid row
      val lastIsSup =
        (cums.last._2 * nb - cums.last._3 * na).abs == dnum
      assert(lastIsSup || w1num >= dnum)
    }
  }
}
