package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavior pins for the Round7b operators beyond the oracle gate. */
class Round7bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ----- q174 winnowing ------------------------------------------------

  /** Reference winnowing over one token array, straight from the paper:
    * hash 3-gram shingles, slide a w=4 window, keep the rightmost minimal
    * hash per window, distinct selections. Used to pin the windowed-SQL
    * formulation against an independent imperative form.
    */
  private def winnowReference(tokens: Seq[String]): Set[(Long, Long)] = {
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    }
    val grams = tokens.sliding(3).map(_.mkString(" ")).toIndexedSeq
    val hs = grams.map(h32)
    (0 to hs.length - 4).flatMap { i =>
      val win = hs.slice(i, i + 4)
      val hmin = win.min
      val sel = (i until i + 4).filter(p => hs(p) == hmin).max // rightmost min
      Some((sel + 1).toLong -> hs(sel)) // 1-based positions like the query
    }.toSet
  }

  test("q174 windowed selection matches the paper's imperative winnowing") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"))
    val df = texts.toDF("doc_id", "text")
    df.createOrReplaceTempView("round7b_docs")
    val got = spark.sql(
      """SELECT doc_id, j, h FROM (
           SELECT doc_id, j,
             conv(substring(md5(array_join(slice(a, j, 3), ' ')), 1, 8), 16, 10) AS h
           FROM (SELECT doc_id, split(text, ' ') AS a FROM round7b_docs)
           LATERAL VIEW explode(sequence(1, size(a) - 2)) t AS j)""")
    // re-derive the selection exactly as the operator does
    val M = 1048576L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"j").rowsBetween(0, 3)
    val sel = got.withColumn("h", $"h".cast("long"))
      .withColumn("vmin", min($"h" * M + (lit(M - 1) - $"j")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter($"cnt" === 4)
      .select($"doc_id", (lit(M - 1) - ($"vmin" % M)).as("selpos"),
        expr(s"vmin div $M").as("selh"))
      .distinct().collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(r => (r.getLong(1), r.getLong(2))).toSet }
    for ((id, text) <- texts) {
      assert(sel(id) == winnowReference(text.split(" ").toIndexedSeq),
        s"winnowing selection diverged for doc $id")
    }
  }

  test("q174 shared runs of >= w+k-1 tokens share a fingerprint (the paper's guarantee)") {
    val common = "one two three four five six seven eight nine ten"
    val df = Seq(
      (1L, s"prefix words here $common trailing bits"),
      (2L, s"totally different start $common and another ending")).toDF("doc_id", "text")
    val byDoc = SparkEntry.queries("q174_winnowing")(spark, TestSpark.Sf) // smoke the entry
    assert(byDoc.columns.toSeq ==
      Seq("doc_id", "n_grams", "n_fp", "fp_hash_sum", "fp_density_micro"))
    // direct guarantee check on the constructed pair via the reference impl
    val f1 = winnowReference(df.collect()(0).getString(1).split(" ").toIndexedSeq).map(_._2)
    val f2 = winnowReference(df.collect()(1).getString(1).split(" ").toIndexedSeq).map(_._2)
    assert((f1 intersect f2).nonEmpty,
      "documents sharing a 10-token run selected disjoint fingerprints")
  }

  // ----- q175 source leakage matrix ------------------------------------

  test("q175 pair accounting matches brute-force pair enumeration") {
    val rows = SparkEntry.queries("q175_source_leakage")(spark, TestSpark.Sf).collect()
    // brute force: enumerate every duplicate pair directly and tally
    val docs = Tables.t(spark, TestSpark.Sf, "documents")
      .select($"doc_id", $"source",
        md5(array_join(slice(split(graft.ext.TextAnalysis.normText($"text"), " "), 1, 10), " ")).as("ck"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byCk = docs.groupBy(_._3).values.filter(_.length > 1)
    val expected: Map[(String, String), Long] = byCk.toSeq.flatMap { members =>
      members.toSeq.sortBy(_._1).combinations(2).map { pair =>
        val srcs = pair.map(_._2).sorted
        (srcs(0), srcs(1))
      }
    }.groupBy(p => p).map { case (k, v) => k -> v.size.toLong }
    val got = rows.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_pairs")).toMap
    assert(got == expected, s"pair matrix mismatch: got $got expected $expected")
    assert(rows.forall(r => r.getString(0) <= r.getString(1)),
      "matrix emitted an unordered (source_a, source_b) cell")
  }

  // ----- q176 FD discovery ----------------------------------------------

  test("q176 reports the key FD as violation-free and bounds all counts") {
    val rows = SparkEntry.queries("q176_fd_discovery")(spark, TestSpark.Sf).collect()
    assert(rows.length == 4)
    val byFd = rows.map(r => r.getString(0) -> r).toMap
    // p_partkey is the PK: it MUST determine p_brand exactly
    val pk = byFd("part: p_partkey -> p_brand")
    assert(pk.getAs[Long]("violating_groups") == 0L && pk.getAs[Long]("max_rhs_card") == 1L)
    rows.foreach { r =>
      assert(r.getAs[Long]("violating_groups") <= r.getAs[Long]("lhs_groups"))
      assert(r.getAs[Long]("violation_micro") <= 1000000L)
    }
  }

  // ----- q179 blocking recall audit ------------------------------------

  test("q179 provenance cells partition the union and match per-blocker totals") {
    val rows = SparkEntry.queries("q179_blocking_recall")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    // no cell may carry the all-zero bitmap, and cells are distinct
    assert(rows.forall(r => r.getLong(0) + r.getLong(1) + r.getLong(2) > 0))
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).distinct.length == rows.length)
    // per-blocker totals recomputed from the cells must equal a direct
    // single-blocker pair count (independent re-derivation for prefix)
    val prefixFromCells = rows.filter(_.getLong(0) == 1L).map(_.getAs[Long]("n_pairs")).sum
    val direct = Tables.t(spark, TestSpark.Sf, "documents")
      .select($"doc_id",
        md5(array_join(slice(split(graft.ext.TextAnalysis.normText($"text"), " "), 1, 10), " ")).as("k"))
      .groupBy($"k").count().filter($"count" > 1)
      .select(expr("sum(count * (count - 1) div 2)")).collect()(0).getLong(0)
    assert(prefixFromCells == direct,
      s"prefix-blocker pairs from cells ($prefixFromCells) != direct count ($direct)")
  }

  // ----- q180 grouped k-fold -------------------------------------------

  test("q180 group-keyed folding has structurally zero leakage; doc-keyed leaks") {
    val rows = SparkEntry.queries("q180_grouped_kfold")(spark, TestSpark.Sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val grp = rows("group_hash"); val doc = rows("doc_hash")
    assert(grp.getAs[Long]("leaky_pairs") == 0L,
      "cluster-keyed folds split a duplicate cluster")
    assert(grp.getAs[Long]("dup_pairs") == doc.getAs[Long]("dup_pairs"),
      "dup-pair universe must be scheme-independent")
    if (doc.getAs[Long]("dup_pairs") > 0)
      assert(doc.getAs[Long]("leaky_pairs") > 0,
        "doc-hash folding should scatter at least one duplicate pair at this SF")
    Seq(grp, doc).foreach { r =>
      assert(r.getAs[Long]("fold_min_docs") <= r.getAs[Long]("fold_max_docs"))
    }
  }

  // ----- q181 effective tokens -----------------------------------------

  test("q181 deflation never exceeds unity and unique docs keep full weight") {
    val rows = SparkEntry.queries("q181_effective_tokens")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val defl = r.getAs[Long]("deflation_micro")
      assert(defl > 0 && defl <= 1000000L, s"deflation out of range: $defl")
      assert(r.getAs[Long]("eff_tokens_micro") <= 1000000L * r.getAs[Long]("raw_tokens"))
    }
  }

  // ----- q178 class rebalance ------------------------------------------

  test("q178 every class is cut to exactly the minority-class size") {
    val rows = SparkEntry.queries("q178_class_rebalance")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val kmin = rows.map(_.getAs[Long]("n_orig")).min
    assert(rows.forall(_.getAs[Long]("n_kept") == kmin),
      "a class was not downsampled to the minority count")
    assert(rows.exists(r => r.getAs[Long]("n_orig") > r.getAs[Long]("n_kept")) ||
      rows.forall(r => r.getAs[Long]("n_orig") == kmin),
      "rebalance changed nothing despite imbalanced classes")
  }
}
