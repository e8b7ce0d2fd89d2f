package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PaginationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageCount math (root.go:373-381): ceil, and ≥1 page always") {
    assert(Pagination.pageCount(0, 100) == 1)
    assert(Pagination.pageCount(1, 100) == 1)
    assert(Pagination.pageCount(100, 100) == 1)
    assert(Pagination.pageCount(101, 100) == 2)
    assert(Pagination.pageCount(250, 100) == 3)
  }

  test("rangePredicates cover [min,max] with no gaps or overlaps, tagged") {
    val tagged = Pagination.rangePredicates("id", 0, 999, 4)
    // every page predicate carries the kill marker (root.go:394)
    assert(tagged.forall(_.startsWith(Pagination.SqlTag)))
    val preds = tagged.map(_.stripPrefix(Pagination.SqlTag).trim)
    assert(preds.length == 4)
    assert(preds.head.startsWith("id >= 0"))
    assert(preds.last == "id >= 750 AND id <= 999")
    // every value 0..999 matched by exactly one predicate
    val ranges = preds.map { p =>
      val nums = "\\d+".r.findAllIn(p).map(_.toLong).toSeq
      (nums(0), nums(1))
    }
    (0L to 999L).foreach { v =>
      val hits = ranges.zipWithIndex.count { case ((lo, hi), i) =>
        v >= lo && (if (i == ranges.length - 1) v <= hi else v < hi)
      }
      assert(hits == 1, s"value $v matched $hits predicates")
    }
  }

  test("deferredJoinPageSql emits the reference's page SQL shape (root.go:382)") {
    val sqls = Pagination.deferredJoinPageSql("t", Seq("a", "b"), 100, 250)
    assert(sqls.length == 3)
    assert(sqls(1) == s"SELECT ${Pagination.SqlTag} t.* FROM (SELECT a,b FROM t ORDER BY a,b " +
      "LIMIT 100,100) temp LEFT JOIN t t ON temp.a = t.a and temp.b = t.b")
    // every page SQL carries the kill-marker tag (root.go:394)
    assert(sqls.forall(_.contains("gomysql2pgspark")))
  }

  test("deferredJoinPage returns exactly rows [offset, offset+n) in PK order") {
    val df = (1 to 57).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val page = Pagination.deferredJoinPage(df, Seq("id"), 20, 10)
      .orderBy("id").select("id").as[Long].collect()
    assert(page.toSeq == (21L to 30L))
    // final partial page
    val tail = Pagination.deferredJoinPage(df, Seq("id"), 50, 10)
      .orderBy("id").select("id").as[Long].collect()
    assert(tail.toSeq == (51L to 57L))
  }
}
