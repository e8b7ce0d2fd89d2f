package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavior pins for the migration-audit battery (q412–q414): a
  * driver-side replay of one FK edge and one column per audit, the
  * cross-audit integrity laws, and a positive-control check that the
  * NUL / non-ASCII detectors actually fire (the corpus itself is
  * clean, so a zero there must mean "measured clean", not "dead
  * code").
  */
class Round11oSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  test("q412 orphan audit replays the orders->customer edge; laws hold") {
    import spark.implicits._
    val rows = q("q412_fk_orphan_audit").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"${r.getString(0)}: more keys than rows")
      assert(r.getLong(3) <= r.getLong(2), s"${r.getString(0)}: more orphan keys than keys")
      assert(r.getLong(4) >= r.getLong(3), s"${r.getString(0)}: orphan rows < orphan keys")
    }
    val cust = Tables.t(spark, TestSpark.Sf, "customer")
      .select($"c_custkey").as[Long].collect().toSet
    val ordKeys = Tables.t(spark, TestSpark.Sf, "orders")
      .select($"o_custkey").as[Long].collect()
    val edge = rows.find(_.getString(0) == "orders.o_custkey->customer").get
    assert(edge.getLong(1) == ordKeys.length.toLong)
    assert(edge.getLong(2) == ordKeys.distinct.length.toLong)
    assert(edge.getLong(4) == ordKeys.count(k => !cust.contains(k)).toLong)
  }

  test("q413 digit envelope replays customer.c_acctbal") {
    import spark.implicits._
    val xs = Tables.t(spark, TestSpark.Sf, "customer")
      .select($"c_acctbal").as[Double].collect()
    val row = q("q413_numeric_width_audit").collect()
      .find(_.getString(0) == "customer.c_acctbal").get
    assert(row.getLong(1) == xs.length.toLong)
    assert(row.getLong(3) == xs.count(_ < 0).toLong)
    assert(row.getLong(4) ==
      xs.map(x => math.floor(math.abs(x)).toLong.toString.length.toLong).max)
    assert(row.getLong(5) == xs.count(x => math.abs(x) >= 1e10).toLong)
  }

  test("q414 width audit replays customer.c_name; detectors fire on dirty rows") {
    import spark.implicits._
    val names = Tables.t(spark, TestSpark.Sf, "customer")
      .select($"c_name").as[String].collect()
    val row = q("q414_string_width_audit").collect()
      .find(_.getString(0) == "customer.c_name").get
    assert(row.getLong(1) == names.length.toLong)
    assert(row.getLong(3) == names.map(_.length.toLong).max)
    // positive control: the same detector expressions on planted hazards
    val dirty = Seq("clean", "nul\u0000inside", "accént", "ü\u0000")
      .toDF("x")
    val d = dirty.agg(
      sum($"x".rlike("[^\\x00-\\x7F]").cast("long")).as("non_ascii"),
      sum((instr($"x", "\u0000") > 0).cast("long")).as("with_nul"))
      .head()
    assert(d.getLong(0) == 2L, "non-ASCII detector missed planted rows")
    assert(d.getLong(1) == 2L, "NUL detector missed planted rows")
  }
}
