package graft.transform

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ValueTransformsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("geomHex strips the 8-hex-char SRID prefix (root.go:437-438)") {
    // bytes 00 00 00 01 AB CD → hex "00000001abcd" → strip 8 → "abcd"
    val df = Seq(Array[Byte](0, 0, 0, 1, 0xab.toByte, 0xcd.toByte)).toDF("g")
    assert(df.select(ValueTransforms.geomHex($"g")).as[String].head() == "abcd")
  }

  test("bitHex strips the first hex char so bit(1) is one digit (root.go:439-440)") {
    val df = Seq(Array[Byte](1)).toDF("b")
    assert(df.select(ValueTransforms.bitHex($"b")).as[String].head() == "1")
    val df2 = Seq(Array[Byte](0xff.toByte)).toDF("b")
    assert(df2.select(ValueTransforms.bitHex($"b")).as[String].head() == "f")
  }

  test("scrubNul removes U+0000, hasNul detects it (root.go:450-470)") {
    val df = Seq("a\u0000b\u0000", "clean").toDF("s")
    assert(df.select(ValueTransforms.scrubNul($"s")).as[String].collect().toSeq
      == Seq("ab", "clean"))
    assert(df.select(ValueTransforms.hasNul($"s")).as[Boolean].collect().toSeq
      == Seq(true, false))
  }

  test("lowercaseColumns folds names like PG (root.go:326-330)") {
    val df = Seq((1, "x")).toDF("ID", "TxT")
    assert(ValueTransforms.lowercaseColumns(df).columns.toSeq == Seq("id", "txt"))
  }

  test("scrubNulAll + nulStats count affected values per column") {
    val df = Seq(("a\u0000", "ok", 1), ("b", "c\u0000d", 2)).toDF("x", "y", "n")
    val stats = ValueTransforms.nulStats(df).collect().head
    assert(stats.getLong(0) == 1L && stats.getLong(1) == 1L)
    val scrubbed = ValueTransforms.scrubNulAll(df)
    assert(scrubbed.select("x").as[String].collect().toSeq == Seq("a", "b"))
  }
}
