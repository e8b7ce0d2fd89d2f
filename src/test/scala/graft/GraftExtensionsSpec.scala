package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sorted_long_jaccard is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT sorted_long_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
      .collect().head.getDouble(0)
    assert(r == 0.5)
  }

  test("double_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT double_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
  }

  test("nfc_normalize and strip_accents are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT strip_accents('café') AS s, length(nfc_normalize('é')) AS n")
      .collect().head
    assert(r.getString(0) == "cafe")
    assert(r.getInt(1) == 1)
  }

  test("sorted_long_intersect and the KMV UDAFs are callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT sorted_long_intersect(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS i")
      .collect().head.getLong(0)
    assert(r == 2L)
    // the streaming-state sketch, exposed to plain SQL users: exact
    // below k, so 3 distinct values estimate as exactly 3
    val k = spark.sql(
      "SELECT kmv_distinct_md5_64(x) AS d FROM VALUES ('a'),('b'),('b'),('c') t(x)")
      .collect().head.getLong(0)
    assert(k == 3L)
    val buf = spark.sql(
      "SELECT size(kmv_buffer_md5_256(x)) AS n FROM VALUES ('a'),('b') t(x)")
      .collect().head.getInt(0)
    assert(buf == 2)
  }

  test("the spark.sql.extensions init path exposes the KMV UDAFs too") {
    // r11 ADVICE: the SQL surface diverged by init path — extensions
    // sessions got the expressions but not the KMV aggregates. Build a
    // second session (same context) THROUGH the extensions hook and
    // call every function family from SQL.
    val base = TestSpark.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]").config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions).getOrCreate()
      val k = s2.sql(
        "SELECT kmv_distinct_md5_64(x) AS d FROM VALUES ('a'),('b'),('b'),('c') t(x)")
        .collect().head.getLong(0)
      assert(k == 3L)
      val buf = s2.sql(
        "SELECT size(kmv_buffer_md5_256(x)) AS n FROM VALUES ('a'),('b') t(x)")
        .collect().head.getInt(0)
      assert(buf == 2)
      val j = s2.sql(
        "SELECT sorted_long_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
        .collect().head.getDouble(0)
      assert(j == 0.5)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }
}
