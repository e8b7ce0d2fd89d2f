package graft

import org.apache.spark.sql.{Encoders, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.encoders.encoderFor
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.execution.aggregate.ScalaAggregator

import graft.functions.{DoubleDot, GopherTextStats, KmvBufferMd5, KmvDistinctMd5, NfcNormalize, SortedLongIntersect, SortedLongJaccard, StripAccents, WordStopStats}

/** SparkSessionExtensions entry point: registers the library's custom
  * Catalyst expressions for SQL use.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions). ...
  * or spark.sql.extensions=graft.GraftExtensions, or
  * `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.sortedLongJaccardFn)
    e.injectFunction(GraftExtensions.sortedLongIntersectFn)
    e.injectFunction(GraftExtensions.doubleDotFn)
    e.injectFunction(GraftExtensions.nfcNormalizeFn)
    e.injectFunction(GraftExtensions.stripAccentsFn)
    e.injectFunction(GraftExtensions.kmvDistinctFn)
    e.injectFunction(GraftExtensions.kmvBufferFn)
    e.injectFunction(GraftExtensions.wordStopStatsFn)
    e.injectFunction(GraftExtensions.gopherTextStatsFn)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private def buildJaccard(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "sorted_long_jaccard(arrayA, arrayB)")
    SortedLongJaccard(exprs(0), exprs(1))
  }

  private def buildIntersect(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "sorted_long_intersect(arrayA, arrayB)")
    SortedLongIntersect(exprs(0), exprs(1))
  }

  private def buildDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "double_dot(arrayA, arrayB)")
    DoubleDot(exprs(0), exprs(1))
  }

  private def buildNfc(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "nfc_normalize(str)")
    NfcNormalize(exprs(0))
  }

  private def buildStrip(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "strip_accents(str)")
    StripAccents(exprs(0))
  }

  // the KMV Aggregators as catalog-registrable AggregateFunctions — the
  // same ScalaAggregator the udf-registry path builds, constructed
  // directly so the spark.sql.extensions init path exposes the SAME SQL
  // surface as GraftExtensions.register (r11 ADVICE: the two paths had
  // diverged — expressions-only via extensions, KMV only via register)
  private def buildKmvDistinct(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "kmv_distinct_md5_64(stringCol)")
    val agg = KmvDistinctMd5(64)
    ScalaAggregator(exprs, agg, encoderFor(Encoders.STRING),
      encoderFor(agg.bufferEncoder), nullable = true,
      isDeterministic = true, aggregatorName = Some("kmv_distinct_md5_64"))
  }

  // the fused text kernels take their stop set as a PLAN-TIME literal
  // (a Java array baked into the generated code), so the SQL forms are
  //   word_stop_stats(text)              -- canonical Gopher stop set
  //   word_stop_stats(text, array('the', ...))  -- explicit, foldable
  // and a non-foldable second argument fails at plan time with a clear
  // message instead of silently evaluating per row
  private def literalStops(e: Expression, fname: String): Seq[String] = {
    val isStringArray = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    require(e.foldable && isStringArray,
      s"$fname stop set must be a literal array<string>, got ${e.sql}")
    val arr = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  private def buildWordStop(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1 || exprs.length == 2,
      "word_stop_stats(text[, stops])")
    val stops = if (exprs.length == 2) literalStops(exprs(1), "word_stop_stats")
      else GopherTextStats.GopherStops
    WordStopStats(exprs(0), stops)
  }

  private def buildGopher(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1 || exprs.length == 2,
      "gopher_text_stats(text[, stops])")
    val stops = if (exprs.length == 2) literalStops(exprs(1), "gopher_text_stats")
      else GopherTextStats.GopherStops
    GopherTextStats(exprs(0), stops)
  }

  private def buildKmvBuffer(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "kmv_buffer_md5_256(stringCol)")
    val agg = KmvBufferMd5(256)
    ScalaAggregator(exprs, agg, encoderFor(Encoders.STRING),
      encoderFor(agg.bufferEncoder), nullable = true,
      isDeterministic = true, aggregatorName = Some("kmv_buffer_md5_256"))
  }

  val sortedLongJaccardFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_long_jaccard"),
    new ExpressionInfo(classOf[SortedLongJaccard].getName, "sorted_long_jaccard"),
    buildJaccard _)

  val sortedLongIntersectFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_long_intersect"),
    new ExpressionInfo(classOf[SortedLongIntersect].getName, "sorted_long_intersect"),
    buildIntersect _)

  val doubleDotFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("double_dot"),
    new ExpressionInfo(classOf[DoubleDot].getName, "double_dot"),
    buildDot _)

  val nfcNormalizeFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    buildNfc _)

  val stripAccentsFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("strip_accents"),
    new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
    buildStrip _)

  val kmvDistinctFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_distinct_md5_64"),
    new ExpressionInfo(classOf[KmvDistinctMd5].getName, "kmv_distinct_md5_64"),
    buildKmvDistinct _)

  val kmvBufferFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_buffer_md5_256"),
    new ExpressionInfo(classOf[KmvBufferMd5].getName, "kmv_buffer_md5_256"),
    buildKmvBuffer _)

  val wordStopStatsFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_stop_stats"),
    new ExpressionInfo(classOf[WordStopStats].getName, "word_stop_stats"),
    buildWordStop _)

  val gopherTextStatsFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("gopher_text_stats"),
    new ExpressionInfo(classOf[GopherTextStats].getName, "gopher_text_stats"),
    buildGopher _)

  /** Register on an already-built session (tests, shells). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_long_jaccard", buildJaccard, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_long_intersect", buildIntersect, "built-in")
    // the portable KMV sketch aggregators (UDAFs register through the
    // udf registry, not the expression registry)
    spark.udf.register("kmv_distinct_md5_64",
      org.apache.spark.sql.functions.udaf(
        graft.functions.KmvDistinctMd5(64), org.apache.spark.sql.Encoders.STRING))
    spark.udf.register("kmv_buffer_md5_256",
      org.apache.spark.sql.functions.udaf(
        graft.functions.KmvBufferMd5(256), org.apache.spark.sql.Encoders.STRING))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "double_dot", buildDot, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", buildNfc, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "strip_accents", buildStrip, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_stop_stats", buildWordStop, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gopher_text_stats", buildGopher, "built-in")
  }
}
