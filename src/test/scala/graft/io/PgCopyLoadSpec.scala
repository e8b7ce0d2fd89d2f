package graft.io

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The COPY write path (K1 mode B) against a recording transport: proves
  * the per-partition transaction protocol (begin → write* → commit, or
  * rollback on failure), the flush batching, and that the streamed bytes
  * are exactly PgCopyText's encoding of every row. */
object PgCopyLoadSpec {
  /** One record of everything a transport saw, keyed by test id so the
    * executor-side fakes and the assertions share state (tests fork one
    * JVM; local[*] executors are in-process). */
  final case class Recorded(begins: java.util.List[String],
                            chunks: java.util.List[Array[Byte]],
                            sideSqls: java.util.List[String],
                            var commits: Int, var rollbacks: Int, var closes: Int)
  val recordings = new ConcurrentHashMap[String, Recorded]()
  def recorded(id: String): Recorded = recordings.computeIfAbsent(id, _ =>
    Recorded(new java.util.concurrent.CopyOnWriteArrayList[String](),
      new java.util.concurrent.CopyOnWriteArrayList[Array[Byte]](),
      new java.util.concurrent.CopyOnWriteArrayList[String](), 0, 0, 0))

  final class FakeTransport(id: String, failOnWrite: Boolean) extends CopyTransport {
    private val r = recorded(id)
    override def begin(copySql: String): Unit = r.begins.add(copySql)
    override def write(bytes: Array[Byte], off: Int, len: Int): Unit = {
      if (failOnWrite) throw new RuntimeException("injected transport failure")
      r.chunks.add(java.util.Arrays.copyOfRange(bytes, off, off + len))
    }
    override def commit(sideSqls: Seq[String]): Unit =
      r.synchronized { r.commits += 1; sideSqls.foreach(r.sideSqls.add) }
    override def rollback(): Unit = r.synchronized { r.rollbacks += 1 }
    override def close(): Unit = r.synchronized { r.closes += 1 }
  }

  final class FakeFactory(id: String, failOnWrite: Boolean = false)
      extends CopyTransportFactory {
    override def open(): CopyTransport = new FakeTransport(id, failOnWrite)
  }
}

class PgCopyLoadSpec extends AnyFunSuite {
  import PgCopyLoadSpec._
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def payload(id: String): String =
    recorded(id).chunks.asScala.map(new String(_, StandardCharsets.UTF_8)).mkString

  test("streams byte-identical COPY text per row, one txn per partition") {
    val df = Seq((1L, Option("a\tb"), true), (2L, None, false), (3L, Option("c\\d"), true))
      .toDF("id", "name", "flag").repartition(2)
    val n = PgCopyLoad.copyInto(df, "t1", new FakeFactory("basic"))
    assert(n == 3L)
    val r = recorded("basic")
    // every non-empty partition: one begin with the right statement
    assert(r.begins.asScala.toSet == Set("""COPY "t1" ("id", "name", "flag") FROM STDIN"""))
    assert(r.commits == r.begins.size && r.rollbacks == 0)
    assert(r.closes == r.begins.size)
    // payload = exactly the PgCopyText encoding of the three rows
    val lines = payload("basic").split("\n", -1).filter(_.nonEmpty).sorted.toSeq
    assert(lines == Seq("1\ta\\tb\tt", "2\t\\N\tf", "3\tc\\\\d\tt"))
  }

  test("flush batching: chunks respect flushBytes, nothing lost") {
    val df = (1 to 200).map(i => (i.toLong, "v" * 50)).toDF("id", "pad").coalesce(1)
    PgCopyLoad.copyInto(df, "t2", new FakeFactory("batch"), flushBytes = 512)
    val r = recorded("batch")
    assert(r.chunks.size > 5, "small flushBytes must force multiple chunks")
    // each flushed chunk stops within one row of the threshold
    assert(r.chunks.asScala.init.forall(c => c.length >= 512 && c.length <= 512 + 64))
    val lines = payload("batch").split("\n", -1).filter(_.nonEmpty)
    assert(lines.length == 200)
    assert(lines.map(_.takeWhile(_ != '\t').toLong).sorted.toSeq == (1L to 200L))
  }

  test("rollback (not commit) on transport failure; job fails") {
    val df = Seq((1L, "x")).toDF("id", "v").coalesce(1)
    intercept[Exception] {
      PgCopyLoad.copyInto(df, "t3", new FakeFactory("fail", failOnWrite = true))
    }
    val r = recorded("fail")
    assert(r.commits == 0)
    assert(r.rollbacks >= 1)       // every attempt rolled back...
    assert(r.closes == r.rollbacks) // ...and closed its connection
  }

  test("empty partitions open no transport") {
    val df = Seq((1L, "x")).toDF("id", "v").repartition(8)
    PgCopyLoad.copyInto(df, "t4", new FakeFactory("sparse"))
    val r = recorded("sparse")
    assert(r.begins.size == 1, "only the non-empty partition may open a connection")
  }

  test("refuses to run under speculative execution (duplicate-load guard)") {
    val on = new org.apache.spark.SparkConf().set("spark.speculation", "true")
    val e = intercept[IllegalArgumentException] { PgCopyLoad.assertNoSpeculation(on) }
    assert(e.getMessage.contains("speculation"))
    PgCopyLoad.assertNoSpeculation(new org.apache.spark.SparkConf()) // default: fine
    // and the live session (speculation off) passes through the guard
    PgCopyLoad.copyInto(Seq((1L, "x")).toDF("id", "v"), "t5", new FakeFactory("spec"))
  }
}
