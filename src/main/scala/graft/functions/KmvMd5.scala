package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Engine-portable KMV sketch kernel: the hash is the first 64 bits of
  * MD5 (big-endian), which DuckDB reproduces exactly as
  * `('0x' || substr(md5(v), 1, 16))::UBIGINT`, and the estimator is the
  * pure-integer form n̂ = ⌊(k−1)·2⁶⁴ / h_(k)⌋ — BigInt here, HUGEINT
  * `//` there — so a sketch built by a typed Aggregator inside Spark
  * streaming state hashes IDENTICALLY to an order-statistics SQL replay.
  * No doubles anywhere in the estimate: the double-rounding seams of
  * unsigned→double conversion (which differ between `long→double` via a
  * flipped key and a direct UBIGINT cast) never arise.
  *
  * Buffers store hashes as sign-bit-flipped longs so signed ascending
  * order IS unsigned ascending order — the same convention works inside
  * `array_sort` on the SQL side when buffers are exposed as columns
  * (q405/q406 sketch algebra: unflip with `+ 2⁶³` in DECIMAL(38,0)).
  *
  * Complements functions.KmvDistinct (FNV+fmix64 — faster, engine-local,
  * spec-pinned): this variant is the one the oracle gate can replay.
  */
object KmvMd5 {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of MD5(UTF-8 bytes), big-endian — raw (unflipped). */
  def hash64(s: String): Long = {
    val d = md5.get()
    d.reset()
    val b = d.digest(s.getBytes(StandardCharsets.UTF_8))
    ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
      ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
      ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
  }

  /** Insert a FLIPPED key into a sorted ≤k buffer (dedups; drops > kth). */
  def insert(buf: Array[Long], key: Long, k: Int): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, key)
    if (pos >= 0) buf
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = key
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = key
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  def merge(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    var out = a
    var i = 0
    while (i < b.length) { out = insert(out, b(i), k); i += 1 }
    out
  }

  /** Exact-integer KMV estimate off a flipped-key buffer: the distinct
    * count if the buffer never filled, else ⌊(k−1)·2⁶⁴ / h_(k)⌋ with
    * h_(k) the unsigned value of the k-th smallest hash. */
  def estimate(buf: Array[Long], k: Int): Long =
    if (buf.length < k) buf.length.toLong
    else {
      val raw = buf(k - 1) ^ Long.MinValue
      val hk = BigInt(java.lang.Long.toUnsignedString(raw)).max(BigInt(1))
      ((BigInt(k - 1) << 64) / hk).toLong
    }
}

/** Distinct-count form: groupBy(...).agg(KmvDistinctMd5.udf(k)(col)). */
case class KmvDistinctMd5(k: Int) extends Aggregator[String, Array[Long], Long] {
  override def zero: Array[Long] = Array.empty
  override def reduce(buf: Array[Long], s: String): Array[Long] =
    if (s == null) buf else KmvMd5.insert(buf, KmvMd5.hash64(s) ^ Long.MinValue, k)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    KmvMd5.merge(a, b, k)
  override def finish(buf: Array[Long]): Long = KmvMd5.estimate(buf, k)
  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object KmvDistinctMd5 {
  def udf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(KmvDistinctMd5(k), Encoders.STRING)
}

/** Buffer form for sketch ALGEBRA: finish emits the sorted flipped-key
  * buffer itself, so set operations (union k-min, Jaccard numerator,
  * difference) run as array expressions over k-sized columns. */
case class KmvBufferMd5(k: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.empty
  override def reduce(buf: Array[Long], s: String): Array[Long] =
    if (s == null) buf else KmvMd5.insert(buf, KmvMd5.hash64(s) ^ Long.MinValue, k)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    KmvMd5.merge(a, b, k)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvBufferMd5 {
  def udf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(KmvBufferMd5(k), Encoders.STRING)
}
