package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator —
  * the mergeable-sketch shape (reduce into a bounded buffer, merge
  * buffers associatively, estimate at finish) that map-side combines and
  * shuffles O(k) per group regardless of input size. The custom-aggregate
  * path complements the built-in approx_count_distinct (HLL++): KMV
  * buffers are trivially mergeable across engines/files and support set
  * operations on sketches.
  *
  * Estimator: with the k smallest of n uniform hashes in [0,1), the k-th
  * smallest r_k ≈ k/(n+1), so n̂ = (k-1)/r_k (the unbiased KMV form).
  */
case class KmvDistinct(k: Int) extends Aggregator[String, Array[Long], Long] {

  private def hash64(s: String): Long = {
    // FNV-1a 64-bit + murmur fmix64 finalizer: raw FNV is visibly
    // non-uniform on very short strings (KMV needs uniform order stats)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** buffer = sorted array (ascending, unsigned order) of ≤ k minimal
    * distinct hashes */
  override def zero: Array[Long] = Array.empty

  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    val key = h ^ Long.MinValue // flip sign bit → unsigned order as signed
    val pos = java.util.Arrays.binarySearch(buf, key)
    if (pos >= 0) buf // already present
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

  override def reduce(buf: Array[Long], s: String): Array[Long] =
    if (s == null) buf else insert(buf, hash64(s))

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var out = a
    var i = 0
    while (i < b.length) { out = insert(out, b(i) ^ Long.MinValue); i += 1 }
    out
  }

  override def finish(buf: Array[Long]): Long =
    if (buf.length < k) buf.length.toLong
    else {
      val rk = (buf(k - 1).toDouble - Long.MinValue.toDouble) / math.pow(2, 64)
      math.round((k - 1) / rk)
    }

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object KmvDistinct {
  /** DataFrame-API form: `df.groupBy(...).agg(KmvDistinct.udf(256)(col))`. */
  def udf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(KmvDistinct(k), Encoders.STRING)
}
