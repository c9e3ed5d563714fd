package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Distributed MinHash sketch as a typed `Aggregator`: input rows are
  * 32-bit shingle hashes (TextFunctions.hex32), the buffer is the
  * running element-wise minimum of the k permuted hashes, and merges
  * are element-wise mins — associative + commutative, so Spark computes
  * it with map-side partial aggregation: each partition ships one
  * k-long array per group key, never the shingles. That is the whole
  * point of a sketch at 100 TB — the shuffle carries O(k) per document,
  * not O(shingles).
  *
  * Permutation p maps hash h to ((2p+1)*h + p*p+7) mod MinhashPrime —
  * identical to TextFunctions.minhashSig, so expression-side and
  * aggregate-side signatures are interchangeable (DedupSpec asserts it).
  *
  * Register with `functions.udaf(new MinHashAgg(k))`.
  */
class MinHashAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var p = 0
    while (p < k) {
      val v = (h * (2 * p + 1) + (p.toLong * p + 7)) % TextFunctions.MinhashPrime
      if (v < buf(p)) buf(p) = v
      p += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < k) { if (b(p) < a(p)) a(p) = b(p); p += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
