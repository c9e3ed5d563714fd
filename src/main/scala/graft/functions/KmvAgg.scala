package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator:
  * the buffer is the k smallest DISTINCT 32-bit hashes seen, kept
  * sorted; merges are sorted-distinct merges capped at k. The estimate
  * is (k-1) * 2^32 / v_k (v_k = the k-th minimum) — or exact when
  * fewer than k distinct hashes exist.
  *
  * Unlike HLL, KMV is fully deterministic given the hash function, so
  * the sketch itself is DuckDB-oracle-checkable bit-for-bit (q82) —
  * the property that makes a sketch auditable across engines. State is
  * O(k) per group and merges are associative+commutative, so Spark
  * runs it with map-side partial aggregation: the shuffle carries at
  * most k longs per group per partition.
  */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"KMV requires k > 0, got $k")

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (ins >= k) buf // larger than the current k minima
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
      else () // duplicate across the two buffers
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
