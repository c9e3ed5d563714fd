package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Isotonic regression (PAVA — pool-adjacent-violators) as a typed
  * Aggregator, the same bounded-state pattern as [[KmvAgg]]: the input
  * rows are pre-collapsed (x, sum, count) CELLS (the caller's groupBy
  * has already reduced the corpus map-side, so the buffer is bounded by
  * the x-domain, never the row count), the buffer is the bag of cells,
  * and `finish` runs the classic stack PAVA over the x-sorted cells:
  * push each cell as its own block, merge the top two blocks while the
  * previous block's mean STRICTLY exceeds the current's. The fitted
  * value per block is its pooled mean — the unique L2-optimal
  * nondecreasing fit (Ayer et al. 1955; Best & Chakravarti 1990, both
  * public). Equal means never merge, so block boundaries are
  * deterministic and oracle-mirrorable.
  *
  * All arithmetic is exact: mean comparisons cross-multiply BIGINTs
  * (s_prev·c_cur > s_cur·c_prev — no float means anywhere) and the
  * reported fit is floor-milli (s·1000 div c), so a DuckDB recursive
  * CTE replays the identical merge sequence bit-for-bit.
  *
  * Output blocks: (x_lo, x_hi, n_cells, sum, count) — fitted_milli is
  * derived in the query so the oracle's floor-div happens ONCE, in one
  * place, on both engines.
  */
class PavaAgg extends Aggregator[(Long, Long, Long),
    Array[(Long, Long, Long)], Array[(Long, Long, Long, Long, Long)]] {

  override def zero: Array[(Long, Long, Long)] = Array.empty

  override def reduce(buf: Array[(Long, Long, Long)],
      cell: (Long, Long, Long)): Array[(Long, Long, Long)] = buf :+ cell

  override def merge(a: Array[(Long, Long, Long)],
      b: Array[(Long, Long, Long)]): Array[(Long, Long, Long)] = a ++ b

  override def finish(buf: Array[(Long, Long, Long)]): Array[(Long, Long, Long, Long, Long)] = {
    // (x_lo, x_hi, n_cells, s, c) blocks; strict-violation merges only
    val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    for ((x, s, c) <- buf.sortBy(_._1)) {
      st += ((x, x, 1L, s, c))
      var merging = true
      while (merging && st.length >= 2) {
        val (plo, phi, pn, ps, pc) = st(st.length - 2)
        val (clo, chi, cn, cs, cc) = st(st.length - 1)
        if (ps * cc > cs * pc) { // prev mean > cur mean: violation
          st.remove(st.length - 1); st.remove(st.length - 1)
          st += ((plo, chi, pn + cn, ps + cs, pc + cc))
        } else merging = false
      }
    }
    st.toArray
  }

  override def bufferEncoder: Encoder[Array[(Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long, Long)]]()
  override def outputEncoder: Encoder[Array[(Long, Long, Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long, Long, Long, Long)]]()
}
