package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the uint32 md5 hash of every 5-token
  * shingle of a token array, in one fused pass — the per-shingle
  * precursor the MinHash Aggregator (q46) and the contamination check
  * (q72) consume. The column spelling
  * `shingleHashes(shingles(toks, 5))` materializes the shingle STRING
  * array (HOF transform + slice + concat_ws per window) and then
  * hex-round-trips each md5; this emits the long array directly, so
  * downstream `explode` ships 8-byte longs, not shingle text.
  *
  * Bit-identical to the column spelling (PlanSpec), same edge cases as
  * plans.MinHashSig: short/empty docs yield one truncated (possibly
  * empty) shingle; null tokens are joined over like concat_ws.
  *
  * Registered as SQL function `graft_shingle_hashes` via GraftExtensions.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects ARRAY<STRING>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.ShingleHashes.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val K = MinHashSig.K

  /** Static so generated code calls it directly. */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val nWin = math.max(n - (K - 1), 1)
    val out = new Array[Long](nWin)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nWin) {
      sb.setLength(0)
      val end = math.min(i + K, n)
      var j = i
      var first = true
      while (j < end) {
        if (!toks.isNullAt(j)) {
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(j).toString)
          first = false
        }
        j += 1
      }
      out(i) = Hex32.compute(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out)
  }
}
