package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full 16-permutation MinHash signature
  * of a token array in ONE fused pass — for each 5-token shingle, build
  * the joined string once, md5 it once, fold the leading 4 digest bytes
  * to the uint32 feature hash, and update all permutation minima in
  * place. The column-expression spelling (TextFunctions.minhashSig)
  * materializes three intermediate arrays per row (shingle strings,
  * hashes, per-permutation transforms) and round-trips every hash
  * through hex text (`md5` → `substring` → `conv`); this does none of
  * that, so the dedup family's signature stage is allocation-free per
  * shingle beyond one StringBuilder.
  *
  * Semantics are BIT-IDENTICAL to
  * `minhashSigFromHashes(shingleHashes(shingles(toks, 5)), 16)` —
  * PlanSpec asserts equality over the corpus — including the edge
  * cases: empty/short docs yield one (possibly empty) shingle, null
  * tokens are skipped by the join exactly like `concat_ws`, and the
  * uint32 fold equals `conv(substring(md5(s),1,8),16,10)` because the
  * first 8 hex chars ARE the first 4 digest bytes.
  *
  * Registered as SQL function `graft_minhash` via GraftExtensions.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects ARRAY<STRING>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.MinHashSig.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Shingle width and permutation count — fixed to the dedup pack's
    * banding parameters (16 perms = 4 bands x 4 rows over 5-shingles). */
  val K = 5
  val Perms = 16
  private val Prime = graft.functions.TextFunctions.MinhashPrime

  /** One fused pass; static so generated code calls it directly. */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val nWin = math.max(n - (K - 1), 1)
    val mins = new Array[Long](Perms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nWin) {
      sb.setLength(0)
      val end = math.min(i + K, n)
      var j = i
      var first = true
      while (j < end) {
        // concat_ws semantics: null elements joined over, no separator
        if (!toks.isNullAt(j)) {
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(j).toString)
          first = false
        }
        j += 1
      }
      val h = Hex32.compute(UTF8String.fromString(sb.toString))
      var p = 0
      while (p < Perms) {
        val v = (h * (2 * p + 1) + (p.toLong * p + 7)) % Prime
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
