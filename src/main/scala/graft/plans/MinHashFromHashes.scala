package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the 16-permutation MinHash signature from
  * an ALREADY-HASHED shingle array (array<long> of hex32 values) — pure
  * integer arithmetic, no md5.
  *
  * Why it exists (optimization round 12): `graft_minhash(toks)` and
  * `graft_shingle_hashes(toks)` each recompute the identical
  * md5-per-shingle work (MinHashSig.compute IS ShingleHashes.compute
  * plus 16 multiplies), so every dedup query that needs both the band
  * index and the verify sets paid the expensive hash pass twice. With
  * this expression one pass computes the hash array and the signature
  * derives from it for ~16 multiply-adds per hash.
  *
  * Bit-identical to `graft_minhash(toks)` when fed
  * `graft_shingle_hashes(toks)` OR its `array_distinct` (min over a set
  * ignores multiplicity and order) — PlanSpec pins both equalities over
  * the corpus. Null input yields null like every UnaryExpression here.
  *
  * Registered as SQL function `graft_minhash_hashes` via GraftExtensions.
  */
case class MinHashFromHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_hashes expects ARRAY<BIGINT>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_hashes"

  override protected def nullSafeEval(input: Any): Any =
    MinHashFromHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.MinHashFromHashes.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)
}

object MinHashFromHashes {
  private val Perms = MinHashSig.Perms
  private val Prime = graft.functions.TextFunctions.MinhashPrime

  /** Static so generated code calls it directly. Same affine update as
    * MinHashSig.compute; a null element (impossible from ShingleHashes,
    * possible from hand-built arrays) is skipped like concat_ws skips
    * null tokens. */
  def compute(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val mins = new Array[Long](Perms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var p = 0
        while (p < Perms) {
          val v = (h * (2 * p + 1) + (p.toLong * p + 7)) % Prime
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
