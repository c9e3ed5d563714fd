package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's canonical 32-bit string hash
  * — md5, folded to a uint32 from the leading 4 digest bytes — computed
  * directly from the digest instead of the column spelling
  * `conv(substring(md5(s),1,8),16,10)`, which hex-encodes all 16 bytes,
  * substrings the text, and re-parses it base-16. Bit-identical to that
  * spelling (the first 8 hex chars ARE the first 4 bytes; PlanSpec
  * asserts equality), so every oracle mirror
  * (`CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)`) is unchanged.
  *
  * Registered as SQL function `graft_hex32`; TextFunctions.hex32 routes
  * through it, so every hashing call site (MinHash shingles, SimHash
  * token hashes, LSH band keys stay md5-of-concat, sampling buckets)
  * gets the fused path.
  */
case class Hex32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_hex32 expects STRING, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hex32"

  override protected def nullSafeEval(input: Any): Any =
    Hex32.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = graft.plans.Hex32.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Hex32 =
    copy(child = newChild)
}

object Hex32 {
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static so generated code calls it directly. */
  def compute(s: UTF8String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
