package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a driver-built
  * `org.apache.spark.util.sketch.BloomFilter` over a BIGINT key.
  *
  * Replaces the two Scala-UDF probes that used to be the last UDFs in
  * the tree (q83 decontamination, q246 bloom-pruned join). The filter
  * itself is still built DISTRIBUTED by `df.stat.bloomFilter` (a
  * treeAggregate of OR-able bitsets, partition-order independent);
  * only the probe changes: instead of a ScalaUDF that boxes the key,
  * calls through the closure-captured function object, and blocks
  * expression-level null short-circuiting, the generated code calls
  * `mightContainLong` on a codegen reference object directly inside
  * WholeStageCodegen — no boxing, no lambda dispatch.
  *
  * The filter rides the expression as a constructor field (it is
  * java-serializable, ~KBs at the call sites' sizes), exactly like the
  * UDF closure used to carry it, so driver→executor shipping is
  * unchanged; `addReferenceObj` hands the SAME deserialized instance
  * to the generated code, so no per-row or per-batch deserialization
  * happens anywhere.
  */
case class BloomProbe(child: Expression, bloom: BloomFilter) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bloom_probe expects BIGINT, got $t")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.mightContainLong($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}
