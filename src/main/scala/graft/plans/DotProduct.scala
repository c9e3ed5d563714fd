package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: left-to-right dot product of two
  * `array<double>` columns — one primitive loop inside whole-stage
  * codegen. Bit-identical to the portable HOF spelling
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)`
  * (same addition order, same IEEE doubles — pinned by PlanSpec), but
  * without materializing the intermediate product array or the
  * per-element lambda frames. The similarity pack evaluates this once
  * per candidate PAIR (brute KNN: |queries|x|corpus|), so it is the
  * single hottest scalar in the embedding path at 100 TB.
  *
  * Nulls: null if either array is null (standard binary null-safety),
  * and null for MISMATCHED lengths — exactly what the HOF spelling
  * returns there (zip_with pads the short side with nulls, the
  * product goes null, the fold returns null). Elements are read as
  * primitive doubles (embedding vectors are non-null by construction).
  *
  * Registered as SQL function `graft_dot` via GraftExtensions.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
