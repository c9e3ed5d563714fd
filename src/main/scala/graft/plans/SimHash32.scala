package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: 32-bit SimHash over a pre-hashed feature
  * array — bit b of the code is set when more features have bit b set
  * than not. One pass over the array with an on-stack vote table,
  * generated into whole-stage codegen; the HOF formulation
  * (TextFunctions.simhash32FromHashes) walks the array 32 times, once
  * per aggregate. Semantics match the HOF exactly, including the null
  * vote: a null element falls to the otherwise(-1) branch there, so it
  * votes -1 on every bit here too.
  *
  * Registered as SQL function `graft_simhash` via GraftExtensions;
  * cited shape: reference 2b has no sketches — this is the north-star
  * near-dup layer (SURVEY §7).
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects ARRAY<BIGINT>, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val isNull = arr.isNullAt(i)
      val h = if (isNull) 0L else arr.getLong(i)
      var b = 0
      while (b < 32) {
        votes(b) += (if (!isNull && ((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var code = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) code |= 1L << b
      b += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val isN = ctx.freshName("isN")
      val code = ctx.freshName("code")
      s"""
         |long[] $votes = new long[32];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  boolean $isN = $arr.isNullAt($i);
         |  long $h = $isN ? 0L : $arr.getLong($i);
         |  for (int $b = 0; $b < 32; $b++) {
         |    $votes[$b] += (!$isN && (($h >> $b) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $code = 0L;
         |for (int $b = 0; $b < 32; $b++) {
         |  if ($votes[$b] > 0) $code |= 1L << $b;
         |}
         |${ev.value} = $code;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}
