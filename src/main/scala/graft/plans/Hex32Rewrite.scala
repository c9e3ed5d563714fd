package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}

/** Optimizer rule: rewrite the portable column spelling of the engine's
  * 32-bit hash,
  *
  *   CAST(conv(substring(md5(x), 1, 8), 16, 10) AS BIGINT)
  *
  * into the fused native [[Hex32]] — same value (the first 8 hex chars
  * are the first 4 digest bytes), none of the hex-encode / substring /
  * base-16 re-parse work. Users (and the DuckDB-mirrored oracle SQL run
  * through Spark) can keep writing the portable form; plans get the
  * fast path automatically. Registered via GraftExtensions
  * `injectOptimizerRule` — the fourth extension-point of the set
  * (function, planner strategy, logical operator, optimizer rule).
  */
object Hex32Rewrite extends Rule[LogicalPlan] {

  private object Hex32Spelling {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(Conv(Substring(Md5(x), Literal(1, _), Literal(8, _)),
          Literal(16, _), Literal(10, _), _), LongType, _, _) => Some(x)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // md5 takes binary; the column spelling arrives as md5(cast(x as
      // string) cast to binary). Hex32 wants the string input back.
      case Hex32Spelling(x) => x match {
        case Cast(s, _, _, _) if s.dataType == StringType => Hex32(s)
        case other => Hex32(Cast(other, StringType))
      }
    }
}
