package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule rewriting the idiomatic higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0d, (acc, v) => acc + v) }}}
  *
  * into [[ArrayDot]]. The HOF form is what users naturally write with
  * built-ins; it evaluates interpreted with a per-row intermediate
  * array. The rewrite gives them the generated-loop fast path without
  * changing their code — same result, deterministic left-to-right fold
  * in both forms.
  *
  * Injected via [[graft.GraftExtensions]] (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private object IdentityFinish {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
        v.exprId == arg.exprId
      case _ => false
    }
  }

  private object ZeroLiteral {
    def unapply(e: Expression): Boolean = e match {
      case Literal(0.0, DoubleType) => true
      case Cast(Literal(0.0, DoubleType), DoubleType, _, _) => true
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
          ZeroLiteral(),
          LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), Seq(lacc: NamedLambdaVariable, lv: NamedLambdaVariable), _),
          IdentityFinish())
        if Set(x.exprId, y.exprId) == Set(lx.exprId, ly.exprId) &&
          Set(acc.exprId, v.exprId) == Set(lacc.exprId, lv.exprId) &&
          isDoubleArray(a.dataType) && isDoubleArray(b.dataType) =>
      ArrayDot(a, b)
  }

  // Safe for any containsNull: ArrayDot mirrors the HOF's null
  // semantics exactly — null on unequal lengths (the HOF via zip_with
  // null-padding) and null when any element is null (the HOF's fold is
  // poisoned by null * y) — emitting the element null checks only when
  // the array type says they can occur.
  private def isDoubleArray(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }
}
