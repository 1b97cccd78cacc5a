package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the idiomatic higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[DotProduct]]. Any user writing the HOF
  * form — including `spark.sql` text — gets the fast kernel without
  * changing code. Observation-equivalent: same left-fold float
  * accumulation, same null/length semantics (see DotProduct).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedExpression): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** Both lambda args used exactly once, either order (both * and +
    * are float-commutative over two operands).
    */
  private def usesBoth(l: Expression, r: Expression, args: Seq[NamedExpression]): Boolean =
    args.length == 2 &&
      ((isVar(l, args(0)) && isVar(r, args(1))) || (isVar(l, args(1)) && isVar(r, args(0))))

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(arg), _) => isVar(body, arg)
    case _ => false
  }

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), margs, _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(ax, ay, _), aargs, _),
          finish)
        if zero == 0.0 && doubleArray(a) && doubleArray(b) &&
          usesBoth(mx, my, margs) && usesBoth(ax, ay, aargs) && isIdentity(finish) =>
      DotProduct(a, b)
  }
}
