package graft.plans

import graft.functions.{DotProduct, DotProductLong}
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** Optimizer rule: recognize the portable higher-order-function dot
  * product — `aggregate(zip_with(a, b, (p, q) -> p * q), 0,
  * (acc, z) -> acc + z)` — and rewrite it to the native codegen'd
  * [[graft.functions.DotProduct]] / [[graft.functions.DotProductLong]]
  * kernel. The HOF form is what a user writes (it is engine-portable
  * SQL and what the DuckDB oracle mirrors); the kernel is how it
  * should execute: a fused primitive loop inside WholeStageCodegen
  * instead of interpreted lambdas over a materialized zipped array.
  * Both fold sequentially over the leading lanes, so the rewrite is
  * bit-identical on the IEEE result — with one declared caveat: a
  * null LANE (not a null array) yields null through the HOF form and
  * is treated as absent by the kernel, matching the non-null-lane
  * contract every graft vector column already has.
  *
  * Injected by [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`), or at
  * runtime via `spark.experimental.extraOptimizations`.
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  /** The lambda body must combine exactly the two lambda variables
    * (in either order — both * and + are commutative here).
    */
  private def combinesVars(x: Expression, y: Expression,
                           a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (sameVar(x, a) && sameVar(y, b)) || (sameVar(x, b) && sameVar(y, a))

  private def elemType(e: Expression): Option[Any] = e.dataType match {
    case ArrayType(t @ (DoubleType | LongType), _) => Some(t)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx, my, _),
              Seq(px: NamedLambdaVariable, py: NamedLambdaVariable), _)),
          Literal(zero, zt @ (DoubleType | LongType)),
          LambdaFunction(Add(ax, ay, _),
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if combinesVars(mx, my, px, py) && combinesVars(ax, ay, acc, el) &&
          sameVar(fin, fv) &&
          (zero == 0.0 || zero == 0L) &&
          elemType(a).contains(zt) && elemType(b).contains(zt) =>
      if (zt == DoubleType) DotProduct(a, b) else DotProductLong(a, b)
  }
}
