package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression,
  LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the PORTABLE dot-product formulation
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, e) -> acc + e)
  *
  * into the native codegen [[DotD]] expression. Users writing the
  * higher-order-function form (the only way to express this without graft
  * imports) get the tight primitive loop for free; semantics are
  * identical — DotD reproduces the fold's accumulation order AND its
  * null-poisoning (null element / length mismatch → null).
  *
  * Registered through [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or at runtime via
  * `spark.experimental.extraOptimizations`.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def sameVars(u1: NamedLambdaVariable, u2: NamedLambdaVariable,
      d1: Seq[Expression], d2: Seq[Expression]): Boolean =
    (d1 ++ d2).forall(_.isInstanceOf[NamedLambdaVariable]) && {
      val declared = (d1 ++ d2).map(_.asInstanceOf[NamedLambdaVariable].exprId).toSet
      Set(u1.exprId, u2.exprId) == declared
    }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(d: NamedLambdaVariable), _) =>
      v.exprId == d.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), prodArgs, _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(acc: NamedLambdaVariable, e: NamedLambdaVariable, _), sumArgs, _),
          finish)
        if zero == 0.0 && isDoubleArray(a) && isDoubleArray(b) &&
          sameVars(x, y, prodArgs, Nil) && sameVars(acc, e, sumArgs, Nil) &&
          isIdentity(finish) =>
      DotD(a, b)
  }
}
