package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognizes the SQL-builtin dot-product spelling
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)`
  * over ARRAY<DOUBLE> inputs and folds it into the native codegen'd
  * [[DotProduct]] kernel — so a user writing the idiomatic HOF form in
  * SQL gets the primitive loop automatically (the HOF pair evaluates its
  * lambdas on the interpreted path per element). Injected via
  * [[graft.functions.GraftExtensions]] next to [[RiskScoreRewrite]].
  *
  * Safe by [[DotProduct]]'s exact HOF parity: left-to-right summation,
  * NULL on mismatched lengths (zip_with's null padding), NULL on null
  * elements. Conservative by construction: both lambdas must be pure
  * two-variable multiply/add over the lambda variables themselves (an
  * analyzer-inserted cast inside the lambda — e.g. float arrays — means
  * the pattern is NOT a double dot product, and is left untouched), and
  * the finish lambda must be the identity.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r, LambdaFunction(mult, zipArgs, _)),
            zero,
            LambdaFunction(add, aggArgs, _),
            finish)
          if isDoubleArray(l) && isDoubleArray(r) &&
            isZeroDouble(zero) &&
            isVarPair(mult, zipArgs) && isVarSum(add, aggArgs) &&
            isIdentity(finish) =>
        DotProduct(l, r)
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Strictly +0.0D: a -0.0 seed makes the HOF fold return -0.0 for an
    * empty (or mismatched-to-empty) array where [[DotProduct]] returns
    * +0.0 — a bit-level divergence, so the rewrite must not fire on it.
    * `== 0.0d` would accept both (IEEE equality); compare raw bits. */
  private def isZeroDouble(e: Expression): Boolean =
    e.foldable && e.dataType == DoubleType && (e.eval(null) match {
      case d: java.lang.Double => java.lang.Double.doubleToRawLongBits(d) == 0L
      case _ => false
    })

  /** function is exactly `x * y` over the two lambda variables (either
    * order — IEEE multiplication commutes bit-exactly). */
  private def isVarPair(f: Expression, args: Seq[NamedExpression]): Boolean =
    args.length == 2 && (f match {
      case Multiply(a: NamedLambdaVariable, b: NamedLambdaVariable, _) =>
        Set(a.exprId, b.exprId) == args.collect { case v: NamedLambdaVariable => v.exprId }.toSet
      case _ => false
    })

  /** function is exactly `acc + v` over the two lambda variables (either
    * order — IEEE addition of the same pair commutes bit-exactly). */
  private def isVarSum(f: Expression, args: Seq[NamedExpression]): Boolean =
    args.length == 2 && (f match {
      case Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _) =>
        Set(a.exprId, b.exprId) == args.collect { case v: NamedLambdaVariable => v.exprId }.toSet
      case _ => false
    })

  /** ArrayAggregate's finish lambda is `acc -> acc`. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg), _) => v.exprId == arg.exprId
    case _ => false
  }
}
