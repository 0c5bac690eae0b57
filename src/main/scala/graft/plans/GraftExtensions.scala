package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.expressions.DotProduct

/** Catalyst optimizer rule: rewrite the composable dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * (what VectorFunctions.dot builds, and what users writing idiomatic
  * higher-order SQL produce) into the fused native [[DotProduct]]
  * expression — same sequential fold semantics, no intermediate array.
  * The match is deliberately narrow: exact multiply-lambda, exact
  * 0.0-seed add-lambda, identity finish; anything else is left alone.
  *
  * Registered through [[GraftExtensions]]:
  *   SparkSession.builder().withExtensions(new GraftExtensions).…
  * — the standard extension-injection path, so a session opts in
  * without graft code changes (SURVEY.md §7.3's "custom Catalyst"
  * slot, used where it actually pays).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  private def toDoubleArray(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, _) => e
    case _                        => Cast(e, ArrayType(DoubleType))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            ZipWith(left, right,
              LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            finish)
          if zero == 0.0 && isIdentityFinish(finish) &&
             isVarProduct(mul, x, y) && isVarSum(add, acc, v) =>
        DotProduct(toDoubleArray(left), toDoubleArray(right))
    }

  /** mul must be (possibly-cast) x * y over exactly the two lambda vars. */
  private def isVarProduct(mul: Multiply, x: NamedLambdaVariable,
                           y: NamedLambdaVariable): Boolean = {
    def strip(e: Expression): Expression = e match {
      case Cast(c, _, _, _) => strip(c)
      case other            => other
    }
    (strip(mul.left), strip(mul.right)) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        Set(a.exprId, b.exprId) == Set(x.exprId, y.exprId)
      case _ => false
    }
  }

  /** add must be acc + v (either order), un-cast. */
  private def isVarSum(add: Add, acc: NamedLambdaVariable,
                       v: NamedLambdaVariable): Boolean =
    (add.left, add.right) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        Set(a.exprId, b.exprId) == Set(acc.exprId, v.exprId)
      case _ => false
    }
}

/** Session extension entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteDotProduct)
    e.injectPlannerStrategy(_ => AsOfJoinPlan.AsOfJoinStrategy)
  }
}
