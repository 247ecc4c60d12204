package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the declarative integer dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the codegen'd [[LongArrayDot]] when both arrays are array<bigint>.
  * Users (and our own library code) can write the idiomatic higher-order
  * form and still get the tight-loop implementation — the declarative
  * surface stays, the physical cost goes away. Exact-Long semantics are
  * identical (LongArrayDot is the same fold), so the rewrite is safe.
  *
  * Registered either via `spark.sql.extensions=graft.plans.GraftExtensions`
  * or at runtime with [[GraftExtensions.install]].
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(Add(ax: NamedLambdaVariable, ay: NamedLambdaVariable, _),
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(av: NamedLambdaVariable), _))
          // bind by exprId: the multiply must consume BOTH zip_with variables
          // (not x*x), the merge must be acc+element (not acc+acc) — either
          // order, both ops are commutative
          if fin.exprId == av.exprId &&
            mx.exprId != my.exprId &&
            Set(mx.exprId, my.exprId) == Set(zx.exprId, zy.exprId) &&
            ax.exprId != ay.exprId &&
            Set(ax.exprId, ay.exprId) == Set(acc.exprId, el.exprId) &&
            isLongArray(a) && isLongArray(b) =>
        LongArrayDot(a, b)
    }
}

/** SparkSessionExtensions entry point (config:
  * `spark.sql.extensions=graft.plans.GraftExtensions`): the optimizer
  * rewrite plus the planner strategy for graft's whole-operator plans
  * (as-of merge join). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => DotProductRewrite)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  /** Runtime installation into an existing session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(DotProductRewrite))
      exp.extraOptimizations = exp.extraOptimizations :+ DotProductRewrite
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }
}
