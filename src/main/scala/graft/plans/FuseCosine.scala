package graft.plans

import graft.expressions.CosineSim
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule (`Rule[LogicalPlan]`, injected by
  * [[graft.GraftExtensions]]): rewrites the COMPOSED cosine-similarity
  * expression shape produced by [[graft.functions.Similarity.cosine]] —
  *
  *   aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)
  *     / (sqrt(aggregate(a, 0.0, (acc,v) -> acc+v*v))
  *        * sqrt(aggregate(b, 0.0, (acc,v) -> acc+v*v)))
  *
  * — into the fused, codegen'd [[graft.expressions.CosineSim]] kernel.
  * A user who writes the portable higher-order-function form (which
  * Spark evaluates through interpreted lambda dispatch, allocating an
  * intermediate product array per row) silently gets the single-pass
  * fused loop: same math, same left-to-right accumulation order, so the
  * scores are bit-identical (asserted in SimilaritySpec).
  *
  * The rewrite fires only when it is PROVABLY semantics-preserving:
  * both sides must be `array<double>` with `containsNull = false` —
  * with a nullable element the composed form folds null through the
  * sum and returns null, which the fused kernel (raw getDouble loop)
  * would not reproduce. Mismatched lengths are safe either way: both
  * forms return null (CosineSim's explicit length guard).
  *
  * Scale: in the kNN hot loop this is the difference between O(N·Q)
  * interpreted lambda invocations and one whole-stage-codegen'd loop —
  * the optimizer applies it everywhere, including plans the library
  * didn't author. Excludable like any rule via
  * `spark.sql.optimizer.excludedRules=graft.plans.FuseCosine`.
  */
object FuseCosine extends Rule[LogicalPlan] {

  private object DoubleZero {
    def unapply(e: Expression): Boolean = e match {
      case Literal(v: Double, DoubleType) => v == 0.0
      case _ => false
    }
  }

  /** The identity finish lambda `c -> c` that 3-arg `aggregate` adds. */
  private object IdentityFinish {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
        body.exprId == arg.exprId
      case _ => false
    }
  }

  /** aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v) */
  private object DotAgg {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _)),
            DoubleZero(),
            LambdaFunction(Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _),
            IdentityFinish()) =>
        Some((a, b))
      case _ => None
    }
  }

  /** sqrt(aggregate(arr, 0.0, (acc,v) -> acc + v*v)) */
  private object NormSqrt {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(ArrayAggregate(
            arr,
            DoubleZero(),
            LambdaFunction(
              Add(_: NamedLambdaVariable, Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), _),
              _, _),
            IdentityFinish())) if x.exprId == y.exprId =>
        Some(arr)
      case _ => None
    }
  }

  private def fusable(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotAgg(a, b), Multiply(NormSqrt(a2), NormSqrt(b2), _), _)
          if a.semanticEquals(a2) && b.semanticEquals(b2) &&
            fusable(a) && fusable(b) =>
        CosineSim(a, b)
    }
}
