package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule — preference tier (c) of the custom-operator ladder:
  * rewrite the portable higher-order-function dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0, (acc, v) -> acc + v)
  *
  * into the native codegen'd `DotProductF32(a, b)` (~60× — the HOF form
  * allocates the zipped array and interprets its lambda per element).
  * Users write the declarative built-ins form; the optimizer swaps in
  * the kernel — the same contract as Catalyst's own expression rewrites.
  *
  * Scope guard: fires only for (array<float>, array<float>) inputs.
  * Semantics-preserving on ANY such input: `DotProductF32` mirrors the
  * HOF form's null behavior — ragged pair ⇒ NULL (zip_with would
  * null-pad and poison the sum), any null element ⇒ NULL — and the
  * per-element null scan is only emitted when the array type says
  * `containsNull`, so fixed-dimension non-null embeddings keep the
  * tight two-load loop.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** (x, y) -> cast(x as double) * cast(y as double), args in order. */
  private def isCastMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(
          Cast(x: NamedLambdaVariable, DoubleType, _, _),
          Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
        Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _) =>
      x.exprId == ax.exprId && y.exprId == ay.exprId
    case _ => false
  }

  /** (x, y) -> (cast(x)−cast(y)) * (cast(x)−cast(y)), args in order —
    * the squared-difference lambda of the HOF L2² form. */
  private def isCastDiffSquare(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(
          Subtract(Cast(x1: NamedLambdaVariable, DoubleType, _, _),
                   Cast(y1: NamedLambdaVariable, DoubleType, _, _), _),
          Subtract(Cast(x2: NamedLambdaVariable, DoubleType, _, _),
                   Cast(y2: NamedLambdaVariable, DoubleType, _, _), _), _),
        Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _) =>
      x1.exprId == ax.exprId && y1.exprId == ay.exprId &&
        x2.exprId == ax.exprId && y2.exprId == ay.exprId
    case _ => false
  }

  /** (acc, v) -> acc + v */
  private def isSum(f: Expression): Boolean = f match {
    case LambdaFunction(Add(a: NamedLambdaVariable, v: NamedLambdaVariable, _),
        Seq(aa: NamedLambdaVariable, av: NamedLambdaVariable), _) =>
      a.exprId == aa.exprId && v.exprId == av.exprId
    case _ => false
  }

  /** id -> id (the implicit finish lambda of 3-arg aggregate). */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(zw: ZipWith, Literal(zero, DoubleType), merge, finish)
        if zero == 0.0 && isFloatArray(zw.left) && isFloatArray(zw.right) &&
          isCastMultiply(zw.function) && isSum(merge) && isIdentity(finish) =>
      DotProductF32(zw.left, zw.right)
    case ArrayAggregate(zw: ZipWith, Literal(zero, DoubleType), merge, finish)
        if zero == 0.0 && isFloatArray(zw.left) && isFloatArray(zw.right) &&
          isCastDiffSquare(zw.function) && isSum(merge) && isIdentity(finish) =>
      L2SqF32(zw.left, zw.right)
  }
}
