package graft.plans

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot vector path — preference
  * order (b) from the build contract: when composing built-ins leaves
  * measurable cost on the table, a codegen'd `Expression` beats the
  * higher-order-function form (which allocates a zipped array and boxes
  * through lambda dispatch per element), and both beat any UDF.
  *
  * `DotProductF32` computes the same left-to-right double summation as
  * `Similarity.dot`'s `aggregate(zip_with(...))` — bit-identical
  * results (NativeSpec pins this on the real embeddings) — as one tight
  * primitive loop with no intermediate array.
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes would be the idiomatic mixin, but AbstractDataType
  // is private[sql] in Spark 4 — manual check instead.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot_f32 expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object NativeExpressions {
  /** Session-free Column form (no registry needed). */
  def dotF32(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductF32(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** SQL-side registration via SparkSessionExtensions — activates
  * `graft_dot_f32(a, b)` in `spark.sql(...)` when the session is built
  * with `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot_f32"),
      new ExpressionInfo(classOf[DotProductF32].getName, "graft_dot_f32"),
      (exprs: Seq[Expression]) => DotProductF32(exprs(0), exprs(1))))
  }
}
