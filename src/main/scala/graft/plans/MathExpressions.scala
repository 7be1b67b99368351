package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Natural log via `java.lang.Math.log` — NOT Spark's built-in `log`,
  * which routes through `StrictMath.log` (fdlibm) and disagrees with
  * platform libm in the last ulp on a large fraction of inputs
  * (measured: `StrictMath.log(3.0)` = …96 vs libm/DuckDB …98).
  *
  * The engine's oracle-parity contract needs scores that hash-match a
  * DuckDB twin bit-for-bit; DuckDB's `ln` is the platform libm, and on
  * this target `Math.log` (HotSpot intrinsic) was measured
  * bit-identical to it across the input range (2000-point sweep +
  * boundary cases), while StrictMath was not. So ln-derived scores
  * (TF-IDF, BM25 idf) use this expression. `Math.log` is also the
  * faster path (intrinsified); the trade is JVM-portability of the
  * last ulp, which the per-round oracle gate re-verifies anyway.
  *
  * Returns NULL on NULL input, NaN/-Inf on non-positive input (libm
  * semantics, same as DuckDB).
  */
case class LibmLn(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ln"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE input, got ${t.simpleString}")
  }

  override def nullSafeEval(x: Any): Any =
    java.lang.Math.log(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = java.lang.Math.log($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
