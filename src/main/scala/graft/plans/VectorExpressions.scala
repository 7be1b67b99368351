package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math with whole-stage
  * codegen (`doGenCode`).
  *
  * The composable alternative ([[graft.functions.VectorFns]]) builds
  * the dot product from `zip_with`+`aggregate`; higher-order functions
  * are evaluated interpreted (lambda per element, boxed accumulator)
  * and cannot join a WholeStageCodegen region. These expressions emit a
  * tight primitive loop instead — the difference is ~10× per score at
  * 64 dims, which is what matters when an ANN scorer evaluates
  * O(|corpus|·|queries|) cosines at 100 TB.
  *
  * Accumulation order is left-to-right in double, IEEE-identical to the
  * `aggregate`-based form, so swapping implementations cannot change
  * oracle-checked results.
  */
trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def elemAt(e: Expression, arr: ArrayData, i: Int): Double =
    if (elemIsFloat(e)) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** Java source reading element i of `arr` as double. */
  protected def genElem(e: Expression, arr: String, i: String): String =
    if (elemIsFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** dot(a, b) = Σ aᵢ·bᵢ. NULL when lengths differ (defensive — a length
  * mismatch is a data error, not a zero) or when any element is NULL —
  * UnsafeArrayData would silently read a null slot as 0.0, and the
  * `zip_with`/`aggregate` twin ([[graft.functions.VectorFns.dotHof]])
  * propagates NULL, so both implementations must surface corrupt
  * embeddings the same way. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += elemAt(left, x, i) * elemAt(right, y, i); i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val bad = ctx.freshName("nullElem")
      s"""
         |int ${i}n = $x.numElements();
         |if (${i}n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < ${i}n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |    $dot += ${genElem(left, x, i)} * ${genElem(right, y, i)};
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = a·b / (‖a‖‖b‖); NULL on zero norms, length
  * mismatch, or any NULL element (same policy and rationale as
  * [[DotProduct]]). Single fused loop — one pass computes dot and both
  * norms. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = elemAt(left, x, i)
      val yi = elemAt(right, y, i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = Math.sqrt(na) * Math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      val bad = ctx.freshName("nullElem")
      s"""
         |int ${i}n = $x.numElements();
         |if (${i}n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < ${i}n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |    double $xi = ${genElem(left, x, i)};
         |    double $yi = ${genElem(right, y, i)};
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  double $denom = Math.sqrt($na) * Math.sqrt($nb);
         |  if ($bad || $denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
