package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native float-array dot product: one codegen'd call looping directly
  * over the columnar ArrayData, replacing the unrolled
  * `element_at(a,1)*element_at(b,1) + …` chain (64 bounds-checked
  * element_at calls per side per row in the similarity family's hot
  * joins). Arithmetic is IDENTICAL to the unrolled form and to DuckDB's
  * list_dot_product on DOUBLE[]: each float widened to double, products
  * accumulated left to right — so every existing similarity oracle keeps
  * hash-matching. Length mismatch folds to min(len); elements are
  * expected non-null (embedding vectors — a null element reads as that
  * slot's raw 0.0f, it does not throw). */
case class DotF(left: Expression, right: Expression) extends BinaryExpression {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotF.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotF.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF =
    copy(left = newLeft, right = newRight)
}

object DotF {
  /** Left-to-right float dot product in double precision — the exact
    * arithmetic of the unrolled element_at chain it replaces. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }
}
