package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

object DotProductUtil {
  /** Sequential-fold dot product (float→double), the same op order as
    * [[CosineSimUtil.cosine]]'s dot term. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var d = 0.0
    var i = 0
    while (i < n) {
      d += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    d
  }
}

/** Native codegen'd dot product (`array<float> × array<float> →
  * double`) — the inner-product primitive the PQ/ADC path needs where
  * cosine's normalization would be wrong. Ragged pairs yield NULL,
  * like [[CosineSim]]. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }
  // element scan skipped statically when the schema rules nulls out
  // (see ArrayNulls.mayHaveNullElements)
  private def scanLeft = ArrayNulls.mayHaveNullElements(left)
  private def scanRight = ArrayNulls.mayHaveNullElements(right)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    if (av.numElements() != bv.numElements() ||
        (scanLeft && ArrayNulls.anyNull(av)) ||
        (scanRight && ArrayNulls.anyNull(bv))) null
    else DotProductUtil.dot(av, bv)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // `||` at END of line — a line-leading `||` is margin-stripped
    // out of the generated Java (see CosineSim.doGenCode)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = if (scanLeft) s" || graft.functions.ArrayNulls.anyNull($a)" else ""
      val nb = if (scanRight) s" || graft.functions.ArrayNulls.anyNull($b)" else ""
      s"""
      if ($a.numElements() != $b.numElements()$na$nb) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.DotProductUtil.dot($a, $b);
      }"""
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}
