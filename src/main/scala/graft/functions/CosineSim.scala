package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

object CosineSimUtil {
  /** Cosine similarity of two float vectors, accumulated in double in
    * element order — the SAME op sequence as the higher-order-function
    * fold it replaces (and as the DuckDB oracle's list_reduce), so
    * results are bit-identical while running ~10× faster as a tight
    * primitive loop. Returns NaN when either norm is 0. Callers
    * guarantee equal lengths ([[CosineSim]] nulls ragged pairs out
    * before reaching here, matching zip_with/list_zip semantics). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Native codegen'd cosine similarity (`array<float> × array<float> →
  * double`) for the similarity-search operators — replaces an
  * interpreted zip_with/aggregate fold in the hot path. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // ragged pairs yield NULL (below), so the result can be null even
  // over non-null inputs
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }
  // ragged arrays → NULL, exactly like the zip_with fold this
  // replaces (zip_with null-pads the shorter side → null product →
  // null aggregate) and DuckDB's list_zip — a corrupt short vector
  // must not silently rank by its common prefix
  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    if (av.numElements() != bv.numElements()) null
    else CosineSimUtil.cosine(av, bv)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.CosineSimUtil.cosine($a, $b);
      }""")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}
