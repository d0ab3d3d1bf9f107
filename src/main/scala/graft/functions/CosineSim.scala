package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Element-null scan for the vector expressions. `getFloat` on a null
  * slot reads 0.0f, so without this check a null-poisoned vector would
  * silently score/hash by its zero-filled form — whereas the composed
  * zip_with/aggregate folds (and the DuckDB list_reduce oracle twin)
  * return NULL. One spelling for [[CosineSim]], [[DotProduct]], and
  * [[SignLshBucket]] (review r10, functions pass). Public: invoked
  * from generated code. */
object ArrayNulls {
  def anyNull(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Whether `e`'s elements can be null AT ALL, per its schema. The
    * parquet embedding columns are `array<float> containsNull=false`,
    * so the per-row element scan above would be pure overhead on the
    * brute-force ANN hot path — callers skip it statically when the
    * type rules nulls out. */
  def mayHaveNullElements(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }
}

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
  // must not silently rank by its common prefix. Null ELEMENTS → NULL
  // for the same reason (a null slot reads as 0.0f otherwise —
  // ArrayNulls).
  // the element scan is skipped statically when the schema already
  // rules element nulls out (the parquet embedding columns do)
  private def scanLeft = ArrayNulls.mayHaveNullElements(left)
  private def scanRight = ArrayNulls.mayHaveNullElements(right)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    if (av.numElements() != bv.numElements() ||
        (scanLeft && ArrayNulls.anyNull(av)) ||
        (scanRight && ArrayNulls.anyNull(bv))) null
    else CosineSimUtil.cosine(av, bv)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // `||` must sit at END of line: the code-block interpolator strips
    // margin `|` chars, so a line-leading `||` vanishes from the
    // generated Java and the whole expression falls back to
    // interpreted mode on a Janino parse error
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = if (scanLeft) s" || graft.functions.ArrayNulls.anyNull($a)" else ""
      val nb = if (scanRight) s" || graft.functions.ArrayNulls.anyNull($b)" else ""
      s"""
      if ($a.numElements() != $b.numElements()$na$nb) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.CosineSimUtil.cosine($a, $b);
      }"""
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}
