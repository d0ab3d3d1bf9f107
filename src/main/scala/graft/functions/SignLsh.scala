package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

object SignLshUtil {
  /** Sign-LSH bucket id: bit j set iff plane_j · e > 0, each dot a
    * sequential fold of (double)e_i × w_i in element order — the SAME
    * op sequence as [[graft.ops.VectorOps.lshBucket]]'s interpreted
    * zip_with/aggregate fold and the DuckDB oracle's list_reduce, so
    * bucket ids are bit-identical while running as a primitive loop. */
  def bucket(e: ArrayData, planes: Array[Array[Double]]): Long = {
    var b = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var d = 0.0
      var i = 0
      while (i < p.length) {
        d += e.getFloat(i).toDouble * p(i)
        i += 1
      }
      if (d > 0) b |= 1L << j
      j += 1
    }
    b
  }
}

/** `array<float> → bigint`: codegen'd sign-LSH bucketing over a
  * reference-object hyperplane table — replaces nBits interpreted
  * higher-order-function folds per row in the ANN candidate-generation
  * hot path. Purely map-side; the planes (nBits×dims doubles) ride
  * with the serialized expression. Ragged vectors yield NULL. */
case class SignLshBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length <= 63,
    "sign_lsh_bucket needs 1..63 hyperplanes")
  require(planes.forall(_.length == planes(0).length),
    "sign_lsh_bucket: ragged plane table (rows of unequal dims)")
  private val dims = planes(0).length
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_bucket expects array<float>, got ${t.sql}")
  }
  // ragged OR null-poisoned vectors yield NULL (a null slot reads as
  // 0.0f and would hash to a legitimate bucket otherwise — ArrayNulls);
  // the element scan is skipped statically when the schema rules
  // element nulls out (see ArrayNulls.mayHaveNullElements)
  private def scanNulls = ArrayNulls.mayHaveNullElements(child)
  override def nullSafeEval(a: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    if (e.numElements() != dims || (scanNulls && ArrayNulls.anyNull(e))) null
    else SignLshUtil.bucket(e, planes)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "double[][]")
    // `||` at END of line — a line-leading `||` is margin-stripped
    // out of the generated Java (see CosineSim.doGenCode)
    nullSafeCodeGen(ctx, ev, e => {
      val ne = if (scanNulls) s" || graft.functions.ArrayNulls.anyNull($e)" else ""
      s"""
      if ($e.numElements() != $dims$ne) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.SignLshUtil.bucket($e, $pRef);
      }"""
    })
  }
  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)
  override def prettyName: String = "sign_lsh_bucket"
  // content-based equality over the plane table, so identical
  // expressions CSE (see RefArrays)
  override def equals(o: Any): Boolean = o match {
    case x: SignLshBucket => x.child == child && RefArrays.same(x.planes, planes)
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode + RefArrays.hash(planes)
}
