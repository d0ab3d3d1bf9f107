package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

object NearestCentroidUtil {
  /** Index of the centroid with the smallest squared L2 distance to
    * `e`, ties to the lowest index. Distance is the sequential fold
    * Σ_i ((double)e_i − c_i)² in element order — the identical op
    * sequence as the DuckDB oracle's list_reduce spelling
    * ((0 + t₁²) + t₂²) + …, so cell assignments are bit-for-bit
    * reproducible cross-engine. */
  def nearest(e: ArrayData, cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var k = 0
    while (k < cs.length) {
      val c = cs(k)
      var d = 0.0
      var i = 0
      while (i < c.length) {
        val t = e.getFloat(i).toDouble - c(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = k }
      k += 1
    }
    best
  }
}

/** `array<float> → int`: IVF coarse-quantizer cell assignment — the
  * k-means hot loop as a codegen'd primitive scan over a
  * reference-object centroid table. Assignment is purely map-side
  * (the centroid table rides with the serialized expression, K×dims
  * doubles), so one k-means iteration over the corpus shuffles only
  * the K per-cell partial means, never the vectors. Ragged vectors
  * (length ≠ centroid dims) yield NULL, like [[CosineSim]]. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "nearest_centroid needs at least one centroid")
  require(centroids.forall(_.length == centroids(0).length),
    "nearest_centroid: ragged centroid table (rows of unequal dims)")
  private val dims = centroids(0).length
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float>, got ${t.sql}")
  }
  override def nullSafeEval(a: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    if (e.numElements() != dims) null
    else NearestCentroidUtil.nearest(e, centroids)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, e => s"""
      if ($e.numElements() != $dims) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.NearestCentroidUtil.nearest($e, $cRef);
      }""")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroid"
}
