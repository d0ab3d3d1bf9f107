package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

object NearestCentroidUtil {
  /** One bulk copy of an `array<float>` ArrayData into a primitive
    * array. The assignment loops below read every element K times —
    * K×dims virtual `getFloat` dispatches per row (196k at
    * K=256/d=768); copying once turns them into primitive-array
    * loads the JIT can vectorize. NULL slots copy as 0.0f, matching
    * what `getFloat` reads from an UnsafeArrayData null slot. */
  def toFloats(e: ArrayData): Array[Float] = {
    val n = e.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      if (!e.isNullAt(i)) out(i) = e.getFloat(i)
      i += 1
    }
    out
  }

  /** Index of the centroid with the smallest squared L2 distance to
    * `e`, ties to the lowest index. Distance is the sequential fold
    * Σ_i ((double)e_i − c_i)² in element order — the identical op
    * sequence as the DuckDB oracle's list_reduce spelling
    * ((0 + t₁²) + t₂²) + …, so cell assignments are bit-for-bit
    * reproducible cross-engine. */
  def nearest(e: ArrayData, cs: Array[Array[Double]]): Int =
    nearestOf(toFloats(e), cs)

  /** [[nearest]] over an already-copied vector. */
  def nearestOf(v: Array[Float], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var k = 0
    while (k < cs.length) {
      val c = cs(k)
      var d = 0.0
      var i = 0
      while (i < c.length) {
        val t = v(i).toDouble - c(i)
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

/** `array<float> → array<int>`: the `nProbe` nearest centroids
  * (squared-L2 ascending, ties → lowest cell), i.e. DISTRIBUTED IVF
  * probe routing — the expression twin of the driver-side
  * [[graft.ops.Ivf.nearestCells]] for batch serving, where routing a
  * query FRAME through a collect would serialize on the driver.
  * Identical arithmetic (the same sequential fold per centroid) and
  * identical ordering, pinned against the driver form in IvfSpec.
  * Ragged vectors (length ≠ centroid dims) yield NULL, like
  * [[NearestCentroid]]. */
case class NearestCells(child: Expression, centroids: Array[Array[Double]],
    nProbe: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(centroids.nonEmpty, "nearest_cells needs at least one centroid")
  require(centroids.forall(_.length == centroids(0).length),
    "nearest_cells: ragged centroid table (rows of unequal dims)")
  require(nProbe > 0, "nearest_cells: nProbe must be positive")
  private val dims = centroids(0).length
  private val n = math.min(nProbe, centroids.length)

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects array<float>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    if (e.numElements() != dims) return null
    // insertion-select the n best (d asc, cell asc); iterating cells
    // in ascending order makes strict `<` keep the LOWEST cell on
    // distance ties — the exact order sortBy((d, cell)) produces
    val v = NearestCentroidUtil.toFloats(e)
    val bd = Array.fill(n)(Double.PositiveInfinity)
    val bc = Array.fill(n)(-1)
    var k = 0
    while (k < centroids.length) {
      val c = centroids(k)
      var d = 0.0
      var i = 0
      while (i < dims) {
        val t = v(i).toDouble - c(i)
        d += t * t
        i += 1
      }
      if (d < bd(n - 1)) {
        var j = n - 1
        while (j > 0 && d < bd(j - 1)) {
          bd(j) = bd(j - 1); bc(j) = bc(j - 1); j -= 1
        }
        bd(j) = d; bc(j) = k
      }
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bc)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
  override def prettyName: String = "nearest_cells"
}
