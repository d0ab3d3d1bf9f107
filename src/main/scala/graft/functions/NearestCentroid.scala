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

  /** THE parity-pinned distance fold: Σ_i ((double)v_{off+i} − c_i)²
    * in element order — the identical op sequence as the DuckDB
    * oracle's list_reduce spelling ((0 + t₁²) + t₂²) + …, so cell
    * assignments and PQ codes are bit-for-bit reproducible
    * cross-engine. ONE definition (review r10, functions pass: this
    * fold previously lived in four hand-maintained copies —
    * nearestOf, NearestCells, PqEncode, PqFitExplode — any one of
    * which could drift alone and silently break parity for its
    * path). `off` windows a subspace for the PQ callers. */
  def distSq(v: Array[Float], off: Int, c: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < c.length) {
      val t = v(off + i).toDouble - c(i)
      d += t * t
      i += 1
    }
    d
  }

  /** Index of the centroid with the smallest squared L2 distance to
    * `e`, ties to the lowest index; −1 when NO finite distance exists
    * (a NaN-poisoned vector — every comparison false). Callers turn
    * −1 into NULL so the bad vector is visibly dropped on every path
    * instead of silently polluting cell 0 (review r10: the encode
    * path used to default to 0 while the routing path emitted −1). */
  def nearest(e: ArrayData, cs: Array[Array[Double]]): Int =
    nearestOf(toFloats(e), cs)

  /** [[nearest]] over an already-copied vector. */
  def nearestOf(v: Array[Float], cs: Array[Array[Double]]): Int =
    nearestAt(v, 0, cs)

  /** [[nearestOf]] over the subspace window starting at `off` — the
    * PQ per-subspace nearest-code scan ([[distSq]] is the shared
    * fold; −1 when no finite distance exists). */
  def nearestAt(v: Array[Float], off: Int, cs: Array[Array[Double]]): Int = {
    var best = -1
    var bestD = Double.PositiveInfinity
    var k = 0
    while (k < cs.length) {
      val d = distSq(v, off, cs(k))
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
    else {
      val k = NearestCentroidUtil.nearest(e, centroids)
      if (k < 0) null else k // NaN-poisoned: no finite distance
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, e => s"""
      if ($e.numElements() != $dims) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.NearestCentroidUtil.nearest($e, $cRef);
        if (${ev.value} < 0) { ${ev.isNull} = true; }
      }""")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroid"
  // content-based equality over the reference-object table, so
  // identical expressions CSE (see RefArrays)
  override def equals(o: Any): Boolean = o match {
    case x: NearestCentroid =>
      x.child == child && RefArrays.same(x.centroids, centroids)
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode + RefArrays.hash(centroids)
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
      val d = NearestCentroidUtil.distSq(v, 0, centroids(k))
      if (d < bd(n - 1)) {
        var j = n - 1
        while (j > 0 && d < bd(j - 1)) {
          bd(j) = bd(j - 1); bc(j) = bc(j - 1); j -= 1
        }
        bd(j) = d; bc(j) = k
      }
      k += 1
    }
    // a NaN distance never inserts, so unfilled −1 slots mean fewer
    // than n routable cells: drop them, and a vector with NO routable
    // cell at all yields NULL — the same visible drop as
    // [[NearestCentroid]] (review r10: the two paths used to disagree,
    // cell-0 pollution on encode vs silent vanish on search)
    var filled = 0
    while (filled < n && bc(filled) >= 0) filled += 1
    if (filled == 0) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bc, filled))
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
  override def prettyName: String = "nearest_cells"
  override def equals(o: Any): Boolean = o match {
    case x: NearestCells => x.child == child && x.nProbe == nProbe &&
      RefArrays.same(x.centroids, centroids)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + nProbe) + RefArrays.hash(centroids)
}
