package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `array<float> → array<int>`: all m PQ codes in ONE pass — the
  * native replacement for `array(m × nearest_centroid(slice(e, …)))`.
  *
  * The composed spelling is semantically fine but its generated
  * source grows with m: at production width (d=768 → m=96 subspaces)
  * the projection's whole-stage-codegen compile is ~20 s of janino
  * wall paid by the first task while every other task waits on the
  * compiler cache — VEC_DIM768's pq_encode ran maxTask ≈ wall at
  * BOTH k=16 and k=256 (16× the flops, same wall) because the wall
  * was compile, not compute. This expression is one fixed-size
  * generated call regardless of m; the codebooks ride as a reference
  * object and the per-row loop is a single JIT-compiled method.
  *
  * Bit-parity with the composed form (pinned in PqSpec):
  *   - per subspace s the distance is the identical sequential fold
  *     Σ_i ((double)e[s·sub+i] − c_i)² in element order, ties to the
  *     lowest code — [[NearestCentroidUtil.nearest]]'s arithmetic on
  *     an un-copied window;
  *   - a subspace whose slice is short (ragged vector) codes to NULL,
  *     exactly like nearest_centroid over a short slice();
  *   - a NULL input vector yields an array of m NULLs (what
  *     CreateArray over m null-propagating children produces), not a
  *     NULL array. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode needs at least one codebook entry per subspace")
  private val m = codebooks.length
  private val sub = codebooks(0)(0).length
  require(codebooks.forall(_.forall(_.length == sub)),
    "pq_encode: ragged codebooks (entries of unequal dims)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>, got ${t.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return new GenericArrayData(new Array[Any](m))
    val e = a.asInstanceOf[ArrayData]
    // one bulk copy; the loop below reads each element k times
    val v = NearestCentroidUtil.toFloats(e)
    val len = v.length
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val base = s * sub
      // short slice (ragged vector) → NULL code, like slice() +
      // nearest_centroid's width guard; a NaN-poisoned subspace (no
      // finite distance, nearestAt = −1) is NULL for the same reason
      if (base + sub <= len) {
        val best = NearestCentroidUtil.nearestAt(v, base, codebooks(s))
        if (best >= 0) out(s) = best
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
  // content-based equality over the codebooks, so identical
  // expressions CSE (see RefArrays)
  override def equals(o: Any): Boolean = o match {
    case x: PqEncode => x.child == child && RefArrays.same(x.codebooks, codebooks)
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode + RefArrays.hash(codebooks)
}

/** `array<int> → double`: ADC distance — the sum of m lookup-table
  * entries selected by the code array, replacing
  * `element_at(lit(lut_0), code[1]+1) + … + element_at(lit(lut_m), …)`.
  *
  * The composed spelling embeds the LUT as m×k LITERALS, so every
  * query generates DIFFERENT source and pays a fresh janino compile —
  * per-query serving latency was dominated by compilation, not the
  * scan. Here the LUT is a reference object: the expression's shape
  * (and the codegen cache key) is query-independent.
  *
  * Null semantics match the composed `+` chain: NULL code array, a
  * NULL code element, or an out-of-range code (ragged-vector encode)
  * → NULL distance. */
case class PqAdcDist(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  require(lut.nonEmpty, "pq_adc_dist needs a non-empty lookup table")
  private val m = lut.length

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_dist expects array<int>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    // a shorter array nulls out (element_at past the end is NULL in
    // the composed chain); extra trailing codes are ignored, also
    // like the composed chain, which only reads the first m
    if (codes.numElements() < m) return null
    var sum = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      val tab = lut(s)
      if (c < 0 || c >= tab.length) return null
      sum += tab(c)
      s += 1
    }
    sum
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcDist =
    copy(child = newChild)
  override def prettyName: String = "pq_adc_dist"
  override def equals(o: Any): Boolean = o match {
    case x: PqAdcDist => x.child == child && RefArrays.same(x.lut, lut)
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode + RefArrays.hash(lut)
}

/** `array<double> → array<array<double>>`: the ADC lookup table for
  * one query (residual), computed DISTRIBUTEDLY — `out(s)(j)` = exact
  * squared L2 between the query's subspace-s slice and codebook entry
  * (s, j), the same arithmetic as the driver-side `Pq.lutL2` (one
  * sequential (q−c)² fold per entry, so the tables are bit-equal —
  * PqSpec pins it).
  *
  * This is what lets BATCH serving route Q queries without a driver
  * round-trip per query: each routed (query, cell) row computes its
  * own LUT map-side (m·k·sub flops) and carries it as DATA into the
  * broadcast join against the code table, where
  * [[graft.ops.Pq.adcDistSqCol]] folds it per candidate. Codebooks
  * ride as a reference object; NULL or ragged input (width below
  * m·sub) → NULL table, the established drop path. */
case class PqLutL2(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_lut_l2 needs at least one codebook entry per subspace")
  private val m = codebooks.length
  private val sub = codebooks(0)(0).length
  require(codebooks.forall(_.forall(_.length == sub)),
    "pq_lut_l2: ragged codebooks (entries of unequal dims)")

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_lut_l2 expects array<double>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    if (e.numElements() < m * sub) return null
    val q = new Array[Double](m * sub)
    var i = 0
    while (i < q.length) {
      // a NULL component reads as 0.0 (Unsafe null slot), the same
      // value the driver-side path would see after toFloats
      q(i) = if (e.isNullAt(i)) 0.0 else e.getDouble(i)
      i += 1
    }
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val base = s * sub
      val row = new Array[Any](cb.length)
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var d = 0.0
        var k = 0
        while (k < sub) {
          val t = q(base + k) - c(k)
          d += t * t
          k += 1
        }
        row(j) = d
        j += 1
      }
      out(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutL2 =
    copy(child = newChild)
  override def prettyName: String = "pq_lut_l2"
  override def equals(o: Any): Boolean = o match {
    case x: PqLutL2 => x.child == child && RefArrays.same(x.codebooks, codebooks)
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode + RefArrays.hash(codebooks)
}

/** Generator: `array<float> → rows of (s, cell, pos, v)` — one row
  * per (subspace, in-subspace position) of a vector, tagged with the
  * subspace's PQ cell assignment. This IS one fused-PQ-fit Lloyd
  * iteration's input: `groupBy(s, cell, pos).agg(decimal mean of v)`
  * advances every codebook at once.
  *
  * Why a generator and not `pq_encode` + `posexplode`: the optimizer
  * collapses adjacent projections THROUGH a Generate, so a codes
  * column computed next to an explode is inlined into the consuming
  * projection and re-evaluated once per EXPLODED row — dims
  * re-evaluations of an m×k×sub assignment per vector (measured as a
  * pq_fit leg that went from 114 s to not terminating). A generator's
  * expression evaluates ONCE per input row by construction; no rule
  * can inline work into its output side.
  *
  * Emission contract (bit-parity with the per-subspace fits'
  * membership, PqSpec-pinned):
  *   - a subspace with a short slice (ragged vector) emits nothing —
  *     its sequential twin's NULL-cell filter;
  *   - positions past m·sub (over-wide vector) emit nothing;
  *   - a NULL element emits (s, cell, pos, NULL) — the decimal sum
  *     skips it, exactly like summing an exploded NULL; the
  *     assignment distance reads it as 0.0f, exactly like
  *     [[NearestCentroidUtil.nearest]] over the raw array;
  *   - a NULL vector emits nothing. */
case class PqFitExplode(child: Expression,
    codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with Generator with CodegenFallback {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_fit_explode needs at least one codebook entry per subspace")
  private val m = codebooks.length
  private val sub = codebooks(0)(0).length
  require(codebooks.forall(_.forall(_.length == sub)),
    "pq_fit_explode: ragged codebooks (entries of unequal dims)")

  override def elementSchema: StructType = StructType(Seq(
    StructField("s", IntegerType, nullable = false),
    StructField("cell", IntegerType, nullable = false),
    StructField("pos", IntegerType, nullable = false),
    StructField("v", FloatType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_fit_explode expects array<float>, got ${t.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val a = child.eval(input)
    if (a == null) return Iterator.empty
    val e = a.asInstanceOf[ArrayData]
    // one bulk copy for the k-reads-per-element assignment loop; the
    // emission loop still consults the ORIGINAL ArrayData's null
    // bits (a NULL element must emit NULL, not the copied 0.0f)
    val v = NearestCentroidUtil.toFloats(e)
    val len = v.length
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](m * sub)
    var s = 0
    while (s < m) {
      val base = s * sub
      if (base + sub <= len) {
        val best = NearestCentroidUtil.nearestAt(v, base, codebooks(s))
        // a NaN-poisoned subspace (best = −1) contributes nothing to
        // the fit means — the same exclusion as a ragged slice
        var i = 0
        while (best >= 0 && i < sub) {
          val x: Any = if (e.isNullAt(base + i)) null else v(base + i)
          out += InternalRow(s, best, i, x)
          i += 1
        }
      }
      s += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): PqFitExplode =
    copy(child = newChild)
  override def prettyName: String = "pq_fit_explode"
  override def equals(o: Any): Boolean = o match {
    case x: PqFitExplode => x.child == child && RefArrays.same(x.codebooks, codebooks)
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode + RefArrays.hash(codebooks)
}
