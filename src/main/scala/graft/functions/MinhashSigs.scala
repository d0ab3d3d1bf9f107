package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass k-permutation MinHash signature:
  * `array<long>` (pre-reduced shingle hashes) →
  * `array<long>` of `min_h((a_i·h + b_i) mod p)` for i < k.
  *
  * Native replacement for the composed
  * `array(array_min(transform(hs, h -> (h·a_i + b_i) % p)) × k)` —
  * k interpreted traversals of the hash array per row (HOFs are
  * CodegenFallback, no CSE) become ONE compiled pass that maintains
  * all k minima simultaneously. Values are bit-identical: same affine
  * coefficients, same 63-bit-safe long arithmetic (`h < p ≤ 2³¹`,
  * `a < 2³¹`, so `a·h + b < 2⁶³` — no overflow on either engine), and
  * an EMPTY input yields k nulls exactly like `array_min([])`.
  * Null input → null. The coefficient arrays ride along as reference
  * objects, evaluated once per task. */
case class MinhashSigs(child: Expression, coefA: Array[Long],
    coefB: Array[Long], p: Long)
  extends UnaryExpression with CodegenFallback {

  // the documented contract, ENFORCED (review r10, functions pass):
  // mismatched coefficient arrays previously failed per-row deep in a
  // task (AIOOBE), and an oversized p silently overflowed `a·h + b`
  // into wrong signatures with no error
  require(coefA.length == coefB.length,
    s"minhash_sigs: ${coefA.length} a-coefficients vs ${coefB.length} " +
      "b-coefficients — the permutation tables must align")
  require(coefA.nonEmpty, "minhash_sigs needs at least one permutation")
  require(p > 0 && p <= (1L << 31),
    s"minhash_sigs: p=$p outside (0, 2^31] — the 63-bit no-overflow " +
      "bound of a*h + b requires h < p <= 2^31")
  require(coefA.forall(a => a > 0 && a < (1L << 31)) &&
      coefB.forall(b => b >= 0 && b < (1L << 31)),
    "minhash_sigs: coefficients outside [0, 2^31) break the 63-bit " +
      "no-overflow bound")

  private def k = coefA.length

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<long>, got ${t.sql}")
  }

  override def nullSafeEval(arr: Any): Any = {
    val hs = arr.asInstanceOf[ArrayData]
    val m = hs.numElements()
    if (m == 0) return new GenericArrayData(new Array[Any](k))
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < m) {
      // shingleHashes never emits nulls; guard anyway (null = skipped,
      // matching array_min's null-ignoring semantics)
      if (!hs.isNullAt(i)) {
        seen = true
        val h = hs.getLong(i)
        var j = 0
        while (j < k) {
          val v = (h * coefA(j) + coefB(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) new GenericArrayData(new Array[Any](k))
    else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
  override def prettyName: String = "minhash_sigs"
  // content-based equality over the coefficient tables, so identical
  // expressions CSE (see RefArrays)
  override def equals(o: Any): Boolean = o match {
    case x: MinhashSigs => x.child == child && x.p == p &&
      RefArrays.same(x.coefA, coefA) && RefArrays.same(x.coefB, coefB)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * (31 * child.hashCode + p.hashCode) +
      RefArrays.hash(coefA)) + RefArrays.hash(coefB)
}
