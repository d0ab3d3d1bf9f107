package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Aggregation buffer: the `k` smallest DISTINCT long hash values,
  * kept as a sorted ascending array with an explicit `size`. Insert
  * is binary-search + in-place shift (the [[TopKBuffer]] discipline);
  * a value already present is a no-op — the dedup is what makes this
  * a KMV cardinality sketch rather than a top-k (duplicates must not
  * occupy slots, or a heavy hitter would shrink the effective k and
  * bias the estimate up). */
final class KmvBuffer(val k: Int) {
  var size: Int = 0
  var vals: Array[Long] = new Array[Long](k)

  def insert(h: Long): Unit = {
    // binary search for the insertion point in [0, size)
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (vals(mid) < h) lo = mid + 1
      else if (vals(mid) > h) hi = mid
      else return // already present — a sketch holds distinct values
    }
    if (lo >= k) return // larger than every retained value, buffer full
    var j = math.min(size, k - 1)
    while (j > lo) { vals(j) = vals(j - 1); j -= 1 }
    vals(lo) = h
    if (size < k) size += 1
  }

  def mergeFrom(o: KmvBuffer): Unit = {
    var i = 0
    while (i < o.size) { insert(o.vals(i)); i += 1 }
  }
}

/** KMV (k-minimum-values) distinct-count sketch as a Catalyst
  * `TypedImperativeAggregate` — THE deterministic alternative to
  * HLL++ for cross-engine-checkable cardinality estimation: Spark's
  * `approx_count_distinct` and DuckDB's `approx_count_distinct` use
  * different sketches, so the approximate count can only ever be
  * bound-checked (SqlSurfaceSpec), never hash-matched. KMV over a
  * SHARED deterministic hash (the repo's md5-derived
  * [[graft.ops.TextOps.hash60]] parity spelling) is exactly
  * replayable: the k smallest distinct hash values are a pure
  * function of the input SET, independent of partitioning, merge
  * order, and engine ("Bottom-k sketches", Cohen & Kaplan 2007).
  *
  * Input: one long hash column. Output: `array<bigint>` — the ≤ k
  * smallest distinct values ASCENDING. The estimator stays in the
  * query (visible, oracle-matched): `size < k` → exact `size`, else
  * `(k−1) · 2⁶⁰ / h_(k)` for a hash uniform on [0, 2⁶⁰).
  *
  * Scale shape: O(k) state per group, map-side partial combine,
  * mergeable buffers — a 100 TB distinct-count never shuffles its
  * distinct values (the exact `countDistinct` spelling shuffles ALL
  * of them; a pre-aggregation `.distinct()` is the same shuffle).
  * NULL inputs are skipped, like `count(distinct …)`. For
  * high-cardinality groupings, raise
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (see
  * [[TopKByScore]]'s deployment note — the 128-group default demotes
  * the aggregation to sort-based).
  */
case class KmvMinHashes(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, s"kmv_min_hashes: k=$k — the (k−1)/h_(k) estimator " +
    "needs at least 2 retained values")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = child.eval(input)
    if (h != null) buf.insert(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: KmvBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.vals, buf.size))

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.vals(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.vals(i) = in.readLong(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinHashes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinHashes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMinHashes =
    copy(child = newChildren(0))
  override def prettyName: String = "kmv_min_hashes"
}
