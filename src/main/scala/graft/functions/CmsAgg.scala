package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-min sketch row/bucket arithmetic — ONE definition shared by
  * the aggregate (update path) and the query-side point-estimate
  * spelling, replayed verbatim in the DuckDB oracles: row i of an
  * item with base hash `h` (the repo's md5-parity 60-bit hash) is
  * `((a_i·(h mod p) + b_i) mod p) mod w` — the same affine-
  * permutation DISCIPLINE as MinHash (p = 2³¹−1 keeps a_i·h + b_i
  * inside a 63-bit long; the tables are CMS's own, no cross-file
  * contract). All integer arithmetic → deterministic,
  * partition-independent, engine-replayable. */
object CmsUtil {
  val P: Long = 2147483647L
  def coefA(i: Int): Long = (1000003L * (i + 1) + 12345L) % P
  def coefB(i: Int): Long = (998244353L * (i + 1) + 777L) % P
  // floorMod, not %: the aggregate accepts arbitrary longs (the SQL
  // registration can't restrict the domain), and Scala's % is
  // sign-preserving — a negative h would index the counter matrix at a
  // negative offset. floorMod == pmod, which is also what the
  // query-side point-estimate spelling and the DuckDB oracle use, so
  // the two spellings agree on the full long domain.
  def bucket(h: Long, i: Int, w: Int): Int =
    java.lang.Math.floorMod(
      (coefA(i) * java.lang.Math.floorMod(h, P) + coefB(i)) % P, w.toLong).toInt
}

/** Aggregation buffer: the d×w counter matrix, flat row-major. */
final class CmsBuffer(val d: Int, val w: Int) {
  val counts: Array[Long] = new Array[Long](d * w)
  def add(h: Long): Unit = {
    var i = 0
    while (i < d) {
      counts(i * w + CmsUtil.bucket(h, i, w)) += 1L
      i += 1
    }
  }
  def mergeFrom(o: CmsBuffer): Unit = {
    var i = 0
    while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
  }
}

/** Count-min sketch as a Catalyst `TypedImperativeAggregate` — the
  * heavy-hitter / frequency-estimation sketch (Cormode & Muthukrishnan
  * 2005): d rows × w buckets of pure COUNTER SUMS, so unlike the
  * stock `count_min_sketch` (whose serialized form is
  * engine-specific) this one is a plain `array<bigint>` built from
  * deterministic affine-permutation bucketing — the oracle replays
  * every counter as a GROUP BY sum and every point estimate as a
  * d-way min, exactly.
  *
  * Input: one long base-hash column (hash60 of the item). Output:
  * `array<bigint>` of d×w counters, row-major. Point estimate for an
  * item = min over rows i of `counters[i·w + bucket_i(h)]` — an upper
  * bound on the true count (over-counts on collisions, never under),
  * within εN (ε = e/w) at confidence 1−δ (δ = e^−d).
  *
  * Scale shape: O(d·w) state per group regardless of item
  * cardinality, map-side partial combine, counter merges are
  * elementwise sums — frequency estimation over 100 TB of items in a
  * few KB per group, where the exact groupBy(item) shuffles every
  * distinct item. NULL inputs are skipped, like `count(item)`. For
  * high-cardinality groupings raise
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (see
  * [[TopKByScore]]'s deployment note).
  */
case class CmsSketch(
    child: Expression, d: Int, w: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] {

  require(d >= 1 && d <= 16, s"cms_sketch: d=$d rows outside [1, 16]")
  require(w >= 2, s"cms_sketch: w=$w buckets — need at least 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(d, w)

  override def update(buf: CmsBuffer, input: InternalRow): CmsBuffer = {
    val h = child.eval(input)
    if (h != null) buf.add(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: CmsBuffer): Any = new GenericArrayData(buf.counts)

  override def serialize(buf: CmsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.d)
    out.writeInt(buf.w)
    var i = 0
    while (i < buf.counts.length) { out.writeLong(buf.counts(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new CmsBuffer(in.readInt(), in.readInt())
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren(0))
  override def prettyName: String = "cms_sketch"
}
