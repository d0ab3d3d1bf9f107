package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Aggregation buffer for [[HdrSketch]]: bucket-floor → count, kept
  * sorted (TreeMap) so eval/serialize order is canonical regardless
  * of insertion/merge order. State is intrinsically bounded when fed
  * [[graft.functions.hdr_bucket_lo]] output (≤ ~64·63 + 64 buckets
  * over the full positive long domain); a defensive cap fails fast if
  * a caller aggregates raw values instead of bucket floors — silent
  * unbounded state is the one failure a sketch must not have. */
final class HdrBuffer {
  val counts = new java.util.TreeMap[Long, Long]()

  def insert(lo: Long, c: Long): Unit = {
    val prev = counts.get(lo)
    counts.put(lo, (if (prev == null) 0L else prev.longValue()) + c)
    if (counts.size > HdrBuffer.MaxBuckets)
      throw new IllegalStateException(
        s"hdr_sketch: more than ${HdrBuffer.MaxBuckets} distinct buckets — " +
          "aggregate hdr_bucket_lo(v), not raw values")
  }

  def mergeFrom(o: HdrBuffer): Unit = {
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); insert(e.getKey, e.getValue) }
  }
}

object HdrBuffer {
  /** 64 exact small-value buckets + ≤ 64 mantissa buckets for each of
    * ≤ 57 exponents ≈ 3.7k is the intrinsic domain bound; 2¹⁶ leaves
    * generous headroom for future wider mantissas. */
  val MaxBuckets = 1 << 16
}

/** HDR-HISTOGRAM / DDSketch-family QUANTILE sketch as a Catalyst
  * `TypedImperativeAggregate` — the deterministic mergeable rank
  * sketch next to [[KmvMinHashes]]/[[CmsSketch]] (r11 verdict #6):
  * q_quantile_sample's bottom-k reservoir is bounded-state but only
  * probabilistically accurate; this gives a GUARANTEED relative
  * value error at every quantile.
  *
  * Why not GK/KLL: their compaction points depend on ARRIVAL ORDER,
  * so two runs over different partitionings emit different (equally
  * valid) sketches — unusable under the engine's hash-match oracle
  * discipline and non-reproducible across retries. Log-bucketed
  * histograms (HdrHistogram; DDSketch, Masson et al., VLDB 2019) are
  * a pure function of the input MULTISET: bucket floors are exact
  * integer arithmetic, counts are commutative — partitioning-, merge-
  * order- and engine-independent, hence DuckDB-replayable.
  *
  * Input: long bucket floors from [[graft.functions.hdr_bucket_lo]]
  * (value-domain buckets of relative width ≤ 1/64). Output:
  * `array<struct<lo:bigint, cnt:bigint>>` ASCENDING by floor — the
  * KMV sorted-array discipline, deterministic for the hash gate
  * (a map column's comparison order is engine-defined). The
  * quantile estimator stays in the query
  * ([[graft.functions.hdr_quantile]] — visible, oracle-matched):
  * rank r = ceil(q·n) over ascending floors; the true rank-r value v
  * satisfies lo ≤ v < lo·(1 + 1/64) + 1.
  *
  * Scale shape: O(buckets) state per group (≤ ~3.7k longs over the
  * whole positive long domain), map-side partial combine, mergeable
  * buffers — a 100 TB per-group quantile never shuffles values and
  * never sorts (the exact spelling sorts the group or shuffles the
  * full value histogram). NULLs are skipped like count(col). For
  * high-cardinality groupings raise the ObjectHashAggregate fallback
  * threshold (ConfGuard fires on the builder, as for KMV/CMS).
  */
case class HdrSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HdrBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = HdrSketch.SketchType

  // update() reads the child as a raw Long, so reject anything that is
  // not BIGINT at analysis time (ADVICE r12: an INT column previously
  // died mid-execution with a ClassCastException).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hdr_sketch expects bigint bucket floors (hdr_bucket_lo output), " +
        s"got ${t.sql}")
  }

  override def createAggregationBuffer(): HdrBuffer = new HdrBuffer

  override def update(buf: HdrBuffer, input: InternalRow): HdrBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: HdrBuffer, other: HdrBuffer): HdrBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: HdrBuffer): Any = {
    val rows = new Array[Any](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      rows(i) = new GenericInternalRow(
        Array[Any](e.getKey.longValue(), e.getValue.longValue()))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: HdrBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HdrBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new HdrBuffer
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.counts.put(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HdrSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HdrSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HdrSketch =
    copy(child = newChildren(0))
  override def prettyName: String = "hdr_sketch"
}

object HdrSketch {
  val SketchType: DataType = ArrayType(
    StructType(Seq(
      StructField("lo", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
}
