package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aggregation buffer: bounded top-k set of (score, key) pairs.
  * Kept as capacity-k sorted arrays with an explicit `size` — an
  * accepted insert shifts IN PLACE (review r10, functions pass: the
  * old immutable-array spelling allocated and copied two fresh arrays
  * per accepted row, O(n·k) allocation for ascending input — in the
  * update hot path of every streaming top-k group). Ordering: higher
  * score first, then key ascending (deterministic ties). */
final class TopKBuffer(val k: Int) {
  var size: Int = 0
  var scores: Array[Double] = new Array[Double](k)
  var keys: Array[UTF8String] = new Array[UTF8String](k)

  // java.lang.Double.compare, not primitive >: a TOTAL order that
  // ranks NaN above every finite score, exactly where Spark's and
  // DuckDB's DESC sorts place it — primitive comparisons are always
  // false for NaN, which made buffer contents depend on partial-merge
  // arrival order
  private def beats(s: Double, key: UTF8String, i: Int): Boolean = {
    val c = java.lang.Double.compare(s, scores(i))
    c > 0 || (c == 0 && key.compareTo(keys(i)) < 0)
  }

  def insert(s: Double, key: UTF8String): Unit = {
    var pos = size
    var i = 0
    var found = false
    while (i < size && !found) {
      if (beats(s, key, i)) { pos = i; found = true }
      i += 1
    }
    if (pos >= k) return
    // shift [pos, last) right one slot in place; a full buffer drops
    // its former last element
    var j = math.min(size, k - 1)
    while (j > pos) {
      scores(j) = scores(j - 1); keys(j) = keys(j - 1); j -= 1
    }
    scores(pos) = s
    keys(pos) = key
    if (size < k) size += 1
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.size) { insert(o.scores(i), o.keys(i)); i += 1 }
  }
}

/** True top-K as a Catalyst `TypedImperativeAggregate` — the streaming
  * form of the Redis sink's rebuilt sorted sets
  * (EngagementRedisSink.scala:186-197). Unlike `orderBy().limit(k)`,
  * this aggregates with O(k) state per group, merges partial buffers
  * (map-side combine works), and therefore drops into
  * `groupBy(window(...)).agg(...)` in Structured Streaming where a
  * global sort is unusable.
  *
  * Input: (score double, key string). Output:
  * `array<struct<score:double, key:string>>` ranked best-first with
  * deterministic tie-break (score desc, key asc).
  *
  * DEPLOYMENT NOTE (measured, KnnScaleProbe): ObjectHashAggregateExec
  * falls back to SORT-based aggregation once a partition sees more
  * than `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * distinct groups — and the DEFAULT is 128. A high-cardinality
  * grouping (one group per query/user/document) then silently sorts
  * the entire pre-aggregate input by group key instead of hashing:
  * the kNN-label probe measured 68 s → 23 s at 1M vectors / 200k
  * groups just from raising the threshold. The buffers here are O(k)
  * small, so millions of in-flight groups are cheap — the engine's
  * harness sessions (Verify/Bench/QTime) set the threshold to 2²²;
  * set it likewise in any session running high-cardinality bounded-
  * state aggregations. The protection is intrinsic since r11: every
  * builder of these aggregates calls [[ConfGuard.checkBoundedAgg]],
  * which warns (or, under `graft.boundedAgg.guard=error`, refuses)
  * when a session sits at the hazardous default.
  */
case class TopKByScore(
    scoreExpr: Expression, keyExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("key", StringType, nullable = false))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val key = keyExpr.eval(input)
    if (s != null && key != null) {
      // clone: the UTF8String points into the current (reused) row buffer
      buf.insert(s.asInstanceOf[Double], key.asInstanceOf[UTF8String].clone())
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < rows.length) {
      rows(i) = InternalRow(buf.scores(i), buf.keys(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.scores(i))
      val kb = buf.keys(i).getBytes
      out.writeInt(kb.length)
      out.write(kb)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.scores(i) = in.readDouble()
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.keys(i) = UTF8String.fromBytes(kb)
      i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), keyExpr = newChildren(1))
  override def prettyName: String = "topk_by_score"
}
