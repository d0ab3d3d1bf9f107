package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bigint → boolean`: membership probe of a long key against a
  * driver-built [[BloomFilter]] riding as a REFERENCE OBJECT — the
  * [[NearestCentroid]] discipline applied to semi-join reduction.
  *
  * Why not Spark's own `BloomFilterMightContain`: that expression
  * requires the serialized sketch as a FOLDABLE child, i.e. a binary
  * LITERAL carrying megabytes inside the expression tree — copied
  * with every plan transform and hashed by every canonicalization.
  * Here the filter is a transient-free object reference (shipped once
  * per executor in the task binary, like the quantizer tables), the
  * probe is the same codegen'd `mightContainLong`, and plan-tree
  * copies stay O(1). `stat.bloomFilter` over a long column inserts
  * via putLong — exactly what `mightContainLong` probes.
  *
  * Equality is child + filter IDENTITY (a plan reuses the one
  * instance it was built with; canonicalization must not hash the
  * bit array). False positives are the caller's contract: filter
  * survivors must re-verify through an exact join. */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with Predicate {
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects bigint, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.mightContainLong($v);")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
  override def equals(o: Any): Boolean = o match {
    case x: BloomMightContain => x.child == child && (x.bloom eq bloom)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode + System.identityHashCode(bloom)
}
