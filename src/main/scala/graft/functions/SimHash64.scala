package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Per-token compute kernels shared by the interpreted `eval` and the
  * generated code — one static call site keeps both paths identical and
  * lets the expression live inside WholeStageCodegen without per-row
  * virtual dispatch. */
object SimHashUtil {
  /** 64-bit token hash from two 32-bit murmur3 passes (seeds 42/1042)
    * over the UTF-8 bytes — deterministic, allocation-free. */
  def hash64(s: UTF8String): Long = {
    val lo = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), 42)
    val hi = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), 1042)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  /** SimHash over a token array: per-bit majority vote of token hashes.
    * Null elements are skipped; empty input → 0L. */
  def simhash64(arr: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hash64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          acc(b) += (((h >>> b) & 1L).toInt << 1) - 1  // +1 or −1 per bit
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5-prefix token hash — bit-identical to the engine's
    * `hash60` column form (`conv(substr(md5(x),1,15),16,10)`) and its
    * DuckDB spelling: the first 15 hex chars of md5 are the top 60 bits
    * of the first 8 digest bytes (big-endian), i.e. `beLong >>> 4`. */
  def hash60(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val be =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }

  /** 60-bit SimHash using the md5-prefix token hash — slower than the
    * murmur3 form but exactly reproducible in DuckDB SQL, so simhash
    * queries are oracle-checkable end to end. Null elements skipped;
    * empty input → 0L. */
  def simhash60(arr: ArrayData): Long = {
    val acc = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hash60(arr.getUTF8String(i))
        var b = 0
        while (b < 60) {
          acc(b) += (((h >>> b) & 1L).toInt << 1) - 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Native Catalyst expression: 64-bit SimHash fingerprint of a token
  * array (`array<string> → long`).
  *
  * SimHash is a locality-sensitive fingerprint — near-duplicate token
  * streams differ in few bits, so near-dup detection becomes a Hamming
  * ball / band join over longs. The reference has nothing comparable;
  * this is part of the training-data-pipeline extension surface
  * (SURVEY.md §7.2-6). Implemented as a codegen'd expression (not a
  * Scala UDF): no row boxing, lives inside WholeStageCodegen spans.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got ${t.sql}")
    }
  }
  override def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Native Catalyst expression: 60-bit SimHash over the md5-prefix token
  * hash (`array<string> → long`). Same vote semantics as [[SimHash64]],
  * but the token hash has an exact DuckDB spelling
  * (`CAST('0x'||substr(md5(t),1,15) AS BIGINT)`), making simhash-based
  * dedup queries oracle-checkable. Keep [[SimHash64]] (murmur3) as the
  * fast path when differential checking isn't needed. */
case class SimHash60Md5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash60_md5 expects array<string>, got ${t.sql}")
    }
  }
  override def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash60(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash60($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash60Md5 =
    copy(child = newChild)
  override def prettyName: String = "simhash60_md5"
}
