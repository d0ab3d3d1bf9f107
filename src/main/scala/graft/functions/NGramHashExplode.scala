package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Generator (UDTF-class extension): explode the DISTINCT
  * word-n-gram shingle hashes of a token array in one pass —
  * `array<string> → rows of (h: long)` — without materializing shingle
  * strings or intermediate arrays.
  *
  * Drop-in equivalent of `explode(shingleHashes(shingles(toks)))`
  * (TextOps): emits the same 60-bit md5-prefix values
  * (`conv(substr(md5(s),1,15),16,10) % p` ≡ parsing the first 15 hex
  * digits of the digest), so the DuckDB oracle parity of the inverted-
  * index near-dup queries is preserved bit-for-bit — covered by a
  * multiset-equality test against the expression-composed form.
  *
  * <3 tokens → one shingle of the whole (space-joined) text; empty
  * dedup via an open-addressed long set sized to the shingle count.
  */
object NGramHashExplode {
  /** Same modulus as [[graft.ops.TextOps.MinhashP]] — keeps generator
    * output identical to `shingleHashes(shingles(toks))`. */
  val HashP: Long = 2147483647L
}

case class NGramHashExplode(child: Expression, n: Int = 3)
  extends UnaryExpression with CollectionGenerator with CodegenFallback {

  override val inline: Boolean = false
  override def position: Boolean = false
  override def collectionType: DataType = ArrayType(LongType, containsNull = false)
  override def elementSchema: StructType =
    StructType(Seq(StructField("h", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_hash_explode expects array<string>, got ${t.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Iterator.empty
    val toks = arr.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val md = MessageDigest.getInstance("MD5")

    def hashOf(s: String): Long = {
      val d = md.digest(s.getBytes("UTF-8"))
      md.reset()
      // first 15 hex digits of the digest == 60 bits, big-endian
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = d(i) & 0xff
        if (i < 7) v = (v << 8) | b
        else v = (v << 4) | (b >>> 4)   // 15th hex digit = high nibble
        i += 1
      }
      v % NGramHashExplode.HashP
    }

    if (m == 0) {
      Iterator.single(InternalRow(hashOf("")))
    } else if (m < n) {
      val whole = (0 until m).map(i =>
        if (toks.isNullAt(i)) "" else toks.getUTF8String(i).toString)
        .mkString(" ")
      Iterator.single(InternalRow(hashOf(whole)))
    } else {
      val seen = new java.util.HashSet[Long](m * 2)
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow](m - n + 1)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= m - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          if (!toks.isNullAt(i + j)) sb.append(toks.getUTF8String(i + j).toString)
          j += 1
        }
        val h = hashOf(sb.toString)
        if (seen.add(h)) out += InternalRow(h)
        i += 1
      }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramHashExplode =
    copy(child = newChild)
  override def prettyName: String = "ngram_hash_explode"
}
