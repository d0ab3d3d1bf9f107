package graft.functions

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
  * <3 tokens → one shingle of the whole (space-joined) text. Dedup is
  * on the shingle STRING (a HashSet[String]), deliberately NOT on the
  * hash: two distinct shingles colliding to one 60-bit hash must emit
  * BOTH rows, exactly like the composed `array_distinct(shingles)`
  * form — deduping on the hash would silently change the multiset and
  * break the pinned oracle equality.
  */
object NGramHashExplode {
  /** Same modulus as [[graft.ops.TextOps.MinhashP]] — keeps generator
    * output identical to `shingleHashes(shingles(toks))`. */
  val HashP: Long = 2147483647L

  /** The one shared hashing pass: distinct word-n-gram shingle hashes
    * of a token array, FIRST-OCCURRENCE order — exactly
    * `shingleHashes(shingles(toks))` (array_distinct keeps first
    * occurrences; dedup is on the shingle STRING, so hash collisions
    * survive as duplicates, matching the composed form and the
    * oracle's list_distinct). Used by the generator
    * ([[NGramHashExplode]]) and the array form ([[NGramHashes]]) so
    * the two can never drift. */
  def distinctHashes(toks: ArrayData, n: Int): Array[Long] = {
    val m = toks.numElements()

    def hashOf(s: String): Long =
      SimHashUtil.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) % HashP

    // concat_ws semantics: null tokens are SKIPPED, not rendered as
    // empty slots — keeps shingle strings identical to the composed
    // `concat_ws(" ", …)` form
    def joined(from: Int, count: Int): String = {
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < count) {
        if (!toks.isNullAt(from + j)) {
          if (sb.length > 0) sb.append(' ')
          sb.append(toks.getUTF8String(from + j).toString)
        }
        j += 1
      }
      sb.toString
    }

    if (m == 0) {
      Array(hashOf(""))
    } else if (m < n) {
      Array(hashOf(joined(0, m)))
    } else {
      val seen = new java.util.HashSet[String](m * 2)
      val out = new scala.collection.mutable.ArrayBuilder.ofLong
      out.sizeHint(m - n + 1)
      var i = 0
      while (i <= m - n) {
        val sh = joined(i, n)
        if (seen.add(sh)) out += hashOf(sh)
        i += 1
      }
      out.result()
    }
  }
}

/** Array form of [[NGramHashExplode]]: `array<string> → array<long>`
  * of the distinct shingle hashes in one pass — the fast native twin
  * of `shingleHashes(shingles(toks))` for projections that keep the
  * hash SET in the row (the fused corpus feature scan) instead of
  * exploding it. Same values, same order, same single hashing pass. */
case class NGramHashes(child: Expression, n: Int = 3)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(arr: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      NGramHashExplode.distinctHashes(arr.asInstanceOf[ArrayData], n))

  override protected def withNewChildInternal(newChild: Expression): NGramHashes =
    copy(child = newChild)
  override def prettyName: String = "ngram_hashes"
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
    NGramHashExplode.distinctHashes(arr.asInstanceOf[ArrayData], n)
      .iterator.map(InternalRow(_))
  }

  override protected def withNewChildInternal(newChild: Expression): NGramHashExplode =
    copy(child = newChild)
  override def prettyName: String = "ngram_hash_explode"
}
