package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token statistics for the corpus feature scan:
  * `array<string>` → struct of the INTEGER counts behind the
  * repetition and quality metrics —
  * `(n_tokens, n_distinct, top_freq, n_bigrams, n_distinct_bigrams,
  * stop_hits, marker_hits)`.
  *
  * Native replacement for the interpreted-HOF spellings in the fused
  * feature projection, which were the measured hot loop of
  * q_corpus_pipeline / q_rep_quality: `top_freq` as
  * `array_max(transform(array_distinct(t), u -> size(filter(t, _ = u))))`
  * is O(distinct·n) with per-element interpreted `Expression.eval`
  * (HOFs are CodegenFallback and have no CSE — see the PERF.md note);
  * this pass is O(n) over a JVM hash map. The DOUBLE math (ratios,
  * rounding, quality weights) stays in the surrounding columns
  * unchanged, so oracle parity is untouched: these are exact integer
  * counts, identical by construction to the composed form —
  *   - distinct/equality is binary UTF8String equality (what `=` and
  *     `array_distinct` use on strings),
  *   - bigrams are `tok[i] + " " + tok[i+1]` (the `concat_ws` form),
  *     counted only when n ≥ 2 (`n_bigrams` = n−1, else 0),
  *   - `top_freq` of an empty array is 0 (the composed form's
  *     `coalesce(array_max(...), 0)`),
  *   - `stop_hits`/`marker_hits` count tokens contained in the two
  *     fixed lexicons (`isInCollection` semantics).
  * Null input → null struct. Null ELEMENTS cannot occur in `tokens()`
  * output (split never yields them) and are skipped defensively.
  */
case class TokenStats(child: Expression,
    stopwords: Seq[String], markers: Seq[String])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TokenStats.schema
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_stats expects array<string>, got ${t.sql}")
  }

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  @transient private lazy val markerSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](markers.size * 2)
    markers.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(arr: Any): Any = {
    val toks = arr.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val freq = new java.util.HashMap[UTF8String, Int](m * 2)
    var stopHits = 0
    var markerHits = 0
    var topFreq = 0
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        val c = freq.merge(t, 1, (a, b) => a + b)
        if (c > topFreq) topFreq = c
        if (stopSet.contains(t)) stopHits += 1
        if (markerSet.contains(t)) markerHits += 1
      }
      i += 1
    }
    var nBigrams = 0
    var nDistinctBigrams = 0
    if (m >= 2) {
      nBigrams = m - 1
      val seen = new java.util.HashSet[UTF8String](m * 2)
      i = 0
      while (i < m - 1) {
        // concat_ws(" ", a, b): null slots are skipped, not rendered
        val a = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        val b = if (toks.isNullAt(i + 1)) null else toks.getUTF8String(i + 1)
        val bg =
          if (a == null) { if (b == null) UTF8String.EMPTY_UTF8 else b }
          else if (b == null) a
          else UTF8String.concat(a, TokenStats.Space, b)
        if (seen.add(bg)) nDistinctBigrams += 1
        i += 1
      }
    }
    InternalRow(m, freq.size(), topFreq, nBigrams, nDistinctBigrams,
      stopHits, markerHits)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
  override def prettyName: String = "token_stats"
}

object TokenStats {
  private val Space = UTF8String.fromString(" ")
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_freq", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_distinct_bigrams", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("marker_hits", IntegerType, nullable = false)))
}
