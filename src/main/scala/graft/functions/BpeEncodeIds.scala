package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass BPE encode of a whole token array to piece ids:
  * `array<string>` → `array<int>` — the per-document id
  * materialization of q_bpe_tokens as ONE native expression call per
  * document (the TokenStats precedent: the interpreted-HOF spelling
  * of the same fold — 4 chained `aggregate` lambdas per token
  * occurrence — measured ~2 µs/token, 20.5 s for the sf0.1 bench
  * corpus; this pass is scan-bound).
  *
  * Semantics are EXACTLY the composed form's
  * (`Retrieval.applyMerges(split(token, ""), merges)` per ≥2-char
  * token, the token itself as its single piece otherwise, empty
  * tokens skipped, ids = positions in the sorted piece lexicon,
  * pieces outside the lexicon → null element):
  *   - the char split is UTF-16-unit granular (Java `split("")`,
  *     what Spark's `split(col, "")` produces);
  *   - each merge (a, b) applies greedy left-to-right — "aaa" under
  *     (a, a) becomes [aa, a] — in learned order;
  *   - the ≥2-char test is CODEPOINT length (Spark `length()`).
  *
  * The per-token fold result is memoized in a per-task map, so the
  * fold runs once per DISTINCT token per task (the vocab-granularity
  * discipline, without the broadcast-join + regroup exchange the
  * first q_bpe_tokens spelling paid — NOTES_r14); memo size is
  * bounded by the task's distinct-token count.
  */
case class BpeEncodeIds(child: Expression,
    merges: Seq[(String, String)], lexicon: Seq[String])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_ids expects array<string>, got ${t.sql}")
  }

  @transient private lazy val idOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](lexicon.size * 2)
    lexicon.zipWithIndex.foreach { case (p, i) => m.put(p, Integer.valueOf(i)) }
    m
  }

  // per-task memo: distinct token → its id array (null elements for
  // out-of-lexicon pieces). UTF8String keys are COPIED on insert —
  // the input slice aliases a reusable row buffer.
  @transient private lazy val memo =
    new java.util.HashMap[UTF8String, Array[Any]]()

  private def encodeToken(t: UTF8String): Array[Any] = {
    val s = t.toString
    val pieces: Seq[String] =
      if (t.numChars() < 2) Seq(s)
      else {
        // Java split("") granularity: UTF-16 units
        var syms = new Array[String](s.length)
        var i = 0
        while (i < s.length) { syms(i) = String.valueOf(s.charAt(i)); i += 1 }
        merges.foreach { case (a, b) =>
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var j = 0
          while (j < syms.length) {
            val x = syms(j)
            if (out.nonEmpty && out.last == a && x == b)
              out(out.length - 1) = a + b
            else out += x
            j += 1
          }
          syms = out.toArray
        }
        syms.toSeq
      }
    pieces.map(p => idOf.get(p): Any).toArray
  }

  override def nullSafeEval(arr: Any): Any = {
    val toks = arr.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * 2)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        if (t.numBytes() > 0) {
          var ids = memo.get(t)
          if (ids == null) {
            ids = encodeToken(t)
            memo.put(t.clone(), ids)
          }
          out ++= ids
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def prettyName: String = "bpe_encode_ids"
  override protected def withNewChildInternal(c: Expression): BpeEncodeIds =
    copy(child = c)
}
