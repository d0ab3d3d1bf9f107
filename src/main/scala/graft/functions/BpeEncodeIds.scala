package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object BpeEncodeIds {
  /** The first 256 id slots are RESERVED for raw bytes — the
    * byte-level fallback every production tokenizer guarantees
    * (GPT-2/tiktoken-style total coverage): a piece outside the
    * frozen lexicon decomposes to its UTF-8 bytes, ids 0–255, so the
    * id array is TOTAL — no null elements, ever (VERDICT r14 #3;
    * previously unseen pieces mapped to null and a stream token
    * unseen at freeze time silently inflated n_ids). Lexicon pieces
    * start at this offset: id(piece) = offset + sorted-position. */
  val ByteIdOffset = 256
}

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
  * tokens skipped), with ids in the byte-reserved space:
  *   - the char split is CODE-POINT granular — Java 8+ regex
  *     zero-width split (what Spark's `split(col, "")` compiles to)
  *     never breaks a surrogate pair, so a non-BMP token (emoji)
  *     splits into whole code points, not lone surrogates (ADVICE
  *     r14: a UTF-16-unit split here emitted pieces that could never
  *     appear in the code-point-built lexicon);
  *   - each merge (a, b) applies greedy left-to-right — "aaa" under
  *     (a, a) becomes [aa, a] — in learned order;
  *   - the ≥2-char test is CODEPOINT length (Spark `length()`);
  *   - id = [[BpeEncodeIds.ByteIdOffset]] + position in the sorted
  *     piece lexicon; a piece OUTSIDE the lexicon falls back to its
  *     UTF-8 bytes as ids 0–255 (total coverage — see companion).
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

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_ids expects array<string>, got ${t.sql}")
  }

  @transient private lazy val idOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](lexicon.size * 2)
    lexicon.zipWithIndex.foreach { case (p, i) =>
      m.put(p, Integer.valueOf(BpeEncodeIds.ByteIdOffset + i))
    }
    m
  }

  // per-task memo: distinct token → its id array (byte-fallback ids
  // for out-of-lexicon pieces — never null). UTF8String keys are
  // COPIED on insert — the input slice aliases a reusable row buffer.
  @transient private lazy val memo =
    new java.util.HashMap[UTF8String, Array[Any]]()

  private def encodeToken(t: UTF8String): Array[Any] = {
    val s = t.toString
    val pieces: Seq[String] =
      if (t.numChars() < 2) Seq(s)
      else {
        // code-point granularity — the split(token, "") twin
        val sym0 = new scala.collection.mutable.ArrayBuffer[String](s.length)
        var i = 0
        while (i < s.length) {
          val cc = Character.charCount(s.codePointAt(i))
          sym0 += s.substring(i, i + cc)
          i += cc
        }
        var syms = sym0.toArray
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
    pieces.iterator.flatMap { p =>
      val id = idOf.get(p)
      if (id != null) Iterator.single(id: Any)
      else p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .iterator.map(b => Integer.valueOf(b & 0xFF): Any)
    }.toArray
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
