package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass tag-depth scanner dropping BALANCED chrome-container
  * regions (`nav`/`header`/`footer`/`aside`) from markup — the
  * replacement for the non-greedy regex drop whose documented limit
  * was real-crawl-fatal: `<nav>…<nav>…</nav>…</nav>` truncated at
  * the FIRST close, leaking the outer container's tail into the
  * extracted text (VERDICT r12 #1). One counter over all four tags
  * (cross-tag nesting like `<header><nav>…</nav></header>` is one
  * region), so the scan is a pure char-level state machine: O(n),
  * zero allocation beyond the output, no regex, map-side.
  *
  * Semantics (shared with the DuckDB spelling
  * [[graft.ops.Html.chromeScanSql]], which replays the same walk as
  * a sentinel-split + prefix-sum over pieces):
  *   - an OPEN chrome tag (`<nav`, `<nav x=1>`, any case, name
  *     followed by whitespace/`>`/`/>`) increments depth;
  *   - a CLOSE (`</nav>`, `</nav >`) decrements; the region from the
  *     depth 0→1 open through the matching 1→0 close is replaced by
  *     one space;
  *   - a SELF-CLOSING chrome tag (`<nav/>`) at depth 0 is an empty
  *     region (one space);
  *   - an UNCLOSED container drops to end-of-input (both engines);
  *   - text with a prefix that merely resembles a tag name
  *     (`<navigation>`) or an unterminated `<nav` with no `>` is NOT
  *     a chrome tag (regex-tokenization parity).
  *
  * Divergences from the SQL spelling, outside the oracle fixture's
  * domain and pinned Spark-side in HtmlSpec: a STRAY close at depth 0
  * is ignored here (copied verbatim; the downstream tag stripper
  * turns it into a space) while the SQL prefix-sum goes negative and
  * drops the tail — balanced-or-truncated input agrees, stray-close
  * input does not; and a literal \x01 byte in the input survives here
  * but is consumed as the SQL sentinel separator.
  */
object HtmlScanUtil {
  /** Chrome container tags, the [[graft.ops.Html]] drop set. No name
    * is a prefix of another (first-match scan needs no ordering). */
  val chromeTags: Array[String] = Array("nav", "header", "footer", "aside")

  /** Whitespace inside tags — TextOps.wsClass's exact char set, so
    * the Java scanner and the RE2 `[ \t\n\r\f\x0B]` class agree. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000B'

  /** Length of the chrome tag name at `pos`, case-insensitive, or -1. */
  private def tagAt(s: String, pos: Int): Int = {
    val n = s.length
    var t = 0
    while (t < chromeTags.length) {
      val tag = chromeTags(t)
      if (pos + tag.length <= n && s.regionMatches(true, pos, tag, 0, tag.length))
        return tag.length
      t += 1
    }
    -1
  }

  private final val None0 = -1L
  private final val Open = 1L
  private final val Close = 2L
  private final val Self = 3L

  /** Match a chrome tag whose `<` is at `i`. Packed result
    * `(kind << 32) | lastIndexOfTag` (kind 1 open / 2 close /
    * 3 self-closing), or -1 when this `<` starts no chrome tag. */
  private def matchTag(s: String, i: Int): Long = {
    val n = s.length
    if (i + 1 >= n) return None0
    if (s.charAt(i + 1) == '/') {
      val tl = tagAt(s, i + 2)
      if (tl < 0) return None0
      var k = i + 2 + tl
      while (k < n && isWs(s.charAt(k))) k += 1
      if (k < n && s.charAt(k) == '>') (Close << 32) | k else None0
    } else {
      val tl = tagAt(s, i + 1)
      if (tl < 0) return None0
      val j = i + 1 + tl
      if (j >= n) return None0
      val c = s.charAt(j)
      if (c == '>') (Open << 32) | j
      else if (c == '/' && j + 1 < n && s.charAt(j + 1) == '>') (Self << 32) | (j + 1)
      else if (isWs(c)) {
        val k = s.indexOf('>', j)
        if (k < 0) None0 // unterminated open tag: not a tag, plain text
        else if (s.charAt(k - 1) == '/') (Self << 32) | k
        else (Open << 32) | k
      } else None0 // <navx…>: name boundary fails, plain text
    }
  }

  /** The scan. Called from both the interpreted eval and the
    * generated code ([[SimHashUtil]] discipline: one kernel). */
  def dropChrome(u: UTF8String): UTF8String = {
    val s = u.toString
    if (s.indexOf('<') < 0) return u // fast path: tag-free text
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var depth = 0
    while (i < n) {
      val c = s.charAt(i)
      var consumed = false
      if (c == '<') {
        val m = matchTag(s, i)
        if (m >= 0L) {
          val kind = (m >>> 32).toInt
          val end = (m & 0xffffffffL).toInt
          kind match {
            case 1 => depth += 1
            case 2 =>
              if (depth > 0) {
                depth -= 1
                if (depth == 0) sb.append(' ') // region completed
              } else sb.append(s, i, end + 1) // stray close: verbatim
            case _ => if (depth == 0) sb.append(' ') // empty region
          }
          i = end + 1
          consumed = true
        }
      }
      if (!consumed) {
        if (depth == 0) sb.append(c)
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Native Catalyst expression: `string → string`, drops balanced
  * chrome-container regions via [[HtmlScanUtil.dropChrome]]. Codegen'd
  * (static kernel call, no boxing) so the extraction entry stage stays
  * inside WholeStageCodegen at crawl scale. */
case class DropChrome(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DataTypes.StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"drop_chrome expects string, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    HtmlScanUtil.dropChrome(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlScanUtil.dropChrome($c)")
  override protected def withNewChildInternal(newChild: Expression): DropChrome =
    copy(child = newChild)
  override def prettyName: String = "drop_chrome"
}
