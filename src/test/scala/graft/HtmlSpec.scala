package graft

import org.apache.spark.sql.functions._
import graft.ops.Html

/** Adversarial fixtures for the HTML extraction stage (r10 verdict
  * #1): nested tags, entity forms (incl. double-encoded), CDATA,
  * comments containing markup, markup-bearing script strings, the
  * link-density gate, and the documented nested-same-tag limit. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Html.extractText($"h")).as[String].head()

  test("strips tags, decodes entities once, normalizes whitespace") {
    assert(extract("<p>Tom &amp; Jerry say &quot;hi&quot;, &lt;3 isn&#39;t&nbsp;bad</p>")
      === "Tom & Jerry say \"hi\", <3 isn't bad")
    // double-encoded stays single-decoded: &amp;lt; -> literal &lt;,
    // never cascading to a < that the stripper would then eat
    assert(extract("<p>compare &amp;lt; and &lt;</p>") === "compare &lt; and <")
    assert(extract("<p>a\t\n  b   c</p>") === "a b c")
  }

  test("decoded angle brackets never become tags") {
    assert(extract("<p>&lt;script&gt;alert(1)&lt;/script&gt;</p>")
      === "<script>alert(1)</script>")
  }

  test("drops script/style/comment/CDATA wholesale, even with markup inside") {
    assert(extract("<p>keep</p><script>var s = \"<p>fake</p>\";</script><p>tail</p>")
      === "keep tail")
    assert(extract("<style>p::before{content:\"<b>x</b>\"}</style><p>body</p>")
      === "body")
    assert(extract("<p>a</p><!-- <p>commented</p> --><p>b</p>") === "a b")
    assert(extract("<p>a</p><![CDATA[raw <data> & noise]]><p>b</p>") === "a b")
    // SCRIPT in caps — the (?i) flag is load-bearing
    assert(extract("<SCRIPT>x()</SCRIPT><p>c</p>") === "c")
  }

  test("drops chrome containers: nav, header, footer, aside") {
    assert(extract(
      "<header><h1>Site</h1></header><nav><a href=\"/\">Home</a></nav>" +
        "<p>content</p><aside>related</aside><footer>(c) corp</footer>")
      === "content")
  }

  test("nested different tags flatten to their text in order") {
    assert(extract("<p>Nested <b>bold <i>italics</i></b> tail</p>")
      === "Nested bold italics tail")
    assert(extract("<div><ul><li>one</li><li>two</li></ul></div>") === "one two")
  }

  test("link-density gate: link-dense blocks drop, text blocks with links survive") {
    // share bar: ~2 chars of non-link text vs ~20 of link text -> dropped
    assert(extract(
      "<p>real paragraph text here</p>" +
        "<div class=\"share\"><a href=\"/s\">Share this page</a> <a href=\"/l\">Like</a> +1</div>")
      === "real paragraph text here")
    // a paragraph that merely CONTAINS a link keeps its block
    assert(extract("<p>read the <a href=\"/docs\">documentation</a> for details</p>")
      === "read the documentation for details")
    // <article>/<abbr> must not match the <a…> anchor pattern
    assert(extract("<article>standalone article body</article>")
      === "standalone article body")
  }

  test("nested same-tag containers are FULLY dropped (r12 #1 fixed)") {
    // the old non-greedy <nav>.*?</nav> stopped at the INNER close and
    // leaked "tail text of outer"; the tag-depth scanner drops the
    // whole balanced region
    assert(extract("<nav>outer <nav>inner</nav> tail text of outer</nav><p>x</p>")
      === "x")
    // three levels deep, mixed case, attributes on every level
    assert(extract(
      "<NAV id=a>l1 <nav id=b>l2 <Nav id=c>l3</Nav> m2</nav> m1</NAV><p>keep</p>")
      === "keep")
    // cross-tag nesting is one region: header containing nav
    assert(extract("<header>site <nav>menu</nav> tagline</header><p>body</p>")
      === "body")
    // two sibling regions do not bridge: text between them survives
    assert(extract("<nav>a</nav><p>between</p><nav>b</nav>") === "between")
  }

  test("scanner tag grammar: self-closing, stray close, unclosed, look-alikes") {
    // self-closing chrome is an empty region
    assert(extract("<p>a</p><nav/><p>b</p>") === "a b")
    assert(extract("<p>a</p><nav class=\"x\"/><p>b</p>") === "a b")
    // a stray close at depth 0 is ignored (then tag-stripped), never
    // swallowing the rest of the document
    assert(extract("<p>a</nav>b</p><p>c</p>") === "a b c")
    // an unclosed container drops to end-of-input
    assert(extract("<p>keep</p><footer>never closed, all of this goes")
      === "keep")
    // tag-name look-alikes are text elements, not chrome
    assert(extract("<navigation>menu-ish</navigation><p>x</p>") === "menu-ish x")
    assert(extract("<headerly>h</headerly><p>x</p>") === "h x")
    // an unterminated <nav with no '>' is plain text, not an open
    assert(extract("<p>a</p> <nav unterminated") === "a <nav unterminated")
  }

  test("plain text and empty inputs pass through the stage unharmed") {
    assert(extract("just plain text, no markup") === "just plain text, no markup")
    assert(extract("") === "")
    assert(extract("<p></p><div>  </div>") === "")
  }

  test("fixture round-trips the escaped body text through extraction") {
    val doc = "alpha & beta < gamma > delta   spaced"
    val out = Seq((10L, doc)).toDF("doc_id", "text")
      .select(Html.extractText(Html.fixture($"doc_id", $"text"))).as[String].head()
    // body text comes back whitespace-normalized with entities decoded
    assert(out.contains("alpha & beta < gamma > delta spaced"), out)
    // chrome and boilerplate do not leak — including the outer nav's
    // tail after the NESTED inner nav (the r12 #1 leak shape)
    assert(!out.contains("Home") && !out.contains("Share") && !out.contains("Privacy"), out)
    assert(!out.contains("You are here") && !out.contains("RSS"), out)
    assert(!out.contains("track") && !out.contains("margin"), out)
    // CDATA island (doc_id 10 % 5 == 0) is gone
    assert(!out.contains("raw") && !out.contains("noise"), out)
  }
}
