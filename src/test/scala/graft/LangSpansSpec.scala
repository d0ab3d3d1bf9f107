package graft

import org.apache.spark.sql.Row
import graft.ops.TextOps

/** [[TextOps.langSpans]] over planted mixed-language fixtures
  * (VERDICT r10 #8): chunked marker-argmax + island merge must
  * segment code-switched docs at chunk granularity, keep monolingual
  * docs whole, emit 'und' for marker-free regions, and follow
  * q_lang_id's deterministic ASC-lang tie-break. */
class LangSpansSpec extends SparkSpec {

  private def run(rows: (Long, String)*): Seq[Row] = {
    import spark.implicits._
    val df = rows.toSeq.toDF("doc_id", "text")
    TextOps.langSpans(df).collect().toSeq
  }

  // 10 tokens of language `l` (one marker + 9 neutral fillers)
  private def chunk(marker: String): String =
    (marker +: (1 to 9).map(i => s"x$i")).mkString(" ")

  test("code-switched doc splits into per-language spans at chunk bounds") {
    val text = chunk("the") + " " + chunk("the") + " " + chunk("el")
    val spans = run(1L -> text)
    assert(spans.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getLong(3), r.getLong(4), r.getLong(5))) ==
      Seq((1L, 0L, "en", 1L, 20L, 2L), (1L, 1L, "es", 21L, 30L, 1L)))
  }

  test("monolingual doc is one span covering every chunk") {
    val text = Seq.fill(4)(chunk("und")).mkString(" ")
      .replace("und", "die") // 'die' is a de marker
    val spans = run(2L -> text)
    assert(spans.map(r => (r.getString(2), r.getLong(3), r.getLong(4),
      r.getLong(5))) == Seq(("de", 1L, 40L, 4L)))
  }

  test("marker-free region becomes an 'und' span between real spans") {
    val gibberish = (1 to 10).map(i => s"zz$i").mkString(" ")
    val text = chunk("the") + " " + gibberish + " " + chunk("the")
    val spans = run(3L -> text)
    assert(spans.map(r => (r.getLong(1), r.getString(2))) ==
      Seq((0L, "en"), (1L, "und"), (2L, "en")))
  }

  test("short doc yields a single partial chunk with exact tok_end") {
    val spans = run(4L -> "the cat sat")
    assert(spans.map(r => (r.getString(2), r.getLong(3), r.getLong(4),
      r.getLong(5))) == Seq(("en", 1L, 3L, 1L)))
  }

  test("equal-hit chunk ties break to the ASC language code") {
    // 'la' is a marker for both es and fr → tie at 1 hit each → 'es'
    val spans = run(5L -> ("la " + (1 to 9).map(i => s"x$i").mkString(" ")))
    assert(spans.map(_.getString(2)) == Seq("es"))
    // 'the' (en) vs 'la' (es+fr): en wins the 1-1-1 tie
    val spans2 = run(6L -> ("the la " + (1 to 8).map(i => s"y$i").mkString(" ")))
    assert(spans2.map(_.getString(2)) == Seq("en"))
  }

  test("final partial chunk merges into the preceding same-language span") {
    val text = chunk("the") + " the tail" // 12 tokens: chunk 0 en, chunk 1 en
    val spans = run(7L -> text)
    assert(spans.map(r => (r.getString(2), r.getLong(3), r.getLong(4),
      r.getLong(5))) == Seq(("en", 1L, 12L, 2L)))
  }
}
