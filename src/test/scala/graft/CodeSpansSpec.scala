package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Code/prose span segmentation semantics over the planted fixture,
  * plus the downstream payoff: a code-heavy doc's PROSE quality
  * signals are no longer dragged down when computed prose-only. */
class CodeSpansSpec extends SparkSpec {
  import spark.implicits._

  // 40 prose tokens with genuine stopword density; the fixture plants
  // code per doc_id % 6 (0 → prose|code|prose, 3 → pure code). The
  // operator is PURE on `text` — the fixture is applied here, at the
  // call site, exactly as q_code_spans does (ADVICE r12).
  private val prose = ("the quick brown fox jumps over a lazy dog and " * 4).trim
  private lazy val plainDocs = Seq(
    (0L, prose), (3L, prose), (1L, prose), (2L, prose)
  ).toDF("doc_id", "text")
  private lazy val docs = plainDocs
    .withColumn("text", TextOps.codeFixture(col("text"), col("doc_id")))

  private def spans(id: Long): Seq[(String, Long)] =
    TextOps.codeSpans(docs).filter(col("doc_id") === id)
      .orderBy("span").select("kind", "n_chunks")
      .as[(String, Long)].collect().toSeq

  test("mixed doc segments into prose | code | prose islands") {
    val s = spans(0L)
    assert(s.map(_._1) == Seq("prose", "code", "prose"),
      s"expected prose/code/prose, got $s")
  }

  test("pure-code doc is one code span; plain docs are one prose span") {
    assert(spans(3L).map(_._1) == Seq("code"))
    assert(spans(1L).map(_._1) == Seq("prose"))
    assert(spans(2L).map(_._1) == Seq("prose"))
  }

  test("operator is pure: un-fixtured text is never mutated by doc_id") {
    // every doc is plain prose → every doc must be ONE prose span,
    // including ids 0 and 3 that the fixture WOULD have planted on
    val s = TextOps.codeSpans(plainDocs)
      .select("doc_id", "kind").as[(Long, String)].collect().toSeq.sorted
    assert(s == Seq((0L, "prose"), (1L, "prose"), (2L, "prose"), (3L, "prose")),
      s"expected four pure prose spans, got $s")
  }

  test("span boundaries tile the token stream without gaps") {
    val rows = TextOps.codeSpans(docs)
      .select("doc_id", "span", "tok_start", "tok_end")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    rows.foreach { case (_, ss) =>
      assert(ss.head._3 == 1L)
      ss.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 == a._4 + 1, s"gap between $a and $b")
        case _ => ()
      }
    }
  }

  test("prose-only stopword density recovers on the code-heavy doc") {
    val chunks = TextOps.codeChunks(docs).filter(col("doc_id") === 0L)
    def density(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df
        .select(explode(col("ctoks")).as("t"))
        .agg(
          sum(when(col("t").isInCollection(TextOps.stopwords), 1L)
            .otherwise(0L)).as("stop"),
          count(lit(1)).as("n"))
        .head()
      r.getLong(0).toDouble / r.getLong(1)
    }
    val whole = density(chunks)
    val proseOnly = density(chunks.filter(col("kind") === "prose"))
    assert(proseOnly > whole,
      s"prose-only density $proseOnly should exceed whole-doc $whole")
    // and the prose-only view matches the un-mixed doc's density
    val plain = density(TextOps.codeChunks(docs).filter(col("doc_id") === 1L))
    assert(math.abs(proseOnly - plain) < 0.05,
      s"prose-only $proseOnly should be near the plain doc's $plain")
  }
}
