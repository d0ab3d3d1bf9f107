package graft

import graft.ops.Retrieval

/** MMR diversity re-rank semantics ([[Retrieval.mmrRerank]]): the
  * planted duplicate pair both dominate pure relevance but never both
  * reach the MMR top-5; the first pick stays the relevance leader. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("alpha", "beta")
  // docs 1 and 2: IDENTICAL, loaded with both query terms → both top
  // by relevance, pairwise cosine 1. Fillers: one query term + unique
  // tokens → near-orthogonal to each other.
  private val dup = "alpha beta gamma delta epsilon alpha beta"
  private lazy val docs = (Seq((1L, dup), (2L, dup)) ++
    (3L to 14L).map(i => (i, s"alpha u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f")))
    .toDF("doc_id", "text")

  test("planted duplicate pair never both appear in the MMR top-5") {
    val hybridTop5 = Retrieval.hybridSearch(docs, terms)
      .filter($"rank" <= 5).select($"doc_id").as[Long].collect().toSet
    assert(hybridTop5.contains(1L) && hybridTop5.contains(2L),
      s"precondition: relevance alone must surface BOTH dups, got $hybridTop5")
    val out = Retrieval.mmrRerank(docs, terms)
      .select($"doc_id", $"rank", $"mmr_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val top5 = out.filter(_._2 <= 5).map(_._1).toSet
    assert(Set(1L, 2L).intersect(top5).size == 1,
      s"exactly one dup in the MMR top-5, got $top5")
    // rank 1 is the pure relevance leader (empty picked set)
    val hybrid1 = Retrieval.hybridSearch(docs, terms)
      .filter($"rank" === 1).select($"doc_id").as[Long].head()
    assert(out.find(_._2 == 1L).get._1 == hybrid1)
    // the suppressed dup either never gets picked at all or lands
    // strictly below the top-5
    val dupRanks = out.filter(r => r._1 == 1L || r._1 == 2L).map(_._2)
    assert(dupRanks.length == 1 || dupRanks.max > 5,
      s"second dup must be suppressed or fall below the top-5: $dupRanks")
  }

  test("batch MMR: per-query diversity with bounded groups (VERDICT r13 #3)") {
    // two query docs (id % 100 == 0, ≥9 tokens; terms at positions
    // 1/5/9): q100 → alpha/beta/gamma with a planted dup pair in its
    // candidate set; q200 → zeta/eta/theta with only 3 matching docs
    // (exercises the early stop when candidates < MmrFinal)
    val corpus = (Seq(
      (100L, "alpha f1 f2 f3 beta f4 f5 f6 gamma"),
      (200L, "zeta g1 g2 g3 eta g4 g5 g6 theta"),
      (1L, "alpha beta gamma alpha beta gamma delta"),
      (2L, "alpha beta gamma alpha beta gamma delta"),
      (21L, "zeta z1a z1b z1c"),
      (22L, "eta z2a z2b z2c"),
      (23L, "theta z3a z3b z3c")) ++
      (3L to 14L).map(i => (i, s"alpha u${i}a u${i}b u${i}c u${i}d u${i}e")))
      .toDF("doc_id", "text")
    val out = Retrieval.mmrBatch(corpus)
      .select($"q_id", $"rank", $"doc_id").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
    assert(out.keySet == Set(100L, 200L), s"queries: ${out.keySet}")
    // ranks contiguous from 1, no candidate repeated, ≤ MmrFinal
    out.foreach { case (q, rows) =>
      val ranks = rows.map(_._2).sorted.toSeq
      assert(ranks == (1L to rows.length).toSeq, s"q$q ranks: $ranks")
      assert(rows.map(_._3).distinct.length == rows.length)
      assert(rows.length <= Retrieval.MmrFinal)
    }
    // q200 exhausts its 3 candidates and stops
    assert(out(200L).length == 3, s"q200 picked ${out(200L).length}")
    // q100: the planted dup pair never both reach the top-5
    val top5 = out(100L).filter(_._2 <= 5).map(_._3).toSet
    assert(Set(1L, 2L).intersect(top5).size == 1,
      s"exactly one dup in q100's MMR top-5, got $top5")
    // rank 1 = the BM25 leader (empty picked set ⇒ pure relevance)
    val bmTop = Retrieval.bm25Batch(corpus, 1)
      .select($"q_id", $"doc_id").as[(Long, Long)].collect().toMap
    out.foreach { case (q, rows) =>
      assert(rows.find(_._2 == 1L).get._3 == bmTop(q), s"q$q first pick")
    }
  }

  test("diversity gauge: the MMR top-5 is measurably less redundant") {
    val g = Retrieval.mmrDiversity(docs, terms)
      .select($"variant", $"n_pairs", $"avg_pairwise_cos")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(g("hybrid")._2 == 10L && g("mmr")._2 == 10L)
    assert(g("mmr")._3 < g("hybrid")._3,
      s"mmr ${g("mmr")._3} must be below hybrid ${g("hybrid")._3}")
  }
}
