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

  test("diversity gauge: the MMR top-5 is measurably less redundant") {
    val g = Retrieval.mmrDiversity(docs, terms)
      .select($"variant", $"n_pairs", $"avg_pairwise_cos")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(g("hybrid")._2 == 10L && g("mmr")._2 == 10L)
    assert(g("mmr")._3 < g("hybrid")._3,
      s"mmr ${g("mmr")._3} must be below hybrid ${g("hybrid")._3}")
  }
}
