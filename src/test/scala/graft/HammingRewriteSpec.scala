package graft

import org.apache.spark.sql.functions._
import graft.plans.HammingProbeRewrite

/** HammingProbeRewrite optimizer rule: a bit_count(a XOR b) <= 1 join
  * must become a probe-set equi-join (hash join), with results
  * identical to the nested-loop original. */
class HammingRewriteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val enableRule: Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ HammingProbeRewrite
  }

  // 300 corpus buckets + 3 query buckets with known radius-1 neighbors
  private lazy val corpus = (0L until 300L).map(i => (i, i % 97L))
    .toDF("cid", "bucket")
  private lazy val queries = Seq((1000L, 5L), (1001L, 96L), (1002L, 4096L))
    .toDF("qid", "q_bucket")

  private def hammingJoin = corpus.join(queries,
    bit_count($"bucket".bitwiseXOR($"q_bucket")) <= 1)

  private def naive(): Set[(Long, Long)] = {
    val buckets = (0L until 300L).map(i => (i, i % 97L))
    val qs = Seq((1000L, 5L), (1001L, 96L), (1002L, 4096L))
    (for ((cid, b) <- buckets; (qid, qb) <- qs
          if java.lang.Long.bitCount(b ^ qb) <= 1) yield (cid, qid)).toSet
  }

  test("rewritten join is a hash join, not a nested loop") {
    enableRule
    val p = hammingJoin.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"rule did not fire:\n${p.take(2000)}")
    assert(p.contains("Generate") || p.contains("explode"),
      "probe-set explode missing from the plan")
  }

  test("rewritten join returns exactly the radius-1 matches") {
    enableRule
    val got = hammingJoin.select($"cid", $"qid").as[(Long, Long)].collect().toSet
    val expect = naive()
    assert(expect.nonEmpty)
    assert(got === expect)
  }

  test("extra conjuncts in the condition survive the rewrite") {
    enableRule
    val got = corpus.join(queries,
        bit_count($"bucket".bitwiseXOR($"q_bucket")) <= 1 && $"cid" < 100L)
      .select($"cid", $"qid").as[(Long, Long)].collect().toSet
    assert(got === naive().filter(_._1 < 100L))
    assert(got.nonEmpty)
  }

  test("null buckets never match, same as the original predicate") {
    enableRule
    val c = Seq((1L, Some(5L)), (2L, None)).toDF("cid", "bucket")
    val q = Seq((10L, Some(5L)), (11L, None)).toDF("qid", "q_bucket")
    val got = c.join(q, bit_count($"bucket".bitwiseXOR($"q_bucket")) <= 1)
      .select($"cid", $"qid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))
  }

  test("radius-2 and non-inner joins are left untouched") {
    enableRule
    // radius 2: no equi-probe enumeration of size width+1 — must not fire
    val p2 = corpus.join(queries,
        bit_count($"bucket".bitwiseXOR($"q_bucket")) <= 2)
      .queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastNestedLoopJoin") || p2.contains("CartesianProduct"))
    // results still correct through the untouched path
    val n2 = corpus.join(queries,
      bit_count($"bucket".bitwiseXOR($"q_bucket")) <= 2).count()
    assert(n2 >= naive().size)
  }
}
