package graft

import org.apache.spark.sql.functions._

/** q_dedup_stats / q_source_overlap semantics on a corpus with KNOWN
  * duplicate structure ([[tools.CorpusGenerator]]: ids ≡ 8 mod 10 are
  * exact copies of their block base, ids ≡ 9 near-dups). */
class DedupStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dstats").toString
    tools.CorpusGenerator.write(spark, tmp, 1000L)
    tmp
  }

  test("dedup stats: planted copies show up in every counter, share is exact") {
    val r = graft.SparkEntry.queries("q_dedup_stats")(spark, dir).head()
    val nDocs = r.getAs[Long]("n_docs")
    assert(nDocs == 1000L)
    // 100 planted exact copies → strictly fewer exact groups than docs
    assert(r.getAs[Long]("n_exact_groups") < nDocs)
    assert(r.getAs[Long]("docs_in_exact_dups") >= 200L) // pairs (base+copy)
    val inClusters = r.getAs[Long]("docs_in_neardup_clusters")
    assert(inClusters >= 200L && inClusters < nDocs)
    assert(r.getAs[Long]("max_cluster_size") >= 2L)
    val share = r.getAs[Double]("neardup_share")
    assert(math.abs(share - inClusters.toDouble / nDocs) < 1e-9)
  }

  test("source overlap: canonical pair order, totals match the pair graph") {
    val rows = graft.SparkEntry.queries("q_source_overlap")(spark, dir)
      .select($"source_a", $"source_b", $"n_pairs", $"avg_jaccard")
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, n, j) =>
      assert(a <= b, s"pair ($a, $b) not canonical")
      assert(n >= 1 && j > 0.0 && j <= 1.0)
    }
    // the matrix counts every verified pair exactly once
    val totalPairs = ops.TextOps.minhashPairs(spark, dir).count()
    assert(rows.map(_._3).sum == totalPairs,
      s"matrix total ${rows.map(_._3).sum} != pair graph $totalPairs")
  }
}
