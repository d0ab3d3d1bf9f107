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

  test("keeper by priority: a planted curated twin beats its web duplicate") {
    // hand-built clusters — the election logic isolated from CC:
    //   cluster 10: web doc 10 (higher quality, lower id) vs curated
    //               doc 11 → tier dominates: 11 keeps
    //   cluster 20: same-tier docs 20/21 → quality decides: 21 keeps
    //   cluster 30: full tie → lowest doc_id keeps
    //   singleton 40 keeps itself
    val assign = Seq((10L, 10L), (11L, 10L), (20L, 20L), (21L, 20L),
      (30L, 30L), (31L, 30L), (40L, 40L)).toDF("doc_id", "cluster_rep")
    val meta = Seq(
      (10L, "src15", 0.9), (11L, "src2", 0.5),
      (20L, "src12", 0.4), (21L, "src17", 0.8),
      (30L, "src6", 0.6), (31L, "src6", 0.6),
      (40L, "src19", 0.1)).toDF("doc_id", "source", "quality_score")
    val keepers = ops.TextOps.keeperByPriority(assign, meta)
      .select($"doc_id", $"keeper_id", $"is_keeper", $"priority")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2), r.getInt(3))).toMap
    assert(keepers(10L) === ((11L, false, 2)), "web copy must lose to curated")
    assert(keepers(11L) === ((11L, true, 0)))
    assert(keepers(20L)._1 === 21L && keepers(21L)._2,
      s"same tier: higher quality keeps, got ${keepers(20L)}")
    assert(keepers(30L)._1 === 30L && keepers(30L)._2 && !keepers(31L)._2)
    assert(keepers(40L)._2)
  }

  test("q_dedup_keeper rides the memoized CC assignment (no second CC run)") {
    // Memo.stage returns the same checkpointed frame instance per
    // (session, dir, stage) — the declared query and q_dedup_clusters
    // must share it, or the session pays a second CC run
    val q = graft.SparkEntry.queries("q_dedup_keeper")(spark, dir)
    val rows = q.select($"doc_id", $"cluster_rep", $"keeper_id", $"is_keeper")
      .collect()
    assert(rows.nonEmpty)
    assert(ops.TextOps.clusterAssignmentsMemo(spark, dir) eq
      ops.TextOps.clusterAssignmentsMemo(spark, dir),
      "memoized assignment must be instance-stable")
    // every cluster elects exactly one keeper, and it is a member
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (rep, members) =>
      val ks = members.filter(_.getBoolean(3)).map(_.getLong(0))
      assert(ks.length === 1, s"cluster $rep elected ${ks.length} keepers")
      assert(members.map(_.getLong(2)).distinct === Array(ks.head))
    }
    // the planted near-dup structure must produce at least one
    // cluster whose keeper is NOT the min id (the min-id rule and the
    // priority rule genuinely disagree somewhere on this corpus)
    val moved = byCluster.count { case (rep, members) =>
      members.exists(_.getBoolean(3)) &&
        members.filter(_.getBoolean(3)).head.getLong(0) != members.map(_.getLong(0)).min
    }
    assert(moved > 0, "priority keeper never diverged from min-id — fixture too weak")
  }
}
