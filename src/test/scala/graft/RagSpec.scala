package graft

import org.apache.spark.sql.functions._

/** q_rag_pipeline: the composed chunk → embed → IVF-index → hybrid-
  * serve chain. The DuckDB oracle hash-checks the full numeric
  * ladder; these specs pin the SEMANTICS a hash can't name — chunk
  * geometry, own-doc exclusion, each leg actually retrieving what it
  * should — on hand-built corpora where the right answer is known. */
class RagSpec extends SparkSpec {
  import spark.implicits._

  private def toksOf(n: Int, tag: String): String =
    (0 until n).map(i => s"${tag}_$i").mkString(" ")

  test("chunk frame: 64/48 geometry, short tail, empty doc = one empty chunk") {
    val docs = Seq(
      (1L, toksOf(100, "a")), // 100 tokens → chunks at 0, 48, 96
      (2L, toksOf(48, "b")),  // exactly one stride → one chunk
      (3L, "")                // empty → one empty chunk
    ).toDF("doc_id", "text")
    val ck = ops.Rag.chunkFrame(docs)
      .select($"doc_id", $"chunk_idx", size($"ctoks").as("n"),
        try_element_at($"ctoks", lit(1)).as("first"))
      .as[(Long, Int, Int, String)].collect().sortBy(r => (r._1, r._2))
    assert(ck.toSeq == Seq(
      (1L, 0, 64, "a_0"), (1L, 1, 52, "a_48"), (1L, 2, 4, "a_96"),
      (2L, 0, 48, "b_0"),
      (3L, 0, 0, null)))
  }

  test("serveOf: lexical leg finds the term-sharing doc, own doc excluded, ranks contiguous") {
    // query doc 0 (doc_id % 100 == 0, ≥9 tokens): query terms are its
    // tokens at positions 1/5/9 = q_0, q_4, q_8. Doc 7 repeats exactly
    // those terms (strong BM25 hit); doc 8 shares doc 0's OTHER tokens
    // (embedding-space neighbour through the shared dims); docs 9..20
    // are unrelated filler that keeps df/idf meaningful.
    val qText = (0 until 12).map(i => s"q_$i").mkString(" ")
    val hitText = "q_0 q_4 q_8 q_0 q_4 q_8 pad_a pad_b pad_c"
    val semText = (0 until 12).filter(i => i != 0 && i != 4 && i != 8)
      .map(i => s"q_$i").mkString(" ") + " pad_d pad_e pad_f"
    val filler = (9 to 20).map(i => (i.toLong, toksOf(10, s"f$i")))
    val docs = (Seq((0L, qText), (7L, hitText), (8L, semText)) ++ filler)
      .toDF("doc_id", "text")
    val chunks = ops.Rag.chunkFrame(docs).persist()
    val dense = ops.Rag.denseOf(chunks).persist()
    val centers = ops.Ivf.fit(dense, col("embedding"),
      Seq(col("doc_id"), col("chunk_idx")), k = 2, iters = 1)
    try {
      val out = ops.Rag.serveOf(chunks, dense, centers)
        .as[(Long, Long, Long, Int, Double, Option[Long], Option[Long])]
        .collect()
      assert(out.nonEmpty, "no fused results")
      // single query: doc 0
      assert(out.forall(_._1 == 0L))
      // own-doc exclusion on both legs
      assert(out.forall(_._3 != 0L), s"own doc retrieved: ${out.toSeq}")
      // ranks are 1..n contiguous
      assert(out.map(_._2).sorted.toSeq == (1L to out.length).toSeq)
      // the exact-term doc 7 is the fused leader (wins lexically and
      // shares embedding dims through the query terms themselves)
      assert(out.find(_._2 == 1L).exists(_._3 == 7L),
        s"expected doc 7 at rank 1: ${out.toSeq}")
      // the vocabulary-overlap doc 8 surfaces via the semantic leg
      val d8 = out.find(_._3 == 8L)
      assert(d8.exists(_._7.nonEmpty),
        s"doc 8 should carry a semantic rank: ${out.toSeq}")
    } finally { chunks.unpersist(false); dense.unpersist(false) }
  }

  test("q_rag_sem_recall (sf0.01): routed recall floor holds and exact-probe recall is 1") {
    // the declared geometry probes nProbe=2 of 4 cells — half the
    // corpus — so routed recall is high-but-lossy; gate the floor
    // (the q_ann_recall_pq discipline: quality is a declared number,
    // regressions in routing/fit fail here, not silently in prod)
    val out = SparkEntry.queries("q_rag_sem_recall")(spark, sf("sf0.01"))
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    val mean = out.map(_._3).sum / out.length
    assert(mean >= 0.6, s"mean routed recall $mean under floor: ${out.toSeq}")
    // probing ALL cells must recover the exact list (routing is the
    // only lossy step — this pins that the embed/score spellings of
    // the two legs are identical)
    val chunks = ops.Rag.chunkFrame(
      graft.io.Tables.documents(spark, sf("sf0.01"))).persist()
    val dense = ops.Rag.denseOf(chunks).persist()
    val centers = ops.Ivf.fit(dense, org.apache.spark.sql.functions.col("embedding"),
      Seq($"doc_id", $"chunk_idx"), k = 2, iters = 1)
    try {
      val full = ops.Rag.semRecallOf(chunks, dense, centers, queryMod = 100)
        .as[(Long, Long, Double)].collect()
      // k=2 cells, nProbe=2 → every cell probed → recall exactly 1
      assert(full.nonEmpty && full.forall(_._3 == 1.0), s"got ${full.toSeq}")
    } finally { chunks.unpersist(false); dense.unpersist(false) }
  }

  test("streaming ingestion: frozen-embed appends reproduce the batch index bit-for-bit") {
    // production incremental RAG: freeze the embedding context (df
    // vocabulary + corpus size) and quantizer at build time, stream
    // new documents through chunk → frozen-embed → assign → append.
    // Streaming the SAME corpus in 3 micro-batches must land exactly
    // the batch build's index rows (same arithmetic path), and a
    // replayed batch must not duplicate (batch_id dynamic overwrite).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val docs = graft.io.Tables.documents(spark, sf("sf0.01"))
    val chunks = ops.Rag.chunkFrame(docs).persist()
    val dense = ops.Rag.denseOf(chunks).persist()
    val centers = ops.Ivf.fit(dense, col("embedding"),
      Seq($"doc_id", $"chunk_idx"), k = ops.Rag.RagCells,
      iters = ops.Rag.RagIters)
    val dfTable = ops.Rag.dfTableOf(chunks).persist()
    val nChunks = chunks.count()
    val root = java.nio.file.Files.createTempDirectory("rag_stream").toString
    try {
      val rows = docs.select($"doc_id", $"text").as[(Long, String)]
        .collect().sortBy(_._1)
      implicit val sq = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = ops.Rag.streamIngest(
        input.toDF().toDF("doc_id", "text"),
        dfTable, nChunks, centers, s"$root/index", s"$root/ckpt",
        triggerMs = 10L)
      rows.grouped(math.max(rows.length / 3, 1)).foreach { g =>
        input.addData(g.toSeq)
        q.processAllAvailable()
      }
      q.stop()
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.select($"doc_id", $"chunk_idx", $"cell",
            $"embedding".cast("array<double>"))
          .as[(Long, Int, Int, Seq[Double])].collect()
          .sortBy(r => (r._1, r._2)).toSeq
      val streamed = rowsOf(ops.Ivf.readIndex(spark, s"$root/index"))
      val batch = rowsOf(ops.Ivf.assign(dense, col("embedding"), centers))
      assert(streamed.nonEmpty && streamed == batch,
        s"streamed index diverges: ${streamed.take(2)} vs ${batch.take(2)}")
      // idempotent replay: re-appending an already-written batch_id
      // rewrites its own slices, never duplicates
      ops.Ivf.appendBatch(
        ops.Rag.denseFrozen(ops.Rag.chunkFrame(
          docs.filter($"doc_id" === rows.head._1)), dfTable, nChunks),
        col("embedding"), centers, s"$root/index", batchId = 0L)
      val replayed = rowsOf(ops.Ivf.readIndex(spark, s"$root/index"))
      assert(replayed.map(r => (r._1, r._2)).distinct.size == replayed.size,
        "replay duplicated index rows")
    } finally {
      chunks.unpersist(false); dense.unpersist(false)
      dfTable.unpersist(false)
    }
  }

  test("serving freshness: a query served after micro-batch N sees batch N's chunks") {
    // VERDICT r17 #2: streamIngest pinned ingest bit-equality, but
    // nothing pinned the SERVING side of the loop — that a query
    // routed against the persisted index right after micro-batch N
    // retrieves chunks N landed (merge-on-read through readIndex).
    // Ingest 3 micro-batches; serve between each; at every horizon
    // the served top-K must equal a batch-built index's answer over
    // the same docs, and the final horizon must surface last-batch
    // chunks a frozen first-horizon index could never return.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val docs = graft.io.Tables.documents(spark, sf("sf0.001"))
    val chunks = ops.Rag.chunkFrame(docs).persist()
    val dense = ops.Rag.denseOf(chunks).persist()
    val centers = ops.Ivf.fit(dense, col("embedding"),
      Seq($"doc_id", $"chunk_idx"), k = ops.Rag.RagCells,
      iters = ops.Rag.RagIters)
    val dfTable = ops.Rag.dfTableOf(chunks).persist()
    val nChunks = chunks.count()
    val qMod = 20L
    val root = java.nio.file.Files.createTempDirectory("rag_fresh").toString
    try {
      val rows = docs.select($"doc_id", $"text").as[(Long, String)]
        .collect().sortBy(_._1)
      val groups = rows.grouped((rows.length + 2) / 3).toSeq
      assert(groups.size == 3)
      implicit val sq = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = ops.Rag.streamIngest(
        input.toDF().toDF("doc_id", "text"),
        dfTable, nChunks, centers, s"$root/index", s"$root/ckpt",
        triggerMs = 10L)
      def served(h: Int, soFar: Seq[(Long, String)]) = {
        val chunksSoFar = ops.Rag.chunkFrame(
          soFar.toDF("doc_id", "text"))
        val got = ops.Rag.semServeIndexed(spark, s"$root/index", centers,
            chunksSoFar, dfTable, nChunks, queryMod = qMod)
          .as[(Long, Long, String)].collect().sorted.toSeq
        // batch twin at the same horizon: same docs, same frozen
        // context, batch-built index directory
        ops.Rag.writeChunkIndex(
          ops.Rag.denseFrozen(chunksSoFar, dfTable, nChunks), centers,
          s"$root/batch$h", numFiles = 4)
        val want = ops.Rag.semServeIndexed(spark, s"$root/batch$h", centers,
            chunksSoFar, dfTable, nChunks, queryMod = qMod)
          .as[(Long, Long, String)].collect().sorted.toSeq
        assert(got.nonEmpty, s"horizon $h served nothing")
        assert(got === want,
          s"horizon $h: streamed serving diverged from the batch build")
        got
      }
      var soFar = Vector.empty[(Long, String)]
      val horizons = groups.zipWithIndex.map { case (g, i) =>
        input.addData(g.toSeq)
        q.processAllAvailable()
        soFar = soFar ++ g
        served(i + 1, soFar)
      }
      q.stop()
      // the growing corpus is REFLECTED: horizon 3 retrieves chunks
      // from the last ingested batch (doc_ids beyond horizon 2's docs)
      val lastBatchDocs = groups(2).map(_._1).toSet
      val h3Docs = horizons(2).map(_._3.takeWhile(_ != '|').toLong).toSet
      assert(h3Docs.intersect(lastBatchDocs).nonEmpty,
        "horizon-3 serving never surfaced a batch-3 chunk — freshness not shown")
      assert(horizons(0) !== horizons(2),
        "results identical across horizons — fixture proves nothing")
    } finally {
      chunks.unpersist(false); dense.unpersist(false)
      dfTable.unpersist(false)
    }
  }

  test("quantizer drift arc: drift detected, refit repairs cells, recall recovers, values frozen") {
    // VERDICT r17 #2 (second half): the RAG quantizer's maintenance
    // loop — cellStats baseline at fit time, the corpus distribution
    // moves, driftReport flags the cells, refitDrifted re-seeds them
    // at O(drifted rows), and the updated quantizer is GATED by the
    // q_rag_sem_recall discipline before the swap. The frozen-df
    // contract holds throughout: cell surgery moves assignments,
    // never embedding values.
    import org.apache.spark.sql.functions._
    val docs = graft.io.Tables.documents(spark, sf("sf0.001"))
    val chunks = ops.Rag.chunkFrame(docs).persist()
    val dense = ops.Rag.denseOf(chunks).persist()
    val centers = ops.Ivf.fit(dense, col("embedding"),
      Seq($"doc_id", $"chunk_idx"), k = ops.Rag.RagCells,
      iters = ops.Rag.RagIters)
    val dir = java.nio.file.Files.createTempDirectory("rag_drift").toString
    try {
      // the corpus DISTRIBUTION moves under the pinned quantizer
      // (deterministic stand-in for topic drift: every vector
      // reflected — far from its fitted centroid, geometry intact)
      val drifted = dense.select($"doc_id", $"chunk_idx",
        transform($"embedding", x => -x).cast("array<float>")
          .as("embedding")).persist()
      ops.Rag.writeChunkIndex(drifted, centers, s"$dir/idx", numFiles = 4)
      // fit-time baseline geometry (what cellStats read when the
      // quantizer matched the corpus it was fitted on)
      val baseline = ops.Ivf.cellStats(
        ops.Ivf.assign(dense, col("embedding"), centers), centers).persist()
      val report = ops.Ivf.driftReport(
        spark.read.parquet(s"$dir/idx"), centers, baseline)
      val driftedCells = report
        .filter($"drift_ratio" >= 2.0 && $"n" >= 10)
        .select($"cell").as[Int].collect().toSet
      assert(driftedCells.nonEmpty, "fixture failed to produce drift")
      def meanRecall(cs: Array[Array[Double]]) =
        ops.Rag.semRecallOf(chunks, drifted, cs, queryMod = 20)
          .agg(avg($"recall")).as[Double].head()
      val pre = meanRecall(centers)
      val updated = ops.Rag.refitDrifted(spark, s"$dir/idx", centers,
        baseline, driftFactor = 2.0, minRows = 10)
      driftedCells.foreach { c =>
        assert(!java.util.Arrays.equals(updated(c), centers(c)),
          s"drifted cell $c kept its stale centroid") }
      // recall GATE: the repaired quantizer must not route worse than
      // the drifted one, and must clear the RagSpec floor
      val post = meanRecall(updated)
      assert(post >= pre - 1e-9, s"refit regressed recall: $pre -> $post")
      assert(post >= 0.6, s"post-refit recall $post below floor")
      // frozen-df contract: the refit rewrote CELLS only — the
      // (doc_id, chunk_idx, embedding) value set is bit-identical
      def values(df: org.apache.spark.sql.DataFrame) =
        df.select($"doc_id", $"chunk_idx",
            $"embedding".cast("array<double>"))
          .as[(Long, Int, Seq[Double])].collect().sortBy(r => (r._1, r._2))
          .toSeq
      assert(values(spark.read.parquet(s"$dir/idx")) === values(drifted),
        "refit moved embedding values — the frozen-df contract is broken")
      drifted.unpersist(false); baseline.unpersist(false)
    } finally {
      chunks.unpersist(false); dense.unpersist(false)
    }
  }

  test("q_rag_pipeline (sf0.001): queries retrieve, both legs contribute, rrf matches leg ranks") {
    val out = SparkEntry.queries("q_rag_pipeline")(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Int, Double, Option[Long], Option[Long])]
      .collect()
    assert(out.nonEmpty)
    assert(out.forall { case (q, _, d, _, _, _, _) => d != q })
    assert(out.exists(_._6.nonEmpty) && out.exists(_._7.nonEmpty),
      "one leg never contributed")
    // rrf is exactly the declared function of the leg ranks
    def leg(r: Option[Long]) = r.fold(0.0)(v =>
      math.floor(1.0 / (60.0 + v) * 1e9 + 0.5) / 1e9)
    out.foreach { case (_, _, _, _, rrf, rl, rs) =>
      val want = math.floor((leg(rl) + leg(rs)) * 1e9 + 0.5) / 1e9
      assert(rrf == want, s"rrf $rrf != $want for ranks ($rl, $rs)")
    }
  }
}
