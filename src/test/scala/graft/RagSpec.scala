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
