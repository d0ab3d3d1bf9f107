package graft

/** Physical-plan regression guards: the scale properties (pruning,
  * pushdown, broadcast strategy, codegen) that make these queries
  * viable at 100 TB. A change that silently reads all columns, drops a
  * pushed filter, or turns a broadcast join into a cartesian product
  * fails here, not in production. */
class PlanSpec extends SparkSpec {

  private val dir = sf("sf0.01")

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("q1_agg scan prunes to the 5 referenced lineitem columns") {
    val p = plan("q1_agg")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_shipdate"), "unreferenced column read from parquet")
    assert(!p.contains("l_partkey"), "unreferenced column read from parquet")
  }

  test("q_filter_ops pushes the event_type predicate into the parquet scan") {
    val p = plan("q_filter_ops")
    assert(p.contains("PushedFilters: [In(event_type"),
      s"predicate not pushed:\n${p.take(2000)}")
    // the ts nanos conversion must not widen the scan
    assert(!p.contains("ts:"), "ts column read though unused")
  }

  test("q_substring_dedup shuffles window hashes, never text or pair spaces") {
    val p = plan("q_substring_dedup")
    assert(!p.contains("CartesianProduct"),
      s"window-duplicate detection must never enumerate pairs:\n${p.take(2000)}")
    assert(p.contains("LeftSemi"),
      s"duplicate-set application must be a semi-join on the hash key:\n${p.take(2000)}")
    // the window hashes are computed INSIDE the explode's Generate —
    // a Project-materialized window array would re-buffer every
    // window string per row (the q_ngram_jaccard placement lesson)
    assert(p.contains("Generate explode"),
      s"window expansion must be a Generate:\n${p.take(2000)}")
  }

  test("q_substring_spans merges islands per doc — no pair space, semi-joined dups") {
    val p = plan("q_substring_spans")
    assert(!p.contains("CartesianProduct"),
      s"span derivation must never enumerate pairs:\n${p.take(2000)}")
    assert(p.contains("LeftSemi"),
      s"duplicate-set application must be a semi-join on the hash key:\n${p.take(2000)}")
    assert(p.contains("Generate explode"),
      s"window expansion must be a Generate:\n${p.take(2000)}")
    // the gaps-and-islands merge runs in ONE window partition keyed by
    // doc_id — skinny (doc_id, st) rows shuffle, text never does
    assert(p.contains("Window"), s"island merge must be a window:\n${p.take(2000)}")
  }

  test("q_image_neardup bands DISTINCT hashes — rep collapse ahead of the join") {
    val p = plan("q_image_neardup")
    assert(!p.contains("CartesianProduct"),
      s"near-dup candidates must come from the band join:\n${p.take(2000)}")
    // the representative collapse: a groupBy(hash) -> min(id) aggregate
    // feeds the banding, so mass-duplicated hashes are ONE band row
    assert(p.contains("min(__id"),
      s"band join must consume the rep-collapsed aggregate:\n${p.take(3000)}")
    assert(p.contains("bit_count"),
      s"verification must be the popcount filter:\n${p.take(2000)}")
  }

  test("q_audio_neardup runs the same rep-collapsed capped band join") {
    val p = plan("q_audio_neardup")
    assert(!p.contains("CartesianProduct"),
      s"audio near-dup candidates must come from the band join:\n${p.take(2000)}")
    // shared HammingDedup discipline: groupBy(fingerprint) -> min(id)
    // representative collapse feeds the banding
    assert(p.contains("min(__id"),
      s"band join must consume the rep-collapsed aggregate:\n${p.take(3000)}")
    assert(p.contains("bit_count"),
      s"verification must be the popcount filter:\n${p.take(2000)}")
  }

  test("q_mixture_sample broadcasts the rate table and keeps the corpus map-side") {
    val p = plan("q_mixture_sample")
    // the data-derived rate table joins back as a broadcast — the
    // corpus never shuffles for its keep decision
    assert(p.contains("BroadcastHashJoin"),
      s"rate-table join must be broadcast:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"),
      s"corpus must not shuffle for the rate join:\n${p.take(2000)}")
  }

  test("q_bm25_search: term-filtered postings, broadcast stats, TakeOrdered top-k") {
    val p = plan("q_bm25_search")
    // df and the (n_docs, avgdl) scalars join back as broadcasts; the
    // posting list is the only corpus-derived exchange
    assert(!p.contains("SortMergeJoin"),
      s"BM25 joins must all be broadcast:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"),
      s"scalar stats must broadcast, not cartesian:\n${p.take(2000)}")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered, not a global sort of the scored set:\n${p.take(2000)}")
  }

  test("q_bm25_batch ranks through the bounded-state aggregate over broadcast-joined postings") {
    val p = plan("q_bm25_batch")
    // per-query ranking must be TopKByScore partial aggregation — not
    // a Window/rank (which would sort the full Q×N score space); the
    // posting/df/query/stats joins all broadcast
    assert(p.contains("partial_topk_by_score"),
      s"expected map-side partial TopKByScore buffers:\n${p.take(3000)}")
    assert(!p.contains("Window"),
      s"window-rank over the score space:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"),
      s"posting joins must broadcast:\n${p.take(2000)}")
  }

  test("q_lm_perplexity scores through broadcast count tables — the bigram stream never shuffles to join") {
    val p = plan("q_lm_perplexity")
    assert(p.contains("BroadcastHashJoin"),
      s"model counts must join as broadcasts:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"),
      s"the scoring joins must not shuffle the bigram stream:\n${p.take(2000)}")
  }

  test("q_bpe_encode folds map-side over the vocabulary — one shuffle, no join") {
    val p = plan("q_bpe_encode")
    // the merge table is driver-side metadata baked into the fold
    // expression; the only exchange is the (token, freq) vocabulary
    // aggregation — encoding must never join or re-shuffle
    assert(!p.contains("Join"), s"vocab encode must not join:\n${p.take(2000)}")
    assert(p.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      s"one vocab aggregation exchange expected (plus AQE read):\n${p.take(2000)}")
  }

  test("bpe pack counts are a pure projection — no join, no shuffle (r14)") {
    // q_bpe_pack's final frame is the RDD-backed two-phase packing
    // output (its executedPlan is a flat scan); the encode discipline
    // lives in the counts stage feeding it — pin THAT plan. r14: the
    // counts are bpeTokens' in-row fold + literal piece-id map, so
    // the stage must carry NO join (the broadcast-table spelling was
    // dropped, NOTES_r14) and NO exchange — the corpus text never
    // leaves its scan.
    val p = graft.ops.Retrieval
      .bpePackCounts(spark, dir, graft.ops.Retrieval.BpeEncodeRounds)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"),
      s"bpe counts must not join (in-row encode):\n${p.take(2000)}")
    assert(!p.contains("Exchange"),
      s"bpe counts must not shuffle (map-side only):\n${p.take(2000)}")
  }

  test("q_url_dedup is one keyed aggregate over canonical URLs — no join") {
    val p = plan("q_url_dedup")
    assert(!p.contains("Join"),
      s"URL dedup must not join:\n${p.take(2000)}")
    assert(p.contains("HashAggregate"),
      s"dedup must be the keyed min/count aggregate:\n${p.take(2000)}")
    assert(!p.contains("Window"),
      s"no window over the corpus — the aggregate IS the dedup:\n${p.take(2000)}")
  }

  test("q_domain_cap ranks through the bounded-state topk aggregate, no global window") {
    val p = plan("q_domain_cap")
    assert(p.contains("ObjectHashAggregate"),
      s"per-domain cap must ride topk_by_score (map-side partials are " +
        s"the hot-domain skew mitigation):\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no corpus-side join in the cap:\n${p.take(2000)}")
    // no row_number window over the raw corpus — ranking happens on
    // the exploded ≤cap survivors only
    assert(!p.contains("row_number"),
      s"cap must not window the corpus:\n${p.take(2000)}")
  }

  test("q_bpe_tokens is a pure projection — no join, only the presentation sort exchanges") {
    val p = plan("q_bpe_tokens")
    assert(!p.contains("Join"),
      s"the native encode must not join:\n${p.take(2000)}")
    assert(!p.contains("HashAggregate"),
      s"the native encode must not aggregate:\n${p.take(2000)}")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, // range partitioning for the orderBy, AQE read
      s"only the presentation sort may exchange ($exchanges):\n${p.take(2000)}")
  }

  test("q_mmr_batch: bounded-state candidate topk, no cartesian pair space") {
    val p = plan("q_mmr_batch")
    assert(!p.contains("CartesianProduct"),
      s"the candidate pair space must stay (q_id, dim)-keyed:\n${p.take(3000)}")
    assert(p.contains("ObjectHashAggregate"),
      s"candidate retrieval must ride topk_by_score:\n${p.take(3000)}")
    assert(p.contains("MapGroups"), // flatMapGroups' physical node
      s"the greedy fold runs per ≤K-row group on executors:\n${p.take(3000)}")
  }

  test("q_pii_redact is pure map-side — no join, no aggregation") {
    val p = plan("q_pii_redact")
    assert(!p.contains("Join"), s"PII pass must not join:\n${p.take(2000)}")
    assert(!p.contains("HashAggregate"),
      s"PII pass must not aggregate:\n${p.take(2000)}")
  }

  test("q_semantic_dedup pairs representatives via equi-join over the rep collapse") {
    val p = plan("q_semantic_dedup")
    assert(!p.contains("CartesianProduct"),
      s"pair stage must be the per-cell equi-join:\n${p.take(2000)}")
    // the exact-duplicate collapse: min(vec_id) window over
    // (cell, embedding) ahead of the pair join
    assert(p.contains("min(vec_id"),
      s"pair join must consume rep-collapsed rows:\n${p.take(3000)}")
    // the dropped-rep join carries NO broadcast hint (at production
    // dedup rates the dropped set is corpus-sized; AQE broadcasts it
    // at runtime when small) — pin only that it stays an equi-join
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"dropped-rep join must be an equi-join:\n${p.take(2000)}")
  }

  test("q_semantic_decon broadcasts ONLY the routed eval side — never the corpus") {
    // AQE off for THIS plan so the physical tree is traversable (an
    // AdaptiveSparkPlanExec is a leaf wrapper that hides its subtree
    // from collect); the broadcast under test is builder-hinted, not
    // an AQE promotion, so the shape is identical either way
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = SparkEntry.queries("q_semantic_decon")(spark, dir).queryExecution
      val p = qe.executedPlan.toString
      // scoring meets on the cell equi-join — no all-pairs shape
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"decon scoring must be the cell equi-join:\n${p.take(2000)}")
      // the ONLY broadcast subtrees are the routed eval set (its
      // nearest_cells explode marks it); the corpus side — the
      // embeddings scan UNIONed with the planted rows — must never
      // sit under a BroadcastExchange. At 100 TB the eval suite is
      // MBs and the corpus is the TB side.
      import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
      val bcasts = qe.executedPlan.collect { case b: BroadcastExchangeExec => b }
      assert(bcasts.nonEmpty, "eval routing should broadcast")
      bcasts.foreach { b =>
        val sub = b.toString
        assert(sub.contains("nearest_cells"),
          s"unexpected broadcast subtree (corpus-scale?):\n${sub.take(1500)}")
        assert(!sub.contains("Union"),
          s"corpus union must never broadcast:\n${sub.take(1500)}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q_video_neardup candidates come from the sig-collapsed band join") {
    val p = plan("q_video_neardup")
    assert(!p.contains("CartesianProduct"),
      s"video near-dup must never enumerate pairs:\n${p.take(2000)}")
    assert(p.contains("min(media_id"),
      s"band join must consume the signature-collapsed aggregate:\n${p.take(3000)}")
    assert(p.contains("bit_count"),
      s"verification must be the per-slot popcount:\n${p.take(2000)}")
  }

  test("q_enrich_join is a broadcast LEFT join, never a shuffle join") {
    val p = plan("q_enrich_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("LeftOuter"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_multi_join broadcasts every dimension (no fact-side shuffle before agg)") {
    val p = plan("q_multi_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 4)
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_skew_join shuffles on (key, salt) — salted keys, no broadcast shortcut") {
    val p = plan("q_skew_join")
    // the salt must be IN the join keys (that's what spreads the hub
    // key over saltBuckets reducers)...
    assert(p.contains("__salt"), s"salt absent from the physical plan:\n${p.take(2000)}")
    val joinLine = p.linesIterator.find(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(joinLine.isDefined, "expected a shuffle join (broadcastDim = false)")
    assert(joinLine.get.contains("__salt"), s"join keys lack the salt: ${joinLine.get}")
    // ...and the dim must NOT have been broadcast behind our back, or
    // the test proves nothing about the skew path
    assert(!p.contains("BroadcastHashJoin"), "dim was broadcast — salt is dead code")
  }

  test("q_similarity_topk broadcasts the query vector and take-orders the top-k") {
    val p = plan("q_similarity_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k should be TakeOrdered, not a global sort")
  }

  test("q_sort_limit uses TakeOrderedAndProject, not a full sort") {
    val p = plan("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q1_agg aggregates inside WholeStageCodegen with partial aggregation") {
    val qe = SparkEntry.queries("q1_agg")(spark, dir).queryExecution
    qe.toRdd.count()  // materialize AQE stages so codegen markers appear
    val p = qe.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in this rendering
    assert(p.contains("WholeStageCodegen") || p.contains("*("))
    assert(p.contains("HashAggregate"))
    // partial + final pairs
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q_ngram_jaccard joins on the hashed shingle key (long), not strings") {
    val p = plan("q_ngram_jaccard")
    assert(!p.contains("CartesianProduct"), "pair space must not materialize")
  }

  test("q_ann_lsh candidate generation is a hash join on probe buckets, not a corpus scan") {
    val p = plan("q_ann_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"LSH probe must be an equi-join on enumerated bucket ids:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q_embedding_neardup_lsh pairs come from an equi-join, never a pair scan") {
    val p = plan("q_embedding_neardup_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucket-collision join must be an equi-join:\n${p.take(2000)}")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_vocab_topk is TakeOrdered over a partial-aggregated token count") {
    val p = plan("q_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "needs partial+final agg")
  }

  test("q_batch_topk ranks through the bounded-state aggregate, not a score-space sort") {
    val p = plan("q_batch_topk")
    // scoring is a broadcast pass; ranking must be TopKByScore partial
    // aggregation — never a Window/rank (which would sort the full Q×N
    // score space) and never a shuffled join of corpus×queries
    assert(p.contains("partial_topk_by_score"),
      s"expected map-side partial TopKByScore buffers:\n$p")
    assert(!p.contains("Window"), s"window-rank over the score space:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus side must not shuffle:\n$p")
  }

  test("q_tfidf_topterms joins df on the token key without cartesian blowup") {
    val p = plan("q_tfidf_topterms")
    assert(!p.contains("CartesianProduct"), s"cartesian in tf-idf:\n$p")
    // the only nested-loop join allowed is the 1-row corpus-size scalar
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"corpus-size scalar should broadcast:\n$p")
  }

  test("q_corpus_select is one scored scan + one window — no self-join, no cache") {
    val p = plan("q_corpus_select")
    // keeper selection is a min-over-digest-partition window, so the
    // text is scanned exactly once and nothing needs persisting
    assert(!p.contains("Join"), s"keeper self-join crept back:\n$p")
    assert(!p.contains("InMemoryTableScan"),
      "no cache expected in the single-pass form")
    assert(p.contains("Window"), "keeper selection should be a window")
    assert(p.sliding("FileScan".length).count(_ == "FileScan") === 1,
      "documents must be scanned exactly once")
  }

  test("q_shard_interleave ranks through bucketed windows — no single-partition sort, no text") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = SparkEntry.queries("q_shard_interleave")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the global order is decomposed into ≤1024 monotone hash-bucket
    // windows — the classic everything-to-one-partition rank pathology
    // must never appear (that is the operator's whole scale claim)
    val windows = df.queryExecution.sparkPlan.collect {
      case w: WindowExec => w
    }
    assert(windows.nonEmpty, s"expected a window rank:\n$p")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"single-partition window (global sort) in:\n$p"))
    // the interleave is an id/source/lang operation: document TEXT
    // must not be read for it
    assert(!p.contains("text"), s"text column read by the interleave:\n$p")
  }

  test("q_rep_quality is map-side: no join, no aggregation exchange") {
    val p = plan("q_rep_quality")
    assert(!p.contains("Join"), s"rep-quality must not join:\n$p")
    assert(!p.contains("HashAggregate"),
      s"rep-quality metrics must stay inside the row, not aggregate:\n$p")
    assert(p.sliding("FileScan".length).count(_ == "FileScan") === 1,
      "documents must be scanned exactly once")
  }

  test("q_decontaminate broadcasts the eval side — corpus shingles never shuffle to join") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"eval side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shingles shuffled into a merge join:\n$p")
    // overlap count must partial-aggregate map-side before the
    // (doc, eval) exchange
    assert(p.contains("partial_count") || p.contains("partial count") ||
      "HashAggregate".r.findAllIn(p).size >= 2,
      s"no map-side partial aggregation:\n$p")
  }

  test("past-cap decon bloom probe is codegen-native — no ScalaUDF in the plan") {
    // the bloom-semi-reduced shuffle arm (cap=0 forces it) must probe
    // through Spark's codegen BloomFilterMightContain, not a Scala
    // UDF: a UDF splits WholeStageCodegen around the corpus-scan
    // filter exactly where 100×-scale corpora live (VERDICT r16)
    import org.apache.spark.sql.functions.col
    val docs = graft.io.Tables.documents(spark, dir)
    val ex = docs
      .withColumn("toks", graft.ops.TextOps.tokens(col("text")))
      .select(col("doc_id"),
        graft.functions.ngram_hash_explode(col("toks")).as("h"))
    val p = graft.ops.TextOps.deconPairCounts(ex, docs, broadcastRowCap = 0L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), s"bloom probe fell back to a UDF:\n$p")
    assert(p.contains("might_contain"), s"bloom probe missing:\n$p")
  }

  test("q_embed_quant broadcasts the query and take-orders the top-k") {
    val p = plan("q_embed_quant")
    assert(p.contains("TakeOrderedAndProject"), s"full sort for a top-10:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"quantized rerank must not shuffle the corpus:\n$p")
  }

  test("q_pq_adc scores through code lookups: no join, no corpus shuffle") {
    val p = plan("q_pq_adc")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"ADC scoring must be lookup-only:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"full sort for a top-10:\n$p")
    // round 7: encode and ADC are the single native expressions (the
    // m-composed nearest_centroid/element_at spellings paid
    // m-proportional and per-query codegen compiles)
    assert(p.contains("pq_encode"), s"native encode missing:\n$p")
    assert(p.contains("pq_adc_dist"), s"native ADC scoring missing:\n$p")
  }

  /** Count FileSourceScanExec nodes over the documents table,
    * descending into cached subplans (each distinct InMemoryRelation's
    * underlying scan counts ONCE — that is what a materialization
    * actually reads) and through AQE wrappers. The honest "how many
    * times do we read text bytes" metric for the corpus queries. */
  private def documentScans(name: String): Int = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val seen = scala.collection.mutable.Set.empty[Int]
    var n = 0
    def walk(q: SparkPlan): Unit = {
      q match {
        case f: FileSourceScanExec =>
          // match the relation's location basename, not the rendered
          // plan string — a testdata path containing "documents" must
          // not make every scan count
          if (f.relation.location.rootPaths.exists(
              _.getName.startsWith("documents"))) n += 1
        case im: InMemoryTableScanExec =>
          if (seen.add(System.identityHashCode(im.relation.cacheBuilder)))
            walk(im.relation.cachedPlan)
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        // an EXECUTED adaptive plan (the builders materialize their
        // caches eagerly now) is a tree of query stages whose subtrees
        // hang off `plan`, not `children`
        case qs: QueryStageExec => walk(qs.plan)
        case _ =>
      }
      q.children.foreach(walk)
    }
    walk(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan)
    n
  }

  private def documentScansOf(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val seen = scala.collection.mutable.Set.empty[Int]
    var n = 0
    def walk(q: SparkPlan): Unit = {
      q match {
        case f: FileSourceScanExec =>
          if (f.relation.location.rootPaths.exists(
              _.getName.startsWith("documents"))) n += 1
        case im: InMemoryTableScanExec =>
          if (seen.add(System.identityHashCode(im.relation.cacheBuilder)))
            walk(im.relation.cachedPlan)
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: QueryStageExec => walk(qs.plan)
        case _ =>
      }
      q.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }

  test("q_corpus_pipeline reads document text exactly once (fused feature scan)") {
    // the round-5 verdict's top finding: the pipeline used to scan the
    // full text ~5×; the fused corpusFeatures scan + persisted skinny
    // feature table must keep it at ONE text read per materialization.
    // Audited on the LAZY selection plan — the public entry memoizes
    // an eager localCheckpoint whose returned plan no longer shows the
    // scan it already paid (round-8 memoization).
    val (selected, feats, shingles) = ops.TextOps.corpusPipelineSelection(spark, dir)
    try assert(documentScansOf(selected) === 1,
      "q_corpus_pipeline must read documents exactly once")
    finally { feats.unpersist(false); shingles.unpersist(false) }
  }

  test("q_rag_pipeline reads document text exactly once (chunk frame feeds every stage)") {
    // chunking, embeddings, the index corpus, BM25 postings AND the
    // query frame all derive from one tokenized chunk frame — at
    // 100 TB a second text scan is another 100 TB of I/O. Audited on
    // the lazy composition (the public entry memoizes checkpoints
    // whose plans no longer show the scan they paid).
    import org.apache.spark.sql.functions.col
    val docs = graft.io.Tables.documents(spark, dir)
    val chunks = ops.Rag.chunkFrame(docs).persist()
    val dense = ops.Rag.denseOf(chunks).persist()
    val centers = ops.Ivf.fit(dense, col("embedding"),
      Seq(col("doc_id"), col("chunk_idx")), k = ops.Rag.RagCells,
      iters = ops.Rag.RagIters)
    try assert(documentScansOf(ops.Rag.serveOf(chunks, dense, centers)) === 1,
      "q_rag_pipeline must read documents exactly once")
    finally { chunks.unpersist(false); dense.unpersist(false) }
  }

  test("q_corpus_select_dedup reads document text exactly once") {
    val (selected, feats) = ops.TextOps.corpusSelectDedupSelection(spark, dir)
    try assert(documentScansOf(selected) === 1,
      "q_corpus_select_dedup must read documents exactly once")
    finally feats.unpersist(false)
  }

  test("q_ann_ivf_built probes via partition-level cell filtering, no corpus shuffle") {
    val p = plan("q_ann_ivf_built")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"IVF probe must not shuffle the corpus:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"full sort for a top-10:\n$p")
    // cell assignment is the codegen'd expression, not a UDF
    assert(p.contains("nearest_centroid"), s"native cell assignment missing:\n$p")
  }
}
