package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import Util.{lpadKey, roundTo, roundToSql}
import TextOps.{ChunkSize, ChunkStride, hash60, hash60Sql, tokens, tokensSql}
import VectorOps.{cosineSql, distSqSql, dotSql}

/** THE COMPOSED RAG-INGESTION CHAIN as one oracle-checked query
  * (VERDICT r16 #4): every stage of a retrieval-augmented-generation
  * corpus build — sliding-window chunking (q_chunk_docs geometry),
  * per-chunk feature-hashed tf-idf embeddings (the q_hash_embed
  * ladder), a BUILT IVF coarse quantizer over the chunk vectors
  * (Ivf.fit — k-means, decimal-exact means), and hybrid serving of a
  * query frame (IVF-routed cosine leg + chunk-level BM25 leg, fused
  * by reciprocal rank) — run end-to-end and hash-replayed in DuckDB,
  * the same "compose all stages, oracle the whole chain" treatment
  * q_corpus_pipeline gave corpus selection.
  *
  * PLAN SHAPE (the 100 TB story):
  *   - documents is tokenized ONCE: the chunk frame (doc_id,
  *     chunk_idx, ctoks) is the session-memoized root every stage —
  *     embeddings, index, BM25 postings, and even the QUERY FRAME
  *     (chunk 0 covers token positions 1/5/9) — derives from
  *     (RagSpec/PlanSpec pin: one documents scan under the whole
  *     served plan).
  *   - chunking and embedding are the audited q_chunk_docs /
  *     q_hash_embed shapes: map-side explode, token-keyed aggregates,
  *     text never shuffles past the tokenize.
  *   - the index is a REAL fitted quantizer ([[Ivf.fit]]: one
  *     map-side assignment pass + one K×64-row decimal aggregate per
  *     iteration; vectors never shuffle) and cell assignment is the
  *     codegen'd nearest_centroid — the layout [[Ivf.writeIndex]]
  *     would persist cell-partitioned at production scale.
  *   - serving is the audited q_ivf_batch + q_bm25_batch pair: the
  *     query frame broadcasts (routed cells on the semantic leg,
  *     query terms pre-filtering the posting explode on the lexical
  *     leg), both legs rank through the BOUNDED-STATE topk_by_score
  *     aggregate (K rows of state per query, no score-space sort),
  *     and RRF fusion joins two ≤K-row lists per query — the final
  *     window runs over ≤2K candidates, never the corpus.
  *
  * Determinism/oracle parity: the embed ladder is round6(w) →
  * DECIMAL(28,6) sum → round4 (q_hash_embed's contract); dense
  * vectors are those round4 values cast FLOAT (so the DuckDB twin is
  * `CAST(val AS REAL)` — both IEEE round-to-nearest); k-means seeds
  * are the first [[RagCells]] chunks in (doc_id, chunk_idx) order and
  * means accumulate in DECIMAL(28,9) (order-free, the Ivf.fit
  * contract); cosine is the sequential float→double fold rounded to 6
  * (the q_ivf_batch rule); BM25 contributions round to 6 and sum as
  * DECIMAL(18,6) → round4; RRF legs and the fused score round to 9
  * (the q_hybrid_search rule). Zero-norm chunks/queries are excluded
  * from the SEMANTIC leg only (cosine is undefined on them; they
  * remain lexical candidates), spelled `dot(e,e) > 0` in both
  * engines.
  */
object Rag {

  /** IVF cells over the chunk corpus. Small by design: the oracle
    * replays the fit, and the composition — not quantizer capacity —
    * is this query's subject (q_ann_recall* gate recall). */
  val RagCells = 4

  /** Lloyd iterations (the oracle replays each mean update). */
  val RagIters = 1

  /** Probed cells per query. */
  val RagProbe = 2

  /** Per-leg candidate depth (the q_hybrid_search K). */
  val RagK: Int = Retrieval.HybridK

  /** Fused results per query. */
  val RagFinal = 5

  /** Sliding-window chunk frame (doc_id, chunk_idx, ctoks) — the
    * q_chunk_docs geometry ([[TextOps.ChunkSize]]/[[TextOps.ChunkStride]])
    * with the token SLICE kept (the retrieval unit needs content, not
    * just the summary q_chunk_docs emits). Map-side: starts are
    * generated inside the explode from the token count; an empty doc
    * yields one empty chunk (dl 0 — it counts in the corpus stats,
    * carries no postings, and never reaches the index). */
  private[graft] def chunkFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), greatest(col("n") - 1, lit(0)),
          lit(ChunkStride))).as("start"))
      .select(col("doc_id"),
        (col("start") / ChunkStride).cast("int").as("chunk_idx"),
        slice(col("toks"), col("start") + 1, lit(ChunkSize)).as("ctoks"))

  /** (doc_id, chunk_idx, dl, token) posting explode. */
  private def exOf(chunks: DataFrame): DataFrame =
    chunks.select(col("doc_id"), col("chunk_idx"),
      size(col("ctoks")).as("dl"), explode(col("ctoks")).as("token"))

  /** 1-row (n_chunks, avgdl) corpus stats — broadcast everywhere. */
  private def statsOf(chunks: DataFrame): DataFrame =
    chunks.agg(count(lit(1)).as("n_chunks"),
      (sum(size(col("ctoks"))).cast("double") / count(lit(1))).as("avgdl"))

  /** Per-chunk (doc_id, chunk_idx, token, tf) term frequencies. */
  private def htfOf(chunks: DataFrame): DataFrame =
    exOf(chunks).filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("chunk_idx"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** The chunk-corpus document-frequency table (token, df) — the
    * embedding model's VOCABULARY artifact. Captured at build time
    * and frozen for incremental ingestion ([[streamIngest]]): a
    * vector embedded under drifted df would not live in the same
    * space as the index it joins. */
  private[graft] def dfTableOf(chunks: DataFrame): DataFrame =
    htfOf(chunks).groupBy(col("token")).agg(count(lit(1)).as("df"))

  /** The tf-idf weight ladder (round6 w → decimal sum → round4 val)
    * over an htf frame joined to a df table under corpus size `n` —
    * ONE spelling behind the batch build and the frozen incremental
    * path. The df join is INNER: a token absent from the (frozen)
    * vocabulary contributes no weight — the standard frozen-idf
    * contract. The df table is vocab-bounded (broadcast here; drop
    * the hint and AQE shuffle-joins past broadcast range — the
    * lmPerplexity note). */
  private def skinnyOf(htf: DataFrame, dfTable: DataFrame,
      n: Column): DataFrame =
    htf.join(broadcast(dfTable), Seq("token"))
      .select(col("doc_id"), col("chunk_idx"),
        (hash60(col("token")) % 64).as("dim"),
        roundTo(col("tf") * log((n + 1.0) / (col("df") + 1.0)), 6)
          .as("w"))
      .groupBy(col("doc_id"), col("chunk_idx"), col("dim"))
      .agg(roundTo(sum(col("w").cast("decimal(28,6)")).cast("double"), 4)
        .as("val"))

  /** Skinny (doc_id, chunk_idx, dim, val) hashed tf-idf chunk
    * embeddings — the q_hash_embed ladder keyed by chunk, df and
    * stats derived from the chunks themselves (the batch build). */
  private def chunkSkinny(chunks: DataFrame): DataFrame = {
    val htf = htfOf(chunks)
    val hdf = htf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    skinnyOf(htf.crossJoin(broadcast(statsOf(chunks))), hdf,
      col("n_chunks"))
  }

  /** Densify a skinny (keys…, dim, val) frame to a 64-slot
    * array<float> — zero-filled, elements in dim order. Only keys
    * with ≥1 skinny row appear (both engines spell it that way). */
  private def densify(skinny: DataFrame, keys: Seq[String],
      out: String): DataFrame =
    skinny.groupBy(keys.map(col): _*)
      .agg(map_from_entries(collect_list(
        struct(col("dim").cast("int"), col("val")))).as("m"))
      .select(keys.map(col) :+ transform(sequence(lit(0), lit(63)),
        i => coalesce(element_at(col("m"), i), lit(0.0)).cast("float"))
        .as(out): _*)

  /** Dense NONZERO chunk vectors — the index corpus. Zero vectors
    * (every token's idf rounds to 0) have no cosine and are dropped
    * before the fit, spelled as the shared dot-fold in both engines. */
  private[graft] def denseOf(chunks: DataFrame): DataFrame =
    densify(chunkSkinny(chunks), Seq("doc_id", "chunk_idx"), "embedding")
      .filter(VectorOps.dot(col("embedding"), col("embedding")) > 0)

  /** [[denseOf]] under a FROZEN embedding context (df table + corpus
    * size captured at build time): the incremental-ingestion spelling
    * — identical arithmetic, so a chunk embedded through the frozen
    * path is bit-equal to the same chunk in the batch build. Chunks
    * whose every token is outside the frozen vocabulary produce no
    * vector (nothing to score them with) and are not indexed. */
  private[graft] def denseFrozen(chunks: DataFrame, dfTable: DataFrame,
      nChunks: Long): DataFrame =
    densify(skinnyOf(htfOf(chunks), dfTable, lit(nChunks)),
      Seq("doc_id", "chunk_idx"), "embedding")
      .filter(VectorOps.dot(col("embedding"), col("embedding")) > 0)

  /** STREAMING RAG INGESTION — the incremental arm of the composed
    * chain: a stream of (doc_id, text) documents is chunked, embedded
    * under the FROZEN build-time context (df vocabulary + corpus
    * size), cell-assigned against the frozen quantizer, and appended
    * to the cell-partitioned index through [[Ivf.appendBatch]]'s
    * batch_id-idempotent dynamic overwrite (replays rewrite exactly
    * their own slices — the warehouse-sink exactly-once contract).
    * Chunking is stateless; the per-chunk tf/densify aggregations run
    * INSIDE foreachBatch where they are plain batch plans — no
    * streaming-aggregation state, no watermark. Serving reads through
    * [[Ivf.readIndex]] (compacted generations + live tail), so
    * [[Ivf.compactIndex]] bounds the small-file accumulation at
    * production cadence. Quantizer/df refits swap ATOMICALLY with a
    * full re-embed — frozen artifacts version together. */
  def streamIngest(docs: DataFrame, dfTable: DataFrame, nChunks: Long,
      centers: Array[Array[Double]], indexDir: String, checkpoint: String,
      triggerMs: Long = 1000L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Ivf.appendBatch(denseFrozen(chunkFrame(batch), dfTable, nChunks),
          col("embedding"), centers, indexDir, batchId)
      }
      .start()

  /** Batch chunk-index layout for OFFLINE MAINTENANCE: [[Ivf.writeIndex]]
    * with the packed composite chunk key added as `vec_id`, so the
    * Ivf drift/refit machinery (a single-id contract) runs unchanged
    * on a RAG index. Zero-padded packing keeps lexicographic order ==
    * (doc_id, chunk_idx) numeric order, so fit tie-breaks stay
    * deterministic. */
  def writeChunkIndex(dense: DataFrame, centers: Array[Array[Double]],
      dir: String, numFiles: Int = 32): Unit =
    Ivf.writeIndex(dense.withColumn("vec_id", chunkKey), col("embedding"),
      col("vec_id"), centers, dir, numFiles)

  /** QUANTIZER drift repair for a RAG chunk index (VERDICT r17 #2,
    * second half): geometry-drifted cells are re-seeded and their
    * rows re-assigned via [[Ivf.refitDriftedCells]] at O(drifted
    * rows). This is CELL SURGERY under the frozen-df contract — the
    * embedding VALUES never move (only a vocabulary/df refit
    * re-embeds, and that is a full rebuild with an atomic artifact
    * swap, per [[streamIngest]]). Gate the returned quantizer with a
    * [[semRecallOf]]-style recall read before swapping it in; RagSpec
    * pins the arc (drift detected → refit → recall recovered, values
    * bit-identical). `baseline` is [[Ivf.cellStats]] captured at fit
    * time. */
  def refitDrifted(spark: SparkSession, indexDir: String,
      centers: Array[Array[Double]], baseline: DataFrame,
      driftFactor: Double = 2.0, minRows: Long = 100): Array[Array[Double]] =
    Ivf.refitDriftedCells(spark, indexDir, centers, baseline, driftFactor,
      minRows, embColName = "embedding", idColName = "vec_id")

  // --- session memos: the chunk tokenize, the dense corpus, and the
  // fitted quantizer are each paid once per (session, dir); the
  // checkpoints make every later pass a block scan (the
  // corpusPipeline memo discipline). ---
  private def chunksMemo(s: SparkSession, dir: String): DataFrame =
    Memo.stage(s, dir, "rag_chunks") {
      chunkFrame(Tables.documents(s, dir)).localCheckpoint(true)
    }

  private def denseMemo(s: SparkSession, dir: String): DataFrame =
    Memo.stage(s, dir, "rag_dense") {
      denseOf(chunksMemo(s, dir)).localCheckpoint(true)
    }

  private def centersMemo(s: SparkSession, dir: String): Array[Array[Double]] =
    Memo.stage(s, dir, "rag_centers") {
      Ivf.fit(denseMemo(s, dir), col("embedding"),
        Seq(col("doc_id"), col("chunk_idx")), k = RagCells, iters = RagIters)
    }

  /** Composite (doc_id, chunk_idx) topk/tie key: two zero-padded
    * numeric fields, so lexicographic order == (doc_id, chunk_idx)
    * numeric order — no packing bound on either field. */
  private def chunkKey: Column =
    concat(lpadKey(col("doc_id")), lit("|"),
      lpad(col("chunk_idx").cast("string"), 10, "0"))

  /** The served chain over explicit (chunks, dense, centers) — the
    * testable core ([[ragServe]] passes the session memos; RagSpec's
    * plan audit passes persisted frames so the one-text-scan property
    * is visible in the lazy plan). `queryMod` sets the query-frame
    * density (every doc_id ≡ 0 (mod queryMod) with ≥9 tokens; the
    * declared query pins 100, RagScaleProbe raises it to hold the
    * serving batch at a fixed query budget while the corpus scales —
    * the production shape is "N queries against a corpus", not
    * "corpus/100 queries"). */
  /** Shared query-side context: (stats, ex, qf, qvec) — the corpus
    * stats, posting explode, query term frame, and dense query
    * vectors (nonzero only). One spelling behind [[serveOf]] and
    * [[semRecallOf]]. */
  private def queryCtx(chunks: DataFrame, queryMod: Long)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val stats = statsOf(chunks)
    val ex = exOf(chunks)
    // query frame: chunk 0 covers token positions 1/5/9 and
    // len(ctoks)>=9 ⟺ doc length >= 9 (ChunkSize ≥ 9) — the
    // q_bm25_batch query convention WITHOUT a second text scan
    val qf = chunks.filter(col("chunk_idx") === 0 &&
        col("doc_id") % queryMod === 0 && size(col("ctoks")) >= 9)
      .select(col("doc_id").as("q_id"),
        explode(array(element_at(col("ctoks"), 1),
          element_at(col("ctoks"), 5),
          element_at(col("ctoks"), 9))).as("token"))
    val qTerms = qf.select(col("token")).distinct()
    // embed the query like a chunk (query-term-restricted df — same
    // VALUES as the full-vocab chunk df, a fraction of the cost)
    val qdf = ex.join(broadcast(qTerms), Seq("token"))
      .select(col("doc_id"), col("chunk_idx"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val qskinny = qf.groupBy(col("q_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .join(broadcast(qdf), Seq("token"))
      .crossJoin(broadcast(stats))
      .select(col("q_id"), (hash60(col("token")) % 64).as("dim"),
        roundTo(col("tf") * log((col("n_chunks") + 1.0) / (col("df") + 1.0)), 6)
          .as("w"))
      .groupBy(col("q_id"), col("dim"))
      .agg(roundTo(sum(col("w").cast("decimal(28,6)")).cast("double"), 4)
        .as("val"))
    val qvec = densify(qskinny, Seq("q_id"), "q_emb")
      .filter(VectorOps.dot(col("q_emb"), col("q_emb")) > 0)
    (stats, ex, qf, qvec)
  }

  /** IVF-routed cosine candidates (q_id, cos_sim round6, key) —
    * the semantic leg's scored stream before the top-K cut. */
  private def semScored(dense: DataFrame, centers: Array[Array[Double]],
      qvec: DataFrame): DataFrame =
    semScoredAssigned(Ivf.assign(dense, col("embedding"), centers),
      centers, qvec)

  /** [[semScored]] over a frame that ALREADY carries its `cell`
    * column — the spelling a PERSISTED index serves through (its
    * cells were assigned at append time; re-assigning would mask a
    * stale-routing bug instead of serving what is on disk). */
  private def semScoredAssigned(index: DataFrame,
      centers: Array[Array[Double]], qvec: DataFrame): DataFrame = {
    val routed = qvec.select(col("q_id"), col("q_emb"),
      explode(graft.functions.nearest_cells(col("q_emb"), centers, RagProbe))
        .as("cell"))
    index.join(broadcast(routed), Seq("cell"))
      .filter(col("doc_id") =!= col("q_id"))
      .select(col("q_id"),
        roundTo(graft.functions.cosine_sim(col("embedding"), col("q_emb")), 6)
          .as("cos_sim"),
        chunkKey.as("key"))
  }

  /** SERVING FRESHNESS under streamed appends (VERDICT r17 #2): the
    * semantic leg served from a PERSISTED index directory — the one
    * [[streamIngest]] appends into. Candidates come merge-on-read
    * through [[Ivf.readIndex]] (committed compaction generations +
    * the post-horizon live tail, tombstones folded), so a query
    * served after micro-batch N sees every chunk batch N landed and
    * never a deleted one. Queries derive from `chunks` (the served
    * corpus view) under the same frozen embedding context as the
    * index build; routing uses the same frozen quantizer the appends
    * were assigned with. RagSpec pins horizon-by-horizon equality
    * with a batch-built index over the same docs. */
  private[graft] def semServeIndexed(spark: SparkSession, indexDir: String,
      centers: Array[Array[Double]], chunks: DataFrame,
      dfTable: DataFrame, nChunks: Long, queryMod: Long = 100): DataFrame = {
    val qvec = queryVecFrozen(chunks, dfTable, nChunks, queryMod)
    topkCut(semScoredAssigned(Ivf.readIndex(spark, indexDir), centers, qvec),
      "cos_sim", RagK, "r_sem")
  }

  /** Query frame + FROZEN-context query embeddings: the incremental
    * lanes' query-side twin of [[denseFrozen]] — the df values and
    * corpus size are the build-time artifacts, so a query embedded
    * today scores bit-identically against vectors indexed yesterday
    * (mixing a live df into the query embed would skew every cosine
    * as the corpus grows). */
  private def queryVecFrozen(chunks: DataFrame, dfTable: DataFrame,
      nChunks: Long, queryMod: Long): DataFrame = {
    val qf = chunks.filter(col("chunk_idx") === 0 &&
        col("doc_id") % queryMod === 0 && size(col("ctoks")) >= 9)
      .select(col("doc_id").as("q_id"),
        explode(array(element_at(col("ctoks"), 1),
          element_at(col("ctoks"), 5),
          element_at(col("ctoks"), 9))).as("token"))
    val qskinny = qf.groupBy(col("q_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .join(broadcast(dfTable), Seq("token")) // frozen df values
      .select(col("q_id"), (hash60(col("token")) % 64).as("dim"),
        roundTo(col("tf") * log((lit(nChunks) + 1.0) / (col("df") + 1.0)), 6)
          .as("w"))
      .groupBy(col("q_id"), col("dim"))
      .agg(roundTo(sum(col("w").cast("decimal(28,6)")).cast("double"), 4)
        .as("val"))
    densify(qskinny, Seq("q_id"), "q_emb")
      .filter(VectorOps.dot(col("q_emb"), col("q_emb")) > 0)
  }

  /** Bounded-state per-query top-K cut of a (q_id, score, key)
    * stream → (q_id, rank, key). */
  private def topkCut(scored: DataFrame, score: String, k: Int,
      rankName: String): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(graft.functions.topk_by_score(col(score), col("key"), k)
        .as("topk"))
      .select(col("q_id"), posexplode(col("topk")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as(rankName),
        col("col.key").as("key"))

  private[graft] def serveOf(chunks: DataFrame, dense: DataFrame,
      centers: Array[Array[Double]], queryMod: Long = 100): DataFrame = {
    val (stats, ex, qf, qvec) = queryCtx(chunks, queryMod)
    val qTerms = qf.select(col("token")).distinct()

    // --- semantic leg: route nProbe cells, cosine in routed cells
    // only, bounded-state top-K ---
    val sem = topkCut(semScored(dense, centers, qvec), "cos_sim", RagK, "r_sem")

    // --- lexical leg: q_bm25_batch over chunks (query terms die
    // map-side before the posting shuffle; repeated query terms
    // weight double through the multiplicity join) ---
    val fx = ex.join(broadcast(qTerms), Seq("token"))
    val ltf = fx.groupBy(col("doc_id"), col("chunk_idx"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val ldf = ltf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val lex = topkCut(
      ltf.join(broadcast(ldf), Seq("token"))
        .join(broadcast(qf), Seq("token"))
        .filter(col("doc_id") =!= col("q_id"))
        .crossJoin(broadcast(stats))
        .withColumn("c", Retrieval.bmContrib(col("tf"), col("df"), col("dl"),
          col("n_chunks"), col("avgdl")))
        .groupBy(col("q_id"), col("doc_id"), col("chunk_idx"))
        .agg(sum(col("c").cast("decimal(18,6)")).cast("double").as("s0"))
        .select(col("q_id"), roundTo(col("s0"), 4).as("score"),
          chunkKey.as("key")),
      "score", RagK, "r_lex")

    // --- RRF fusion over ≤2K candidates per query ---
    def leg(r: Column): Column =
      roundTo(when(r.isNotNull,
        lit(1.0) / (lit(Retrieval.RrfC) + r.cast("double")))
        .otherwise(lit(0.0)), 9)
    lex.join(sem, Seq("q_id", "key"), "full_outer")
      .select(col("q_id"), col("key"), col("r_lex"), col("r_sem"),
        roundTo(leg(col("r_lex")) + leg(col("r_sem")), 9).as("rrf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("rrf").desc, col("key").asc)).cast("long"))
      .filter(col("rank") <= RagFinal)
      .select(col("q_id"), col("rank"),
        substring(col("key"), 1, 19).cast("long").as("doc_id"),
        substring(col("key"), 21, 10).cast("int").as("chunk_idx"),
        col("rrf"), col("r_lex"), col("r_sem"))
      .orderBy("q_id", "rank")
  }

  /** The declared query: memoized chunk/dense/quantizer stages +
    * [[serveOf]]. */
  def ragServe(s: SparkSession, dir: String): DataFrame =
    serveOf(chunksMemo(s, dir), denseMemo(s, dir), centersMemo(s, dir))

  /** Recall@[[RecallK]] of the composed chain's IVF-ROUTED semantic
    * leg against the UNROUTED exact cosine over the same dense chunk
    * corpus — the q_ann_recall discipline applied to q_rag_pipeline:
    * routing loss inside the composition is a declared, hash-checked
    * number (per query: hits + recall), not a probe artifact. The
    * exact leg is the routed leg minus the cell join (same embeds,
    * same exclusion, same tie-break), so the ONLY difference under
    * measure is nProbe/[[RagCells]] routing. */
  val RecallK = 5
  private[graft] def semRecallOf(chunks: DataFrame, dense: DataFrame,
      centers: Array[Array[Double]], queryMod: Long = 100): DataFrame = {
    val (_, _, _, qvec) = queryCtx(chunks, queryMod)
    val served = topkCut(semScored(dense, centers, qvec),
      "cos_sim", RecallK, "rank")
    val exact = topkCut(
      dense.crossJoin(broadcast(qvec))
        .filter(col("doc_id") =!= col("q_id"))
        .select(col("q_id"),
          roundTo(graft.functions.cosine_sim(col("embedding"), col("q_emb")), 6)
            .as("cos_sim"),
          chunkKey.as("key")),
      "cos_sim", RecallK, "rank")
    served.join(exact.select(col("q_id"), col("key"), lit(1).as("hit")),
        Seq("q_id", "key"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
      .select(col("q_id"), col("n_hits"),
        (col("n_hits").cast("double") / RecallK).as("recall"))
      .orderBy("q_id")
  }

  def ragSemRecall(s: SparkSession, dir: String): DataFrame =
    semRecallOf(chunksMemo(s, dir), denseMemo(s, dir), centersMemo(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rag_pipeline" -> ((s, dir) => ragServe(s, dir)),
    "q_rag_sem_recall" -> ((s, dir) => ragSemRecall(s, dir)))

  // ----------------------------------------------------------------
  // DuckDB oracle: the WHOLE chain replayed — chunking, per-chunk
  // hashed tf-idf, densify, k-means fit (seeds + one decimal-exact
  // mean update), index assignment, query embed, routing, routed
  // cosine, chunk BM25, RRF fusion.
  // ----------------------------------------------------------------

  private def rrfLegSql(r: String) = roundToSql(
    s"CASE WHEN $r IS NULL THEN 0.0 ELSE 1.0 / (${Retrieval.RrfC} + " +
      s"CAST($r AS DOUBLE)) END", 9)

  /** One Lloyd assignment of the dense chunk frame `src` against the
    * centroid table `$cs(cell, c)` — squared-L2 sequential fold, ties
    * to the lowest cell (the nearest_centroid contract). */
  private def ragAssignSql(cs: String): String =
    s"""SELECT doc_id, chunk_idx, emb, cell FROM (
       |    SELECT e.doc_id, e.chunk_idx, e.emb, c.cell,
       |      row_number() OVER (PARTITION BY e.doc_id, e.chunk_idx
       |        ORDER BY ${distSqSql("e.emb", "c.c")} ASC, c.cell ASC) AS rn
       |    FROM cvnz e CROSS JOIN $cs c) WHERE rn = 1""".stripMargin

  /** The chain's shared CTE spine — chunking through the ROUTED
    * cosine stream `sc(q_id, doc_id, chunk_idx, cos_sim)`, with the
    * fitted centroids in `c1`, the assigned index in `af`, the dense
    * nonzero chunk corpus in `cvnz`, and the nonzero query vectors in
    * `qvnz`. Shared by the q_rag_pipeline and q_rag_sem_recall
    * oracles (one spelling). */
  private def ragCoreCtes: String = {
    val idfSql = roundToSql(
      "tf * ln((s.n_chunks + 1.0) / (df + 1.0))", 6)
    val dimSumSql = roundToSql(
      "CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE)", 4)
    s"""d AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
       |ck AS (
       |  SELECT doc_id, CAST(start // $ChunkStride AS INTEGER) AS chunk_idx,
       |    toks[start + 1 : start + $ChunkSize] AS ctoks
       |  FROM (SELECT doc_id, toks,
       |      unnest(range(0, GREATEST(len(toks), 1), $ChunkStride)) AS start
       |    FROM d)),
       |stats AS (SELECT count(*) AS n_chunks,
       |    CAST(SUM(len(ctoks)) AS DOUBLE) / count(*) AS avgdl FROM ck),
       |ex AS (SELECT doc_id, chunk_idx, len(ctoks) AS dl,
       |       unnest(ctoks) AS token FROM ck),
       |htf AS (SELECT doc_id, chunk_idx, token, count(*) AS tf FROM ex
       |        WHERE token != '' GROUP BY 1, 2, 3),
       |hdf AS (SELECT token, count(*) AS df FROM htf GROUP BY 1),
       |hw AS (SELECT htf.doc_id, htf.chunk_idx,
       |    ${hash60Sql("token")} % 64 AS dim, $idfSql AS w
       |  FROM htf JOIN hdf USING (token) CROSS JOIN stats s),
       |hvec AS (SELECT doc_id, chunk_idx, dim, $dimSumSql AS val
       |         FROM hw GROUP BY 1, 2, 3),
       |dims64 AS (SELECT unnest(range(0, 64)) AS dim),
       |dims65 AS (SELECT unnest(range(1, 65)) AS i),
       |cvec AS (
       |  SELECT doc_id, chunk_idx, array_agg(x ORDER BY dim) AS emb FROM (
       |    SELECT k.doc_id, k.chunk_idx, dm.dim,
       |      CAST(COALESCE(v.val, 0.0) AS REAL) AS x
       |    FROM (SELECT DISTINCT doc_id, chunk_idx FROM hvec) k
       |    CROSS JOIN dims64 dm
       |    LEFT JOIN hvec v ON v.doc_id = k.doc_id
       |      AND v.chunk_idx = k.chunk_idx AND v.dim = dm.dim)
       |  GROUP BY 1, 2),
       |cvnz AS (SELECT * FROM cvec WHERE ${dotSql("emb", "emb")} > 0),
       |seeds AS (
       |  SELECT row_number() OVER (ORDER BY doc_id, chunk_idx) - 1 AS cell,
       |    list_transform(emb, v -> CAST(v AS DOUBLE)) AS c
       |  FROM (SELECT * FROM cvnz ORDER BY doc_id, chunk_idx LIMIT $RagCells)),
       |a1 AS (${ragAssignSql("seeds")}),
       |m1d AS (SELECT cell, i AS dim,
       |    CAST(SUM(CAST(CAST(emb[i] AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE)
       |      / count(*) AS cd
       |  FROM a1, dims65 GROUP BY cell, i),
       |m1 AS (SELECT cell, array_agg(cd ORDER BY dim) AS c FROM m1d
       |       GROUP BY cell),
       |c1 AS (SELECT s.cell, COALESCE(m.c, s.c) AS c
       |       FROM seeds s LEFT JOIN m1 m USING (cell)),
       |af AS (${ragAssignSql("c1")}),
       |qf AS (
       |  SELECT doc_id AS q_id,
       |    unnest([ctoks[1], ctoks[5], ctoks[9]]) AS token
       |  FROM ck WHERE chunk_idx = 0 AND doc_id % 100 = 0
       |    AND len(ctoks) >= 9),
       |qw AS (SELECT q.q_id, ${hash60Sql("token")} % 64 AS dim, $idfSql AS w
       |  FROM (SELECT q_id, token, count(*) AS tf FROM qf GROUP BY 1, 2) q
       |  JOIN hdf USING (token) CROSS JOIN stats s),
       |qvec AS (SELECT q_id, dim, $dimSumSql AS val FROM qw GROUP BY 1, 2),
       |qv AS (
       |  SELECT q_id, array_agg(x ORDER BY dim) AS q_emb FROM (
       |    SELECT k.q_id, dm.dim, CAST(COALESCE(v.val, 0.0) AS REAL) AS x
       |    FROM (SELECT DISTINCT q_id FROM qvec) k CROSS JOIN dims64 dm
       |    LEFT JOIN qvec v ON v.q_id = k.q_id AND v.dim = dm.dim)
       |  GROUP BY 1),
       |qvnz AS (SELECT * FROM qv WHERE ${dotSql("q_emb", "q_emb")} > 0),
       |routed AS (SELECT q_id, cell FROM (
       |    SELECT q.q_id, c.cell,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${distSqSql("q.q_emb", "c.c")} ASC, c.cell ASC) AS rn
       |    FROM qvnz q CROSS JOIN c1 c) WHERE rn <= $RagProbe),
       |sc AS (
       |  SELECT q.q_id, e.doc_id, e.chunk_idx,
       |    ${roundToSql(cosineSql("e.emb", "q.q_emb"), 6)} AS cos_sim
       |  FROM af e JOIN routed r ON e.cell = r.cell
       |  JOIN qvnz q ON q.q_id = r.q_id
       |  WHERE e.doc_id <> q.q_id)""".stripMargin
  }

  private def ragOracleSql: String = {
    s"""WITH $ragCoreCtes,
       |semr AS (
       |  SELECT q_id, doc_id, chunk_idx,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos_sim DESC, doc_id ASC, chunk_idx ASC) AS r_sem
       |  FROM sc),
       |fx AS (SELECT * FROM ex WHERE token IN (SELECT token FROM qf)),
       |ltf AS (SELECT doc_id, chunk_idx, token, count(*) AS tf, max(dl) AS dl
       |        FROM fx GROUP BY 1, 2, 3),
       |ldf AS (SELECT token, count(*) AS df FROM ltf GROUP BY 1),
       |contrib AS (
       |  SELECT q.q_id, ltf.doc_id, ltf.chunk_idx,
       |    ${Retrieval.bmContribSql("ltf.tf", "ldf.df", "ltf.dl",
             "s.n_chunks", "s.avgdl")} AS c
       |  FROM ltf JOIN ldf USING (token) JOIN qf q USING (token)
       |  CROSS JOIN stats s
       |  WHERE ltf.doc_id <> q.q_id),
       |lsc AS (
       |  SELECT q_id, doc_id, chunk_idx, ${roundToSql(
           "CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE)", 4)} AS score
       |  FROM contrib GROUP BY 1, 2, 3),
       |lexr AS (
       |  SELECT q_id, doc_id, chunk_idx,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY score DESC, doc_id ASC, chunk_idx ASC) AS r_lex
       |  FROM lsc),
       |fused AS (
       |  SELECT COALESCE(l.q_id, r.q_id) AS q_id,
       |    COALESCE(l.doc_id, r.doc_id) AS doc_id,
       |    COALESCE(l.chunk_idx, r.chunk_idx) AS chunk_idx,
       |    l.r_lex, r.r_sem
       |  FROM (SELECT * FROM lexr WHERE r_lex <= $RagK) l
       |  FULL JOIN (SELECT * FROM semr WHERE r_sem <= $RagK) r
       |    ON l.q_id = r.q_id AND l.doc_id = r.doc_id
       |      AND l.chunk_idx = r.chunk_idx),
       |frk AS (
       |  SELECT q_id, doc_id, chunk_idx,
       |    CAST(r_lex AS BIGINT) AS r_lex, CAST(r_sem AS BIGINT) AS r_sem,
       |    ${roundToSql(rrfLegSql("r_lex") + " + " + rrfLegSql("r_sem"), 9)}
       |      AS rrf,
       |    row_number() OVER (PARTITION BY q_id ORDER BY
       |      ${roundToSql(rrfLegSql("r_lex") + " + " + rrfLegSql("r_sem"), 9)}
       |        DESC, doc_id ASC, chunk_idx ASC) AS rank
       |  FROM fused)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id, chunk_idx,
       |  rrf, r_lex, r_sem
       |FROM frk WHERE rank <= $RagFinal ORDER BY q_id, rank""".stripMargin
  }

  // routed top-RecallK vs unrouted exact top-RecallK, hits per query
  // — the q_ann_recall tail over the shared chain spine
  private def ragSemRecallOracleSql: String =
    s"""WITH $ragCoreCtes,
       |smr AS (
       |  SELECT q_id, doc_id, chunk_idx,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos_sim DESC, doc_id ASC, chunk_idx ASC) AS rank
       |  FROM sc),
       |sce AS (
       |  SELECT q.q_id, e.doc_id, e.chunk_idx,
       |    ${roundToSql(cosineSql("e.emb", "q.q_emb"), 6)} AS cos_sim
       |  FROM cvnz e CROSS JOIN qvnz q
       |  WHERE e.doc_id <> q.q_id),
       |exr AS (
       |  SELECT q_id, doc_id, chunk_idx,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos_sim DESC, doc_id ASC, chunk_idx ASC) AS rank
       |  FROM sce)
       |SELECT s.q_id, CAST(COUNT(x.doc_id) AS BIGINT) AS n_hits,
       |  CAST(COUNT(x.doc_id) AS DOUBLE) / $RecallK AS recall
       |FROM (SELECT q_id, doc_id, chunk_idx FROM smr WHERE rank <= $RecallK) s
       |LEFT JOIN (SELECT q_id, doc_id, chunk_idx FROM exr
       |           WHERE rank <= $RecallK) x
       |  ON s.q_id = x.q_id AND s.doc_id = x.doc_id
       |    AND s.chunk_idx = x.chunk_idx
       |GROUP BY s.q_id ORDER BY s.q_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_rag_pipeline" -> ragOracleSql,
    "q_rag_sem_recall" -> ragSemRecallOracleSql)
}
