package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Html, Ivf, Retrieval, TextOps, VectorOps}

/** ONE-CALL end-to-end training-corpus pipeline (VERDICT r11 #5):
  * the engine's curation operators are each declared and
  * oracle-checked individually; this facade composes the canonical
  * arc a pretraining-data team actually runs —
  *
  *   extract (opt-in, crawled corpora) → quality gates → dedup
  *   (exact + fuzzy via near-dup cluster keepers; semantic opt-in
  *   over model-free hashed embeddings) → decontaminate (eval-set
  *   n-gram overlap) → leakage-safe split → sequence packing
  *   [→ training shards on disk]
  *
  * — from one call, through the SESSION-MEMOIZED stages
  * ([[graft.ops.Memo]]): the documents table is scanned once for the
  * fused feature projection, ONE connected-components run serves
  * keepers and the split, and repeated calls in a session serve from
  * the memo. Every stage is the SAME definition the declared queries
  * run (q_corpus_pipeline, q_leakage_split, q_pack_sequences,
  * q_semantic_dedup, q_html_extract), so the facade inherits their
  * DuckDB-oracle evidence; CorpusPipelineSpec smoke-runs the whole
  * arc in CI and the runnable walkthrough is
  * `sbt "runMain graft.tools.CorpusPipelineDemo"` (README §Corpus
  * pipeline).
  *
  * 100 TB shape: extraction is a map-side scan materialized once;
  * the selection stages shuffle only skinny feature rows; the split
  * is a projection off the memoized cluster map; packing is the
  * two-phase prefix scan. Nothing here collects corpus-scale data to
  * the driver.
  */
object CorpusPipeline {

  /** Everything the arc produces. `selected`: gate-surviving docs
    * (doc_id, lang, n_tokens, quality_score); `split`: leakage-safe
    * train/val/test for the SELECTED docs; `packed`: fixed-context
    * packing plan over the selected docs; `semanticDropped`: docs
    * removed by the opt-in semantic-dedup stage (0 when disabled);
    * `deconDropped`: docs removed by the opt-in SEMANTIC
    * decontamination stage (0 when disabled). */
  case class CorpusResult(
      selected: DataFrame,
      split: DataFrame,
      packed: DataFrame,
      semanticDropped: Long,
      deconDropped: Long = 0L)

  /** ENTRY stage for crawled corpora: materialize markup extraction
    * ONCE as a standard documents table at `outDir` (the batch twin
    * of [[graft.stream.StreamingDedup.htmlEntry]]), then run [[run]]
    * against `outDir`. Input needs (doc_id, lang, source, `htmlCol`);
    * n_chars is derived from the extracted text. */
  def extractHtmlCorpus(spark: SparkSession, htmlDocs: DataFrame,
      outDir: String, htmlCol: String = "html"): String = {
    htmlDocs
      .withColumn("text", Html.extractText(col(htmlCol))).drop(htmlCol)
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    outDir
  }

  /** Dense 64-dim hashed tf-idf document embeddings — the model-free
    * text→vector bridge behind the semantic stage
    * ([[Retrieval.hashEmbedSkinny]] densified with a 64-slot fill):
    * identical texts get identical vectors, near-identical texts get
    * near-identical ones, no trained model required. Swap in real
    * model embeddings by passing your own (vec_id, embedding) frame
    * to [[semanticKeptIds]]. */
  def denseHashEmbeddings(docs: DataFrame): DataFrame =
    Retrieval.hashEmbedSkinny(docs)
      .groupBy(col("doc_id"))
      .agg(map_from_arrays(collect_list(col("dim")),
        collect_list(col("val"))).as("m"))
      .select(col("doc_id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => coalesce(element_at(col("m"), i.cast("long")), lit(0.0))
            .cast("float")).as("embedding"))

  /** The semantic stage's survivor set: IVF-cell-bucketed greedy
    * cosine prune ([[VectorOps.semanticDedup]] — never all-pairs) at
    * threshold `tau` over (vec_id, embedding). */
  def semanticKeptIds(embeddings: DataFrame, tau: Double,
      kCells: Int = 8): DataFrame = {
    val centers = Ivf.fit(embeddings, col("embedding"),
      Seq(col("vec_id")), k = kCells, iters = 2)
    VectorOps.semanticDedup(
        Ivf.assign(embeddings, col("embedding"), centers), tau)
      .filter(col("kept")).select(col("vec_id").as("doc_id"))
  }

  /** Contaminated-id set of the opt-in SEMANTIC decontamination
    * stage (VERDICT r14 #5): corpus docs whose [[denseHashEmbeddings]]
    * vector sits within `tau` of ANY eval doc's — the paraphrase-
    * contamination case the shingle decon inside
    * [[TextOps.corpusPipelineKeepers]] misses by construction (a
    * reworded eval answer shares almost no 3-gram shingles but keeps
    * its token distribution, hence its hashed-tf-idf neighborhood).
    * Eval set = doc_id % 97 ≡ 0, the same convention as the shingle
    * stage. Shape: [[VectorOps.semanticDecon]] — eval routes to
    * nProbe=2 IVF cells and broadcasts; the corpus side only ever
    * cell-joins (no corpus-scale broadcast — PlanSpec pins it). */
  def semanticContaminatedIds(embeddings: DataFrame, tau: Double,
      kCells: Int = 8): DataFrame = {
    val centers = Ivf.fit(embeddings, col("embedding"),
      Seq(col("vec_id")), k = kCells, iters = 2)
    val evalV = embeddings.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("eval_id"), col("embedding").as("q_emb"))
    val corpus = embeddings.filter(col("vec_id") % 97 =!= 0)
    VectorOps.semanticDecon(Ivf.assign(corpus, col("embedding"), centers),
        evalV, centers, nProbe = 2, tau = tau)
      .select(col("vec_id").as("doc_id")).distinct()
  }

  /** Run the full arc over the documents table at `dir`.
    *
    * @param semanticTau opt-in semantic dedup threshold (e.g. 0.999)
    *                    over [[denseHashEmbeddings]]; None disables
    * @param shardsOut   when set, also materialize chunked training
    *                    shards there ([[TextOps.writeTrainingShards]])
    * @param loopGate    opt-in generation-loop filter
    *                    ([[TextOps.loopStats]] — drops documents whose
    *                    window multiplicity flags model-loop
    *                    degeneracy; the synthetic-data-era gate)
    * @param deconTau    opt-in SEMANTIC decontamination threshold
    *                    (e.g. 0.999) — drops selected docs within τ
    *                    of any eval doc in [[denseHashEmbeddings]]
    *                    space ([[semanticContaminatedIds]]); None
    *                    disables
    */
  def run(spark: SparkSession, dir: String,
      semanticTau: Option[Double] = None,
      shardsOut: Option[String] = None,
      loopGate: Boolean = false,
      deconTau: Option[Double] = None): CorpusResult = {
    val docs = Tables.documents(spark, dir)
    val selected1 = TextOps.corpusPipelineKeepers(spark, dir)
    val selected0 =
      if (!loopGate) selected1
      else selected1.join(
        TextOps.loopStats(docs).filter(col("loop_flag")).select("doc_id"),
        Seq("doc_id"), "left_anti")
    // both embedding-space stages share one embedding derivation
    lazy val emb = denseHashEmbeddings(docs)
    val (selectedS, dropped) = semanticTau match {
      case None => (selected0, 0L)
      case Some(tau) =>
        val kept = semanticKeptIds(emb, tau)
        val s2 = selected0.join(kept, Seq("doc_id"), "left_semi")
        (s2, selected0.count() - s2.count())
    }
    val (selected, deconDropped) = deconTau match {
      case None => (selectedS, 0L)
      case Some(tau) =>
        val flagged = semanticContaminatedIds(emb, tau)
        val s2 = selectedS.join(flagged, Seq("doc_id"), "left_anti")
        (s2, selectedS.count() - s2.count())
    }
    val ids = selected.select("doc_id")
    val split = TextOps.leakageSplit(spark, dir)
      .join(ids, Seq("doc_id"), "left_semi")
    val packed = TextOps.packSequences(
      docs.join(ids, Seq("doc_id"), "left_semi"), TextOps.PackContext)
    shardsOut.foreach(out => TextOps.writeTrainingShards(docs, ids, out))
    CorpusResult(selected, split, packed, dropped, deconDropped)
  }
}
