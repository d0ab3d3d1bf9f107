package graft

import org.apache.spark.sql.functions._

/** The one-call facade must equal its declared-query constituents and
  * hold the arc's invariants end-to-end (CI smoke of the README
  * walkthrough). */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("facade equals the declared corpus-pipeline queries") {
    val res = CorpusPipeline.run(spark, dir)
    val wantSel = SparkEntry.queries("q_corpus_pipeline")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(res.selected.select($"doc_id").as[Long].collect().toSet == wantSel)
    // split agrees with q_leakage_split on the selected ids
    val wantSplit = SparkEntry.queries("q_leakage_split")(spark, dir)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    res.split.select($"doc_id", $"split").as[(Long, String)].collect()
      .foreach { case (d, s) => assert(wantSplit(d) == s) }
    assert(res.semanticDropped == 0L)
  }

  test("arc invariants: splits cover the selection, packing is gap-free") {
    val res = CorpusPipeline.run(spark, dir)
    val nSel = res.selected.count()
    assert(res.split.count() == nSel)
    assert(res.packed.count() == nSel)
    // packing offsets tile without gaps in doc_id order
    val offs = res.packed.orderBy($"doc_id")
      .select($"start_tok", $"end_tok").as[(Long, Long)].collect()
    offs.sliding(2).foreach {
      case Array(a, b) => assert(b._1 == a._2, s"packing gap: $a -> $b")
      case _ => ()
    }
  }

  test("decon pair join: bloom-semi-reduced shuffle arm is pair-identical to broadcast") {
    // the past-cap arm (r16, from the 100×/10M-doc probe step): cap=0
    // forces the bloom + shuffle join; results must equal the
    // broadcast arm bit-for-bit — bloom false positives are discarded
    // by the exact equi-join, and the df cap is identical on both arms
    val docs = graft.io.Tables.documents(spark, dir)
    // the q_decontaminate feeder verbatim (DISTINCT hashes per doc —
    // the ngram_hash_explode contract deconPairCounts requires)
    val ex = docs.withColumn("toks", graft.ops.TextOps.tokens($"text"))
      .select($"doc_id", graft.functions.ngram_hash_explode($"toks").as("h"))
    def rows(cap: Long) =
      graft.ops.TextOps.deconPairCounts(ex, docs, broadcastRowCap = cap)
        .orderBy("doc_id", "eval_id")
        .as[(Long, Long, Long)].collect().toSeq
    val viaBroadcast = rows(Long.MaxValue)
    val viaBloom = rows(0L)
    assert(viaBroadcast.nonEmpty, "fixture produced no decon pairs")
    assert(viaBloom == viaBroadcast,
      s"arms disagree: bloom=${viaBloom.take(5)} bcast=${viaBroadcast.take(5)}")
  }

  test("semantic decon flags the PARAPHRASE the shingle gate misses") {
    // contaminated doc = an eval doc's tokens REVERSED: shares ~no
    // 3-gram shingles (the shingle decon gate passes it) but keeps
    // the token distribution, so its hashed-tf-idf embedding is the
    // eval doc's exactly — the paraphrase-contamination case
    // VERDICT r14 #5 names. Eval convention: doc_id % 97 == 0.
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (97L, evalText),                                   // eval doc
      (5L, evalText.split(" ").reverse.mkString(" ")),   // paraphrase
      (6L, "totally different words in this document"),
      (7L, "yet another unrelated piece of text here")).toDF("doc_id", "text")
    val flagged = CorpusPipeline.semanticContaminatedIds(
      CorpusPipeline.denseHashEmbeddings(docs),
      tau = 0.999, kCells = 2).as[Long].collect().toSet
    assert(flagged == Set(5L), s"got $flagged")
    // …and the shingle evidence really is absent: reversed 10-token
    // text shares zero 3-gram shingles with the original
    val sh = docs.select($"doc_id",
      graft.functions.ngram_hash_explode(
        graft.ops.TextOps.tokens($"text")).as("h"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert((sh(97L) intersect sh(5L)).isEmpty)
  }

  test("deconTau flag composes into the facade and drops only flagged docs") {
    val res0 = CorpusPipeline.run(spark, dir)
    val res = CorpusPipeline.run(spark, dir, deconTau = Some(0.999))
    val sel0 = res0.selected.select($"doc_id").as[Long].collect().toSet
    val sel = res.selected.select($"doc_id").as[Long].collect().toSet
    assert(sel.subsetOf(sel0))
    assert(res.deconDropped == (sel0.size - sel.size).toLong)
    // the flagged set is exactly the facade's own contaminated ids
    val flagged = CorpusPipeline.semanticContaminatedIds(
      CorpusPipeline.denseHashEmbeddings(
        graft.io.Tables.documents(spark, dir)), 0.999)
      .as[Long].collect().toSet
    assert(sel0 -- sel == (sel0 intersect flagged), s"drop mismatch")
    // arc invariants hold under the flag
    assert(res.split.count() == res.selected.count())
    assert(res.packed.count() == res.selected.count())
  }

  test("semantic stage drops the planted hash-embedding duplicate") {
    // a doc whose text duplicates another's gets the IDENTICAL hashed
    // embedding — the exact-dup case the semantic stage must collapse
    val kept = CorpusPipeline.semanticKeptIds(
      CorpusPipeline.denseHashEmbeddings(
        Seq((1L, "alpha beta gamma delta"),
          (2L, "alpha beta gamma delta"),
          (3L, "totally different words here")).toDF("doc_id", "text")),
      tau = 0.999, kCells = 2)
      .as[Long].collect().toSet
    assert(kept == Set(1L, 3L), s"got $kept")
  }
}
