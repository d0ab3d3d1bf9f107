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
