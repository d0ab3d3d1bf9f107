package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the r19 optimization that moved the candidate-id restriction
  * below the hashed-embedding aggregate: [[Retrieval.hashEmbedSkinnyFor]]
  * must produce EXACTLY the rows of the late-restricted spelling
  * `hashEmbedSkinny(docs).join(ids)` — df and n_docs from the FULL
  * corpus, vectors only for the id set. A drift here would silently
  * skew every MMR pairwise cosine and the mmrBatch shared embedding
  * space. */
class HashEmbedRestrictSpec extends SparkSpec {
  import spark.implicits._

  test("hashEmbedSkinnyFor == hashEmbedSkinny ⋈ ids (df from full corpus)") {
    val docs = Seq(
      (1L, "cat dog mouse cat"),
      (2L, "dog dog fish"),
      (3L, "mouse cat fish fish tree"),
      (4L, "tree tree tree"),
      (5L, "") // empty text: no tf rows, absent from both spellings
    ).toDF("doc_id", "text")
    val ids = Seq(1L, 3L, 5L).toDF("doc_id")

    val late = Retrieval.hashEmbedSkinny(docs)
      .join(broadcast(ids), Seq("doc_id"))
    val early = Retrieval.hashEmbedSkinnyFor(docs, broadcast(ids))

    val l = late.orderBy("doc_id", "dim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val e = early.orderBy("doc_id", "dim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(l.nonEmpty, "fixture must produce vectors")
    assert(e === l)

    // the restriction must not leak: only requested ids appear
    assert(e.map(_._1).toSet.subsetOf(Set(1L, 3L)))
  }

  test("df restriction-independence: values match the unrestricted vectors") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "beta gamma"),
      (3L, "alpha gamma gamma")
    ).toDF("doc_id", "text")
    val ids = Seq(2L).toDF("doc_id")
    val full = Retrieval.hashEmbedSkinny(docs)
      .filter(col("doc_id") === 2L)
      .orderBy("dim").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val early = Retrieval.hashEmbedSkinnyFor(docs, broadcast(ids))
      .orderBy("dim").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(early === full)
  }
}
