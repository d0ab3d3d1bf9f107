package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING embedding-cosine near-duplicate rejection — the vector
  * twin of [[StreamingDedup]] (and the ingestion-time form of
  * q_embedding_neardup_lsh): an embedding stream is checked against
  * every vector that already ARRIVED in its sign-LSH bucket, so a
  * vector store stays near-dup-free as it grows instead of being
  * re-deduplicated per batch job.
  *
  * Shape (identical constants to the batch candidate rule, so the two
  * are provably equivalent — VectorStreamSpec asserts it):
  *
  *   vector stream → codegen'd [[graft.functions.SignLshBucket]]
  *     (map-side; the only shuffle is the bucket key — exactly the
  *     batch LSH join key)
  *     → `flatMapGroupsWithState` keyed by bucket: state holds the
  *       vectors previously arrived in that bucket; a new vector is
  *       verified by EXACT cosine against bucket members — the same
  *       candidate-then-verify rule as the batch bucket-collision join
  *     → one verdict per vector, in its arrival micro-batch.
  *
  * Recall contract is the batch path's: candidates come from exact-
  * bucket collisions (a near-dup split across buckets by an unlucky
  * plane is missed by BOTH paths identically — multiprobe widens both
  * the same way). State is per-bucket vectors capped at
  * `maxPerBucket` (evicting oldest, flagged on the verdict, like
  * [[StreamingDedup]]); run on the RocksDB store for large corpora.
  * No watermark: dedup state is corpus knowledge and never expires.
  *
  * Cluster maintenance: [[StreamingDedup.updateClusterStore]] is
  * verdict-shaped, not text-shaped — rename `vec_id`→`doc_id` on
  * [[VVerdict]] rows and the same incremental (id → cluster_rep)
  * store machinery maintains embedding near-dup clusters.
  */
object StreamingVectorDedup {

  /** Sequential-fold cosine over plain arrays — the same op order as
    * [[graft.functions.CosineSimUtil.cosine]], so stream verdicts use
    * bit-identical similarity values to the batch verifier. */
  private[graft] def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  case class VMember(id: Long, emb: Array[Float])
  case class VBucketState(members: List[VMember])

  /** Verdict for one vector: `dup_of` = smallest earlier same-bucket
    * vector whose exact cosine clears the threshold; `matches` = every
    * clearing member (the edge set a cluster maintainer needs);
    * `capped` marks best-effort verdicts after a hot-bucket
    * eviction. */
  case class VVerdict(vec_id: Long, dup_of: Option[Long],
      matches: Seq[Long], capped: Boolean = false)

  /** Streaming verdicts for a (vec_id, embedding) stream. Vectors
    * inside one micro-batch are processed in vec_id order, so the
    * arrived-before relation is the batch rule's `id_a < id_b`.
    * Ragged vectors (NULL bucket) are dropped — they cannot be scored
    * against well-formed members. */
  def nearDupVerdicts(vectors: DataFrame, planes: Array[Array[Double]],
      threshold: Double = 0.9, maxPerBucket: Int = 4096): Dataset[VVerdict] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bucketed = vectors.select(
        graft.functions.sign_lsh_bucket(col("embedding"), planes).as("bucket"),
        col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .filter(col("bucket").isNotNull)
      .as[(Long, Long, Array[Float])]
    bucketed
      .groupByKey(_._1)
      .flatMapGroupsWithState[VBucketState, VVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[VBucketState]) =>
          var members = state.getOption.map(_.members).getOrElse(Nil)
          val out = rows.toSeq.sortBy(_._2).map { case (_, id, emb) =>
            val hits = members.filter(m => cosine(m.emb, emb) >= threshold)
              .map(_.id)
            val atCap = members.lengthCompare(maxPerBucket) >= 0
            members = (VMember(id, emb) :: members).take(maxPerBucket)
            VVerdict(id, if (hits.isEmpty) None else Some(hits.min), hits, atCap)
          }
          state.update(VBucketState(members))
          out.iterator
      }
  }
}
