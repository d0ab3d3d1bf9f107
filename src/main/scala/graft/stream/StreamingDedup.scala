package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.TextOps

/** STREAMING near-duplicate rejection — the ingestion-time twin of the
  * batch MinHash+LSH dedup (q_minhash_dedup / q_dedup_clusters): a
  * document stream is checked against everything already admitted, so
  * a training corpus stays near-dup-free as it grows instead of being
  * re-deduplicated from scratch per batch job.
  *
  * Shape (identical constants to the batch path, so the two are
  * provably equivalent — StreamingSpec asserts it):
  *
  *   doc stream → minhash signature (map-side, [[TextOps.minhashSignatures]])
  *     → explode to LSH band buckets ([[TextOps.bandedBuckets]])
  *     → `flatMapGroupsWithState` keyed by (band_id, band_key): state
  *       holds the signatures previously admitted to that bucket; a new
  *       doc is verified (exact jaccard on the shingle-hash sets)
  *       against bucket members — the same candidate-then-verify rule
  *       as the batch pair generator
  *     → per-band verdicts, resolved per doc downstream (a doc's 4
  *       band verdicts all surface in the micro-batch it arrives in)
  *
  * Scale notes: the only shuffle is the band-bucket key — exactly the
  * batch LSH join key. State is per-bucket signature lists, capped at
  * `maxPerBucket` (buckets this hot are stopword-degenerate shingles;
  * the batch path's df-cap drops them too); run on the RocksDB state
  * store ([[EngagementPipeline.useRocksDBStateStore]]) so state size
  * is a disk problem, not a heap problem. No watermark: dedup state is
  * corpus knowledge, not a window — it must never expire on its own.
  */
object StreamingDedup {

  /** Streaming EXACT dedup by normalized-text digest: emits only the
    * first-arriving copy of each distinct normalized text (the
    * streaming form of q_dedup_exact's keeper rule, ordered by arrival
    * instead of doc_id). Digest state is corpus knowledge and never
    * expires on its own — pair with
    * [[EngagementPipeline.useRocksDBStateStore]] for large corpora, or
    * switch to `dropDuplicatesWithinWatermark` when the upstream
    * guarantees bounded redelivery. */
  def exactDedup(docs: DataFrame): DataFrame = {
    import graft.ops.TextOps
    // drop the internal digest: callers get their input schema back
    docs.withColumn("h", md5(TextOps.normText(col("text"))))
      .dropDuplicates("h")
      .drop("h")
  }

  /** One admitted bucket member: doc id + its shingle-hash set. */
  case class Member(id: Long, hsh: Array[Long])
  case class BucketState(members: List[Member])

  /** Verdict of ONE band bucket for one document. `dup_of` is the
    * smallest earlier bucket member whose verified jaccard clears the
    * threshold (None = no near-dup in this bucket). */
  case class BandVerdict(doc_id: Long, band_id: Int, dup_of: Option[Long])

  /** Exact jaccard between two shingle-hash arrays — the same
    * set-intersection over raw-length denominator the batch verifier
    * computes (`array_intersect` semantics). */
  private[stream] def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    val sa = a.toSet
    var inter = 0
    var i = 0
    val seen = scala.collection.mutable.HashSet.empty[Long]
    while (i < b.length) {
      val v = b(i)
      if (sa.contains(v) && seen.add(v)) inter += 1
      i += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  /** Per-band streaming verdicts for a (doc_id, text) document stream.
    * Docs inside one micro-batch are processed in doc_id order, so the
    * admitted-before relation is the batch path's `id_a < id_b`. */
  def nearDupVerdicts(docs: DataFrame, threshold: Double = 0.5,
      maxPerBucket: Int = 1024): Dataset[BandVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = TextOps.bandedBuckets(TextOps.minhashSignatures(docs))
      .select(col("band_id").cast("int").as("band_id"), col("band_key"),
        col("doc_id").cast("long").as("doc_id"), col("hsh"))
      .as[(Int, String, Long, Array[Long])]
    banded
      .groupByKey { case (bandId, bandKey, _, _) => (bandId, bandKey) }
      .flatMapGroupsWithState[BucketState, BandVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((bandId, _), rows, state: GroupState[BucketState]) =>
          var members = state.getOption.map(_.members).getOrElse(Nil)
          val out = rows.toSeq.sortBy(_._3).map { case (_, _, docId, hsh) =>
            val dup = members.iterator
              .filter(m => jaccard(m.hsh, hsh) >= threshold)
              .map(_.id).foldLeft(Option.empty[Long]) {
                case (None, id) => Some(id)
                case (Some(m), id) => Some(math.min(m, id))
              }
            // admit newest-first; the cap drops the OLDEST members of a
            // degenerate hot bucket (newer docs dedupe against newer
            // corpus state — the batch df-cap analog)
            members = (Member(docId, hsh) :: members).take(maxPerBucket)
            BandVerdict(docId, bandId, dup)
          }
          state.update(BucketState(members))
          out.iterator
      }
  }

  /** Collapse per-band verdicts into one row per document:
    * (doc_id, is_dup, dup_of = min duplicate partner across bands).
    * Batch helper for sinks/tests — all 4 verdicts for a doc surface
    * in the micro-batch the doc arrived in. */
  def resolve(verdicts: DataFrame): DataFrame =
    verdicts
      .groupBy(col("doc_id"))
      .agg(min(col("dup_of")).as("dup_of"))
      .withColumn("is_dup", col("dup_of").isNotNull)
      .select(col("doc_id"), col("is_dup"), col("dup_of"))
}
