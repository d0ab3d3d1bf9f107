package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.VectorOps
import graft.stream.StreamingVectorDedup

/** Streaming embedding near-dup rejection == the batch bucket-collision
  * rule, across micro-batch boundaries. */
class VectorStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val Planes = (0 until 8).map(VectorOps.hyperplane(_, 64)).toArray
  private val Threshold = 0.9

  private def driverBucket(emb: Array[Float]): Long = {
    var b = 0L; var j = 0
    while (j < Planes.length) {
      val p = Planes(j); var d = 0.0; var i = 0
      while (i < p.length) { d += emb(i).toDouble * p(i); i += 1 }
      if (d > 0) b |= 1L << j
      j += 1
    }
    b
  }

  test("streaming verdicts equal the batch arrived-before bucket-collision rule") {
    // clustered corpus with REAL near-dups (within-cluster cos ≈ 0.94)
    val vecs = tools.VectorGenerator.corpus(spark, 300, nClusters = 30)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)

    // driver-side truth: hits = earlier ids in the SAME bucket with
    // exact cosine >= threshold (the batch q_embedding_neardup_lsh
    // candidate rule + verification)
    val buckets = vecs.map { case (id, e) => id -> driverBucket(e) }.toMap
    val truth = vecs.map { case (id, e) =>
      val hits = vecs.filter { case (j, ej) =>
        j < id && buckets(j) == buckets(id) &&
          StreamingVectorDedup.cosine(ej, e) >= Threshold
      }.map(_._1)
      id -> (if (hits.isEmpty) None else Some(hits.min), hits.toSet)
    }.toMap
    assert(truth.values.exists(_._1.nonEmpty),
      "fixture degenerate: no near-dups planted — tighten noise or threshold")

    val input = MemoryStream[(Long, Seq[Float])]
    val verdicts = StreamingVectorDedup.nearDupVerdicts(
      input.toDF().toDF("vec_id", "raw")
        .select($"vec_id", $"raw".cast("array<float>").as("embedding")),
      Planes, threshold = Threshold)
    val q = verdicts.writeStream.format("memory")
      .queryName("vdd_out").outputMode("append").start()
    try {
      val (first, second) = vecs.map { case (id, e) => (id, e.toSeq) }.splitAt(150)
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
      val got = spark.table("vdd_out")
        .select($"vec_id", $"dup_of", $"matches").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getSeq[Long](2).toSet)).toMap
      assert(got.size === vecs.length)
      vecs.foreach { case (id, _) =>
        assert(got(id) === truth(id),
          s"vec $id: stream ${got(id)} != batch-truth ${truth(id)}")
      }
      // cross-boundary coverage: at least one second-half vector must
      // match a FIRST-half partner (state survived the batch boundary)
      val crossBoundary = vecs.drop(150).exists { case (id, _) =>
        truth(id)._2.exists(_ < 150) && got(id)._2.exists(_ < 150)
      }
      assert(crossBoundary, "no cross-micro-batch match exercised state carry-over")
    } finally q.stop()
  }
}
