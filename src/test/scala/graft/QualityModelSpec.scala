package graft

import org.apache.spark.sql.functions._
import graft.ops.QualityModel

/** Trained quality model: GD arithmetic equivalence against a pure
  * in-memory replica, convergence against the heuristic label, and the
  * infer projection's internal consistency. */
class QualityModelSpec extends SparkSpec {

  private def round8(x: Double): Double = math.floor(x * 1e8 + 0.5) / 1e8
  private def round9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("fitWeights equals a pure in-memory GD replica bit-for-bit") {
    val dir = sf("sf0.001")
    val feats = QualityModel.fitFeatures(graft.io.Tables.documents(spark, dir))
      .collect()
      .map(r => (Array(1.0, r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)), r.getDouble(6)))
    val n = feats.length.toDouble
    val w = Array.fill(6)(0.0)
    val expected = (1 to QualityModel.Iters).map { _ =>
      val g = Array.fill(6)(BigDecimal(0))
      feats.foreach { case (x, y) =>
        var z = w(0)
        var j = 1
        while (j < 6) { z += w(j) * x(j); j += 1 }
        val u = round9(0.5 * (1.0 + z / (1.0 + math.abs(z))))
        val e = u - y
        j = 0
        while (j < 6) {
          // decimal(28,9) sum of the 9-rounded per-row terms — the
          // exact order-free aggregation of the operator
          g(j) = g(j) + BigDecimal(round9(e * x(j)))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
          j += 1
        }
      }
      var j = 0
      while (j < 6) {
        w(j) = round8(w(j) - QualityModel.Lr * (g(j).toDouble / n))
        j += 1
      }
      w.clone()
    }
    val got = QualityModel.fitWeights(spark, dir)
    assert(got.size === QualityModel.Iters)
    got.zip(expected).zipWithIndex.foreach { case ((gw, ew), i) =>
      assert(gw.toSeq === ew.toSeq, s"iteration ${i + 1}")
    }
  }

  test("training converges: final accuracy beats the majority class") {
    val dir = sf("sf0.001")
    val inf = QualityModel.infer(spark, dir)
      .select(col("pred"), col("label")).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val n = inf.length.toDouble
    val acc = inf.count { case (p, l) => p == l } / n
    val majority = math.max(inf.count(_._2 == 1), inf.count(_._2 == 0)) / n
    assert(acc > majority, s"acc=$acc majority=$majority")
    assert(acc >= 0.80, s"acc=$acc")
  }

  test("infer is internally consistent: score bounds, threshold, label gate") {
    val dir = sf("sf0.001")
    val rows = QualityModel.infer(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getDouble(1)
      assert(score >= 0.0 && score <= 1.0)
      assert(r.getInt(2) === (if (score >= 0.5) 1 else 0))
      assert(Set(0, 1).contains(r.getInt(3)))
    }
    // labels match the scoredDocs keep gate exactly
    val labels = rows.map(r => r.getLong(0) -> r.getInt(3)).toMap
    val gate = graft.ops.TextOps
      .scoredDocs(graft.io.Tables.documents(spark, dir), withDigest = false)
      .select(col("doc_id"),
        (col("quality_score") >= 0.3 && col("marker_hits") > 0).cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(labels === gate)
  }

  test("streaming scoring with frozen weights equals the batch answer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = sf("sf0.001")
    val w = QualityModel.fitWeights(spark, dir).last
    val batch = QualityModel.infer(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2), r.getInt(3))))
      .toMap
    val rows = graft.io.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val input = MemoryStream[(Long, String, Long)]
    val scored = QualityModel.scoreWith(
      input.toDF().toDF("doc_id", "text", "n_chars"), w)
    val q = scored.writeStream.format("memory")
      .queryName("qm_out").outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a.toSeq)
      q.processAllAvailable()
      input.addData(b.toSeq)
      q.processAllAvailable()
      val got = spark.table("qm_out").collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2), r.getInt(3))))
        .toMap
      assert(got === batch,
        "stream-scored documents diverged from batch inference")
    } finally q.stop()
  }

  test("weights are 8-decimal quantized and x-degenerate features stay zero") {
    val dir = sf("sf0.001")
    val traj = QualityModel.fitWeights(spark, dir)
    traj.foreach(ws => ws.foreach(w => assert(w === round8(w))))
    // a feature that is identically zero over the corpus must never
    // move its weight (gradient is exactly zero by construction)
    val feats = QualityModel.fitFeatures(graft.io.Tables.documents(spark, dir))
    val sums = feats.agg(sum(abs(col("x3")))).collect()(0)
    if (sums.getDouble(0) == 0.0) traj.foreach(ws => assert(ws(3) === 0.0))
  }
}
