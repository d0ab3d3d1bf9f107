package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the IVF-PQ companion of [[Ivf]] and
  * the 32× memory lever for vector serving: each vector is split into
  * `m` subspaces, each subspace k-means-quantized to a `k`-entry
  * codebook, and stored as `m` small codes (m=8, k=16 → 8 codes ≈
  * 8 B/vector vs 256 B of raw float32).
  *
  * Query-time scoring is ASYMMETRIC distance computation (ADC): the
  * query stays full-precision; per subspace a k-entry lookup table of
  * exact sub-distances is built once (driver-side, m×k doubles), and
  * each candidate's approximate squared L2 distance is the SUM of m
  * table lookups — a pure map-side, codegen-friendly expression over
  * the code column. No vector data is touched at scoring time.
  *
  * Scale shape: fit = m × [[Ivf.fit]] over SLICES of the embedding
  * (assignment map-side, only K×sub decimal partials shuffle);
  * encoding is m codegen'd [[graft.functions.NearestCentroid]] calls
  * in one pass; search shuffles only top-k partials. The codebook
  * table is m×k×(dims/m) doubles — driver-scale by construction.
  */
object Pq {

  /** Per-subspace codebooks: `codebooks(s)(j)` = centroid j of
    * subspace s (dims/m components each). */
  def fit(df: DataFrame, embCol: Column, seedOrder: Seq[Column], m: Int = 8,
      dims: Int = 64, k: Int = 16, iters: Int = 2): Array[Array[Array[Double]]] = {
    val sub = dims / m
    require(m * sub == dims, s"m=$m must divide dims=$dims")
    Array.tabulate(m)(s =>
      Ivf.fit(df, slice(embCol, s * sub + 1, sub), seedOrder, k, iters, sub))
  }

  /** Add the `pq_code` column (array<int>, m entries) — one pass, m
    * codegen'd nearest-centroid scans. */
  def encode(df: DataFrame, embCol: Column,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val sub = codebooks(0)(0).length
    df.withColumn("pq_code", array(codebooks.indices.map(s =>
      graft.functions.nearest_centroid(
        slice(embCol, s * sub + 1, sub), codebooks(s))): _*))
  }

  /** Persist codebooks as a (subspace, cell, centroid) parquet table. */
  def save(spark: SparkSession, codebooks: Array[Array[Array[Double]]],
      dir: String): Unit = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (c, j) => (s, j, c.toSeq) }
    }.toSeq.toDF("subspace", "cell", "centroid")
      .repartition(1).write.mode("overwrite").parquet(dir)
  }

  def load(spark: SparkSession, dir: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(dir).orderBy("subspace", "cell")
      .select("subspace", "centroid").collect()
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.map(_.getSeq[Double](1).toArray).toArray).toArray
  }

  /** ADC lookup table for one query: `lut(s)(j)` = exact squared L2
    * distance between the query's subspace-s slice and codebook entry
    * (s, j). m×k doubles, built driver-side per query. */
  def lutL2(codebooks: Array[Array[Array[Double]]], q: Array[Double])
      : Array[Array[Double]] = {
    val sub = codebooks(0)(0).length
    codebooks.zipWithIndex.map { case (cb, s) =>
      val qs = java.util.Arrays.copyOfRange(q, s * sub, (s + 1) * sub)
      cb.map(c => Ivf.distSq(qs, c))
    }
  }

  /** Approximate squared L2 distance of a coded vector to the query
    * behind `lut` — m element_at lookups, fully map-side. */
  def adcDistSq(codeCol: Column, lut: Array[Array[Double]]): Column =
    lut.indices.map(s =>
      element_at(typedlit(lut(s).toSeq), element_at(codeCol, s + 1) + 1))
      .reduce(_ + _)

  /** Top-k nearest (smallest approximate L2) over an encoded corpus
    * for one query — scores from code lookups only. */
  def search(encoded: DataFrame, idCol: Column,
      codebooks: Array[Array[Array[Double]]], q: Array[Float],
      topK: Int): DataFrame = {
    val lut = lutL2(codebooks, q.map(_.toDouble))
    encoded.select(idCol.as("vec_id"),
        adcDistSq(col("pq_code"), lut).as("adc_dist_sq"))
      // a ragged vector encodes to NULL codes → NULL distance; Spark
      // sorts NULLS FIRST ascending, which would rank garbage at the
      // top (and diverge from DuckDB's NULLS LAST) — drop them
      .filter(col("adc_dist_sq").isNotNull)
      .orderBy(col("adc_dist_sq").asc, col("vec_id").asc)
      .limit(topK)
  }
}
