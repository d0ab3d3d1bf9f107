package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthetic clustered-embedding generator for the ANN scaling curve
  * (VERDICT r4 "next round" #1) — an `embeddings` table with the
  * driver testdata's schema (vec_id, label, embedding: 64×float) at
  * any size, with PLANTED cluster structure: `nClusters` uniform
  * [−1,1]⁶⁴ centers, each vector = center(label) + uniform noise.
  * At noise 0.25 the within-cluster cosine is ≈0.95 and cross-cluster
  * ≈0, so IVF/LSH probes have real structure to find, while true
  * top-k neighbors are still measured against brute force (never
  * assumed from the labels).
  *
  * Everything derives from splitmix64 of (id, dim) — no RNG state, so
  * generation is embarrassingly parallel and identical across runs
  * and partitionings (same property as [[CorpusGenerator]]).
  *
  * Usage: sbt "runMain graft.tools.VectorGenerator <outDir> <nVecs> [nClusters]"
  */
object VectorGenerator {

  val Dims = 64

  private def unit(h: Long): Double = ((h >>> 11) * (1.0 / (1L << 53))) * 2 - 1

  /** Cluster center component, uniform [−1, 1]. */
  def center(c: Int, i: Int): Double =
    unit(CorpusGenerator.mix64(c.toLong * Dims + i + 777L))

  case class Vec(vec_id: Long, label: Int, embedding: Array[Float])

  def corpus(spark: SparkSession, n: Long, nClusters: Int,
      noise: Double = 0.25): DataFrame = {
    import spark.implicits._
    spark.range(n).map { id =>
      val label = (((CorpusGenerator.mix64(id * 31 + 7) >>> 8) % nClusters)).toInt
      val emb = Array.tabulate(Dims) { i =>
        val u = unit(CorpusGenerator.mix64(id * 6400019L + i))
        (center(label, i) + noise * u).toFloat
      }
      Vec(id, label, emb)
    }.toDF()
  }

  def write(spark: SparkSession, outDir: String, n: Long, nClusters: Int): Unit =
    corpus(spark, n, nClusters)
      // ~32 files so downstream scans parallelize (CorpusGenerator's
      // single-file lesson from round 4)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

  def main(args: Array[String]): Unit = {
    val Array(outDir, n) = args.take(2)
    val nClusters = args.lift(2).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, outDir, n.toLong, nClusters)
    println(s"""{"metric":"vectors","n":$n,"clusters":$nClusters,"dir":"$outDir"}""")
    spark.stop()
  }
}
