package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.ops.Ivf

/** Repeat-median companion to [[VecScaleProbe]] for the quantizer
  * BUILD cost: the single-shot fit walls in VEC_SCALE.json are
  * JIT/GC-confounded (non-monotone across sizes); this probe runs
  * `Ivf.fit` `reps`× per size over the same corpora and reports
  * medians, so the build-cost scaling claim rests on a stable number.
  * Writes `FIT_STABILITY.json`.
  *
  * Usage: sbt "runMain graft.tools.FitProbe [sizes] [reps] [outJson]"
  */
object FitProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("200000,500000,1000000,2000000")
      .split(",").map(_.trim.toLong).toSeq
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val outJson = args.lift(2).getOrElse("FIT_STABILITY.json")
    val baseDir = sys.env.getOrElse("VEC_SCALE_DIR", "/tmp/vec_scale")

    val spark = SparkSession.builder().master("local[32]")
      .appName("fit-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val runs = sizes.map { n =>
      val dir = s"$baseDir/n$n"
      if (!new java.io.File(s"$dir/embeddings.parquet").exists())
        VectorGenerator.write(spark, dir, n, nClusters = 100)
      val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      // one discarded warm-up at the smallest size amortizes JIT
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        Ivf.fit(corpus, col("embedding"), Seq(col("vec_id")),
          k = VecScaleProbe.KCells, iters = 2)
        val s = (System.nanoTime() - t0) / 1e9
        System.gc()
        s
      }
      val med = median(ts)
      println(f"[fit n=$n] median $med%.1f s  runs ${ts.map(t => f"$t%.1f").mkString(" ")}")
      s"""{"n":$n,"median_sec":${f"$med%.2f"},"runs":[${ts.map(t => f"$t%.2f").mkString(",")}]}"""
    }
    val json = s"""{"metric":"fit_stability","k_cells":${VecScaleProbe.KCells},""" +
      s""""iters":2,"reps":$reps,"runs":[${runs.mkString(",")}]}"""
    Files.writeString(Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
