package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off experiment (r15): is the pipeline-vs-DIAG qd_decon_join
  * wall gap at 30× explained by the SOURCE of the shingle stream —
  * 3 passes re-exploding `hsh` from the cached feature frame vs
  * passes over a materialized skinny (doc_id, h) explode? Times
  * deconPairCounts from both sources on the same 3M-doc corpus. */
object DiagDeconSource {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(3000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("diag_src").toString
    ProbeCorpus.writeCorpus(spark, root, n)
    val html = graft.io.Tables.documents(spark, root)
      .select(col("doc_id"), col("lang"), col("source"),
        graft.ops.Html.fixture(col("doc_id"), col("text")).as("html"))
    graft.CorpusPipeline.extractHtmlCorpus(spark, html, s"$root/ex")
    val feats = graft.ops.TextOps.corpusFeatures(spark, s"$root/ex")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    feats.count()
    def timeIt(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$r)")
    }
    val exCache = feats.select(col("doc_id"), explode(col("hsh")).as("h"))
    timeIt("decon_from_feats_cache") {
      graft.ops.TextOps.deconPairCounts(exCache, feats)
        .select(col("doc_id")).distinct().count()
    }
    timeIt("decon_from_feats_cache_2nd") {
      graft.ops.TextOps.deconPairCounts(exCache, feats)
        .select(col("doc_id")).distinct().count()
    }
    val exMat = exCache
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exMat.count()
    timeIt("decon_from_materialized_explode") {
      graft.ops.TextOps.deconPairCounts(exMat, feats)
        .select(col("doc_id")).distinct().count()
    }
    spark.stop()
  }
}
