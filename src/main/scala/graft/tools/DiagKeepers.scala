package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DiagKeepers {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.TextOps
    val root = java.nio.file.Files.createTempDirectory("diag").toString
    // the EXACT probe corpus (shared generator — ADVICE r13), so the
    // diag numbers describe the same distribution the probe measures
    val n = 3000L
    ProbeCorpus.writeCorpus(spark, s"$root/raw", n, parts = 8)
    val html = graft.io.Tables.documents(spark, s"$root/raw")
      .select(col("doc_id"), col("lang"), col("source"),
        graft.ops.Html.fixture(col("doc_id"), col("text")).as("html"))
    graft.CorpusPipeline.extractHtmlCorpus(spark, html, s"$root/ex")
    for (d <- Seq(s"$root/raw", s"$root/ex")) {
      val sc = TextOps.scoredDocs(graft.io.Tables.documents(spark, d), withDigest = false)
      val q = sc.agg(avg(col("quality_score")), sum(when(col("quality_score") >= 0.3, 1).otherwise(0)),
        sum(when(col("marker_hits") > 0, 1).otherwise(0))).head()
      val rep = graft.io.Tables.documents(spark, d)
        .select(inline(TextOps.repMetrics(col("text"))))
      val r = rep.agg(avg(col("distinct_ratio")), avg(col("top_token_frac")), avg(col("dup_bigram_frac")),
        sum(when(TextOps.repKeepPredicate, 1).otherwise(0))).head()
      println(s"DIAG dir=$d avgQ=${q.get(0)} qPass=${q.get(1)} markerPass=${q.get(2)} " +
        s"avgDistinct=${r.get(0)} avgTop=${r.get(1)} avgDupBi=${r.get(2)} repPass=${r.get(3)}")
    }
    val ex = s"$root/ex"
    println("DIAG keepers=" + TextOps.corpusPipelineKeepers(spark, ex).count())
    // contamination leg in isolation (the corpusPipelineSelection CTE)
    val feats = graft.io.Tables.documents(spark, ex)
      .select(col("doc_id"), graft.functions.ngram_hash_explode(TextOps.tokens(col("text"))).as("h"))
    val contaminated = feats.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(feats.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("eval_id"), col("h"))), Seq("h"))
      .groupBy(col("doc_id"), col("eval_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3).select(col("doc_id")).distinct().count()
    println("DIAG contaminated=" + contaminated)
    println("DIAG split_rows=" + TextOps.leakageSplit(spark, ex).count())
    spark.stop()
  }
}
