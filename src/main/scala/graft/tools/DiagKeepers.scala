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
    // probe-local corpus via PipelineScaleProbe's generator (reflection-free: re-gen here)
    val n = 3000L
    import spark.implicits._
    val probeGen = graft.tools.PipelineScaleProbe
    // use private gen indirectly: regenerate with same shape
    spark.range(n).map { id =>
      val h0 = CorpusGenerator.mix64(id * 31 + 17)
      def pick(h: Long, m: Int) = (((h >>> 8) % m + m) % m).toInt
      val stop = TextOps.stopwords.toArray
      def tokOf(h: Long) = { val p = (((h >>> 40) % 10 + 10) % 10).toInt
        if (p < 3) stop(pick(h, stop.length)) else if (p == 3) "w" + pick(h, 50000) + "." else "w" + pick(h, 50000) }
      val nn = 40 + pick(h0, 61)
      val txt = Array.tabulate(nn)(i => tokOf(CorpusGenerator.mix64(id * 1000003L + i))).mkString(" ")
      (id, txt, "en", "src" + (id % 20))
    }.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$root/raw/documents.parquet")
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
