package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution diagnostic for the qd_decon_join substage flagged
  * superlinear by [[PipelineScaleProbe]] (r14): counts every
  * intermediate cardinality of the decontamination join at 1× and
  * 10× of the probe corpus so the growth term is NAMED, not guessed —
  * shingle stream rows, hot (df-capped) set size, post-cap stream,
  * eval-side rows, pre-aggregation pair-join output, contaminated
  * set, plus per-action shuffle bytes.
  *
  * Usage: sbt "runMain graft.tools.DiagDecon [baseDocs]" (default
  * 100000; runs 1× and 10×). Prints one JSON line per scale.
  */
object DiagDecon {
  private final class Meter extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(ev.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toLong).getOrElse(100000L)
    // arg 2: shuffle partitions — the hash-agg attribution knob: on a
    // fixed-32-partition local box, per-task group cardinality grows
    // with the corpus; a cluster scales partitions with data
    val parts = args.drop(1).headOption.getOrElse("32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)
    val root = java.nio.file.Files.createTempDirectory("diag_decon").toString
    import graft.ops.TextOps

    // arg 3: comma-separated scale list (r15: the 30× arm caught a
    // superlinear WALL with linear shuffle in the pipeline probe —
    // attribution needs the same second-decade point)
    val scaleArg = args.drop(2).headOption.getOrElse("1,10")
    val lines = collection.mutable.ArrayBuffer.empty[String]
    scaleArg.split(",").map(_.trim.toLong).toSeq.foreach { s =>
      val n = base * s
      val raw = s"$root/raw_$s"; val dir = s"$root/ex_$s"
      ProbeCorpus.writeCorpus(spark, raw, n)
      val html = graft.io.Tables.documents(spark, raw)
        .select(col("doc_id"), col("lang"), col("source"),
          graft.ops.Html.fixture(col("doc_id"), col("text")).as("html"))
      graft.CorpusPipeline.extractHtmlCorpus(spark, html, dir)

      // the decon join's exact shingle stream, from public pieces
      // (the DiagKeepers spelling of corpusFeatures' hsh explode)
      val docs = graft.io.Tables.documents(spark, dir)
      val shingled0 = docs.select(col("doc_id"),
        graft.functions.ngram_hash_explode(TextOps.tokens(col("text"))).as("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      def timed[A](tag: String)(body: => A): (A, Double, Double) = {
        val b0 = { Thread.sleep(300); meter.bytes.get() }
        val t0 = System.nanoTime()
        val r = body
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        (r, sec, (meter.bytes.get() - b0) / 1048576.0)
      }

      val (nRows, tRows, bRows) = timed("stream")(shingled0.count())
      // THE production shape (r15: eval-side-only capping — the
      // corpus stream pays ONE probe against the kept eval broadcast;
      // the df aggregate is the cap's corpus-frequency source), built
      // from the same pieces deconPairCounts fuses, staged so each
      // term gets its own wall/bytes row. Cap thresholds quoted from
      // the production constants (the DiagKeepers shared-definition
      // lesson).
      val thr = least(
        greatest(expr(s"n_docs div ${TextOps.DeconDfDenom}"),
          lit(TextOps.DeconDfFloor.toLong)),
        lit(TextOps.DeconDfAbs.toLong))
      val nDocsF = docs.select(count(lit(1)).as("n_docs"))
      val dfAll = shingled0.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (nDistinct, tDf, bDf) = timed("df_agg")(dfAll.count())
      val nHot = dfAll.crossJoin(broadcast(nDocsF))
        .filter(col("df") > thr).count()
      val evalKept = shingled0.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("eval_id"), col("h"))
        .join(dfAll, Seq("h"))
        .crossJoin(broadcast(nDocsF))
        .filter(col("df") <= thr)
        .select(col("eval_id"), col("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (nEval, tEval, bEval) = timed("eval_kept")(evalKept.count())
      val joined = shingled0.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(evalKept), Seq("h"))
      val (nPairsRaw, tJoin, bJoin) = timed("join")(joined.count())
      val contaminated = joined
        .groupBy(col("doc_id"), col("eval_id")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3).select(col("doc_id")).distinct()
      val (nCont, tAgg, bAgg) = timed("agg")(contaminated.count())
      shingled0.unpersist(true); dfAll.unpersist(true); evalKept.unpersist(true)
      spark.sharedState.cacheManager.clearCache(); System.gc()

      val line =
        f"""{"scale":$s,"docs":$n,"shuffle_partitions":$parts,""" +
        f""""shingle_rows":$nRows,"stream_sec":$tRows%.2f,"stream_mb":$bRows%.1f,""" +
        f""""distinct_hashes":$nDistinct,"df_sec":$tDf%.2f,"df_mb":$bDf%.1f,""" +
        f""""hot_shingles":$nHot,""" +
        f""""eval_rows":$nEval,"eval_sec":$tEval%.2f,"eval_mb":$bEval%.1f,""" +
        f""""pair_rows":$nPairsRaw,"join_sec":$tJoin%.2f,"join_mb":$bJoin%.1f,""" +
        f""""contaminated":$nCont,"agg_sec":$tAgg%.2f,"agg_mb":$bAgg%.1f}"""
      println(s"""{"metric":"diag_decon",${line.drop(1)}""")
      lines += line
    }
    val json = s"""{"metric":"diag_decon","cap":""" +
      s""""min(max(n_docs div ${TextOps.DeconDfDenom}, ${TextOps.DeconDfFloor}), ${TextOps.DeconDfAbs})",""" +
      s""""runs":${lines.mkString("[", ",", "]")}}"""
    // repo-relative like the other probe artifacts (ADVICE r13)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("DIAG_DECON.json"), json)
    spark.stop()
  }
}
