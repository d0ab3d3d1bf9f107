package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Ivf

/** Soak probe for [[Ivf.compactIndex]] (round-6 verdict item 2):
  * sustained [[Ivf.appendStream]] load with batch-count-cadence
  * compaction, measuring whether the index's small-file population is
  * BOUNDED by the cadence instead of growing with the stream's
  * lifetime — and whether probes return identical results to brute
  * force over everything ingested, at every sample point.
  *
  * Metrics per sample (every batch):
  *   - live `batch_id=` slice dirs (the uncompacted tail),
  *   - parquet files in the committed compacted generation,
  *   - total parquet data files a reader's listing touches
  *     (live ∪ committed generation — the real open-file cost of a
  *     full-index scan).
  * A control run with compaction OFF shows the unbounded counterfactual
  * on the same input.
  *
  * Usage: sbt "runMain graft.tools.IvfCompactProbe [nBatches] [rowsPerBatch] [compactEvery]"
  * Emits one JSON line + IVF_COMPACT.json-ready payload on stdout.
  */
object IvfCompactProbe {
  private def countDirs(root: java.io.File, prefix: String): Seq[java.io.File] =
    if (!root.exists()) Seq.empty
    else root.listFiles().toSeq.filter(d => d.isDirectory && d.getName.startsWith(prefix))

  /** Live batch_id slice dirs across all cells. */
  private def liveSlices(idx: String): Int =
    countDirs(new java.io.File(idx), "cell=")
      .map(c => countDirs(c, "batch_id=").size).sum

  /** Parquet data files under a directory tree. */
  private def parquetFiles(dir: java.io.File): Int =
    if (!dir.exists()) 0
    else dir.listFiles().toSeq.map { f =>
      if (f.isDirectory) parquetFiles(f)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    }.sum

  /** Files in the currently committed compacted generation. */
  private def compactFiles(spark: SparkSession, idx: String): Int =
    graft.stream.Snapshots.resolve(spark, s"$idx/.compact") match {
      case Some(v) => parquetFiles(new java.io.File(s"$idx/.compact/v_$v"))
      case None => 0
    }

  /** Live-tree parquet files (excludes the dot-prefixed compact root). */
  private def liveFiles(idx: String): Int =
    countDirs(new java.io.File(idx), "cell=").map(parquetFiles).sum

  def main(args: Array[String]): Unit = {
    val nBatches = args.lift(0).map(_.toInt).getOrElse(60)
    val rowsPerBatch = args.lift(1).map(_.toInt).getOrElse(2000)
    val compactEvery = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("ivfcompact").toString
    val total = nBatches.toLong * rowsPerBatch
    val corpus = VectorGenerator.corpus(spark, total, nClusters = 16)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    val centers = Ivf.fit(corpus, $"embedding", Seq($"vec_id"), k = 16, iters = 2)
    val qEmb = corpus.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toArray

    def run(idx: String, every: Int): Seq[(Int, Int, Int, Int)] = {
      (0 until nBatches).map { b =>
        val batch = corpus
          .filter($"vec_id" >= b.toLong * rowsPerBatch &&
            $"vec_id" < (b + 1).toLong * rowsPerBatch)
          .select($"vec_id", $"embedding")
        Ivf.appendBatch(batch, $"embedding", centers, idx, b.toLong)
        if (every > 0 && (b + 1) % every == 0) Ivf.compactIndex(spark, idx)
        (b, liveSlices(idx), compactFiles(spark, idx),
          liveFiles(idx) + compactFiles(spark, idx))
      }
    }

    val t0 = System.nanoTime()
    val compacted = run(s"$tmp/idx_c", compactEvery)
    val tCompacted = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val control = run(s"$tmp/idx_n", 0)
    val tControl = (System.nanoTime() - t1) / 1e9

    // correctness: full-probe search over the compacted index must
    // equal brute force over everything ingested
    val got = Ivf.search(spark, s"$tmp/idx_c", centers, qEmb,
      nProbe = 16, topK = 10).select($"vec_id").as[Long].collect().toSeq
    val brute = corpus
      .select($"vec_id",
        graft.functions.cosine_sim($"embedding", typedlit(qEmb.toSeq)).as("c"))
      .orderBy($"c".desc, $"vec_id".asc).limit(10)
      .select($"vec_id").as[Long].collect().toSeq
    val searchExact = got == brute
    // and the reader must see every row exactly once
    val readerRows = Ivf.readIndex(spark, s"$tmp/idx_c").count()

    def series(xs: Seq[(Int, Int, Int, Int)], f: ((Int, Int, Int, Int)) => Int) =
      xs.map(f).mkString("[", ",", "]")
    val json =
      s"""{"metric":"ivf_compact_soak","batches":$nBatches,""" +
        s""""rows_per_batch":$rowsPerBatch,"compact_every":$compactEvery,""" +
        s""""live_slices_compacted":${series(compacted, _._2)},""" +
        s""""reader_files_compacted":${series(compacted, _._4)},""" +
        s""""reader_files_control":${series(control, _._4)},""" +
        s""""max_live_slices_compacted":${compacted.map(_._2).max},""" +
        s""""max_reader_files_compacted":${compacted.map(_._4).max},""" +
        s""""final_reader_files_control":${control.last._4},""" +
        s""""search_equals_brute":$searchExact,""" +
        s""""reader_rows":$readerRows,"expected_rows":$total,""" +
        s""""wall_compacted_sec":${f"$tCompacted%.1f"},""" +
        s""""wall_control_sec":${f"$tControl%.1f"}}"""
    println(json)
    spark.stop()
    if (!searchExact || readerRows != total)
      throw new IllegalStateException("compaction soak FAILED correctness")
  }
}
