package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Scaling-curve harness for the dedup pipeline (VERDICT r3 "next
  * round" #1): generates [[CorpusGenerator]] corpora at multiples of
  * the sf0.1 documents table (5k docs) and runs the north-star chain —
  * q_dedup_exact → q_minhash_dedup → q_dedup_clusters →
  * q_corpus_select_dedup — at each size, recording wall time, output
  * rows, shuffle/spill bytes, and the max single-task time per stage.
  * Writes `DEDUP_SCALE.json`; PERF.md reads the curve.
  *
  * Method matches the reference's staged-load testing
  * (stress_test.py:20-28) applied to batch dedup: same operators the
  * correctness gate checks, driven at growing scale, with the failure
  * criteria being task failure/OOM or a super-linear wall-time curve.
  *
  * Usage:
  *   sbt "runMain graft.tools.DedupScaleProbe [scales] [outJson]"
  * scales default "10,30,100" (× sf0.1 = 50k/150k/500k docs).
  */
object DedupScaleProbe {

  /** Per-stage task-metric aggregation (driver-side listener — metrics
    * only, no data). */
  final class MetricsListener extends SparkListener {
    @volatile var spillBytes = 0L
    @volatile var shuffleWriteBytes = 0L
    @volatile var maxTaskMs = 0L
    @volatile var failedTasks = 0
    @volatile var tasks = 0
    // synchronized on the same lock as onTaskEnd: a straggler task-end
    // racing an unsynchronized reset could resurrect pre-reset counts
    // into the new sample (callers also drain the listener bus first,
    // but the lock makes the discipline unconditional)
    def reset(): Unit = synchronized { spillBytes = 0; shuffleWriteBytes = 0
      maxTaskMs = 0; failedTasks = 0; tasks = 0 }
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
      tasks += 1
      if (!te.reason.toString.startsWith("Success")) failedTasks += 1
      val m = te.taskMetrics
      if (m != null) {
        spillBytes += m.memoryBytesSpilled + m.diskBytesSpilled
        shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
        maxTaskMs = math.max(maxTaskMs, te.taskInfo.duration)
      }
    }
  }

  val Stages = Seq("q_dedup_exact", "q_minhash_dedup", "q_dedup_clusters",
    "q_corpus_select_dedup")

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.getOrElse("10,30,100")
      .split(",").map(_.trim.toInt).toSeq
    val outJson = args.drop(1).headOption.getOrElse("DEDUP_SCALE.json")
    val baseDocs = 5000L // sf0.1 documents row count
    val baseDir = sys.env.getOrElse("DEDUP_SCALE_DIR", "/tmp/dedup_scale")

    val spark = SparkSession.builder().master("local[32]")
      .appName("dedup-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    val results = scales.map { scale =>
      val nDocs = baseDocs * scale
      val dir = s"$baseDir/x$scale"
      val tGen0 = System.nanoTime()
      CorpusGenerator.write(spark, dir, nDocs)
      val genSec = (System.nanoTime() - tGen0) / 1e9
      println(f"[scale x$scale] generated $nDocs docs in $genSec%.1f s")

      def timed(name: String)(df: => org.apache.spark.sql.DataFrame): String = {
        listener.reset()
        val t0 = System.nanoTime()
        val rows = df.queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        // task-end events are delivered asynchronously; without a
        // drain the final straggler task can be missing from the
        // metrics this probe exists to record
        org.apache.spark.sql.graft.shims.drainListenerBus(spark)
        spark.sharedState.cacheManager.clearCache()
        System.gc()
        println(f"[scale x$scale] $name%-24s $sec%8.1f s  rows=$rows%-9d " +
          f"spillMB=${listener.spillBytes / 1e6}%.0f shufMB=${listener.shuffleWriteBytes / 1e6}%.0f " +
          f"maxTaskMs=${listener.maxTaskMs} failed=${listener.failedTasks}")
        s""""$name":{"sec":${f"$sec%.3f"},"rows":$rows,"spill_bytes":${listener.spillBytes},""" +
          s""""shuffle_write_bytes":${listener.shuffleWriteBytes},"max_task_ms":${listener.maxTaskMs},""" +
          s""""failed_tasks":${listener.failedTasks}}"""
      }
      val declared = Stages.map(q => timed(q)(graft.SparkEntry.queries(q)(spark, dir)))
      // the hot-bucket-capped production form of the LSH pair stage —
      // measures the straggler the cap removes (PERF.md round-4 log)
      val capped = timed("minhash_capped64")(
        graft.ops.TextOps.minhashPairsOf(
          graft.io.Tables.documents(spark, dir), maxBucket = Some(64)))
      val stageJson = (declared :+ capped).mkString(",")
      s"""{"scale":$scale,"docs":$nDocs,"gen_sec":${f"$genSec%.2f"},"stages":{$stageJson}}"""
    }

    val json = s"""{"metric":"dedup_scale","base_docs":$baseDocs,"cpus":32,""" +
      s""""runs":[${results.mkString(",")}]}"""
    Files.writeString(Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
