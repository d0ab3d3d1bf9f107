package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** FACADE-LEVEL scale probe (VERDICT r12 #3): the individual curation
  * stages each have scale artifacts, but [[graft.CorpusPipeline]]'s
  * one-call arc — the composed product — was unmeasured. Runs the arc
  * with extraction ON over block-structured synthetic corpora (the
  * generator below: realistic 50k vocabulary + stopwords + exact and
  * near duplicates, wrapped in the declared HTML fixture) at
  * 1×/3×/10× of a 100k-doc base, recording per-stage wall and
  * shuffle-write bytes, and emits a linear-or-better / superlinear
  * verdict per stage.
  *
  * Stage decomposition vs the facade's fused plan: the selection
  * stage deliberately computes quality gates, dedup keepers and
  * decontamination off ONE text scan (the one-scan guarantee PlanSpec
  * pins), so the probe recovers per-stage costs through the session
  * memo's ordering — `leakageSplit` is called FIRST and pays the
  * tokenize + MinHash + connected-components assignment
  * (`cc_dedup`); `corpusPipelineKeepers` then reuses that memo, so
  * its wall is the feature/quality scan + decontamination joins
  * (`quality_decon`); `split` and `pack` time their own increments.
  * Shuffle bytes come from a stage-completion listener snapshot
  * around each stage (listener delivery is async — a short settle
  * wait follows every stage).
  *
  * Usage: sbt "runMain graft.tools.PipelineScaleProbe [baseDocs]"
  * (default 100000; scales ×1/×3/×10). Writes PIPELINE_SCALE.json.
  */
/** The realistic-corpus generator SHARED by [[PipelineScaleProbe]]
  * and [[DiagKeepers]] (ADVICE r13: a hand-copied duplicate could
  * silently drift, and the diag tool would then measure a different
  * corpus than the probe).
  *
  * [[CorpusGenerator]]'s 30-word vocabulary is deliberately tiny for
  * the dedup probes, but it is the WRONG corpus for the full arc:
  * every trigram shingle collides (n-gram decontamination degenerates
  * quadratic) and distinct_ratio sits at the rep-gate boundary (the
  * selection keeps ~0 after extraction boilerplate). This corpus
  * keeps the generator's BLOCK duplicate structure (pos 8 exact copy,
  * pos 9 ~1/12 mutated near-dup) but draws tokens from a 50k hashed
  * vocabulary with ~30% en stopwords and ~10% sentence punctuation,
  * so quality, repetition, dedup and decontamination all operate in
  * their intended regimes. */
private[tools] object ProbeCorpus {
  private val StopToks = graft.ops.TextOps.stopwords.toArray

  private def pick(h: Long, n: Int): Int = (((h >>> 8) % n + n) % n).toInt

  private def tokOf(h: Long): String = {
    val p = (((h >>> 40) % 10 + 10) % 10).toInt
    if (p < 3) StopToks(pick(h, StopToks.length))
    else if (p == 3) "w" + pick(h, 50000) + "."
    else "w" + pick(h, 50000)
  }

  private def baseToks(seed: Long): Array[String] = {
    val h0 = CorpusGenerator.mix64(seed * 31 + 17)
    val n = 40 + pick(h0, 61)
    Array.tabulate(n)(i => tokOf(CorpusGenerator.mix64(seed * 1000003L + i)))
  }

  private def mutate(seed: Long, t: Array[String]): Array[String] =
    t.zipWithIndex.map { case (w, i) =>
      val h = CorpusGenerator.mix64(seed * 7778777L + i)
      if (pick(h, 12) == 0) tokOf(CorpusGenerator.mix64(h)) else w
    }

  def textOf(id: Long): String = {
    val block = id / 10
    val base = block * 10
    val toks = (id % 10) match {
      case 8 => baseToks(base)
      case 9 => mutate(id, baseToks(base))
      case _ => baseToks(id)
    }
    toks.mkString(" ")
  }

  def writeCorpus(spark: SparkSession, dir: String, n: Long,
      parts: Int = 32): Unit = {
    import spark.implicits._
    spark.range(n)
      .map(id => (id, textOf(id), "en", "src" + (id % 20)))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(parts)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }
}

object PipelineScaleProbe {

  private final class ShuffleMeter extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(ev.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-pipeline-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val root = Files.createTempDirectory("graft_pipeline_scale").toString

    import graft.ops.{Html, TextOps}
    import graft.io.Tables

    def staged[A](out: collection.mutable.ArrayBuffer[(String, Double, Long)],
        name: String)(body: => A): A = {
      val b0 = { Thread.sleep(300); meter.bytes.get() }
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let stage-completion events drain
      out += ((name, sec, meter.bytes.get() - b0))
      r
    }

    val scales = Seq(1, 3, 10)
    val rows = scales.map { s =>
      val nDocs = base * s
      val raw = s"$root/raw_$s"
      val dir = s"$root/ex_$s"
      ProbeCorpus.writeCorpus(spark, raw, nDocs) // generation untimed
      val stages = collection.mutable.ArrayBuffer.empty[(String, Double, Long)]

      // 1. extraction entry (extract ON): fixture-wrapped crawl pages
      //    through the html scanner to a standard documents table
      staged(stages, "extract") {
        val htmlDocs = Tables.documents(spark, raw)
          .select(col("doc_id"), col("lang"), col("source"),
            Html.fixture(col("doc_id"), col("text")).as("html"))
        graft.CorpusPipeline.extractHtmlCorpus(spark, htmlDocs, dir)
      }
      // 2. CC dedup assignment (memo built here, reused downstream)
      val splitAll = staged(stages, "cc_dedup") {
        val f = TextOps.leakageSplit(spark, dir)
        f.count(); f
      }
      // 3. quality + decontamination selection off the warm CC memo
      val keepers = staged(stages, "quality_decon") {
        val k = TextOps.corpusPipelineKeepers(spark, dir)
        k.count(); k
      }
      val ids = keepers.select("doc_id")
      // 4. leakage-safe split of the selected set
      val nSplit = staged(stages, "split") {
        splitAll.join(ids, Seq("doc_id"), "left_semi").count()
      }
      // 5. sequence packing of the selected docs
      val packed = staged(stages, "pack") {
        TextOps.packSequences(
          Tables.documents(spark, dir).join(ids, Seq("doc_id"), "left_semi"),
          TextOps.PackContext)
      }
      val nPacked = packed.count()
      packed.unpersist(false)
      require(nSplit == keepers.count(), "split must cover the selected set")
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      (s, nDocs, nPacked, stages.toSeq)
    }

    val stageNames = rows.head._4.map(_._1)
    val verdicts = stageNames.map { name =>
      val w1 = rows.head._4.find(_._1 == name).get._2
      val w10 = rows.last._4.find(_._1 == name).get._2
      val ratio = w10 / math.max(w1, 1e-9)
      // 10× data with 15% slack; sub-second stages are overhead-bound,
      // call them flat
      val v = if (w10 < 1.5 || ratio <= 11.5) "linear-or-better"
        else "superlinear"
      (name, ratio, v)
    }

    val scaleJson = rows.map { case (s, n, packed, st) =>
      val stJson = st.map { case (nm, sec, by) =>
        f"""{"stage":"$nm","sec":$sec%.2f,"shuffle_mb":${by / 1048576.0}%.1f}"""
      }.mkString("[", ",", "]")
      s"""{"scale":$s,"docs":$n,"packed_docs":$packed,"stages":$stJson}"""
    }.mkString("[", ",", "]")
    val verdictJson = verdicts.map { case (n, r, v) =>
      f"""{"stage":"$n","ratio_10x_vs_1x":$r%.2f,"verdict":"$v"}"""
    }.mkString("[", ",", "]")
    val json = s"""{"metric":"pipeline_scale","base_docs":$base,""" +
      s""""scales":$scaleJson,"verdicts":$verdictJson}"""
    // repo-relative like bench_baseline.json is read (ADVICE r13)
    Files.writeString(Paths.get("PIPELINE_SCALE.json"), json)
    println(json)
    spark.stop()
  }
}
