package graft.tools

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ATTRIBUTION probe for the cc_dedup verify-join exchange (VERDICT
  * r14 #1 — "needs a DIAG-style attribution first: what columns make
  * up the 1,916 MB, where the 1×→3× broadcast-to-shuffle transition
  * fires").
  *
  * For each scale (1×/3×/10× of a 100k-doc [[ProbeCorpus]]) this
  * measures, over the exact-dup-contracted REP frame the production
  * path verifies on:
  *   - the payload census: rep count, total hsh bytes (the wide
  *     column — 8 B/shingle hash + array header), candidate pair /
  *     candidate-id counts, and the candidate-RESTRICTED hsh bytes —
  *     i.e. what the verify join is information-theoretically owed
  *     vs what an unrestricted join ships;
  *   - the pair-weighted payload (Σ over pairs of |h_a|): what the
  *     second verify join re-keys per PAIR — the component that
  *     stays even after restriction;
  *   - measured shuffle-write bytes + wall of the LEGACY spelling
  *     (verify against the full rep frame — the r14 shape, inlined
  *     here as measurement-only code) vs the PRODUCTION spelling
  *     ([[graft.ops.TextOps.minhashPairsOfHashes]], candidate-id
  *     semi-restriction, r15), with verified-pair-set equality
  *     asserted between the two.
  *
  * Usage: sbt "runMain graft.tools.DiagCcVerify [baseDocs]"
  * (default 100000). Writes DIAG_CCVERIFY.json.
  */
object DiagCcVerify {

  private final class ShuffleMeter extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(ev.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-diag-ccverify")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val root = Files.createTempDirectory("graft_diag_ccverify").toString
    import graft.ops.TextOps

    def metered[A](body: => A): (A, Double, Long) = {
      Thread.sleep(300)
      val b0 = meter.bytes.get(); val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      (r, sec, meter.bytes.get() - b0)
    }

    // the rep frame the production cc path verifies on: one
    // representative (doc_id, hsh) per normalized-text digest
    def repHashes(docs: DataFrame): DataFrame = {
      val feats = docs
        .select(col("doc_id"), md5(TextOps.normText(col("text"))).as("dig"),
          col("text"))
      TextOps.minhashHashes(feats.select(col("dig"),
          struct(col("doc_id"), col("text")).as("r"))
        .groupBy(col("dig")).agg(min(col("r")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text")))
    }

    val rows = Seq(1, 3, 10).map { s =>
      val nDocs = base * s
      val dir = s"$root/raw_$s"
      ProbeCorpus.writeCorpus(spark, dir, nDocs)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val hashed = repHashes(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // ---- payload census (untimed plan-shape facts) ----
      val sig = hashed.withColumn("sig",
        TextOps.minhashSig(col("hsh"), TextOps.MinhashK))
      val banded = TextOps.bandedBuckets(sig).drop("hsh")
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band_id") === col("b.band_id") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val candIds = cand.select(col("id_a").as("doc_id"))
        .union(cand.select(col("id_b").as("doc_id"))).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nReps = hashed.count()
      val nPairs = cand.count()
      val nCandIds = candIds.count()
      def hshBytes(df: DataFrame): Long = df
        .agg(coalesce(sum(size(col("hsh")).cast("long") * 8L + 16L), lit(0L)))
        .head.getLong(0)
      val allHshBytes = hshBytes(hashed)
      val candHshBytes = hshBytes(hashed.join(candIds, Seq("doc_id"), "left_semi"))
      val pairWeightedBytes = cand
        .join(hashed.select(col("doc_id").as("id_a"),
          (size(col("hsh")).cast("long") * 8L + 16L).as("ba")), Seq("id_a"))
        .agg(coalesce(sum(col("ba")), lit(0L))).head.getLong(0)

      // ---- LEGACY verify (r14 shape): cand joined against the FULL
      //      rep frame — measurement-only replica ----
      val sets = hashed.select(col("doc_id"), col("hsh"))
      val (legacyPairs, legacySec, legacyShuf) = metered {
        val p = cand
          .join(sets.select(col("doc_id").as("id_a"), col("hsh").as("h_a")), "id_a")
          .join(sets.select(col("doc_id").as("id_b"), col("hsh").as("h_b")), "id_b")
          .withColumn("inter",
            size(array_intersect(col("h_a"), col("h_b"))).cast("double"))
          .withColumn("jaccard",
            col("inter") / (size(col("h_a")) + size(col("h_b")) - col("inter")))
          .filter(col("jaccard") >= 0.5)
          .select(col("id_a"), col("id_b"))
        val rows = p.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        rows
      }

      // ---- PRODUCTION verify (r15): the full minhashPairsOfHashes
      //      path — pair gen re-runs inside, so its shuffle row also
      //      carries banding; the verify DELTA is legacy-comparable
      //      because both census joins above already warmed the cache
      val (prodPairs, prodSec, prodShuf) = metered {
        val p = TextOps.minhashPairsOfHashes(hashed)
        val rows = p.select(col("id_a"), col("id_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        p.unpersist(true)
        rows
      }
      require(legacyPairs == prodPairs,
        s"restructured verify changed the verified pair set at ${s}x: " +
          s"legacy=${legacyPairs.size} prod=${prodPairs.size}")

      cand.unpersist(true); candIds.unpersist(true); hashed.unpersist(true)
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val mb = 1048576.0
      (s, nDocs, nReps, nPairs, nCandIds,
        allHshBytes / mb, candHshBytes / mb, pairWeightedBytes / mb,
        legacySec, legacyShuf / mb, prodSec, prodShuf / mb,
        legacyPairs.size)
    }

    val json = rows.map { case (s, nd, nr, np, nci, allMb, candMb, pwMb,
        lSec, lShufMb, pSec, pShufMb, nVerified) =>
      f"""    {"scale": $s, "docs": $nd, "reps": $nr,
         |     "cand_pairs": $np, "cand_ids": $nci, "verified_pairs": $nVerified,
         |     "hsh_mb_all_reps": $allMb%.1f, "hsh_mb_cand_restricted": $candMb%.1f,
         |     "hsh_mb_pair_weighted": $pwMb%.1f,
         |     "legacy_verify": {"sec": $lSec%.2f, "shuffle_mb": $lShufMb%.1f},
         |     "prod_full_pairgen": {"sec": $pSec%.2f, "shuffle_mb": $pShufMb%.1f}}""".stripMargin
    }.mkString(",\n")
    val out =
      s"""{
         |  "metric": "diag_ccverify",
         |  "base_docs": $base,
         |  "note": "legacy_verify = r14 unrestricted verify joins only (pair gen pre-materialized); prod_full_pairgen = the whole r15 minhashPairsOfHashes call (banding + candidate gen + RESTRICTED verify). hsh_mb_cand_restricted / hsh_mb_all_reps is the restriction factor; hsh_mb_pair_weighted is the irreducible per-pair re-key of the second join.",
         |  "scales": [
         |$json
         |  ]
         |}""".stripMargin
    Files.write(java.nio.file.Paths.get("DIAG_CCVERIFY.json"),
      out.getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
