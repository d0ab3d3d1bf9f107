package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Generation-loop detector semantics (q_loop_detect): a planted
  * model-style loop is flagged, natural prose with an incidental
  * repeat is not, and the counters are exact. */
class LoopDetectSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_loop").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.SparkEntry.queries("q_loop_detect")(spark, dir)
      .select($"doc_id", $"n_windows", $"max_window_mult",
        $"rep_window_share", $"loop_flag")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
  }

  test("planted loop flags; prose and short docs do not") {
    val loopPhrase = "i am sorry i can not help with that request today"
    val loop = (loopPhrase + " ") * 6 // the same windows recur ~6x
    val prose = (1 to 80).map(i => s"w$i").mkString(" ")
    // one incidental repeat of an 8-gram (multiplicity 2) stays clean
    val eightGram = "a b c d e f g h"
    val twice = s"$eightGram ${(1 to 30).map(i => s"u$i").mkString(" ")} $eightGram"
    val short = "too few tokens here"
    val out = run(Seq((1L, loop.trim), (2L, prose), (3L, twice), (4L, short)))

    assert(out(1L)._5, s"planted loop not flagged: ${out(1L)}")
    assert(out(1L)._3 >= 3 && out(1L)._4 > 0.5, out(1L).toString)
    assert(!out(2L)._5 && out(2L)._3 == 1 && out(2L)._4 == 0.0)
    assert(!out(3L)._5 && out(3L)._3 == 2, out(3L).toString)
    // the two repeated windows count into the repeated mass
    assert(math.abs(out(3L)._4 - 2.0 / out(3L)._2) < 1e-6) // share rounds to 6
    assert(out(4L)._2 == 0L && !out(4L)._5 && out(4L)._4 == 0.0)
  }

  test("map-side: the loop-detect plan contains no exchange") {
    val dir = sf("sf0.001")
    val df = graft.SparkEntry.queries("q_loop_detect")(spark, dir)
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    // the trailing orderBy is presentation; the detection itself adds
    // no aggregation exchange — allow only the final sort's range
    // partitioning
    assert(exchanges.size <= 1,
      s"loop detection must be map-side, got ${exchanges.size} exchanges")
  }
}

/** Curriculum phasing semantics: phases are monotone in difficulty,
  * terciles are balanced once the sketch values are min-shifted, and
  * assignment is deterministic. */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("phases are monotone in avg_nll and roughly tercile-sized") {
    val rows = graft.SparkEntry.queries("q_curriculum")(spark, sf("sf0.01"))
      .select($"doc_id", $"avg_nll", $"phase")
      .as[(Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    // monotone: max nll of phase k <= min nll of phase k+1
    val byPhase = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byPhase.keySet == Set(0, 1, 2), byPhase.keySet.toString)
    assert(byPhase(0).max <= byPhase(1).min && byPhase(1).max <= byPhase(2).min)
    // min-shifted sketch thresholds give real terciles (each phase
    // within 2x of n/3 — the coarse-bucket failure mode puts 66% in
    // one phase)
    val n = rows.length
    Seq(0, 1, 2).foreach { p =>
      val c = byPhase(p).length
      assert(c * 3 > n / 2 && c * 3 < n * 2,
        s"phase $p has $c of $n — terciles degenerated")
    }
    // deterministic
    val again = graft.SparkEntry.queries("q_curriculum")(spark, sf("sf0.01"))
      .select($"doc_id", $"phase").as[(Long, Int)].collect().toMap
    assert(rows.forall(r => again(r._1) == r._3))
  }
}
