package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.TextOps

/** Dev profiling harness for the text-dedup hot paths — the
  * measurements behind PERF.md §optimization-log. Times the staged
  * decomposition of the near-dup pipeline so regressions in any stage
  * (tokenize/shingle, hash, explode, inverted join) are visible in
  * isolation. Usage: `sbt "runMain graft.tools.PerfProbe"` (set
  * SPARK_GRAFT_SF_DIR to change scale). */
object PerfProbe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage decomposition (PERF.md: each stage must stay ~O(100ms)
    // at sf0.1; the FULL query must stay within ~2x of the stage sum)
    val base = Tables.documents(spark, dir)
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("lang"), TextOps.shingles(col("toks")).as("sh"))
    time("tokenize+shingle")(base.queryExecution.toRdd.count())
    val ex = base.select(col("doc_id"), col("lang"),
      explode(TextOps.shingleHashes(col("sh"))).as("h"))
    time("hash+explode (inline)")(ex.queryExecution.toRdd.count())
    val common = ex.as("a").join(ex.as("b"),
        col("a.h") === col("b.h") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    time("inverted join+group")(common.queryExecution.toRdd.count())
    val sig = base
      .select(col("doc_id"), TextOps.shingleHashes(col("sh")).as("hsh"))
      .withColumn("sig", TextOps.minhashSig(col("hsh"), 16))
    time("minhash signatures")(sig.queryExecution.toRdd.count())

    // full declared queries for comparison
    Seq("q_ngram_jaccard", "q_minhash_dedup", "q_simhash_pairs").foreach { q =>
      time(s"full $q")(
        graft.SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
