package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Isolate q_kmv_overlap's cost structure: the interpreted
  * explode(shingleHashes(shingles(…))) HOF chain vs the native
  * ngram_hash_explode generator feeding the same kmv aggregation, and
  * the aggregate's own k-sensitivity. Writes KMV_PROBE.json. The
  * measurement that moved q_kmv_overlap off the chain: the chain
  * costs ~8.6 s at sf0.1 BEFORE any aggregation; the kmv update loop
  * itself is noise (k=64 vs k=256 indistinguishable). */
object KmvProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def chain = graft.io.Tables.documents(spark, dir).select(col("source"),
      explode(TextOps.shingleHashes(TextOps.shingles(TextOps.tokens(col("text")))))
        .as("h"))
    def native = graft.io.Tables.documents(spark, dir).select(col("source"),
      graft.functions.ngram_hash_explode(TextOps.tokens(col("text"))).as("h"))
    def time(df: => org.apache.spark.sql.DataFrame): Double = {
      df.queryExecution.toRdd.count() // warm
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val rows = Seq(
      "chain_count" -> time(chain.groupBy(col("source")).agg(count(lit(1)).as("n"))),
      "chain_kmv256" -> time(chain.groupBy(col("source"))
        .agg(graft.functions.kmv_min_hashes(col("h"), 256).as("m"))),
      "native_count" -> time(native.groupBy(col("source")).agg(count(lit(1)).as("n"))),
      "native_kmv64" -> time(native.groupBy(col("source"))
        .agg(graft.functions.kmv_min_hashes(col("h"), 64).as("m"))),
      "native_kmv256" -> time(native.groupBy(col("source"))
        .agg(graft.functions.kmv_min_hashes(col("h"), 256).as("m"))))
    val json = rows.map { case (n, t) => f""""$n":$t%.3f""" }.mkString(",")
    val out = s"""{"sf":"$dir",$json}"""
    println(out)
    java.nio.file.Files.write(java.nio.file.Paths.get("KMV_PROBE.json"),
      out.getBytes("UTF-8"))
    spark.stop()
  }
}
