package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.TextOps

/** Dev profiling harness for the text-dedup hot paths. */
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

    val d0 = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), TextOps.shingles(TextOps.tokens(col("text"))).as("sh"))
    time("shingles inline-toks")(d0.queryExecution.toRdd.count())
    val d = Tables.documents(spark, dir)
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("lang"), TextOps.shingles(col("toks")).as("sh"))
    time("shingles materialized-toks")(d.queryExecution.toRdd.count())
    time("shingles materialized x2")(d.queryExecution.toRdd.count())
    val hs = d.withColumn("hs", TextOps.shingleHashes(col("sh")))
    time("+hash60 per shingle")(hs.queryExecution.toRdd.count())
    val sig = hs.withColumn("sig", TextOps.minhashSig(col("hs"), 16)).drop("hs")
    time("+sig from hs col")(sig.queryExecution.toRdd.count())
    val sigInline = d.withColumn("sig", TextOps.minhashSig(TextOps.shingleHashes(col("sh")), 16))
    time("+sig inline (dup hashes)")(sigInline.queryExecution.toRdd.count())
    val ex = d.select(col("doc_id"), col("lang"), explode(col("sh")).as("s"))
    time("explode")(ex.queryExecution.toRdd.count())
    time("explode x2")(ex.queryExecution.toRdd.count())
    val exH = d.select(col("doc_id"), col("lang"),
      explode(TextOps.shingleHashes(col("sh"))).as("s"))
    time("explode hashed (long key)")(exH.queryExecution.toRdd.count())
    val joined = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    time("inverted join+group")(println("    pairs=" + joined.count()))
    println(joined.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Generate") ||
        l.contains("Join") || l.contains("Reused")).mkString("\n"))
    // isolate: materialized-array-Project -> Generate  vs  inline-in-Generate
    val dM = Tables.documents(spark, dir)
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("lang"), TextOps.shingles(col("toks")).as("sh"))
      .select(col("doc_id"), col("lang"), TextOps.shingleHashes(col("sh")).as("hsh"))
    time("A materialized hsh count")(dM.queryExecution.toRdd.count())
    val exA = dM.select(col("doc_id"), col("lang"), explode(col("hsh")).as("h"))
    time("A explode materialized")(exA.queryExecution.toRdd.count())
    val exB = d.select(col("doc_id"), col("lang"),
      explode(TextOps.shingleHashes(col("sh"))).as("h"))
    time("B explode inline")(exB.queryExecution.toRdd.count())
    val declared = graft.SparkEntry.queries("q_ngram_jaccard")(spark, dir)
    time("declared q_ngram_jaccard")(declared.queryExecution.toRdd.count())
    println(declared.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Project") || l.contains("Generate") || l.contains("Join"))
      .map(_.take(200)).mkString("\n"))
    val joinedH = exH.as("a").join(exH.as("b"),
        col("a.s") === col("b.s") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    time("inverted join+group hashed")(println("    pairs=" + joinedH.count()))
    spark.stop()
  }
}
