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
    // stage decomposition of the declared query
    locally {
      val base = Tables.documents(spark, dir)
        .withColumn("toks", TextOps.tokens(col("text")))
        .select(col("doc_id"), col("lang"), TextOps.shingles(col("toks")).as("sh"))
      val sizes = base.select(col("doc_id"), size(col("sh")).as("sz"))
      val ex2 = base.select(col("doc_id"), col("lang"),
        explode(TextOps.shingleHashes(col("sh"))).as("h"))
      time("stage: sizes")(sizes.queryExecution.toRdd.count())
      time("stage: ex")(ex2.queryExecution.toRdd.count())
      val common = ex2.as("a").join(ex2.as("b"),
          col("a.h") === col("b.h") && col("a.lang") === col("b.lang") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("common"))
      time("stage: common")(common.queryExecution.toRdd.count())
      val withSizes = common
        .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
      time("stage: common+sizes")(withSizes.queryExecution.toRdd.count())
      val filtered = withSizes
        .withColumn("jaccard",
          col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), graft.ops.Util.roundTo(col("jaccard"), 4).as("jaccard"))
      time("stage: +filter+round")(filtered.queryExecution.toRdd.count())
      time("stage: +orderBy")(filtered.orderBy("id_a", "id_b").queryExecution.toRdd.count())
      val jac = col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common"))
      time("variant: filter only")(
        withSizes.filter(jac >= 0.5).queryExecution.toRdd.count())
      time("variant: round only")(
        withSizes.select(graft.ops.Util.roundTo(jac, 4).as("j")).queryExecution.toRdd.count())
      time("variant: filter common>=2")(
        withSizes.filter(col("common") >= 2).queryExecution.toRdd.count())
      time("variant: jac as col + filter")(
        withSizes.withColumn("j", jac).filter(col("j") >= 0.5)
          .queryExecution.toRdd.count())
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/filtered_plan.txt"),
        withSizes.filter(jac >= 0.5).queryExecution.executedPlan.toString)
    }
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
