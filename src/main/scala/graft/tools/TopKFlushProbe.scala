package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure-first probe for VERDICT r4 "next round" #7: would running
  * the bounded-state [[graft.functions.TopKByScore]] aggregate inside
  * the streaming flush beat the current rank spelling
  * (`orderBy(avg desc, type).limit(5)`, which Spark executes as
  * TakeOrderedAndProject — itself partial: each partition forwards at
  * most 5 rows)?
  *
  * Runs the EXACT flush-path shape (the A5 ratio-of-sums aggregation
  * feeding a top-5) both ways over a synthetic minutes store at
  * several type cardinalities — 4 (the production envelope), 10⁴ and
  * 10⁶ (the hypothetical high-cardinality tenant) — and prints
  * medians. PERF.md records the adopt/reject decision.
  *
  * Usage: sbt "runMain graft.tools.TopKFlushProbe [iters]"
  */
object TopKFlushProbe {

  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(21)
    val spark = SparkSession.builder().master("local[16]")
      .appName("topk-flush-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def minutesStore(nTypes: Long): DataFrame =
      spark.range(nTypes * 10).select(
        (col("id") % 10).as("m"),
        concat(lit("type"), (col("id") / 10)).as("event_type"),
        (pmod(col("id") * 2654435761L, lit(1000)) + 1).as("access_count"),
        (pmod(col("id") * 40503L, lit(100000)).cast("double") / 100).as("sum_value"))

    // the A5 aggregation both forms share
    def aggregated(minutes: DataFrame): DataFrame =
      minutes.groupBy(col("event_type"))
        .agg(sum(col("access_count")).as("access_count"),
          sum(col("sum_value").cast("decimal(28,6)")).cast("double").as("sum_pct"))
        .withColumn("avg_engagement",
          coalesce(col("sum_pct"), lit(0.0)) / greatest(col("access_count"), lit(1L)))

    def rankForm(minutes: DataFrame): Array[_] =
      aggregated(minutes)
        .orderBy(col("avg_engagement").desc, col("event_type").asc)
        .limit(5).collect()

    def aggForm(minutes: DataFrame): Array[_] =
      aggregated(minutes)
        .agg(graft.functions.topk_by_score(
          col("avg_engagement"), col("event_type"), 5).as("topk"))
        .select(explode(col("topk"))).collect()

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val out = Seq(4L, 10000L, 1000000L).map { nTypes =>
      val minutes = minutesStore(nTypes)
        .repartition(16).persist()
      minutes.count() // materialize outside the timed region
      rankForm(minutes); aggForm(minutes) // warm-up
      val rank = median((1 to iters).map(_ => time(rankForm(minutes))))
      val agg = median((1 to iters).map(_ => time(aggForm(minutes))))
      minutes.unpersist()
      println(f"nTypes=$nTypes%-8d rank=${rank}%.4f s  topk_agg=${agg}%.4f s  " +
        f"ratio=${agg / rank}%.2f")
      s"""{"n_types":$nTypes,"rank_sec":${f"$rank%.4f"},"topk_agg_sec":${f"$agg%.4f"}}"""
    }
    println(s"""{"metric":"topk_flush","iters":$iters,"cases":[${out.mkString(",")}]}""")
    spark.stop()
  }
}
