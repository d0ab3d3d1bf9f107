package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Aggregates
import graft.io.Tables

object ProfMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    time("warmup-count") { Tables.events(spark, dir).count() }
    val ma = Aggregates.minuteAgg(Tables.events(spark, dir))
    time("minuteAgg") { ma.queryExecution.toRdd.count() }
    time("minuteAgg-2nd") { ma.queryExecution.toRdd.count() }
    val sl = Aggregates.sliding10m(ma)
    time("sliding-nosort") { sl.queryExecution.toRdd.count() }
    val full = sl.select(col("minute"), col("event_type"), col("access_count"),
      col("count_10m"), col("sum_10m")).orderBy("minute", "event_type")
    time("full-q_sliding_10m") { full.queryExecution.toRdd.count() }
    time("full-2nd") { full.queryExecution.toRdd.count() }
    println(full.queryExecution.executedPlan.toString.take(5000))
    spark.stop()
  }
}
