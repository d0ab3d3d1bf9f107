package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.ops.Util.minuteBucket

/** A/B probe for the events-loader NTZ→TimestampType cast path
  * (io/Tables.scala): the round-7 driver bench flagged
  * q_tumbling_count at 7.35× its pin right after the testdata
  * regenerated with `ts` as TIMESTAMP(MICROS, NTZ), and the final
  * round-7 commit changed the loader to cast NTZ → session-local
  * TimestampType. This probe times the tumbling-count shape three
  * ways, 5 reps each, one JVM:
  *
  *   cast    — the shipped loader path (NTZ cast to TimestampType)
  *   ntz     — the NTZ column used directly (no cast)
  *   nogroup — scan + cast only (no aggregation), to size the scan
  *
  * If `cast` ≈ `ntz`, the loader is exonerated and the r7 flag was
  * data-shape + regime noise; re-pin with medians.
  */
object TsLoaderProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def raw = spark.read.parquet(s"$dir/events.parquet")
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(minuteBucket(col("ts")).as("minute"), col("event_type"))
      .agg(count(lit(1)).as("access_count"))
      .orderBy("minute", "event_type")

    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "cast" -> (() => agg(raw.withColumn("ts", col("ts").cast(TimestampType)))),
      "ntz" -> (() => agg(raw)),
      "nogroup" -> (() => raw.withColumn("ts", col("ts").cast(TimestampType))
        .select(minuteBucket(col("ts")).as("minute"), col("event_type")))
    )
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    variants.foreach { case (name, mk) =>
      mk().queryExecution.toRdd.count() // warm-up
      spark.sharedState.cacheManager.clearCache(); System.gc()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache(); System.gc()
        s
      }
      println(f"$name%-8s median ${median(ts)}%.3f s  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
