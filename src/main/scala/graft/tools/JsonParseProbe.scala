package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Root-cause probe for the q_json_parse bench drift (VERDICT r3 "What's
  * wrong" #1: 0.87 s → 1.19 s → 1.35 s over three driver rounds, the only
  * regression-flagged query). Runs the query and controlled variants many
  * times in one JVM and prints per-iteration timings + medians, so the
  * hypotheses separate:
  *
  *   asis      — the declared query exactly as Bench runs it
  *                (Tables.events re-sets the nanosAsLong conf per call).
  *   noconf    — identical plan, conf set once outside the loop; isolates
  *                whether the per-call `spark.conf.set` costs anything.
  *   nots      — reads events.parquet directly without the ts
  *                withColumn; isolates whether the unused ts conversion
  *                leaks into the scan (column pruning check).
  *   nosort    — asis minus the orderBy; isolates the sort.
  *   nojson    — asis minus get_json_object (projection only); isolates
  *                the JSON parsing cost.
  *
  * Usage: `sbt "runMain graft.tools.JsonParseProbe [iters]"`.
  */
object JsonParseProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = args.headOption.map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "asis" -> (() => graft.SparkEntry.queries("q_json_parse")(spark, dir)),
      "noconf" -> { () =>
        spark.read.parquet(s"$dir/events.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k_val"))
          .orderBy("event_id")
      },
      "nots" -> { () =>
        spark.read.parquet(s"$dir/events.parquet")
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k_val"))
          .orderBy("event_id")
      },
      "nosort" -> { () =>
        Tables.events(spark, dir)
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k_val"))
      },
      "nojson" -> (() =>
        Tables.events(spark, dir)
          .select(col("event_id"), col("props"))
          .orderBy("event_id")),
      // evaluate json AFTER the range shuffle: sampling pass then only
      // runs the pruned scan; json evaluated once per row, but the
      // shuffle carries the wide props string
      "postproj" -> { () =>
        val sorted = Tables.events(spark, dir)
          .select(col("event_id"), col("props"))
          .repartitionByRange(32, col("event_id"))
          .sortWithinPartitions("event_id")
        sorted.select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
      }
    )

    // conf needed before the first direct parquet read is planned
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // warm-up (JIT + IO cache), discarded
    variants.foreach { case (_, mk) => run(mk()) }

    val meds = variants.map { case (name, mk) =>
      val ts = (1 to iters).map { _ =>
        val s = run(mk())
        spark.sharedState.cacheManager.clearCache()
        System.gc()
        s
      }
      println(f"$name%-8s median ${median(ts)}%.3f s  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
      name -> median(ts)
    }.toMap

    println("\n===== asis formatted plan =====")
    graft.SparkEntry.queries("q_json_parse")(spark, dir).explain("formatted")
    println("\n===== postproj formatted plan =====")
    variants.toMap.apply("postproj")().explain("formatted")
    println("summary " + meds.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.3f" }.mkString(" "))
    spark.stop()
  }
}
