package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** End-to-end streaming throughput measurement — the engine-side
  * analog of the reference's staged stress harness (stress_test.py;
  * stated pipeline target: 2,000 events/s, EngagementProcessor.scala:145).
  *
  * Drives the FULL pipeline (envelope JSON parse → CDC filter →
  * broadcast enrich → derive → windowed agg to memory + 3-way
  * parquet fan-out) from a file-drop source and reports sustained
  * rows/sec as one JSON line. Usage:
  *   sbt "runMain graft.tools.StreamThroughput [nEvents]"
  */
object StreamThroughput {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("graft-stream-throughput")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft_throughput").toString
    val dropDir = s"$root/drop"
    Files.createDirectories(Paths.get(dropDir))

    // pre-generate n envelope lines across 8 files (parallel source reads)
    val contentIds = (0 until 5000).map(i => s"content-$i")
    val files = 8
    val perFile = n / files
    val t0gen = System.nanoTime()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.traverse((0 until files).toList) { f => Future {
      val sb = new StringBuilder(perFile * 260)
      var i = 0
      while (i < perFile) {
        val id = f.toLong * perFile + i
        val ct = contentIds(((id * 2654435761L) % 5000).toInt.abs)
        val et = Seq("play", "pause", "finish", "click")((id % 4).toInt)
        val dur = if (et == "click") "null" else ((id % 600) * 100 + 1000).toString
        val op = if (id % 19 == 0) "u" else "c"
        val min = (id % 60).toInt
        sb.append(s"""{"payload": {"id": $id, "content_id": "$ct", "user_id": "u$id", "event_type": "$et", "event_ts": "2024-01-01T00:${f"$min%02d"}:00Z", "duration_ms": $dur, "device": "ios", "raw_payload": "{}", "__op": "$op", "__table": "engagement_events", "__db": "streaming_db", "__ts_ms": 1704067200000}}""")
        sb.append('\n')
        i += 1
      }
      Files.write(Paths.get(s"$dropDir/batch$f.jsonl"), sb.toString.getBytes("UTF-8"))
    }}, Duration.Inf)
    val genSec = (System.nanoTime() - t0gen) / 1e9

    val contentDim = (0 until 5000).map(i =>
      (s"content-$i", s"slug-$i", "t",
        Seq("video", "podcast", "article", "newsletter")(i % 4),
        if (i % 4 == 3) None else Some(600 + i % 3600),
        "2023-01-01T00:00:00Z"))
      .toDF("id", "slug", "title", "content_type", "length_seconds", "publish_ts")

    val raw = graft.stream.EngagementPipeline.fileSource(spark, dropDir)
    val t0 = System.nanoTime()
    val q = graft.stream.EngagementPipeline.start(
      raw, contentDim, root, s"$root/ckpt", triggerMs = 500L)
    q.processAllAvailable()
    q.stop()
    val sec = (System.nanoTime() - t0) / 1e9

    val processed = spark.read.parquet(s"$root/warehouse").count()
    val expected = (0L until n.toLong).count(_ % 19 != 0)
    val evPerSec = (n / sec).toLong
    println(s"""{"metric":"stream_throughput","events_in":$n,"rows_out":$processed,"expected_rows":$expected,"wall_sec":${f"$sec%.2f"},"events_per_sec":$evPerSec,"gen_sec":${f"$genSec%.2f"},"reference_target_eps":2000}""")
    assert(processed == expected, s"row conservation broken: $processed != $expected")
    spark.stop()
  }
}
