package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.EngagementPipeline

/** End-to-end Structured Streaming pipeline on MemoryStream fixtures:
  * the reference's dataflow (parse → filter → enrich → derive →
  * window agg → fan-out) driven synchronously (SURVEY.md §5-streaming). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def env(id: Long, contentId: String, eventType: String,
      durationMs: Option[Int], op: String, minute: Int): String = {
    val dur = durationMs.map(_.toString).getOrElse("null")
    f"""{"payload": {"id": $id, "content_id": "$contentId", "user_id": "u$id", "event_type": "$eventType", "event_ts": "2024-01-01T00:$minute%02d:10Z", "duration_ms": $dur, "device": "ios", "raw_payload": "{}", "__op": "$op", "__table": "engagement_events", "__db": "streaming_db", "__ts_ms": 1704067200000}}"""
  }

  private lazy val contentDim = Seq(
    ("c1", "s1", "t", "video", Some(600), "2023-01-01T00:00:00Z"),
    ("c2", "s2", "t", "podcast", Some(1200), "2023-01-01T00:00:00Z")
  ).toDF("id", "slug", "title", "content_type", "length_seconds", "publish_ts")

  test("streaming windowed agg matches batch semantics incl. dim-miss routing") {
    val input = MemoryStream[String]
    val q = EngagementPipeline.startAggToMemory(
      input.toDF().withColumnRenamed("value", "value"), contentDim, "agg_out")
    try {
      input.addData(
        env(1, "c1", "play", Some(30000), "c", 0),   // video, 5.0 pct
        env(2, "c1", "play", Some(60000), "c", 0),   // video, 10.0 pct
        env(3, "c2", "click", None, "c", 0),          // podcast, null pct
        env(4, "cMISS", "play", Some(1000), "c", 0),  // unknown bucket
        env(5, "c1", "play", Some(30000), "u", 0),    // dropped: op=u
        env(6, "c1", "play", Some(6000), "c", 1))     // minute 1
      q.processAllAvailable()
      val out = spark.table("agg_out")
        .select(date_format($"window.start", "HH:mm").as("m"),
          $"content_type", $"access_count", $"sum_pct")
        .as[(String, String, Long, Option[Double])].collect().toSet
      assert(out === Set(
        ("00:00", "video", 2L, Some(15.0)),
        ("00:00", "podcast", 1L, None),
        ("00:00", "unknown", 1L, None),
        ("00:01", "video", 1L, Some(1.0))))
    } finally q.stop()
  }

  test("fan-out writes warehouse, daily-partitioned search, and top-K analytics") {
    val root = java.nio.file.Files.createTempDirectory("graft_fanout").toString
    val input = MemoryStream[String]
    val q = EngagementPipeline.start(
      input.toDF(), contentDim, root, s"$root/ckpt", triggerMs = 100L)
    try {
      input.addData(
        env(1, "c1", "play", Some(30000), "c", 0),
        env(2, "c2", "play", Some(120000), "c", 0),
        env(3, "cMISS", "click", None, "c", 0))
      q.processAllAvailable()
      val wh = spark.read.parquet(s"$root/warehouse")
      assert(wh.count() === 3)
      val search = spark.read.parquet(s"$root/search")
      assert(search.count() === 3)
      assert(search.columns.contains("event_date"))
      // daily partition dirs exist (K4 daily-roll analog)
      val partDirs = new java.io.File(s"$root/search").listFiles()
        .filter(_.getName.startsWith("event_date="))
      assert(partDirs.nonEmpty)
      val topk = spark.read.parquet(s"$root/analytics")
      val top = topk.orderBy($"avg_engagement".desc).head()
      assert(top.getAs[String]("content_type") === "podcast") // 10% beats 5%
      assert(topk.filter($"content_type" === "unknown").count() === 1)
    } finally q.stop()
  }

  test("watermark bounds state: events later than 15 min behind max are dropped") {
    val input = MemoryStream[String]
    val agg = EngagementPipeline.windowedAgg(
      EngagementPipeline.transform(input.toDF(), contentDim))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    try {
      // batch 1: events at minute 0 and minute 30 -> watermark = 30-15 = 15
      input.addData(env(1, "c1", "play", Some(30000), "c", 0),
        env(2, "c1", "play", Some(30000), "c", 30))
      q.processAllAvailable()
      // batch 2: a late event at minute 5 (< watermark) must be dropped;
      // one at minute 31 is accepted
      input.addData(env(3, "c1", "play", Some(30000), "c", 5),
        env(4, "c1", "play", Some(30000), "c", 31))
      q.processAllAvailable()
      // batch 3: advance watermark far enough to close all windows
      input.addData(env(5, "c1", "play", Some(30000), "c", 59))
      q.processAllAvailable()
      val out = spark.table("wm_out")
        .select(date_format($"window.start", "mm").as("m"), $"access_count")
        .as[(String, Long)].collect().toMap
      assert(out.get("00").contains(1L), s"got $out")  // late row NOT added
      assert(out.get("30").contains(1L))
      assert(out.get("31").contains(1L))
    } finally q.stop()
  }

  test("console monitor samples deterministically; progress metrics surface") {
    val input = MemoryStream[String]
    val q = EngagementPipeline.consoleMonitor(input.toDF(), contentDim, ratePct = 50)
    try {
      input.addData((1 to 20).map(i =>
        env(i, "c1", "play", Some(10000), "c", 0)): _*)
      q.processAllAvailable()
      val prog = EngagementPipeline.progressSummary(q)
      assert(prog.nonEmpty)
      assert(prog.get._1 >= 0L) // batchId
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer closes sessions on gap and timeout") {
    val input = MemoryStream[String]
    val sessions = EngagementPipeline.sessionize(
      EngagementPipeline.transform(input.toDF(), contentDim), gapMs = 300000L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // user u1: events at minute 0,2 then a gap to minute 20 (>5 min)
      // -> first session closes when the second one arrives
      input.addData(
        env(1, "c1", "play", Some(1000), "c", 0).replace("\"user_id\": \"u1\"", "\"user_id\": \"alice\"").replace("u1", "alice"),
        env(2, "c1", "play", Some(1000), "c", 2).replace("u2", "alice"),
        env(3, "c1", "play", Some(1000), "c", 20).replace("u3", "alice"),
        env(4, "c1", "play", Some(1000), "c", 59))  // u4: watermark driver
      q.processAllAvailable()
      // push watermark far forward so open sessions time out
      input.addData(env(5, "c1", "play", Some(1000), "c", 59)
        .replace("00:59", "23:59"))
      q.processAllAvailable()
      val out = spark.table("sess_out")
        .as[EngagementPipeline.UserSession].collect()
        .filter(_.user_id == "alice").sortBy(_.first_ms)
      assert(out.length === 2, s"got ${out.toSeq}")
      assert(out(0).n_events === 2 && out(0).duration_ms === 120000L)
      assert(out(1).n_events === 1 && out(1).duration_ms === 0L)
    } finally q.stop()
  }

  test("streaming dedup drops redelivered event ids within the watermark") {
    val input = MemoryStream[String]
    val deduped = EngagementPipeline.dedupeEvents(
      EngagementPipeline.transform(input.toDF(), contentDim))
    val q = deduped.select($"id").writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      input.addData(env(1, "c1", "play", Some(1000), "c", 0),
        env(2, "c1", "play", Some(1000), "c", 1))
      q.processAllAvailable()
      // redeliver id=1 (same content), plus a fresh id=3
      input.addData(env(1, "c1", "play", Some(1000), "c", 0),
        env(3, "c1", "play", Some(1000), "c", 2))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").as[Long].collect().sorted.toSeq
      assert(ids === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("restart from checkpoint does not duplicate warehouse rows") {
    val root = java.nio.file.Files.createTempDirectory("graft_replay").toString
    val input = MemoryStream[String]
    val q1 = EngagementPipeline.start(
      input.toDF(), contentDim, root, s"$root/ckpt", triggerMs = 100L)
    input.addData(env(1, "c1", "play", Some(30000), "c", 0))
    q1.processAllAvailable(); q1.stop()
    val n1 = spark.read.parquet(s"$root/warehouse").count()
    // restart on the same checkpoint; add one more event
    val q2 = EngagementPipeline.start(
      input.toDF(), contentDim, root, s"$root/ckpt", triggerMs = 100L)
    try {
      input.addData(env(2, "c1", "play", Some(30000), "c", 1))
      q2.processAllAvailable()
      val n2 = spark.read.parquet(s"$root/warehouse").count()
      assert(n1 === 1L && n2 === 2L) // no replay duplication
    } finally q2.stop()
  }
}
