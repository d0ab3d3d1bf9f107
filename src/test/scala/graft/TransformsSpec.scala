package graft

import org.apache.spark.sql.functions._
import graft.ops.{Transforms, Util}

/** Reference-shaped transform semantics (SURVEY.md §1.4 null rules,
  * §2.2 T1–T5) on hand-built fixtures (FIXTURES.md §A). */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def env(id: Long, contentId: String, eventType: String,
      durationMs: Option[Int], op: String): String = {
    val dur = durationMs.map(_.toString).getOrElse("null")
    s"""{"payload": {"id": $id, "content_id": "$contentId", "user_id": "u$id",
       |"event_type": "$eventType", "event_ts": "2024-01-01T00:0$id:00Z",
       |"duration_ms": $dur, "device": "ios",
       |"raw_payload": "{}", "__op": "$op", "__table": "engagement_events",
       |"__db": "streaming_db", "__ts_ms": 1704067200000}}""".stripMargin.replace("\n", " ")
  }

  private lazy val contentDim = Seq(
    ("c1", "slug1", "t", "video", Some(600), "2023-01-01T00:00:00Z"),
    ("c2", "slug2", "t", "newsletter", None, "2023-01-01T00:00:00Z"),
    ("c3", "slug3", "t", "article", Some(0), "2023-01-01T00:00:00Z")
  ).toDF("id", "slug", "title", "content_type", "length_seconds", "publish_ts")

  test("T1 parse drops malformed JSON, ignores unknown fields") {
    val raw = Seq(
      env(1, "c1", "play", Some(30000), "c"),
      "not json at all {{{",
      """{"payload": {"id": 9, "content_id": "c1", "user_id": "u9",
        |"event_type": "play", "event_ts": "2024-01-01T00:09:00Z",
        |"duration_ms": 1000, "device": "web", "raw_payload": "{}",
        |"__op": "c", "__table": "t", "__db": "d", "__ts_ms": 1,
        |"surprise_extra_field": 42}}""".stripMargin.replace("\n", " ")
    ).toDF("value")
    val parsed = Transforms.parseEnvelope(raw)
    assert(parsed.count() === 2)
    assert(parsed.filter($"id" === 9).count() === 1)
  }

  test("T2 keeps only r|c ops") {
    val raw = Seq(
      env(1, "c1", "play", Some(1000), "c"),
      env(2, "c1", "play", Some(1000), "r"),
      env(3, "c1", "play", Some(1000), "u"),
      env(4, "c1", "play", Some(1000), "d")).toDF("value")
    val ops = Transforms.filterOps(Transforms.parseEnvelope(raw))
      .select("id").as[Long].collect().sorted
    assert(ops.toSeq === Seq(1L, 2L))
  }

  test("T3 dim miss keeps row with null content_type") {
    val raw = Seq(
      env(1, "c1", "play", Some(1000), "c"),
      env(2, "cMISSING", "play", Some(1000), "c")).toDF("value")
    val enriched = Transforms.enrich(Transforms.parseEnvelope(raw), contentDim)
    assert(enriched.count() === 2)
    val miss = enriched.filter($"id" === 2).head()
    assert(miss.isNullAt(miss.fieldIndex("content_type")))
    assert(enriched.filter($"id" === 1).head()
      .getAs[String]("content_type") === "video")
  }

  test("T4 engagement_pct null rules: click, dim miss, zero length") {
    val raw = Seq(
      env(1, "c1", "play", Some(30000), "c"),   // 30s of 600s = 5.0 pct
      env(2, "c1", "click", None, "c"),          // no duration -> null pct
      env(3, "cMISSING", "play", Some(1000), "c"), // dim miss -> null pct
      env(4, "c2", "play", Some(1000), "c"),     // null length -> null pct
      env(5, "c3", "play", Some(1000), "c")      // zero length -> null pct
    ).toDF("value")
    val d = Transforms.deriveMetrics(
      Transforms.enrich(Transforms.parseEnvelope(raw), contentDim))
    val byId = d.select($"id", $"engagement_seconds", $"engagement_pct")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
         Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(byId(1L) === (Some(30.0), Some(5.0)))
    assert(byId(2L) === (None, None))         // click: null but row kept
    assert(byId(3L) === (Some(1.0), None))    // miss: seconds survive
    assert(byId(4L) === (Some(1.0), None))
    assert(byId(5L) === (Some(1.0), None))
    assert(d.count() === 5)                   // every row kept
  }

  test("T4 rounding matches Math.round(x*100)/100 semantics") {
    // 123456 ms of 1000 s -> 12.3456% -> 12.35
    val raw = Seq(env(1, "c1", "play", Some(123456), "c")).toDF("value")
    val dim = Seq(("c1", "s", "t", "video", Some(1000), "2023-01-01T00:00:00Z"))
      .toDF("id", "slug", "title", "content_type", "length_seconds", "publish_ts")
    val d = Transforms.deriveMetrics(
      Transforms.enrich(Transforms.parseEnvelope(raw), dim))
    assert(d.head().getAs[Double]("engagement_pct") === 12.35)
  }

  test("T5 deterministic sample selects exactly ids % 100 < rate") {
    val df = (0L until 1000L).toDF("event_id")
    val sampled = Transforms.sampleDet(df, "event_id", 3)
    assert(sampled.count() === 30)
    assert(sampled.filter(pmod($"event_id", lit(100)) >= 3).count() === 0)
  }

  test("roundTo is half-up at representable boundaries") {
    val df = Seq(2.005, 2.004999, 12.3456, 0.0).toDF("x")
      .select(Util.roundTo($"x", 2).as("r")).as[Double].collect()
    assert(df.toSeq === Seq(2.01, 2.0, 12.35, 0.0))
  }
}
