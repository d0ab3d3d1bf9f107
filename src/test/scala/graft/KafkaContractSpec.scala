package graft

import graft.stream.EngagementPipeline

/** S1 option-surface contract (VERDICT r10 #6). Live Kafka is
  * environment-blocked (no spark-sql-kafka / kafka-clients jar on the
  * box, offline resolver — NOTES_r10 §5), so this pins everything that
  * remains pinnable without a broker:
  *
  *  1. `kafkaConsumerOptions` matches the reference's consumer config
  *     key-for-key (EngagementProcessor.scala:154-168 reads its fetch
  *     tuning from .env:14-17; topic at :164; earliest reset at :157+
  *     `setStartFromEarliest` :169).
  *  2. `kafkaSource` on a connector-less classpath fails fast with an
  *     actionable error naming the missing artifact and the file-source
  *     fallback, not Spark's generic DATA_SOURCE_NOT_FOUND.
  */
class KafkaContractSpec extends SparkSpec {

  test("consumer option map matches the reference config 1:1") {
    val opts = EngagementPipeline.kafkaConsumerOptions("broker:9092")
    // the reference's topic (Debezium server.schema.table route)
    assert(opts("subscribe") == "streaming.public.engagement_events")
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    // auto.offset.reset=earliest + setStartFromEarliest
    assert(opts("startingOffsets") == "earliest")
    // .env:14-17 fetch tuning, carried verbatim under Spark's kafka. prefix
    assert(opts("kafka.fetch.min.bytes") == "1048576")
    assert(opts("kafka.fetch.max.wait.ms") == "500")
    assert(opts("kafka.max.partition.fetch.bytes") == "2097152")
    assert(opts("kafka.receive.buffer.bytes") == "1048576")
    // Spark-side backpressure (the reference's batch-size analog)
    assert(opts("maxOffsetsPerTrigger") == "100000")
    // exactly this surface — no unreviewed options sneak in
    assert(opts.keySet == Set(
      "kafka.bootstrap.servers", "subscribe", "startingOffsets",
      "maxOffsetsPerTrigger", "kafka.fetch.min.bytes",
      "kafka.fetch.max.wait.ms", "kafka.max.partition.fetch.bytes",
      "kafka.receive.buffer.bytes"))
  }

  test("topic and trigger knobs flow through to the option map") {
    val opts = EngagementPipeline.kafkaConsumerOptions(
      "other:9092", topic = "t2", maxOffsetsPerTrigger = 5000L)
    assert(opts("subscribe") == "t2")
    assert(opts("maxOffsetsPerTrigger") == "5000")
  }

  test("missing connector fails fast with an actionable error") {
    // this box has no kafka connector jar (NOTES_r10 §5) — the call
    // must not surface Spark's bare DATA_SOURCE_NOT_FOUND
    val e = intercept[IllegalStateException] {
      EngagementPipeline.kafkaSource(spark, "broker:9092")
    }
    assert(e.getMessage.contains("spark-sql-kafka-0-10"))
    assert(e.getMessage.contains("fileSource"))
    assert(e.getCause != null) // original Spark error preserved
  }
}
