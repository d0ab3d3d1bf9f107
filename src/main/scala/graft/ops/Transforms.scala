package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.schemas.Schemas
import Util._

/** Row transforms T1–T7 (SURVEY.md §2.2): parse / filter / enrich /
  * derive / sample / serialize.
  *
  * Each transform is a pure `DataFrame => DataFrame` so the batch
  * queries (checked against the DuckDB oracle) and the Structured
  * Streaming pipeline ([[graft.stream.EngagementPipeline]]) share the
  * exact same column expressions (SURVEY.md §7.0).
  *
  * Reference-shaped forms (Debezium envelope, content dim) take schema
  * from [[Schemas]]; the declared queries run the same operators over
  * the driver testdata shapes (FIXTURES.md §B).
  */
object Transforms {

  // ------------------------------------------------------------------
  // Reference-shaped transforms (used by the streaming pipeline + tests)
  // ------------------------------------------------------------------

  /** T1 — JSON parse with drop-on-failure semantics
    * (EngagementProcessor.scala:21-37): PERMISSIVE `from_json` yields a
    * null struct on malformed input; the null-filter reproduces the
    * reference's flatMap-drop. Unknown fields are ignored by from_json,
    * matching `@JsonIgnoreProperties(ignoreUnknown=true)`. */
  def parseEnvelope(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.select(from_json(col(jsonCol).cast("string"), Schemas.debeziumEnvelope).as("env"))
      .filter(col("env.payload").isNotNull)
      .select(col("env.payload.*"))

  /** T2 — CDC-op predicate: keep snapshot reads + inserts only
    * (EngagementProcessor.scala:107). `keepMutations = true` is the
    * beyond-reference opt-in that also admits updates/deletes for
    * replay into an upserted warehouse ([[graft.ops.Cdc]],
    * [[graft.stream.CdcReplay]]) — still dropping rows whose op is
    * outside the CDC alphabet (malformed envelopes). */
  def filterOps(df: DataFrame, keepMutations: Boolean = false): DataFrame =
    if (keepMutations) df.filter(col("__op").isin("r", "c", "u", "d"))
    else df.filter(col("__op").isin("r", "c"))

  /** T3 — dimension enrichment: broadcast LEFT join, the engine-native
    * form of the reference's replicated in-JVM hash cache
    * (EngagementProcessor.scala:72-99, README.md:30-38). Dim misses keep
    * the row with null dim columns (§1.4). */
  def enrich(events: DataFrame, contentDim: DataFrame): DataFrame =
    events.join(
      broadcast(contentDim.select(
        col("id").as("content_dim_id"),
        col("content_type"),
        col("length_seconds"))),
      events("content_id") === col("content_dim_id"), "left")
      .drop("content_dim_id")

  /** T4 — derived metric columns (EngagementProcessor.scala:109-116):
    * engagement_seconds = duration_ms/1000; engagement_pct only when
    * duration, dim row, and length>0 are all present (null otherwise —
    * null-preserving arithmetic gives the for-comprehension semantics
    * for free). Rounding matches `Math.round(x*100)/100.0`. */
  def deriveMetrics(df: DataFrame): DataFrame =
    df.withColumn("engagement_seconds", col("duration_ms") / 1000.0)
      .withColumn("engagement_pct",
        when(col("duration_ms").isNotNull && col("length_seconds") > 0,
          roundTo(col("duration_ms") / 1000.0 / col("length_seconds") * 100.0, 2)))

  /** T5 — deterministic Bernoulli-style sample (rate per cent). The
    * reference uses `Random.nextInt(100) < rate`
    * (EngagementProcessor.scala:187-188); a keyed modulus keeps the same
    * selectivity while being oracle-reproducible (SURVEY.md §7.4-6). */
  def sampleDet(df: DataFrame, idCol: String, ratePct: Int): DataFrame =
    df.filter(pmod(col(idCol), lit(100)) < ratePct)

  // ------------------------------------------------------------------
  // Declared queries over driver testdata (events/customer analogs)
  // ------------------------------------------------------------------

  /** Testdata analog of the enrichment join: events.user_id → customer
    * (c_mktsegment plays content_type, c_acctbal plays length_seconds). */
  def enrichedEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cust = Tables.dim(spark, dir, "customer", "c_custkey", "c_mktsegment", "c_acctbal")
    ev.join(broadcast(cust), ev("user_id") === cust("c_custkey"), "left")
  }

  /** T4 analog on testdata: seconds + pct with the reference's null
    * semantics ('click' plays the no-duration event class; §1.4). */
  def derivedEvents(spark: SparkSession, dir: String): DataFrame =
    enrichedEvents(spark, dir)
      .withColumn("eng_seconds", col("value") / 1000.0)
      .withColumn("eng_pct",
        when(col("event_type") =!= "click" && col("c_acctbal") > 0,
          roundTo(col("value") / col("c_acctbal") * 100.0, 2)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T1: JSON field extraction from the props payload blob.
    // The projection is deliberately placed ABOVE the range shuffle
    // (repartitionByRange + sortWithinPartitions ≡ orderBy's physical
    // plan, but the optimizer keeps a post-sort select there): under a
    // plain orderBy the range-partitioner's sampling pass re-executes
    // the whole child, evaluating get_json_object twice per row — and
    // the pre-shuffle side runs at the scan's parallelism (a single
    // task when the table is one parquet file), while the post-shuffle
    // side always runs at spark.sql.shuffle.partitions. Measured 4.2×
    // (0.92 s → 0.22 s at sf0.1; PERF.md round-4 log).
    // The partition count is pinned explicitly (an AQE-coalescible
    // default-count exchange gets merged back to ~1 partition on
    // small-byte shuffles, re-serializing the JSON work — measured
    // 0.8 s vs 0.22 s).
    "q_json_parse" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("props"))
        .repartitionByRange(s.sessionState.conf.numShufflePartitions, col("event_id"))
        .sortWithinPartitions("event_id")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))),

    // T2: predicate filter (CDC-op analog: keep two of five event classes).
    "q_filter_ops" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type").isin("view", "click"))
        .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
        .orderBy("event_id")),

    // T3: broadcast LEFT dim join.
    "q_enrich_join" -> ((s, dir) =>
      enrichedEvents(s, dir)
        .select(col("event_id"), col("user_id"), col("c_mktsegment"), col("c_acctbal"))
        .orderBy("event_id")),

    // T4: derived metric projection with null semantics.
    "q_derive_metrics" -> ((s, dir) =>
      derivedEvents(s, dir)
        .select(col("event_id"), col("event_type"), col("eng_seconds"), col("eng_pct"))
        .orderBy("event_id")),

    // T5: deterministic 1% sample.
    "q_sample_det" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(pmod(col("event_id"), lit(100)) < 1)
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy("event_id")),

    // T1 error path: drop-on-malformed semantics, oracle-checked.
    // Deterministically corrupt every 7th props payload (truncate the
    // closing brace) and show parse-failure routing: corrupt rows keep
    // flowing with a null parse (reference drops at flatMap; counting
    // both sides makes the conservation visible).
    "q_json_corrupt" -> ((s, dir) => {
      val broken = Tables.events(s, dir)
        .withColumn("payload",
          when(pmod(col("event_id"), lit(7)) === 0,
            substring(col("props"), 1, 4))  // "{\"k:" — invalid JSON
            .otherwise(col("props")))
        .withColumn("parsed", from_json(col("payload"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))))
      // PERMISSIVE from_json yields an all-null struct (not a null
      // struct) on malformed input — detect failure via the field,
      // which every valid payload populates
      broken.agg(
        count(lit(1)).as("n_total"),
        count(when(col("parsed.k").isNull, 1)).as("n_corrupt"),
        sum(col("parsed.k")).as("sum_k_valid"))
    }),

    // T6/T7: per-sink serialization projection — second-truncated
    // timestamp, fixed-format metric, pipe-joined line. The metric is
    // roundTo'd BEFORE formatting: Java's %.2f rounds ties HALF_UP
    // while DuckDB's printf rounds half-to-even (0.125 → "0.13" vs
    // "0.12"), so formatting the raw double diverges on exactly-
    // representable ties; a pre-rounded value never presents the
    // formatter with a tie.
    // Same post-shuffle projection placement as q_json_parse: the
    // format/concat work runs once per row at shuffle parallelism
    // instead of twice in the (single-task) scan stage.
    "q_serialize" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("user_id"),
          col("ts"), col("value"))
        .repartitionByRange(s.sessionState.conf.numShufflePartitions, col("event_id"))
        .sortWithinPartitions("event_id")
        .select(col("event_id"),
          concat_ws("|",
            col("event_id"), col("event_type"), col("user_id"),
            secondString(col("ts")),
            format_string("%.2f", roundTo(col("value"), 2))).as("line")))
  )

  val oracle: Map[String, String] = Map(
    "q_json_parse" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q_filter_ops" ->
      """SELECT event_id, event_type, user_id, value FROM events
        |WHERE event_type IN ('view','click') ORDER BY event_id""".stripMargin,

    "q_enrich_join" ->
      """SELECT e.event_id, e.user_id, c.c_mktsegment, c.c_acctbal
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,

    "q_derive_metrics" ->
      s"""SELECT e.event_id, e.event_type, e.value / 1000.0 AS eng_seconds,
         |  CASE WHEN e.event_type <> 'click' AND c.c_acctbal > 0
         |       THEN ${roundToSql("e.value / c.c_acctbal * 100.0", 2)} END AS eng_pct
         |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         |ORDER BY e.event_id""".stripMargin,

    "q_sample_det" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE event_id % 100 < 1 ORDER BY event_id""".stripMargin,

    "q_json_corrupt" ->
      """WITH b AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 7 = 0 THEN substr(props, 1, 4) ELSE props END AS payload
        |  FROM events)
        |SELECT count(*) AS n_total,
        |  count(*) FILTER (WHERE NOT json_valid(payload)) AS n_corrupt,
        |  CAST(sum(CASE WHEN json_valid(payload)
        |      THEN CAST(json_extract_string(payload, '$.k') AS BIGINT) END) AS BIGINT)
        |    AS sum_k_valid
        |FROM b""".stripMargin,

    "q_serialize" ->
      s"""SELECT event_id,
         |  concat_ws('|', CAST(event_id AS VARCHAR), event_type,
         |    CAST(user_id AS VARCHAR), ${secondStringSql("ts")},
         |    printf('%.2f', ${roundToSql("value", 2)})) AS line
         |FROM events ORDER BY event_id""".stripMargin
  )
}
