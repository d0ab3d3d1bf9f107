package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders over the driver testdata layout
  * (`TESTDATA.md`: one parquet file per table under an sf dir).
  *
  * The reference's sources (SURVEY.md §2.1) map here as:
  *  - S1 Kafka stream scan  → batch analog [[table]](events); streaming
  *    form lives in [[graft.stream.EngagementPipeline]].
  *  - S2 JDBC dim snapshot  → [[dim]] (small table, intended for
  *    `broadcast()` at the join site — the engine-native form of the
  *    reference's in-JVM hash cache, EngagementProcessor.scala:72-99).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has shipped in two physical forms across testdata
    * generations, so the loader adapts on the read schema:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's reader rejects it outright.
    *    Read as raw nanos (legacy conf, set before the scan is planned)
    *    and convert to a microsecond TimestampType column. `div`, not
    *    `/`: long / long promotes to DOUBLE, and epoch nanos (~1.7e18)
    *    exceed double's 2^53 mantissa — the rounding could push a value
    *    sitting within ~256 ns of a second boundary across it and
    *    desynchronize every time bucket from DuckDB's exact integer
    *    truncation.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *    TIMESTAMP_NTZ. Cast to session-local TimestampType — under the
    *    UTC session timezone every query runs with, the wall clock is
    *    preserved bit-for-bit, matching DuckDB's naive-TIMESTAMP read
    *    of the same file.
    *
    * Either way downstream operators see one canonical shape:
    * microsecond TimestampType. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      // Fail fast on a format the adapter has never seen: a silent
      // pass-through (e.g. StringType, or plain INT64 micros that
      // nanosAsLong would make indistinguishable from nanos) would
      // surface only as a downstream oracle mismatch.
      case other => sys.error(s"events.ts: unexpected parquet type $other")
    }
  }
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Dimension-table read: project only needed columns so the parquet
    * scan prunes (reference selects 3 of 6 dim columns,
    * EngagementProcessor.scala:83-85). */
  def dim(spark: SparkSession, sfDir: String, name: String, cols: String*): DataFrame = {
    val t = table(spark, sfDir, name)
    if (cols.isEmpty) t else t.select(cols.head, cols.tail: _*)
  }

  /** S2 — JDBC dimension snapshot (reference: one-shot `SELECT id::text,
    * content_type, length_seconds FROM content` into a driver-side map,
    * EngagementProcessor.scala:72-99). Engine-native form: a pruned JDBC
    * read the caller wraps in `broadcast()` at the join site. `dbtable`
    * as a projection subquery pushes the column pruning into the
    * database. */
  def jdbcDim(spark: SparkSession, url: String, table: String,
      cols: Seq[String], props: Map[String, String] = Map.empty): DataFrame = {
    val projected = s"(SELECT ${cols.mkString(", ")} FROM $table) AS dim_snapshot"
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", projected)
    props.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }.load()
  }
}
