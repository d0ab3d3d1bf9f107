package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared expression helpers whose ONLY job is cross-engine determinism:
  * every declared query must hash-match a DuckDB oracle on identical
  * parquet inputs (SURVEY.md §5, §7.4-risk-3), and these close the three
  * classic divergence holes (float sum order, rounding mode, timestamp
  * precision).
  */
object Util {

  /** Order-independent exact sum of a double column.
    *
    * `sum(double)` is non-deterministic at shuffle granularity (IEEE
    * addition is not associative; partial-aggregate merge order varies
    * run to run and engine to engine). Casting each value to
    * DECIMAL(18,6) first makes the sum exact and order-independent; the
    * final cast back to double is a single well-defined conversion.
    * Oracle spelling: `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** SQL text of [[dsum]] for oracle queries. */
  def dsumSql(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE)"

  /** 19-digit zero-padded key encode for Long ids flowing through
    * `topk_by_score` buffers — the full-Long-range pad (an 8-digit
    * pad corrupts ids ≥ 1e8 at exactly corpus scale) with the
    * NON-NEGATIVE contract enforced at the encode: a negative id
    * zero-pads to '00…0-5', breaking lexicographic-equals-numeric
    * ordering and casting back to NULL on the way out, so every pad
    * site shares this one guarded spelling instead of failing with
    * silently wrong ranks (review r10 — previously only bm25Batch
    * guarded). */
  def lpadKey(id: Column): Column =
    lpad(when(id < 0, raise_error(lit(
        "lpadKey: negative id — the 19-digit pad key encoding " +
          "requires non-negative ids")))
      .otherwise(id).cast("string"), 19, "0")

  /** Deterministic round-half-up to `d` decimals via floor arithmetic.
    *
    * Spark's `round` rounds the exact decimal value of the double
    * (BigDecimal HALF_UP) while C-family engines round the scaled
    * float — they disagree on values like 2.675. `floor(x*s + 0.5)/s`
    * is the same IEEE op sequence in any engine, hence bit-identical.
    * Matches the reference's own formulation `Math.round(x*100)/100.0`
    * (EngagementProcessor.scala:113-115).
    */
  def roundTo(c: Column, d: Int): Column = {
    val s = math.pow(10, d)
    floor(c * s + 0.5) / s
  }

  /** SQL text of [[roundTo]] for oracle queries. */
  def roundToSql(x: String, d: Int): String = {
    val s = math.pow(10, d).toLong
    s"FLOOR(($x) * $s + 0.5) / $s"
  }

  /** Event-time minute bucket as a STRING (`yyyy-MM-dd HH:mm`).
    * Strings dodge the parquet ns-vs-µs timestamp precision mismatch
    * between Spark output and the DuckDB oracle.
    * Oracle spelling: `strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M')`. */
  def minuteBucket(ts: Column): Column =
    date_format(date_trunc("minute", ts), "yyyy-MM-dd HH:mm")

  def minuteBucketSql(ts: String): String =
    s"strftime(date_trunc('minute', $ts), '%Y-%m-%d %H:%M')"

  /** Day bucket as STRING (`yyyy-MM-dd`) — the search sink's daily index
    * roll analog (ElasticsearchSink.scala:184-185). */
  def dayBucket(ts: Column): Column =
    date_format(date_trunc("day", ts), "yyyy-MM-dd")

  def dayBucketSql(ts: String): String =
    s"strftime(date_trunc('day', $ts), '%Y-%m-%d')"

  /** Second-granularity timestamp string (sink serialization truncates
    * sub-seconds — BigQuerySink.scala:176-181). */
  def secondString(ts: Column): Column =
    date_format(date_trunc("second", ts), "yyyy-MM-dd HH:mm:ss")

  def secondStringSql(ts: String): String =
    s"strftime(date_trunc('second', $ts), '%Y-%m-%d %H:%M:%S')"
}
