package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques the 100 TB deployment reaches for when AQE alone
  * isn't enough: key salting for skewed joins, bucketed tables for
  * co-located (shuffle-free) fact-fact joins.
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin) is the first
  * line of defense and needs no code. Salting is the explicit form for
  * aggregations and for joins AQE can't split (e.g. under
  * stream-static constraints): the hot side spreads each key across
  * `saltBuckets` partitions, the small side replicates each row
  * `saltBuckets` times.
  */
object Scale {

  /** Skew-proof LEFT join of a (possibly hot-keyed) fact against a
    * smaller dim: fact rows get a deterministic salt from a stable id
    * column, dim rows are exploded once per salt value. Result equals
    * `fact.join(dim, keys, "left")` row-for-row.
    *
    * `broadcastDim = true` (default) hints the exploded dim broadcast —
    * for dims that fit an executor, skew then cannot arise at all (no
    * shuffle of the fact). Set it false for dims too big to broadcast:
    * the join becomes a shuffle join partitioned on (key, salt), which
    * is where the salt earns its keep — a hub key's rows spread over
    * `saltBuckets` reducers instead of landing on one straggler.
    * (AQE's skew split covers sort-merge joins it can see; the salted
    * form is for the cases it can't touch — stream-static joins, and
    * aggregation-fed joins where the skew is introduced upstream of
    * the shuffle AQE would split.) */
  def saltedLeftJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltIdCol: String, saltBuckets: Int,
      broadcastDim: Boolean = true): DataFrame = {
    // coalesce: a NULL salt id would null the salt, and NULL never
    // equals any exploded dim salt — silently dropping dim matches a
    // plain left join would have made
    val salted = fact.withColumn("__salt",
      pmod(coalesce(col(saltIdCol), lit(0L)), lit(saltBuckets)).cast("int"))
    val dimExp0 = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    // broadcastDim = false models a dim ABOVE the broadcast threshold;
    // the merge hint pins that plan even when the test-scale dim is
    // small enough that the optimizer would auto-broadcast it (a
    // broadcast join cannot skew, so it would make the salt dead code)
    val dimExp = if (broadcastDim) broadcast(dimExp0) else dimExp0.hint("merge")
    salted.join(dimExp,
        salted(factKey) === dimExp0(dimKey) &&
          salted("__salt") === dimExp0("__salt"), "left")
      .drop("__salt")
  }

  /** Two-phase (salted) aggregation for hot grouping keys: partial
    * aggregate on (key, salt), then final merge on key. Equivalent to
    * `df.groupBy(key).agg(count, sum)` but no single reducer ever sees
    * a whole hot key. */
  // NULL salt ids need a guard like saltedLeftJoin's: a NULL salt
  // groups all of a key's null-id rows onto one reducer — exactly the
  // straggler the salt exists to prevent. Unlike the join (where the
  // salt must equal an exploded dim value, so nulls pin to one
  // bucket), ANY salt is correct for aggregation — the final pass
  // re-merges on the bare key — so NULL ids spread by input partition
  // instead of collapsing onto bucket 0.
  private[graft] def aggSaltExpr(saltIdCol: String, saltBuckets: Int) =
    coalesce(pmod(col(saltIdCol), lit(saltBuckets)),
      pmod(spark_partition_id().cast("long"), lit(saltBuckets)))

  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      saltIdCol: String, saltBuckets: Int): DataFrame =
    df.withColumn("__salt", aggSaltExpr(saltIdCol, saltBuckets))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,6)")).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).cast("double").as("sum_value"))

  /** Write a table bucketed+sorted by its join key: two tables bucketed
    * the same way join with ZERO shuffle (SortMergeJoin reads co-located
    * buckets). The 100 TB answer for recurring fact-fact joins. */
  def writeBucketed(df: DataFrame, name: String, bucketCol: String,
      nBuckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(name)
}
