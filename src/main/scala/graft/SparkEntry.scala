package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Aggregates, Cdc, Dsir, Html, QualityModel, Rag, Relational, Retrieval, TextOps, Transforms, Urls, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every declared operator query (one per SURVEY.md
  * §2 inventory row, plus the training-data-pipeline extensions);
  * `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * differential-correctness gate.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.1 milestone-0 slice) on sf0.001:
    * scan → filter → broadcast-enrich → derive → minute agg → 10-min
    * sliding rollup → ratio-avg → top-3. Exercises the whole reference
    * pipeline surface in one Catalyst plan. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val derived = Transforms.derivedEvents(spark, dir)
      .filter(col("event_type").isNotNull)
    val ratio = Aggregates.avgRatio(derived)
    Aggregates.topK(ratio, "avg_engagement", 3)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Transforms.queries ++ Aggregates.queries ++ Relational.queries ++
      TextOps.queries ++ VectorOps.queries ++ Cdc.queries ++ Retrieval.queries ++
      QualityModel.queries ++ Html.queries ++ Dsir.queries ++ Urls.queries ++
      Rag.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Transforms.oracle ++ Aggregates.oracle ++ Relational.oracle ++
      TextOps.oracle ++ VectorOps.oracle ++ Cdc.oracle ++ Retrieval.oracle ++
      QualityModel.oracle ++ Html.oracle ++ Dsir.oracle ++ Urls.oracle ++
      Rag.oracle
}
