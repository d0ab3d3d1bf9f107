package graft

/** Pure-SQL API surface: a user of the engine can register the tables
  * as views and drive everything through `spark.sql`, including the
  * native functions and the custom aggregate. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("declared-query semantics reachable through spark.sql") {
    graft.functions.registerAll(spark)
    graft.io.Tables.events(spark, sf("sf0.001")).createOrReplaceTempView("events")
    graft.io.Tables.documents(spark, sf("sf0.001")).createOrReplaceTempView("documents")

    // windowed agg + ratio-avg + top-k, all in SQL
    val top = spark.sql(
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY 1 ORDER BY n DESC, event_type LIMIT 3""".stripMargin)
    assert(top.count() === 3)

    // native scalar functions from SQL
    val fn = spark.sql(
      """SELECT doc_id, simhash64(split(lower(text), '\\s+')) AS h
        |FROM documents LIMIT 5""".stripMargin)
    assert(fn.collect().forall(r => r.getLong(1) != 0L))

    // custom TypedImperativeAggregate from SQL
    val agg = spark.sql(
      """SELECT event_type,
        |  topk_by_score(CAST(value AS DOUBLE), CAST(event_id AS STRING), 2) AS top2
        |FROM events GROUP BY 1""".stripMargin)
    val rows = agg.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val arr = r.getSeq[org.apache.spark.sql.Row](1)
      assert(arr.length === 2)
      assert(arr(0).getDouble(0) >= arr(1).getDouble(0))
    }
  }

  test("approx_count_distinct tracks the exact global distinct within HLL++ error") {
    // the approximate sketch can't be oracle-hashed (Spark's HLL++ !=
    // DuckDB's); bound it against q_distinct_approx's exact twin here
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct}
    val row = graft.io.Tables.events(spark, sf("sf0.01"))
      .agg(countDistinct($"user_id").as("exact"),
        approx_count_distinct($"user_id", 0.02).as("approx"))
      .head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx $approx drifted beyond 5% of exact $exact")
  }
}
