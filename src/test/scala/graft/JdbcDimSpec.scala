package graft

import org.apache.spark.sql.functions._
import graft.io.Tables

/** S2 — JDBC dim snapshot against a LIVE in-memory Derby database
  * (Derby ships with Spark's jars): proves the projection subquery is
  * executed by the database (the JDBC schema itself is pruned) and
  * that the snapshot broadcast-joins the way the reference's in-JVM
  * dim cache is used (EngagementProcessor.scala:72-99). */
class JdbcDimSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:dimdb;create=true"
  private val driverProps = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  test("jdbcDim round-trips a pruned dim snapshot from embedded Derby") {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE content (id INT PRIMARY KEY, " +
        "content_type VARCHAR(32), length_seconds INT, secret_col VARCHAR(64))")
      st.execute("INSERT INTO content VALUES (1, 'video', 600, 'x'), " +
        "(2, 'podcast', 1200, 'y'), (3, 'article', 300, 'z')")
      st.close()

      val dim = Tables.jdbcDim(spark, url, "content",
        Seq("id", "content_type", "length_seconds"), driverProps)
      // pruned at the SOURCE: the relation's schema carries only the
      // projected columns, so the subquery ran inside the database —
      // secret_col never left it
      assert(dim.schema.fieldNames.map(_.toLowerCase).toSeq ===
        Seq("id", "content_type", "length_seconds"))
      val rows = dim.orderBy("id")
        .as[(Int, String, Int)].collect().toSeq
      assert(rows === Seq((1, "video", 600), (2, "podcast", 1200), (3, "article", 300)))

      // the snapshot is small-dim shaped: broadcast LEFT join against a
      // fact side, exactly how the enrich stage consumes it
      val facts = Seq((10L, 1), (11L, 2), (12L, 1), (13L, 99))
        .toDF("event_id", "content_id")
      val joined = facts.join(broadcast(dim),
        facts("content_id") === dim("id"), "left")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
      val enriched = joined
        .select($"event_id", coalesce($"content_type", lit("unknown")).as("ct"))
        .as[(Long, String)].collect().toMap
      assert(enriched === Map(10L -> "video", 11L -> "podcast",
        12L -> "video", 13L -> "unknown"))
    } finally conn.close()
  }
}
