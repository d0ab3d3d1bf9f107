package graft

import org.apache.spark.sql.functions._
import graft.ops.{Aggregates, Transforms}
import graft.io.Tables

/** Aggregate invariants (SURVEY.md §5 property list) on sf0.001. */
class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("conservation: per-minute counts sum to total event count") {
    val total = Tables.events(spark, dir).count()
    val summed = Aggregates.minuteAgg(Tables.events(spark, dir))
      .agg(sum($"access_count")).as[Long].head()
    assert(summed === total)
  }

  test("sliding 10m equals sum of its member minutes") {
    val minutes = Aggregates.minuteAgg(Tables.events(spark, dir))
    val slid = Aggregates.sliding10m(minutes)
    // recompute each row's window by self-join over the 9 preceding
    // observed minutes (ROWS semantics) and compare
    val idx = minutes
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"minute")))
    val joined = idx.as("a").join(idx.as("b"),
        $"a.event_type" === $"b.event_type" &&
        $"b.rn".between($"a.rn" - 9, $"a.rn"))
      .groupBy($"a.minute".as("minute"), $"a.event_type".as("event_type"))
      .agg(sum($"b.access_count").as("expect_10m"))
    val bad = slid.join(joined, Seq("minute", "event_type"))
      .filter($"count_10m" =!= $"expect_10m").count()
    assert(bad === 0)
  }

  test("avg ratio divides by ALL accesses, not non-null count") {
    val d = Seq(
      ("a", Some(10.0)), ("a", None), ("a", None), ("a", None),
      ("b", Some(8.0))
    ).toDF("event_type", "eng_pct")
    val r = Aggregates.avgRatio(d).collect()
      .map(x => x.getAs[String]("event_type") -> x.getAs[Double]("avg_engagement")).toMap
    assert(r("a") === 2.5)   // 10 / 4 accesses (3 null-pct rows count)
    assert(r("b") === 8.0)
  }

  test("avg ratio guards division for all-null groups") {
    val d = Seq(("z", Option.empty[Double])).toDF("event_type", "eng_pct")
    val r = Aggregates.avgRatio(d).head()
    assert(r.getAs[Double]("avg_engagement") === 0.0)
  }

  test("topK is deterministic under ties (tie-break on key)") {
    val d = Seq(("b", 5.0), ("a", 5.0), ("c", 5.0), ("d", 1.0))
      .toDF("event_type", "score")
    val got = Aggregates.topK(d, "score", 3)
      .select("event_type").as[String].collect().toSeq
    assert(got === Seq("a", "b", "c"))
  }

  test("retention filter matches 15-minute window from max ts") {
    val q = SparkEntry.queries("q_retention_filter")(spark, dir)
    val total = q.agg(sum($"recent_count")).as[Long].head()
    val ev = Tables.events(spark, dir)
    val maxTs = ev.agg(max($"ts")).head().getTimestamp(0)
    val expect = ev.filter($"ts" >= lit(maxTs) - expr("INTERVAL 15 MINUTES")).count()
    assert(total === expect)
  }

  test("approx_count_distinct tracks exact within its rsd bound") {
    val ev = Tables.events(spark, sf("sf0.01"))
    val r = ev.agg(
      countDistinct($"user_id").as("exact"),
      approx_count_distinct($"user_id", 0.02).as("approx"))
      .as[(Long, Long)].head()
    val (exact, approx) = r
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("entry flagship returns top-3 rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length === 3)
    val scores = rows.map(_.getAs[Double]("avg_engagement"))
    assert(scores.sorted.reverse.toSeq === scores.toSeq)
  }
}
