package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Scale

/** Skew/bucketing techniques: result equivalence + plan shape. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.01")

  test("salted left join is row-equivalent to the plain join") {
    val ev = Tables.events(spark, dir)
    val cust = Tables.dim(spark, dir, "customer", "c_custkey", "c_mktsegment")
    val plain = ev.join(cust, ev("user_id") === cust("c_custkey"), "left")
      .groupBy($"c_mktsegment").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val salted = Scale.saltedLeftJoin(ev, cust, "user_id", "c_custkey",
        "event_id", saltBuckets = 8)
      .groupBy($"c_mktsegment").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("salted shuffle-form left join (broadcastDim=false) is row-equivalent, nulls included") {
    // the q_skew_join code path: merge-pinned shuffle join with the
    // salt in the keys. Null fact keys must behave like a plain left
    // join (kept, unmatched) — the salt coalesce exists for them.
    val ev = Tables.events(spark, dir)
      .withColumn("k", when($"event_id" % 97 === 0, lit(null).cast("long"))
        .otherwise($"user_id"))
    val cust = Tables.dim(spark, dir, "customer", "c_custkey", "c_mktsegment")
    val plain = ev.join(cust, ev("k") === cust("c_custkey"), "left")
      .groupBy($"c_mktsegment").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val salted = Scale.saltedLeftJoin(ev, cust, "k", "c_custkey",
        "event_id", saltBuckets = 8, broadcastDim = false)
      .groupBy($"c_mktsegment").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("salted two-phase aggregation equals direct groupBy") {
    val ev = Tables.events(spark, dir)
    val direct = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,6)")).cast("double").as("sum_value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Scale.saltedCountSum(ev, "event_type", "value", "event_id", 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted === direct)
  }

  test("salted aggregation spreads a NULL-id hot key instead of collapsing it") {
    // a hot key whose salt-id column is NULL (the id never made it
    // through an upstream outer join, say): without the guard every
    // one of its rows gets a NULL salt = one reducer group, silently
    // recreating the straggler the salt exists to prevent
    val hot = spark.range(0, 10000).repartition(8)
      .select(lit("hot").as("k"), lit(null).cast("long").as("sid"),
        (col("id") % 7).cast("double").as("v"))
    val cold = spark.range(0, 100)
      .select(lit("cold").as("k"), col("id").as("sid"), lit(1.0).as("v"))
    val df = hot.unionByName(cold)
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n"),
        sum($"v".cast("decimal(18,6)")).cast("double").as("sum_value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Scale.saltedCountSum(df, "k", "v", "sid", 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted === direct, "NULL-id rows were lost or double-counted")
    // the spreading itself: the partial phase must see the hot key in
    // more than one (key, salt) group
    val saltGroups = hot.withColumn("__salt", Scale.aggSaltExpr("sid", 16))
      .select($"__salt").distinct().count()
    assert(saltGroups > 1,
      s"NULL-id hot key still collapses onto $saltGroups salt bucket(s)")
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_test LOCATION '$wh/db'")
    spark.sql("USE graft_test")
    try {
      val li = Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_quantity")
      val od = Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_totalprice")
      Scale.writeBucketed(li, "li_b", "l_orderkey", 8, s"$wh/li_b")
      Scale.writeBucketed(od, "od_b", "o_orderkey", 8, s"$wh/od_b")
      val joined = spark.table("li_b")
        .join(spark.table("od_b"), $"l_orderkey" === $"o_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${p.take(1500)}")
      assert(joined.count() === li.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS od_b")
      spark.sql("USE default")
    }
  }
}
