package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.plans.AsOf

/** Custom as-of join operator: fixture semantics + equivalence to the
  * window-function composition on real data. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks the latest right row at-or-before each left time") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:03:00"), 200.0)
    ).toDF("q_id", "q_ts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:04:59"), "t1"),  // -> 100.0
      (1L, ts("2024-01-01 10:05:00"), "t2"),  // boundary: <= matches 101.0
      (1L, ts("2024-01-01 10:59:00"), "t3"),  // -> 102.0
      (2L, ts("2024-01-01 10:02:00"), "t4"),  // before any quote -> null
      (3L, ts("2024-01-01 10:30:00"), "t5")   // key never quoted -> null
    ).toDF("t_id", "t_ts", "tag")
    val joined = AsOf.join(trades, quotes,
        trades("t_id"), quotes("q_id"), trades("t_ts"), quotes("q_ts"))
      .select($"tag", $"price").collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(joined === Map(
      "t1" -> Some(100.0), "t2" -> Some(101.0), "t3" -> Some(102.0),
      "t4" -> None, "t5" -> None))
  }

  test("as-of result matches window-function composition on testdata") {
    val dir = sf("sf0.001")
    val viaOperator = SparkEntry.queries("q_asof_join")(spark, dir)
      .select($"event_id", $"o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    // reference composition: union trick via join + filter + row_number
    val ev = graft.io.Tables.events(spark, dir)
    val od = graft.io.Tables.orders(spark, dir)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_id")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    val viaWindow = ev.join(od,
        ev("user_id") === od("o_custkey") && od("o_orderdate") <= ev("ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"event_id", $"o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    assert(viaOperator.size === viaWindow.size)
    assert(viaOperator === viaWindow)
  }

  test("as-of survives multiple partitions (shuffle + sort requirements)") {
    val left = (1 to 1000).map(i =>
      ((i % 50).toLong, ts(f"2024-01-01 10:${i % 60}%02d:00"), i.toLong))
      .toDF("k", "t", "left_id").repartition(13)
    val right = (1 to 300).map(i =>
      ((i % 50).toLong, ts(f"2024-01-01 10:${(i * 7) % 60}%02d:00"), i.toLong))
      .toDF("k", "t", "right_id")
      .groupBy($"k", $"t").agg(max($"right_id").as("right_id"))
      .repartition(5)
    val joined = AsOf.join(left, right,
      left("k"), right("k"), left("t"), right("t"))
    assert(joined.count() === 1000)  // every left row kept
    // spot-verify one key against a local computation
    val k7 = joined.filter(left("k") === 7L)
      .select(left("t"), $"right_id").collect()
      .map(r => (r.getTimestamp(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    val rightK7 = (1 to 300).filter(i => i % 50 == 7)
      .map(i => (ts(f"2024-01-01 10:${(i * 7) % 60}%02d:00"), i.toLong))
      .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).max) }.toSeq
    k7.foreach { case (t, got) =>
      val expect = rightK7.filter(!_._1.after(t)).sortBy(_._1.getTime).lastOption.map(_._2)
      assert(got === expect, s"at $t")
    }
  }

  test("non-64-bit key/time types fail at analysis, not with wrong results") {
    val left = Seq(("a", 1L, 10L), ("b", 2L, 20L)).toDF("sk", "ik", "t")
    val right = Seq(("a", 1L, 5L)).toDF("sk", "ik", "t")
    // string key: the raw-slot comparator would compare (offset,size)
    val e1 = intercept[IllegalArgumentException] {
      AsOf.join(left, right, left("sk"), right("sk"), left("t"), right("t"))
    }
    assert(e1.getMessage.contains("64-bit"))
    // int time: zero-extension would misorder negatives
    val l2 = left.withColumn("ti", $"t".cast("int"))
    val r2 = right.withColumn("ti", $"t".cast("int"))
    val e2 = intercept[IllegalArgumentException] {
      AsOf.join(l2, r2, l2("ik"), r2("ik"), l2("ti"), r2("ti"))
    }
    assert(e2.getMessage.contains("64-bit"))
    // long key + timestamp time stays accepted
    val ok = AsOf.join(left, right, left("ik"), right("ik"), left("t"), right("t"))
    assert(ok.count() === 2)
    // CROSS-SIDE mismatch: long millis vs timestamp — each passes the
    // per-side 64-bit check but the raw slots carry different units;
    // must be rejected, not silently misjoined
    val lts = left.withColumn("tt", to_timestamp(from_unixtime($"t")))
    val e3 = intercept[IllegalArgumentException] {
      AsOf.join(lts, right, lts("ik"), right("ik"), lts("tt"), right("t"))
    }
    assert(e3.getMessage.contains("must match on both sides"))
  }

  test("null keys and times never match (and never corrupt the merge)") {
    val left = Seq(
      (Some(1L), Some(10L), "l-match"),
      (None, Some(10L), "l-nullkey"),
      (Some(1L), None, "l-nulltime"),
      (Some(0L), Some(10L), "l-zerokey")   // must NOT match the null-key right row
    ).toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), Some(5L), 100.0),
      (None, Some(5L), 666.0),             // null right key: matches nothing
      (Some(2L), None, 777.0)              // null right time: matches nothing
    ).toDF("k", "t", "price")
    val out = AsOf.join(left, right, left("k"), right("k"), left("t"), right("t"))
      .select($"tag", $"price").collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(
      "l-match" -> Some(100.0), "l-nullkey" -> None,
      "l-nulltime" -> None, "l-zerokey" -> None))
  }
}
