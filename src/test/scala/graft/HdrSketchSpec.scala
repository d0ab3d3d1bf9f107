package graft

import org.apache.spark.sql.functions._
import graft.functions.{hdr_bucket_lo, hdr_quantile, hdr_sketch}

/** HDR quantile sketch: guaranteed error bound, merge-order
  * independence, bounded state, fail-fast misuse. */
class HdrSketchSpec extends SparkSpec {
  import spark.implicits._

  // deterministic heavy-tailed positive integers (spans the exact
  // small-value buckets AND many exponents)
  private def values(n: Int): Seq[Long] =
    (1 to n).map { i =>
      val h = tools.CorpusGenerator.mix64(i.toLong * 37 + 5) >>> 40
      1L + (h % 17) * (h % 8191) // ~[1, 1.4e8), skewed small
    }

  test("every quantile is a lower bound within relative error 1/64") {
    val vs = values(20000)
    val df = vs.toDF("v")
    val sk = df.select(hdr_bucket_lo(col("v")).as("lo"))
      .agg(hdr_sketch(col("lo")).as("sk"))
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999, 1.0)
    val est = sk.select(qs.map(q => hdr_quantile(col("sk"), q)): _*)
      .head().toSeq.map(_.asInstanceOf[Long])
    val sorted = vs.sorted
    qs.zip(est).foreach { case (q, e) =>
      val exact = sorted(math.ceil(q * vs.size).toInt - 1)
      assert(e <= exact, s"q=$q: est $e must lower-bound exact $exact")
      assert(exact < e * (1.0 + 1.0 / 64) + 1,
        s"q=$q: exact $exact outside the 1/64 band above est $e")
    }
  }

  test("sketch is a pure function of the multiset — partitioning-independent") {
    val df = values(5000).toDF("v")
      .select(hdr_bucket_lo(col("v")).as("lo"))
    def skOf(p: Int): Seq[(Long, Long)] =
      df.repartition(p, pmod(col("lo"), lit(p)))
        .agg(hdr_sketch(col("lo")).as("sk"))
        .select(explode(col("sk"))).select("col.lo", "col.cnt")
        .as[(Long, Long)].collect().toSeq
    assert(skOf(1) == skOf(7) && skOf(7) == skOf(32))
  }

  test("state is bounded by the bucket domain, not the data") {
    val nb = values(50000).toDF("v")
      .select(hdr_bucket_lo(col("v")).as("lo"))
      .agg(size(hdr_sketch(col("lo"))).as("nb")).as[Int].head()
    // 64 exact + ≤64 per touched exponent — three orders below n
    assert(nb > 10 && nb < 2000, s"bucket count $nb")
  }

  test("aggregating raw values instead of bucket floors fails fast") {
    val e = intercept[org.apache.spark.SparkException] {
      spark.range(200000)
        .select((col("id") * 7919 + 1).as("v"))
        .agg(hdr_sketch(col("v"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("hdr_bucket_lo")), s"got: ${msgs(e)}")
  }
}
