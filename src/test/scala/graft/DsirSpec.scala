package graft

import org.apache.spark.sql.functions._
import graft.ops.Dsir

/** DSIR importance weighting: the planted target-like document must
  * outrank the generic one, and the resampler must be deterministic
  * with in-range rates. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // doc_id % 20 == 0 rows are the target slice (physics-flavored
  // vocabulary); the rest of the corpus is market-flavored filler.
  // Doc 1 is WRITTEN LIKE THE TARGET, doc 3 like the filler.
  private lazy val docs = Seq(
    (0L, "quantum flux energy resonance cascade quantum energy field"),
    (20L, "flux resonance quantum cascade energy quantum field theory"),
    (40L, "energy cascade field quantum resonance flux quantum state"),
    (1L, "quantum energy flux resonance field cascade"),
    (3L, "banana apple market price fruit vendor stall"),
    (5L, "market price apple banana fruit discount sale"),
    (7L, "vendor stall market fruit apple banana price"),
    (9L, "price sale discount market banana fruit apple"),
    (11L, "apple vendor fruit market stall banana sale")
  ).toDF("doc_id", "text")

  test("target-like doc outranks the generic doc") {
    val w = Dsir.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.contains(1L) && w.contains(3L))
    assert(w(1L) > w(3L),
      s"target-like doc 1 (${w(1L)}) should outscore generic doc 3 (${w(3L)})")
    // the target slice itself scores at the top of the range
    assert(w(0L) > w(3L) && w(20L) > w(3L))
  }

  test("weights cover exactly the docs with a non-empty token stream") {
    val withEmpty = docs.union(Seq((99L, "   ")).toDF("doc_id", "text"))
    val ids = Dsir.dsirWeights(withEmpty).select("doc_id")
      .as[Long].collect().toSet
    assert(ids == docs.select("doc_id").as[Long].collect().toSet)
  }

  test("resampler is deterministic with rates in [0, 10000]") {
    val a = Dsir.dsirSelect(docs).orderBy("doc_id").collect()
    val b = Dsir.dsirSelect(docs).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    val rates = Dsir.dsirWeights(docs).transform(w => {
      val mm = w.agg(min(col("dsir_score")).as("smin"),
        max(col("dsir_score")).as("smax"))
      w.crossJoin(broadcast(mm))
    })
    rates.collect() // smoke the plan
    a.foreach { r =>
      val bp = r.getInt(2)
      assert(bp >= 0 && bp <= 10000, s"rate_bp $bp out of range")
    }
    // the best-scoring doc keeps with certainty (rate 10000)
    val best = Dsir.dsirWeights(docs).orderBy(col("dsir_score").desc)
      .select("doc_id").as[Long].head()
    assert(a.exists(r => r.getLong(0) == best && r.getInt(2) == 10000))
  }

  test("degenerate corpus (single doc) keeps everything at rate 10000") {
    val one = Seq((2L, "only doc in the corpus")).toDF("doc_id", "text")
    val sel = Dsir.dsirSelect(one).collect()
    assert(sel.length == 1 && sel.head.getInt(2) == 10000)
  }

  test("scoreWith passes caller columns named toks/lrs through untouched") {
    // ADVICE r13: internal columns are __dsir_-prefixed, so a frame
    // already carrying toks/lrs keeps them — values AND scores agree
    // with the plain-frame run
    val lrt = Dsir.ratioTable(docs)
    val withClash = docs
      .withColumn("toks", array(lit("caller"), lit("owned")))
      .withColumn("lrs", lit(42))
    val out = Dsir.scoreWith(withClash, lrt)
    assert(out.columns.contains("toks") && out.columns.contains("lrs"))
    val rows = out.select(col("doc_id"), col("lrs"),
      concat_ws("|", col("toks")).as("t"), col("dsir_score")).collect()
    rows.foreach { r =>
      assert(r.getInt(1) == 42, s"lrs clobbered for doc ${r.getLong(0)}")
      assert(r.getString(2) == "caller|owned", s"toks clobbered for doc ${r.getLong(0)}")
    }
    val plain = Dsir.scoreWith(docs, lrt)
      .select("doc_id", "dsir_score").as[(Long, Double)].collect().toMap
    rows.foreach(r => assert(plain(r.getLong(0)) == r.getDouble(3)))
  }
}
