package graft

import org.apache.spark.sql.functions._
import graft.ops.{TextOps, VectorOps}
import graft.io.Tables

/** Lateral-column-alias capture guard (VERDICT r15 #1).
  *
  * The bug class: in ONE .select(...), an expression aliased to a name
  * that already exists on the input, with another item of the same
  * projection referencing that name. The q_semantic_dedup fixture's
  * per-dim perturbation lambda bound `col("vec_id")` to the
  * just-aliased `vec_id + 100000` — not the input column — and sat
  * latent for five rounds because the declared output never emitted a
  * cosine (NOTES_r15 §4).
  *
  * Three layers of defense here:
  *   1. PIN the resolution semantics themselves on a toy frame — if a
  *      Spark upgrade flips either the plain-ref or the lambda-ref
  *      binding, these fail before any fixture drifts silently.
  *   2. Float-for-float DRIVER-SIDE REPLAY of the shared perturbation
  *      twin builder ([[VectorOps.perturbedTwins]]) — the value-level
  *      probe that would have caught the r15 bug on day one, plus the
  *      emitted round-6 cosine.
  *   3. Emission differentials for the minhash/simhash families: the
  *      EMITTED jaccard/hamming vs a trivially-correct driver
  *      recompute from the same collected arrays/fingerprints.
  */
class LateralAliasSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------------
  // 1. The knife edge itself, pinned
  // ----------------------------------------------------------------

  test("plain same-select reference binds to the CHILD column, not the alias") {
    // Graph.scala's pointer-jump rename and Retrieval.scala's (a,b)
    // swap DEPEND on this binding; if it ever flips, the CC and MMR
    // oracles break loudly — this pins it at the smallest repro.
    val df = Seq((1L, 2L)).toDF("a", "b")
    val swapped = df.select(col("b").as("a"), col("a").as("b")).head()
    assert(swapped.getLong(0) == 2L && swapped.getLong(1) == 1L,
      s"(a,b) swap broke: $swapped — plain refs no longer bind child-first")
    val shifted = df.select((col("a") + 10).as("a"), (col("a") * 100).as("x")).head()
    assert(shifted.getLong(1) == 100L,
      s"x bound to the shifted alias (${shifted.getLong(1)}), not child a")
  }

  test("lambda-embedded reference CAPTURES the same-select alias (the r15 hazard)") {
    // The documented hazard: inside a higher-order-function lambda,
    // an outer column reference sharing a name with a same-select
    // alias resolves to the ALIAS. Every production site must
    // therefore bind the source under a fresh name first (the
    // src_id discipline). If Spark ever changes this, the hazard is
    // gone — and this test failing is the signal to retire the
    // discipline note, not a correctness bug.
    val df = Seq((1L, Seq(0.0, 0.0))).toDF("id", "v")
    val out = df.select((col("id") + 10).as("id"),
      transform(col("v"), x => x + col("id").cast("double")).as("w"))
      .head().getSeq[Double](1)
    assert(out == Seq(11.0, 11.0) || out == Seq(1.0, 1.0),
      s"unexpected binding: $out")
    val captured = out == Seq(11.0, 11.0)
    assert(captured,
      "lambda no longer captures the lateral alias — retire the src_id " +
        "discipline notes (NOTES_r15 §4) and simplify perturbedTwins")
  }

  // ----------------------------------------------------------------
  // 2. Vector fixture families: float-for-float driver replay
  // ----------------------------------------------------------------

  private def replayTwins(offset: Long): Unit = {
    val e = Tables.embeddings(spark, sf("sf0.001"))
      .filter(col("vec_id") % 7 === 0)
    val twins = VectorOps.perturbedTwins(e, offset)
    val src = e.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    val got = twins.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    assert(got.nonEmpty)
    got.foreach { case (vid, emb) =>
      val sid = vid - offset
      val want = src(sid).zipWithIndex.map { case (x, i) =>
        (x.toDouble * (1.0 + ((sid + i) % 7 - 3) * 0.0005)).toFloat
      }
      // bit-exact: the builder's arithmetic is double-then-float-cast,
      // exactly as above. A captured (shifted) id changes the %7
      // phase by offset % 7 (100000 % 7 = 5, 200000 % 7 = 3) and the
      // floats diverge immediately.
      assert(emb == want,
        s"twin $vid diverged from driver replay of src $sid")
    }
    // the emitted round-6 cosine — the knife-edge observable that
    // caught the r15 capture (cos(src, twin) ≈ 1 - O(1e-7))
    val cosRows = twins.select(col("vec_id"),
        (col("vec_id") - offset).as("src_id"), col("embedding").as("t_emb"))
      .join(e.select(col("vec_id").as("src_id"),
        col("embedding").as("s_emb")), Seq("src_id"))
      .select(round(VectorOps.cosine(col("t_emb"), col("s_emb")), 6).as("c"))
      .as[Double].collect()
    assert(cosRows.forall(c => c >= 0.999999 && c <= 1.0),
      s"twin cosine off the by-construction band: ${cosRows.toSeq.distinct}")
  }

  test("q_semantic_dedup twin fixture (offset 100000) replays float-for-float") {
    replayTwins(100000L)
  }

  test("q_semantic_decon planted fixture (offset 200000) replays float-for-float") {
    replayTwins(200000L)
  }

  // ----------------------------------------------------------------
  // 3. MinHash / SimHash families: emitted-value differentials
  // ----------------------------------------------------------------

  test("minhash verified pairs: emitted jaccard equals driver recompute") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val hsh = TextOps.minhashHashes(docs)
      .as[(Long, Seq[Long])].collect().toMap
    val pairs = TextOps.minhashPairsOf(docs)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty, "fixture has no verified near-dup pairs")
    pairs.foreach { case (a, b, j) =>
      val (sa, sb) = (hsh(a).toSet, hsh(b).toSet)
      val want = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(j - want) < 1e-12,
        s"pair ($a,$b): emitted jaccard $j != driver $want")
    }
  }

  test("simhash pairs: emitted hamming equals driver bitCount recompute") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val fp = docs.withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), graft.functions.simhash60_md5(col("toks")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    val got = TextOps.queries("q_simhash_pairs")(spark, sf("sf0.001"))
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty, "fixture has no simhash near-dup pairs")
    got.foreach { case (a, b, h) =>
      val want = java.lang.Long.bitCount(fp(a) ^ fp(b)).toLong
      assert(h == want, s"pair ($a,$b): emitted hamming $h != driver $want")
    }
  }
}
