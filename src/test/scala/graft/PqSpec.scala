package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Ivf, Pq}

/** Product-quantization properties: codebook round-trip, code range,
  * ADC exactness in the k=n limit, and retrieval sanity. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.01")
  private def emb = Tables.embeddings(spark, dir)

  test("codes are in [0, k) and save/load round-trips the codebooks") {
    val cb = Pq.fit(emb, $"embedding", Seq($"vec_id"), m = 8, k = 16, iters = 1)
    assert(cb.length === 8 && cb.forall(_.length === 16) &&
      cb.forall(_.forall(_.length === 8)))
    val codes = Pq.encode(emb, $"embedding", cb)
      .select($"pq_code").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 8 && c.forall(j => j >= 0 && j < 16)))
    val tmp = java.nio.file.Files.createTempDirectory("pq").toString
    Pq.save(spark, cb, s"$tmp/cb")
    val back = Pq.load(spark, s"$tmp/cb")
    assert(back.length === cb.length)
    for (s <- cb.indices; j <- cb(s).indices)
      assert(back(s)(j).toSeq === cb(s)(j).toSeq, s"codebook ($s,$j) drifted")
  }

  test("fused fit is bit-identical to the per-subspace fits, ragged rows included") {
    // real embeddings + one short vector (drops out of the LAST
    // subspace only) + one over-wide vector (drops out of EVERY
    // subspace's NULL filter in neither spelling — slices stay valid)
    val extra = Seq(
      (90001L, Array.tabulate(60)(i => 0.01f * i)),
      (90002L, Array.tabulate(70)(i => -0.02f * i))
    ).toDF("vec_id", "embedding")
    val corpus = emb.select($"vec_id", $"embedding").unionByName(extra)
    val fused = Pq.fit(corpus, $"embedding", Seq($"vec_id"), m = 8, k = 16, iters = 2)
    val seq = Pq.fitPerSubspace(corpus, $"embedding", Seq($"vec_id"),
      m = 8, k = 16, iters = 2)
    assert(fused.length === seq.length)
    for (s <- seq.indices; j <- seq(s).indices)
      assert(java.util.Arrays.equals(fused(s)(j), seq(s)(j)),
        s"codebook ($s,$j) differs between fused and per-subspace fit")
  }

  test("native encode and ADC are bit-identical to the composed spellings") {
    val extra = Seq(
      (90001L, Array.tabulate(60)(i => 0.01f * i)), // ragged: last subspace NULL
      (90002L, Array.tabulate(70)(i => -0.02f * i)) // over-wide: all slices valid
    ).toDF("vec_id", "embedding")
    val corpus = emb.select($"vec_id", $"embedding").unionByName(extra)
    val cb = Pq.fit(emb, $"embedding", Seq($"vec_id"), m = 8, k = 16, iters = 1)

    val nat = Pq.encode(corpus, $"embedding", cb)
      .select($"vec_id", $"pq_code").as[(Long, Seq[Option[Int]])]
      .collect().toMap
    val comp = Pq.encodeComposed(corpus, $"embedding", cb)
      .select($"vec_id", $"pq_code").as[(Long, Seq[Option[Int]])]
      .collect().toMap
    assert(nat === comp, "pq_encode diverges from the composed spelling")
    assert(nat(90001L).last.isEmpty && nat(90001L).init.forall(_.isDefined),
      "ragged row must NULL exactly its short subspace")

    val q = emb.orderBy($"vec_id").select($"embedding").as[Array[Float]].head()
    val lut = Pq.lutL2(cb, q.map(_.toDouble))
    val both = Pq.encode(corpus, $"embedding", cb)
      .select($"vec_id",
        Pq.adcDistSq($"pq_code", lut).as("n"),
        Pq.adcDistSqComposed($"pq_code", lut).as("c"))
      .as[(Long, Option[Double], Option[Double])].collect()
    both.filter(_._1 != 90001L).foreach { case (id, n, c) =>
      assert(n === c, s"vec $id: native adc $n != composed $c (bit compare)")
    }
    // the ragged row is where the spellings MUST diverge: element_at
    // over a non-nullable literal array with a NULL index silently
    // evaluates to 0.0 (the literal's containsNull=false makes the
    // whole chain claim non-nullable, so codegen skips the null
    // branch) — an ADC "distance" of 0.0 would rank the ragged row
    // FIRST. The native expression restores the documented contract:
    // NULL distance, dropped by search()'s isNotNull gate.
    val ragged = both.find(_._1 == 90001L).get
    assert(ragged._2.isEmpty, "native ADC must NULL a ragged row's distance")
    assert(ragged._3 === Some(0.0),
      "composed chain's silent-zero quirk changed — revisit the scaladoc")
  }

  test("ADC distance is exact when every point is its own codebook entry (k = n)") {
    // 8 vectors, k = 8, 1 iteration: seeds are the points themselves
    // and each point quantizes to itself → dq(x) = x, so the ADC sum
    // of per-subspace distances equals the exact ||q−x||² up to fold
    // association (subspace sums vs one 64-term fold)
    val tiny = emb.orderBy("vec_id").limit(8).cache()
    val cb = Pq.fit(tiny, $"embedding", Seq($"vec_id"), m = 8, k = 8, iters = 1)
    val q = tiny.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toArray
    val adc = Pq.search(Pq.encode(tiny, $"embedding", cb), $"vec_id", cb, q, 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = tiny.select($"vec_id", $"embedding").collect().map { r =>
      val x = r.getSeq[Float](1).toArray.map(_.toDouble)
      r.getLong(0) -> Ivf.distSq(q.map(_.toDouble), x)
    }.toMap
    // tolerance 1e-6, not 0: the decimal(28,9) means round a single-
    // member cell's centroid at the 9th decimal, so dq(x) ≈ x within
    // ~1e-9 per component (64 components compound)
    exact.foreach { case (id, d) =>
      assert(math.abs(adc(id) - d) < 1e-6, s"vec $id: adc=${adc(id)} exact=$d")
    }
    tiny.unpersist()
  }

  test("residual column, per-cell ADC routing, and IVFADC quantization error") {
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 8, iters = 2)
    val assigned = Ivf.assign(emb, $"embedding", centers).cache()
    val resCol = Pq.residual($"embedding", $"cell", centers)

    // 1. the residual column equals the row-wise subtraction, float-
    //    rounded, against the row's OWN centroid
    assigned.select($"vec_id", $"cell", $"embedding", resCol.as("r"))
      .collect().foreach { row =>
        val cell = row.getInt(1)
        val e = row.getSeq[Float](2)
        val r = row.getSeq[Float](3)
        val expect = e.indices.map(i => (e(i).toDouble - centers(cell)(i)).toFloat)
        assert(r === expect, s"vec ${row.getLong(0)} residual drifted")
      }

    // 2. per-cell ADC: each candidate scored through its own cell's
    //    LUT equals scoring that cell's subset alone; unrouted cells
    //    score NULL
    val cb = Pq.fit(assigned, resCol, Seq($"vec_id"), m = 8, k = 16, iters = 1)
    val q = emb.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toArray.map(_.toDouble)
    val cells = Ivf.nearestCells(centers, q, nProbe = 2)
    val luts = Pq.residualLuts(cb, centers, q, cells.toSeq)
    val encoded = Pq.encode(assigned, resCol, cb).cache()
    val chained = encoded
      .select($"vec_id", $"cell",
        Pq.adcDistSqPerCell($"pq_code", $"cell", luts).as("d"))
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    luts.foreach { case (c, lut) =>
      encoded.filter($"cell" === c)
        .select($"vec_id", Pq.adcDistSq($"pq_code", lut).as("d"))
        .collect().foreach { r =>
          assert(chained(r.getLong(0)) === Some(r.getDouble(1)), s"cell $c")
        }
    }
    encoded.filter(!$"cell".isin(cells.map(Integer.valueOf): _*))
      .select($"vec_id").as[Long].collect()
      .foreach(id => assert(chained(id).isEmpty, s"unrouted vec $id not NULL"))

    // 3. the point of IVFADC: at the same m×k budget, quantizing the
    //    residual reconstructs vectors strictly better than quantizing
    //    the raw corpus — mean squared reconstruction error must drop
    def reconErr(useResidual: Boolean): Double = {
      val (src, book) =
        if (useResidual) (resCol, cb)
        else ($"embedding".cast("array<float>"),
          Pq.fit(assigned, $"embedding", Seq($"vec_id"), m = 8, k = 16, iters = 1))
      val sub = 8
      Pq.encode(assigned, src, book)
        .select(src.as("v"), $"pq_code").collect().map { r =>
          val v = r.getSeq[Float](0)
          val codes = r.getSeq[Int](1)
          v.indices.map { i =>
            val d = v(i).toDouble - book(i / sub)(codes(i / sub))(i % sub)
            d * d
          }.sum
        }.sum / assigned.count()
    }
    val errRes = reconErr(useResidual = true)
    val errRaw = reconErr(useResidual = false)
    assert(errRes < errRaw,
      s"residual PQ should reconstruct better: residual=$errRes raw=$errRaw")
    assigned.unpersist()
  }

  test("LUT-as-column ADC fold matches the native form, degenerate codes included") {
    val cb = Pq.fit(emb, $"embedding", Seq($"vec_id"), m = 8, k = 16, iters = 1)
    val q = emb.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toArray
    val lut = Pq.lutL2(cb, q.map(_.toDouble))
    val lutLit = typedlit(lut.map(_.toSeq).toSeq)
    Pq.encode(emb, $"embedding", cb)
      .select($"vec_id", Pq.adcDistSq($"pq_code", lut).as("a"),
        Pq.adcDistSqCol($"pq_code", lutLit).as("b"))
      .collect().foreach { r =>
        assert(Option(r.get(1)) === Option(r.get(2)), s"vec ${r.getLong(0)}")
      }
    // degenerate codes → NULL from BOTH spellings: null array, null
    // element, short array, out-of-range code, negative code
    val weird: Seq[(Long, Option[Seq[Option[Int]]])] = Seq(
      1L -> None,
      2L -> Some(Seq(Some(0), Some(1), Some(2), Some(3), Some(4), Some(5),
        Some(6), None)),
      3L -> Some(Seq(Some(0), Some(1), Some(2))),
      4L -> Some(Seq(Some(0), Some(1), Some(2), Some(3), Some(4), Some(5),
        Some(6), Some(99))),
      5L -> Some(Seq(Some(0), Some(1), Some(2), Some(3), Some(4), Some(5),
        Some(6), Some(-1))))
    weird.toDF("vec_id", "pq_code")
      .select($"vec_id", Pq.adcDistSq($"pq_code", lut).as("a"),
        Pq.adcDistSqCol($"pq_code", lutLit).as("b"))
      .collect().foreach { r =>
        assert(r.isNullAt(1) && r.isNullAt(2),
          s"degenerate code ${r.getLong(0)} must be NULL in both spellings")
      }
    // distributed LUT == driver LUT on the same query
    val viaExpr = emb.filter($"vec_id" === 0)
      .select(graft.functions.pq_lut_l2(
        transform($"embedding", x => x.cast("double")), cb).as("t"))
      .as[Seq[Seq[Double]]].head()
    assert(viaExpr.map(_.toSeq) === lut.map(_.toSeq).toSeq)
  }

  test("PQ top-10 lands inside the exact-L2 top-100 (coarse-rank sanity)") {
    // 8-byte codes cannot rank near-ties inside a cluster (classic PQ
    // regime — the 2k-vector corpus's true top-10 are close same-
    // cluster neighbors), but every PQ hit must still be a genuinely
    // close vector: top-5% of the corpus by exact distance. The exact
    // ADC test above pins the machinery; PqProbe measures real recall
    // at 2M vectors.
    val cb = Pq.fit(emb, $"embedding", Seq($"vec_id"), m = 8, k = 16, iters = 2)
    val q = emb.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toArray
    val got = Pq.search(Pq.encode(emb.filter($"vec_id" =!= 0), $"embedding", cb),
        $"vec_id", cb, q, 10)
      .select($"vec_id").as[Long].collect().toSet
    // exact L2 rank via the native dot: ||x||² − 2·q·x ranks ||q−x||²
    val qLit = typedlit(q.toSeq)
    val exact100 = emb.filter($"vec_id" =!= 0)
      .select($"vec_id",
        (graft.functions.dot_product($"embedding", $"embedding")
          - lit(2.0) * graft.functions.dot_product($"embedding", qLit)).as("d"))
      .orderBy($"d".asc, $"vec_id".asc).limit(100)
      .select($"vec_id").as[Long].collect().toSet
    val overlap = got.intersect(exact100).size
    assert(overlap >= 8, s"PQ hits outside the exact top-5%: $overlap/10 " +
      s"(got=$got)")
  }

  test("q_ann_recall_pq: IVFADC serving recall floor (VERDICT r15 #6)") {
    // The declared, oracle-hash-checked recall of the searchPqBatchOf
    // read path at the replayable m=4 × k=4 codebook with the 12×-topK
    // rerank budget. Pinned values at sf0.01: mean 0.85, min 0.6 (the
    // exact-rerank IVF leg q_ann_recall reads mean 0.9 on the same
    // queries — quantization costs ~0.05 mean recall here). The floor
    // asserts the BAND, not the hash (the oracle does that): a
    // codebook/LUT/cut regression that drops a query below 0.4 or the
    // mean below 0.7 fails loudly.
    val rows = graft.ops.VectorOps.queries("q_ann_recall_pq")(spark, dir)
      .select($"recall").as[Double].collect()
    assert(rows.length == 8)
    val mean = rows.sum / rows.length
    assert(mean >= 0.7, s"mean IVFADC recall regressed: $mean")
    assert(rows.min >= 0.4, s"a query's IVFADC recall collapsed: ${rows.toSeq}")
  }
}
