package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Ivf, Pq}

/** IVF quantizer: k-means fit, assignment semantics, persistence
  * round-trip, partition-pruned probes, and search exactness when the
  * probe covers every cell. */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.01")
  private def emb = Tables.embeddings(spark, dir)

  test("nearest_centroid matches a driver-side argmin, ties to lowest cell") {
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 1)
    val got = Ivf.assign(emb, $"embedding", centers)
      .select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
    vecs.foreach { case (id, v) =>
      val want = centers.zipWithIndex
        .map { case (c, j) => (Ivf.distSq(v, c), j) }.min._2
      assert(got(id) === want, s"vec $id")
    }
  }

  test("duplicate of the nearest centroid still assigns the lowest index") {
    val centers0 = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 2, iters = 1)
    // centroid 2 duplicates centroid 0: ties must stay on 0
    val rigged = Array(centers0(0), centers0(1), centers0(0).clone())
    val cells = Ivf.assign(emb, $"embedding", rigged)
      .select($"cell").distinct().as[Int].collect().toSet
    assert(!cells.contains(2), "tie must resolve to the lowest cell index")
  }

  test("fit is invariant to input partitioning (decimal-exact means)") {
    val a = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 2)
    val b = Ivf.fit(emb.repartition(13), $"embedding", Seq($"vec_id"), k = 4, iters = 2)
    (a zip b).foreach { case (ca, cb) => assert(ca.toSeq === cb.toSeq) }
  }

  test("save/load round-trips the quantizer exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfq").toString
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 1)
    Ivf.save(spark, centers, s"$tmp/q")
    val back = Ivf.load(spark, s"$tmp/q")
    assert(back.length === centers.length)
    (back zip centers).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("index probe is partition-pruned and nProbe=K search equals brute force") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfx").toString
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 2)
    Ivf.writeIndex(emb, $"embedding", $"vec_id", centers, s"$tmp/idx", numFiles = 4)
    val q = emb.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toArray

    // probe of 2 cells: scan must prune at the partition level
    val probed = Ivf.search(spark, s"$tmp/idx", centers, q, nProbe = 2, topK = 10)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"probe must prune cell partitions, got:\n$plan")

    // nProbe = K covers everything → identical to brute-force top-k
    val full = Ivf.search(spark, s"$tmp/idx", centers, q, nProbe = 4, topK = 10)
      .select($"vec_id").as[Long].collect().toSeq
    val brute = emb
      .select($"vec_id",
        graft.functions.cosine_sim($"embedding", typedlit(q.toSeq)).as("c"))
      .orderBy($"c".desc, $"vec_id".asc).limit(10)
      .select($"vec_id").as[Long].collect().toSeq
    assert(full === brute)
  }

  test("filtered ANN: predicate joins the cell pruning in the scan, recall kept") {
    val tmp = java.nio.file.Files.createTempDirectory("ivff").toString
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 2)
    Ivf.writeIndex(emb, $"embedding", $"vec_id", centers, s"$tmp/idx", numFiles = 4)
    val queries = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val pred = pmod($"label", lit(2)) === 0

    // plan: cell partition pruning AND the metadata predicate both
    // reach the index scan — the predicate is pushed, not post-applied
    val probed = Ivf.searchBatch(spark, s"$tmp/idx", centers, queries,
      nProbe = 2, topK = 10, excludeSelf = true, predicate = Some(pred))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"filtered probe must keep cell pruning, got:\n$plan")
    assert(plan.contains("PushedFilters: [") && plan.contains("label"),
      s"metadata predicate must push into the index scan, got:\n$plan")

    // nProbe = K: filtered search == brute force UNDER the predicate.
    // This is the recall contract post-filtering cannot give — the
    // top-10 budget is spent entirely on predicate-satisfying rows.
    val got = Ivf.searchBatch(spark, s"$tmp/idx", centers, queries,
        nProbe = 4, topK = 10, excludeSelf = true, predicate = Some(pred))
      .orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    val qv = emb.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toSeq
    val brute = emb.filter(pred && $"vec_id" =!= 0)
      .select($"vec_id",
        graft.functions.cosine_sim($"embedding", typedlit(qv)).as("c"))
      .orderBy($"c".desc, $"vec_id".asc).limit(10)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got === brute, s"filtered search diverged: $got vs $brute")
    // and the result genuinely differs from post-filtering an
    // unfiltered top-10 (the failure mode the predicate API exists for)
    val postFiltered = Ivf.searchBatch(spark, s"$tmp/idx", centers, queries,
        nProbe = 4, topK = 10, excludeSelf = true)
      .join(emb.filter(pred).select($"vec_id"), Seq("vec_id"), "left_semi")
      .select($"vec_id").as[Long].collect().toSeq
    assert(postFiltered.size < got.size,
      "fixture too easy: post-filtering kept the full top-k, predicate proves nothing")
  }

  test("adaptive probing: fixed nProbe undershoots, escalation fills to brute-equal") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfa").toString
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 2)
    Ivf.writeIndex(emb, $"embedding", $"vec_id", centers, s"$tmp/idx", numFiles = 4)
    val queries = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    // highly selective predicate: a handful of matches spread over the
    // cells, so one probed cell cannot hold them all
    val pred = pmod($"vec_id", lit(97)) === 0
    val matchCount = emb.filter(pred && $"vec_id" =!= 0).count().toInt
    assert(matchCount >= 3, s"fixture needs a few matches, got $matchCount")

    // the naive fixed probe undershoots the requested k …
    val naive = Ivf.searchBatch(spark, s"$tmp/idx", centers, queries,
      nProbe = 1, topK = matchCount, excludeSelf = true, predicate = Some(pred))
    assert(naive.count() < matchCount,
      "fixture too easy: one probed cell held every match — undershoot not exercised")

    // … the escalating path fills to exactly the brute answer. k is
    // set to the full match count, so ANY escalation depth that fills
    // must have found the complete predicate-satisfying set — the
    // assert is deterministic regardless of where the ladder stops.
    val got = Ivf.searchBatchAdaptive(spark, s"$tmp/idx", centers, queries,
        nProbe = 1, topK = matchCount, excludeSelf = true, predicate = Some(pred))
      .orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    val qv = emb.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toSeq
    val brute = emb.filter(pred && $"vec_id" =!= 0)
      .select($"vec_id",
        graft.functions.cosine_sim($"embedding", typedlit(qv)).as("c"))
      .orderBy($"c".desc, $"vec_id".asc).limit(matchCount)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got === brute, s"adaptive search diverged: $got vs $brute")

    // a predicate with NO matches terminates at full probe with an
    // empty (not hanging, not erroring) result — the zero-candidate
    // escalation path
    val none = Ivf.searchBatchAdaptive(spark, s"$tmp/idx", centers, queries,
      nProbe = 1, topK = 5, excludeSelf = true,
      predicate = Some($"vec_id" < 0))
    assert(none.count() === 0)
  }

  test("adaptive probing at a 10k-query batch matches full-probe, no per-query driver state") {
    // VERDICT r17 #3: the escalation ladder's undershoot set is now an
    // anti-join (filled ids vs the remaining-id frame) — the driver
    // sees ONE scalar per round, never a per-query candidate-count
    // map, so an offline batch of any size escalates without a
    // driver-side loop. Pin the semantics at a 10k-query batch: the
    // escalating result must equal the full-probe (brute-within-
    // predicate) answer for every query.
    val tmp = java.nio.file.Files.createTempDirectory("ivfbig").toString
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 2)
    Ivf.writeIndex(emb, $"embedding", $"vec_id", centers, s"$tmp/idx", numFiles = 4)
    // 10k queries: every vector replicated 20× under distinct q_ids
    val queries = emb
      .select($"vec_id", $"embedding",
        explode(sequence(lit(0), lit(19))).as("rep"))
      .select(($"vec_id" * 32 + $"rep").cast("long").as("q_id"),
        $"embedding".as("q_emb"))
    assert(queries.count() === 10000L)
    val pred = pmod($"vec_id", lit(97)) === 0
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.select($"q_id", $"rank", $"vec_id")
        .as[(Long, Long, Long)].collect().sorted.toSeq
    val adaptive = flat(Ivf.searchBatchAdaptive(spark, s"$tmp/idx", centers,
      queries, nProbe = 1, topK = 5, predicate = Some(pred)))
    val full = flat(Ivf.searchBatch(spark, s"$tmp/idx", centers,
      queries, nProbe = 4, topK = 5, predicate = Some(pred)))
    assert(adaptive.nonEmpty && adaptive === full,
      s"10k-batch escalation diverged from full probe " +
        s"(${adaptive.size} vs ${full.size} rows)")
  }

  test("auto filtered search: pre-filter brute leg recovers recall escalation cannot") {
    // The escalation ladder repairs CARDINALITY, not recall: a query
    // whose probed cell holds topK predicate survivors FILLS there and
    // never escalates, even when a better survivor sits in an unprobed
    // cell (the VEC_FILTERED 1/1000-selectivity regime). Fixture: two
    // hand-built cells; the query routes to cell 0, which holds two
    // low-similarity survivors (fills topK=2); the best survivor sits
    // in cell 1. searchBatchAuto's population count picks the exact
    // pre-filter plan and finds it.
    val tmp = java.nio.file.Files.createTempDirectory("ivfauto").toString
    val centers = Array(Array(1.0, 0, 0, 0), Array(0.0, 1, 0, 0))
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val rows = Seq(
      // survivors (label 1): two near-orthogonal-to-q in cell 0, one
      // strong match in cell 1
      (1L, v(0.10, -0.99, 0, 0), 1), // cell 0, cos≈0.001
      (2L, v(0.15, -0.95, 0, 0), 1), // cell 0, cos≈0.055
      (3L, v(0.40, 0.90, 0, 0), 1),  // cell 1, cos≈0.495 — the true #1
      // non-survivor filler anchoring both cells
      (10L, v(1, 0, 0, 0), 0), (11L, v(0.9, 0.1, 0, 0), 0),
      (12L, v(0, 1, 0, 0), 0), (13L, v(0.1, 0.9, 0, 0), 0))
    val frame = rows.toDF("vec_id", "embedding", "label")
    Ivf.writeIndex(frame, $"embedding", $"vec_id", centers, s"$tmp/idx",
      numFiles = 2)
    val queries = Seq((100L, v(1.0, 0.1, 0, 0))).toDF("q_id", "q_emb")
    val pred = $"label" === 1
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy($"rank").select($"vec_id").as[Long].collect().toSeq

    // the ladder fills topK=2 inside probed cell 0 and stops — the
    // cell-1 survivor is invisible to it (fixture guard: if this ever
    // finds vec 3, the fixture no longer demonstrates the gap)
    val adaptive = Ivf.searchBatchAdaptive(spark, s"$tmp/idx", centers,
      queries, nProbe = 1, topK = 2, predicate = Some(pred))
    assert(ids(adaptive) === Seq(2L, 1L),
      s"fixture drift: escalation was expected to fill cell-0-only")

    // auto: 3 survivors ≤ bruteMax → exact leg; recall 1.0
    val auto = Ivf.searchBatchAuto(spark, s"$tmp/idx", centers, queries,
      nProbe = 1, topK = 2, predicate = Some(pred))
    assert(ids(auto) === Seq(3L, 2L),
      s"auto pre-filter leg should rank the unprobed-cell survivor first")

    // bruteMax = 0 forces the post-filter branch: identical to the
    // ladder's answer — branch selection, not a third semantics
    val forced = Ivf.searchBatchAuto(spark, s"$tmp/idx", centers, queries,
      nProbe = 1, topK = 2, predicate = Some(pred), bruteMax = 0)
    assert(ids(forced) === ids(adaptive))

    // IVFADC twin: the same switch on the PQ serving path (the index
    // keeps full-precision vectors beside the codes, so the exact leg
    // is available there too)
    val cb = Pq.fit(frame, $"embedding", Seq($"vec_id"), m = 2, dims = 4,
      k = 4, iters = 1)
    Ivf.writeIndexPq(frame, $"embedding", $"vec_id", centers, cb,
      s"$tmp/idxpq", numFiles = 2)
    val autoPq = Ivf.searchPqBatchAuto(spark, s"$tmp/idxpq", centers, cb,
      queries, nProbe = 1, rerankC = 4, topK = 2, predicate = Some(pred))
    assert(ids(autoPq) === Seq(3L, 2L))
    val forcedPq = Ivf.searchPqBatchAuto(spark, s"$tmp/idxpq", centers, cb,
      queries, nProbe = 1, rerankC = 4, topK = 2, predicate = Some(pred),
      bruteMax = 0)
    val ladderPq = Ivf.searchPqBatchAdaptive(spark, s"$tmp/idxpq", centers,
      cb, queries, nProbe = 1, rerankC = 4, topK = 2, predicate = Some(pred))
    assert(ids(forcedPq) === ids(ladderPq))
    assert(ids(ladderPq) === Seq(2L, 1L),
      "fixture drift: the PQ ladder was expected to fill cell-0-only")

    // the l2-rerank contract rides the same switch: the exact leg
    // scores 2·q·x − ‖x‖² (searchPqBatchOf's rerank spelling), and on
    // this fixture the l2 order agrees with cosine's (3 then 2) —
    // scored by hand: 0.01 / −0.815 / −0.988 for vecs 3/2/1
    val autoPqL2 = Ivf.searchPqBatchAuto(spark, s"$tmp/idxpq", centers, cb,
      queries, nProbe = 1, rerankC = 4, topK = 2, metric = "l2",
      predicate = Some(pred))
    assert(ids(autoPqL2) === Seq(3L, 2L))
  }

  test("streaming index appends are idempotent and search-equivalent to batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("ivfs").toString
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 2)
    val all = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val vecs = input.toDF().toDF("vec_id", "raw")
      .select($"vec_id", $"raw".cast("array<float>").as("embedding"))
    val q = Ivf.appendStream(vecs, $"embedding", centers, s"$tmp/idx",
      s"$tmp/ckpt", triggerMs = 100L)
    try {
      val (first, second) = all.splitAt(all.length / 2)
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // replay batch 1 (crash-after-write, before checkpoint commit):
    // dynamic overwrite must rewrite, not duplicate
    val secondHalf = all.drop(all.length / 2).toSeq.toDF("vec_id", "raw")
      .select($"vec_id", $"raw".cast("array<float>").as("embedding"))
    Ivf.appendBatch(secondHalf, $"embedding", centers, s"$tmp/idx", 1L)
    assert(spark.read.parquet(s"$tmp/idx").count() === all.length.toLong,
      "replayed batch duplicated rows")
    // full-probe search over the streamed index == brute force
    val qEmb = all.find(_._1 == 0L).get._2.toArray
    val got = Ivf.search(spark, s"$tmp/idx", centers, qEmb, nProbe = 4, topK = 10)
      .select($"vec_id").as[Long].collect().toSeq
    val brute = emb
      .select($"vec_id",
        graft.functions.cosine_sim($"embedding", typedlit(qEmb.toSeq)).as("c"))
      .orderBy($"c".desc, $"vec_id".asc).limit(10)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got === brute, s"streamed-index search diverged: $got vs $brute")
  }

  test("IVFADC batch plan: codes-only ADC scan, embedding only in the rerank") {
    import graft.ops.Pq
    import org.apache.spark.sql.execution.FileSourceScanExec
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 1)
    val assigned = Ivf.assign(emb, $"embedding", centers)
    val res = Pq.residual($"embedding", $"cell", centers)
    val cb = Pq.fit(assigned, res, Seq($"vec_id"), m = 8, k = 16, iters = 1)
    val idx = java.nio.file.Files.createTempDirectory("ivfadc_plan").toString
    Ivf.writeIndexPq(emb, $"embedding", $"vec_id", centers, cb, idx,
      residual = true)
    val queries = emb.filter($"vec_id" < 2)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val df = Ivf.searchPqBatch(spark, idx, centers, cb, queries,
      nProbe = 2, rerankC = 30, topK = 5, residual = true)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains(idx)) => f
    }
    assert(scans.size >= 2, s"expected ADC + rerank scans, got ${scans.size}")
    val codesOnly = scans.filter(s =>
      s.requiredSchema.fieldNames.contains("pq_code") &&
        !s.requiredSchema.fieldNames.contains("embedding"))
    val rerank = scans.filter(s =>
      s.requiredSchema.fieldNames.contains("embedding") &&
        !s.requiredSchema.fieldNames.contains("pq_code"))
    assert(codesOnly.nonEmpty,
      "the ADC stage must scan codes WITHOUT the embedding column — " +
        s"schemas: ${scans.map(_.requiredSchema.fieldNames.mkString("[", ",", "]"))}")
    assert(rerank.nonEmpty,
      "the rerank must read embeddings without re-reading codes")
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "every index scan must stay partition-pruned to the probed cells")
  }

  test("streamed PQ index compacts and serves identically to a batch-built one") {
    import graft.ops.Pq
    val tmp = java.nio.file.Files.createTempDirectory("ivfspq").toString
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 2)
    val assigned = Ivf.assign(emb, $"embedding", centers)
    val res = Pq.residual($"embedding", $"cell", centers)
    val cb = Pq.fit(assigned, res, Seq($"vec_id"), m = 8, k = 16, iters = 1)

    // stream the corpus in as three appendBatch micro-batches with
    // codebooks wired (residual codes), then compact
    val all = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    all.grouped((all.length + 2) / 3).zipWithIndex.foreach { case (chunk, i) =>
      val b = chunk.toSeq.toDF("vec_id", "raw")
        .select($"vec_id", $"raw".cast("array<float>").as("embedding"))
      Ivf.appendBatch(b, $"embedding", centers, s"$tmp/streamed", i.toLong,
        Some(cb), residual = true)
    }
    assert(Ivf.compactIndex(spark, s"$tmp/streamed") === Some(2L))

    // the code column folded through compaction intact: every row's
    // code matches an inline encode
    val stored = Ivf.readIndex(spark, s"$tmp/streamed")
      .select($"vec_id", $"pq_code").as[(Long, Seq[Int])].collect().toMap
    assert(stored.size === all.length)
    Pq.encode(assigned, res, cb).select($"vec_id", $"pq_code")
      .as[(Long, Seq[Int])].collect()
      .foreach { case (id, c) => assert(stored(id) === c, s"vec $id") }

    // serving parity: streamed+compacted == batch-built writeIndexPq
    Ivf.writeIndexPq(emb, $"embedding", $"vec_id", centers, cb,
      s"$tmp/built", residual = true)
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    def serve(dir: String) =
      Ivf.searchPqBatch(spark, dir, centers, cb, queries, nProbe = 2,
        rerankC = 40, topK = 5, residual = true, excludeSelf = true)
        .orderBy("q_id", "rank").as[(Long, Long, Long, Double)].collect().toSeq
    assert(serve(s"$tmp/streamed") === serve(s"$tmp/built"),
      "streamed PQ index must serve like the batch-built layout")
  }

  test("filtered IVFADC: predicate lands before the ADC cut, full probe == brute under it") {
    import graft.ops.Pq
    val tmp = java.nio.file.Files.createTempDirectory("ivfadcf").toString
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 2)
    val assigned = Ivf.assign(emb, $"embedding", centers)
    val cb = Pq.fit(assigned, $"embedding", Seq($"vec_id"), m = 8, k = 16, iters = 1)
    // carry the metadata column into the index layout so the
    // predicate has something to land on
    Ivf.writeIndexPq(emb, $"embedding", $"vec_id", centers, cb, s"$tmp/idx")
    val queries = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val pred = pmod($"label", lit(2)) === 0
    // nProbe = K and rerankC = corpus: the ADC cut is total, so the
    // filtered result must equal exact search restricted to the
    // predicate — proving the filter runs BEFORE the candidate cut,
    // not on the emitted top-k
    val n = emb.count().toInt
    val got = Ivf.searchPqBatch(spark, s"$tmp/idx", centers, cb, queries,
        nProbe = 4, rerankC = n, topK = 10, excludeSelf = true,
        predicate = Some(pred))
      .orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    val qv = emb.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toSeq
    val brute = emb.filter(pred && $"vec_id" =!= 0)
      .select($"vec_id",
        graft.functions.cosine_sim($"embedding", typedlit(qv)).as("c"))
      .orderBy($"c".desc, $"vec_id".asc).limit(10)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got === brute, s"filtered IVFADC diverged: $got vs $brute")
  }

  test("appendStream opCol: a CDC mutation batch inserts and deletes in one pass") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfop").toString
    val idx = s"$tmp/idx"
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 1)
    val all = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    def mutDf(rows: Seq[(Long, Seq[Float], String)]) = rows
      .toDF("vec_id", "raw", "op")
      .select($"vec_id", $"raw".cast("array<float>").as("embedding"), $"op")
    // batch 0: insert everything
    Ivf.appendBatch(mutDf(all.toSeq.map { case (id, e) => (id, e, "c") }),
      $"embedding", centers, idx, 0L, opCol = Some($"op"))
    assert(Ivf.readIndex(spark, idx).count() === all.length.toLong)
    // batch 1: one mixed mutation batch — delete vec 1, upsert vec 2
    val e2 = all.find(_._1 == 2L).get._2
    Ivf.appendBatch(mutDf(Seq((1L, all.find(_._1 == 1L).get._2, "d"),
      (2L, e2, "u"))), $"embedding", centers, idx, 1L, opCol = Some($"op"))
    val ids = Ivf.readIndex(spark, idx).select($"vec_id").as[Long].collect()
    assert(!ids.contains(1L), "op=d row must tombstone the id")
    assert(ids.count(_ == 2L) === 1,
      "op=u must supersede the older row — a stale vector served next to " +
        "its replacement is the bug the upsert tombstone exists for")
    assert(ids.length === all.length - 1)
    // a replay of the mutation batch is idempotent on both lanes
    Ivf.appendBatch(mutDf(Seq((1L, all.find(_._1 == 1L).get._2, "d"),
      (2L, e2, "u"))), $"embedding", centers, idx, 1L, opCol = Some($"op"))
    val ids2 = Ivf.readIndex(spark, idx).select($"vec_id").as[Long].collect()
    assert(!ids2.contains(1L) && ids2.count(_ == 2L) === 1 &&
      ids2.length === ids.length, "replayed mutation batch changed the index")
    // the superseded row leaves PHYSICALLY at compaction too
    Ivf.compactIndex(spark, idx)
    val f = graft.stream.Snapshots.resolve(spark, s"$idx/.compact").get
    val gen = graft.stream.Snapshots.readVersion(spark, s"$idx/.compact", f)
    assert(gen.filter($"vec_id" === 2L).count() === 1L,
      "compaction fold kept the stale upsert victim")
    assert(gen.filter($"vec_id" === 1L).count() === 0L)
  }

  test("delete-only intervals still fold: tombstones advance the horizon") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfdel").toString
    val idx = s"$tmp/idx"
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 1)
    val n = emb.count()
    Ivf.appendBatch(emb.select($"vec_id", $"embedding"), $"embedding",
      centers, idx, 0L)
    val f0 = Ivf.compactIndex(spark, idx)
    assert(f0 === Some(0L))
    // append-idle, delete-heavy interval: tombstones only
    Ivf.appendTombstones(Seq(3L).toDF("vec_id"), idx, 1L)
    Ivf.appendTombstones(Seq(5L).toDF("vec_id"), idx, 2L)
    // r8 advice: this fold must NOT early-return — the horizon
    // advances on tombstone batches alone, the deletes leave the
    // generation physically, and the tombstone slices get pruned
    val f1 = Ivf.compactIndex(spark, idx)
    assert(f1 === Some(2L),
      s"delete-only fold must advance the horizon to the tombstone batch, got $f1")
    val gen = graft.stream.Snapshots.readVersion(spark, s"$idx/.compact", 2L)
    assert(gen.filter($"vec_id".isin(3L, 5L)).count() === 0L,
      "delete-only fold left the deleted rows in the generation")
    assert(gen.count() === n - 2)
    // the NEXT fold prunes the folded tombstone slices (grace policy)
    Ivf.compactIndex(spark, idx)
    val troot = new org.apache.hadoop.fs.Path(s"$idx/.tombstones")
    val fs = troot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tombLeft =
      if (!fs.exists(troot)) 0
      else fs.listStatus(troot).count(_.getPath.getName.startsWith("batch_id="))
    assert(tombLeft === 0,
      s"folded tombstone slices must prune after the grace fold, $tombLeft left")
    // reads agree throughout
    val ids = Ivf.readIndex(spark, idx).select($"vec_id").as[Long].collect()
    assert(!ids.contains(3L) && !ids.contains(5L) && ids.length === (n - 2).toInt)
  }

  test("drift monitor flags geometric drift; partial refit repairs only drifted cells") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfdrift").toString
    val idx = s"$tmp/idx"
    def mk(ids: Range, cx: Double, cy: Double) = ids.map(i =>
      (i.toLong, Array((cx + (i % 5) * 0.01).toFloat, (cy + (i % 7) * 0.01).toFloat)))
    val base = (mk(0 until 100, 0, 0) ++ mk(100 until 200, 10, 10))
      .toDF("vec_id", "embedding")
    val centers = Ivf.fit(base, $"embedding", Seq($"vec_id"), k = 2, iters = 3, dims = 2)
    Ivf.writeIndex(base, $"embedding", $"vec_id", centers, idx, numFiles = 4)
    val baseline = Ivf.cellStats(spark.read.parquet(idx), centers)
      .localCheckpoint(true) // pin before the index is rewritten under it
    val cellA = Ivf.nearestCells(centers, Array(0.0, 0.0), 1).head
    val cellB = Ivf.nearestCells(centers, Array(10.0, 10.0), 1).head

    // the corpus DRIFTS: cluster A's members move to (3,3) while the
    // quantizer stays pinned — same counts, broken geometry
    val drifted = (mk(0 until 100, 3, 3) ++ mk(100 until 200, 10, 10))
      .toDF("vec_id", "embedding")
    Ivf.writeIndex(drifted, $"embedding", $"vec_id", centers, idx, numFiles = 4)
    val report = Ivf.driftReport(spark.read.parquet(idx), centers, baseline)
      .collect().map(r => r.getInt(0) ->
        r.getDouble(r.fieldIndex("drift_ratio"))).toMap
    assert(report(cellA) > 2.0, s"drifted cell must flag: ${report(cellA)}")
    assert(report(cellB) < 1.5, s"stable cell must not flag: ${report(cellB)}")

    val updated = Ivf.refitDriftedCells(spark, idx, centers, baseline,
      driftFactor = 2.0, minRows = 1, iters = 3)
    assert(updated(cellB).toSeq === centers(cellB).toSeq,
      "untouched cell's centroid must be preserved exactly")
    assert(math.abs(updated(cellA)(0) - 3.02) < 0.2 &&
      math.abs(updated(cellA)(1) - 3.03) < 0.2,
      s"refit centroid must re-seed at the drifted mass: ${updated(cellA).toSeq}")
    // a second report against the refit quantizer shows recovery
    val after = Ivf.driftReport(spark.read.parquet(idx), updated, baseline)
      .collect().map(r => r.getInt(0) ->
        r.getDouble(r.fieldIndex("mean_dist_sq"))).toMap
    assert(after(cellA) < 0.01, s"refit must restore tight geometry: $after")
    // and the routed search serves the drifted cluster again at nProbe=1
    val got = Ivf.search(spark, idx, updated, Array(3.0f, 3.0f),
        nProbe = 1, topK = 5)
      .select($"vec_id").as[Long].collect().toSet
    assert(got.forall(_ < 100), s"post-refit probe must route to the moved mass: $got")
  }

  test("index schema evolution: column added to later appends null-fills, survives fold") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfevo").toString
    val idx = s"$tmp/idx"
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 1)
    val half = emb.count() / 2
    // batch 0: the original shape (vec_id, embedding)
    Ivf.appendBatch(emb.filter($"vec_id" < half).select($"vec_id", $"embedding"),
      $"embedding", centers, idx, 0L)
    Ivf.compactIndex(spark, idx) // pre-evolution generation
    // batch 1: a metadata column (`source`) added mid-stream
    Ivf.appendBatch(
      emb.filter($"vec_id" >= half)
        .select($"vec_id", $"embedding", lit("crawl2").as("source")),
      $"embedding", centers, idx, 1L)
    val read1 = Ivf.readIndex(spark, idx)
    assert(read1.columns.contains("source"),
      "added column must surface through readIndex")
    assert(read1.filter($"vec_id" < half && $"source".isNotNull).count() === 0L,
      "pre-evolution rows must null-fill the added column")
    assert(read1.filter($"vec_id" >= half && $"source" === "crawl2").count()
      === emb.count() - half)
    assert(read1.count() === emb.count())
    // the fold preserves the union schema (old generation null-fills)
    Ivf.compactIndex(spark, idx)
    val read2 = Ivf.readIndex(spark, idx)
    assert(read2.columns.contains("source") && read2.count() === emb.count())
    assert(read2.filter($"source" === "crawl2").count() === emb.count() - half)
    // search paths serve through the evolved index unchanged, and can
    // PREDICATE on the evolved column (filtered ANN over new metadata)
    val queries = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val got = Ivf.searchBatch(spark, idx, centers, queries,
      nProbe = 4, topK = 5, excludeSelf = true,
      predicate = Some($"source" === "crawl2"))
    assert(got.count() === 5)
    assert(got.select($"vec_id").as[Long].collect().forall(_ >= half),
      "predicate on the evolved column must bind")
  }

  test("a null op in a CDC batch fails fast instead of dropping the row") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfnull").toString
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 2, iters = 1)
    val bad = Seq((1L, Seq(0.1f, 0.2f), "c"), (2L, Seq(0.3f, 0.4f), null))
      .toDF("vec_id", "raw", "op")
      .select($"vec_id", $"raw".cast("array<float>").as("embedding"), $"op")
    val e = intercept[Exception] {
      Ivf.appendBatch(bad, $"embedding", centers, s"$tmp/idx", 0L,
        opCol = Some($"op"))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("null op")),
      s"expected the fail-fast null-op signal, got: ${msgs(e)}")
  }

  test("ragged embeddings assign to NULL and are excluded from fit means") {
    val data = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(1.0f)), (2L, Array(0.1f, 0.1f))
    ).toDF("vec_id", "embedding")
    val centers = Ivf.fit(data, $"embedding", Seq($"vec_id"), k = 1, iters = 1, dims = 2)
    // the 1-element vector must not enter the mean (a NULL cell group
    // would alias cell 0): centroid = mean(v0, v2) exactly
    assert(math.abs(centers(0)(0) - 0.05) < 1e-6 &&
      math.abs(centers(0)(1) - 0.05) < 1e-6,
      s"ragged vector corrupted the centroid: ${centers(0).toSeq}")
    val cells = Ivf.assign(data, $"embedding", centers).select($"cell").collect()
    assert(cells.count(_.isNullAt(0)) === 1, "ragged vector must assign to NULL")
  }

  test("empty cells keep their previous centroid (stable indices)") {
    // two far-apart 2-dim clusters, k=3 seeded so one seed empties out
    val data = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.1f, 0.0f)), (2L, Array(0.0f, 0.1f)),
      (3L, Array(10f, 10f)), (4L, Array(10.1f, 10f)), (5L, Array(10f, 10.1f))
    ).toDF("vec_id", "embedding")
    val centers = Ivf.fit(data, $"embedding", Seq($"vec_id"), k = 3, iters = 3, dims = 2)
    assert(centers.length === 3)
    assert(centers.forall(_.length === 2))
    assert(centers.forall(c => c.forall(x => !x.isNaN)))
  }

  test("nearest_cells routes like the driver-side nearestCells, ties included") {
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 6, iters = 1)
    // a duplicated centroid forces a distance tie → lowest cell wins
    val rigged = centers :+ centers(2).clone()
    val got = emb.select($"vec_id",
        graft.functions.nearest_cells($"embedding", rigged, 3).as("cells"))
      .as[(Long, Seq[Int])].collect()
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    got.foreach { case (id, cells) =>
      assert(cells === Ivf.nearestCells(rigged, vecs(id), 3), s"vec $id")
    }
    // ragged vector → NULL routing
    val ragged = Seq((1L, Array(0.1f, 0.2f))).toDF("vec_id", "embedding")
      .select(graft.functions.nearest_cells($"embedding", rigged, 2).as("c"))
      .collect()
    assert(ragged.head.isNullAt(0))
  }

  test("searchBatch == searchBatchOf == per-query search, with pruned probes") {
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 6, iters = 2)
    val idx = java.nio.file.Files.createTempDirectory("ivf_batch").toString
    Ivf.writeIndex(emb, $"embedding", $"vec_id", centers, idx)
    val queries = emb.filter($"vec_id" < 4)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))

    val viaIndex = Ivf.searchBatch(spark, idx, centers, queries,
      nProbe = 2, topK = 5, excludeSelf = true)
    val viaFrame = Ivf.searchBatchOf(Ivf.assign(emb, $"embedding", centers),
      queries, centers, nProbe = 2, topK = 5, excludeSelf = true)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "rank").as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows(viaIndex) === rows(viaFrame),
      "persisted-index batch must equal the assigned-frame batch")

    // per-query singles agree (same routing, same rerank order)
    val qs = queries.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    qs.foreach { case (qid, qe) =>
      val single = Ivf.search(spark, idx, centers, qe, nProbe = 2, topK = 6)
        .filter($"vec_id" =!= qid).limit(5)
        .select($"vec_id").as[Long].collect().toSeq
      val batch = rows(viaIndex).filter(_._1 == qid).map(_._3)
      assert(batch === single, s"query $qid")
    }

    // the file scan must partition-prune to the probed cells
    // (sparkPlan: the pre-adaptive physical plan exposes the scan
    // nodes directly; under AQE executedPlan wraps them in stages)
    val scans = viaIndex.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains(idx)) => f
    }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "batch search over a partitioned index must carry partition filters")
  }

  test("IVFADC batch serving == the per-query chain, plain and residual") {
    import graft.ops.Pq
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 6, iters = 2)
    val queries = emb.filter($"vec_id" < 4)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val qs = queries.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)

    for (residual <- Seq(false, true)) {
      val assigned = Ivf.assign(emb, $"embedding", centers)
      val src =
        if (residual) Pq.residual($"embedding", $"cell", centers)
        else $"embedding"
      val cb = Pq.fit(assigned, src, Seq($"vec_id"), m = 8, k = 16, iters = 1)
      val idx = java.nio.file.Files.createTempDirectory("ivfadc").toString
      Ivf.writeIndexPq(emb, $"embedding", $"vec_id", centers, cb, idx,
        residual = residual)

      // 1. the persisted index carries codes identical to an inline encode
      val stored = spark.read.parquet(idx)
        .select($"vec_id", $"pq_code").as[(Long, Seq[Int])].collect().toMap
      Pq.encode(assigned, src, cb).select($"vec_id", $"pq_code")
        .as[(Long, Seq[Int])].collect()
        .foreach { case (id, c) => assert(stored(id) === c, s"vec $id codes") }

      // 2. distributed LUTs (pq_lut_l2 over the double query residual)
      //    are bit-equal to the driver-side Pq.lutL2 / residualLuts
      val (q0, qe0) = qs.head
      val cells0 = Ivf.nearestCells(centers, qe0.map(_.toDouble), 2)
      val expectLuts =
        if (residual) Pq.residualLuts(cb, centers, qe0.map(_.toDouble), cells0)
        else cells0.map(c => c -> Pq.lutL2(cb, qe0.map(_.toDouble)))
      val qd =
        if (residual)
          zip_with($"q_emb",
            element_at(typedlit(centers.map(_.toSeq).toSeq), $"cell" + lit(1)),
            (x, c) => x.cast("double") - c)
        else transform($"q_emb", x => x.cast("double"))
      val gotLuts = queries.filter($"q_id" === q0)
        .select($"q_id", explode(
          graft.functions.nearest_cells($"q_emb", centers, 2)).as("cell"))
        .join(queries, "q_id")
        .select($"cell", graft.functions.pq_lut_l2(qd, cb).as("lut"))
        .as[(Int, Seq[Seq[Double]])].collect().toMap
      expectLuts.foreach { case (c, lut) =>
        assert(gotLuts(c).map(_.toArray).toArray.map(_.toSeq) ===
          lut.map(_.toSeq).toSeq, s"cell $c lut (residual=$residual)")
      }

      // 3. batch == per-query chain (ADC cut then exact rerank)
      val batch = Ivf.searchPqBatch(spark, idx, centers, cb, queries,
        nProbe = 2, rerankC = 50, topK = 5, residual = residual,
        excludeSelf = true)
        .orderBy("q_id", "rank").as[(Long, Long, Long, Double)].collect().toSeq
      qs.foreach { case (qid, qe) =>
        val cells = Ivf.nearestCells(centers, qe.map(_.toDouble), 2)
        val luts =
          if (residual) Pq.residualLuts(cb, centers, qe.map(_.toDouble), cells)
          else cells.map(c => c -> Pq.lutL2(cb, qe.map(_.toDouble)))
        val cand = spark.read.parquet(idx)
          .filter($"cell".isin(cells.map(Integer.valueOf): _*) &&
            $"vec_id" =!= qid)
          .select($"vec_id", $"embedding",
            Pq.adcDistSqPerCell($"pq_code", $"cell", luts).as("adc"))
          .filter($"adc".isNotNull)
          .orderBy($"adc".asc, $"vec_id".asc).limit(50)
        val single = cand
          .select($"vec_id",
            graft.functions.cosine_sim($"embedding", typedlit(qe.toSeq)).as("s"))
          .orderBy($"s".desc, $"vec_id".asc).limit(5)
          .select($"vec_id").as[Long].collect().toSeq
        val got = batch.filter(_._1 == qid).map(_._3)
        assert(got === single, s"query $qid (residual=$residual)")
      }

      // 4. metric = "l2" reranks by 2·q·x − ‖x‖² (≡ −‖q−x‖²)
      val batchL2 = Ivf.searchPqBatch(spark, idx, centers, cb, queries,
        nProbe = 2, rerankC = 50, topK = 5, residual = residual,
        excludeSelf = true, metric = "l2")
        .orderBy("q_id", "rank").as[(Long, Long, Long, Double)].collect().toSeq
      qs.foreach { case (qid, qe) =>
        val cells = Ivf.nearestCells(centers, qe.map(_.toDouble), 2)
        val luts =
          if (residual) Pq.residualLuts(cb, centers, qe.map(_.toDouble), cells)
          else cells.map(c => c -> Pq.lutL2(cb, qe.map(_.toDouble)))
        val qLit = typedlit(qe.toSeq)
        val single = spark.read.parquet(idx)
          .filter($"cell".isin(cells.map(Integer.valueOf): _*) &&
            $"vec_id" =!= qid)
          .select($"vec_id", $"embedding",
            Pq.adcDistSqPerCell($"pq_code", $"cell", luts).as("adc"))
          .filter($"adc".isNotNull)
          .orderBy($"adc".asc, $"vec_id".asc).limit(50)
          .select($"vec_id",
            (lit(2.0) * graft.functions.dot_product($"embedding", qLit) -
              graft.functions.dot_product($"embedding", $"embedding")).as("s"))
          .orderBy($"s".desc, $"vec_id".asc).limit(5)
          .select($"vec_id").as[Long].collect().toSeq
        assert(batchL2.filter(_._1 == qid).map(_._3) === single,
          s"l2 query $qid (residual=$residual)")
      }
    }
  }

  test("splitHotCells bounds a drifted hot cell and preserves rows + search") {
    // skewed corpus indexed through a STALE quantizer (fit on a
    // uniform twin) — the drift scenario that concentrates the hot
    // cluster into few cells (IVF_ZIPF.json at probe scale)
    val skewed = tools.VectorGenerator.corpus(spark, 3000, nClusters = 4,
      zipfS = 1.5).cache()
    val uniform = tools.VectorGenerator.corpus(spark, 3000, nClusters = 4)
    val stale = Ivf.fit(uniform, $"embedding", Seq($"vec_id"), k = 8, iters = 2)
    val idx = java.nio.file.Files.createTempDirectory("ivf_split").toString
    Ivf.writeIndex(skewed, $"embedding", $"vec_id", stale, idx)
    val preSizes = spark.read.parquet(idx).groupBy("cell").count()
      .as[(Int, Long)].collect().toMap
    val capRows = (0.1 * 3000).toLong
    assert(preSizes.values.max > capRows, "fixture must have a hot cell")

    val expanded = Ivf.splitHotCells(spark, idx, stale, capShare = 0.1)
    assert(expanded.length > stale.length, "split must add cells")
    // untouched cells keep their centroids and ids
    val hotPre = preSizes.filter(_._2 > capRows).keySet
    stale.indices.filterNot(hotPre).foreach(j =>
      assert(java.util.Arrays.equals(expanded(j), stale(j)), s"cell $j moved"))

    val post = spark.read.parquet(idx)
    val postSizes = post.groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(postSizes.values.sum === 3000, "rows lost or duplicated")
    assert(post.select("vec_id").distinct().count() === 3000)
    assert(postSizes.values.max < preSizes.values.max,
      "hottest cell must shrink")
    // every row sits in its own former cell's sub-cell region: its
    // stored cell's centroid must be one of the expanded set (sanity
    // that ids map inside the quantizer)
    assert(postSizes.keySet.forall(c => c >= 0 && c < expanded.length))

    // search through the expanded quantizer still finds the true
    // neighbors (probe every cell → exactness is structural)
    val q = skewed.filter($"vec_id" === 7L).select($"embedding")
      .as[Array[Float]].head()
    val got = Ivf.search(spark, idx, expanded, q, nProbe = expanded.length, 5)
      .select("vec_id").as[Long].collect().toSeq
    val brute = skewed.select($"vec_id",
        graft.functions.cosine_sim($"embedding", typedlit(q.toSeq)).as("s"))
      .orderBy($"s".desc, $"vec_id".asc).limit(5)
      .select("vec_id").as[Long].collect().toSeq
    assert(got === brute, "full-probe search must stay exact post-split")
    skewed.unpersist(); ()
  }

  test("fit rejects a dims that contradicts the seed vectors' width") {
    val data = Seq((0L, Array(0.1f, 0.2f, 0.3f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Ivf.fit(data, $"embedding", Seq($"vec_id"), k = 1, iters = 1, dims = 64)
    }
    assert(e.getMessage.contains("width 3"))
  }

  /** Live batch_id slice dirs currently on disk (the small-file
    * metric compaction must bound). */
  private def liveSlices(idx: String): Seq[String] = {
    val root = new java.io.File(idx)
    if (!root.exists()) return Seq.empty
    root.listFiles().toSeq.filter(d => d.isDirectory && d.getName.startsWith("cell="))
      .flatMap(_.listFiles().toSeq.filter(d =>
        d.isDirectory && d.getName.startsWith("batch_id=")))
      .map(_.toString)
  }

  private def topIds(idx: String, centers: Array[Array[Double]],
      q: Array[Float]): Seq[Long] =
    Ivf.search(spark, idx, centers, q, nProbe = 4, topK = 10)
      .select($"vec_id").as[Long].collect().toSeq

  test("index deletes: tombstoned id unfindable, folds physically, revives on re-append") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfd").toString
    val idx = s"$tmp/idx"
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 2)
    val all = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    def toVecDf(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "raw")
      .select($"vec_id", $"raw".cast("array<float>").as("embedding"))
    val (b0, b1) = all.splitAt(all.length / 2)
    Ivf.appendBatch(toVecDf(b0.toSeq), $"embedding", centers, idx, 0L)
    Ivf.appendBatch(toVecDf(b1.toSeq), $"embedding", centers, idx, 1L)

    // the victim: vec 0, queried by its own embedding — the one match
    // a search can never miss while the row exists
    val victim = 0L
    val qEmb = all.find(_._1 == victim).get._2.toArray
    assert(topIds(idx, centers, qEmb).contains(victim))

    // delete at batch 2 → unfindable via EVERY search path, merge-on-read
    Ivf.appendTombstones(Seq(victim).toDF("vec_id"), idx, 2L)
    assert(Ivf.readIndex(spark, idx).count() === all.length - 1L)
    assert(!topIds(idx, centers, qEmb).contains(victim),
      "single-query search returned a deleted id")
    val queries = Seq((victim, all.find(_._1 == victim).get._2))
      .toDF("q_id", "raw")
      .select($"q_id", $"raw".cast("array<float>").as("q_emb"))
    val batchIds = Ivf.searchBatch(spark, idx, centers, queries,
      nProbe = 4, topK = 10).select($"vec_id").as[Long].collect().toSet
    assert(!batchIds.contains(victim), "batch search returned a deleted id")

    // replayed delete slice (crash-replay contract): no change
    Ivf.appendTombstones(Seq(victim).toDF("vec_id"), idx, 2L)
    assert(Ivf.readIndex(spark, idx).count() === all.length - 1L)

    // compaction folds the delete out PHYSICALLY: the committed
    // generation itself no longer holds the row
    val f1 = Ivf.compactIndex(spark, idx).get
    val gen = graft.stream.Snapshots.readVersion(spark, s"$idx/.compact", f1)
    assert(gen.filter($"vec_id" === victim).count() === 0L,
      "deleted row survived the compaction fold")
    assert(Ivf.readIndex(spark, idx).count() === all.length - 1L)
    assert(!topIds(idx, centers, qEmb).contains(victim))

    // re-append at a LATER batch revives the id (LWW by batch)
    Ivf.appendBatch(toVecDf(Seq(victim -> all.find(_._1 == victim).get._2)),
      $"embedding", centers, idx, 5L)
    assert(Ivf.readIndex(spark, idx).count() === all.length.toLong)
    assert(topIds(idx, centers, qEmb).contains(victim),
      "re-appended id still suppressed by an older tombstone")

    // fold the revival; the ≤-horizon tombstone slice enters the prune
    // manifest and the NEXT compaction deletes it — bounded tombstone
    // footprint, no ghost resurrection risk
    Ivf.compactIndex(spark, idx)
    Ivf.appendBatch(toVecDf(Seq(999999L -> all.head._2)),
      $"embedding", centers, idx, 7L)
    Ivf.compactIndex(spark, idx)
    val tombDirs = {
      val p = new org.apache.hadoop.fs.Path(s"$idx/.tombstones")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.filter(_.getPath.getName.startsWith("batch_id="))
    }
    assert(tombDirs.isEmpty, s"expired tombstone slices not pruned: $tombDirs")
    assert(topIds(idx, centers, qEmb).contains(victim))
    assert(Ivf.readIndex(spark, idx).count() === all.length.toLong + 1)
  }

  test("index compaction bounds live slices, dedups exactly, and survives retry") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfc").toString
    val idx = s"$tmp/idx"
    val centers = Ivf.fit(emb, $"embedding", Seq($"vec_id"), k = 4, iters = 2)
    val all = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val qEmb = all.find(_._1 == 0L).get._2.toArray
    // 6 micro-batches of appends
    val chunks = all.grouped(math.max(1, all.length / 6)).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      Ivf.appendBatch(c.toSeq.toDF("vec_id", "raw")
        .select($"vec_id", $"raw".cast("array<float>").as("embedding")),
        $"embedding", centers, idx, i.toLong)
    }
    val preSlices = liveSlices(idx).size
    assert(preSlices >= 6, s"expected >=6 live slices, got $preSlices")
    val preTop = topIds(idx, centers, qEmb)

    // first compaction: fold everything; folded slices stay on disk
    // (reader grace) but the reader must not see duplicates
    val f1 = Ivf.compactIndex(spark, idx)
    assert(f1.exists(_ >= chunks.length - 1L))
    assert(Ivf.readIndex(spark, idx).count() === all.length.toLong,
      "compacted reader saw folded-slice duplicates or losses")
    assert(topIds(idx, centers, qEmb) === preTop,
      "probe results changed across compaction")

    // retry at the same horizon is a no-op (nothing new to fold)
    assert(Ivf.compactIndex(spark, idx) === f1)
    assert(Ivf.readIndex(spark, idx).count() === all.length.toLong)

    // new appends land live and are visible beyond the horizon
    Ivf.appendBatch(all.take(0).toSeq.toDF("vec_id", "raw")
      .select($"vec_id", $"raw".cast("array<float>").as("embedding")),
      $"embedding", centers, idx, 100L) // empty batch: harmless slice
    val extra = Seq((9999L, all.head._2)).toDF("vec_id", "raw")
      .select($"vec_id", $"raw".cast("array<float>").as("embedding"))
    Ivf.appendBatch(extra, $"embedding", centers, idx, 101L)
    assert(Ivf.readIndex(spark, idx).count() === all.length.toLong + 1)
    val midTop = topIds(idx, centers, qEmb) // incl. the live tail row

    // second compaction folds the tail AND prunes the first round's
    // folded slices — live slice count is now bounded by the cadence,
    // not the stream's lifetime
    Ivf.compactIndex(spark, idx)
    val postSlices = liveSlices(idx).size
    assert(postSlices <= 2, s"folded slices not pruned: $postSlices live dirs")
    assert(Ivf.readIndex(spark, idx).count() === all.length.toLong + 1)
    val postTop = topIds(idx, centers, qEmb)
    assert(postTop === midTop, "probe results drifted after second compaction")

    // probes on the compacted generation still prune cell partitions
    val plan = Ivf.search(spark, idx, centers, qEmb, nProbe = 2, topK = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell") ||
      plan.contains("PartitionFilters: [isnotnull(cell"),
      s"compacted probe lost partition pruning:\n$plan")

    // batch serving composes with the compacted layout: searchBatch
    // reads through readIndex (committed generation + live tail), so
    // its top-k must match the per-query singles on the SAME index
    val queries = all.take(3).toSeq.toDF("q_id", "raw")
      .select($"q_id", $"raw".cast("array<float>").as("q_emb"))
    val batch = Ivf.searchBatch(spark, idx, centers, queries,
        nProbe = 4, topK = 10, excludeSelf = true)
      .orderBy("q_id", "rank")
      .select($"q_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    all.take(3).foreach { case (qid, raw) =>
      val single = Ivf.search(spark, idx, centers, raw.toArray,
          nProbe = 4, topK = 11)
        .filter($"vec_id" =!= qid).limit(10)
        .select($"vec_id").as[Long].collect().toSeq
      assert(batch(qid) === single,
        s"batch over the compacted index diverged for query $qid")
    }
  }

  test("q_ann_recall contract: recall = hits/5, bounded, non-degenerate") {
    val dir = sf("sf0.001")
    val rows = SparkEntry.queries("q_ann_recall")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq === (0L until 8L).toSeq)
    rows.foreach { case (q, hits, recall) =>
      assert(hits >= 0 && hits <= 5, s"query $q hits=$hits")
      assert(recall === hits.toDouble / 5, s"query $q recall!=hits/5")
    }
    // nProbe=2 of 8 cells on a clustered corpus must find SOMETHING:
    // an all-zero recall row would mean routing is broken, not "low
    // recall"
    assert(rows.map(_._2).sum > 0, "IVF leg found no true neighbors at all")
  }

  test("topic sample flattens cell mass: sqrt rates, small cells keep all") {
    val out = graft.SparkEntry.queries("q_topic_sample")(spark, dir)
      .select($"vec_id", $"cell", $"rate_bp")
      .as[(Long, Long, Int)].collect()
    assert(out.nonEmpty)
    val rates = out.map(r => r._2 -> r._3).toMap
    // the smallest cell keeps with certainty; at least one larger
    // cell is genuinely downsampled (or the thresholds are vacuous)
    assert(rates.values.max == 10000, s"min cell must keep all: $rates")
    assert(rates.values.min < 10000, s"no cell downsampled: $rates")
    // deterministic: a rerun keeps the SAME vectors
    val again = graft.SparkEntry.queries("q_topic_sample")(spark, dir)
      .select($"vec_id").as[Long].collect().toSet
    assert(again == out.map(_._1).toSet)
  }

  test("q_ann_postfilter rides the dense branch and equals the routed replay") {
    // the declared dense-branch pin (r18 verdict #2): bruteMax=100
    // forces the post-filter plan at every scale (the in-query
    // autoDecide require guards it), and at half-density no query
    // escalates — so the persisted-index auto serve must equal the
    // assign-on-the-fly routed serve q_ann_filtered pins against the
    // fit-replay oracle
    val a = graft.SparkEntry.queries("q_ann_filtered")(spark, dir).collect()
    val b = graft.SparkEntry.queries("q_ann_postfilter")(spark, dir).collect()
    assert(a.nonEmpty)
    assert(b.toSeq === a.toSeq)
  }

  test("auto switch decides from per-cell stats over a live mutated index") {
    // r18 verdict #1: the decide step must be O(cells) from maintained
    // stats — not a merge-on-read corpus fold per serve — and choose
    // the correct branch at every horizon of an appended + tombstoned
    // index, with the brute leg serving the MERGED view.
    val tmp = java.nio.file.Files.createTempDirectory("ivfstat").toString
    val idx = s"$tmp/idx"
    val e = emb.select($"vec_id", $"embedding")
    val centers = Ivf.fit(e, $"embedding", Seq($"vec_id"), k = 4, iters = 1)
    def liveCount: Long = Ivf.readIndex(spark, idx).count()
    def statsTotal: Long = Ivf.statsCount(spark, idx)
    def scannedRoots(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      import org.apache.spark.sql.execution.FileSourceScanExec
      df.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
      }.flatten
    }

    // -- horizon A: insert-only append ------------------------------
    Ivf.appendBatch(e.filter($"vec_id" % 2 === 0), $"embedding", centers,
      idx, 0L)
    val nA = liveCount
    assert(statsTotal === nA, "stats must count the appended slice exactly")
    val dA = Ivf.autoDecide(spark, idx, None, bruteMax = nA)
    assert(dA.branch === "brute" && dA.source === "stats" &&
      dA.survivors === nA)
    val dA2 = Ivf.autoDecide(spark, idx, None, bruteMax = nA - 1)
    assert(dA2.branch === "adaptive" && dA2.source === "stats",
      s"no pending deletes: stats alone must decide, got $dA2")
    // decide-step plan pin: the stats frame scans ONLY the stats
    // store — no cell=… data path, no merged index view
    val statPaths = scannedRoots(Ivf.indexStats(spark, idx))
    assert(statPaths.nonEmpty &&
      statPaths.forall(_.contains("/.stats")), s"scanned: $statPaths")

    // -- horizon B: tombstone a slice of the corpus -----------------
    val delIds = e.filter($"vec_id" % 2 === 0 && $"vec_id" % 5 === 0)
      .select($"vec_id")
    val nDel = delIds.count()
    Ivf.appendTombstones(delIds, idx, 1L)
    val nB = liveCount
    assert(nB === nA - nDel)
    assert(statsTotal === nA, "inserted-rows stats don't see deletes")
    assert(Ivf.pendingDeleteRows(spark, idx) === nDel)
    // upper ≤ bruteMax → brute from stats (the sound upper bound)
    val dB1 = Ivf.autoDecide(spark, idx, None, bruteMax = nA)
    assert(dB1.branch === "brute" && dB1.source === "stats")
    // upper − pending > bruteMax → adaptive from stats
    val dB2 = Ivf.autoDecide(spark, idx, None, bruteMax = nB - 1)
    assert(dB2.branch === "adaptive" && dB2.source === "stats" &&
      dB2.survivors === nB)
    // the ambiguous band (nB ≤ bruteMax < nA) needs the exact merged
    // count — and must land on the branch the true count implies
    val dB3 = Ivf.autoDecide(spark, idx, None, bruteMax = nB)
    assert(dB3.branch === "brute" && dB3.source === "full-count-ambiguous" &&
      dB3.survivors === nB)

    // brute leg on the merged view: a deleted vector is NEVER served,
    // and recall is 1.0 against a driver-side exact top-k of the live
    // rows (independent of every serving code path)
    val q0 = e.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toArray.map(_.toDouble)
    val queries = Seq((0L, q0.map(_.toFloat).toSeq)).toDF("q_id", "q_emb")
    val served = Ivf.searchBatchAuto(spark, idx, centers, queries,
      nProbe = 1, topK = 10, excludeSelf = true, bruteMax = nA)
      .select($"vec_id").as[Long].collect().toSeq
    val deleted = delIds.as[Long].collect().toSet
    assert(served.nonEmpty && served.forall(!deleted.contains(_)),
      "brute leg served a tombstoned vector")
    val liveRows = Ivf.readIndex(spark, idx)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = liveRows.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v.toArray.map(_.toDouble), q0)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
    assert(served === expected, "brute leg recall must be 1.0 on the live view")

    // -- horizon C: second insert batch past the tombstones ---------
    Ivf.appendBatch(e.filter($"vec_id" % 2 === 1), $"embedding", centers,
      idx, 2L)
    val nC = liveCount
    assert(statsTotal === nC + nDel, "stats = inserted rows across slices")
    val dC = Ivf.autoDecide(spark, idx, None, bruteMax = nC - 1)
    assert(dC.branch === "adaptive" && dC.source === "stats")

    // -- horizon D: compaction folds deletes + republishes stats ----
    assert(Ivf.compactIndex(spark, idx) === Some(2L))
    assert(liveCount === nC, "compaction must not change the served view")
    assert(statsTotal === nC, "gen stats are post-fold: deletes are out")
    assert(Ivf.pendingDeleteRows(spark, idx) === 0L)
    val dD = Ivf.autoDecide(spark, idx, None, bruteMax = nC)
    assert(dD.branch === "brute" && dD.source === "stats" &&
      dD.survivors === nC, s"compacted horizon must decide exactly: $dD")
    val dD2 = Ivf.autoDecide(spark, idx, None, bruteMax = nC - 1)
    assert(dD2.branch === "adaptive" && dD2.source === "stats")
    // plan pin at the compacted horizon: only the published gen stats
    val genPaths = scannedRoots(Ivf.indexStats(spark, idx))
    assert(genPaths.nonEmpty &&
      genPaths.forall(_.contains("/.compact_stats")), s"scanned: $genPaths")

    // caller-amortized decide: one decision reused across serves
    val dCaller = Ivf.autoDecide(spark, idx, None, bruteMax = nC,
      survivorCount = Some(dD.survivors))
    assert(dCaller.branch === "brute" && dCaller.source === "caller")
    val servedD = Ivf.searchBatchAuto(spark, idx, centers, queries,
      nProbe = 1, topK = 10, excludeSelf = true, bruteMax = nC,
      survivorCount = Some(dD.survivors))
      .select($"vec_id").as[Long].collect().toSeq
    assert(servedD.forall(!deleted.contains(_)))
  }
}
