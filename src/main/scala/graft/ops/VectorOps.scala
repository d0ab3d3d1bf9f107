package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import Util._

/** Embedding similarity-search operators (builder-prompt north star):
  * brute-force cosine top-k as the exactness baseline, pairwise
  * near-dup by cosine, and an LSH-bucketed approximate path for scale.
  *
  * Determinism: all dot products are computed as an explicit
  * left-to-right fold over float→double-cast elements — the identical
  * op sequence is spelled in the DuckDB oracle (list_zip +
  * list_transform + sequential sum), so even floating-point results
  * hash-match. Ranking always tie-breaks on vec_id.
  *
  * Scale shape: brute-force top-k against ONE query vector is a
  * broadcast of the query + a single map-side pass and a k-row
  * TakeOrdered — no shuffle of the corpus; the all-pairs query is
  * label-blocked; the LSH path buckets by sign-pattern so candidate
  * generation is a hash join on the bucket key.
  */
object VectorOps {

  /** Sequential-fold dot product of two float arrays, in double.
    * (Reference formulation; the declared queries use the native
    * [[graft.functions.CosineSim]] expression, which runs the same op
    * sequence as a codegen'd primitive loop.) */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(list_zip($a, $b), " +
      s"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (x, y) -> x + y)"

  /** L2 norm (same fold). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"

  /** Squared L2 distance of a float-list column vs a double-list
    * column, as the sequential fold ((0 + t₁²) + t₂²) + … — the DuckDB
    * spelling of [[graft.functions.NearestCentroidUtil.nearest]]'s
    * per-centroid loop (and [[Ivf.distSq]]), so k-means assignments
    * match bit-for-bit cross-engine. */
  def distSqSql(e: String, c: String): String = distSqSliceSql(e, c, 1, 64)

  /** [[distSqSql]] over a SLICE of `e`: elements `start…start+len−1`
    * (1-based) against a len-element centroid list — the PQ subspace
    * form (the slice is never materialized; indexing is offset). */
  def distSqSliceSql(e: String, c: String, start: Int, len: Int): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, ${len + 1}), i -> " +
      s"(CAST($e[${start - 1} + i] AS DOUBLE) - $c[i]) * " +
      s"(CAST($e[${start - 1} + i] AS DOUBLE) - $c[i]))), (x, y) -> x + y)"

  /** Deterministic pseudo-random hyperplane weights for sign-LSH,
    * derived from md5 so the DuckDB oracle reproduces them exactly:
    * w(j,i) = (hash60("hp<j>_<i>") % 2001 − 1000) / 1000 ∈ [−1, 1]. */
  /** One Lloyd assignment pass in DuckDB: nearest (squared-L2,
    * sequential fold) centroid from table `$src(cell, c)`, ties →
    * lowest cell. Shared by the fit-replay oracles. */
  private def fitAssignSql(src: String): String =
    s"""SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${distSqSql("e.embedding", "c.c")} ASC, c.cell ASC) AS rn
       |    FROM embeddings e CROSS JOIN $src c) WHERE rn = 1""".stripMargin

  /** DuckDB replay of `Ivf.fit(k = 8, iters = 2)` (seeds = first 8
    * rows by vec_id) as a CTE list ending in `c2(cell, c)` — the
    * same seeds, assignment expression, and DECIMAL(28,9) means as
    * the Spark fit, so the quantizers are bit-equal (order-free
    * decimal sums). Shared prefix of the q_ann_ivf_built and
    * q_ivf_batch oracles. */
  private def fitReplayCtes: String = {
    // decimal-exact per-dimension means of one assignment
    def meansSql(a: String) =
      s"""SELECT cell, i AS dim,
         |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE)
         |      / count(*) AS cd
         |  FROM $a, dims GROUP BY cell, i""".stripMargin
    s"""dims AS (SELECT unnest(range(1, 65)) AS i),
       |seeds AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
       |    list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE)) AS c
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
       |a1 AS (${fitAssignSql("seeds")}),
       |m1d AS (${meansSql("a1")}),
       |m1 AS (SELECT cell, array_agg(cd ORDER BY dim) AS c FROM m1d GROUP BY cell),
       |c1 AS (SELECT s.cell, COALESCE(m.c, s.c) AS c
       |       FROM seeds s LEFT JOIN m1 m USING (cell)),
       |a2 AS (${fitAssignSql("c1")}),
       |m2d AS (${meansSql("a2")}),
       |m2 AS (SELECT cell, array_agg(cd ORDER BY dim) AS c FROM m2d GROUP BY cell),
       |c2 AS (SELECT p.cell, COALESCE(m.c, p.c) AS c
       |       FROM c1 p LEFT JOIN m2 m USING (cell))""".stripMargin
  }

  /** Fit-replay oracle of FILTERED routed-probe serving (fit k=8/
    * iters=2, queries vec_id<8, nProbe 2, predicate label%2=0, top-5,
    * self-excluded, round 6) — ONE definition behind q_ann_filtered
    * (assign-on-the-fly searchBatchOf) and q_ann_postfilter (the auto
    * switch's dense branch over the persisted index): both serve the
    * identical fit + routing + predicate + rank chain. */
  private def filteredAnnOracleSql: String =
    s"""WITH $fitReplayCtes,
       |qs AS (SELECT vec_id AS q_id, embedding AS q_emb
       |       FROM embeddings WHERE vec_id < 8),
       |routed AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q.q_id, c.cell,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${distSqSql("q.q_emb", "c.c")} ASC, c.cell ASC) AS rn
       |    FROM qs q CROSS JOIN c2 c) WHERE rn <= 2),
       |af AS (${fitAssignSql("c2")}),
       |sc AS (
       |  SELECT q.q_id, e.vec_id,
       |    ${roundToSql(cosineSql("e.embedding", "q.q_emb"), 6)} AS cos_sim
       |  FROM af e JOIN routed r ON e.cell = r.cell
       |  JOIN qs q ON q.q_id = r.q_id
       |  JOIN embeddings em ON em.vec_id = e.vec_id
       |  WHERE e.vec_id <> q.q_id AND em.label % 2 = 0),
       |rk AS (
       |  SELECT q_id, vec_id, cos_sim,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos_sim DESC, vec_id ASC) AS rank
       |  FROM sc)
       |SELECT q_id, rank, vec_id, cos_sim FROM rk
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** The batched IVF serving leg (fit k=8/iters=2, queries vec_id<8,
    * nProbe 2, top-5, self-excluded) — ONE definition behind
    * q_ivf_batch and the served side of q_ann_recall. */
  private def ivfBatchLeg(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")), k = 8, iters = 2)
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    Ivf.searchBatchOf(Ivf.assign(e, col("embedding"), centers), queries,
      centers, nProbe = 2, topK = 5, excludeSelf = true,
      scoreRound = Some(6))
  }

  /** CTEs qs→routed→af→sc→rk of the q_ivf_batch replay — the oracle
    * twin of [[ivfBatchLeg]], shared with the q_ann_recall oracle.
    * Requires [[fitReplayCtes]] in scope. */
  private def ivfBatchCtes: String =
    s"""qs AS (SELECT vec_id AS q_id, embedding AS q_emb
       |       FROM embeddings WHERE vec_id < 8),
       |routed AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q.q_id, c.cell,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${distSqSql("q.q_emb", "c.c")} ASC, c.cell ASC) AS rn
       |    FROM qs q CROSS JOIN c2 c) WHERE rn <= 2),
       |af AS (${fitAssignSql("c2")}),
       |sc AS (
       |  SELECT q.q_id, e.vec_id,
       |    ${roundToSql(cosineSql("e.embedding", "q.q_emb"), 6)} AS cos_sim
       |  FROM af e JOIN routed r ON e.cell = r.cell
       |  JOIN qs q ON q.q_id = r.q_id
       |  WHERE e.vec_id <> q.q_id),
       |rk AS (
       |  SELECT q_id, vec_id, cos_sim,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos_sim DESC, vec_id ASC) AS rank
       |  FROM sc)""".stripMargin

  def hyperplane(j: Int, dims: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dims).toArray.map { i =>
      val hex = md.digest(s"hp${j}_$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0
    }
  }

  def hyperplaneSql(j: Int): String =
    s"list_transform(range(0, 64), i -> " +
      s"(CAST(('0x' || substr(md5('hp$j' || '_' || i), 1, 15)) AS BIGINT) % 2001 - 1000) / 1000.0)"

  /** Sign-LSH bucket id of an embedding — the codegen'd
    * [[graft.functions.SignLshBucket]] over the md5-derived planes
    * (bit-identical to the interpreted zip_with/aggregate fold it
    * replaced: same plane order, same sequential dot). Ragged vectors
    * now yield NULL (dropped by the bucket join) instead of the old
    * fold's all-bits-clear bucket 0 — a corrupt short vector must not
    * alias the legitimate bucket-0 candidates. */
  def lshBucket(emb: Column, nBits: Int, dims: Int): Column =
    graft.functions.sign_lsh_bucket(emb,
      (0 until nBits).map(hyperplane(_, dims)).toArray)

  def lshBucketSql(emb: String, nBits: Int): String =
    (0 until nBits).map(j =>
      s"CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(1, 65), " +
        s"i -> CAST($emb[i] AS DOUBLE) * (${hyperplaneSql(j)})[i])), (x, y) -> x + y) > 0 " +
        s"THEN ${1L << j} ELSE 0 END")
      .mkString("(", " + ", ")")

  /** SemDeDup core: greedy-by-id semantic dedup of a cell-assigned
    * embedding frame — drop row v iff some u < v in the same cell has
    * round-6 cosine ≥ tau. Returns (vec_id, cell: long, kept: bool).
    *
    * The pair join runs over per-cell EXACT-DUPLICATE REPRESENTATIVES
    * (min vec_id per identical embedding, one window pass), which is
    * semantics-preserving: identical vectors share every cosine
    * verdict, the group minimum is the group's greedy survivor, and a
    * representative r is dropped iff some smaller representative sits
    * within tau (any qualifying u < r has rep(u) ≤ u < r with the
    * same cosine). A mass-duplicated vector therefore contributes ONE
    * row to the pair space instead of n² — the r8 image-near-dup
    * degenerate-bucket lesson, wired structurally.
    *
    * `maxCell` is the residual defense for the case the collapse
    * cannot cover: a mass NEAR-duplicated group (perturbed, not
    * byte-identical — re-embedded boilerplate) whose reps still pair
    * quadratically within one cell. With `maxCell = Some(k)` only the
    * k smallest reps per cell serve as LEFT-side dropper candidates —
    * the one-sided streaming-cap semantics of
    * `TextOps.minhashPairsOf`: every rep is still verified against
    * the retained candidates (verification never skipped), only
    * beyond-cap × beyond-cap drops are sacrificed, and because the
    * greedy rule drops by the SMALLEST neighbor, the retained
    * smallest-k candidates are exactly the most productive droppers.
    * The declared query runs uncapped (the oracle states the exact
    * greedy rule); production sets k ≈ expected cell membership. */
  /** The ±0.0005 per-dim perturbation TWIN fixture shared by
    * q_semantic_dedup (offset 100000) and q_semantic_decon (offset
    * 200000): twin(src)ᵢ = srcᵢ · (1 + ((src_id + i) % 7 − 3)·0.0005),
    * cast back to float. The source id rides under `src_id` so the
    * per-dim lambda can't LATERAL-ALIAS-capture the shifted id
    * (NOTES_r15 §4 — in one select, col("vec_id") inside the lambda
    * resolves to the just-aliased vec_id+offset, silently shifting
    * the pattern by offset % 7). ONE spelling, factored out so
    * LateralAliasSpec can replay it float-for-float against a
    * driver-side recompute (VERDICT r15 #1's knife-edge probe).
    * `extraCols` pass through unchanged. */
  private[graft] def perturbedTwins(src: DataFrame, offset: Long,
      extraCols: Seq[String] = Nil): DataFrame = {
    val keep = Seq(col("vec_id").as("src_id"), col("embedding")) ++
      extraCols.map(col)
    src.select(keep: _*)
      .select((Seq((col("src_id") + offset).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") * (lit(1.0) +
            (((col("src_id") + i) % 7 - 3) * lit(0.0005)))).cast("float"))
          .as("embedding")) ++ extraCols.map(col)): _*)
  }

  def semanticDedup(assigned: DataFrame, tau: Double,
      maxCell: Option[Int] = None): DataFrame = {
    val w = Window.partitionBy(col("cell"), col("embedding"))
    val withRep = assigned.withColumn("rep_id", min(col("vec_id")).over(w))
    val reps = withRep.filter(col("vec_id") === col("rep_id"))
      .select(col("cell"), col("vec_id").as("rid"), col("embedding"))
    val droppers = maxCell match {
      case None => reps
      case Some(k) =>
        reps.withColumn("__r", row_number().over(
            Window.partitionBy(col("cell")).orderBy(col("rid"))))
          .filter(col("__r") <= k).drop("__r")
    }
    val droppedReps = droppers
      .select(col("cell"), col("rid").as("ida"), col("embedding").as("ea"))
      .join(reps.select(col("cell"), col("rid").as("idb"),
        col("embedding").as("eb")), Seq("cell"))
      .filter(col("ida") < col("idb") &&
        roundTo(graft.functions.cosine_sim(col("ea"), col("eb")), 6) >= tau)
      .select(col("idb").as("dropped_id")).distinct()
    // NO broadcast hint on the dropped set: at a production dedup
    // rate it is proportional to the number of near-duplicated
    // representatives (corpus-sized in the worst case), and a forced
    // broadcast cannot fall back — let AQE pick broadcast when the
    // runtime size allows (it does at the declared-query scale)
    withRep.join(droppedReps,
        col("rep_id") === col("dropped_id"), "left")
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        (col("vec_id") === col("rep_id") && col("dropped_id").isNull).as("kept"))
  }

  /** Cosine threshold for semantic decontamination — interpolated
    * into the q_semantic_decon oracle (the MinhashK pattern). Same
    * value as q_semantic_dedup's tau: "re-embedded near-verbatim or
    * paraphrase" territory. */
  val SemanticDeconTau = 0.999

  /** SEMANTIC DECONTAMINATION (VERDICT r14 #5) — the complement to
    * shingle-based decon ([[TextOps.deconPairCounts]], the
    * q_decontaminate join), which by construction only catches
    * near-VERBATIM overlap: a paraphrased eval answer shares few
    * 3-gram shingles but sits within τ of the eval doc in embedding
    * space. Flags every corpus vector whose cosine to ANY eval
    * vector is ≥ tau, through the existing IVF serving shape
    * ([[Ivf.searchBatchOf]]'s routing): corpus rows are cell-assigned
    * map-side, the eval set routes to its `nProbe` nearest cells and
    * BROADCASTS (eval suites are MBs; the corpus is the TB side and
    * never broadcasts — PlanSpec pins that), and scoring happens
    * only where cells meet. A corpus row meets a given eval row at
    * most once (the row has ONE cell; the eval's probed cells are
    * distinct), so no dedup is needed.
    *
    * Returns (vec_id, eval_id, cos) for every flagged pair — the
    * q_decontaminate evidence shape; callers wanting the drop set
    * take `select(vec_id).distinct()`. */
  def semanticDecon(corpusAssigned: DataFrame, evalVecs: DataFrame,
      centers: Array[Array[Double]], nProbe: Int, tau: Double): DataFrame = {
    val routed = evalVecs.select(col("eval_id"), col("q_emb"),
      explode(graft.functions.nearest_cells(col("q_emb"), centers, nProbe))
        .as("cell"))
    corpusAssigned.join(broadcast(routed), Seq("cell"))
      .select(col("vec_id"), col("eval_id"),
        roundTo(graft.functions.cosine_sim(col("embedding"), col("q_emb")), 6)
          .as("cos"))
      .filter(col("cos") >= tau)
  }

  /** THE FROZEN TOPIC-RATE ARTIFACT (VERDICT r13 #7): the ≤k-row
    * (cell, rate_bp) table of q_topic_sample's sqrt-flattened
    * mixture rule over an assigned (vec_id, cell) frame — fit once
    * per corpus snapshot, shipped to [[topicSampleWith]] (the
    * [[graft.ops.Dsir.ratioTable]] freeze discipline: re-deriving
    * per micro-batch lets new data flip earlier keep decisions). */
  def topicRates(assigned: DataFrame): DataFrame = {
    val counts = assigned.groupBy(col("cell")).agg(count(lit(1)).as("c"))
    val minC = counts.agg(min(col("c")).as("cmin"))
    counts.crossJoin(broadcast(minC))
      .select(col("cell"),
        floor(lit(10000) * sqrt(col("cmin").cast("double") / col("c")))
          .cast("int").as("rate_bp"))
  }

  /** The deterministic salted-hash keep rule over a frame carrying
    * (vec_id, rate_bp) — ONE spelling behind the batch join path and
    * the frozen-rate projection path. */
  private[ops] def topicKeepPredicate: Column =
    pmod(TextOps.hash60(
      concat(lit("topic:"), col("vec_id").cast("string"))),
      lit(10000)) < col("rate_bp")

  /** FROZEN-RATE topic sampling — the streaming deployment path (the
    * scoreWith precedent): the ≤k-row rate table collects once into
    * a map literal and the keep decision is a PURE PROJECTION over
    * the assigned stream (cells come map-side from frozen centers
    * via [[Ivf.assign]]) — no join, no state. Vectors landing in a
    * cell ABSENT from the frozen table are DROPPED (a new topic has
    * no calibrated rate until the next refit — conservative,
    * stated). */
  def topicSampleWith(assigned: DataFrame, rates: DataFrame): DataFrame = {
    val r = rates.select(col("cell").cast("long"), col("rate_bp").cast("int"))
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assigned
      .withColumn("rate_bp", element_at(typedlit(r), col("cell")))
      .filter(col("rate_bp").isNotNull && topicKeepPredicate)
      .select(col("vec_id"), col("cell"), col("rate_bp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Approximate nearest neighbors via sign-LSH: bucket every vector
    // with 8 deterministic hyperplanes, search only the query's bucket,
    // rank by exact cosine. Candidate generation is a hash join on the
    // bucket id — the corpus is never scanned per query at scale.
    "q_ann_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val bucketed = e.select(col("vec_id"), col("label"), col("embedding"),
        lshBucket(col("embedding"), 8, 64).as("bucket"))
      // multi-probe: ENUMERATE the 9 probe bucket ids (exact + 8
      // one-bit flips) on the query side and equi-join on `bucket` —
      // candidate generation is a broadcast HASH join touching only the
      // probed buckets, never a per-query corpus scan (hamming(bucket,
      // q_bucket) <= 1  ⟺  bucket ∈ {q, q⊕2⁰, …, q⊕2⁷}, and the 9 probe
      // ids are distinct, so no dedup is needed). PlanSpec pins the
      // no-BroadcastNestedLoopJoin shape.
      val probes = bucketed.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"),
          explode(array(col("bucket") +: (0 until 8).map(j =>
            col("bucket").bitwiseXOR(lit(1L << j))): _*)).as("bucket"))
      bucketed.join(broadcast(probes), Seq("bucket"))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("label"), col("bucket"),
          roundTo(graft.functions.cosine_sim(col("embedding"), col("q_emb")), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(5)
    }),

    // Brute-force cosine top-10 against a fixed query vector
    // (vec_id = 0): broadcast the query row, single corpus pass.
    "q_similarity_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          roundTo(graft.functions.cosine_sim(col("embedding"), col("q_emb")), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // BATCHED retrieval — N query vectors against the corpus in ONE
    // broadcast pass, top-5 neighbors EACH, via the bounded-state
    // TopKByScore aggregate: scoring is map-side (queries broadcast,
    // corpus never shuffles), and the per-query ranking shuffle carries
    // at most k rows per (partition, query) thanks to partial-buffer
    // merge — never the Q×N score space a window-rank would sort. The
    // realistic retrieval-job shape vs q_similarity_topk's single
    // query. Keys ride zero-padded so the aggregate's string tiebreak
    // equals numeric vec_id order.
    "q_batch_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val queries = e.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      e.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"),
          roundTo(graft.functions.cosine_sim(col("embedding"), col("q_emb")), 6).as("cos_sim"),
          // pad to the FULL 19-digit long width: lpad TRUNCATES strings
          // longer than its target, so an 8-digit pad would corrupt ids
          // ≥ 10⁸ (collapse + misorder) at exactly the corpus sizes
          // this query is for
          Util.lpadKey(col("vec_id")).as("key"))
        .groupBy(col("q_id"))
        .agg(graft.functions.topk_by_score(col("cos_sim"), col("key"), 5).as("topk"))
        .select(col("q_id"), posexplode(col("topk")))
        .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
          col("col.key").cast("long").as("vec_id"), col("col.score").as("cos_sim"))
        .orderBy("q_id", "rank")
    }),

    // All-pairs near-dup by cosine within a label block: top-20 most
    // similar pairs (threshold-free so the result is never empty).
    "q_embedding_pairs" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val a = e.select(col("vec_id").as("id_a"), col("label"), col("embedding").as("emb_a"))
      val b = e.select(col("vec_id").as("id_b"), col("label").as("label_b"), col("embedding").as("emb_b"))
      a.join(b, col("label") === col("label_b") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("label"),
          roundTo(graft.functions.cosine_sim(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("id_a").asc, col("id_b").asc)
        .limit(20)
    }),

    // Embedding-cosine near-dup at scale: candidate pairs come from a
    // sign-LSH BUCKET COLLISION join (8 hyperplanes → 256 buckets), not
    // from the O(n²) pair space; exact cosine reranks candidates only.
    // Production use sets a cosine cutoff; this synthetic corpus has no
    // true near-dups (max pairwise cos ≈ 0.6), so the query returns the
    // top-20 candidates to stay non-empty — the PLAN is the deliverable:
    // shuffle keys are (bucket), never embeddings against embeddings.
    "q_embedding_neardup_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val bucketed = e.select(col("vec_id"), col("embedding"),
        lshBucket(col("embedding"), 8, 64).as("bucket"))
      bucketed.as("a").join(bucketed.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          col("a.bucket").as("bucket"),
          roundTo(graft.functions.cosine_sim(col("a.embedding"), col("b.embedding")), 6)
            .as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("id_a").asc, col("id_b").asc)
        .limit(20)
    }),

    // IVF-style ANN: coarse quantizer = per-label centroids (computed
    // exactly via per-dimension decimal sums), probe the nProbe=2
    // nearest cells by centroid dot product, exact cosine rerank inside
    // those cells only. At scale the centroid table is tiny and
    // broadcast, and the corpus is partitioned by cell — the probe
    // touches 2/N of the data.
    "q_ann_ivf" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      // (label, dim, centroid-component) — decimal-exact mean
      val comps = e.select(col("label"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim"))
        .agg((sum(col("x").cast("double")
          .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(28, 9)))
          .cast("double") / count(lit(1))).as("c"))
      val q = e.filter(col("vec_id") === 0)
        .select(posexplode(col("embedding")).as(Seq("dim", "qx")))
      // query→centroid dot product, order-independent decimal sum
      val cellScore = comps.join(broadcast(q), "dim")
        .groupBy(col("label"))
        .agg(sum((col("c") * col("qx").cast("double"))
          .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(28, 12)))
          .cast("double").as("cell_dot"))
      val probed = cellScore
        .orderBy(col("cell_dot").desc, col("label").asc).limit(2)
      val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      e.join(broadcast(probed.select(col("label"))), Seq("label"))
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"), col("label"),
          roundTo(graft.functions.cosine_sim(col("embedding"), col("q_emb")), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // IVF with a BUILT quantizer — the production path (q_ann_ivf
    // quantizes by ground-truth labels a real corpus doesn't have):
    // k=8 k-means seeded by the first 8 vec_ids, 2 Lloyd iterations
    // (map-side codegen'd assignment + decimal-exact per-dim means,
    // so the fit is summation-order-independent and the DuckDB oracle
    // replays it exactly), probe the 2 cells nearest the query, exact
    // cosine rerank inside them. At scale: assignment never shuffles
    // vectors, each iteration shuffles K×dims decimal partials, and
    // the probe is a partition-pruned read (see Ivf.writeIndex).
    // TOPIC-BALANCED SAMPLING — q_mixture_sample's temperature-
    // flattened rebalancing (α = 1/2) applied to EMBEDDING-SPACE
    // topics instead of language labels: the replayable k=8 IVF fit
    // assigns each vector a cell ("topic"), each topic keeps
    // floor(10000·sqrt(c_min/c)) basis points via the deterministic
    // salted-hash rule — the curation step when one embedding cluster
    // (boilerplate, spam, one scraped site) dominates the corpus.
    // Scale shape: the audited fit + assign, one cells-sized count,
    // a ≤k-row broadcast rate table, map-side keep.
    "q_topic_sample" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")),
        k = 8, iters = 2)
      val assigned = Ivf.assign(e, col("embedding"), centers)
        .select(col("vec_id"), col("cell").cast("long").as("cell"))
      assigned.join(broadcast(topicRates(assigned)), Seq("cell"))
        .filter(topicKeepPredicate)
        .select(col("vec_id"), col("cell"), col("rate_bp"))
        .orderBy("vec_id")
    }),

    "q_ann_ivf_built" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")), k = 8, iters = 2)
      val qEmb = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val cells = Ivf.nearestCells(centers, qEmb.map(_.toDouble), nProbe = 2)
      Ivf.assign(e, col("embedding"), centers)
        .filter(col("cell").isin(cells.map(Integer.valueOf): _*) &&
          col("vec_id") =!= 0)
        .select(col("vec_id"), col("cell").cast("long").as("cell"),
          roundTo(graft.functions.cosine_sim(col("embedding"),
            typedlit(qEmb.toSeq)), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // Batch IVF serving: the production read path for a query FRAME —
    // distributed routing (native nearest_cells, no per-query driver
    // round-trip), broadcast of the routed (q_id, cell) pairs, and
    // bounded-state per-query top-k. The oracle replays the identical
    // fit (bit-equal decimal means), routes each query in SQL, and
    // ranks with the same (cos desc, vec_id asc) total order.
    "q_ivf_batch" -> ((s, dir) =>
      ivfBatchLeg(s, dir).orderBy("q_id", "rank")),

    // ANN RECALL TRACKING — the measurement a production vector index
    // ships with: the IVF-served top-5 (q_ivf_batch's exact plan)
    // joined against the brute-force cosine truth for the same
    // queries, reported as per-query hit counts and recall@5. Both
    // legs are deterministic, so recall itself is oracle-checkable —
    // an index regression (bad fit, wrong routing, probe starvation)
    // moves a NUMBER the driver hash-verifies, not a vibe. The truth
    // leg is the q_batch_topk bounded-state shape (corpus never
    // shuffles, queries broadcast); the join is candidate-list sized.
    "q_ann_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val ivf = ivfBatchLeg(s, dir).select(col("q_id"), col("vec_id"))
      val exact = e.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"),
          roundTo(graft.functions.cosine_sim(col("embedding"), col("q_emb")), 6)
            .as("cos_sim"),
          Util.lpadKey(col("vec_id")).as("key"))
        .groupBy(col("q_id"))
        .agg(graft.functions.topk_by_score(col("cos_sim"), col("key"), 5).as("topk"))
        .select(col("q_id"), explode(col("topk")).as("hit"))
        .select(col("q_id"), col("hit.key").cast("long").as("vec_id"),
          lit(1).as("m"))
      ivf.join(exact, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("m"), lit(0))).cast("long").as("n_hits"))
        .select(col("q_id"), col("n_hits"),
          (col("n_hits").cast("double") / 5).as("recall"))
        .orderBy("q_id")
    }),

    // ANN RECALL FOR THE PQ SERVING PATH (VERDICT r15 #6): q_ann_recall
    // gates the exact-rerank IVF leg; this gates [[Ivf.searchPqBatchOf]]
    // — the IVFADC read path (route → per-query map-side LUT → ADC top-C
    // cut on CODES ONLY → exact-cosine rerank) — against the same
    // brute-force truth, so QUANTIZATION-induced recall loss is a
    // declared, hash-checked number, not a probe-artifact vibe. Same
    // queries (vec_id < 8), same fits as q_ivfpq (k=8/iters=2 IVF,
    // m=4 × k=4 PQ), nProbe=2, rerankC=60 (12× topK — the production-shaped rerank
    // budget that makes recall IVF-limited, not cut-limited, at the
    // oracle-replayable m=4 × k=4 codebook), top-5. The oracle replays
    // the entire batch chain: both fits, per-query routing, per-query
    // subspace LUTs, the raw-double ADC cut at C=60 (bit-equal fold
    // order — the q_pq_adc/q_ivfpq contract), round-6 rerank.
    "q_ann_recall_pq" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")), k = 8, iters = 2)
      val cb = Pq.fit(e, col("embedding"), Seq(col("vec_id")),
        m = 4, dims = 64, k = 4, iters = 1)
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val index = Pq.encode(Ivf.assign(e, col("embedding"), centers),
        col("embedding"), cb)
      val served = Ivf.searchPqBatchOf(index, queries, centers, cb,
        nProbe = 2, rerankC = 60, topK = 5, excludeSelf = true,
        scoreRound = Some(6))
        .select(col("q_id"), col("vec_id"))
      val exact = e.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"),
          roundTo(graft.functions.cosine_sim(col("embedding"), col("q_emb")), 6)
            .as("cos_sim"),
          Util.lpadKey(col("vec_id")).as("key"))
        .groupBy(col("q_id"))
        .agg(graft.functions.topk_by_score(col("cos_sim"), col("key"), 5).as("topk"))
        .select(col("q_id"), explode(col("topk")).as("hit"))
        .select(col("q_id"), col("hit.key").cast("long").as("vec_id"),
          lit(1).as("m"))
      served.join(exact, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("m"), lit(0))).cast("long").as("n_hits"))
        .select(col("q_id"), col("n_hits"),
          (col("n_hits").cast("double") / 5).as("recall"))
        .orderBy("q_id")
    }),

    // INDEX DELETES, driver-gated end to end: build a REAL persisted
    // cell-partitioned index from the embeddings table (two append
    // batches), tombstone every vec_id ≡ 3 (mod 17) at a later batch,
    // re-append the vec_id ≡ 3 (mod 34) half of them later still
    // (revival — LWW by batch), COMPACT (the delete must survive the
    // fold physically, the revival must not be ghost-deleted), then
    // read the index back. The oracle replays the survivor set
    // arithmetically and the cell assignment via the k-means fit
    // replay — a tombstone that leaks a ghost into the compacted
    // generation, suppresses a revived row, or mis-cells anything
    // hash-mismatches here. (The scratch dir is wiped first: the
    // declared query must be hermetic across driver rounds.)
    "q_index_delete" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")), k = 8, iters = 2)
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_index_delete_" +
        Integer.toHexString(dir.hashCode)
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true): Unit
      val src = e.select(col("vec_id"), col("embedding"))
      Ivf.appendBatch(src.filter(pmod(col("vec_id"), lit(2)) === 0),
        col("embedding"), centers, out, 0L)
      Ivf.appendBatch(src.filter(pmod(col("vec_id"), lit(2)) === 1),
        col("embedding"), centers, out, 1L)
      Ivf.appendTombstones(
        src.filter(pmod(col("vec_id"), lit(17)) === 3).select(col("vec_id")),
        out, 2L)
      Ivf.appendBatch(src.filter(pmod(col("vec_id"), lit(34)) === 3),
        col("embedding"), centers, out, 3L)
      Ivf.compactIndex(s, out)
      Ivf.readIndex(s, out)
        .select(col("vec_id"), col("cell").cast("long").as("cell"))
        .orderBy("vec_id")
    }),

    // FILTERED ANN — the production retrieval call site: a metadata
    // predicate (here: even `label` — the lang/date/source analog)
    // conjoined with the vector search. The predicate lands on the
    // index side BEFORE ranking, so the top-k budget is spent
    // entirely on predicate-satisfying rows — the post-filter
    // alternative (search unfiltered, then filter the top-k) returns
    // FEWER than k rows or misses qualifying neighbors entirely under
    // any selective predicate. Same fit/routing as q_ivf_batch; the
    // oracle replays fit + routing + the identical predicate in SQL.
    // At scale the filter rides the pruned index scan as a pushed
    // filter next to the cell pruning (IvfSpec pins both).
    "q_ann_filtered" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")), k = 8, iters = 2)
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      Ivf.searchBatchOf(Ivf.assign(e, col("embedding"), centers), queries,
          centers, nProbe = 2, topK = 5, excludeSelf = true,
          scoreRound = Some(6),
          predicate = Some(pmod(col("label"), lit(2)) === 0))
        .orderBy("q_id", "rank")
    }),

    // SELECTIVITY-AWARE filtered ANN (Ivf.searchBatchAuto): under an
    // EXTREMELY selective predicate (label % 25 — the ~4% regime where
    // VEC_FILTERED reads the escalation ladder's recall at 0.69–0.89
    // despite fill 1.0), the auto switch counts the surviving
    // population and serves the PRE-FILTER plan: exact cosine over
    // the filtered rows, recall 1.0 by construction. The result is
    // quantizer-independent (the fit only places rows in cells; the
    // brute leg scores every survivor), so the oracle is plain exact
    // SQL — no fit replay. The persisted index carries the metadata
    // column, so the predicate rides the parquet scan.
    "q_ann_prefilter" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")), k = 8, iters = 2)
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ann_prefilter_" +
        Integer.toHexString(dir.hashCode)
      Ivf.writeIndex(e.select(col("vec_id"), col("embedding"), col("label")),
        col("embedding"), col("vec_id"), centers, out)
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val pred = pmod(col("label"), lit(25)) === 3
      // branch pinned BY CONSTRUCTION, not by current data size (r18
      // ADVICE): the exact-SQL oracle is only valid on the brute leg,
      // so fail loudly if a larger verify scale ever outgrows bruteMax
      // instead of silently hash-mismatching on the adaptive branch.
      // The decision is made once and handed to the serve call.
      val d = Ivf.autoDecide(s, out, Some(pred), bruteMax = 100000)
      require(d.branch == "brute",
        s"q_ann_prefilter's oracle requires the brute branch, got $d — " +
          "raise bruteMax for this scale")
      Ivf.searchBatchAuto(s, out, centers, queries, nProbe = 2, topK = 5,
          excludeSelf = true, scoreRound = Some(6), predicate = Some(pred),
          survivorCount = Some(d.survivors))
        .orderBy("q_id", "rank")
    }),

    // DENSE-BRANCH PIN of the selectivity switch (r18 verdict #2):
    // under a HALF-density predicate (label % 2) with bruteMax = 100
    // the survivor population exceeds bruteMax at every test scale,
    // so the switch must serve the POST-FILTER plan — cell-routed
    // probe with the predicate applied before ranking
    // (searchBatchAdaptive) — asserted via autoDecide, never assumed.
    // At this density every query fills topK inside its initial
    // 2-cell probe (hundreds of survivors per cell), so the
    // escalation ladder never fires and the result is exactly the
    // fit + routing + predicate + rank replay the q_ann_filtered
    // oracle spells — one fit-replay oracle pins both the on-the-fly
    // and the persisted-index/auto serving stacks.
    "q_ann_postfilter" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")), k = 8, iters = 2)
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ann_postfilter_" +
        Integer.toHexString(dir.hashCode)
      Ivf.writeIndex(e.select(col("vec_id"), col("embedding"), col("label")),
        col("embedding"), col("vec_id"), centers, out)
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val pred = pmod(col("label"), lit(2)) === 0
      val d = Ivf.autoDecide(s, out, Some(pred), bruteMax = 100)
      require(d.branch == "adaptive",
        s"q_ann_postfilter must exercise the dense branch, got $d")
      Ivf.searchBatchAuto(s, out, centers, queries, nProbe = 2, topK = 5,
          excludeSelf = true, scoreRound = Some(6), predicate = Some(pred),
          bruteMax = 100, survivorCount = Some(d.survivors))
        .orderBy("q_id", "rank")
    }),

    // The IVFADC twin of q_ann_prefilter (Ivf.searchPqBatchAuto): the
    // PQ index keeps full-precision vectors beside the codes (the
    // exact-rerank contract), so under the same selective predicate
    // the auto switch serves the identical exact pre-filter answer —
    // one oracle pins both serving stacks' switch.
    "q_ann_prefilter_pq" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")), k = 8, iters = 2)
      val cb = Pq.fit(e, col("embedding"), Seq(col("vec_id")), m = 8, k = 16,
        iters = 1)
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ann_prefilter_pq_" +
        Integer.toHexString(dir.hashCode)
      Ivf.writeIndexPq(e.select(col("vec_id"), col("embedding"), col("label")),
        col("embedding"), col("vec_id"), centers, cb, out)
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val pred = pmod(col("label"), lit(25)) === 3
      val d = Ivf.autoDecide(s, out, Some(pred), bruteMax = 100000)
      require(d.branch == "brute",
        s"q_ann_prefilter_pq's oracle requires the brute branch, got $d — " +
          "raise bruteMax for this scale")
      Ivf.searchPqBatchAuto(s, out, centers, cb, queries, nProbe = 2,
          rerankC = 20, topK = 5, excludeSelf = true, scoreRound = Some(6),
          predicate = Some(pred), survivorCount = Some(d.survivors))
        .orderBy("q_id", "rank")
    }),

    // Int8 scalar quantization — the 4× memory/storage lever for
    // serving ANN at 100 TB: per-dimension (min, max) over the corpus
    // (exact picks, order-independent), q = floor((x−min)/scale + .5)
    // ∈ [0,255], rerank by DEQUANTIZED cosine against the full-
    // precision query. Quantization is a map-side transform against
    // 2×64 broadcast constants; the min/max build is one aggregation
    // of 64 values per input partition. The query output carries both
    // the exact and the quantized cosine, so the fidelity loss is
    // directly visible (and oracle-pinned).
    "q_embed_quant" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val mm = e.select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("dim"))
        .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
        .orderBy("dim").collect()
      val mns = mm.map(_.getDouble(1))
      val scs = mm.map(r => (r.getDouble(2) - r.getDouble(1)) / 255.0)
      val mnLit = typedlit(mns.toSeq)
      val scLit = typedlit(scs.toSeq)
      val dq = transform(sequence(lit(1), lit(64)), i => {
        val x = element_at(col("embedding"), i).cast("double")
        val mn = element_at(mnLit, i)
        val sc = element_at(scLit, i)
        when(sc === 0.0, mn).otherwise(mn + floor((x - mn) / sc + 0.5) * sc)
      })
      val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"),
          roundTo(graft.functions.cosine_sim(col("embedding"), col("q_emb")), 6)
            .as("cos_exact"),
          roundTo(cosine(dq, col("q_emb")), 6).as("cos_q8"))
        .orderBy(col("cos_q8").desc, col("vec_id").asc)
        .limit(10)
    }),

    // Product quantization end-to-end as an ORACLE-CHECKED query:
    // m=4 subspaces × 16 dims, k=4 codebook entries per subspace,
    // 1 Lloyd iteration (seeds = first 4 vectors' slices), encode via
    // per-subspace argmin, then ADC: the query's distance to every
    // doc is Σ_s lut_s[code_s(doc)] — 4 table lookups per row, no
    // vector data touched at scoring time. The DuckDB oracle replays
    // the per-subspace k-means (sequential-fold slice distances,
    // decimal means), re-derives the codes, and scores through the
    // same lookup sums — the whole PQ chain is pinned cross-engine.
    // (Production sizing is m=16, k=256 + exact rerank — PQ_SCALE.json;
    // this query pins SEMANTICS at an oracle-replayable size.)
    "q_pq_adc" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cb = Pq.fit(e, col("embedding"), Seq(col("vec_id")),
        m = 4, dims = 64, k = 4, iters = 1)
      val qEmb = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val lut = Pq.lutL2(cb, qEmb.map(_.toDouble))
      Pq.encode(e.filter(col("vec_id") =!= 0), col("embedding"), cb)
        .select(col("vec_id"),
          roundTo(Pq.adcDistSq(col("pq_code"), lut), 6).as("adc_dist_sq"))
        // NULL-dist guard (ragged vectors): Spark would sort them
        // FIRST asc, DuckDB last — see Pq.search
        .filter(col("adc_dist_sq").isNotNull)
        .orderBy(col("adc_dist_sq").asc, col("vec_id").asc)
        .limit(10)
    }),

    // THE COMPOSED SERVING CHAIN as an oracle-checked query (round-5
    // verdict "What's missing" #1): IVF route (k=8 built quantizer,
    // nProbe=2) → ADC scoring of ONLY the routed cells (m=4 × k=4 PQ
    // codes, query LUT, no vector data touched) → exact cosine rerank
    // of the top C=20 coarse candidates → top-10. This is the
    // production read path IvfPqProbe measures at 2M vectors (recall
    // 0.973 touching 0.2% of raw data); here the full triad —
    // route + pruned lookup + rerank — is hash-pinned against a DuckDB
    // replay of the identical fits, so a cell/codebook misalignment
    // fails the gate instead of silently costing recall. Refits inline
    // by design (the oracle must replay the fit); production is
    // fit/save/writeIndex + a partition-pruned scan (Ivf.search).
    "q_ivfpq" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")), k = 8, iters = 2)
      val cb = Pq.fit(e, col("embedding"), Seq(col("vec_id")),
        m = 4, dims = 64, k = 4, iters = 1)
      val qEmb = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val cells = Ivf.nearestCells(centers, qEmb.map(_.toDouble), nProbe = 2)
      val lut = Pq.lutL2(cb, qEmb.map(_.toDouble))
      val routed = Ivf.assign(e, col("embedding"), centers)
        .filter(col("cell").isin(cells.map(Integer.valueOf): _*) &&
          col("vec_id") =!= 0)
      val cand = Pq.encode(routed, col("embedding"), cb)
        .select(col("vec_id"), col("cell"), col("embedding"),
          Pq.adcDistSq(col("pq_code"), lut).as("adc"))
        .filter(col("adc").isNotNull)
        .orderBy(col("adc").asc, col("vec_id").asc)
        .limit(20)
      cand.select(col("vec_id"), col("cell").cast("long").as("cell"),
          roundTo(col("adc"), 6).as("adc_dist_sq"),
          roundTo(graft.functions.cosine_sim(col("embedding"),
            typedlit(qEmb.toSeq)), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // RESIDUAL IVF-PQ (IVFADC — Jégou et al. §IV) as an oracle-checked
    // query: the same route → ADC → exact-rerank triad as q_ivfpq, but
    // the PQ is trained on and encodes RESIDUALS (vector − assigned
    // cell centroid), and each routed cell scores through a LUT built
    // from the QUERY's residual against THAT cell. Same m=4 × k=4
    // budget as q_ivfpq — the codebooks only cover within-cell
    // displacement, the production recall lever at fixed compression
    // (measured at 2M vectors in IVFPQ_RES.json). The DuckDB oracle
    // replays the full chain — IVF fit, float-rounded residuals, PQ
    // fit on residuals, per-cell query LUTs — so a residual computed
    // off the wrong centroid, or a candidate scored through another
    // cell's LUT, hash-mismatches.
    "q_ivfpq_res" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")), k = 8, iters = 2)
      val assigned = Ivf.assign(e, col("embedding"), centers)
      val res = Pq.residual(col("embedding"), col("cell"), centers)
      val cb = Pq.fit(assigned, res, Seq(col("vec_id")),
        m = 4, dims = 64, k = 4, iters = 1)
      val qEmb = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val cells = Ivf.nearestCells(centers, qEmb.map(_.toDouble), nProbe = 2)
      val cellLuts = Pq.residualLuts(cb, centers, qEmb.map(_.toDouble), cells.toSeq)
      val routed = assigned
        .filter(col("cell").isin(cells.map(Integer.valueOf): _*) &&
          col("vec_id") =!= 0)
      val cand = Pq.encode(routed, res, cb)
        .select(col("vec_id"), col("cell"), col("embedding"),
          Pq.adcDistSqPerCell(col("pq_code"), col("cell"), cellLuts).as("adc"))
        .filter(col("adc").isNotNull)
        .orderBy(col("adc").asc, col("vec_id").asc)
        .limit(20)
      cand.select(col("vec_id"), col("cell").cast("long").as("cell"),
          roundTo(col("adc"), 6).as("adc_dist_sq"),
          roundTo(graft.functions.cosine_sim(col("embedding"),
            typedlit(qEmb.toSeq)), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // SemDeDup — SEMANTIC dedup over embeddings (the
    // cluster-then-prune recipe of LLM corpus curation): cluster with
    // the SAME k=8 / 2-iter k-means fit the IVF lane replays
    // bit-exactly, then inside each cell drop every vector that has a
    // LOWER-id neighbor at cosine ≥ 0.999 (greedy-by-id — a total
    // order both engines state identically, no connected components
    // needed). The corpus has no natural semantic dups (all pairs
    // < 0.9), so the fixture plants them: a ±0.15% element-wise
    // perturbed, float-rounded copy of every vec_id ≡ 0 (mod 7) —
    // the oracle replays the copy bit-exactly and restates the
    // greedy rule naively.
    //
    // SCALE SHAPE: the pair join runs over per-cell EXACT-DUPLICATE
    // REPRESENTATIVES only (min vec_id per identical embedding, one
    // window pass) — the r8 image-near-dup lesson wired from day
    // one: a mass-duplicated vector (one boilerplate embedding × 10M
    // copies) contributes ONE row to the pair space, not n². The
    // collapse is semantics-preserving for the greedy rule (identical
    // vectors share every neighbor verdict and the group minimum IS
    // the group's greedy survivor), so the oracle needs no replay of
    // it. In production k scales ~√N so cells stay bounded; k=8 here
    // is fixed by the shared fit replay.
    "q_semantic_dedup" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      // the source id rides under its own name so the perturbation
      // lambda can't LATERAL-ALIAS-capture the shifted id (r15: in a
      // single select, col("vec_id") inside the lambda resolves to
      // the just-aliased vec_id+100000 — Spark LCA resolution — which
      // silently shifts the per-dim pattern by (offset % 7); latent
      // here because the declared output never emits a cosine, caught
      // when q_semantic_decon DID emit one)
      val perturbed = perturbedTwins(e.filter(col("vec_id") % 7 === 0),
        offset = 100000, extraCols = Seq("label"))
      val aug = e.select(col("vec_id"), col("embedding"), col("label"))
        .union(perturbed)
      val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")), k = 8, iters = 2)
      semanticDedup(Ivf.assign(aug, col("embedding"), centers), tau = 0.999)
        .orderBy("vec_id")
    }),

    // SEMANTIC DECONTAMINATION — the paraphrase-contamination case
    // shingle decon (q_decontaminate) misses by construction. Eval
    // set = vec_id % 97 ≡ 0 (the q_decontaminate convention); the
    // corpus carries PLANTED paraphrase stand-ins (the
    // q_semantic_dedup perturbation recipe, ids +200000) that share
    // an embedding neighborhood with their eval source but — being
    // embedding-level twins, not token-sequence twins — would pass
    // any n-gram gate. Fit/assign/route replayed by the oracle
    // (fitReplayCtes), flags = every (corpus, eval) pair with
    // cos ≥ SemanticDeconTau met through nProbe=2 IVF routing.
    "q_semantic_decon" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")),
        k = 8, iters = 2)
      val evalV = e.filter(col("vec_id") % 97 === 0)
      // src_id naming inside the builder: see [[perturbedTwins]]
      val planted = perturbedTwins(
        evalV.select(col("vec_id"), col("embedding")), offset = 200000)
      val corpus = e.filter(col("vec_id") % 97 =!= 0)
        .select(col("vec_id"), col("embedding"))
        .union(planted)
      semanticDecon(
        Ivf.assign(corpus, col("embedding"), centers),
        evalV.select(col("vec_id").as("eval_id"),
          col("embedding").as("q_emb")),
        centers, nProbe = 2, tau = SemanticDeconTau)
        .orderBy("vec_id", "eval_id")
    }),

    // kNN LABEL PROPAGATION (auto-labeling — the classifier-
    // distillation primitive of corpus curation: propagate a small
    // labeled seed set onto the unlabeled corpus, e.g. quality/domain
    // tags learned on a hand-labeled sample). Vectors with
    // vec_id % 10 < 8 act as the LABELED seed pool; the rest classify
    // by majority vote of their 5 nearest labeled neighbors (round-6
    // cosine, vec_id tie), vote ties → smallest label.
    //
    // SCALE SHAPE: the candidate space is IVF-BOUNDED, not all-pairs —
    // both sides assign to the shared k=8 quantizer (the fit replay
    // this whole lane pins), queries route to nProbe=2 cells, and the
    // join key is CELL: each side shuffles once by cell, and neither
    // side broadcasts (a query frame that is 20% of the corpus must
    // not ride the q_batch_topk broadcast path). Per-query top-5 is
    // the bounded-state topk aggregate with the neighbor's label
    // RIDING IN THE KEY after the 19-digit id pad (the pad keeps the
    // tie order = vec_id asc; the suffix only exists so no second
    // corpus scan is needed to recover labels). The true label rides
    // along, so the output doubles as an accuracy audit — the
    // q_ann_recall discipline: propagation quality is a hash-checked
    // NUMBER, not a vibe. The ≤5-row-per-query vote table is the only
    // windowed stage (bounded by construction).
    "q_knn_label" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")), k = 8, iters = 2)
      val labeled = Ivf.assign(e.filter(pmod(col("vec_id"), lit(10)) < 8),
          col("embedding"), centers)
        .filter(col("cell").isNotNull)
      val qs = e.filter(pmod(col("vec_id"), lit(10)) >= 8)
        .select(col("vec_id").as("q_id"), col("label").as("true_label"),
          col("embedding").as("q_emb"),
          explode(graft.functions.nearest_cells(col("embedding"), centers, 2))
            .as("cell"))
      val top5 = labeled.join(qs, Seq("cell"))
        .select(col("q_id"), col("true_label"),
          roundTo(graft.functions.cosine_sim(col("embedding"), col("q_emb")), 6)
            .as("cos_sim"),
          concat(Util.lpadKey(col("vec_id")), lit(":"),
            col("label").cast("string")).as("key"))
        .groupBy(col("q_id"), col("true_label"))
        .agg(graft.functions.topk_by_score(col("cos_sim"), col("key"), 5)
          .as("topk"))
        .select(col("q_id"), col("true_label"), explode(col("topk")).as("nb"))
        .select(col("q_id"), col("true_label"),
          substring(col("nb.key"), 21, 11).cast("int").as("cand_label"))
      val votes = top5
        .groupBy(col("q_id"), col("true_label"), col("cand_label")).count()
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("count").desc, col("cand_label").asc)
      votes.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("q_id"), col("cand_label").as("pred_label"),
          col("count").as("n_votes"),
          (col("cand_label") === col("true_label")).as("correct"))
        .orderBy("q_id")
    }),

    // Centroid summary per label — the IVF coarse-quantizer build step:
    // element-wise mean vector per label, plus member count. Output is
    // the rounded first-4-dims fingerprint to keep it hash-stable.
    "q_label_centroids" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val dims = 4
      val cols = (0 until dims).map(i =>
        roundTo(
          sum(element_at(col("embedding"), i + 1).cast("double")
            .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(28, 9)))
            .cast("double") / count(lit(1)), 6).as(s"c$i"))
      val aggCols = count(lit(1)).as("n_vectors") +: cols
      e.groupBy(col("label"))
        .agg(aggCols.head, aggCols.tail: _*)
        .orderBy("label")
    }),

    // EMBEDDING-SPACE DRIFT MONITOR (r10 verdict #4) — the complement
    // of q_corpus_drift's token KL: drift over the IVF CELL-OCCUPANCY
    // distribution between a reference slice (even vec_ids:
    // "yesterday's embeddings") and the current slice (odd ids),
    // add-one smoothed over the K cells, reported per cell with its
    // contribution P(c)·ln(P(c)/Q(c)) and the centroid's L2 norm as a
    // drift-location fingerprint. This is how a production pipeline
    // detects an upstream embedding-model swap or corpus shift: the
    // quantizer is FROZEN (same fit both slices), so any occupancy
    // movement is data movement. SCALE SHAPE: reuses Ivf.fit/assign
    // (map-side assignment, K×dims decimal partials per iteration);
    // the monitor itself adds ONE aggregation with conditional counts
    // (K groups of two longs — vectors never shuffle), a K-row
    // centroid frame, and broadcast scalars. The oracle replays the
    // full fit + assignment + KL chain. Float discipline: norms are
    // the same sequential fold as distSq, rounded via the shared
    // floor-based roundTo on BOTH engines (driver-side here — the
    // centroid table is a K-row driver object by construction).
    "q_embed_drift" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val centers = Ivf.fit(e, col("embedding"), Seq(col("vec_id")), k = 8, iters = 2)
      val cells = centers.indices.map { i =>
        val n2 = centers(i).foldLeft(0.0)((acc, x) => acc + x * x)
        (i, math.floor(math.sqrt(n2) * 1e6 + 0.5) / 1e6)
      }.toDF("cell", "centroid_norm")
      val counts = Ivf.assign(e, col("embedding"), centers)
        .groupBy(col("cell"))
        .agg(sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("c_ref"),
          sum(when(col("vec_id") % 2 =!= 0, 1L).otherwise(0L)).as("c_cur"))
      val filled = cells.join(counts, Seq("cell"), "left")
        .na.fill(0L, Seq("c_ref", "c_cur"))
      val totals = filled.agg(sum(col("c_ref")).as("n_ref"),
        sum(col("c_cur")).as("n_cur"), count(lit(1)).as("kk"))
      filled.crossJoin(broadcast(totals))
        .withColumn("p_ref", (col("c_ref").cast("double") + 1.0) /
          (col("n_ref").cast("double") + col("kk").cast("double")))
        .withColumn("p_cur", (col("c_cur").cast("double") + 1.0) /
          (col("n_cur").cast("double") + col("kk").cast("double")))
        // unrounded-p binding made explicit — same LCA knife edge and
        // fix as q_corpus_drift's kl_contrib (VERDICT r15 #1)
        .withColumn("kl_contrib",
          roundTo(col("p_ref") * log(col("p_ref") / col("p_cur")), 8))
        .select(col("cell").cast("long").as("cell"),
          col("c_ref"), col("c_cur"),
          roundTo(col("p_ref"), 8).as("p_ref"),
          roundTo(col("p_cur"), 8).as("p_cur"),
          col("kl_contrib"),
          col("centroid_norm"))
        .orderBy(col("kl_contrib").desc, col("cell").asc)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_embed_drift" ->
      s"""WITH $fitReplayCtes,
         |asg AS (${fitAssignSql("c2")}),
         |cnt AS (SELECT cell,
         |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
         |    CAST(SUM(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
         |  FROM asg GROUP BY cell),
         |cl AS (SELECT cell, ${roundToSql(normSql("c"), 6)} AS centroid_norm FROM c2),
         |f AS (SELECT cl.cell, COALESCE(c_ref, 0) AS c_ref,
         |        COALESCE(c_cur, 0) AS c_cur, centroid_norm
         |      FROM cl LEFT JOIN cnt USING (cell)),
         |n AS (SELECT CAST(SUM(c_ref) AS DOUBLE) AS n_ref,
         |        CAST(SUM(c_cur) AS DOUBLE) AS n_cur,
         |        CAST(count(*) AS DOUBLE) AS kk FROM f),
         |p AS (SELECT cell, c_ref, c_cur, centroid_norm,
         |        (CAST(c_ref AS DOUBLE) + 1.0) / (n_ref + kk) AS p_ref,
         |        (CAST(c_cur AS DOUBLE) + 1.0) / (n_cur + kk) AS p_cur
         |      FROM f CROSS JOIN n)
         |SELECT CAST(cell AS BIGINT) AS cell, CAST(c_ref AS BIGINT) AS c_ref,
         |  CAST(c_cur AS BIGINT) AS c_cur,
         |  ${roundToSql("p_ref", 8)} AS p_ref, ${roundToSql("p_cur", 8)} AS p_cur,
         |  ${roundToSql("p_ref * ln(p_ref / p_cur)", 8)} AS kl_contrib,
         |  centroid_norm
         |FROM p ORDER BY kl_contrib DESC, cell ASC""".stripMargin,

    "q_ann_ivf" ->
      s"""WITH dims AS (SELECT unnest(range(1, 65)) AS i),
         |comps AS (
         |  SELECT label, i - 1 AS dim,
         |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE)
         |      / count(*) AS c
         |  FROM embeddings, dims GROUP BY 1, 2),
         |q AS (SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS qx
         |      FROM embeddings, dims WHERE vec_id = 0),
         |cell AS (
         |  SELECT c.label,
         |    CAST(SUM(CAST(c.c * q.qx AS DECIMAL(28,12))) AS DOUBLE) AS cell_dot
         |  FROM comps c JOIN q ON c.dim = q.dim GROUP BY 1),
         |probed AS (SELECT label FROM cell ORDER BY cell_dot DESC, label ASC LIMIT 2),
         |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.label,
         |  ${roundToSql(cosineSql("e.embedding", "qv.q_emb"), 6)} AS cos_sim
         |FROM embeddings e JOIN probed p ON e.label = p.label, qv
         |WHERE e.vec_id <> 0
         |ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    "q_topic_sample" ->
      s"""WITH $fitReplayCtes,
         |af AS (${fitAssignSql("c2")}),
         |cnt AS (SELECT cell, count(*) AS c FROM af GROUP BY 1),
         |mn AS (SELECT min(c) AS cmin FROM cnt),
         |rates AS (SELECT cell,
         |    CAST(FLOOR(10000 * sqrt(CAST(cmin AS DOUBLE) / c)) AS INTEGER)
         |      AS rate_bp
         |  FROM cnt CROSS JOIN mn)
         |SELECT af.vec_id, CAST(af.cell AS BIGINT) AS cell, r.rate_bp
         |FROM af JOIN rates r ON af.cell = r.cell
         |WHERE ${TextOps.hash60Sql("'topic:' || CAST(af.vec_id AS VARCHAR)")}
         |  % 10000 < r.rate_bp
         |ORDER BY af.vec_id""".stripMargin,

    "q_ann_ivf_built" ->
      s"""WITH $fitReplayCtes,
         |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |probed AS (
         |  SELECT cell FROM (
         |    SELECT c.cell, ${distSqSql("q.q_emb", "c.c")} AS d FROM c2 c, qv q)
         |  ORDER BY d ASC, cell ASC LIMIT 2),
         |af AS (${fitAssignSql("c2")})
         |SELECT e.vec_id, e.cell,
         |  ${roundToSql(cosineSql("e.embedding", "q.q_emb"), 6)} AS cos_sim
         |FROM af e JOIN probed p ON e.cell = p.cell CROSS JOIN qv q
         |WHERE e.vec_id <> 0
         |ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    "q_ivf_batch" ->
      s"""WITH $fitReplayCtes,
         |$ivfBatchCtes
         |SELECT q_id, rank, vec_id, cos_sim FROM rk
         |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // recall@5 of the IVF leg against the brute-force truth: both
    // legs replayed (rk = the served list, exr = the exact list),
    // hits counted per query
    "q_ann_recall" ->
      s"""WITH $fitReplayCtes,
         |$ivfBatchCtes,
         |ex AS (
         |  SELECT q.q_id, e.vec_id,
         |    ${roundToSql(cosineSql("e.embedding", "q.q_emb"), 6)} AS cos_sim
         |  FROM embeddings e CROSS JOIN qs q
         |  WHERE e.vec_id <> q.q_id),
         |exr AS (
         |  SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos_sim DESC, vec_id ASC) AS rank
         |  FROM ex)
         |SELECT i.q_id, CAST(COUNT(x.vec_id) AS BIGINT) AS n_hits,
         |  CAST(COUNT(x.vec_id) AS DOUBLE) / 5 AS recall
         |FROM (SELECT q_id, vec_id FROM rk WHERE rank <= 5) i
         |LEFT JOIN (SELECT q_id, vec_id FROM exr WHERE rank <= 5) x
         |  ON i.q_id = x.q_id AND i.vec_id = x.vec_id
         |GROUP BY i.q_id ORDER BY i.q_id""".stripMargin,

    // q_ivfpq's fit replays (i-prefixed IVF + per-subspace PQ), BATCH
    // routing (per-query rank-2 cells), per-query subspace LUTs, the
    // raw-double ADC cut at C=60, round-6 exact rerank to top-5, then
    // the q_ann_recall hit join against the brute-force truth.
    "q_ann_recall_pq" -> {
      def iAssignSql(src: String) =
        s"""SELECT vec_id, embedding, cell FROM (
           |    SELECT e.vec_id, e.embedding, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${distSqSql("e.embedding", "c.c")} ASC, c.cell ASC) AS rn
           |    FROM embeddings e CROSS JOIN $src c) WHERE rn = 1""".stripMargin
      def iMeansSql(a: String) =
        s"""SELECT cell, i AS dim,
           |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE)
           |      / count(*) AS cd
           |  FROM $a, dims GROUP BY cell, i""".stripMargin
      def sub(s: Int): String = {
        val st = s * 16 + 1
        def dss(e: String, c: String) = distSqSliceSql(e, c, st, 16)
        s"""seeds$s AS (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
           |    list_transform(range(1, 17), i -> CAST(embedding[${st - 1} + i] AS DOUBLE)) AS c
           |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4)),
           |a$s AS (
           |  SELECT vec_id, embedding, cell FROM (
           |    SELECT e.vec_id, e.embedding, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${dss("e.embedding", "c.c")} ASC, c.cell ASC) AS rn
           |    FROM embeddings e CROSS JOIN seeds$s c) WHERE rn = 1),
           |md$s AS (
           |  SELECT cell, i AS dim,
           |    CAST(SUM(CAST(CAST(embedding[${st - 1} + i] AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE)
           |      / count(*) AS cd
           |  FROM a$s, sdims GROUP BY cell, i),
           |m$s AS (SELECT cell, array_agg(cd ORDER BY dim) AS c FROM md$s GROUP BY cell),
           |cb$s AS (SELECT s.cell, COALESCE(m.c, s.c) AS c
           |         FROM seeds$s s LEFT JOIN m$s m USING (cell)),
           |code$s AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT e.vec_id, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${dss("e.embedding", "c.c")} ASC, c.cell ASC) AS rn
           |    FROM embeddings e CROSS JOIN cb$s c) WHERE rn = 1),
           |lut$s AS (SELECT q.q_id, c.cell, ${dss("q.q_emb", "c.c")} AS d
           |          FROM cb$s c CROSS JOIN qs q)""".stripMargin
      }
      s"""WITH dims AS (SELECT unnest(range(1, 65)) AS i),
         |sdims AS (SELECT unnest(range(1, 17)) AS i),
         |qs AS (SELECT vec_id AS q_id, embedding AS q_emb
         |       FROM embeddings WHERE vec_id < 8),
         |iseeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |    list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE)) AS c
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
         |ia1 AS (${iAssignSql("iseeds")}),
         |im1d AS (${iMeansSql("ia1")}),
         |im1 AS (SELECT cell, array_agg(cd ORDER BY dim) AS c FROM im1d GROUP BY cell),
         |ic1 AS (SELECT s.cell, COALESCE(m.c, s.c) AS c
         |        FROM iseeds s LEFT JOIN im1 m USING (cell)),
         |ia2 AS (${iAssignSql("ic1")}),
         |im2d AS (${iMeansSql("ia2")}),
         |im2 AS (SELECT cell, array_agg(cd ORDER BY dim) AS c FROM im2d GROUP BY cell),
         |ic2 AS (SELECT p.cell, COALESCE(m.c, p.c) AS c
         |        FROM ic1 p LEFT JOIN im2 m USING (cell)),
         |routed AS (
         |  SELECT q_id, cell FROM (
         |    SELECT q.q_id, c.cell,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY ${distSqSql("q.q_emb", "c.c")} ASC, c.cell ASC) AS rn
         |    FROM qs q CROSS JOIN ic2 c) WHERE rn <= 2),
         |iaf AS (${iAssignSql("ic2")}),
         |${(0 until 4).map(sub).mkString(",\n")},
         |adc AS (
         |  SELECT r.q_id, e.vec_id, l0.d + l1.d + l2.d + l3.d AS adc
         |  FROM iaf e JOIN routed r ON e.cell = r.cell
         |${(0 until 4).map(s =>
            s"  JOIN code$s k$s ON k$s.vec_id = e.vec_id " +
              s"JOIN lut$s l$s ON l$s.cell = k$s.cell AND l$s.q_id = r.q_id")
            .mkString("\n")}
         |  WHERE e.vec_id <> r.q_id),
         |cand AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY adc ASC, vec_id ASC) AS crn
         |    FROM adc) WHERE crn <= 60),
         |rr AS (
         |  SELECT c.q_id, c.vec_id,
         |    ${roundToSql(cosineSql("e.embedding", "q.q_emb"), 6)} AS cos_sim
         |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
         |  JOIN qs q ON q.q_id = c.q_id),
         |rk AS (
         |  SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos_sim DESC, vec_id ASC) AS rank
         |  FROM rr),
         |ex AS (
         |  SELECT q.q_id, e.vec_id,
         |    ${roundToSql(cosineSql("e.embedding", "q.q_emb"), 6)} AS cos_sim
         |  FROM embeddings e CROSS JOIN qs q
         |  WHERE e.vec_id <> q.q_id),
         |exr AS (
         |  SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos_sim DESC, vec_id ASC) AS rank
         |  FROM ex)
         |SELECT i.q_id, CAST(COUNT(x.vec_id) AS BIGINT) AS n_hits,
         |  CAST(COUNT(x.vec_id) AS DOUBLE) / 5 AS recall
         |FROM (SELECT q_id, vec_id FROM rk WHERE rank <= 5) i
         |LEFT JOIN (SELECT q_id, vec_id FROM exr WHERE rank <= 5) x
         |  ON i.q_id = x.q_id AND i.vec_id = x.vec_id
         |GROUP BY i.q_id ORDER BY i.q_id""".stripMargin
    },

    // survivors = everything except the tombstoned residue class,
    // plus the revived half; cells from the identical fit replay
    "q_index_delete" ->
      s"""WITH $fitReplayCtes,
         |af AS (${fitAssignSql("c2")})
         |SELECT vec_id, cell FROM af
         |WHERE vec_id % 17 <> 3 OR vec_id % 34 = 3
         |ORDER BY vec_id""".stripMargin,

    // q_ivf_batch's replay with the metadata predicate (even label)
    // applied to the CANDIDATE side before ranking — the filtered-ANN
    // contract: the top-5 ranks only predicate-satisfying rows.
    "q_ann_filtered" -> filteredAnnOracleSql,

    // the POST-FILTER (dense) branch of the auto switch serves the
    // identical routed-probe-with-predicate semantics over the
    // persisted index, with no escalation at this density — one
    // fit-replay oracle pins both stacks
    "q_ann_postfilter" -> filteredAnnOracleSql,

    // PRE-FILTER exact serving: the brute leg is fit/codebook-
    // independent (the quantizer only places rows in cells; every
    // predicate survivor is scored full-precision), so ONE oracle —
    // predicate + exact cosine + rank, no replay — pins both the IVF
    // and the IVFADC switch (q_ann_prefilter_pq below shares it).
    "q_ann_prefilter" ->
      s"""WITH qs AS (SELECT vec_id AS q_id, embedding AS q_emb
         |            FROM embeddings WHERE vec_id < 8),
         |sc AS (
         |  SELECT q.q_id, e.vec_id,
         |    ${roundToSql(cosineSql("e.embedding", "q.q_emb"), 6)} AS cos_sim
         |  FROM embeddings e CROSS JOIN qs q
         |  WHERE e.vec_id <> q.q_id AND e.label % 25 = 3),
         |rk AS (
         |  SELECT q_id, vec_id, cos_sim,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos_sim DESC, vec_id ASC) AS rank
         |  FROM sc)
         |SELECT q_id, rank, vec_id, cos_sim FROM rk
         |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // the IVFADC switch serves the same exact answer (see above)
    "q_ann_prefilter_pq" ->
      s"""WITH qs AS (SELECT vec_id AS q_id, embedding AS q_emb
         |            FROM embeddings WHERE vec_id < 8),
         |sc AS (
         |  SELECT q.q_id, e.vec_id,
         |    ${roundToSql(cosineSql("e.embedding", "q.q_emb"), 6)} AS cos_sim
         |  FROM embeddings e CROSS JOIN qs q
         |  WHERE e.vec_id <> q.q_id AND e.label % 25 = 3),
         |rk AS (
         |  SELECT q_id, vec_id, cos_sim,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos_sim DESC, vec_id ASC) AS rank
         |  FROM sc)
         |SELECT q_id, rank, vec_id, cos_sim FROM rk
         |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // the identical fit + routing replay, candidates restricted to the
    // labeled pool, rank-5 cut, then the majority vote with the same
    // (votes desc, label asc) total order
    "q_knn_label" ->
      s"""WITH $fitReplayCtes,
         |af AS (${fitAssignSql("c2")}),
         |lab AS (
         |  SELECT a.vec_id, a.embedding, a.cell, e.label
         |  FROM af a JOIN embeddings e USING (vec_id)
         |  WHERE a.vec_id % 10 < 8),
         |qs AS (SELECT vec_id AS q_id, label AS true_label,
         |         embedding AS q_emb
         |       FROM embeddings WHERE vec_id % 10 >= 8),
         |routed AS (
         |  SELECT q_id, cell FROM (
         |    SELECT q.q_id, c.cell,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY ${distSqSql("q.q_emb", "c.c")} ASC, c.cell ASC) AS rn
         |    FROM qs q CROSS JOIN c2 c) WHERE rn <= 2),
         |sc AS (
         |  SELECT q.q_id, q.true_label, l.vec_id, l.label AS cand_label,
         |    ${roundToSql(cosineSql("l.embedding", "q.q_emb"), 6)} AS cos_sim
         |  FROM lab l JOIN routed r ON l.cell = r.cell
         |  JOIN qs q ON q.q_id = r.q_id),
         |rk AS (
         |  SELECT q_id, true_label, cand_label,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos_sim DESC, vec_id ASC) AS rn
         |  FROM sc),
         |votes AS (
         |  SELECT q_id, true_label, cand_label, count(*) AS v
         |  FROM rk WHERE rn <= 5 GROUP BY 1, 2, 3),
         |pred AS (
         |  SELECT q_id, true_label, cand_label, v,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY v DESC, cand_label ASC) AS prn
         |  FROM votes)
         |SELECT q_id, cand_label AS pred_label, CAST(v AS BIGINT) AS n_votes,
         |  cand_label = true_label AS correct
         |FROM pred WHERE prn = 1 ORDER BY q_id""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH b AS (
         |  SELECT vec_id, label, embedding,
         |    CAST(${lshBucketSql("embedding", 8)} AS BIGINT) AS bucket
         |  FROM embeddings),
         |q AS (SELECT bucket AS q_bucket, embedding AS q_emb FROM b WHERE vec_id = 0)
         |SELECT b.vec_id, b.label, b.bucket,
         |  ${roundToSql(cosineSql("b.embedding", "q.q_emb"), 6)} AS cos_sim
         |FROM b, q
         |WHERE bit_count(xor(b.bucket, q.q_bucket)) <= 1 AND b.vec_id <> 0
         |ORDER BY cos_sim DESC, b.vec_id ASC LIMIT 5""".stripMargin,

    "q_embedding_neardup_lsh" ->
      s"""WITH bk AS (
         |  SELECT vec_id, embedding,
         |    CAST(${lshBucketSql("embedding", 8)} AS BIGINT) AS bucket
         |  FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket,
         |  ${roundToSql(cosineSql("a.embedding", "b.embedding"), 6)} AS cos_sim
         |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |ORDER BY cos_sim DESC, id_a ASC, id_b ASC LIMIT 20""".stripMargin,

    "q_pq_adc" -> {
      // one PQ subspace: seeds → 1 Lloyd assignment → decimal means →
      // final codebook → per-doc code → query lookup table
      def sub(s: Int): String = {
        val st = s * 16 + 1
        def dss(e: String, c: String) = distSqSliceSql(e, c, st, 16)
        s"""seeds$s AS (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
           |    list_transform(range(1, 17), i -> CAST(embedding[${st - 1} + i] AS DOUBLE)) AS c
           |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4)),
           |a$s AS (
           |  SELECT vec_id, embedding, cell FROM (
           |    SELECT e.vec_id, e.embedding, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${dss("e.embedding", "c.c")} ASC, c.cell ASC) AS rn
           |    FROM embeddings e CROSS JOIN seeds$s c) WHERE rn = 1),
           |md$s AS (
           |  SELECT cell, i AS dim,
           |    CAST(SUM(CAST(CAST(embedding[${st - 1} + i] AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE)
           |      / count(*) AS cd
           |  FROM a$s, sdims GROUP BY cell, i),
           |m$s AS (SELECT cell, array_agg(cd ORDER BY dim) AS c FROM md$s GROUP BY cell),
           |cb$s AS (SELECT s.cell, COALESCE(m.c, s.c) AS c
           |         FROM seeds$s s LEFT JOIN m$s m USING (cell)),
           |code$s AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT e.vec_id, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${dss("e.embedding", "c.c")} ASC, c.cell ASC) AS rn
           |    FROM embeddings e CROSS JOIN cb$s c) WHERE rn = 1),
           |lut$s AS (SELECT c.cell, ${dss("q.q_emb", "c.c")} AS d FROM cb$s c, qv q)""".stripMargin
      }
      s"""WITH sdims AS (SELECT unnest(range(1, 17)) AS i),
         |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |${(0 until 4).map(sub).mkString(",\n")}
         |SELECT e.vec_id,
         |  ${roundToSql("l0.d + l1.d + l2.d + l3.d", 6)} AS adc_dist_sq
         |FROM embeddings e
         |${(0 until 4).map(s =>
            s"JOIN code$s k$s ON k$s.vec_id = e.vec_id " +
              s"JOIN lut$s l$s ON l$s.cell = k$s.cell").mkString("\n")}
         |WHERE e.vec_id <> 0
         |ORDER BY adc_dist_sq ASC, e.vec_id ASC LIMIT 10""".stripMargin
    },

    "q_ivfpq" -> {
      // IVF leg (q_ann_ivf_built's replay, CTEs i-prefixed so the PQ
      // leg's a0..a3 don't collide) + PQ leg (q_pq_adc's replay) +
      // the composition: route → ADC over routed cells → top-20 cut →
      // exact rerank. One spelling change anywhere desynchronizes the
      // hash — that is the point.
      def iAssignSql(src: String) =
        s"""SELECT vec_id, embedding, cell FROM (
           |    SELECT e.vec_id, e.embedding, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${distSqSql("e.embedding", "c.c")} ASC, c.cell ASC) AS rn
           |    FROM embeddings e CROSS JOIN $src c) WHERE rn = 1""".stripMargin
      def iMeansSql(a: String) =
        s"""SELECT cell, i AS dim,
           |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE)
           |      / count(*) AS cd
           |  FROM $a, dims GROUP BY cell, i""".stripMargin
      def sub(s: Int): String = {
        val st = s * 16 + 1
        def dss(e: String, c: String) = distSqSliceSql(e, c, st, 16)
        s"""seeds$s AS (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
           |    list_transform(range(1, 17), i -> CAST(embedding[${st - 1} + i] AS DOUBLE)) AS c
           |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4)),
           |a$s AS (
           |  SELECT vec_id, embedding, cell FROM (
           |    SELECT e.vec_id, e.embedding, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${dss("e.embedding", "c.c")} ASC, c.cell ASC) AS rn
           |    FROM embeddings e CROSS JOIN seeds$s c) WHERE rn = 1),
           |md$s AS (
           |  SELECT cell, i AS dim,
           |    CAST(SUM(CAST(CAST(embedding[${st - 1} + i] AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE)
           |      / count(*) AS cd
           |  FROM a$s, sdims GROUP BY cell, i),
           |m$s AS (SELECT cell, array_agg(cd ORDER BY dim) AS c FROM md$s GROUP BY cell),
           |cb$s AS (SELECT s.cell, COALESCE(m.c, s.c) AS c
           |         FROM seeds$s s LEFT JOIN m$s m USING (cell)),
           |code$s AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT e.vec_id, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${dss("e.embedding", "c.c")} ASC, c.cell ASC) AS rn
           |    FROM embeddings e CROSS JOIN cb$s c) WHERE rn = 1),
           |lut$s AS (SELECT c.cell, ${dss("q.q_emb", "c.c")} AS d FROM cb$s c, qv q)""".stripMargin
      }
      s"""WITH dims AS (SELECT unnest(range(1, 65)) AS i),
         |sdims AS (SELECT unnest(range(1, 17)) AS i),
         |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |iseeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |    list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE)) AS c
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
         |ia1 AS (${iAssignSql("iseeds")}),
         |im1d AS (${iMeansSql("ia1")}),
         |im1 AS (SELECT cell, array_agg(cd ORDER BY dim) AS c FROM im1d GROUP BY cell),
         |ic1 AS (SELECT s.cell, COALESCE(m.c, s.c) AS c
         |        FROM iseeds s LEFT JOIN im1 m USING (cell)),
         |ia2 AS (${iAssignSql("ic1")}),
         |im2d AS (${iMeansSql("ia2")}),
         |im2 AS (SELECT cell, array_agg(cd ORDER BY dim) AS c FROM im2d GROUP BY cell),
         |ic2 AS (SELECT p.cell, COALESCE(m.c, p.c) AS c
         |        FROM ic1 p LEFT JOIN im2 m USING (cell)),
         |probed AS (
         |  SELECT cell FROM (
         |    SELECT c.cell, ${distSqSql("q.q_emb", "c.c")} AS d FROM ic2 c, qv q)
         |  ORDER BY d ASC, cell ASC LIMIT 2),
         |iaf AS (${iAssignSql("ic2")}),
         |${(0 until 4).map(sub).mkString(",\n")},
         |cand AS (
         |  SELECT e.vec_id, e.cell, l0.d + l1.d + l2.d + l3.d AS adc
         |  FROM iaf e JOIN probed p ON e.cell = p.cell
         |${(0 until 4).map(s =>
            s"  JOIN code$s k$s ON k$s.vec_id = e.vec_id " +
              s"JOIN lut$s l$s ON l$s.cell = k$s.cell").mkString("\n")}
         |  WHERE e.vec_id <> 0
         |  ORDER BY adc ASC, e.vec_id ASC LIMIT 20)
         |SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
         |  ${roundToSql("c.adc", 6)} AS adc_dist_sq,
         |  ${roundToSql(cosineSql("e.embedding", "q.q_emb"), 6)} AS cos_sim
         |FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id CROSS JOIN qv q
         |ORDER BY cos_sim DESC, c.vec_id ASC LIMIT 10""".stripMargin
    },

    "q_ivfpq_res" -> {
      // q_ivfpq's IVF replay + a residual table (float-rounded, per
      // the Spark side's cast) + the PQ replay re-pointed at residuals
      // + per-probed-cell query-residual LUTs joined on BOTH the code
      // cell and the candidate's IVF cell.
      def iAssignSql(src: String) =
        s"""SELECT vec_id, embedding, cell FROM (
           |    SELECT e.vec_id, e.embedding, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${distSqSql("e.embedding", "c.c")} ASC, c.cell ASC) AS rn
           |    FROM embeddings e CROSS JOIN $src c) WHERE rn = 1""".stripMargin
      def iMeansSql(a: String) =
        s"""SELECT cell, i AS dim,
           |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE)
           |      / count(*) AS cd
           |  FROM $a, dims GROUP BY cell, i""".stripMargin
      def sub(s: Int): String = {
        val st = s * 16 + 1
        def dss(e: String, c: String) = distSqSliceSql(e, c, st, 16)
        s"""seeds$s AS (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
           |    list_transform(range(1, 17), i -> CAST(r[${st - 1} + i] AS DOUBLE)) AS c
           |  FROM (SELECT * FROM res ORDER BY vec_id LIMIT 4)),
           |a$s AS (
           |  SELECT vec_id, r, cell FROM (
           |    SELECT e.vec_id, e.r, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${dss("e.r", "c.c")} ASC, c.cell ASC) AS rn
           |    FROM res e CROSS JOIN seeds$s c) WHERE rn = 1),
           |md$s AS (
           |  SELECT cell, i AS dim,
           |    CAST(SUM(CAST(CAST(r[${st - 1} + i] AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE)
           |      / count(*) AS cd
           |  FROM a$s, sdims GROUP BY cell, i),
           |m$s AS (SELECT cell, array_agg(cd ORDER BY dim) AS c FROM md$s GROUP BY cell),
           |cb$s AS (SELECT s.cell, COALESCE(m.c, s.c) AS c
           |         FROM seeds$s s LEFT JOIN m$s m USING (cell)),
           |code$s AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT e.vec_id, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${dss("e.r", "c.c")} ASC, c.cell ASC) AS rn
           |    FROM res e CROSS JOIN cb$s c) WHERE rn = 1),
           |lut$s AS (SELECT qr.cell AS qcell, c.cell, ${dss("qr.qr", "c.c")} AS d
           |          FROM cb$s c CROSS JOIN qres qr)""".stripMargin
      }
      s"""WITH dims AS (SELECT unnest(range(1, 65)) AS i),
         |sdims AS (SELECT unnest(range(1, 17)) AS i),
         |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |iseeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |    list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE)) AS c
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
         |ia1 AS (${iAssignSql("iseeds")}),
         |im1d AS (${iMeansSql("ia1")}),
         |im1 AS (SELECT cell, array_agg(cd ORDER BY dim) AS c FROM im1d GROUP BY cell),
         |ic1 AS (SELECT s.cell, COALESCE(m.c, s.c) AS c
         |        FROM iseeds s LEFT JOIN im1 m USING (cell)),
         |ia2 AS (${iAssignSql("ic1")}),
         |im2d AS (${iMeansSql("ia2")}),
         |im2 AS (SELECT cell, array_agg(cd ORDER BY dim) AS c FROM im2d GROUP BY cell),
         |ic2 AS (SELECT p.cell, COALESCE(m.c, p.c) AS c
         |        FROM ic1 p LEFT JOIN im2 m USING (cell)),
         |iaf AS (${iAssignSql("ic2")}),
         |res AS (
         |  SELECT e.vec_id, e.cell,
         |    list_transform(range(1, 65), i ->
         |      CAST(CAST(e.embedding[i] AS DOUBLE) - c.c[i] AS FLOAT)) AS r
         |  FROM iaf e JOIN ic2 c USING (cell)),
         |probed AS (
         |  SELECT cell FROM (
         |    SELECT c.cell, ${distSqSql("q.q_emb", "c.c")} AS d FROM ic2 c, qv q)
         |  ORDER BY d ASC, cell ASC LIMIT 2),
         |qres AS (
         |  SELECT p.cell,
         |    list_transform(range(1, 65), i ->
         |      CAST(q.q_emb[i] AS DOUBLE) - c.c[i]) AS qr
         |  FROM probed p JOIN ic2 c USING (cell), qv q),
         |${(0 until 4).map(sub).mkString(",\n")},
         |cand AS (
         |  SELECT e.vec_id, e.cell, l0.d + l1.d + l2.d + l3.d AS adc
         |  FROM iaf e JOIN probed p ON e.cell = p.cell
         |${(0 until 4).map(s =>
            s"  JOIN code$s k$s ON k$s.vec_id = e.vec_id " +
              s"JOIN lut$s l$s ON l$s.cell = k$s.cell AND l$s.qcell = e.cell")
            .mkString("\n")}
         |  WHERE e.vec_id <> 0
         |  ORDER BY adc ASC, e.vec_id ASC LIMIT 20)
         |SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
         |  ${roundToSql("c.adc", 6)} AS adc_dist_sq,
         |  ${roundToSql(cosineSql("e.embedding", "q.q_emb"), 6)} AS cos_sim
         |FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id CROSS JOIN qv q
         |ORDER BY cos_sim DESC, c.vec_id ASC LIMIT 10""".stripMargin
    },

    "q_embed_quant" ->
      s"""WITH dims AS (SELECT unnest(range(1, 65)) AS i),
         |mm AS (
         |  SELECT i AS dim, MIN(CAST(embedding[i] AS DOUBLE)) AS mn,
         |         MAX(CAST(embedding[i] AS DOUBLE)) AS mx
         |  FROM embeddings, dims GROUP BY 1),
         |mv AS (SELECT list(mn ORDER BY dim) AS mns,
         |              list((mx - mn) / 255.0 ORDER BY dim) AS scs FROM mm),
         |dq AS (
         |  SELECT e.vec_id, e.embedding,
         |    list_transform(range(1, 65), i -> CASE WHEN mv.scs[i] = 0.0
         |      THEN mv.mns[i]
         |      ELSE mv.mns[i] + floor((CAST(e.embedding[i] AS DOUBLE) - mv.mns[i])
         |        / mv.scs[i] + 0.5) * mv.scs[i] END) AS deq
         |  FROM embeddings e, mv),
         |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
         |SELECT d.vec_id,
         |  ${roundToSql(cosineSql("d.embedding", "q.q_emb"), 6)} AS cos_exact,
         |  ${roundToSql(cosineSql("d.deq", "q.q_emb"), 6)} AS cos_q8
         |FROM dq d, qv q WHERE d.vec_id <> 0
         |ORDER BY cos_q8 DESC, d.vec_id ASC LIMIT 10""".stripMargin,

    "q_similarity_topk" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.label,
         |  ${roundToSql(cosineSql("e.embedding", "q.q_emb"), 6)} AS cos_sim
         |FROM embeddings e, q WHERE e.vec_id <> 0
         |ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    "q_batch_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
         |           FROM embeddings WHERE vec_id % 50 = 0),
         |s AS (
         |  SELECT q.q_id, e.vec_id,
         |    ${roundToSql(cosineSql("e.embedding", "q.q_emb"), 6)} AS cos_sim
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id),
         |r AS (
         |  SELECT q_id, vec_id, cos_sim,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos_sim DESC, vec_id ASC) AS rank
         |  FROM s)
         |SELECT q_id, rank, vec_id, cos_sim FROM r
         |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "q_embedding_pairs" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
         |  ${roundToSql(cosineSql("a.embedding", "b.embedding"), 6)} AS cos_sim
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |ORDER BY cos_sim DESC, id_a ASC, id_b ASC LIMIT 20""".stripMargin,

    "q_semantic_dedup" ->
      s"""WITH $fitReplayCtes,
         |aug AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000,
         |    list_transform(range(1, 65), i -> CAST(CAST(embedding[i] AS DOUBLE) *
         |      (1.0 + ((vec_id + i - 1) % 7 - 3) * 0.0005) AS FLOAT))
         |  FROM embeddings WHERE vec_id % 7 = 0),
         |asg AS (SELECT vec_id, embedding, cell FROM (
         |    SELECT a.vec_id, a.embedding, c.cell,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${distSqSql("a.embedding", "c.c")} ASC, c.cell ASC) AS rn
         |    FROM aug a CROSS JOIN c2 c) WHERE rn = 1),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id AS d
         |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${roundToSql(cosineSql("a.embedding", "b.embedding"), 6)} >= 0.999)
         |SELECT v.vec_id, v.cell,
         |  (v.vec_id NOT IN (SELECT d FROM dropped)) AS kept
         |FROM asg v ORDER BY v.vec_id""".stripMargin,

    // fit replay + the same planted-paraphrase corpus, corpus rows
    // assigned to their 1 nearest cell, eval rows routed to 2, flags
    // where they meet at cos >= tau — the Spark spelling step-for-step
    "q_semantic_decon" ->
      s"""WITH $fitReplayCtes,
         |ev AS (SELECT vec_id AS eval_id, embedding AS q_emb
         |       FROM embeddings WHERE vec_id % 97 = 0),
         |pl AS (SELECT vec_id + 200000 AS vec_id,
         |    list_transform(range(1, 65), i -> CAST(CAST(embedding[i] AS DOUBLE) *
         |      (1.0 + ((vec_id + i - 1) % 7 - 3) * 0.0005) AS FLOAT)) AS embedding
         |  FROM embeddings WHERE vec_id % 97 = 0),
         |corpus AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 <> 0
         |  UNION ALL SELECT vec_id, embedding FROM pl),
         |casg AS (SELECT vec_id, embedding, cell FROM (
         |    SELECT a.vec_id, a.embedding, c.cell,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${distSqSql("a.embedding", "c.c")} ASC, c.cell ASC) AS rn
         |    FROM corpus a CROSS JOIN c2 c) WHERE rn = 1),
         |routed AS (SELECT eval_id, q_emb, cell FROM (
         |    SELECT q.eval_id, q.q_emb, c.cell,
         |      row_number() OVER (PARTITION BY q.eval_id
         |        ORDER BY ${distSqSql("q.q_emb", "c.c")} ASC, c.cell ASC) AS rn
         |    FROM ev q CROSS JOIN c2 c) WHERE rn <= 2)
         |SELECT a.vec_id, r.eval_id,
         |  ${roundToSql(cosineSql("a.embedding", "r.q_emb"), 6)} AS cos
         |FROM casg a JOIN routed r ON a.cell = r.cell
         |WHERE ${roundToSql(cosineSql("a.embedding", "r.q_emb"), 6)}
         |  >= $SemanticDeconTau
         |ORDER BY vec_id, eval_id""".stripMargin,

    "q_label_centroids" -> {
      val dims = (0 until 4).map(i =>
        s"${roundToSql(s"CAST(SUM(CAST(CAST(embedding[${i + 1}] AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE) / count(*)", 6)} AS c$i")
        .mkString(",\n  ")
      s"""SELECT label, count(*) AS n_vectors,
         |  $dims
         |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
    }
  )
}
