package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

/** Distributed graph primitives over edge DataFrames — joins and
  * aggregations only, never a driver-side adjacency structure.
  */
object Graph {

  /** Connected components via min-label propagation WITH pointer
    * jumping (`label ← label(label)` every round) — the hash-to-min
    * family (Rastogi et al., "Finding Connected Components in
    * Map-Reduce in Logarithmic Rounds", ICDE 2013). Plain propagation
    * needs O(diameter) rounds; the jump step halves the remaining
    * pointer-chain depth each round, so convergence is O(log d) —
    * the property that keeps a chain-shaped 100 TB component from
    * turning the loop into a diameter-length job sequence.
    *
    * `pairs`: first two columns are 64-bit node ids of an undirected
    * edge. Returns (node, label) for every node incident to an edge;
    * label = the component's minimum node id. Callers re-attach
    * edge-less singletons themselves (at corpus scale the singleton
    * majority should never enter the loop at all).
    *
    * Scale shape: every step is a hash join or aggregation keyed by
    * node id. Per-round results are materialized behind FLAT plans
    * ([[shims.materializedWithHandle]] — a persist-only loop grows one
    * join deeper per round and analysis cost with it) and each round's
    * blocks are unpersisted as soon as the next round lands, so the
    * loop holds at most two copies of the working set at any moment
    * (localCheckpoint would leave O(rounds) copies to driver-GC
    * timing). Parallelism adapts to the MEASURED edge count (~1M
    * edges per partition): a near-dup graph is orders of magnitude
    * smaller than its corpus, so the session's shuffle parallelism is
    * pure scheduling overhead for it, while a graph that is actually
    * large gets the session cap.
    *
    * Convergence is witnessed by the label sum ACCUMULATED AS
    * DECIMAL(38,0) — labels only decrease, so an unchanged sum means
    * the round was the identity; a 64-bit sum would wrap, and a round
    * whose total decrease is a multiple of 2⁶⁴ would false-converge
    * with silently wrong labels. A graph that fails to converge
    * within `maxRounds` THROWS — a silent cap would emit wrong
    * cluster labels (the round-2 landmine). The default 64 covers any
    * diameter a 64-bit id space can express under O(log d) rounds, so
    * a throw indicates a logic error, not a big graph.
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 64): DataFrame =
    connectedComponentsWithHandle(pairs, maxRounds)._1

  /** [[connectedComponents]] plus the persisted-blocks handle of the
    * returned labels. The labels DataFrame reads persisted blocks that
    * otherwise stay resident until driver GC + ContextCleaner notice
    * the dropped reference — fine for one-shot batch queries, but a
    * caller invoking CC once per micro-batch (StreamingDedup's cluster
    * store) accumulates one working-set copy per trigger between GC
    * cycles. Such callers consume the result, then
    * `handle.unpersist()` deterministically. */
  def connectedComponentsWithHandle(pairs: DataFrame, maxRounds: Int = 64)
      : (DataFrame,
         org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]) = {
    val spark = pairs.sparkSession
    val Seq(a, b) = pairs.columns.take(2).toSeq
    // null endpoints cannot join (SQL semantics) — drop them up front
    // instead of letting a (null, null) label row ride every round
    val sym = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val (pre, preHandle) = shims.materializedWithHandle(sym)
    val nEdges = preHandle.count()
    if (nEdges == 0) {
      preHandle.unpersist(blocking = false)
      // handle already unpersisted — a second unpersist is a no-op
      return (pre.select(col("src").as("node"), col("src").as("label")).limit(0),
        preHandle)
    }
    val sessionParts = spark.sessionState.conf.numShufflePartitions
    val parts = math.max(1L, math.min(nEdges / 1000000L + 1, sessionParts.toLong)).toInt
    val (edges, edgesHandle) =
      shims.materializedWithHandle(pre.repartition(parts, col("src")))
    edgesHandle.count()
    preHandle.unpersist(blocking = false)
    // initial labels MUST be distinct: with one label row per INCIDENT
    // EDGE, round 1's join on src multiplies a degree-d node's d edge
    // rows by its d label rows — O(d²) join output, quadratic on hubs
    // (a 2M-spoke star = 4×10¹² rows; CCScaleProbe's star mode guards
    // this). One distinct shuffle is the correct price.
    var (labels, labelsHandle) = shims.materializedWithHandle(
      edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node")))
    labelsHandle.count()
    // sum sentinel: null forces ≥1 real round (a first round over any
    // non-empty edge set changes some label, so convergence is never
    // missed)
    var prevSum: java.math.BigDecimal = null
    var converged = false
    var round = 0
    val decSum = coalesce(sum(col("label").cast("decimal(38,0)")),
      lit(0).cast("decimal(38,0)"))
    while (!converged && round < maxRounds) {
      // (1) propagate: each node takes the min label over itself ∪ its
      // neighbors — one hash join + one aggregation, both keyed on the
      // node id. Lazily materialized: the jump's job computes it once
      // into the persisted blocks and its self-join reads them twice —
      // no separate materialization job per round.
      val (prop, propHandle) = shims.materializedWithHandle(
        edges
          .join(labels.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), col("label"))
          .union(labels)
          .groupBy(col("node")).agg(min(col("label")).as("label")))
      // (2) jump: label ← label(label). Every label value IS a node id
      // present in `prop` (labels are min-so-far reachable ids), so the
      // inner self-join is total and loses no node.
      val (next, nextHandle) = shims.materializedWithHandle(
        prop
          .join(prop.select(col("node").as("label"), col("label").as("parent")),
            Seq("label"))
          .select(col("node"), col("parent").as("label")))
      val curSum = next.agg(decSum).head().getDecimal(0)
      propHandle.unpersist(blocking = false)
      labelsHandle.unpersist(blocking = false)
      labels = next
      labelsHandle = nextHandle
      converged = prevSum != null && curSum.compareTo(prevSum) == 0
      prevSum = curSum
      round += 1
    }
    edgesHandle.unpersist(blocking = false)
    // NOTE: the final labels' blocks stay persisted — the returned
    // DataFrame reads them. Via [[connectedComponents]] they are freed
    // by ContextCleaner once the caller drops the reference (one
    // outstanding copy, not O(rounds)); per-trigger callers use the
    // returned handle to free them deterministically.
    if (!converged) {
      labelsHandle.unpersist(blocking = false)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxRounds rounds " +
          s"($nEdges directed edges) — refusing to emit possibly-wrong labels")
    }
    (labels.select(col("node"), col("label")), labelsHandle)
  }
}
