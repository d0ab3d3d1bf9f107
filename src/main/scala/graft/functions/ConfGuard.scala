package graft.functions

import org.apache.spark.sql.SparkSession

/** Session-config guard for the bounded-state aggregates (r10 verdict
  * #2, "What's wrong #1"): `ObjectHashAggregateExec` silently converts
  * to SORT-based aggregation once a partition sees more than
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
  * groups — and Spark's default is 128. Every signature primitive of
  * this engine ([[TopKByScore]], [[KmvMinHashes]], [[CmsSketch]]) is an
  * O(k)/O(d·w)-state aggregate built precisely FOR high-cardinality
  * groupings (one group per query / user / document), so a user session
  * at the default eats a measured 3× (68 → 23 s at 1M rows / 200k
  * groups, KNN_SCALE.json) with no signal. The harness sessions
  * (Verify / Bench / QTime / probes) raise the threshold to 2²²; this
  * guard makes the protection intrinsic — the Column BUILDERS call it,
  * so every entry point that constructs one of these aggregates
  * (Retrieval.bm25Batch, Ivf.searchBatch*, VectorOps batch top-k, the
  * KMV/CMS query builders, and any user composition) is covered without
  * each call site remembering to check.
  *
  * Behavior at the hazardous default, per `graft.boundedAgg.guard`
  * (a runtime conf on the session):
  *  - `warn` (default): one slf4j warning per (session, builder) with
  *    the measured cost and the fix — queries still run;
  *  - `error`: refuse with the same message (strict deployments);
  *  - `off`: silent (small-cardinality sessions that know).
  */
object ConfGuard {
  val ThresholdKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
  val ModeKey = "graft.boundedAgg.guard"
  val Recommended: Int = 4194304 // 2^22; buffers are O(k) small

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  // per-session warn dedup keyed on the session OBJECT via weak refs
  // (ADVICE r11: identityHashCode can be reused after GC / collide
  // across live sessions, silently suppressing a fresh session's
  // warning); a collected session's entry vanishes with it.
  private val warned = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]())

  /** Check the ACTIVE session (builders run on the driver at query
    * construction). Returns true iff the session is at a hazardous
    * threshold — exposed so specs assert firing without log capture.
    * No active session (pure expression unit tests) → no-op. */
  def checkBoundedAgg(builder: String): Boolean =
    SparkSession.getActiveSession.exists { spark =>
      val v =
        try spark.conf.get(ThresholdKey, "128").toLong
        catch { case _: NumberFormatException => 128L }
      val hazardous = v <= 128L
      if (hazardous) {
        val msg = s"graft: $builder builds a bounded-state ObjectHashAggregate, " +
          s"but $ThresholdKey=$v (the Spark default). Groupings past the threshold " +
          "silently fall back to a FULL SORT of the pre-aggregate input — measured " +
          s"3x at 1M rows / 200k groups (KNN_SCALE.json). Set $ThresholdKey=$Recommended " +
          s"(state is O(k) per group), or set $ModeKey=off to silence."
        spark.conf.get(ModeKey, "warn") match {
          case "off" => ()
          case "error" => throw new IllegalStateException(msg)
          case _ =>
            val set = warned.computeIfAbsent(spark,
              _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
            if (set.add(builder)) log.warn(msg)
        }
      }
      hazardous
    }
}
