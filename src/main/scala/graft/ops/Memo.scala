package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-scoped stage memo for expensive fixture/pipeline stages
  * whose values are EAGER `localCheckpoint`s (materialized RDD blocks
  * with flat plans — they survive the harness's per-query
  * `cacheManager.clearCache()` and carry no lineage back to their
  * source scan). Ownership of the checkpointed blocks is the memo's:
  * callers never unpersist what they are handed.
  *
  * Round-9 hardening of the round-8 TextOps-private map (ADVICE r8):
  *  - entries are keyed by session identity and SWEPT once the
  *    session's SparkContext is stopped — a long-lived JVM cycling
  *    sessions no longer accumulates dead-session DataFrames (their
  *    checkpoint blocks died with the session's executors; the sweep
  *    releases the last driver-side references so they can be GC'd);
  *  - compute-and-insert runs under the memo's monitor (reentrant, so
  *    nested stages — cluster keepers inside the pipeline selection —
  *    still compose), closing the get-then-put race that could run
  *    the same expensive stage twice concurrently. The lock is NOT
  *    `computeIfAbsent` because nested stages would recursively
  *    update the same map, which ConcurrentHashMap forbids.
  */
object Memo {

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[
      (String, String, String), (SparkSession, AnyRef)]()

  private def keyOf(s: SparkSession, dir: String, stage: String) =
    (s.sparkContext.applicationId + "#" + System.identityHashCode(s), dir, stage)

  /** Serve `stage` for (session, dir) from the memo, computing it at
    * most once per live session. `compute` must return an
    * already-materialized value (eager localCheckpoint) so no lazy
    * plan — with caches it expects alive — outlives this call. */
  def stage[A <: AnyRef](s: SparkSession, dir: String, stage: String)(
      compute: => A): A = synchronized {
    sweepStopped()
    val key = keyOf(s, dir, stage)
    val hit = entries.get(key)
    if (hit != null) hit._2.asInstanceOf[A]
    else {
      val v = compute
      entries.put(key, (s, v))
      v
    }
  }

  /** Drop entries whose owning session has stopped — their blocks are
    * already gone; this releases the driver-side references. */
  private def sweepStopped(): Unit =
    entries.entrySet().removeIf(e => e.getValue._1.sparkContext.isStopped)

  /** Visible for tests: number of live entries after a sweep. */
  private[graft] def liveEntries: Int = synchronized { sweepStopped(); entries.size() }
}
