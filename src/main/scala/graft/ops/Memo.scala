package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-scoped stage memo for expensive fixture/pipeline stages
  * whose values are EAGER `localCheckpoint`s (materialized RDD blocks
  * with flat plans — they survive the harness's per-query
  * `cacheManager.clearCache()` and carry no lineage back to their
  * source scan). Ownership of the checkpointed blocks is the memo's:
  * callers never unpersist what they are handed.
  *
  * Concurrency (round-9, second pass): entries are FUTURE-VALUED —
  * `computeIfAbsent` only CONSTRUCTS an unstarted task (cheap, no
  * user code inside the map's lock, so nested stages cannot recurse
  * into the map mid-update), and the compute itself runs via
  * `FutureTask.run()` with NO monitor held. The first caller of a key
  * executes it, concurrent callers of the SAME key block on the
  * task's result (not on a lock), and callers of DIFFERENT keys —
  * including nested stages invoked from inside a running compute —
  * proceed in parallel. This replaces the earlier whole-object
  * `synchronized`, which serialized every memoized stage across all
  * sessions for the full compute duration and could deadlock if a
  * compute ever touched the memo from another thread. A failed
  * compute removes its entry (failures are retried, not cached).
  *
  * Entries are keyed by session identity and SWEPT once the session's
  * SparkContext is stopped — a long-lived JVM cycling sessions does
  * not accumulate dead-session DataFrames (their checkpoint blocks
  * died with the session's executors; the sweep releases the last
  * driver-side references so they can be GC'd). (ADVICE r8.)
  */
object Memo {

  private final class Entry(val session: SparkSession, thunk: () => AnyRef) {
    val task = new java.util.concurrent.FutureTask[AnyRef](
      new java.util.concurrent.Callable[AnyRef] { def call(): AnyRef = thunk() })
  }

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), Entry]()

  /** Keys whose compute is running ON THIS THREAD. A compute that
    * re-enters [[stage]] with the SAME key would find its own
    * FutureTask already running: `run()` returns immediately and
    * `get()` blocks forever on the very thread executing the task — a
    * silent permanent hang. Nested stages with DIFFERENT keys are
    * fine (and used: pipeline stages compose); same-key re-entry is a
    * programming error and fails loudly instead. (ADVICE r9.) */
  private val inProgress = new ThreadLocal[scala.collection.mutable.Set[(String, String, String)]] {
    override def initialValue() = scala.collection.mutable.Set.empty
  }

  private def keyOf(s: SparkSession, dir: String, stage: String) =
    (s.sparkContext.applicationId + "#" + System.identityHashCode(s), dir, stage)

  /** Serve `stage` for (session, dir) from the memo, computing it at
    * most once per live session. `compute` must return an
    * already-materialized value (eager localCheckpoint) so no lazy
    * plan — with caches it expects alive — outlives this call. */
  def stage[A <: AnyRef](s: SparkSession, dir: String, stage: String)(
      compute: => A): A = {
    sweepStopped()
    val key = keyOf(s, dir, stage)
    if (inProgress.get.contains(key))
      throw new IllegalStateException(
        s"Memo.stage re-entered with its own key (stage '$stage', dir '$dir') " +
          "from inside its compute — this would deadlock waiting on itself")
    val e = entries.computeIfAbsent(key,
      _ => new Entry(s, () => compute))
    inProgress.get += key
    try {
      e.task.run() // first caller executes; others fall through to get()
      try e.task.get().asInstanceOf[A]
      catch {
        case ex: java.util.concurrent.ExecutionException =>
          entries.remove(key, e)
          throw ex.getCause
      }
    } finally inProgress.get -= key
  }

  /** Drop entries whose owning session has stopped — their blocks are
    * already gone; this releases the driver-side references. */
  private def sweepStopped(): Unit =
    entries.entrySet().removeIf(e => e.getValue.session.sparkContext.isStopped)

  /** Visible for tests: number of live entries after a sweep. */
  private[graft] def liveEntries: Int = { sweepStopped(); entries.size() }
}
