package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.ops.{Cdc, Transforms}

/** Table shape of one CDC-replayed table: primary-key columns, the
  * columns that totally order each key's mutations (Debezium
  * `__ts_ms` + arrival tiebreak, an LSN, a (ts, seq) pair, …), the op
  * column, and the event-time column tombstone age-GC measures against
  * (data-relative — see [[CdcReplay.compact]]).
  *
  * The round-4 lane hardcoded `Seq("id")` / (`__ts_ms`, `batch_id`);
  * a composite-key or LSN-ordered table plugs in here instead. */
final case class CdcSpec(
    keyCols: Seq[String],
    orderCols: Seq[String],
    opCol: String = "__op",
    ageCol: String = "__ts_ms")

/** Streaming CDC replay: the full Debezium envelope stream — including
  * the updates and deletes the reference throws away
  * (`EngagementProcessor.scala:107`) — replayed into a warehouse table
  * that converges to the source table's current state.
  *
  * Merge-on-read design (the shape Hudi/Delta use for exactly this):
  *
  *   - each micro-batch APPENDS its mutations to an op log, keyed by
  *     `batch_id` with dynamic partition overwrite — the same
  *     idempotent-replay contract as the K3 warehouse sink (a replayed
  *     batch rewrites its own partition, never duplicates);
  *   - readers resolve current state on read via [[Cdc.resolveLatest]]
  *     (one `max_by` aggregation keyed by the primary key — the log is
  *     never globally sorted);
  *   - [[compact]] periodically materializes the resolved state as an
  *     atomic [[Snapshots]] version and prunes the log partitions it
  *     folded in, so read cost stays O(current table + recent log), not
  *     O(history). [[startLog]] wires compaction in on a batch-count
  *     cadence (`compactEvery`) — no manual operator loop needed.
  *
  * Ordering: last-writer-wins on [[CdcSpec.orderCols]] — for the
  * engagement table (`__ts_ms`, `batch_id`): the envelope's own CDC
  * timestamp, arrival order as tiebreak. A Debezium feed with an LSN
  * uses `CdcSpec(keys, Seq("__lsn"))` instead.
  */
object CdcReplay {

  /** The engagement-events table's shape (reference envelope,
    * Schemas.scala): key `id`, ordered by (`__ts_ms`, `batch_id`). */
  val EngagementSpec: CdcSpec = CdcSpec(Seq("id"), Seq("__ts_ms", "batch_id"))

  /** Parse → keep ALL ops (r|c|u|d) → enrich → derive. The u/d rows
    * flow through the same enrich/derive columns as inserts — a
    * replayed update carries its new metric values. */
  def transformCdc(raw: DataFrame, contentDim: DataFrame): DataFrame = {
    val parsed = Transforms.parseEnvelope(raw)
    val kept = Transforms.filterOps(parsed, keepMutations = true)
    val enriched = Transforms.enrich(kept, contentDim)
    Transforms.deriveMetrics(enriched)
      .withColumn("event_time", to_timestamp(col("event_ts")))
  }

  /** Append one micro-batch of mutations to the op log, idempotently
    * (replay rewrites the same batch_id partition). */
  def logBatch(logDir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(logDir)

  /** The log's `batch_id=` partition directories as of NOW. Compaction
    * must capture this listing ONCE and both read and delete exactly
    * it: listing again at delete time would race a live stream —
    * a partition committed between the resolution's listing and the
    * prune would be deleted without ever entering the snapshot
    * (silent, permanent data loss). */
  private def logPartitions(spark: SparkSession, logDir: String)
      : Seq[org.apache.hadoop.fs.Path] = {
    val logPath = new org.apache.hadoop.fs.Path(logDir)
    val fs = logPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(logPath)) Seq.empty
    else fs.listStatus(logPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
      .map(_.getPath)
  }

  /** Snapshot + log partitions since, LWW-resolved per key WITH delete
    * tombstones retained. The snapshot rows join the resolution as
    * ordinary mutations carrying their original ordering columns, so a
    * late log partition older than the snapshot still loses to it
    * correctly — including deletes: a compacted tombstone beats an
    * older straggler mutation of the same key (the key stays deleted
    * rather than resurrecting). */
  private def resolvedWithTombstones(spark: SparkSession,
      logParts: Seq[org.apache.hadoop.fs.Path], logDir: String,
      snap0: Option[(String, Long)], spec: CdcSpec): DataFrame = {
    // right after a compaction the log holds no batch_id= partitions at
    // all (every one was folded into the snapshot and pruned) — a bare
    // parquet read of the empty dir would die on schema inference.
    // basePath keeps batch_id a partition column under explicit paths.
    // SCHEMA EVOLUTION (round-9, r8 verdict item 5 — the
    // added-column case, routine at month 2 of any production CDC
    // feed): log partitions may carry heterogeneous schemas once the
    // upstream adds a column mid-stream, so the log read merges
    // footers (`mergeSchema` — cheap here: the log is bounded by the
    // compaction cadence, never corpus-sized) and the snapshot∪log
    // union null-fills missing columns on EITHER side. Old snapshot
    // rows serve NULL for columns added after they were written; a
    // column the upstream stops sending keeps its name and serves
    // NULL for new rows (LWW then ages it out of the resolved state
    // naturally). Compaction publishes the UNION schema, so evolution
    // survives the fold. RENAMES are out of scope by design: a rename
    // is indistinguishable from an add + a drop at the storage layer —
    // upstream must migrate values explicitly if continuity matters
    // (the Delta/Hudi stance).
    val log =
      if (logParts.nonEmpty)
        Some(spark.read.option("basePath", logDir)
          .option("mergeSchema", "true")
          .parquet(logParts.map(_.toString): _*))
      else None
    // the snapshot version arrives PRE-RESOLVED from the caller (one
    // Snapshots.resolve per entry point — review r10: currentState
    // used to probe existence with its own resolve and then resolve
    // again in here, doubling the FS listings and opening the exact
    // TOCTOU window this comment warns about)
    val snap = snap0.map { case (d, v) => Snapshots.readVersion(spark, d, v) }
    val full = (snap, log) match {
      case (Some(s), Some(l)) => s.unionByName(l, allowMissingColumns = true)
      case (Some(s), None) => s
      case (None, Some(l)) => l
      case (None, None) => throw new IllegalStateException(
        s"no CDC log partitions under $logDir and no snapshot" +
          snap0.fold("")(sv => s" under ${sv._1}"))
    }
    Cdc.resolveLatest(full, spec.keyCols, spec.orderCols, spec.opCol,
      keepTombstones = true)
  }

  /** Schema of the resolved ENGAGEMENT state: [[transformCdc]]'s output
    * plus the `batch_id` [[logBatch]] appends — derived by ANALYZING
    * the real transform over empty inputs (plan-only, no job), so it
    * can never drift from what the pipeline actually writes. */
  def stateSchema(spark: SparkSession): StructType = {
    import spark.implicits._
    val emptyRaw = Seq.empty[String].toDF("value")
    val emptyDim = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), graft.schemas.Schemas.content)
    transformCdc(emptyRaw, emptyDim).withColumn("batch_id", lit(0L)).schema
  }

  /** Current table state = snapshot (if any compaction ran) + the log
    * partitions since, LWW-resolved per key, deletes applied.
    *
    * Cold start (no log partition committed yet, no snapshot) returns
    * an EMPTY table — a poller watching a freshly started stream sees
    * "no rows yet", not an exception. The empty table's schema is
    * `coldSchema` when given, else the engagement pipeline's
    * [[stateSchema]] (a non-engagement [[CdcSpec]] must pass its own —
    * the lane cannot guess an arbitrary table's shape).
    *
    * READER CONTRACT under live compaction: the returned plan pins the
    * snapshot version and log partitions resolved NOW; both get one
    * compaction cycle of deferred-prune grace. A reader that starts
    * its action more than a cycle after planning (or polls at a
    * cadence comparable to the compaction interval) can lose the race
    * and fail on a pruned path — re-resolve by calling currentState
    * again and retrying the action, exactly the snapshot-isolation-
    * conflict retry Delta/Hudi readers perform. CdcSoakProbe measures
    * the race frequency under a deliberately aggressive cadence. */
  def currentState(spark: SparkSession, logDir: String,
      stateDir: Option[String] = None, spec: CdcSpec = EngagementSpec,
      coldSchema: Option[StructType] = None): DataFrame = {
    val parts = logPartitions(spark, logDir)
    // resolve ONCE; the resolved version flows into the read below
    val snap = stateDir.flatMap(d =>
      Snapshots.resolve(spark, d).map(v => (d, v)))
    if (parts.isEmpty && snap.isEmpty) {
      val schema = coldSchema.getOrElse {
        if (spec != EngagementSpec) throw new IllegalStateException(
          s"cold CDC store under $logDir: pass coldSchema for a " +
            "non-engagement CdcSpec (the empty table's shape is not derivable)")
        stateSchema(spark)
      }
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    } else
      Cdc.dropTombstones(
        resolvedWithTombstones(spark, parts, logDir, snap, spec), spec.opCol)
  }

  /** Materialize the resolved state as an atomic snapshot version
    * ([[Snapshots]] — readers never see a partial compaction) and
    * delete the log partitions it folded in. The snapshot KEEPS delete
    * tombstones (see [[resolvedWithTombstones]]); readers filter them.
    *
    * `tombstoneRetainMs`: optional tombstone GC — without it the
    * snapshot accumulates one tombstone per deleted key forever. A
    * tombstone only exists to out-order stragglers of its key, so one
    * older than the upstream's maximum delivery delay is dead weight:
    * with `Some(ms)`, tombstones whose [[CdcSpec.ageCol]] trails the
    * snapshot's own max by more than `ms` are dropped at publish. The
    * horizon is DATA-relative (max event ts, not the wall clock), so
    * a stalled stream never GCs anything — time only advances when
    * data does. Beyond-horizon stragglers then resurrect their key;
    * that is the explicit contract of choosing a finite horizon
    * (Debezium/Kafka deployments bound delivery delay by topic
    * retention the same way).
    *
    * Concurrency + crash windows:
    *   - the partition listing is captured ONCE per compaction —
    *     a live stream can keep appending during compaction and its
    *     new partitions are neither folded in nor deleted;
    *   - folded partitions are NOT deleted by the compaction that
    *     folds them: they are recorded in a `.pending_prune` manifest
    *     and deleted by the NEXT fresh compaction. In-flight
    *     `currentState` readers whose lazy plans captured those paths
    *     get a full compaction interval to finish (the same grace
    *     policy [[Snapshots]] gives superseded versions); leftover
    *     folded partitions resolve identically against the snapshot
    *     (it carries max ordering columns), so the deferred delete is
    *     a pure cost question, not correctness;
    *   - a crash anywhere leaves either a stale manifest (its entries
    *     get pruned next run; the unrecorded fold re-folds
    *     idempotently) or extra log partitions (harmless, as above) —
    *     replay-safe, never lossy;
    *   - a retry at a `version` that ALREADY COMMITTED publishes
    *     nothing ([[Snapshots.publish]] skips) and touches neither
    *     the manifest nor any partition: the captured listing may
    *     include partitions committed after the original compaction,
    *     which the committed snapshot does not contain. Distinct
    *     compactions use increasing versions. One operational
    *     constraint: resetting the streaming checkpoint (batch ids
    *     restart) requires resetting the log dir with it — enforced
    *     by [[startLog]]'s stamp file, which turns the round-4
    *     scaladoc footgun into a hard start-time error.
    */
  def compact(spark: SparkSession, logDir: String, stateDir: String,
      version: Long, tombstoneRetainMs: Option[Long] = None,
      spec: CdcSpec = EngagementSpec): Unit = {
    val freshVersion = !Snapshots.isCommitted(spark, stateDir, version)
    val fs = new org.apache.hadoop.fs.Path(logDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new org.apache.hadoop.fs.Path(logDir, ".pending_prune")
    // 1. grace expired: delete what the PREVIOUS compaction folded —
    //    before capturing this round's listing, so the resolution
    //    below never reads paths this call deletes
    if (freshVersion && fs.exists(manifest)) {
      val in = fs.open(manifest)
      val pending =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      pending.map(new org.apache.hadoop.fs.Path(_))
        .filter(fs.exists(_)).foreach(p => fs.delete(p, true))
    }
    // 2. capture + resolve + publish. An all-empty prefix (every early
    //    micro-batch filtered out before the log) means nothing to
    //    fold and nothing to publish — compacting would throw on
    //    (no log, no snapshot); skip the cycle instead of killing the
    //    stream (review r10: currentState guarded this cold case,
    //    compact did not).
    val parts = logPartitions(spark, logDir)
    val snap = Snapshots.resolve(spark, stateDir).map(v => (stateDir, v))
    if (parts.isEmpty && snap.isEmpty) return
    val resolved = resolvedWithTombstones(spark, parts, logDir, snap, spec)
      .persist() // two actions below (horizon scalar + write) — one execution
    try {
      val gated = tombstoneRetainMs match {
        case None => resolved
        case Some(ms) =>
          // one scalar pull per compaction (an operator action, not a
          // per-row path); data-relative horizon — see scaladoc.
          // ageCol is the SPEC's extension point (`__ts_ms`, an LSN, a
          // timestamp) — convert whatever ordinal type it carries to
          // the millis horizon instead of a blind cast that dies with
          // ClassCastException at the first compaction (review r10)
          val horizonLit = Option(
            resolved.agg(max(col(spec.ageCol))).first().get(0)).map {
              case l: java.lang.Long => lit(l.longValue() - ms)
              case i: java.lang.Integer => lit(i.longValue() - ms)
              case t: java.sql.Timestamp =>
                lit(new java.sql.Timestamp(t.getTime - ms))
              case i: java.time.Instant =>
                lit(java.sql.Timestamp.from(i.minusMillis(ms)))
              case other => throw new IllegalStateException(
                s"CdcSpec.ageCol '${spec.ageCol}' has unsupported type " +
                  s"${other.getClass.getName} for tombstone GC — use a " +
                  "LONG/INT millis column or a TIMESTAMP")
            }
          // a tombstone with NULL age is never GC'd (age unknowable
          // → conservative); without the null guard three-valued logic
          // would drop it unconditionally
          horizonLit.fold(resolved)(h => resolved.filter(
            !(coalesce(col(spec.opCol) === "d", lit(false)) &&
              col(spec.ageCol).isNotNull && col(spec.ageCol) < h)))
      }
      Snapshots.publish(gated, stateDir, version)
    } finally resolved.unpersist()
    // 3. record this round's fold for the next compaction's prune
    if (freshVersion) {
      val out = fs.create(manifest, true)
      try out.write(parts.map(_.toString).mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** Enforce the checkpoint↔log pairing at start time. A streaming
    * checkpoint reset restarts batch ids at 0; replayed ids would then
    * dynamically overwrite `batch_id=` partitions that belong to the
    * PREVIOUS run (and a stale `.pending_prune` manifest could name
    * re-created partitions). The stamp file in the log dir records
    * which checkpoint owns the log; a fresh checkpoint over a
    * non-fresh log dir — or a log dir stamped for a different
    * checkpoint — is a hard error instead of silent corruption. */
  private[graft] def enforceCheckpointPairing(spark: SparkSession, logDir: String,
      checkpoint: String, stateDir: Option[String] = None): Unit = {
    val logPath = new org.apache.hadoop.fs.Path(logDir)
    val fs = logPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the checkpoint may live on a different FileSystem than the log
    val ckptPath = new org.apache.hadoop.fs.Path(checkpoint)
    val ckptFs = ckptPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val offsets = new org.apache.hadoop.fs.Path(ckptPath, "offsets")
    val checkpointStarted =
      ckptFs.exists(offsets) && ckptFs.listStatus(offsets).nonEmpty
    val stamp = new org.apache.hadoop.fs.Path(logDir, ".cdc_checkpoint_stamp")
    val stamped: Option[String] =
      if (!fs.exists(stamp)) None
      else {
        val in = fs.open(stamp)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
        finally in.close()
      }
    // qualify so "/tmp/x" and "file:/tmp/x" stamp identically
    val canonical = ckptFs.makeQualified(ckptPath).toUri.toString
    if (!checkpointStarted &&
        (stamped.isDefined || logPartitions(spark, logDir).nonEmpty ||
          fs.exists(new org.apache.hadoop.fs.Path(logDir, ".pending_prune"))))
      throw new IllegalStateException(
        s"checkpoint $checkpoint is fresh but CDC log dir $logDir is not: " +
          "restarted batch ids would overwrite a previous run's batch_id= " +
          "partitions. Reset (delete) the log dir and state dir together " +
          "with the checkpoint.")
    // the same reset discipline for the SNAPSHOT store: a fresh
    // checkpoint over a state dir holding committed versions would
    // fold the dead pre-reset corpus back in at the first compaction
    // (or re-serve an ancient version when the restarted batch id
    // matches a committed one) — the log-dir guard alone let this
    // through whenever the operator reset checkpoint + log but kept
    // state (review r10)
    if (!checkpointStarted &&
        stateDir.exists(d => Snapshots.resolve(spark, d).isDefined))
      throw new IllegalStateException(
        s"checkpoint $checkpoint is fresh but CDC state dir " +
          s"${stateDir.get} holds committed snapshots: a restarted " +
          "stream would resurrect the previous run's corpus at its " +
          "first compaction. Reset (delete) the state dir together " +
          "with the checkpoint and log dir.")
    if (stamped.exists(_ != canonical))
      throw new IllegalStateException(
        s"CDC log dir $logDir is stamped for checkpoint ${stamped.get}, " +
          s"not $checkpoint — each replay log is owned by exactly one " +
          "checkpoint. Use the original checkpoint or a fresh log dir.")
    if (stamped.isEmpty) {
      fs.mkdirs(logPath)
      // adopting a pre-stamp-era log (checkpoint already started,
      // partitions on disk, no stamp) is the legal upgrade path, but
      // it is also what a MIS-PAIRED manual wiring looks like — say so
      // instead of stamping silently (ADVICE r6)
      if (checkpointStarted && logPartitions(spark, logDir).nonEmpty)
        System.err.println(
          s"[cdc] adopting unstamped CDC log $logDir for checkpoint " +
            s"$canonical — verify this is the log that checkpoint wrote")
      // ATOMIC claim: two concurrent startLog calls on the same fresh
      // log dir both observe "no stamp" above; an overwriting create
      // would let the second clobber the first and BOTH queries run,
      // silently violating the one-checkpoint-per-log invariant.
      // Exactly one claim wins; the loser re-reads and re-validates —
      // same checkpoint is a benign self-race, a different one is the
      // hard error the stamp exists to throw.
      if (!claimStamp(fs, stamp, canonical)) {
        // On HDFS-likes the winner's stamp is visible (length 0)
        // between its create and close — reading "" there would turn
        // the benign same-checkpoint self-race into a spurious hard
        // error (the local path publishes atomically via hardlink and
        // never shows this window). Re-read briefly until content
        // appears; a stamp still empty after the grace is a genuinely
        // broken claim and errors loudly (review r10).
        def readStamp(): String = {
          val in = fs.open(stamp)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        }
        var winner = readStamp()
        var tries = 0
        while (winner.isEmpty && tries < 50) {
          Thread.sleep(20)
          winner = readStamp()
          tries += 1
        }
        if (winner.isEmpty)
          throw new IllegalStateException(
            s"CDC log dir $logDir has an empty checkpoint stamp after a " +
              "concurrent claim — the claiming writer died mid-publish; " +
              "remove the stamp after verifying no other query owns the log.")
        if (winner != canonical)
          throw new IllegalStateException(
            s"CDC log dir $logDir was concurrently stamped for " +
              s"checkpoint $winner, not $checkpoint — each replay log " +
              "is owned by exactly one checkpoint.")
      }
    }
  }

  /** Create `stamp` with `content` EXCLUSIVELY — returns false if some
    * other writer (concurrent or prior) owns it. On a local filesystem
    * Hadoop's `create(…, overwrite = false)` is check-then-act (both
    * racers pass the exists probe, the second truncates the first), so
    * the local path commits via hardlink instead: write a private temp
    * file, then `Files.createLink(stamp, tmp)` — POSIX link(2) fails
    * EEXIST atomically and publishes the full content in one step (no
    * empty-stamp window for a concurrent reader). Non-local
    * filesystems keep `create(false)`, which IS atomic on HDFS-likes. */
  private def claimStamp(fs: org.apache.hadoop.fs.FileSystem,
      stamp: org.apache.hadoop.fs.Path, content: String): Boolean = {
    val bytes = content.getBytes("UTF-8")
    if (fs.getUri.getScheme == "file") {
      val target = java.nio.file.Paths.get(stamp.toUri.getPath)
      val tmp = java.nio.file.Files.createTempFile(
        target.getParent, ".cdc_stamp_", ".tmp")
      try {
        java.nio.file.Files.write(tmp, bytes)
        try { java.nio.file.Files.createLink(target, tmp); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      try {
        val out = fs.create(stamp, false)
        try out.write(bytes) finally out.close()
        true
      } catch {
        case _: java.io.IOException if fs.exists(stamp) => false
      }
    }
  }

  /** Wire an already-transformed mutation stream into the op log, with
    * optional policy-driven compaction: every `compactEvery` batches
    * the foreachBatch hook compacts log→snapshot at `version =
    * batch id` (monotone; a crash-replay retries the same version
    * idempotently — [[compact]] skips the committed publish). The
    * stamp-file pairing check runs before the query starts.
    *
    * `onCompact(version, seconds)` is an ops hook (metrics/logging);
    * it runs after each completed compaction on the micro-batch
    * thread. */
  def startLog(mutations: DataFrame, logDir: String, checkpoint: String,
      triggerMs: Long = 1000L, stateDir: Option[String] = None,
      compactEvery: Option[Int] = None,
      tombstoneRetainMs: Option[Long] = None,
      spec: CdcSpec = EngagementSpec,
      onCompact: (Long, Double) => Unit = (_, _) => ()): StreamingQuery = {
    enforceCheckpointPairing(mutations.sparkSession, logDir, checkpoint, stateDir)
    require(compactEvery.forall(_ > 0), "compactEvery must be positive")
    require(compactEvery.isEmpty || stateDir.isDefined,
      "compactEvery needs a stateDir to compact into")
    mutations.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        logBatch(logDir)(batch, batchId)
        for (every <- compactEvery; state <- stateDir)
          if (batchId > 0 && batchId % every == 0) {
            val t0 = System.nanoTime()
            compact(batch.sparkSession, logDir, state, version = batchId,
              tombstoneRetainMs, spec)
            onCompact(batchId, (System.nanoTime() - t0) / 1e9)
          }
      }
      .start()
  }

  /** Wire a raw ENGAGEMENT envelope stream into the op log (the
    * round-4 entry point, now via [[startLog]] — same contract plus
    * pairing enforcement and optional compaction cadence). */
  def start(raw: DataFrame, contentDim: DataFrame, logDir: String,
      checkpoint: String, triggerMs: Long = 1000L,
      stateDir: Option[String] = None, compactEvery: Option[Int] = None,
      tombstoneRetainMs: Option[Long] = None): StreamingQuery =
    startLog(transformCdc(raw, contentDim), logDir, checkpoint, triggerMs,
      stateDir, compactEvery, tombstoneRetainMs, EngagementSpec)
}
