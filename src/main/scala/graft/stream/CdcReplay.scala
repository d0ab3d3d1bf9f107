package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.functions._
import graft.ops.{Cdc, Transforms}

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
  *     O(history).
  *
  * Ordering: last-writer-wins on (`__ts_ms`, `batch_id`) — the
  * envelope's own CDC timestamp, arrival order as tiebreak. A real
  * Debezium feed would use the LSN the connector can attach; the
  * envelope here carries what the reference's does (Schemas.scala).
  */
object CdcReplay {

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

  /** Snapshot + log partitions since, LWW-resolved per key WITH delete
    * tombstones retained. The snapshot rows join the resolution as
    * ordinary mutations carrying their original ordering columns, so a
    * late log partition older than the snapshot still loses to it
    * correctly — including deletes: a compacted tombstone beats an
    * older straggler mutation of the same key (the key stays deleted
    * rather than resurrecting). */
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

  private def resolvedWithTombstones(spark: SparkSession,
      logParts: Seq[org.apache.hadoop.fs.Path], logDir: String,
      stateDir: Option[String]): DataFrame = {
    // right after a compaction the log holds no batch_id= partitions at
    // all (every one was folded into the snapshot and pruned) — a bare
    // parquet read of the empty dir would die on schema inference.
    // basePath keeps batch_id a partition column under explicit paths.
    val log =
      if (logParts.nonEmpty)
        Some(spark.read.option("basePath", logDir)
          .parquet(logParts.map(_.toString): _*))
      else None
    // resolve ONCE and read that version directly — an existence check
    // that re-resolves inside read would double the FS listings and
    // open a TOCTOU window where the two resolves disagree
    val snap = stateDir
      .flatMap(d => Snapshots.resolve(spark, d)
        .map(v => Snapshots.readVersion(spark, d, v)))
    val full = (snap, log) match {
      case (Some(s), Some(l)) => s.unionByName(l)
      case (Some(s), None) => s
      case (None, Some(l)) => l
      case (None, None) => throw new IllegalStateException(
        s"no CDC log partitions under $logDir and no snapshot" +
          stateDir.fold("")(d => s" under $d"))
    }
    Cdc.resolveLatest(full, Seq("id"), Seq("__ts_ms", "batch_id"),
      keepTombstones = true)
  }

  /** Schema of the resolved state: [[transformCdc]]'s output plus the
    * `batch_id` [[logBatch]] appends — derived by ANALYZING the real
    * transform over empty inputs (plan-only, no job), so it can never
    * drift from what the pipeline actually writes. */
  def stateSchema(spark: SparkSession): org.apache.spark.sql.types.StructType = {
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
    * an EMPTY table with the pipeline's schema — a poller watching a
    * freshly started stream sees "no rows yet", not an exception. */
  def currentState(spark: SparkSession, logDir: String,
      stateDir: Option[String] = None): DataFrame = {
    val parts = logPartitions(spark, logDir)
    val hasSnap = stateDir.exists(d => Snapshots.resolve(spark, d).isDefined)
    if (parts.isEmpty && !hasSnap)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema(spark))
    else
      Cdc.dropTombstones(resolvedWithTombstones(spark, parts, logDir, stateDir))
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
    * with `Some(ms)`, tombstones whose `__ts_ms` trails the snapshot's
    * own max `__ts_ms` by more than `ms` are dropped at publish. The
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
    *     restart) requires resetting the log dir with it — stale
    *     manifest entries could otherwise name re-created partitions.
    */
  def compact(spark: SparkSession, logDir: String, stateDir: String,
      version: Long, tombstoneRetainMs: Option[Long] = None): Unit = {
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
    // 2. capture + resolve + publish
    val parts = logPartitions(spark, logDir)
    val resolved = resolvedWithTombstones(spark, parts, logDir, Some(stateDir))
      .persist() // two actions below (horizon scalar + write) — one execution
    try {
      val gated = tombstoneRetainMs match {
        case None => resolved
        case Some(ms) =>
          // one scalar pull per compaction (an operator action, not a
          // per-row path); data-relative horizon — see scaladoc
          val maxTs = Option(resolved.agg(max(col("__ts_ms"))).first().get(0))
            .map(_.asInstanceOf[Long])
          // a tombstone with NULL __ts_ms is never GC'd (age unknowable
          // → conservative); without the null guard three-valued logic
          // would drop it unconditionally
          maxTs.fold(resolved)(m => resolved.filter(
            !(coalesce(col("__op") === "d", lit(false)) &&
              col("__ts_ms").isNotNull && col("__ts_ms") < lit(m - ms))))
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

  /** Wire a raw envelope stream into the op log. */
  def start(raw: DataFrame, contentDim: DataFrame, logDir: String,
      checkpoint: String, triggerMs: Long = 1000L): StreamingQuery =
    transformCdc(raw, contentDim).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch(logBatch(logDir) _)
      .start()
}
