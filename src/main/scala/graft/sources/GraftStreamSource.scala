package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.sinks.TableLog

/** STREAMING SOURCE over a table-log table —
  * `spark.readStream.format("graft").load(dir)` — so any Structured
  * Streaming query (watermarked aggregations, stream-stream joins,
  * arbitrary sinks) can consume a graft table continuously, composing
  * with the whole streaming operator surface instead of the
  * `changeFeedStream` foreachBatch helper.
  *
  * OFFSETS ARE COMMIT VERSIONS: `getOffset` reports the table's current
  * version (rate-limited by `maxVersionsPerTrigger` past the last batch
  * end), and `getBatch(start, end)` is exactly
  * [[TableLog.readChanges]]`(start, end)` — each micro-batch costs the
  * commits' TOUCH SETS, never a table scan, and the checkpointed offset
  * makes delivery exactly-once-per-version across restarts (the same
  * replay guarantee the manifests give the batch feed). Versions below
  * a vacuum watermark fail loudly on a stale restart rather than
  * silently skipping history.
  *
  * Two modes:
  *  - default: APPEND-ONLY ROW STREAM (Delta's default source
  *    semantics) — emits appended rows with the table schema. A
  *    row-changing commit in the range (CoW delete/update/merge,
  *    overwrite, restore, dv delete) is a LOUD error unless
  *    `ignoreChanges=true` (then its insert arm re-emits and its
  *    deletes drop — the caller has accepted Delta-ignoreChanges
  *    semantics); rows-preserving maintenance (compaction, checkpoints,
  *    txn markers) passes through silently with its empty diff.
  *  - `readChangeFeed=true`: the full change feed — data columns +
  *    `_change_type` + `_commit_version` — for CDC consumers; `keys`
  *    (comma-separated) opts into the KEYED feed, pairing each key's
  *    delete+insert per commit into `update_preimage`/`update_postimage`
  *    (the batch CDF reader's option, same name, same semantics).
  *
  * `startingVersion` is INCLUSIVE — the stream begins AT that commit
  * (the batch CDF reader's, `changeFeedStream`'s, and Delta's
  * convention; one option name must not mean off-by-one different
  * things across the three surfaces). A consumer bootstrapped from a
  * snapshot at version S passes `startingVersion = S + 1`.
  *
  * `Trigger.AvailableNow` is first-class ([[SupportsTriggerAvailableNow]]
  * — the v1 `Source` trait extends `SparkDataStream`, so the v2
  * admission-control interfaces bolt straight on): the drain bound
  * PINS to the table's head at `prepareForTriggerAvailableNow` (a
  * catch-up run never chases commits landing while it drains — it
  * terminates), micro-batches still respect `maxVersionsPerTrigger`
  * through the ReadLimit, and the query self-stops at the bound — the
  * cron-shaped consumer: drain everything committed so far as bounded
  * batches, checkpoint, exit.
  */
private[sources] class GraftStreamSource(val sqlContext: SQLContext,
                                         dir: String, cdf: Boolean,
                                         ignoreChanges: Boolean,
                                         startingVersion: Long,
                                         maxVersionsPerTrigger: Option[Long],
                                         override val schema: StructType,
                                         keys: Seq[String] = Nil)
    extends Source with SupportsTriggerAvailableNow {

  require(keys.isEmpty || cdf,
    "graft streaming source: the 'keys' option (keyed update attribution) " +
      "requires readChangeFeed=true")

  private def spark = sqlContext.sparkSession
  // the EXCLUSIVE lower offset bound: startingVersion itself delivers
  private val floor = math.max(startingVersion - 1L, 0L)
  // best-effort rate-limit cursor; corrected from real offsets in getBatch
  @volatile private var lastEnd: Long = -1L
  // AvailableNow drain bound, fixed at prepare time
  @volatile private var drainBound: Option[Long] = None

  override def getOffset: Option[OffsetV1] = {
    val cur = TableLog.currentVersion(spark, dir)
    if (cur <= floor) None
    else {
      val from = if (lastEnd >= 0L) math.max(lastEnd, floor) else floor
      val end = maxVersionsPerTrigger.fold(cur)(n =>
        math.min(cur, from + math.max(1L, n)))
      lastEnd = math.max(end, from)
      Some(LongOffset(lastEnd))
    }
  }

  // ---- v2 admission control (what Trigger.AvailableNow drives; a
  // SupportsAdmissionControl source takes this path for EVERY trigger,
  // so this subsumes getOffset's logic rather than duplicating it)

  override def prepareForTriggerAvailableNow(): Unit =
    drainBound = Some(TableLog.currentVersion(spark, dir))

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.fold(ReadLimit.allAvailable())(n =>
      ReadLimit.maxRows(math.max(1L, n))) // "rows" = commit versions here

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val from = Option(startOffset).map(_.json.trim.toLong).getOrElse(floor)
    val head = TableLog.currentVersion(spark, dir)
    val bound = drainBound.fold(head)(math.min(_, head))
    val capped = limit match {
      case r: ReadMaxRows => math.min(bound, from + math.max(1L, r.maxRows()))
      case _ => bound
    }
    val end = math.max(from, math.max(capped, floor))
    // an offset equal to the start means "no new data" — for the very
    // first poll of an empty/drained table, null means the same
    if (end <= from && startOffset == null) null
    else LongOffset(end)
  }

  private def toVersion(o: OffsetV1): Long = o.json.trim.toLong

  private def batchFrame(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(toVersion).getOrElse(floor)
    val to = toVersion(end)
    lastEnd = math.max(lastEnd, to)
    val changes = TableLog.readChanges(spark, dir, from, to, keys)
    if (cdf) changes
    else {
      if (!ignoreChanges) {
        // manifest-level check, driver-side and RANGE-sized (never the
        // table's whole lifetime): a commit with a non-empty remove set
        // that is not pure maintenance may have emitted deletes —
        // silently dropping them would desync every downstream
        // aggregate, so refuse loudly (Delta's rule). compactTable /
        // optimizeZOrdered / compactSmallFiles all commit as `compact`
        // (rows preserved), so layout maintenance passes through.
        val rowChanging = TableLog.historyRange(spark, dir, from, to)
          .filter(c => c.remove.nonEmpty &&
            !Set("compact", "purge", "txn", "checkpoint").contains(c.op))
        require(rowChanging.isEmpty,
          s"graft streaming source: versions ${rowChanging.map(_.version).mkString(", ")} " +
            s"of $dir contain row-changing commits (${rowChanging.map(_.op).distinct.mkString(", ")}) — " +
            "an append-only stream cannot represent deletes; read with " +
            "option(\"readChangeFeed\", \"true\") for CDC, or accept " +
            "option(\"ignoreChanges\", \"true\") semantics")
      }
      changes.filter(col("_change_type") === "insert")
        .drop("_change_type", "_commit_version")
    }
  }

  /** The declared stream schema is FIXED at query start; a schema
    * change committed mid-stream (a widen, an evolved append) would
    * otherwise surface as MicroBatchExecution's opaque "Invalid batch"
    * assertion. Fail INSTRUCTIVELY instead (Delta's behavior): the
    * checkpointed offset stops BEFORE the changing batch, so a restart
    * re-opens the source with the new schema and resumes exactly where
    * the old stream stopped — nothing is skipped or double-read.
    */
  private def conformed(df: DataFrame): DataFrame = {
    require(TableLog.nullableForm(df.schema) == TableLog.nullableForm(schema),
      s"graft streaming source: the table's schema changed mid-stream " +
        s"(stream started with ${schema.simpleString}, this batch is " +
        s"${df.schema.simpleString}) — restart the streaming query to " +
        "adopt the new schema; the checkpoint resumes at this batch")
    df
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame =
    // MicroBatchExecution asserts isStreaming on the returned frame —
    // stamp the batch plan through the shim (plan content unchanged)
    org.apache.spark.sql.graftshim.GraftStreamingShim.asStreaming(
      conformed(batchFrame(start, end)))

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftStreamSource[$dir, cdf=$cdf]"
}

/** STREAMING SINK — `df.writeStream.format("graft")…start(dir)`: each
  * micro-batch lands as ONE transactional table-log commit, marked
  * `(appId, batchId)` for EXACTLY-ONCE under foreachBatch-style
  * replay (a batch whose marker is already at the head skips — the
  * same `*Once` contract every graft streaming sink carries). Without
  * `keys` each batch APPENDS (the event-log shape, schema-checked
  * against the head); with `keys` each batch is a stats-pruned
  * [[TableLog.mergeIntoOnce]] upsert costing its TOUCH SET plus the
  * batch, never the table. `appId` defaults to a checkpoint-stable
  * name so a restarted query keeps its marker lineage.
  */
private[sources] class GraftStreamSink(sqlContext: SQLContext, dir: String,
                                       keys: Seq[String], appId: String,
                                       statsCols: Seq[String])
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long,
                        data: org.apache.spark.sql.DataFrame): Unit = {
    val spark = sqlContext.sparkSession
    // the incoming frame is incremental-execution state: re-materialize
    // as a batch plan before any table-log write path touches it
    val batch = org.apache.spark.sql.graftshim.GraftStreamingShim.asBatch(data)
    if (keys.nonEmpty) {
      TableLog.mergeIntoOnce(spark, dir, batch, keys, appId, batchId, statsCols)
      ()
    } else if (!TableLog.lastCommittedBatch(spark, dir, appId).exists(_ >= batchId)) {
      TableLog.append(spark, dir, batch, statsCols, txn = Some(appId -> batchId))
      ()
    }
  }

  override def toString: String = s"GraftStreamSink[$dir, keys=${keys.mkString(",")}]"
}
