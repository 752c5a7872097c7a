package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.table.{CommitLog, KeyedTable}

/** `df.writeStream.format("graft").start(path)` — the write twin of the T33
  * CDC source: every micro-batch becomes ONE engine commit through the same
  * dispatch the batch writers use ([[graft.sources.GraftDataSource.executeWrite]]):
  * a missing table is created from the first non-empty batch (key config
  * from the write options, exactly like `df.write.format("graft")`), an
  * existing one takes the `op` option (`upsert` default / `insert` /
  * `bulk_insert`). `compactEvery = N` folds MOR deltas back into base files
  * every N batches — the [[StreamingIngest]] policy lifted into the
  * standard API surface.
  *
  * Restart semantics — EXACTLY-ONCE end state for every op: the engine
  * records the last applied batch id in TWO places. (1) A marker INSIDE
  * the query's checkpoint location (`<checkpoint>/graft-sink-last-batch`)
  * — the fast path; living in the checkpoint (not under the table, like
  * the CDC source's pins) means the marker DIES WITH the checkpoint: an
  * operator who wipes the checkpoint to restart the stream from scratch
  * gets batch ids from 0 applied again, never silently dropped against a
  * stale table-side marker. (2) Inside the table's own commit JSON
  * (`streamSink` + `streamBatchId`, written atomically WITH the commit),
  * which closes the marker's crash window: a crash between the table
  * commit and the marker write used to degrade to a re-apply — convergent
  * for upsert, but a DUPLICATE for `op = insert`/`bulk_insert` appends. A
  * restarted sink now scans the timeline ONCE for the highest batch id
  * recorded under its checkpoint identity and skips anything at or below
  * it, so a replayed append batch whose commit landed is skipped, not
  * landed twice. Without a resolvable checkpoint location both records
  * are skipped and only upsert idempotence remains.
  */
private[graft] class GraftStreamSink(
    spark: SparkSession,
    parameters: Map[String, String],
    tablePath: String,
    compactEvery: Int)
    extends Sink with Logging {

  private val checkpointLoc: Option[String] =
    parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
      .get("checkpointlocation")

  private val markerPath: Option[Path] =
    checkpointLoc.map(cp => new Path(cp, "graft-sink-last-batch"))

  // The sink's identity in commit metadata. new Path(..) normalizes
  // trailing slashes / redundant separators so the same checkpoint spelled
  // slightly differently across restarts still matches its own commits.
  private val sinkToken: Option[String] = checkpointLoc.map(new Path(_).toString)

  private def lastApplied: Long = markerPath.fold(-1L) { p =>
    val fs = CommitLog.fs(spark, p.toString)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim
        finally in.close()
      // a torn write (crash between create-truncate and write) must read as
      // ABSENT — batch replays then re-apply idempotently — never crash the
      // query with a NumberFormatException on every restart
      if (s.nonEmpty && s.forall(_.isDigit)) s.toLong else -1L
    }
  }

  private def recordApplied(batchId: Long): Unit = markerPath.foreach { p =>
    val fs = CommitLog.fs(spark, p.toString)
    if (!fs.exists(p.getParent)) fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(batchId.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  // the table can only transition absent → present (the first non-empty
  // batch creates it); caching the probe saves per-trigger metadata round
  // trips on object stores
  @volatile private var knownToExist = false
  private def tableExists: Boolean = {
    if (!knownToExist) knownToExist = CommitLog.exists(spark, tablePath)
    knownToExist
  }

  // Highest batch id the TIMELINE records for this sink (commit-embedded
  // exactly-once record) — scanned once per sink instance, on the first
  // trigger after table existence: a restart constructs a fresh sink, so
  // the crash-window replay is always caught; in steady state the
  // in-memory floor advances with each apply and the timeline is never
  // re-read. Long.MinValue = not yet scanned.
  @volatile private var timelineFloor: Long = Long.MinValue
  private def appliedFloor: Long = {
    if (timelineFloor == Long.MinValue) {
      timelineFloor = (for {
        token <- sinkToken.toSeq
        st <- CommitLog.state(spark, tablePath).toSeq
        c <- st.commits if c.streamSink.contains(token)
        id <- c.streamBatchId
      } yield id).foldLeft(-1L)(math.max)
    }
    timelineFloor
  }

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = synchronized {
    val last = // one marker read per trigger; timeline scan only on the first
      if (tableExists) math.max(lastApplied, appliedFloor) else -1L
    if (batchId <= last) {
      logInfo(s"graft sink at $tablePath skipping replayed batch $batchId " +
        s"(last applied $last).")
      return
    }
    def applyBatch(): Unit = {
      val batch: DataFrame = ColumnBridge.asBatchFrame(data.toDF())
      if (!batch.isEmpty) {
        graft.sources.GraftDataSource.executeWrite(
          spark, parameters + ("path" -> tablePath), batch, overwrite = !tableExists)
        knownToExist = true
      }
      // the compaction policy counts BATCHES, so the boundary check runs even
      // for an empty batch — otherwise periodically-empty triggers defer the
      // fold indefinitely and deltas accumulate past the configured bound
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0 && tableExists)
        KeyedTable.compact(spark, tablePath)
    }
    // scope every commit this trigger publishes under (sink, batchId) so the
    // apply is recorded atomically with the data — the marker below is then
    // only an optimization, not the correctness record
    sinkToken match {
      case Some(token) => CommitLog.withStreamBatch(token, batchId)(applyBatch())
      case None => applyBatch()
    }
    if (tableExists) {
      timelineFloor = math.max(appliedFloor, batchId)
      recordApplied(batchId)
    }
  }

  override def toString: String = s"GraftStreamSink[$tablePath]"
}
