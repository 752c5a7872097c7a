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
  * Restart semantics: the engine records the last applied batch id in a
  * marker INSIDE the query's checkpoint location
  * (`<checkpoint>/graft-sink-last-batch`), so the batch Spark replays after
  * a restart is SKIPPED rather than re-written — no duplicate commit, no
  * spurious CDC rows. Living in the checkpoint (not under the table, like
  * the CDC source's pins) means the marker DIES WITH the checkpoint: an
  * operator who wipes the checkpoint to restart the stream from scratch
  * gets batch ids from 0 applied again, never silently dropped against a
  * stale table-side marker. The marker is written after the table commit,
  * so the one crash window (commit landed, marker didn't) degrades to a
  * re-upsert of the same rows, which converges per key+precombine —
  * at-least-once delivery with an idempotent write, same contract as
  * [[StreamingIngest]]. Without a resolvable checkpoint location the
  * marker is skipped and only the idempotence guarantee remains. CAVEAT:
  * `op = insert`/`bulk_insert` appends are NOT idempotent — a replay
  * inside the crash window lands the batch twice; use the default upsert
  * op when exactly-once end state matters.
  */
private[graft] class GraftStreamSink(
    spark: SparkSession,
    parameters: Map[String, String],
    tablePath: String,
    compactEvery: Int)
    extends Sink with Logging {

  private val markerPath: Option[Path] =
    parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
      .get("checkpointlocation").map(cp => new Path(cp, "graft-sink-last-batch"))

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

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = synchronized {
    val last = lastApplied // one marker read per trigger
    if (tableExists && batchId <= last) {
      logInfo(s"graft sink at $tablePath skipping replayed batch $batchId " +
        s"(last applied $last).")
      return
    }
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
    if (tableExists) recordApplied(batchId)
  }

  override def toString: String = s"GraftStreamSink[$tablePath]"
}
