package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

import graft.table.{CommitLog, KeyedTable, MetaColumns}

/** Offset = a commit instant (the change feed's natural cursor); `json()`
  * is the instant string itself — instants are lexicographically ordered,
  * opaque to the checkpoint log, and human-readable in it.
  */
final case class GraftChangeOffset(commitTime: String) extends Offset {
  override def json(): String = commitTime
}

/** `spark.readStream.format("graft").load(path)` — the table's CDC feed as
  * a Structured Streaming source, making the T13 change stream consumable
  * by ANY streaming job (windowed aggs, stream-stream joins, foreachBatch
  * sinks) instead of only the polling library API. The write twin is
  * [[StreamingIngest]]; together they close the loop: stream in, table
  * services in the middle, stream out.
  *
  * Micro-batch N = exactly `KeyedTable.readChanges(since = offset(N-1))`
  * capped at offset(N) — upsert rows with their current full image plus
  * `_change_op = 'delete'` tombstones, identical row-for-row to the batch
  * CDC read over the same closed interval (the spec pins this equality).
  * Offsets are commit instants, so replay after a crash re-delivers the
  * same interval (at-least-once; effectively-once under idempotent sinks,
  * same contract as [[ChangeStream]]).
  *
  * Architecture: the legacy `Source` face of the source API (still the
  * sanctioned path for sources whose batch is an arbitrary PLAN — the
  * change feed merges deltas, archives, and anti-joins, it is not a file
  * list a DSv2 `MicroBatchStream` could hand out as input partitions; the
  * same reason the batch side rides the V1Scan bridge). `getBatch` returns
  * the engine's own DataFrame, so pruning/pushdown inside the feed behave
  * exactly as in batch.
  *
  * Start position: `option("startAt", instant)` streams from the given
  * instant (exclusive) — e.g. the bootstrap commit for full retained
  * history; without it, the feed starts at the tip observed when the query
  * first runs ("latest", matching [[ChangeStream]]'s default). A restart
  * from a checkpoint always resumes from the stored offset. Archive
  * retention still bounds replay: an interval whose pre-images were
  * cleaned fails loudly, never silently skips (readChanges' contract).
  *
  * Admission control: `option("maxCommitsPerTrigger", n)` caps each
  * micro-batch at n commits past the previous offset, so a backfill from
  * deep history drains as bounded batches instead of one table-sized one —
  * the Kafka `maxOffsetsPerTrigger` analogue at commit granularity.
  */
class GraftChangeSource(
    ctx: SQLContext, tablePath: String, startAt: Option[String],
    metadataPath: String, maxCommitsPerTrigger: Option[Int] = None,
    renameTolerant: Boolean = false) extends Source {

  require(maxCommitsPerTrigger.forall(_ > 0), "maxCommitsPerTrigger must be positive")

  private val spark: SparkSession = ctx.sparkSession

  // Seeds only batches whose `start` offset is absent — normally just batch
  // 0 of a fresh query, but ALSO batch 0's re-execution after a crash that
  // logged the batch's end offset without committing it. That replay must
  // deliver the SAME interval, so the value is pinned in the query's own
  // metadata directory on first construction (create-if-absent; a restart
  // reads it back) instead of being recomputed from the table tip, which
  // may have advanced — recomputing would silently drop batch 0's changes.
  private[streaming] val initialSince: String = {
    val fs = CommitLog.fs(spark, metadataPath)
    val p = new org.apache.hadoop.fs.Path(metadataPath, "graft-initial-since")
    // commit instants are pure digits (yyyyMMddHHmmssSSS); anything else on
    // file is a torn write (crash between create and flush) and must be
    // treated as ABSENT — an empty pin would compare below every instant
    // and silently replay the table's whole retained history
    def valid(s: String) = s.nonEmpty && s.forall(_.isDigit)
    def readBack(): Option[String] = {
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val s = try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
        finally in.close()
      if (valid(s)) Some(s) else None
    }
    readBack().getOrElse {
      val seed = startAt.getOrElse(CommitLog.requireState(spark, tablePath).latest.commitTime)
      if (!fs.exists(p.getParent)) fs.mkdirs(p.getParent)
      // Write-complete-then-publish: the full content lands in a private
      // temp file first, then publishes with an ATOMIC no-overwrite
      // primitive (hard link on file:// — POSIX link(2) fails if the target
      // exists; Hadoop rename elsewhere — it returns false on an existing
      // destination). The pin is therefore never observable half-written,
      // and of two racing first runs exactly ONE publishes; the loser reads
      // the winner's value back, so both agree on a single start.
      if (fs.exists(p)) fs.delete(p, false) // invalid legacy pin (readBack rejected it)
      val tmp = new org.apache.hadoop.fs.Path(
        metadataPath, s".graft-initial-since.${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, true)
      try out.write(seed.getBytes("UTF-8")) finally out.close()
      try {
        val isLocal = Option(fs.getUri.getScheme).forall(s => s == "file" || s.isEmpty)
        if (isLocal)
          try java.nio.file.Files.createLink(
            java.nio.file.Paths.get(p.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          catch { case _: java.nio.file.FileAlreadyExistsException => () } // loser
        else fs.rename(tmp, p) // false (no-op) when the winner already published
      } finally fs.delete(tmp, false)
      readBack().getOrElse(seed)
    }
  }

  /** The query's analysis-time schema, captured once at construction. T39
    * schema changes (RENAME/DROP/ADD COLUMN) landing while the stream runs
    * make positional binding against this snapshot unsafe — a dropped
    * middle column would shift every later column one slot left — so the
    * next micro-batch FAILS LOUDLY instead (the same contract as Delta's
    * streaming source). Restarting the query re-reads the table schema and
    * resumes from the checkpointed offset: already-committed batches are
    * not replayed, and the replanned interval — including the part written
    * BEFORE the change — is served under the NEW logical names (old files
    * read through the current column mapping).
    *
    * Opt-out for the one safe case: `option("onSchemaChange", "allowRename")`
    * keeps the stream RUNNING across a rename-only change — a rename
    * preserves every position and type, so the batch binds positionally and
    * serves the OLD names with correct values until a restart picks up the
    * new ones. Rename-only is verified by per-position PHYSICAL column
    * identity (the column mapping's physical names), not by the DataType
    * sequence: a single-statement same-type DROP+ADD leaves the types
    * identical but allocates a FRESH physical column, so it still fails —
    * type-only gating would silently serve the new column's values under
    * the dropped column's name.
    */
  override val schema: StructType = GraftChangeSource.changeSchema(spark, tablePath)

  /** The per-position physical identity behind [[schema]], captured at
    * construction — the allowRename gate compares against this.
    */
  private val physicalAtStart: Seq[String] =
    GraftChangeSource.physicalIdentity(spark, tablePath)

  /** The CURRENT table schema, after asserting this stream may keep running
    * under it (see [[schema]]).
    */
  private def assertSchemaCompatible(): StructType = {
    def sig(s: StructType) = s.fields.toSeq.map(f => (f.name, f.dataType))
    val cur = GraftChangeSource.changeSchema(spark, tablePath)
    if (sig(cur) == sig(schema)) cur
    else if (renameTolerant && cur.fields.toSeq.map(_.dataType) ==
        schema.fields.toSeq.map(_.dataType) &&
        GraftChangeSource.physicalIdentity(spark, tablePath) == physicalAtStart)
      cur // rename-only: positions, types AND physical columns intact
    else throw graft.model.GraftException.unexpected(
      s"schema of $tablePath changed while the stream was running — " +
        s"was ${schema.simpleString}, now ${cur.simpleString}. Restart " +
        "the query from its checkpoint to continue under the new schema " +
        "(onSchemaChange=allowRename keeps running across rename-only changes).")
  }

  // the engine hands back checkpoint-restored offsets as SerializedOffset;
  // either way the json IS the instant string
  private def ct(o: Offset): String = o.json().trim

  /** Next available offset: the table tip — or, under
    * `maxCommitsPerTrigger`, at most that many commits past the last
    * logged offset, so a backfill from deep history (startAt near the
    * bootstrap) drains as a sequence of bounded micro-batches instead of
    * one table-sized batch. The cap needs the PREVIOUS offset, which the
    * legacy Source API doesn't pass to getOffset — the source tracks the
    * last end it handed out (getBatch re-syncs it from the engine's own
    * offset log on restart, so the cap survives recovery).
    */
  override def getOffset: Option[Offset] = {
    val st = CommitLog.requireState(spark, tablePath)
    val tip = st.latest.commitTime
    val capped = maxCommitsPerTrigger match {
      case None => tip
      case Some(n) =>
        val since = lastEnd.getOrElse(initialSince)
        val ahead = st.commits.map(_.commitTime).filter(_ > since).take(n)
        if (ahead.isEmpty) since else ahead.last
    }
    advanceLastEnd(capped)
    Some(GraftChangeOffset(capped))
  }

  // The last end offset this source planned or delivered — the cap cursor
  // for maxCommitsPerTrigger. Restored from its own metadata file at
  // construction (beside the graft-initial-since pin), so recovery does NOT
  // depend on MicroBatchExecution's restart-time getBatch init call: if the
  // engine ever skips it, the first post-restart getOffset still starts
  // from the persisted cursor instead of regressing to initialSince and
  // re-planning already-committed commits. getBatch additionally re-syncs
  // from the engine's own offset log; every update is a monotone max.
  private val lastEndFile = new org.apache.hadoop.fs.Path(metadataPath, "graft-last-end")

  @volatile private var lastEnd: Option[String] = {
    if (maxCommitsPerTrigger.isEmpty) None // cursor unused without the cap
    else try {
      val fs = CommitLog.fs(spark, metadataPath)
      if (!fs.exists(lastEndFile)) None
      else {
        val in = fs.open(lastEndFile)
        val s = try new String(
            org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
          finally in.close()
        // a torn write (crash mid-overwrite) is ABSENT, not an offset —
        // instants are FIXED-WIDTH 17-digit strings, so a truncated
        // all-digit prefix is just as torn as garbage; the getBatch re-sync
        // / initialSince fallback then apply, same as before
        if (CommitLog.isInstant(s)) Some(s) else None
      }
    } catch {
      // the cursor is best-effort on BOTH sides: a transient FS error (or
      // the file vanishing between exists and open) must degrade to the
      // getBatch re-sync like a lost write, not kill stream startup
      case _: Exception => None
    }
  }

  private def advanceLastEnd(candidate: String): Unit = {
    val next = (lastEnd.toSeq :+ candidate).max
    if (!lastEnd.contains(next)) {
      lastEnd = Some(next)
      // best-effort persistence: a lost write degrades to the pre-existing
      // recovery behavior (getBatch init re-sync), never to a wrong batch
      if (maxCommitsPerTrigger.isDefined) try {
        val fs = CommitLog.fs(spark, metadataPath)
        val out = fs.create(lastEndFile, true)
        try out.write(next.getBytes("UTF-8")) finally out.close()
      } catch { case _: Exception => () }
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    // T39 mid-stream schema change → fail (or bind a rename positionally),
    // never misbind
    val current = assertSchemaCompatible()
    val since = start.map(ct).getOrElse(initialSince)
    val upTo = ct(end)
    // re-sync the cap cursor from the engine-supplied offsets (a restart
    // hands back the checkpointed interval here before any getOffset state
    // exists); monotone max, so a recovery replay can't regress it
    advanceLastEnd(Seq(since, upTo).max)
    val out = KeyedTable.readChanges(spark, tablePath, since)
      .filter(col(MetaColumns.CommitTime) <= upTo)
    // project to the DECLARED source schema (the feed plan's attribute
    // nullability can differ from the DDL-derived schema, and the streaming
    // engine binds by position against the declared one), then re-root as a
    // streaming frame — getBatch's isStreaming contract. The feed serves
    // CURRENT logical names; select those positionally and alias to the
    // declared names (identical when the schema hasn't changed, the
    // rename-tolerant binding when it has).
    val declared = schema
    org.apache.spark.sql.graftbridge.ColumnBridge.asStreamingFrame(
      out.select(current.fields.toIndexedSeq.zip(declared.fields).map {
        case (c, f) => col(c.name).cast(f.dataType).as(f.name)
      }: _*))
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftChangeSource[$tablePath]"
}

object GraftChangeSource {
  /** Data + meta columns of the table, plus `_change_op`. */
  def changeSchema(spark: SparkSession, tablePath: String): StructType = {
    val st = CommitLog.requireState(spark, tablePath)
    KeyedTable.logicalSchemaOf(st).add(KeyedTable.ChangeOp, StringType)
  }

  /** The PHYSICAL column name serving each position of [[changeSchema]]
    * (the `_change_op` tail has no physical backing — a fixed sentinel).
    * A metadata-only rename preserves this sequence by construction (the
    * mapping re-aliases the SAME physical column); a drop+add cannot (the
    * re-added column gets a fresh physical name, per ColumnMapping's
    * contract) — which is exactly the distinction `allowRename` needs.
    */
  def physicalIdentity(spark: SparkSession, tablePath: String): Seq[String] = {
    val st = CommitLog.requireState(spark, tablePath)
    val m = st.columnMapping
    StructType.fromDDL(st.latest.schemaDdl).fields.toSeq.map(_.name)
      .filterNot(m.dropped.contains) :+ KeyedTable.ChangeOp
  }
}
