package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Hands-off incremental reclamation (`campaign.reclaim = N` table
  * property): after each DATA publish, run ONE bounded [[KeyedTable.reclaim]]
  * campaign batch — up to N native partitions whose files still physically
  * carry a metadata-dropped column — so a 100 TB table sheds dropped bytes
  * as a side effect of its ordinary write traffic instead of someone
  * babysitting `reclaim_partitions` runs. Convergence is the campaign
  * argument from T41: files written after the DROP null-fill the column
  * (so a partition can become carrying again after an append — the scan
  * below re-finds it), rewritten files never carry it, and the ddl +
  * mapping shed automatically once no live file carries a hidden column.
  *
  * BOTH sides of the per-publish cost are bounded. The REWRITE rewrites at
  * most N partitions, and the INSPECTION footer-reads at most
  * `campaign.reclaim.inspect` partitions (default max(16, 4·N)) per
  * publish — without that cap, the normal end-of-campaign state (few or no
  * carriers left) made one unlucky publish inspect every partition from
  * the cursor to table end. The inspected slice is probed in ONE
  * distributed job per chunk ([[StatsIndex.footerCarriers]]), not one job
  * per partition. The rotation cursor persists after EVERY slice — found a
  * carrier or not — so consecutive publishes walk the partition list
  * exactly once per cycle.
  *
  * Shedding is therefore a CROSS-PUBLISH decision: a persisted clean-streak
  * counter (`campaign.reclaim.clean`) counts consecutively inspected
  * carrier-free partitions, resetting whenever a carrier turns up; when the
  * streak covers the whole partition list — a full no-carrier cycle, which
  * may span many publishes — one final single-partition run sheds the ddl +
  * mapping (serialize-against-everyone applies to exactly that run) and the
  * campaign goes quiet: `hidden.isEmpty` short-circuits every later publish
  * at the cost of one state read. (A batch run can also shed EARLIER via
  * reclaim's own outside-files check — the streak is the bounded fallback
  * when no carrier exists to rewrite.)
  *
  * Failure posture: BEST-EFFORT, like `index.auto`. A batch that loses OCC
  * (e.g. the shedding run racing a concurrent writer) logs and leaves the
  * work to the next publish — an unreclaimed partition is always CORRECT
  * (reads mask the column); only the bytes linger. The ThreadLocal guard
  * plus the operation filter keep the campaign's own publishes (reclaim,
  * its compact-first, index refreshes) from re-triggering it.
  */
private[table] object ReclaimCampaign {

  /** Maintenance/metadata publishes never trigger a campaign batch: the
    * campaign rides DATA traffic. `reclaim`/`compact` are also the
    * campaign's own publishes.
    */
  private val skipOps =
    Set("index_stats", "index_bloom", "alter_schema", "reclaim", "compact")

  private val inCampaign = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Footer-probe chunk size: one distributed job inspects up to this many
    * partitions' files at once. Small enough that dense carriers waste few
    * reads past the Nth, large enough that a sparse-carrier slice is a
    * handful of jobs, never one per partition.
    */
  private val ProbeChunk = 8

  def afterPublish(
      spark: SparkSession, tablePath: String, operation: String,
      props: Map[String, String]): Unit = {
    if (inCampaign.get() || skipOps(operation)) return
    val batchSize = props.get(TableProperties.CampaignReclaim)
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption).filter(_ > 0)
    if (batchSize.isEmpty) return
    inCampaign.set(true)
    try {
      val st = CommitLog.requireState(spark, tablePath)
      val schema = StructType.fromDDL(st.latest.schemaDdl)
      val hidden = st.columnMapping.dropped.filter(schema.fieldNames.contains).toSet
      if (hidden.isEmpty) return // nothing pending: the steady-state cheap exit
      if (st.latest.partitionFields.isEmpty || st.nativePartitions.isEmpty) {
        // unpartitioned (or no native partitions): reclaim in one run
        KeyedTable.reclaim(spark, tablePath)
        return
      }
      val inspectBudget = props.get(TableProperties.CampaignReclaimInspect)
        .flatMap(v => scala.util.Try(v.trim.toInt).toOption).filter(_ > 0)
        .getOrElse(math.max(16, 4 * batchSize.get))
      val fs = CommitLog.fs(spark, tablePath)
      def partitionFiles(p: String): Seq[String] = {
        val dir = new Path(s"$tablePath/${PathCodec.escape(p)}")
        if (!fs.exists(dir)) Seq.empty
        else fs.listStatus(dir)
          .filter(f => f.isFile && !f.getPath.getName.startsWith(".") &&
            !f.getPath.getName.startsWith("_"))
          .map(_.getPath.toString).toSeq
      }
      // ROTATION CURSOR (a best-effort table property) starts each publish's
      // slice after the previous publish's last inspected partition:
      // ordinary writes null-fill the still-physical column into fresh
      // files, so the most-written partition is usually carrying — without
      // rotation a sorted-first scan would re-clean it forever and never
      // reach the tail.
      val cursorKey = TableProperties.CampaignReclaim + ".cursor"
      val cleanKey = TableProperties.CampaignReclaimClean
      val sorted = st.nativePartitions.sorted
      val rotated = props.get(cursorKey) match {
        case Some(c) => val (a, b) = sorted.span(_ <= c); b ++ a
        case None => sorted
      }
      var cleanStreak = props.get(cleanKey)
        .flatMap(v => scala.util.Try(v.trim.toLong).toOption).filter(_ >= 0)
        .getOrElse(0L)
      // consume partitions IN ROTATION ORDER, footer-probing a chunk at a
      // time (one job per chunk); stop at N carriers or the inspection
      // budget. Chunk results past the Nth carrier are discarded UNCONSUMED
      // (the cursor stays at the Nth), preserving exactly the sequential
      // walk's semantics at 1/ProbeChunk of its job count.
      val targets = scala.collection.mutable.ArrayBuffer[String]()
      var lastInspected: Option[String] = None
      var inspected = 0
      val chunks = rotated.take(inspectBudget).grouped(ProbeChunk)
      var done = false
      while (!done && chunks.hasNext) {
        val chunk = chunks.next()
        val carriers = StatsIndex.footerCarriers(
          spark, chunk.map(p => p -> partitionFiles(p)), hidden)
        val it = chunk.iterator
        while (!done && it.hasNext) {
          val p = it.next()
          lastInspected = Some(p)
          inspected += 1
          if (carriers(p)) { targets += p; cleanStreak = 0L }
          else cleanStreak += 1
          if (targets.size >= batchSize.get) done = true
        }
      }
      val fullCycleClean = cleanStreak >= sorted.size
      // one property write per publish: cursor + streak together (the shed
      // path below unsets them instead)
      if (targets.nonEmpty || !fullCycleClean)
        TableProperties.set(spark, tablePath, Map(
          cursorKey -> lastInspected.getOrElse(sorted.last),
          cleanKey -> cleanStreak.toString))
      if (targets.nonEmpty) {
        KeyedTable.reclaim(spark, tablePath, Some(targets.toSeq))
        // the batch itself may have shed (reclaim's own outside-files
        // check) — then retire the campaign's bookkeeping too
        if (CommitLog.requireState(spark, tablePath).columnMapping.dropped.isEmpty)
          TableProperties.unset(spark, tablePath, Seq(cursorKey, cleanKey))
        MaintenanceLog.record(spark, tablePath, TableProperties.CampaignReclaim,
          operation, "ok",
          s"batch=[${targets.mkString(",")}] inspected=$inspected")
      } else if (fullCycleClean) {
        // a full no-carrier CYCLE (possibly spanning many publishes): one
        // bounded run sheds the ddl + mapping (its footer check of
        // everything outside the single target passes by construction).
        // sorted can only be empty here if every native partition vanished
        // since the early-exit check — then no live file can carry the
        // column and a partition-less reclaim sheds directly (head of an
        // empty list would throw into the best-effort catch and log a
        // failure on EVERY publish, never shedding)
        sorted.headOption match {
          case Some(h) => KeyedTable.reclaim(spark, tablePath, Some(Seq(h)))
          case None => KeyedTable.reclaim(spark, tablePath)
        }
        TableProperties.unset(spark, tablePath, Seq(cursorKey, cleanKey))
        MaintenanceLog.record(spark, tablePath, TableProperties.CampaignReclaim,
          operation, "ok",
          s"shed run over ${sorted.headOption.getOrElse("<no partitions>")} inspected=$inspected")
      } else
        MaintenanceLog.record(spark, tablePath, TableProperties.CampaignReclaim,
          operation, "ok",
          s"no carrier in this cycle slice inspected=$inspected clean=$cleanStreak/${sorted.size}")
      ()
    } catch {
      case e: Exception =>
        // an unreclaimed partition is correct (reads mask the column); the
        // next data publish retries the batch
        System.err.println(
          s"[graft] campaign.reclaim batch after $operation at $tablePath skipped: ${e.getMessage}")
        MaintenanceLog.record(spark, tablePath, TableProperties.CampaignReclaim,
          operation, "skipped", String.valueOf(e.getMessage))
    } finally inCampaign.set(false)
  }
}
