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
  * mapping shed automatically on the batch after which no live file
  * carries a hidden column.
  *
  * Per-publish cost is bounded: partitions are footer-inspected one at a
  * time (distributed parquet-footer reads, zero data decode) ONLY until N
  * carriers are found, and the batch itself rewrites at most N partitions.
  * Once nothing carries, one final single-partition run sheds the ddl
  * (serialize-against-everyone applies to exactly that run) and the
  * campaign goes quiet — `hidden.isEmpty` short-circuits every later
  * publish at the cost of one state read.
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

  def afterPublish(spark: SparkSession, tablePath: String, operation: String): Unit = {
    if (inCampaign.get() || skipOps(operation)) return
    val props =
      try TableProperties.get(spark, tablePath)
      catch { case _: Exception => Map.empty[String, String] } // dir gone mid-teardown
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
      val fs = CommitLog.fs(spark, tablePath)
      def partitionFiles(p: String): Seq[String] = {
        val dir = new Path(s"$tablePath/${PathCodec.escape(p)}")
        if (!fs.exists(dir)) Seq.empty
        else fs.listStatus(dir)
          .filter(f => f.isFile && !f.getPath.getName.startsWith(".") &&
            !f.getPath.getName.startsWith("_"))
          .map(_.getPath.toString).toSeq
      }
      // inspect partitions one at a time and stop at N carriers — the
      // per-publish footer-read bound. A ROTATION CURSOR (a best-effort
      // table property) starts each publish's scan after the previous
      // publish's last inspected partition: ordinary writes null-fill the
      // still-physical column into fresh files, so the most-written
      // partition is usually carrying — without rotation a sorted-first
      // scan would re-clean it forever and never reach the tail.
      val cursorKey = TableProperties.CampaignReclaim + ".cursor"
      val sorted = st.nativePartitions.sorted
      val rotated = props.get(cursorKey) match {
        case Some(c) => val (a, b) = sorted.span(_ <= c); b ++ a
        case None => sorted
      }
      val targets = scala.collection.mutable.ArrayBuffer[String]()
      var lastInspected: Option[String] = None
      val it = rotated.iterator
      while (targets.size < batchSize.get && it.hasNext) {
        val p = it.next()
        lastInspected = Some(p)
        if (StatsIndex.footerCarriesAny(spark, partitionFiles(p), hidden)) targets += p
      }
      if (it.hasNext) // mid-cycle: continue from here next publish
        TableProperties.set(spark, tablePath, Map(cursorKey -> lastInspected.get))
      else TableProperties.unset(spark, tablePath, Seq(cursorKey))
      if (targets.nonEmpty) {
        KeyedTable.reclaim(spark, tablePath, Some(targets.toSeq))
        MaintenanceLog.record(spark, tablePath, TableProperties.CampaignReclaim,
          operation, "ok", s"batch=[${targets.mkString(",")}]")
      } else if (!it.hasNext) {
        // a full cycle found no carrier: one bounded run sheds the ddl +
        // mapping (its footer check of everything outside the single
        // target passes by construction)
        KeyedTable.reclaim(spark, tablePath, Some(Seq(sorted.head)))
        MaintenanceLog.record(spark, tablePath, TableProperties.CampaignReclaim,
          operation, "ok", s"shed run over ${sorted.head}")
      } else
        MaintenanceLog.record(spark, tablePath, TableProperties.CampaignReclaim,
          operation, "ok", "no carrier in this cycle slice")
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
