package graft.table

import org.apache.spark.sql.SparkSession

/** Auto-maintained index sidecars (`index.auto` table property): after each
  * DATA publish, incrementally refresh whatever stats/bloom indexes the
  * table already has, so `readBetween`/`readByKeys` pruning survives every
  * write without a manual `index_stats`/`index_bloom` build — the Hudi
  * metadata-table posture.
  *
  * Declared indexes auto-CREATE too: `index.stats.columns` (comma-separated
  * logical columns) builds the stats sidecar at the first publish when none
  * exists, and `index.bloom.columns` builds a bloom per listed column that
  * has no sidecar yet (the record-key bloom spells as the meta column name,
  * `_hoodie_record_key`) — a freshly bootstrapped table is self-indexing
  * from its first write. An EXISTING stats sidecar keeps its own column
  * set (refresh preserves it; rebuild manually to change columns).
  *
  * Cost per publish is bounded by the files the commit ADDED: both builds
  * carry over sidecar rows for still-live files and read only new files'
  * footers/keys, and they return without committing when nothing changed
  * (a MOR delta commit adds no base files → one listing, no new instant).
  *
  * Failure posture: BEST-EFFORT. A stale or missing index is always
  * CORRECT — files the sidecar has never seen are kept by every prune — so
  * a refresh failure (e.g. an OCC conflict with a concurrent writer's own
  * refresh) must not fail the data write that already published; it logs
  * and leaves the refresh to the next publish. The ThreadLocal guard keeps
  * the index builds' own commits (and anything they publish) from
  * re-triggering the hook.
  */
private[table] object IndexAutoRefresh {

  /** Commit operations that never change the base-file set's contents in a
    * way an index refresh could observe, or ARE the refresh itself.
    */
  private val skipOps = Set("index_stats", "index_bloom", "alter_schema")

  private val inRefresh = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  private def csv(props: Map[String, String], key: String): Seq[String] =
    props.get(key).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  def afterPublish(
      spark: SparkSession, tablePath: String, operation: String,
      props: Map[String, String]): Unit = {
    if (inRefresh.get() || skipOps(operation)) return
    if (!props.get(TableProperties.IndexAuto).exists(_.equalsIgnoreCase("true"))) return
    inRefresh.set(true)
    try {
      val statsCols = csv(props, TableProperties.IndexStatsColumns)
      val statsAt =
        if (statsCols.nonEmpty && StatsIndex.latestIndex(spark, tablePath).isEmpty)
          Some(StatsIndex.build(spark, tablePath, statsCols))
        else
          StatsIndex.refresh(spark, tablePath)
      val m = CommitLog.requireState(spark, tablePath).columnMapping
      csv(props, TableProperties.IndexBloomColumns).foreach { c =>
        val phys = KeyedTable.physicalNameOf(m, c)
        if (BloomIndex.latestIndex(spark, tablePath, phys).isEmpty)
          BloomIndex.build(spark, tablePath, logicalColumn = c)
      }
      val bloomAt = BloomIndex.refreshAll(spark, tablePath)
      MaintenanceLog.record(spark, tablePath, TableProperties.IndexAuto,
        operation, "ok",
        s"stats=${statsAt.getOrElse("none")} bloom=[${bloomAt.mkString(",")}]")
    } catch {
      case e: Exception =>
        // stale indexes stay correct (unseen files are never pruned); the
        // next publish retries the refresh
        System.err.println(
          s"[graft] index.auto refresh after $operation at $tablePath skipped: ${e.getMessage}")
        MaintenanceLog.record(spark, tablePath, TableProperties.IndexAuto,
          operation, "skipped", String.valueOf(e.getMessage))
    } finally inRefresh.set(false)
  }
}
