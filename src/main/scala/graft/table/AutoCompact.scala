package graft.table

import org.apache.spark.sql.SparkSession

/** Policy-driven inline compaction (`compact.auto = true` table property):
  * after each delta-producing publish, run [[KeyedTable.compactIfNeeded]]
  * so MOR delta chains fold into base files the moment they cross the
  * policy thresholds — no scheduled compactor, maintenance rides the write
  * traffic like `index.auto` and `campaign.reclaim`. The check itself is
  * cheap (one live-delta listing; the byte-ratio scan only runs when any
  * deltas exist), and a triggered compaction is the same swap-first
  * crash-safe [[KeyedTable.compact]] a manual call runs.
  *
  * This is what keeps continuously-ingesting MOR tables — the standing
  * dedup/ANN/PQ index tables above all, whose every streamed batch is one
  * delta commit — from accumulating unbounded delta chains that every
  * snapshot read then re-merges.
  *
  * Failure posture: BEST-EFFORT. An un-compacted table is always CORRECT
  * (snapshot reads merge deltas); a compaction losing OCC to a concurrent
  * writer logs and leaves the fold to the next publish. The ThreadLocal +
  * operation filter keep the compaction's own publish (and reclaim's
  * compact-first) from re-triggering the hook.
  */
private[table] object AutoCompact {

  private val skipOps =
    Set("compact", "reclaim", "index_stats", "index_bloom", "alter_schema")

  private val inCompact = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  def afterPublish(
      spark: SparkSession, tablePath: String, operation: String,
      props: Map[String, String]): Unit = {
    if (inCompact.get() || skipOps(operation)) return
    if (!props.get(TableProperties.CompactAuto).exists(_.equalsIgnoreCase("true"))) return
    val ratio = props.get(TableProperties.CompactAutoRatio)
      .flatMap(v => scala.util.Try(v.trim.toDouble).toOption).filter(_ > 0)
      .getOrElse(0.10)
    val commits = props.get(TableProperties.CompactAutoDeltas)
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption).filter(_ > 0)
      .getOrElse(10)
    inCompact.set(true)
    try {
      val touched = KeyedTable.compactIfNeeded(spark, tablePath, ratio, commits)
      MaintenanceLog.record(spark, tablePath, TableProperties.CompactAuto,
        operation, "ok",
        touched.map(t => s"compacted=[${t.mkString(",")}]")
          .getOrElse("below thresholds"))
    } catch {
      case e: Exception =>
        // an un-compacted table stays correct; the next publish retries
        System.err.println(
          s"[graft] compact.auto after $operation at $tablePath skipped: ${e.getMessage}")
        MaintenanceLog.record(spark, tablePath, TableProperties.CompactAuto,
          operation, "skipped", String.valueOf(e.getMessage))
    } finally inCompact.set(false)
  }
}
