package graft.table

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.model.GraftException

/** Per-table key/value properties — the `hoodie.properties` /
  * `TBLPROPERTIES` analogue, persisted as one small JSON file under the
  * commit-log dir (`.graft/properties.json`). Properties configure table
  * SERVICES (e.g. [[IndexAutoRefresh]]'s `index.auto`), never data
  * semantics, so they are deliberately outside the commit timeline: setting
  * one is O(1), needs no instant, and applies to every subsequent write.
  * Updates are atomic (temp file + rename) AND serialized: each set/unset
  * is a read-modify-write of the whole file, so it runs under the table's
  * metadata mutex ([[MetaMutex]], scope "props") — otherwise a maintenance
  * hook's cursor write racing a user `set_property` could silently drop the
  * other's key (reverting `compact.auto`/`index.auto` turns hands-off
  * maintenance OFF with no error anywhere). Hooks run outside the commit
  * lease, so the table lease cannot cover this; the mutex is dedicated and
  * never nests with it.
  */
object TableProperties {

  /** When "true", every data publish incrementally refreshes the table's
    * existing stats/bloom index sidecars for the files the commit added —
    * the Hudi metadata-table posture (indexes maintained with each commit,
    * `pyspark_script.py:360-390`'s write-config surface) instead of manual
    * `index_stats`/`index_bloom` builds.
    */
  val IndexAuto = "index.auto"

  /** Comma-separated LOGICAL column list: under [[IndexAuto]], auto-CREATE
    * the stats sidecar over these columns at the first publish when no
    * stats index exists (an existing sidecar keeps its own column set).
    */
  val IndexStatsColumns = "index.stats.columns"

  /** Comma-separated LOGICAL column list: under [[IndexAuto]], auto-CREATE
    * a bloom sidecar per listed column that has none yet (the record-key
    * bloom spells as the meta column name, `_hoodie_record_key`).
    */
  val IndexBloomColumns = "index.bloom.columns"

  /** When "true", every delta-producing publish runs [[KeyedTable.compactIfNeeded]]
    * afterwards — MOR delta batches fold into base files as soon as they
    * cross the policy thresholds, with no scheduled compactor. The policy
    * knobs default to compactIfNeeded's own (ratio 0.10, 10 commits) and
    * tune via [[CompactAutoRatio]] / [[CompactAutoDeltas]]. This is what
    * keeps continuously-ingesting MOR tables — the standing dedup/ANN/PQ
    * indexes above all — from accumulating unbounded delta chains.
    */
  val CompactAuto = "compact.auto"

  /** Override for [[CompactAuto]]'s delta-bytes / base-bytes trigger ratio. */
  val CompactAutoRatio = "compact.auto.ratio"

  /** Override for [[CompactAuto]]'s live-delta-commit-count trigger. */
  val CompactAutoDeltas = "compact.auto.deltas"

  /** Comma-separated sort-column list: after each data publish, once
    * [[LayoutAutoCommits]] data commits have landed since the last cluster
    * rewrite, re-run [[KeyedTable.clusterSort]] over these columns
    * ([[AutoLayout]]) — compaction folds deltas but does not re-SORT them,
    * so without this a sort-clustered layout (a text index's term-clustered
    * posting partition) silently degrades under continuous ingest. The
    * layout twin of [[CompactAuto]].
    */
  val LayoutAuto = "layout.auto"

  /** Optional comma-separated partition restriction for [[LayoutAuto]]
    * (a text index re-sorts only its `kind=posting` partition).
    */
  val LayoutAutoPartitions = "layout.auto.partitions"

  /** Data-commit-count trigger for [[LayoutAuto]]; default 8. Both this
    * AND [[LayoutAutoRatio]] must be met before the hook rewrites.
    */
  val LayoutAutoCommits = "layout.auto.commits"

  /** Minimum unsorted fraction before [[LayoutAuto]] rewrites: pending
    * data-commit rows over all-commit rows in the target partitions (a
    * metadata-only proxy for how much of the layout has degraded);
    * default 0.02. A re-cluster costs a FULL partition rewrite, so firing
    * on commit count alone would pay that 100 TB cost every N tiny
    * streamed batches for negligible prune benefit — the unsorted tail a
    * probe reads unpruned is proportional to this fraction, so below the
    * ratio the degradation is cheaper than the rewrite. 0 = fire on
    * commit count alone (small tables / tests).
    */
  val LayoutAutoRatio = "layout.auto.ratio"

  /** Optional `maxRecordsPerFile` for [[LayoutAuto]]'s rewrite (0 = let the
    * range partitioning size the files): bounds each rewritten file's sort-
    * key range, sharpening min/max pruning on very large partitions.
    */
  val LayoutAutoMaxRecords = "layout.auto.maxRecordsPerFile"

  /** Prefix of the derived-index SYNC REGISTRY (`index.sync.<name>` = a
    * compact JSON spec): after every data publish on this table, one
    * checkpointed CDC pull propagates its deletes/upserts to every
    * registered standing dedup/ANN/PQ/text index
    * ([[graft.operators.SyncRegistry]]) — takedowns and inserts reach the
    * derived state with nobody scheduling per-index sync calls.
    */
  val IndexSyncPrefix = "index.sync."

  /** Positive integer N: after every data publish, run ONE bounded reclaim
    * campaign batch — rewrite up to N native partitions whose files still
    * physically carry a metadata-dropped column ([[ReclaimCampaign]]). The
    * hands-off version of the `reclaim_partitions` campaign: reclamation
    * progress amortizes over ordinary writes, and the partition-subset OCC
    * rule lets batches land under live disjoint writers. Unset (or no
    * dropped column pending) = no-op.
    */
  val CampaignReclaim = "campaign.reclaim"

  /** Positive integer M: per-publish INSPECTION budget of the reclaim
    * campaign — at most M partitions are footer-probed per data publish
    * (default max(16, 4·N)). Bounds the hook's metadata cost on
    * many-partition tables when carriers are sparse; the rotation cursor
    * persists every slice, so the cycle completes across publishes.
    */
  val CampaignReclaimInspect = "campaign.reclaim.inspect"

  /** INTERNAL campaign state (written by the hook, not an operator knob):
    * consecutive carrier-free inspected partitions across publishes. When
    * the streak covers every native partition — a full no-carrier cycle —
    * the next publish runs the single shed run and the campaign retires.
    */
  val CampaignReclaimClean = "campaign.reclaim.clean"

  def propsPath(tablePath: String): Path =
    new Path(CommitLog.logDir(tablePath), "properties.json")

  def get(spark: SparkSession, tablePath: String): Map[String, String] = {
    val fs = CommitLog.fs(spark, tablePath)
    val p = propsPath(tablePath)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val node = try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    finally in.close()
    node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
  }

  /** Merge `kv` into the table's properties (existing keys overwritten).
    * The whole read-modify-write holds the "props" mutex: concurrent
    * setters of DIFFERENT keys both survive.
    */
  def set(spark: SparkSession, tablePath: String, kv: Map[String, String]): Unit = {
    require(kv.nonEmpty, "set needs at least one property")
    CommitLog.requireState(spark, tablePath) // a real table, not a bare dir
    MetaMutex.withLock(spark, tablePath, "props") {
      write(spark, tablePath, get(spark, tablePath) ++ kv)
    }
  }

  /** Remove `keys` (unknown keys are ignored). Mutex-guarded like [[set]]. */
  def unset(spark: SparkSession, tablePath: String, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "unset needs at least one key")
    CommitLog.requireState(spark, tablePath)
    MetaMutex.withLock(spark, tablePath, "props") {
      write(spark, tablePath, get(spark, tablePath) -- keys)
    }
  }

  /** Direct initial write for a table being STAGED — the atomic birth-stamp
    * path of [[KeyedTable.create]]: no commit log exists yet and no
    * concurrent writer can see a private staging dir, so neither the state
    * check nor the props mutex applies. The file lands inside the staging
    * dir and travels with the promote rename, so a crash can never produce
    * a committed table missing the stamps its write legs dispatch on
    * (`text.fields`, `compact.auto`, the dedup parameter stamps, ...).
    */
  private[table] def writeInitial(
      spark: SparkSession, stagingPath: String, props: Map[String, String]): Unit =
    if (props.nonEmpty) write(spark, stagingPath, props)

  private def write(
      spark: SparkSession, tablePath: String, props: Map[String, String]): Unit = {
    val fs = CommitLog.fs(spark, tablePath)
    val p = propsPath(tablePath)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    props.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw GraftException.config(s"could not publish table properties at $p")
  }
}
